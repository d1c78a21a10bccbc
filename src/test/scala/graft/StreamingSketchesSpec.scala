package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ops.Sampling
import graft.sketch.SampleQuantiles
import graft.streaming.StreamingSketches

/** Streaming sketch twins (graft.streaming.StreamingSketches): batch
  * mode equals the batch operators row-for-row, and the continuous
  * run's HIGHEST-rev snapshot per group settles to the batch answer
  * regardless of how the data is batched (the sketches are order-free
  * by construction).
  */
class StreamingSketchesSpec extends SparkTestBase {
  import spark.implicits._

  private val rnd = new scala.util.Random(11)
  private val rows = (1L to 400L).map(i =>
    (i % 3, i, rnd.nextDouble() * 100.0)) // (grp, key, value)
  private val probs = Seq(0.25, 0.5, 0.9)

  test("grouped quantiles: batch mode equals the batch operator") {
    val df = rows.toDF("g", "id", "v")
    val want = SampleQuantiles.groupedQuantiles(df, col("g"), col("id"),
        col("v"), k = 32, probs)
      .collect().map(_.toSeq).toSet
    val got = StreamingSketches.streamingGroupedQuantiles(df, col("g"),
        col("id"), col("v"), k = 32, probs)
      .drop("rev").collect().map(_.toSeq).toSet
    assert(got == want, s"twin $got vs operator $want")
  }

  test("grouped quantiles: streamed highest-rev snapshot settles to " +
      "the batch answer across arbitrary batching") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, Long, Double)]
    val q = StreamingSketches.streamingGroupedQuantiles(
        input.toDS().toDF("g", "id", "v"), col("g"), col("id"),
        col("v"), k = 32, probs)
      .writeStream.format("memory").queryName("gq_out")
      .outputMode("append").start()
    // three uneven batches, later keys first
    val (a, b) = rows.splitAt(50)
    val (b1, b2) = b.splitAt(270)
    input.addData(b2: _*); q.processAllAvailable()
    input.addData(b1: _*); q.processAllAvailable()
    input.addData(a: _*); q.processAllAvailable()
    q.stop()
    val all = spark.table("gq_out").collect().map(_.toSeq)
    val maxRev = all.groupBy(_.head).view
      .mapValues(_.map(_.last.asInstanceOf[Long]).max).toMap
    val got = all.filter(r => r.last == maxRev(r.head))
      .map(_.dropRight(1)).toSet
    val want = SampleQuantiles.groupedQuantiles(rows.toDF("g", "id", "v"),
        col("g"), col("id"), col("v"), k = 32, probs)
      .collect().map(_.toSeq).toSet
    assert(got == want, s"streamed $got vs batch $want")
  }

  test("group priority sample: batch mode equals the batch operator " +
      "(string groups)") {
    val df = rows.map { case (g, i, _) => (s"lang$g", i, i % 17 + 1) }
      .toDF("lang", "id", "w")
    val want = Sampling.prioritySamplePerGroup(df, "lang", "id", "w",
        k = 8)
      .collect().map(_.toSeq).toSet
    val got = StreamingSketches.streamingGroupPrioritySample(df, "lang",
        "id", "w", k = 8)
      .drop("rev").collect().map(_.toSeq).toSet
    assert(got == want, s"twin $got vs operator $want")
  }

  test("group priority sample: streamed highest-rev snapshot settles " +
      "to the batch answer; tau appears once a group exceeds k") {
    implicit val sc = spark.sqlContext
    val data = rows.map { case (g, i, _) => (g, i, i % 17 + 1) }
    val input = MemoryStream[(Long, Long, Long)]
    val q = StreamingSketches.streamingGroupPrioritySample(
        input.toDS().toDF("g", "id", "w"), "g", "id", "w", k = 8)
      .writeStream.format("memory").queryName("ps_out")
      .outputMode("append").start()
    val (a, b) = data.splitAt(120)
    input.addData(b: _*); q.processAllAvailable()
    input.addData(a: _*); q.processAllAvailable()
    q.stop()
    val all = spark.table("ps_out").collect().map(_.toSeq)
    val maxRev = all.groupBy(_.head).view
      .mapValues(_.map(_.last.asInstanceOf[Long]).max).toMap
    val got = all.filter(r => r.last == maxRev(r.head))
      .map(_.dropRight(1)).toSet
    val want = Sampling.prioritySamplePerGroup(data.toDF("g", "id", "w"),
        "g", "id", "w", k = 8)
      .collect().map(_.toSeq).toSet
    assert(got == want, s"streamed $got vs batch $want")
    // every group holds > k rows, so est_w = max(w, tau) != w somewhere
    assert(got.exists(r => r(4).asInstanceOf[Double] >
      r(2).asInstanceOf[Long].toDouble))
  }

  test("group priority sample: at-least-once re-delivery does not " +
      "evict genuine items (duplicates collapse before the top-(k+1))") {
    implicit val sc = spark.sqlContext
    val data = rows.map { case (g, i, _) => (g, i, i % 17 + 1) }
    val input = MemoryStream[(Long, Long, Long)]
    val q = StreamingSketches.streamingGroupPrioritySample(
        input.toDS().toDF("g", "id", "w"), "g", "id", "w", k = 8)
      .writeStream.format("memory").queryName("ps_redeliver")
      .outputMode("append").start()
    val (a, b) = data.splitAt(120)
    input.addData(b: _*); q.processAllAvailable()
    // re-deliver the whole first batch plus in-batch duplicates of it:
    // the settled sketch must be identical to exactly-once delivery
    input.addData((a ++ b ++ b): _*); q.processAllAvailable()
    input.addData(b: _*); q.processAllAvailable()
    q.stop()
    val all = spark.table("ps_redeliver").collect().map(_.toSeq)
    val maxRev = all.groupBy(_.head).view
      .mapValues(_.map(_.last.asInstanceOf[Long]).max).toMap
    val got = all.filter(r => r.last == maxRev(r.head))
      .map(_.dropRight(1)).toSet
    val want = Sampling.prioritySamplePerGroup(data.toDF("g", "id", "w"),
        "g", "id", "w", k = 8)
      .collect().map(_.toSeq).toSet
    assert(got == want, s"re-delivered $got vs batch $want")
  }

  test("type gating fails loudly by name") {
    val df = Seq((1.5, 1L, 2.0)).toDF("g", "id", "v")
    val e = intercept[IllegalArgumentException](
      StreamingSketches.streamingGroupedQuantiles(df, col("g"),
        col("id"), col("v"), k = 32, probs))
    assert(e.getMessage.contains("long or string"), e.getMessage)
    val df2 = Seq((1L, "x", 2L)).toDF("g", "id", "w")
    val e2 = intercept[IllegalArgumentException](
      StreamingSketches.streamingGroupPrioritySample(df2, "g", "id",
        "w", k = 8))
    assert(e2.getMessage.contains("must be integral"), e2.getMessage)
  }
}
