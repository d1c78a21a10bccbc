package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.sketch.{CountMin, HyperLogLog}

/** Streaming incremental sketches: per-micro-batch sketches folded into
  * a running corpus sketch via the merge endpoints must equal the
  * one-shot batch sketch of all data — the foreachBatch lifecycle a
  * production profile runs (sketch each arriving batch, merge, persist;
  * never re-read corpus rows). The merges are associative and
  * commutative, so ANY micro-batch split yields the identical sketch.
  */
class StreamingSketchSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq.tabulate(30)(i => (i.toLong, s"w$i w${i % 5} shared"))

  test("foreachBatch-merged CMS equals the one-shot sketch of all data") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    var acc: Option[DataFrame] = None
    val q = input.toDS().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val s = CountMin.sketch(batch,
          graft.text.TextPipeline.tokenize(col("text")), 4, 64)
        // materialize the per-batch sketch so the accumulated plan
        // never references a consumed streaming source
        val rows = s.select("cms").as[Array[Long]].collect().toSeq
          .toDF("cms").select(lit(4).as("depth"), lit(64).as("width"),
            col("cms"))
        acc = Some(acc.fold(rows)(prev =>
          CountMin.mergeSketches(prev, rows, 4, 64)
            .select("cms").as[Array[Long]].collect().toSeq
            .toDF("cms").select(lit(4).as("depth"), lit(64).as("width"),
              col("cms"))))
      }
      .start()
    input.addData(docs.take(11): _*)
    q.processAllAvailable()
    input.addData(docs.slice(11, 19): _*)
    q.processAllAvailable()
    input.addData(docs.drop(19): _*)
    q.processAllAvailable()
    q.stop()

    val merged = acc.get.select("cms").as[Array[Long]].head().toSeq
    val oneShot = CountMin.sketch(docs.toDF("doc_id", "text"),
        graft.text.TextPipeline.tokenize(col("text")), 4, 64)
      .select("cms").as[Array[Long]].head().toSeq
    assert(merged == oneShot)
  }

  test("sketches survive the parquet persist/reload the lifecycle docs " +
      "promise, and merge identically after the round trip") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_sketch_rt").toString
    try {
      val a = docs.take(15).toDF("doc_id", "text")
      val b = docs.drop(15).toDF("doc_id", "text")
      def cms(df: DataFrame) = CountMin.sketch(df,
        graft.text.TextPipeline.tokenize(col("text")), 4, 64)
      cms(a).write.parquet(s"$dir/cms")
      HyperLogLog.registers(a, col("doc_id"), 8)
        .write.parquet(s"$dir/hll")
      val mergedCms = CountMin.mergeSketches(
          spark.read.parquet(s"$dir/cms"), cms(b), 4, 64)
        .select("cms").as[Array[Long]].head().toSeq
      assert(mergedCms == cms(docs.toDF("doc_id", "text"))
        .select("cms").as[Array[Long]].head().toSeq)
      val mergedHll = HyperLogLog.mergeRegisters(
          spark.read.parquet(s"$dir/hll"),
          HyperLogLog.registers(b, col("doc_id"), 8))
        .orderBy("j").as[(Long, Long)].collect().toSeq
      assert(mergedHll == HyperLogLog.registers(
          docs.toDF("doc_id", "text"), col("doc_id"), 8)
        .orderBy("j").as[(Long, Long)].collect().toSeq)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(dir))
    }
  }

  test("foreachBatch-merged HLL registers equal the one-shot registers") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Long]
    var acc: Option[DataFrame] = None
    val q = input.toDS().toDF("id").writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val regs = HyperLogLog.registers(batch, col("id"), 8)
        val rows = regs.as[(Long, Long)].collect().toSeq.toDF("j", "mrho")
        acc = Some(acc.fold(rows)(prev =>
          HyperLogLog.mergeRegisters(prev, rows)
            .as[(Long, Long)].collect().toSeq.toDF("j", "mrho")))
      }
      .start()
    val ids = (0L until 120L) ++ (60L until 200L) // overlap across batches
    input.addData(ids.take(70): _*)
    q.processAllAvailable()
    input.addData(ids.drop(70): _*)
    q.processAllAvailable()
    q.stop()

    val merged = acc.get.orderBy("j").as[(Long, Long)].collect().toSeq
    val oneShot = HyperLogLog.registers(ids.toDF("id"), col("id"), 8)
      .orderBy("j").as[(Long, Long)].collect().toSeq
    assert(merged == oneShot)
    // and therefore the estimates agree too
    assert(HyperLogLog.estimateFromRegisters(
        merged.toDF("j", "mrho"), 8).head() ==
      HyperLogLog.distinctEstimate(ids.toDF("id"), col("id"), 8).head())
  }

  test("windowed streaming KMV equals the batch twin under " +
      "out-of-order cross-batch arrival") {
    import java.sql.Timestamp
    implicit val sc = spark.sqlContext
    def at(day: Int, h: Int) =
      Timestamp.valueOf(f"2024-01-$day%02d $h%02d:00:00")
    // day 1: 40 distinct ids (> k=16, the estimation regime; dup ids
    // across batches must not occupy extra slots); day 2: 5 (< k, the
    // exact regime)
    val rows =
      (0 until 40).map(i => (at(1, i % 24), i.toLong)) ++
        (0 until 10).map(i => (at(1, 3), (i * 2).toLong)) ++ // dups
        (0 until 5).map(i => (at(2, 5), 1000L + i))
    val input = MemoryStream[(Timestamp, Long)]
    val q = graft.streaming.StreamingPipeline
      .streamingKmvDistinct(input.toDS().toDF("ts", "event_id"),
        window_ = "1 day", valueCol = "event_id", k = 16,
        watermark = "2 days")
      .writeStream.format("memory").queryName("kmv_win_out")
      .outputMode("complete").start()
    // out-of-order: day-2 rows land in the middle batch, late day-1
    // rows (within the watermark) in the last
    input.addData(rows.take(20): _*)
    q.processAllAvailable()
    input.addData(rows.slice(40, 55): _*)
    q.processAllAvailable()
    input.addData(rows.slice(20, 40): _*)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("kmv_win_out")
      .orderBy("window_start_us").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val twin = graft.streaming.StreamingPipeline
      .streamingKmvDistinct(rows.toDF("ts", "event_id"),
        window_ = "1 day", valueCol = "event_id", k = 16)
      .orderBy("window_start_us").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got === twin)
    assert(twin.map(_._2) === Seq(16L, 5L)) // estimation + exact regimes
    assert(twin(1)._3 === 5.0)
  }
}
