package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.sim.{Pq, Similarity}
import graft.streaming.StreamingAnn

/** Streaming IVFADC index maintenance: batch mode equals
  * updateIvfAdcIndex, and the continuous run settles to the same
  * index under arbitrary batching, re-delivery and out-of-order
  * version arrival.
  */
class StreamingAnnSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .withColumn("embedding", col("embedding").cast("array<double>"))

  private lazy val cents = Similarity.ivfCentroids(emb, "vec_id",
    "embedding", nCentroids = 8)
  private lazy val cbs = Pq.pqCodebooksResidual(emb, "vec_id",
    "embedding", cents, dim = 64, m = 4, kPerSub = 8)

  test("streamed updates settle to updateIvfAdcIndex across batching, " +
      "re-delivery and out-of-order versions") {
    implicit val sc = spark.sqlContext
    val base = Pq.ivfAdcIndex(emb, "vec_id", "embedding", cents, cbs)
    // three versions of id 4 (latest = double), two of id 6; the
    // final state must reflect the max-ts vector per id
    val v4a = emb.filter(col("vec_id") === 4)
      .select(col("embedding")).head().getSeq[Double](0)
    val v6a = emb.filter(col("vec_id") === 6)
      .select(col("embedding")).head().getSeq[Double](0)
    val versions = Seq(
      (4L, 10L, v4a.reverse),
      (4L, 20L, v4a.map(-_)),
      (4L, 30L, v4a.map(_ * 2.0)),
      (6L, 10L, v6a.reverse),
      (6L, 25L, v6a.map(_ + 1.0)))
    val latest = Seq((4L, v4a.map(_ * 2.0)), (6L, v6a.map(_ + 1.0)))

    val input = MemoryStream[(Long, Long, Seq[Double])]
    val q = StreamingAnn.streamingIndexUpdate(
        input.toDS().toDF("vec_id", "__ts", "embedding")
          .withColumn("ts", timestamp_seconds(col("__ts"))),
        "vec_id", "ts", "embedding", cents, cbs)
      .writeStream.format("memory").queryName("ann_upd")
      .outputMode("append").start()
    // newest first, then older (ignored), then full re-delivery (no-op)
    input.addData(versions(2), versions(4)); q.processAllAvailable()
    input.addData(versions(0), versions(1), versions(3))
    q.processAllAvailable()
    input.addData(versions: _*); q.processAllAvailable()
    q.stop()

    val merged = StreamingAnn.mergeSettledIndex(base, "vec_id",
        StreamingAnn.settleIndex(spark.table("ann_upd")))
      .as[(Long, Int, Seq[Int])].collect().toSet
    val want = Pq.updateIvfAdcIndex(base, "vec_id",
        latest.toDF("vec_id", "embedding"), "vec_id", "embedding",
        cents, cbs)
      .as[(Long, Int, Seq[Int])].collect().toSet
    assert(merged == want && want.nonEmpty,
      s"settled merge != updateIvfAdcIndex")
    // the re-ingested ids actually changed vs the base index
    val baseMap = base.as[(Long, Int, Seq[Int])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val freshRows = merged.filter(r => r._1 == 4L || r._1 == 6L)
    assert(freshRows.exists(r => baseMap(r._1) != ((r._2, r._3))),
      "edits changed no index row — vacuous twin")
  }

  test("settleIndex absorbs an at-least-once sink's double-written " +
      "micro-batch (no duplicate index rows)") {
    val once = Seq(
      (4L, 2, Seq(1, 2, 3, 4), 1L),
      (4L, 5, Seq(4, 3, 2, 1), 2L), // rev 2 supersedes
      (6L, 1, Seq(7, 7, 7, 7), 1L))
      .toDF("vec_id", "cell", "codes", "rev")
    val doubled = once.unionAll(once)
    val settledOnce = StreamingAnn.settleIndex(once)
      .as[(Long, Int, Seq[Int], Long)].collect().toSeq
    val settledTwice = StreamingAnn.settleIndex(doubled)
      .as[(Long, Int, Seq[Int], Long)].collect().toSeq
    assert(settledOnce.sortBy(_._1) == settledTwice.sortBy(_._1),
      s"double-write changed the settle: $settledTwice vs $settledOnce")
    assert(settledOnce.map(_._1).distinct.size == settledOnce.size &&
      settledOnce.nonEmpty, s"settle emitted duplicates: $settledOnce")
  }

  test("non-integral ids are rejected by name") {
    val df = Seq(("a", 1L, Seq(1.0))).toDF("vec_id", "__ts", "embedding")
      .withColumn("ts", timestamp_seconds(col("__ts")))
    val e = intercept[IllegalArgumentException](
      StreamingAnn.streamingIndexUpdate(df, "vec_id", "ts", "embedding",
        cents, cbs))
    assert(e.getMessage.contains("must be integral"), e.getMessage)
  }
}
