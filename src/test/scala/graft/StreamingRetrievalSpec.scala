package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamingRetrieval
import graft.text.Retrieval

/** Streaming BM25: a query stream probed per-micro-batch against the
  * static postings index must equal the one-shot batch probe over the
  * union of queries — exactly, because probe scoring is per-query
  * independent (stats + df both come from the index).
  */
class StreamingRetrievalSpec extends SparkTestBase {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "spark shuffles data across the cluster"),
    (2L, "the cluster runs spark executors"),
    (3L, "pandas runs on one machine"),
    (4L, "data pipelines clean data for training")
  ).toDF("doc_id", "text")

  private val queries = Seq((100L, "spark cluster data"),
    (101L, "pandas training"), (102L, "clean pipelines"))

  test("micro-batched probe equals the one-shot batch probe") {
    implicit val sc = spark.sqlContext
    val post = Retrieval.bm25Index(corpus, "doc_id", "text").persist()
    try {
      val stats = Retrieval.bm25IndexStats(post)
      val handler = StreamingRetrieval.bm25ProbeBatches(post, stats,
        "qid", "qtext", k = 3, maxDfFrac = 0.9)

      val input = MemoryStream[(Long, String)]
      val collected = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long, Double, Int)]
      val q = input.toDS().toDF("qid", "qtext")
        .writeStream.outputMode("append")
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[
            org.apache.spark.sql.Row], _: Long) =>
          collected.synchronized {
            collected ++= handler(batch)
              .as[(Long, Long, Double, Int)].collect()
          }
          ()
        }
        .start()
      // split mid-stream: batches must score independently
      input.addData(queries.take(1): _*)
      q.processAllAvailable()
      input.addData(queries.drop(1): _*)
      q.processAllAvailable()
      q.stop()

      val want = Retrieval.bm25ProbeIndex(post, stats,
          queries.toDF("qid", "qtext"), "qid", "qtext",
          k = 3, maxDfFrac = 0.9)
        .as[(Long, Long, Double, Int)].collect().toSet
      assert(collected.toSet == want && want.nonEmpty,
        s"streamed ${collected.toSet} vs batch $want")
    } finally post.unpersist()
  }

  // ---------------------------------------------- index-update twin

  private def settledFromSink(table: String) = {
    val all = spark.table(table)
    StreamingRetrieval.settlePostings(all)
      .select("term", "doc_id", "tf", "dl")
      .filter(org.apache.spark.sql.functions.col("term").isNotNull)
      .as[(String, Long, Long, Long)].collect().toSet
  }

  test("streaming index update settles to updateBm25Index across " +
      "arbitrary batching, re-delivery and out-of-order versions") {
    implicit val sc = spark.sqlContext
    // three versions of doc 2, two of doc 3; latest-by-ts must win
    // regardless of arrival order; doc 5's latest tokenizes to empty
    // (eviction without replacement)
    val v = Seq(
      (2L, 10L, "the cluster runs spark executors"),
      (2L, 20L, "executors now run rust"),
      (2L, 30L, "rust runs the cluster"),
      (3L, 10L, "pandas runs on one machine"),
      (3L, 25L, "polars runs on many machines"),
      (5L, 5L, "ephemeral doc"),
      (5L, 15L, "   "))
    val latest = Seq((2L, "rust runs the cluster"),
      (3L, "polars runs on many machines"), (5L, "   "))

    val input = MemoryStream[(Long, Long, String)]
    val q = StreamingRetrieval.streamingPostingsUpdate(
        input.toDS().toDF("doc_id", "__ts", "text")
          .withColumn("ts", org.apache.spark.sql.functions
            .timestamp_seconds(org.apache.spark.sql.functions
              .col("__ts"))),
        "doc_id", "ts", "text")
      .writeStream.format("memory").queryName("bm25_upd")
      .outputMode("append").start()
    // out-of-order: newest version of doc 2 first, then older ones
    // (ignored), then re-delivery of the whole set (no-op)
    input.addData(v(2), v(3), v(6)); q.processAllAvailable()
    input.addData(v(0), v(1), v(4), v(5)); q.processAllAvailable()
    input.addData(v: _*); q.processAllAvailable()
    q.stop()

    val settled = settledFromSink("bm25_upd")
    val want = Retrieval.bm25Index(latest.toDF("doc_id", "text"),
        "doc_id", "text")
      .select("term", "doc_id", "tf", "dl")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(settled == want && want.nonEmpty,
      s"settled $settled vs batch index $want")

    // merge into a base: evicted docs (2, 3, 5) lose their base rows;
    // doc 5 (empty latest) has NO replacement — updateBm25Index
    // semantics row-for-row
    val base = Retrieval.bm25Index(corpus
      .unionByName(Seq((5L, "ephemeral doc")).toDF("doc_id", "text")),
      "doc_id", "text")
    val merged = StreamingRetrieval.mergeSettledPostings(base,
        StreamingRetrieval.settlePostings(spark.table("bm25_upd")))
      .as[(String, Long, Long, Long)].collect().toSet
    val wantMerged = Retrieval.updateBm25Index(base,
        latest.toDF("doc_id", "text"), "doc_id", "text")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(merged == wantMerged && wantMerged.nonEmpty,
      s"merged $merged vs updateBm25Index $wantMerged")
  }

  test("settlePostings absorbs an at-least-once sink's double-written " +
      "micro-batch (no duplicate postings rows)") {
    // a retried micro-batch written twice = every emission row twice;
    // the settle must yield exactly the single-write rows, or a probe
    // over the merged index double-counts tf
    val once = Seq(
      (2L, 4L, null.asInstanceOf[String], 0L, 1L),
      (2L, 4L, "rust", 1L, 1L),
      (2L, 4L, "runs", 1L, 1L),
      (2L, 4L, "rust", 1L, 2L), // rev 2 supersedes
      (2L, 4L, null.asInstanceOf[String], 0L, 2L),
      (7L, 2L, "solo", 2L, 1L),
      (7L, 2L, null.asInstanceOf[String], 0L, 1L))
      .toDF("doc_id", "dl", "term", "tf", "rev")
    val doubled = once.unionAll(once)
    val settledOnce = StreamingRetrieval.settlePostings(once)
      .as[(Long, Long, Option[String], Long, Long)].collect().toSeq
    val settledTwice = StreamingRetrieval.settlePostings(doubled)
      .as[(Long, Long, Option[String], Long, Long)].collect().toSeq
    assert(settledOnce.sortBy(r => (r._1, r._3)) ==
      settledTwice.sortBy(r => (r._1, r._3)),
      s"double-write changed the settle: $settledTwice vs $settledOnce")
    assert(settledOnce.size == settledOnce.distinct.size &&
      settledOnce.nonEmpty, s"settle emitted duplicates: $settledOnce")
  }

  test("index update rejects non-integral doc ids by name") {
    val df = Seq(("a", 1L, "x")).toDF("doc_id", "__ts", "text")
      .withColumn("ts", org.apache.spark.sql.functions
        .timestamp_seconds(org.apache.spark.sql.functions.col("__ts")))
    val e = intercept[IllegalArgumentException](
      StreamingRetrieval.streamingPostingsUpdate(df, "doc_id", "ts",
        "text"))
    assert(e.getMessage.contains("must be integral"), e.getMessage)
  }

  test("handler validates params at build time, before any batch runs") {
    val post = Retrieval.bm25Index(corpus, "doc_id", "text")
    val stats = Retrieval.bm25IndexStats(post)
    intercept[IllegalArgumentException] {
      StreamingRetrieval.bm25ProbeBatches(post, stats, "qid", "qtext",
        k = 0)
    }
    intercept[IllegalArgumentException] {
      StreamingRetrieval.bm25ProbeBatches(post, stats, "qid", "qtext",
        k = 1, maxDfFrac = 2.0)
    }
  }
}
