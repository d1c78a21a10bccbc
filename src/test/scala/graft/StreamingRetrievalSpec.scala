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
