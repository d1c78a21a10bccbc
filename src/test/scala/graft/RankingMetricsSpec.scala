package graft

import graft.text.Retrieval

/** Retrieval evaluation: recall@k / precision@k / reciprocal rank
  * against a relevance table, zero-scoring for missed queries, truth
  * dedup, and the k cutoff.
  */
class RankingMetricsSpec extends SparkTestBase {
  import spark.implicits._

  // results: q1 hits d1@1 d2@2 d9@3; q2 hits d5@1; q3 retrieves junk
  private val results = Seq(
    (1L, 1L, 0.9, 1), (1L, 2L, 0.8, 2), (1L, 9L, 0.7, 3),
    (2L, 5L, 0.9, 1), (3L, 8L, 0.9, 1))
    .toDF("query_id", "doc_id", "score", "rank")

  test("per-query recall, precision and reciprocal rank") {
    // truth: q1 → {d2, d3}; q2 → {d5}; q3 → {d7}; q4 → {d1} (missed
    // entirely — not even in results)
    val truth = Seq((1L, 2L), (1L, 3L), (2L, 5L), (3L, 7L), (4L, 1L))
      .toDF("qid", "did")
    val got = Retrieval.rankingMetrics(results, truth, "qid", "did", k = 3)
      .as[(Long, Long, Long, Double, Double, Double)].collect().toSeq
    assert(got == Seq(
      (1L, 2L, 1L, 0.5, 1.0 / 3.0, 1.0 / 2.0),
      (2L, 1L, 1L, 1.0, 1.0 / 3.0, 1.0),
      (3L, 1L, 0L, 0.0, 0.0, 0.0),
      (4L, 1L, 0L, 0.0, 0.0, 0.0)), s"got $got")
  }

  test("k cutoff drops deeper hits; duplicate truth pairs collapse") {
    val truth = Seq((1L, 9L), (1L, 9L)).toDF("qid", "did")
    val got = Retrieval.rankingMetrics(results, truth, "qid", "did", k = 2)
      .as[(Long, Long, Long, Double, Double, Double)].collect().toSeq
    // d9 sits at rank 3 > k=2 → no hit; dup truth row must not double
    // n_relevant
    assert(got == Seq((1L, 1L, 0L, 0.0, 0.0, 0.0)), s"got $got")
  }

  test("result-only queries are ignored and guards fire") {
    val truth = Seq((2L, 5L)).toDF("qid", "did")
    val got = Retrieval.rankingMetrics(results, truth, "qid", "did", k = 3)
      .select("query_id").as[Long].collect().toSeq
    assert(got == Seq(2L), "only truth queries are scored")
    intercept[IllegalArgumentException] {
      Retrieval.rankingMetrics(results, truth, "qid", "did", k = 0)
    }
    // results must be the standard retrieval shape — loud, not a
    // silent mis-scored join
    val bad = intercept[IllegalArgumentException] {
      Retrieval.rankingMetrics(truth, truth, "qid", "did", k = 3)
    }
    assert(bad.getMessage.contains("query_id"))
  }
}
