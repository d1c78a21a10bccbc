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

  test("rrfFusion: hand-computed hybrid merge, ties to the smaller id") {
    import spark.implicits._
    // source 0: q1 ranks [10, 11, 12]; source 1: q1 ranks [11, 13, 14]
    val a = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3))
      .toDF("query_id", "id", "rank")
    val b = Seq((1L, 11L, 1), (1L, 13L, 2), (1L, 14L, 3))
      .toDF("query_id", "id", "rank")
    val got = Retrieval.rrfFusion(Seq(a, b), "query_id", "id", "rank",
        k = 5, rrfK = 60)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getInt(3)))
      .sortBy(_._3)
    // 11 appears in both: 1/62 + 1/61 tops everything; the operator's
    // fixed-point fold makes the expected double exactly computable
    assert(got.head._1 == 11L)
    assert(got.head._2 ==
      (math.round(1.0 / 62 * 1e10) + math.round(1.0 / 61 * 1e10))
        .toDouble / 1e10)
    // 10 (1/61) next, then 13 (1/62), then 12 and 14 tie at 1/63 ->
    // smaller id first
    assert(got.map(_._1).toSeq == Seq(11L, 10L, 13L, 12L, 14L))
    // single-source fusion is a no-op re-rank of that source
    val solo = Retrieval.rrfFusion(Seq(a), "query_id", "id", "rank", k = 2)
      .collect().map(_.getLong(1)).toSeq
    assert(solo == Seq(10L, 11L))
    intercept[IllegalArgumentException](
      Retrieval.rrfFusion(Seq.empty, "query_id", "id", "rank", k = 2))
    intercept[IllegalArgumentException](
      Retrieval.rrfFusion(Seq(a), "query_id", "id", "rank", k = 0))
  }

  test("rrfFusion is repartition-invariant to the bit") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val a = (1 to 200).map(_ => (rnd.nextInt(5).toLong,
        rnd.nextInt(40).toLong, rnd.nextInt(20) + 1))
      .distinct.groupBy(t => (t._1, t._2)).map(_._2.head).toSeq
      .toDF("query_id", "id", "rank")
    val one = Retrieval.rrfFusion(Seq(a, a.limit(50)), "query_id", "id",
        "rank", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3))).toSet
    val many = Retrieval.rrfFusion(
        Seq(a.repartition(7), a.limit(50).repartition(3)), "query_id",
        "id", "rank", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3))).toSet
    assert(one == many)
  }

  // Catalyst's log is StrictMath.log (fdlibm) — Math.log can differ
  // by 1 ulp (e.g. on 3.0), so the model must use the same
  private def disc(r: Long): Double =
    StrictMath.log(2.0) / StrictMath.log(r + 1.0)

  test("ndcg: hand-computed DCG/IDCG per query") {
    // truth: q1 → {d2, d3} (d2 hits at rank 2); q2 → {d5} (rank 1 —
    // perfect); q3 → {d7} (missed); q4 → {d1} (query absent from
    // results)
    val truth = Seq((1L, 2L), (1L, 3L), (2L, 5L), (3L, 7L), (4L, 1L))
      .toDF("qid", "did")
    val got = Retrieval.ndcgAtK(results, truth, "qid", "did", k = 3)
      .as[(Long, Long, Double, Double, Double)].collect().toSeq
    val idcg2 = disc(1) + disc(2)
    assert(got == Seq(
      (1L, 2L, disc(2), idcg2, disc(2) / idcg2),
      (2L, 1L, disc(1), disc(1), 1.0),
      (3L, 1L, 0.0, disc(1), 0.0),
      (4L, 1L, 0.0, disc(1), 0.0)), s"got $got")
  }

  test("ndcg: a doc retrieved at several ranks counts once, at its " +
      "best rank — ndcg stays within [0, 1]") {
    val res = Seq((1L, 10L, 1), (1L, 10L, 3)).toDF("query_id", "doc_id",
      "rank")
    val truth = Seq((1L, 10L)).toDF("qid", "did")
    val got = Retrieval.ndcgAtK(res, truth, "qid", "did", k = 3)
      .as[(Long, Long, Double, Double, Double)].head()
    assert(got == ((1L, 1L, disc(1), disc(1), 1.0)), s"got $got")
  }

  test("ndcg: perfect prefix ranking scores exactly 1.0") {
    val res = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3))
      .toDF("query_id", "doc_id", "rank")
    val truth = Seq((1L, 10L), (1L, 11L), (1L, 12L)).toDF("qid", "did")
    val got = Retrieval.ndcgAtK(res, truth, "qid", "did", k = 3)
      .as[(Long, Long, Double, Double, Double)].collect().head
    assert(got._5 == 1.0, s"got $got")
  }

  test("ndcg: k cutoff excludes deeper hits; truth is deduped; IDCG " +
      "caps at k") {
    val res = Seq((1L, 2L, 1), (1L, 3L, 4)).toDF("query_id", "doc_id", "rank")
    // 5 relevant docs (one duplicated), k=3 → idcg over ranks 1..3 only
    val truth = Seq((1L, 2L), (1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L),
      (1L, 6L)).toDF("qid", "did")
    val got = Retrieval.ndcgAtK(res, truth, "qid", "did", k = 3)
      .as[(Long, Long, Double, Double, Double)].collect().head
    val idcg3 = disc(1) + disc(2) + disc(3)
    assert(got == (1L, 5L, disc(1), idcg3, disc(1) / idcg3), s"got $got")
  }

  test("ndcg: repartition invariance to the bit") {
    val rnd = new scala.util.Random(11)
    val res = (1 to 300).map(_ => (rnd.nextInt(8).toLong,
        rnd.nextInt(50).toLong, rnd.nextInt(10) + 1))
      .groupBy(t => (t._1, t._2)).map(_._2.head).toSeq
      .toDF("query_id", "doc_id", "rank")
    val truth = (1 to 100).map(_ => (rnd.nextInt(8).toLong,
        rnd.nextInt(50).toLong)).toDF("qid", "did")
    val a = Retrieval.ndcgAtK(res, truth, "qid", "did", k = 5)
      .collect().toSeq
    val b = Retrieval.ndcgAtK(res.repartition(7), truth.repartition(5),
        "qid", "did", k = 5).collect().toSeq
    assert(a == b)
  }
}
