package graft

import org.apache.spark.sql.functions._

import graft.sim.Similarity

/** k-NN label vote: majority over the neighbor set, ties to the smallest
  * label, generator-agnostic (any (query_id, vec_id, rank) frame votes).
  */
class KnnClassifySpec extends SparkTestBase {
  import spark.implicits._

  // three tight clusters around orthogonal-ish axes; labels follow the
  // cluster (no outliers — the 5/5 vote assertion depends on that)
  private def v(axis: Int, eps: Double): Seq[Double] =
    Seq.tabulate(6)(i => (if (i == axis) 1.0 else 0.0) + eps * (i + 1))

  private val corpus = (
    (1 to 5).map(i => (i.toLong, v(0, 0.001 * i), 7)) ++
    (11 to 15).map(i => (i.toLong, v(2, 0.001 * (i - 10)), 3)) ++
    (21 to 25).map(i => (i.toLong, v(4, 0.001 * (i - 20)), 9))
  ).toDF("vec_id", "embedding", "label")

  test("majority vote follows the query's cluster") {
    val queries = Seq(
      (100L, v(0, 0.0007)), (101L, v(2, 0.0007)), (102L, v(4, 0.0007)))
      .toDF("vec_id", "embedding")
    val got = Similarity.knnClassify(corpus, "vec_id", "embedding", "label",
        queries, "vec_id", "embedding", k = 5)
      .as[(Long, Int, Long)].collect().sortBy(_._1)
    assert(got.map(r => (r._1, r._2)).toSeq ==
      Seq((100L, 7), (101L, 3), (102L, 9)), s"got ${got.toSeq}")
    assert(got.forall(_._3 == 5L), "tight clusters must vote 5/5")
  }

  test("vote ties break to the smallest label") {
    // hand-built neighbor frame: 2 votes each for labels 5 and 2
    val neighbors = Seq(
      (100L, 1L, 1), (100L, 2L, 2), (100L, 3L, 3), (100L, 4L, 4))
      .toDF("query_id", "vec_id", "rank")
    val labels = Seq((1L, 5), (2L, 5), (3L, 2), (4L, 2))
      .toDF("vec_id", "label")
    val got = Similarity.knnVote(neighbors, labels, "vec_id", "label")
      .as[(Long, Int, Long)].collect()
    assert(got.toSeq == Seq((100L, 2, 2L)),
      s"tie must resolve to the smaller label, got ${got.toSeq}")
  }

  test("vote is generator-agnostic and repartition-invariant") {
    val queries = Seq((100L, v(0, 0.0007))).toDF("vec_id", "embedding")
    val nb = Similarity.bruteForceTopK(corpus, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 5)
    val a = Similarity.knnVote(nb.repartition(7), corpus, "vec_id", "label")
      .collect().toSeq
    val b = Similarity.knnVote(nb.coalesce(1), corpus, "vec_id", "label")
      .collect().toSeq
    assert(a == b)
  }
}
