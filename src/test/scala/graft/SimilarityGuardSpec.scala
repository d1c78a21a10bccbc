package graft

import graft.sim.Similarity

/** Degenerate-input guards of the similarity tier: a zero-norm vector's
  * 0/0 NaN cosine must never rank (TopKAgg orders NaN greatest) or pair
  * (Spark's NaN-greatest compare passes any threshold), and the
  * self-match exclusion must be optional for unrelated id spaces.
  */
class SimilarityGuardSpec extends SparkTestBase {
  import spark.implicits._

  private def corpus = Seq(
    (1L, Seq(1.0, 0.0, 0.0, 0.0)),
    (2L, Seq(0.9, 0.1, 0.0, 0.0)),
    (3L, Seq(0.0, 0.0, 0.0, 0.0)), // zero norm -> NaN cosine
    (4L, Seq(0.0, 1.0, 0.0, 0.0))).toDF("vec_id", "v")

  test("a zero-norm corpus vector never ranks in top-k (both branches)") {
    val queries = Seq((100L, Seq(1.0, 0.0, 0.0, 0.0))).toDF("vec_id", "v")
    val kheap = Similarity.bruteForceTopK(corpus, "vec_id", "v",
      queries, "vec_id", "v", k = 3).collect()
    assert(kheap.map(_.getLong(1)).toSet === Set(1L, 2L, 4L))
    assert(kheap.forall(r => !r.getDouble(2).isNaN))
    // window branch (string ids)
    val cS = corpus.selectExpr("CAST(vec_id AS STRING) AS vec_id", "v")
    val qS = queries.selectExpr("CAST(vec_id AS STRING) AS vec_id", "v")
    val win = Similarity.bruteForceTopK(cS, "vec_id", "v",
      qS, "vec_id", "v", k = 3).collect()
    assert(win.map(_.getString(1)).toSet === Set("1", "2", "4"))
  }

  test("a zero-norm vector pairs with nothing in the near-dup operators") {
    val pairs = Similarity.cosineNearDups(corpus, "vec_id", "v",
      threshold = 0.5, planes = 1, maxBucket = 16)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      s"zero-norm vector must not pair, got $pairs")
    assert(pairs.contains((1L, 2L)))
    val sem = Similarity.semanticNearDups(corpus, "vec_id", "v",
      threshold = 0.5, nCentroids = 1)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(!sem.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("excludeSelf=false keeps a corpus row whose id collides with an " +
      "unrelated probe id") {
    // probe id 2 is a DIFFERENT entity than corpus id 2; with the
    // default exclusion the corpus row silently vanishes from its own
    // neighbor list
    val probes = Seq((2L, Seq(0.9, 0.1, 0.0, 0.0))).toDF("pid", "pv")
    val excluded = Similarity.bruteForceTopK(corpus, "vec_id", "v",
      probes, "pid", "pv", k = 4).collect().map(_.getLong(1)).toSet
    assert(!excluded.contains(2L))
    val kept = Similarity.bruteForceTopK(corpus, "vec_id", "v",
      probes, "pid", "pv", k = 4, excludeSelf = false)
      .collect().map(r => (r.getLong(1), r.getInt(3))).toMap
    assert(kept.contains(2L))
    assert(kept(2L) === 1, "the colliding id IS the nearest neighbor")
  }
}
