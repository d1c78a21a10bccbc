package graft

import org.apache.spark.sql.functions._

import graft.sim.KMeans

/** The small-corpus single-task Lloyd replay (KMeans.lloydLocal):
  * fast ≡ iterative BIT-EXACT on the real embedding corpus — the
  * local argmin, HALF_UP quantization and de-scale must replay the
  * distributed expressions op-for-op — plus gating and the untouched
  * iterative path above the bound.
  */
class KMeansFastPathSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .withColumn("embedding", col("embedding").cast("array<double>"))

  test("kmeansCentroids: fast ≡ iterative to the bit (3 rounds, k=4)") {
    val fast = KMeans.kmeansCentroids(emb, "vec_id", "embedding",
        dim = 64, k = 4, iterations = 3)
      .collect().map(_.toSeq).toSet
    val iter = KMeans.kmeansCentroids(emb, "vec_id", "embedding",
        dim = 64, k = 4, iterations = 3, smallCorpusCells = 0L)
      .collect().map(_.toSeq).toSet
    assert(fast == iter && fast.nonEmpty)
    // non-degenerate: some centroid moved off its seed and clusters
    // are populated
    val ns = iter.map(_(3).asInstanceOf[Long])
    assert(ns.exists(_ > 1L), s"degenerate cluster sizes $ns")
  }

  test("kmeansRefine: fast ≡ iterative from caller-supplied seeds") {
    val seeds = graft.sim.Similarity.ivfCentroids(emb, "vec_id",
      "embedding", nCentroids = 8)
    val fast = KMeans.kmeansRefine(emb, "embedding", dim = 64, seeds,
        iterations = 2)
      .collect().map(_.toSeq).toSet
    val iter = KMeans.kmeansRefine(emb, "embedding", dim = 64, seeds,
        iterations = 2, smallCorpusCells = 0L)
      .collect().map(_.toSeq).toSet
    assert(fast == iter && fast.nonEmpty)
  }

  test("kmeansAssign: fast ≡ iterative per-row assignments") {
    val fast = KMeans.kmeansAssign(emb, "vec_id", "embedding",
        dim = 64, k = 4, iterations = 2)
      .as[(Long, Long)].collect().toSet
    val iter = KMeans.kmeansAssign(emb, "vec_id", "embedding",
        dim = 64, k = 4, iterations = 2, smallCorpusCells = 0L)
      .as[(Long, Long)].collect().toSet
    assert(fast == iter && fast.nonEmpty)
    assert(fast.map(_._2).size > 0)
  }

  test("empty clusters keep their previous centroid on both paths") {
    // k = 12 over 16 rows with 2 rounds reliably leaves some cluster
    // empty in round 2; equality of the full (coord, n) surface pins
    // the keep-previous rule on the fast path too
    val small = emb.orderBy(col("vec_id")).limit(16)
    val fast = KMeans.kmeansCentroids(small, "vec_id", "embedding",
        dim = 64, k = 12, iterations = 2)
      .collect().map(_.toSeq).toSet
    val iter = KMeans.kmeansCentroids(small, "vec_id", "embedding",
        dim = 64, k = 12, iterations = 2, smallCorpusCells = 0L)
      .collect().map(_.toSeq).toSet
    assert(fast == iter && fast.nonEmpty)
  }
}
