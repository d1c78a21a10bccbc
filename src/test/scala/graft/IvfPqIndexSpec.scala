package graft

import org.apache.spark.sql.functions._

import graft.sim.{Pq, Similarity}

/** The IVF-PQ persisted-index lifecycle (writeIvfPqIndex /
  * readIvfPqIndex / ivfPqTopKWithIndex): the cell-sorted index +
  * models round-trip exactly, and probing from the persisted index is
  * bit-identical to the in-session composed retriever.
  */
class IvfPqIndexSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .withColumn("embedding", col("embedding").cast("array<double>"))

  test("write -> read round-trips models exactly; the persisted probe " +
      "equals the in-session composed retriever to the bit") {
    val dir = java.nio.file.Files
      .createTempDirectory("ivfpq_index").toString
    val cents = Similarity.ivfCentroids(emb, "vec_id", "embedding",
      nCentroids = 16)
    val cbs = Pq.pqCodebooks(emb, "vec_id", "embedding", dim = 64,
      m = 8, kPerSub = 16)
    val index = Pq.ivfPqIndex(emb, "vec_id", "embedding", cents, cbs)
    Pq.writeIvfPqIndex(index, "vec_id", cents, cbs, dir)
    val (index2, cents2, cbs2) = Pq.readIvfPqIndex(spark, dir)
    cents.indices.foreach(c =>
      assert(cents2(c).toSeq == cents(c).toSeq, s"centroid $c"))
    cbs.indices.foreach(j => cbs(j).indices.foreach(c =>
      assert(cbs2(j)(c).toSeq == cbs(j)(c).toSeq, s"codebook ($j,$c)")))
    val a = index.as[(Long, Int, Seq[Int])].collect().toSet
    val b = index2.as[(Long, Int, Seq[Int])].collect().toSet
    assert(a == b)
    val q = emb.filter(col("vec_id") < 8)
    val direct = Pq.ivfPqTopK(emb, "vec_id", "embedding", q, "vec_id",
        "embedding", k = 5, dim = 64, nCentroids = 16, nProbe = 8,
        extraProbes = 4)
      .as[(Long, Long, Double, Int)].collect().toSet
    val fromIndex = Pq.ivfPqTopKWithIndex(index2, "vec_id", cents2,
        cbs2, emb, "vec_id", "embedding", q, "vec_id", "embedding",
        k = 5, nProbe = 8, extraProbes = 4)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(fromIndex == direct)
    assert(fromIndex.nonEmpty)
  }

  test("the persisted index scan prunes by cell (pushed filter on a " +
      "cell-sorted layout)") {
    val dir = java.nio.file.Files
      .createTempDirectory("ivfpq_prune").toString
    val cents = Similarity.ivfCentroids(emb, "vec_id", "embedding",
      nCentroids = 8)
    val cbs = Pq.pqCodebooks(emb, "vec_id", "embedding", dim = 64,
      m = 4, kPerSub = 8)
    Pq.writeIvfPqIndex(Pq.ivfPqIndex(emb, "vec_id", "embedding",
      cents, cbs), "vec_id", cents, cbs, dir)
    val (index, _, _) = Pq.readIvfPqIndex(spark, dir)
    val plan = index.filter(col("cell") === 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") &&
      !plan.contains("PushedFilters: []"),
      s"cell filters must reach the parquet scan:\n$plan")
  }

  test("updateIvfAdcIndex: frozen-model merge equals a rebuild over " +
      "the merged corpus; evicted ids never appear twice") {
    val cents = Similarity.ivfCentroids(emb, "vec_id", "embedding",
      nCentroids = 16)
    val cbs = Pq.pqCodebooksResidual(emb, "vec_id", "embedding", cents,
      dim = 64, m = 8, kPerSub = 16)
    val index = Pq.ivfAdcIndex(emb, "vec_id", "embedding", cents, cbs)
    val isFresh = col("vec_id") % 4 === 0 || col("vec_id") % 6 === 0
    val fresh = emb.filter(isFresh)
      .withColumn("embedding", reverse(col("embedding")))
    val merged = Pq.updateIvfAdcIndex(index, "vec_id", fresh, "vec_id",
      "embedding", cents, cbs)
    val mergedCorpus = emb.withColumn("embedding",
      when(isFresh, reverse(col("embedding")))
        .otherwise(col("embedding")))
    val rebuild = Pq.ivfAdcIndex(mergedCorpus, "vec_id", "embedding",
      cents, cbs)
    val a = merged.as[(Long, Int, Seq[Int])].collect()
    val b = rebuild.as[(Long, Int, Seq[Int])].collect().toSet
    assert(a.toSet == b && b.nonEmpty)
    // one row per id — a re-ingested vector must never appear twice
    assert(a.map(_._1).distinct.length == a.length)
    // the edit is visible: at least one fresh id changed cell or codes
    val orig = index.as[(Long, Int, Seq[Int])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(a.exists(r => orig(r._1) != ((r._2, r._3))),
      "reversing embeddings changed no index row — vacuous merge")
  }
}
