package graft

import org.apache.spark.sql.functions._

/** One-off measurement main for the IVFADC gate parameters (round-16
  * verdict #3): sweeps probe-side knobs (overFetch, nProbe,
  * extraProbes) and the code budget (kPerSub) at a given SF and
  * prints recall@5 vs exact brute force, plus wall time per variant.
  *
  *   sbt "Test/runMain graft.AdcRecallSweep /root/testdata/sf0.1 48"
  */
object AdcRecallSweep {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val nQueries = if (args.length > 1) args(1).toInt else 48
    val spark = LocalSessions.builder(32, 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .withColumn("embedding", col("embedding").cast("array<double>"))
    val queries = emb.filter(col("vec_id") < nQueries)
    val k = 5
    val exact = graft.sim.Similarity.bruteForceTopK(emb, "vec_id",
        "embedding", queries, "vec_id", "embedding", k)
      .select("query_id", "vec_id").cache()
    val denom = exact.count().toDouble
    val variants = Seq(
      // (label, nProbe, extraProbes, overFetch, kPerSub, refineSample)
      ("gate_r15", 8, 4, 8, 16, 256),
      ("of16", 8, 4, 16, 16, 256),
      ("of24", 8, 4, 24, 16, 256),
      ("of32", 8, 4, 32, 16, 256),
      ("np10_of16", 10, 4, 16, 16, 256),
      ("np12_of24", 12, 4, 24, 16, 256),
      ("k64_of8", 8, 4, 8, 64, 256),
      ("k64_of16", 8, 4, 16, 64, 256),
      ("k256_of8", 8, 4, 8, 256, 256),
      ("k256_of16", 8, 4, 16, 256, 256))
    variants.foreach { case (label, np, ep, of, kps, rs) =>
      val t0 = System.nanoTime()
      val res = graft.sim.Pq.ivfAdcTopK(emb, "vec_id", "embedding",
        queries, "vec_id", "embedding", k, dim = 64, nCentroids = 16,
        nProbe = np, m = 8, kPerSub = kps, overFetch = of,
        refineSample = rs, lloydIters = 2, extraProbes = ep,
        boundaryRho = 1.05)
      val r = res.select("query_id", "vec_id").intersect(exact)
        .count() / denom
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"SWEEP $label%-12s recall@5=$r%.3f time=$dt%.2f s")
    }
    spark.stop()
  }
}
