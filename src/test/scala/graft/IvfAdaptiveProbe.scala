package graft

import org.apache.spark.sql.functions._

import graft.sim.Similarity

/** Prototype: measure the recall/scan tradeoff of BOUNDARY-FALLBACK
  * probes — each query probes its nProbe nearest cells plus any cell
  * whose squared centroid distance is within `rho` of the nProbe-th
  * (capped at `extra` fallbacks). Driver-side probe-set construction
  * (48 queries); the production form would be a kernel + explode.
  *
  *   sbt "Test/runMain graft.IvfAdaptiveProbe /root/testdata/sf0.01 48"
  */
object IvfAdaptiveProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val nQueries = if (args.length > 1) args(1).toInt else 48
    val spark = LocalSessions.builder(8, 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .withColumn("embedding", col("embedding").cast("array<double>"))
    val queries = emb.filter(col("vec_id") < nQueries)
    val k = 5
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      queries, "vec_id", "embedding", k).select("query_id", "vec_id").cache()
    val denom = exact.count().toDouble

    val nCentroids = 16
    val cents = Similarity.ivfCentroids(emb, "vec_id", "embedding", nCentroids)
    val centSeq: Seq[Seq[Double]] = cents.toSeq.map(_.toSeq)
    val assigned = emb.select(col("vec_id"), col("embedding").as("__cv"),
      graft.functions.VectorFunctions
        .nearestCells(col("embedding"), centSeq, 1).getItem(0).as("__cell"))
      .cache()
    assigned.count()

    def l2(v: Array[Double], c: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < v.length) { val d = v(i) - c(i); acc += d * d; i += 1 }
      acc
    }
    val qv = queries.select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))

    for (nProbe <- Seq(8); rho <- Seq(1.02, 1.05, 1.10, 1.15, 1.25);
         extra <- Seq(4)) {
      val probeRows = qv.flatMap { case (qid, v) =>
        val d = cents.map(c => l2(v, c)).zipWithIndex.sortBy(_._1)
        val cut = d(nProbe - 1)._1 * rho
        val base = d.take(nProbe)
        val fallback = d.slice(nProbe, nProbe + extra).filter(_._1 <= cut)
        (base ++ fallback).map { case (_, cell) => (qid, cell) }
      }
      val scanBudget = probeRows.length / (qv.length.toDouble * nCentroids)
      val probes = probeRows.toSeq.toDF("query_id", "__cell")
        .join(queries.select(col("vec_id").as("query_id"),
          col("embedding").as("__qv")), "query_id")
      val scored = assigned.join(broadcast(probes), Seq("__cell"))
        .filter(col("vec_id") =!= col("query_id"))
        .withColumn("cosine", graft.functions.VectorFunctions
          .dot(col("__cv"), col("__qv")) /
          (graft.functions.VectorFunctions.norm(col("__cv")) *
            graft.functions.VectorFunctions.norm(col("__qv"))))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("query_id").orderBy(col("cosine").desc, col("vec_id"))
      val topk = scored.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= k).select("query_id", "vec_id")
      val r = topk.intersect(exact).count() / denom
      println(f"ADAPTIVE nProbe=$nProbe rho=$rho extra=$extra " +
        f"recall=$r%.3f probe_frac=$scanBudget%.3f")
    }
    spark.stop()
  }
}
