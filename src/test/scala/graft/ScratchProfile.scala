package graft

import org.apache.spark.sql.functions._

/** Scratch stage-by-stage profiler (not part of the suite). */
object ScratchProfile {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = LocalSessions.builder(32, 32)
      .config("spark.sql.adaptive.enabled", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.sources.Sources
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"SCRATCH $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val docs = Sources.readTable(spark, dir, "documents")
    noop(docs.select(col("doc_id")))

    // dd_semantic_prune stage by stage
    val emb = Sources.readTable(spark, dir, "embeddings")
      .withColumn("embedding", col("embedding").cast("array<double>"))
    time("emb scan+cast")(noop(emb))
    val pairs = graft.sim.Similarity.semanticNearDups(emb, "vec_id",
      "embedding", threshold = 0.3, nCentroids = 16)
    time("semanticNearDups")(noop(pairs))
    time("semanticNearDups again")(noop(pairs))
    var comps: org.apache.spark.sql.DataFrame = null
    time("connectedComponents")(
      { comps = graft.dedup.Dedup.connectedComponents(pairs); noop(comps) })
    val withQ = emb.join(docs
      .select(col("doc_id").as("vec_id"), col("n_chars")), "vec_id")
    time("withQ join")(noop(withQ))
    time("keepBestSurvivors full")(
      noop(graft.dedup.Dedup.keepBestSurvivors(withQ, "vec_id", pairs,
        "n_chars").select(col("vec_id"), col("n_chars"))
        .orderBy(col("vec_id"))))
    time("full query")(
      noop(SparkEntry.queries("dd_semantic_prune")(spark, dir)))
    spark.stop()
  }
}
