package graft

/** Scratch: where does ts_logreg_* time go at sf0.1. */
object LrProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = LocalSessions.builder(32, 32)
      .config("spark.sql.adaptive.enabled", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").write.format("noop")
      .mode("overwrite").save()
    val docs = graft.sources.Sources.readTable(spark, dir, "documents")
    def t[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"LRPROBE $what ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    t("docs.count")(docs.count())
    val feats = graft.textstats.LogReg.features(docs, "doc_id", "text")
    t("features.count cold")(feats.count())
    t("features.count warm")(feats.count())
    val p = feats.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("persist+count")(p.count())
    t("counted again (cached)")(p.count())
    t("train from cache (fast)")(
      graft.textstats.LogReg.train(docs, "doc_id", "text", 12))
    t("train again (fast)")(
      graft.textstats.LogReg.train(docs, "doc_id", "text", 12))
    p.unpersist()
    spark.stop()
  }
}
