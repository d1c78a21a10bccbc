package graft

/** Conf-override A/B probe for the optimization rounds: times a query
  * subset under arbitrary session confs WITHOUT code churn, so a
  * partitioning/AQE hypothesis is one env var, not a rebuild.
  *
  *   SPARK_TUNE_CONF="k=v;k2=v2" SPARK_GRAFT_CPUS=32 \
  *     sbt "Test/runMain graft.TuneProbe <sfDir> <reps> <q1,q2,...>"
  *
  * Per query: one untimed warm pass, then `reps` timed noop-sink runs,
  * reporting median and min — the Bench statistic at probe scale.
  */
object TuneProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = args(1).toInt
    val qs = args(2).split(",").toSeq.map(_.trim).filter(_.nonEmpty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    var b = LocalSessions.builder(cpus, cpus)
      .config("spark.sql.adaptive.enabled", "true")
    sys.env.getOrElse("SPARK_TUNE_CONF", "").split(";")
      .map(_.trim).filter(_.contains("=")).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        b = b.config(k, v)
      }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").write.format("noop")
      .mode("overwrite").save()
    val out = qs.map { q =>
      val fn = SparkEntry.queries(q)
      fn(spark, dir).write.format("noop").mode("overwrite").save() // warm
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      val med =
        if (ts.size % 2 == 1) ts(ts.size / 2)
        else (ts(ts.size / 2 - 1) + ts(ts.size / 2)) / 2.0
      f"$q%-32s med ${med}%.3f  min ${ts.head}%.3f"
    }
    println("== TuneProbe cpus=" + cpus + " conf=" +
      sys.env.getOrElse("SPARK_TUNE_CONF", "(none)"))
    out.foreach(println)
    spark.stop()
  }
}
