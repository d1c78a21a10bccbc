package graft

/** Dump `explain("formatted")` for named SparkEntry queries to files —
  * the optimization-round evidence artifact
  * (`plans/r16/<query>_<suffix>.txt`):
  * `Test/runMain graft.PlanDump <sfDir> <outDir> <suffix> <q>...`.
  * The plan is captured AFTER a warm run of the query (memoized builds
  * resolved, AQE initial plan), so the dump shows the plan the bench's
  * warm reps actually execute.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: PlanDump <sfDir> <outDir> <suffix> <queryName>...")
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val names = args.drop(3).toSeq
    // bench-shaped session (32 cores, AQE on) so the dumped plans carry
    // the same partitioning the bench runs with
    var b = LocalSessions.builder(32, 32)
      .config("spark.sql.adaptive.enabled", "true")
    // same conf-override seam as TuneProbe, so a conf-parameterized
    // before/after plan pair comes from one build
    sys.env.getOrElse("SPARK_TUNE_CONF", "").split(";")
      .map(_.trim).filter(_.contains("=")).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        b = b.config(k, v)
      }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query '$name'"))
      // warm run: fills session memos so the dumped plan is the steady
      // state (memo-hit) plan the bench times
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val plan = fn(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val w = new java.io.PrintWriter(
        new java.io.File(outDir, s"${name}_$suffix.txt"), "UTF-8")
      try w.println(plan) finally w.close()
      println(s"PLAN $name -> $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
