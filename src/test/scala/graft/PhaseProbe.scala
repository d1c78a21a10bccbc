package graft

/** Where does a query's wall time go — DataFrame construction (driver
  * builds/collects + plan assembly), analysis+optimization+physical
  * planning, or execution? `Test/runMain graft.PhaseProbe <sfDir> <q>...`
  * runs each query once warm, then reports the three phases separately.
  */
object PhaseProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val qs = args.drop(1).toSeq
    val spark = LocalSessions.builder(32, 32)
      .config("spark.sql.adaptive.enabled", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").write.format("noop")
      .mode("overwrite").save()
    for (q <- qs) {
      val fn = SparkEntry.queries(q)
      fn(spark, dir).write.format("noop").mode("overwrite").save() // warm
      for (rep <- 1 to 2) {
        val t0 = System.nanoTime()
        val df = fn(spark, dir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // force analysis + planning
        val t2 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t3 = System.nanoTime()
        println(f"PHASE $q rep$rep construct=${(t1 - t0) / 1e9}%.3f " +
          f"plan=${(t2 - t1) / 1e9}%.3f exec=${(t3 - t2) / 1e9}%.3f " +
          f"total=${(t3 - t0) / 1e9}%.3f")
      }
    }
    spark.stop()
  }
}
