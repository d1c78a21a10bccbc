package graft

/** Time individual SparkEntry queries: Test/runMain graft.TimeQuery <sfDir> <q>... */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val qs = args.drop(1).toSeq
    val spark = LocalSessions.builder(32, 32)
      .config("spark.sql.adaptive.enabled", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    for (q <- qs) {
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, dir).write.format("noop").mode("overwrite").save()
      println(f"TIMEQ $q ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
