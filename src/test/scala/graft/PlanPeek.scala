package graft

/** Ad-hoc `.explain` dump for one or more driver queries — test-scope
  * tooling, not shipped. Usage:
  *   sbt "Test/runMain graft.PlanPeek <sfDir> <query>..."
  */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val qs = args.drop(1).toSeq
    val spark = LocalSessions.builder(32, 32)
      .config("spark.sql.adaptive.enabled", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- qs) {
      println(s"===== $q =====")
      SparkEntry.queries(q)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
