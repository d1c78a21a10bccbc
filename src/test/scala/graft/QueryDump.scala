package graft

/** Scratch utility: dump selected SparkEntry queries to parquet for a
  * one-off oracle compare without a full Verify pass.
  * Usage: Test/runMain graft.QueryDump <sfDir> <outDir> <q1> [q2 ...]
  */
object QueryDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1)
    val spark = LocalSessions.builder(4, 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(2).foreach { q =>
      SparkEntry.queries(q)(spark, sfDir).coalesce(1).write
        .mode("overwrite").parquet(s"$outDir/$q")
      println(s"DUMPED $q")
    }
    spark.stop()
  }
}
