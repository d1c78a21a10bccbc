package graft

/** Throwaway plan inspector for development (Test/runMain graft.PlanProbe q1 q2…). */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestBase.session
    args.foreach { q =>
      println(s"===== $q =====")
      println(SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
