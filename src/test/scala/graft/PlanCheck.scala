package graft
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = LocalSessions.builder(4, 4).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.01"
    val qs = if (args.nonEmpty) args.toSeq
      else Seq("p2_project_filter","j1_multi_join","a1_grouped_sum","w6_cumsum","j5_semi_join")
    for (q <- qs) {
      println(s"========== $q ==========")
      val plan = SparkEntry.queries(q)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      // print scan + join + agg lines only
      plan.linesIterator.foreach { l =>
        if (l.contains("Scan parquet") || l.contains("PushedFilters") || l.contains("ReadSchema")
          || l.contains("Join") || l.contains("Exchange") || l.contains("WholeStageCodegen")
          || l.contains("HashAggregate") || l.contains("Window") || l.contains("Sort"))
          println(l.take(200))
      }
    }
    spark.stop()
  }
}
