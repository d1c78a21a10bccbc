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

    // warmup
    noop(Sources.readTable(spark, dir, "events").select(col("ts")))

    // bt_metrics stage by stage
    for (round <- 1 to 2) {
      val bars = Sources.eventsAsBars(spark, dir)
      time(s"r$round bars scan")(noop(bars))
      val res = graft.engine.BacktestEngine.run(bars,
        graft.strategy.MACross(5, 20), 10000.0)
      time(s"r$round signals")(
        noop(graft.strategy.MACross(5, 20).signals(bars).toDF()))
      time(s"r$round orders count")(noop(res.orders.toDF()))
      time(s"r$round daily")(noop(res.daily))
      val ev = Sources.readTable(spark, dir, "events")
      val dayAgg = ev.groupBy(date_trunc("DAY", col("ts")).as("__day"))
        .agg((sum(col("value").cast("decimal(18,2)")).cast("double") /
          count(lit(1))).as("SP500"))
      time(s"r$round dayAgg")(noop(dayAgg))
      val daily = res.daily
        .withColumn("__day", date_trunc("DAY", col("date")))
        .join(broadcast(dayAgg), Seq("__day"), "left")
        .drop("__day")
      time(s"r$round metrics")(
        noop(graft.analytics.Metrics.compute(daily, res.orders, 10000.0, 0.03)))
      res.unpersist()
      time(s"r$round full query")(
        noop(SparkEntry.queries("bt_metrics")(spark, dir)))
      time(s"r$round stream_inc full")(
        noop(SparkEntry.queries("dd_stream_incremental_batch")(spark, dir)))
    }
    spark.stop()
  }
}
