package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.BacktestEngine
import graft.sources.Sources
import graft.strategy.MACross
import graft.ts.TimeSeriesOps

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Runs the full backtest lifecycle (SURVEY.md §3.1) over the events
    * table mapped to bars (user_id→ticker, ts→date, value→close): signal
    * windows → per-ticker order fold → net-worth windows.
    */
  def entry(spark: SparkSession): DataFrame = {
    val bars = Sources.eventsAsBars(spark, "/root/testdata/sf0.001")
    BacktestEngine.run(bars, MACross(5, 20), 10000.0).daily
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a1_grouped_sum" -> ((s, dir) => {
      val li = s.read.parquet(s"$dir/lineitem.parquet")
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),
    "w6_cumsum" -> ((s, dir) => {
      val ev = Sources.readTable(s, dir, "events")
      val w = TimeSeriesOps.keyed("user_id", "ts")
      // 2-decimal doubles summed as exact decimals then cast back: the
      // result is bit-identical regardless of either engine's
      // accumulation order (see FIXTURES.md oracle caveats).
      val v = col("value").cast("decimal(18,2)")
      ev.select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
          col("event_id"),
          TimeSeriesOps.cumSum(v, w).cast("double").as("running_value"))
        .orderBy(col("user_id"), col("ts_us"), col("event_id"))
    }),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "a1_grouped_sum" ->
      """SELECT l_returnflag, l_linestatus,
         sum(l_quantity) AS sum_qty, count(*) AS n_rows
         FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""",
    "w6_cumsum" ->
      """SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_id,
         CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id ORDER BY ts
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
         FROM events ORDER BY user_id, ts_us, event_id""",
  )
}
