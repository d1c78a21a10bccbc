package graft

import graft.engine.BacktestEngine
import graft.sources.Sources
import graft.strategy.MACross
import graft.ts.TimeSeriesOps

/** End-to-end golden regression ported from the reference test suite
  * (reference tests/test_strat.py:11-30): AAPL last 10Y, MA-cross, start
  * 5000 → exact final net worth.
  */
class GoldenBacktestSpec extends SparkTestBase {

  private lazy val aapl10y = {
    val bars = Sources.readOhlcvCsv(spark,
      "/root/reference/strat_backtest/data/aapl.csv")
    TimeSeriesOps.lastYears(bars, 10).cache()
  }

  private def finalNetWorth(fast: Int, lagging: Int): Double = {
    val res = BacktestEngine.run(aapl10y, MACross(fast, lagging), 5000.0)
    val rows = BacktestEngine.finalNetWorth(res).collect()
    assert(rows.length === 1)
    rows(0).getDouble(1)
  }

  test("golden: fast=36 lagging=40 -> 1283666.449897766") {
    assert(finalNetWorth(36, 40) === 1283666.449897766)
  }

  test("golden: fast=40 lagging=100 -> 61864.069396972656") {
    assert(finalNetWorth(40, 100) === 61864.069396972656)
  }

  test("last(10Y) slice matches pandas YearEnd semantics: 2379 rows from 2013-01-02") {
    assert(aapl10y.count() === 2379)
    val first = aapl10y.agg(org.apache.spark.sql.functions.min("date"))
      .collect()(0).getTimestamp(0)
    assert(first.toString.startsWith("2013-01-02"))
  }
}
