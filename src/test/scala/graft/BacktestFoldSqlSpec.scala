package graft

import org.apache.spark.sql.functions.{col, explode}

import graft.engine.{BacktestEngine, BacktestResult}
import graft.model.{FoldOut, OrderRow}
import graft.sources.Sources
import graft.strategy.MACross
import graft.ts.TimeSeriesOps

/** Parity of the SQL-callable backtest fold (`backtest_fold`, SURVEY.md
  * §7.3 optional item) with the typed `groupByKey.mapGroups` path: same
  * signal frame, same fold, bit-identical FoldOut — and the reference's
  * exact golden net worth (tests/test_strat.py:27) when the SQL fold's
  * trades drive the daily net-worth frame.
  */
class BacktestFoldSqlSpec extends SparkTestBase {

  private lazy val aapl10y = {
    val bars = Sources.readOhlcvCsv(spark,
      "/root/reference/strat_backtest/data/aapl.csv")
    TimeSeriesOps.lastYears(bars, 10).cache()
  }

  private lazy val sqlFold = {
    import spark.implicits._
    GraftExtensions.register(spark)
    MACross(36, 40).signals(aapl10y).toDF()
      .createOrReplaceTempView("__fold_signals")
    spark.sql(
      """SELECT ticker,
        |       backtest_fold(ticker, date, close, isBuy, isSell, 5000.0D)
        |         AS fold
        |FROM __fold_signals GROUP BY ticker""".stripMargin)
      .cache()
  }

  test("backtest_fold via spark.sql is bit-identical to the typed fold") {
    import spark.implicits._
    val fromSql = sqlFold.select("fold.*").as[FoldOut].collect()
    val typed = BacktestEngine
      .foldSignals(MACross(36, 40).signals(aapl10y), 5000.0).collect()
    assert(fromSql.length === 1 && typed.length === 1)
    assert(fromSql(0).orders === typed(0).orders)
    assert(fromSql(0).trades === typed(0).trades)
  }

  test("golden net worth through the SQL fold: 1283666.449897766") {
    import spark.implicits._
    val trades = sqlFold
      .select(explode(col("fold.trades")).as("t")).select("t.*")
    val daily = BacktestEngine.withNetWorth(
      BacktestEngine.normalize(aapl10y), trades, 5000.0)
    val rows = BacktestEngine.finalNetWorth(
      BacktestResult(daily, spark.emptyDataset[OrderRow])).collect()
    assert(rows.length === 1)
    assert(rows(0).getDouble(1) === 1283666.449897766)
  }

  test("differing initial amounts in one group fail instead of folding") {
    import spark.implicits._
    MACross(36, 40).signals(aapl10y).toDF()
      .createOrReplaceTempView("__fold_signals_bad")
    val bad = spark.sql(
      """SELECT ticker,
        |       backtest_fold(ticker, date, close, isBuy, isSell,
        |                     CASE WHEN isBuy THEN 5000.0D ELSE 6000.0D END)
        |         AS fold
        |FROM __fold_signals_bad GROUP BY ticker""".stripMargin)
    val e = intercept[Exception] { bad.collect() }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("initial_amount must be constant")))
  }
}
