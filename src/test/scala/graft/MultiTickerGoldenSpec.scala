package graft

import org.apache.spark.sql.functions._

import graft.engine.BacktestEngine
import graft.sources.Sources
import graft.strategy.MACross

/** All four reference tickers — full histories, including msft's 1326
  * null-close pre-IPO rows — as ONE long frame through ONE engine run,
  * compared bit-exactly against per-ticker runs of the reference
  * implementation (src/test/resources/ref_multiticker_golden.json,
  * MACross fast=20 lagging=100, initial 5000). The full histories push
  * the state machine through its pathological paths (negative buying
  * power, auto-size on negative amounts) that the 10Y goldens never
  * reach.
  */
class MultiTickerGoldenSpec extends SparkTestBase {

  private lazy val golden: Map[String, (Double, Long)] = {
    val src = scala.io.Source.fromFile(
      "src/test/resources/ref_multiticker_golden.json")
    val txt = try src.mkString finally src.close()
    Seq("aapl", "amzn", "msft", "qqq").map { t =>
      val block = txt.substring(txt.indexOf("\"" + t + "\""))
      def num(k: String): String = {
        val i = block.indexOf("\"" + k + "\"")
        block.substring(block.indexOf(':', i) + 1,
          block.indexWhere(c => c == ',' || c == '\n', i + k.length + 4)).trim
      }
      t -> (num("final_net_worth").toDouble, num("n_orders").toLong)
    }.toMap
  }

  test("four tickers in one frame reproduce per-ticker reference runs bit-exactly") {
    val bars = Sources.readOhlcvCsv(spark,
      "/root/reference/strat_backtest/data")
    assert(bars.select("ticker").distinct().count() === 4)
    val res = BacktestEngine.run(bars, MACross(20, 100), 5000.0)
    val nw = BacktestEngine.finalNetWorth(res).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val orderCounts = res.orders.groupBy("ticker").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    golden.foreach { case (t, (gnw, gorders)) =>
      assert(nw(t) === gnw, s"$t net worth")
      assert(orderCounts(t) === gorders, s"$t order count")
    }
  }

  test("msft null-prefix rows flow through windows and net worth like pandas") {
    val bars = Sources.readOhlcvCsv(spark,
      "/root/reference/strat_backtest/data/msft.csv")
    val res = BacktestEngine.run(bars, MACross(20, 100), 5000.0)
    // pandas: net_worth is NaN exactly where close is NaN (pre-IPO rows)
    val counts = res.daily.agg(
      sum(when(col("close").isNull, 1).otherwise(0)),
      sum(when(col("net_worth").isNull, 1).otherwise(0))).collect()(0)
    assert(counts.getLong(0) === 1326L)
    assert(counts.getLong(1) === 1326L)
  }
}
