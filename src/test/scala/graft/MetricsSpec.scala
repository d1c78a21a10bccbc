package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.analytics.Metrics
import graft.engine.BacktestEngine
import graft.sources.Sources
import graft.strategy.{MACross, TenPercent}
import graft.ts.TimeSeriesOps

/** Validates the 19-metric analytics pass against goldens produced by
  * running the *actual reference implementation* offline (stubbed
  * yfinance with a deterministic index series on the aapl calendar; see
  * src/test/resources/ref_metrics_golden.json). Index series:
  * sp500[i] = 100 + 0.125·i + (i mod 97)·0.25 over the full aapl csv row
  * index — exact-representable doubles, so both engines agree bit-wise on
  * inputs.
  */
class MetricsSpec extends SparkTestBase {

  private lazy val golden = {
    val src = scala.io.Source.fromFile(
      "src/test/resources/ref_metrics_golden.json")
    val txt = try src.mkString finally src.close()
    ujsonLite(txt)
  }

  // minimal JSON reader (numbers + strings + nesting) to avoid deps
  private def ujsonLite(s: String): Map[String, Map[String, Any]] = {
    // fixture is flat enough for a tiny recursive-descent parse
    var i = 0
    def ws(): Unit = while (i < s.length && s(i).isWhitespace) i += 1
    def parse(): Any = {
      ws()
      s(i) match {
        case '{' =>
          i += 1
          val m = scala.collection.mutable.LinkedHashMap[String, Any]()
          ws()
          if (s(i) == '}') { i += 1; return m.toMap }
          while (true) {
            ws()
            val k = parse().asInstanceOf[String]
            ws(); assert(s(i) == ':'); i += 1
            m(k) = parse()
            ws()
            if (s(i) == ',') i += 1
            else { assert(s(i) == '}'); i += 1; return m.toMap }
          }
          m.toMap
        case '"' =>
          i += 1
          val sb = new StringBuilder
          while (s(i) != '"') {
            if (s(i) == '\\') { i += 1; sb.append(s(i)) } else sb.append(s(i))
            i += 1
          }
          i += 1
          sb.toString
        case _ =>
          val start = i
          while (i < s.length && "-+.eE0123456789aNIfinty".contains(s(i))) i += 1
          val tok = s.substring(start, i)
          if (tok == "NaN") Double.NaN else tok.toDouble
      }
    }
    parse().asInstanceOf[Map[String, Any]]
      .map { case (k, v) => k -> v.asInstanceOf[Map[String, Any]] }
  }

  private lazy val fullAapl = Sources.readOhlcvCsv(spark,
    "/root/reference/strat_backtest/data/aapl.csv").cache()

  private lazy val indexDf = {
    val w = Window.partitionBy("ticker").orderBy("date")
    fullAapl.select(col("date"),
      (lit(100.0) + (row_number().over(w) - 1) * 0.125
        + ((row_number().over(w) - 1) % 97) * 0.25).as("SP500"))
  }

  private def metricsFor(fast: Int, lagging: Int): Map[String, Any] = {
    val bars = TimeSeriesOps.lastYears(fullAapl, 10)
    val res = BacktestEngine.run(bars, MACross(fast, lagging), 5000.0)
    val daily = BacktestEngine.joinIndex(res.daily, indexDf)
    val m = Metrics.compute(daily, res.orders, 5000.0, riskFreeRate = 0.03)
    val row = m.collect()(0)
    m.columns.zip(row.toSeq).toMap
  }

  private def approx(a: Double, b: Double, tol: Double = 1e-12): Boolean =
    (a.isNaN && b.isNaN) || math.abs(a - b) <= tol * math.max(1.0, math.max(math.abs(a), math.abs(b)))

  for ((fast, lagging) <- Seq((36, 40), (40, 100))) {
    test(s"metrics match reference run (fast=$fast lagging=$lagging)") {
      val g = golden(s"ma_${fast}_$lagging")("stats").asInstanceOf[Map[String, Any]]
      val got = metricsFor(fast, lagging)
      def num(k: String): Double = g(k).asInstanceOf[Double]
      assert(got("end_amount").asInstanceOf[Double] === num("End Amount"))
      assert(got("average_hold_time") === g("Average Hold Time"))
      val checks = Seq(
        "average_losses" -> "Average Losses",
        "average_profits" -> "Average Profits",
        "biggest_loss" -> "Biggest Loss",
        "biggest_win" -> "Biggest Win",
        "cagr_pct" -> "Compound Annual Growth Rate (%) ",
        "max_drawdown_pct" -> "Max Drawdown (%)",
        "average_drawdown_pct" -> "Average Drawdown (%)",
        "net_profit" -> "Net Profit",
        "profit_factor" -> "Profit Factor",
        "risk_reward" -> "Risk Reward",
        "sharpe_ratio" -> "Sharpe Ratio",
        "volatility_annualized" -> "Volatility Annualized (% change)",
        "beta" -> "Beta",
        "alpha" -> "Alpha",
        "r_squared" -> "R-Squared")
      checks.foreach { case (ours, theirs) =>
        val a = got(ours).asInstanceOf[Double]
        val b = num(theirs)
        assert(approx(a, b), s"$ours: got $a expected $b")
      }
    }
  }

  test("Ten_Percent_Strat golden final net worth") {
    val g = golden("ten_pct")
    val bars = TimeSeriesOps.lastYears(fullAapl, 10)
    val res = BacktestEngine.run(bars, TenPercent(), 5000.0)
    val nw = BacktestEngine.finalNetWorth(res).collect()(0).getDouble(1)
    assert(nw === g("final_net_worth").asInstanceOf[Double])
    assert(res.orders.count() === g("n_orders").asInstanceOf[Double].toLong)
  }
}
