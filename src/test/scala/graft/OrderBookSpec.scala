package graft

import java.sql.Timestamp
import java.time.LocalDate

import org.apache.spark.sql.functions._

import graft.engine.{BacktestEngine, TradingSession}

/** Unit-level validation of the order-book state machine against goldens
  * from the reference implementation driven with a scripted strategy
  * (src/test/resources/ref_orderbook_golden.json) covering: explicit
  * share counts, partial fills (remainder double-insert quirk), the
  * object-mutation double-close, stop-loss lazy drains on non-signal
  * dates, auto-sizing, and oversized-order rejection.
  */
class OrderBookSpec extends SparkTestBase {

  private val closes = Array(100.0, 98.0, 95.0, 90.0, 110.0, 120.0, 85.0,
    80.0, 125.0, 130.0, 70.0, 60.0, 140.0, 150.0, 65.0, 55.0, 160.0, 170.0,
    50.0, 45.0, 180.0, 190.0, 40.0, 35.0, 200.0, 210.0, 30.0, 25.0, 220.0,
    230.0)

  private val dates: Array[Timestamp] = (0 until 30).map { i =>
    Timestamp.valueOf(LocalDate.of(2020, 1, 1).plusDays(i).atStartOfDay())
  }.toArray

  private def runScripted(): TradingSession = {
    val s = new TradingSession(5000.0)
    // actions happen at the bar date, before that bar is observed —
    // stop-loss scans cover [order_start, trading_date) like the
    // reference's full-series scan (strats.py:318-322).
    val actions: Map[Int, TradingSession => Unit] = Map(
      0 -> (t => t.buy(dates(0), closes(0), numShares = 10)),
      2 -> (t => t.buy(dates(2), closes(2), numShares = 20, stopLoss = Some(92.0))),
      4 -> (t => t.sell(dates(4), closes(4), numShares = 15)),
      5 -> (t => t.buy(dates(5), closes(5))),
      8 -> (t => t.sell(dates(8), closes(8))),
      9 -> (t => t.buy(dates(9), closes(9), numShares = 3, stopLoss = Some(100.0))),
      12 -> (t => t.sell(dates(12), closes(12))),
      13 -> (t => t.buy(dates(13), closes(13), numShares = 100000)),
      16 -> (t => t.sell(dates(16), closes(16), numShares = 2)),
      17 -> (t => t.sell(dates(17), closes(17))))
    (0 until 30).foreach { i =>
      actions.get(i).foreach(_(s))
      s.observeBar(dates(i), closes(i))
    }
    s
  }

  private lazy val golden = {
    val src = scala.io.Source.fromFile(
      "src/test/resources/ref_orderbook_golden.json")
    val txt = try src.mkString finally src.close()
    txt
  }

  test("scripted session reproduces the reference orders table") {
    val s = runScripted()
    val fold = BacktestEngine.collectFold("TEST", s)
    // golden: 6 orders, rows 2&3 the duplicated remainder with final state
    assert(fold.orders.length === 6)
    val o = fold.orders
    def approxRow(i: Int, shares: Double, startA: Double, filled: Boolean,
        endA: Option[Double], profit: Option[Double]): Unit = {
      assert(o(i).num_shares === shares, s"row $i shares")
      assert(o(i).start_amount === startA, s"row $i startA")
      assert(o(i).filled === filled, s"row $i filled")
      assert(o(i).end_amount === endA, s"row $i endA")
      assert(o(i).profit === profit, s"row $i profit")
    }
    approxRow(0, 10.0, 100.0, filled = true, Some(90.0), Some(-100.0))
    approxRow(1, 15.0, 95.0, filled = true, Some(110.0), Some(225.0))
    approxRow(2, 5.0, 95.0, filled = true, Some(70.0), Some(-125.0))
    approxRow(3, 5.0, 95.0, filled = true, Some(70.0), Some(-125.0))
    approxRow(4, 40.0, 120.0, filled = true, Some(140.0), Some(800.0))
    approxRow(5, 3.0, 130.0, filled = false, None, None)
  }

  test("scripted session net worth matches reference daily frame") {
    import spark.implicits._
    val s = runScripted()
    val fold = BacktestEngine.collectFold("TEST", s)
    val bars = dates.zip(closes).map { case (d, c) =>
      ("TEST", d, c)
    }.toSeq.toDF("ticker", "date", "close")
    val daily = BacktestEngine.withNetWorth(
      bars, spark.createDataset(fold.trades).toDF(), 5000.0)
      .orderBy("date")
      .select("net_worth", "shares_owned", "buy", "sell")
      .collect()

    // golden arrays from the reference run
    val nw = goldenArray("net_worth")
    val so = goldenArray("shares_owned")
    val bc = goldenArray("buy_col")
    val sc = goldenArray("sell_col")
    (0 until 30).foreach { i =>
      assert(daily(i).getDouble(0) === nw(i), s"net_worth[$i]")
      assert(daily(i).getDouble(1) === so(i), s"shares_owned[$i]")
      assert(daily(i).getDouble(2) === bc(i), s"buy[$i]")
      assert(daily(i).getDouble(3) === sc(i), s"sell[$i]")
    }
    assert(daily(29).getDouble(0) === 6050.0)
  }

  private def goldenArray(key: String): Array[Double] = {
    val m = golden.indexOf("\"" + key + "\"")
    val start = golden.indexOf('[', m)
    val end = golden.indexOf(']', start)
    golden.substring(start + 1, end).split(",").map(_.trim.toDouble)
  }
}
