package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.engine.BacktestEngine
import graft.model.SignalBar
import graft.streaming.StreamingBacktest

/** The streaming fold must agree with the batch fold when fed the same
  * bars split across micro-batches (same TradingSession code path).
  */
class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  private def bar(t: String, day: Int, close: Double, buy: Boolean,
      sell: Boolean): SignalBar =
    SignalBar(t, Timestamp.valueOf(f"2024-01-$day%02d 00:00:00"), close, buy, sell)

  test("streaming fold equals batch fold across micro-batches") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[SignalBar]
    val query = StreamingBacktest.foldStream(input.toDS(), 1000.0)
      .writeStream.format("memory").queryName("trades_out")
      .outputMode("append").start()

    val batch1 = Seq(
      bar("A", 1, 10.0, buy = true, sell = false),
      bar("A", 3, 12.0, buy = false, sell = true))
    val batch2 = Seq(
      bar("A", 5, 11.0, buy = true, sell = false),
      bar("A", 8, 15.0, buy = false, sell = true),
      bar("B", 2, 50.0, buy = true, sell = false))
    input.addData(batch1: _*)
    query.processAllAvailable()
    input.addData(batch2: _*)
    query.processAllAvailable()
    query.stop()

    val streamed = spark.table("trades_out")
      .groupBy("ticker", "date")
      .agg(expr("max_by(buy_shares, date)").as("buy_shares"),
        expr("max_by(sell_shares, date)").as("sell_shares"),
        expr("max_by(shares_owned, date)").as("shares_owned"))
      .orderBy("ticker", "date")
      .collect()

    val batchFold = BacktestEngine.foldSignals(
      spark.createDataset(batch1 ++ batch2), 1000.0)
      .collect().flatMap(_.trades)
      .sortBy(t => (t.ticker, t.date.getTime))

    assert(streamed.length === batchFold.length)
    streamed.zip(batchFold).foreach { case (s, b) =>
      assert(s.getString(0) === b.ticker)
      assert(s.getTimestamp(1) === b.date)
      assert(Option(s.get(2)).map(_.asInstanceOf[Double]) === b.buy_shares)
      assert(Option(s.get(3)).map(_.asInstanceOf[Double]) === b.sell_shares)
      assert(Option(s.get(4)).map(_.asInstanceOf[Double]) === b.shares_owned)
    }
  }

  test("watermarked windowed indicator runs over a bounded stream") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, Double)]
    val ds = input.toDS().toDF("ts", "user_id", "value")
    val agg = StreamingBacktest.windowedIndicator(ds, "1 hour", "30 minutes",
      "2 hours")
    val q = agg.toDF().writeStream.format("memory").queryName("win_out")
      .outputMode("complete").start()
    input.addData(
      (Timestamp.valueOf("2024-01-01 00:10:00"), 1L, 5.0),
      (Timestamp.valueOf("2024-01-01 00:40:00"), 1L, 7.0),
      (Timestamp.valueOf("2024-01-01 01:20:00"), 1L, 3.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("win_out").collect()
    assert(rows.nonEmpty)
    val total = spark.table("win_out")
      .agg(sum("n")).collect()(0).getLong(0)
    assert(total >= 3) // each event lands in >= 1 sliding window
  }
}
