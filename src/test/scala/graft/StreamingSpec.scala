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

  test("streaming exact dedup: duplicate fingerprints within the horizon drop") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val docs = input.toDS().toDF("ts", "doc_id", "text")
    val q = graft.streaming.StreamingPipeline
      .streamingExactDedup(docs, watermark = "1 hour")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    input.addData(
      (Timestamp.valueOf("2024-01-01 00:00:00"), 1L, "Hello, World!"),
      (Timestamp.valueOf("2024-01-01 00:05:00"), 2L, "hello   world"),  // same canon
      (Timestamp.valueOf("2024-01-01 00:10:00"), 3L, "something else"))
    q.processAllAvailable()
    input.addData(
      (Timestamp.valueOf("2024-01-01 00:20:00"), 4L, "HELLO WORLD"))    // dup again
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("dedup_out").select("doc_id")
      .collect().map(_.getLong(0)).sorted.toList
    assert(ids === List(1L, 3L)) // canonical dups 2 and 4 dropped, state kept across batches
  }

  test("stateless text tier (redact/repetition/sample) runs unchanged on a stream") {
    // PII redaction, repetition stats, and stratified sampling are pure
    // per-row expressions — the SAME code must run on readStream with no
    // watermark, no state, and produce batch-identical rows
    implicit val sc = spark.sqlContext
    import org.apache.spark.sql.functions._
    val rows = Seq(
      (1L, "en", "a a b mail bob@x.io"),
      (2L, "de", "x y z 10.0.0.1"),
      (3L, "en", "c c c c"),
      (4L, "fr", "call 555-0101 now"))
    def pipeline(df: org.apache.spark.sql.DataFrame) =
      graft.ops.Sampling.stratifiedSample(df, "doc_id", "lang",
          Seq("en" -> 1.0, "de" -> 1.0), defaultFraction = 0.0)
        .select(col("doc_id"),
          graft.textstats.TextStats.redactPii(col("text")).as("redacted"),
          graft.functions.TextFunctions.gramStats(
            split(lower(col("text")), "\\s+")).getField("top_token_count")
            .as("top_tok"))
    val input = MemoryStream[(Long, String, String)]
    val q = pipeline(input.toDS().toDF("doc_id", "lang", "text"))
      .writeStream.format("memory").queryName("text_tier_out")
      .outputMode("append").start()
    input.addData(rows: _*)
    q.processAllAvailable()
    q.stop()
    import spark.implicits._
    val streamed = spark.table("text_tier_out").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    val batch = pipeline(rows.toDF("doc_id", "lang", "text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    assert(streamed.toSeq === batch.toSeq)
    assert(!streamed.map(_._1).contains(4L)) // fr stratum sampled out
    assert(streamed.find(_._1 == 1L).get._2.endsWith("<EMAIL>"))
    assert(streamed.find(_._1 == 3L).get._3 === 4L)
  }

  test("streaming clean-corpus equals the batch composite on in-horizon data") {
    implicit val sc = spark.sqlContext
    import org.apache.spark.sql.functions._
    // long texts pass the quality gate (>= 20 tokens); doc 2 is an exact
    // dup of doc 1 modulo case/punct; doc 3 is too short and filtered
    // letter-only tokens: digits would trip the digit-ratio quality gate
    val long1 = (1 to 25).map(i => "lorem" * (i % 3 + 1)).mkString(" ")
    val rows = Seq(
      (Timestamp.valueOf("2024-01-01 00:00:00"), 1L, long1),
      (Timestamp.valueOf("2024-01-01 00:05:00"), 2L, long1.toUpperCase + "!"),
      (Timestamp.valueOf("2024-01-01 00:10:00"), 3L, "too short"),
      (Timestamp.valueOf("2024-01-01 00:15:00"), 4L,
        (1 to 30).map(i => "ipsum" * (i % 4 + 1)).mkString(" ")))
    val input = MemoryStream[(Timestamp, Long, String)]
    val q = graft.streaming.StreamingPipeline
      .streamingCleanCorpus(input.toDS().toDF("ts", "doc_id", "text"))
      .writeStream.format("memory").queryName("clean_out")
      .outputMode("append").start()
    input.addData(rows: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("clean_out")
      .select("doc_id", "n_tokens", "split", "clean_text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
      .sortBy(_._1)
    // batch composite over the same frame (global dedup == horizon dedup
    // here since everything is in one horizon)
    import spark.implicits._
    val batchDocs = rows.toDF("ts", "doc_id", "text")
    val batch = graft.textstats.TextStats.qualityFeatures(
        graft.dedup.Dedup.dropExactDups(batchDocs, "doc_id", "text"), "text")
      .filter(col("quality_score") >= 1.0 && col("n_tokens") >= 20)
      .select(col("doc_id"), col("n_tokens").cast("bigint"),
        graft.ops.Sampling.splitColumn(col("doc_id"),
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), 100),
        graft.textstats.TextStats.redactPii(col("text")))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
      .sortBy(_._1)
    assert(streamed.toSeq === batch.toSeq)
    assert(streamed.map(_._1).toSeq === Seq(1L, 4L)) // dup 2 + short 3 dropped
  }

  test("streaming session windows agree with batch sessionize boundaries") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, Double)]
    val events = input.toDS().toDF("ts", "user_id", "value")
    val q = graft.streaming.StreamingPipeline
      .streamingSessionize(events, gap = "30 minutes", watermark = "2 hours")
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    val rows = Seq(
      (Timestamp.valueOf("2024-01-01 00:00:00"), 1L, 1.0),
      (Timestamp.valueOf("2024-01-01 00:10:00"), 1L, 2.0),  // same session
      (Timestamp.valueOf("2024-01-01 01:00:00"), 1L, 3.0),  // gap > 30m: new session
      (Timestamp.valueOf("2024-01-01 00:05:00"), 2L, 4.0))
    input.addData(rows: _*)
    // advance the watermark past every session end so they finalize
    input.addData((Timestamp.valueOf("2024-01-01 09:00:00"), 9L, 0.0))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("sess_out")
      .filter(col("user_id") < 9)
      .select("user_id", "n_events", "sum_value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(r => (r._1, r._2, r._3)).toList
    // batch sessionize on the same rows: u1 -> sessions {1,2} and {3}; u2 -> {4}
    val batch = graft.ts.TimeSeriesOps.sessionize(
        spark.createDataset(rows).toDF("ts", "user_id", "value"),
        gapSeconds = 1800)
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n"), sum("value").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
      .sortBy(r => (r._1, r._2, r._3)).toList
    assert(out === batch)
    assert(out === List((1L, 1L, 3.0), (1L, 2L, 3.0), (2L, 1L, 4.0)))
  }

  test("streaming token counts aggregate across micro-batches per window") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val docs = input.toDS().toDF("ts", "text")
    val q = graft.streaming.StreamingPipeline
      .streamingTokenCounts(docs, window_ = "1 hour", watermark = "2 hours")
      .writeStream.format("memory").queryName("tok_out")
      .outputMode("complete").start()
    input.addData(
      (Timestamp.valueOf("2024-01-01 00:10:00"), "spark spark scan"),
      (Timestamp.valueOf("2024-01-01 00:40:00"), "spark sort"))
    q.processAllAvailable()
    input.addData(
      (Timestamp.valueOf("2024-01-01 01:20:00"), "spark scan"))
    q.processAllAvailable()
    q.stop()
    val counts = spark.table("tok_out")
      .collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2)).toList
    assert(counts === List(
      ("2024-01-01 00:00:00.0", "scan", 1L),
      ("2024-01-01 00:00:00.0", "sort", 1L),
      ("2024-01-01 00:00:00.0", "spark", 3L),
      ("2024-01-01 01:00:00.0", "scan", 1L),
      ("2024-01-01 01:00:00.0", "spark", 1L)))
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
