package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Joins

class JoinsSpec extends SparkTestBase {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def quotes: DataFrame = {
    import spark.implicits._
    Seq(
      ("a", ts("2024-01-01 10:00:00"), 100.0),
      ("a", ts("2024-01-01 10:00:05"), 101.0),
      ("a", ts("2024-01-01 10:00:10"), 102.0),
      ("b", ts("2024-01-01 10:00:03"), 50.0))
      .toDF("k", "t", "quote")
  }

  private def trades: DataFrame = {
    import spark.implicits._
    Seq(
      ("a", ts("2024-01-01 09:59:59"), 1L),  // before any quote
      ("a", ts("2024-01-01 10:00:05"), 2L),  // exact tie -> inclusive
      ("a", ts("2024-01-01 10:00:07"), 3L),
      ("a", ts("2024-01-01 10:01:00"), 4L),
      ("b", ts("2024-01-01 10:00:02"), 5L),  // before b's only quote
      ("c", ts("2024-01-01 10:00:00"), 6L))  // key with no quotes
      .toDF("k", "t", "trade_id")
  }

  test("asof backward: latest quote at-or-before, nulls when none") {
    val out = Joins.asofJoin(trades, quotes, Seq("k"), "t", "t")
      .orderBy("trade_id")
      .select("trade_id", "quote")
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(out === Map(1L -> None, 2L -> Some(101.0), 3L -> Some(101.0),
      4L -> Some(102.0), 5L -> None, 6L -> None))
  }

  test("asof forward: earliest quote at-or-after") {
    val out = Joins.asofJoin(trades, quotes, Seq("k"), "t", "t",
        direction = "forward")
      .orderBy("trade_id")
      .select("trade_id", "quote")
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(out === Map(1L -> Some(100.0), 2L -> Some(101.0),
      3L -> Some(102.0), 4L -> None, 5L -> Some(50.0), 6L -> None))
  }

  test("asof tolerance nulls out stale matches but keeps the left row") {
    val out = Joins.asofJoin(trades, quotes, Seq("k"), "t", "t",
        toleranceMicros = Some(3L * 1000000))
      .orderBy("trade_id")
      .select("trade_id", "quote")
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    // trade 3 is 2s after quote@05 (ok); trade 4 is 50s after quote@10
    assert(out === Map(1L -> None, 2L -> Some(101.0), 3L -> Some(101.0),
      4L -> None, 5L -> None, 6L -> None))
    assert(Joins.asofJoin(trades, quotes, Seq("k"), "t", "t",
      toleranceMicros = Some(3L * 1000000)).count() === trades.count())
  }

  test("asof matches a naive max_by formulation on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val l = (1 to 300).map(i => (s"k${rnd.nextInt(5)}",
      new Timestamp(1700000000000L + rnd.nextInt(100000) * 1000L), i.toLong))
      .toDF("k", "t", "trade_id")
    val r = (1 to 200).map { i =>
      (s"k${rnd.nextInt(6)}",
        new Timestamp(1700000000000L + rnd.nextInt(100000) * 1000L),
        rnd.nextDouble())
    }.toDF("k", "t", "v")
      .groupBy("k", "t").agg(max("v").as("v")) // unique per (k, t)

    val fast = Joins.asofJoin(l, r, Seq("k"), "t", "t")
      .select(col("trade_id"), col("v"), col("t_matched"))
    // naive: join all earlier-or-equal quotes, keep the latest per trade
    val naive = l.join(r.select(col("k"), col("t").as("rt"), col("v")),
        Seq("k"), "left")
      .withColumn("ok", col("rt") <= col("t"))
      .groupBy("trade_id")
      .agg(expr("max_by(v, CASE WHEN ok THEN rt END)").as("v"),
        max(when(col("ok"), col("rt"))).as("t_matched"))
    val diff = fast.exceptAll(naive).count() + naive.exceptAll(fast).count()
    assert(diff === 0)
  }

  test("range join equals plain between-join on random intervals") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val probe = (1 to 400).map(i =>
        (new Timestamp(1700000000000L + rnd.nextInt(500000) * 1000L), i.toLong))
      .toDF("pt", "probe_id")
    val iv = (1 to 40).map { i =>
      val s = 1700000000000L + rnd.nextInt(400000) * 1000L
      (new Timestamp(s), new Timestamp(s + (1 + rnd.nextInt(120000)) * 1000L),
        i.toLong)
    }.toDF("ws", "we", "iv_id")

    val fast = Joins.rangeJoin(probe, "pt", iv, "ws", "we",
        bucketSeconds = 60L)
      .select("probe_id", "iv_id")
    val naive = probe.crossJoin(iv)
      .filter(col("pt") >= col("ws") && col("pt") < col("we"))
      .select("probe_id", "iv_id")
    val diff = fast.exceptAll(naive).count() + naive.exceptAll(fast).count()
    assert(diff === 0)
  }

  test("range join fails fast on an interval spanning too many buckets") {
    import spark.implicits._
    val probe = Seq((ts("2024-01-01 10:00:05"), 1L)).toDF("pt", "probe_id")
    // a year-long interval at 1 s buckets = ~31M exploded rows from ONE
    // input row — the guard must kill the job before the fan-out runs
    val iv = Seq((ts("2024-01-01 00:00:00"), ts("2025-01-01 00:00:00"), 7L))
      .toDF("ws", "we", "iv_id")
    val e = intercept[Exception] {
      Joins.rangeJoin(probe, "pt", iv, "ws", "we", bucketSeconds = 1L)
        .count()
    }
    assert(e.getMessage != null && e.getMessage.contains("maxBucketsPerInterval")
        || Option(e.getCause).exists(_.getMessage.contains("maxBucketsPerInterval")),
      s"expected the bucket-span guard to fire, got: $e")
    // the same data passes once the bucket width fits the interval scale
    val ok = Joins.rangeJoin(probe, "pt", iv, "ws", "we",
      bucketSeconds = 86400L).select("probe_id", "iv_id").collect()
    assert(ok.map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((1L, 7L)))
  }

  test("range join: null/empty/inverted intervals are non-matches, not errors") {
    import spark.implicits._
    val probe = Seq((ts("2024-01-01 10:00:05"), 1L)).toDF("pt", "probe_id")
    val iv = Seq(
      (Option(ts("2024-01-01 10:00:00")), Option(ts("2024-01-01 11:00:00")), 1L),
      (Option.empty[Timestamp], Option(ts("2024-01-01 11:00:00")), 2L),
      (Option(ts("2024-01-01 10:00:00")), Option.empty[Timestamp], 3L),
      // empty [s, s) and inverted (end far before start — e.g. a zeroed
      // timestamp): sequence() would auto-step -1 on the inverted one
      // and fan out ~28M descending buckets while ALSO slipping past a
      // naive non-negative span guard — the validity filter must drop
      // both before the explode
      (Option(ts("2024-01-01 10:00:05")), Option(ts("2024-01-01 10:00:05")), 4L),
      (Option(ts("2024-01-01 10:00:00")), Option(ts("1970-01-01 00:00:00")), 5L))
      .toDF("ws", "we", "iv_id")
    val out = Joins.rangeJoin(probe, "pt", iv, "ws", "we",
        bucketSeconds = 60L)
      .select("iv_id").collect().map(_.getLong(0)).toSeq
    assert(out === Seq(1L))
  }

  test("range join honors extra equi-keys") {
    import spark.implicits._
    val probe = Seq(("a", ts("2024-01-01 10:00:05"), 1L),
      ("b", ts("2024-01-01 10:00:05"), 2L)).toDF("k", "pt", "probe_id")
    val iv = Seq(("a", ts("2024-01-01 10:00:00"), ts("2024-01-01 10:01:00"), 7L))
      .toDF("k", "ws", "we", "iv_id")
    val out = Joins.rangeJoin(probe, "pt", iv, "ws", "we", 30L, Seq("k"))
      .select("probe_id").collect().map(_.getLong(0)).toSeq
    assert(out === Seq(1L))
  }
}
