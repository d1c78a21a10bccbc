package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Sources
import graft.text.TextPipeline

class SourcesSpec extends SparkTestBase {

  test("readTable normalizes NTZ-inferred timestamps (driver-owned sessions)") {
    // our session builders disable parquet NTZ inference, but the driver
    // smoke-checks SparkEntry.entry with a session we do not configure —
    // readTable's cast is the defense there. Exercise that branch by
    // turning inference back on at runtime: the un-annotated testdata
    // timestamps then infer TIMESTAMP_NTZ on read, and readTable must
    // still hand back plain TIMESTAMP with identical UTC instants.
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    val key = "spark.sql.parquet.inferTimestampNTZ.enabled"
    val normal = Sources.readTable(spark, sf0001, "events")
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
      .orderBy("event_id").collect().toSeq
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "true")
      val raw = spark.read.parquet(s"$sf0001/events.parquet")
      assume(raw.schema("ts").dataType == TimestampNTZType,
        "testdata currently carries tz-annotated timestamps; branch n/a")
      val viaSeam = Sources.readTable(spark, sf0001, "events")
      assert(viaSeam.schema("ts").dataType == TimestampType)
      val got = viaSeam
        .select(col("event_id"), unix_micros(col("ts")).as("us"))
        .orderBy("event_id").collect().toSeq
      assert(got == normal)
    } finally spark.conf.set(key, prev)
  }

  test("readTable fails loudly on NTZ columns under a non-UTC session") {
    // the NTZ->TIMESTAMP cast reinterprets naive values in the SESSION
    // zone; under anything but UTC that silently shifts every instant,
    // so the seam must refuse instead (driver-owned sessions graft does
    // not configure are exactly where this bites)
    import org.apache.spark.sql.types.TimestampNTZType
    val inferKey = "spark.sql.parquet.inferTimestampNTZ.enabled"
    val tzKey = "spark.sql.session.timeZone"
    val prevInfer = spark.conf.get(inferKey)
    val prevTz = spark.conf.get(tzKey)
    try {
      spark.conf.set(inferKey, "true")
      val raw = spark.read.parquet(s"$sf0001/events.parquet")
      assume(raw.schema("ts").dataType == TimestampNTZType,
        "testdata currently carries tz-annotated timestamps; branch n/a")
      spark.conf.set(tzKey, "America/New_York")
      val e = intercept[IllegalArgumentException] {
        Sources.readTable(spark, sf0001, "events")
      }
      assert(e.getMessage.contains("session.timeZone=UTC"),
        s"failure must name the fix, got: ${e.getMessage}")
    } finally {
      spark.conf.set(inferKey, prevInfer)
      spark.conf.set(tzKey, prevTz)
    }
  }

  test("pipe-delimited scan lowercases headers (S4)") {
    val dir = Files.createTempDirectory("graft_pipe").toFile
    val f = new java.io.File(dir, "symbols.txt")
    Files.writeString(f.toPath,
      "Symbol|Security Name|Market\nAAPL|Apple Inc.|Q\nBRK.A|Berkshire|N\nXY|Xylem|N\n")
    val df = Sources.readPipeDelimited(spark, f.getAbsolutePath)
    assert(df.columns.toSeq === Seq("symbol", "security name", "market"))
    assert(df.count() === 3)
  }

  test("word-list scan (S5) + ticker dimension cleanup pipeline") {
    val dir = Files.createTempDirectory("graft_words").toFile
    val f = new java.io.File(dir, "most_common.txt")
    Files.writeString(f.toPath, "the\nof\nto\nxy\nextremely-long-word\n")
    val stops = Sources.readWordList(spark, f.getAbsolutePath)
    assert(stops.count() === 5)

    import spark.implicits._
    val listed = Seq(("AAPL", "Apple Inc."), ("BRK.A", "Berkshire"),
      ("XY", "Xylem"), ("A", "Agilent"), ("GM$", "weird"))
      .toDF("symbol", "security name")
    val traded = Seq(("AAPL", "Apple Inc.")).toDF("symbol", "security name")
    val dim = TextPipeline.buildTickerDimension(listed, traded, stops)
    // BRK.A (dot), GM$ (dollar), A (len 1) filtered; XY is a <=4-char
    // stop word (case-insensitive? reference compares raw; 'xy' != 'XY'
    // so XY survives — membership is exact-case like pandas isin)
    assert(dim.select("symbol").collect().map(_.getString(0)).sorted.toSeq
      === Seq("AAPL", "XY"))
  }

  test("csv sink round-trips (S9)") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft_sink").toString + "/out"
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    Sources.writeCsv(df, out)
    val back = spark.read.option("header", "true").csv(out)
    assert(back.count() === 2)
    assert(back.columns.toSeq === Seq("id", "v"))
  }

  test("reference tickers.csv dimension loads (A4 fixture)") {
    val df = spark.read.option("header", "true")
      .csv("/root/reference/strat_backtest/reddit_data/tickers.csv")
    assert(df.count() > 10000)
    assert(df.columns.contains("symbol"))
  }
}
