package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame

class SqlTableFunctionsSpec extends SparkTestBase {

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
      ("a", ts("2024-01-01 09:59:59"), 1L),
      ("a", ts("2024-01-01 10:00:05"), 2L),
      ("a", ts("2024-01-01 10:00:07"), 3L),
      ("a", ts("2024-01-01 10:01:00"), 4L),
      ("b", ts("2024-01-01 10:00:02"), 5L),
      ("c", ts("2024-01-01 10:00:00"), 6L))
      .toDF("k", "t", "trade_id")
  }

  private def sameRows(a: DataFrame, b: DataFrame): Unit = {
    assert(a.columns.sorted.toSeq === b.columns.sorted.toSeq)
    val cols = a.columns.sorted.toIndexedSeq
    val diff = a.select(cols.head, cols.tail: _*)
      .exceptAll(b.select(cols.head, cols.tail: _*)).count() +
      b.select(cols.head, cols.tail: _*)
        .exceptAll(a.select(cols.head, cols.tail: _*)).count()
    assert(diff === 0)
  }

  test("asof_join TVF matches the Scala operator, defaults and full arity") {
    GraftExtensions.register(spark)
    trades.createOrReplaceTempView("trades")
    quotes.createOrReplaceTempView("quotes")

    sameRows(
      spark.sql("SELECT * FROM asof_join('trades', 'quotes', 'k', 't', 't')"),
      graft.ops.Joins.asofJoin(trades, quotes, Seq("k"), "t", "t"))

    sameRows(
      spark.sql("""SELECT * FROM asof_join('trades', 'quotes', 'k', 't', 't',
                                           'forward', 3000000)"""),
      graft.ops.Joins.asofJoin(trades, quotes, Seq("k"), "t", "t",
        direction = "forward", toleranceMicros = Some(3000000L)))
  }

  test("asof_join TVF composes with an outer query") {
    GraftExtensions.register(spark)
    trades.createOrReplaceTempView("trades")
    quotes.createOrReplaceTempView("quotes")
    val n = spark.sql(
      """SELECT count(*) AS n
         FROM asof_join('trades', 'quotes', 'k', 't', 't')
         WHERE quote IS NOT NULL""").collect()(0).getLong(0)
    assert(n === 3L) // trades 2, 3, 4 have a backward quote
  }

  test("range_join TVF matches the Scala operator, with and without keys") {
    GraftExtensions.register(spark)
    import spark.implicits._
    val probe = Seq(("a", ts("2024-01-01 10:00:05"), 1L),
      ("b", ts("2024-01-01 10:00:05"), 2L),
      ("a", ts("2024-01-01 10:02:00"), 3L)).toDF("k", "pt", "probe_id")
    val iv = Seq(("a", ts("2024-01-01 10:00:00"), ts("2024-01-01 10:01:00"), 7L),
      ("b", ts("2024-01-01 10:00:00"), ts("2024-01-01 10:00:02"), 8L))
      .toDF("k", "ws", "we", "iv_id")
    probe.createOrReplaceTempView("probe")
    iv.createOrReplaceTempView("iv")
    // keyless variant: no shared column names, so rows compare by name
    val probeNk = probe.drop("k")
    val ivNk = iv.drop("k")
    probeNk.createOrReplaceTempView("probe_nk")
    ivNk.createOrReplaceTempView("iv_nk")

    sameRows(
      spark.sql(
        "SELECT * FROM range_join('probe_nk', 'pt', 'iv_nk', 'ws', 'we', 30)"),
      graft.ops.Joins.rangeJoin(probeNk, "pt", ivNk, "ws", "we", 30L))

    sameRows(
      spark.sql(
        "SELECT * FROM range_join('probe', 'pt', 'iv', 'ws', 'we', 30, 'k')"),
      graft.ops.Joins.rangeJoin(probe, "pt", iv, "ws", "we", 30L, Seq("k")))
  }

  test("TVF argument errors are loud and name the argument") {
    GraftExtensions.register(spark)
    trades.createOrReplaceTempView("trades")
    quotes.createOrReplaceTempView("quotes")
    val e1 = intercept[Exception] {
      spark.sql("SELECT * FROM asof_join('trades', 'quotes', 'k', 't')")
        .collect()
    }
    assert(e1.getMessage.contains("asof_join expects 5 to 7 arguments"))
    val e2 = intercept[Exception] {
      spark.sql("SELECT * FROM range_join('trades', 1, 'quotes', 'a', 'b', 30)")
        .collect()
    }
    assert(e2.getMessage.contains("probe time column"))
  }
}
