package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.Joins

/** Pins the README's pure-SQL recipes for the two Scala-only join
  * operators (as-of and range join) to the operators themselves: the
  * recipes are the documented SQL surface for users who cannot call the
  * Column API, so they must produce identical rows — same union+window
  * (one shuffle, no pair explosion) and bucket-explode plan shapes.
  */
class SqlRecipesSpec extends SparkTestBase {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("as-of join SQL recipe matches Joins.asofJoin") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val trades = (1 to 300).map(i => (s"k${rnd.nextInt(5)}",
      new Timestamp(1700000000000L + rnd.nextInt(100000) * 1000L), i.toLong))
      .toDF("k", "t", "trade_id")
    val quotes = (1 to 200).map { _ =>
      (s"k${rnd.nextInt(6)}",
        new Timestamp(1700000000000L + rnd.nextInt(100000) * 1000L),
        rnd.nextDouble())
    }.toDF("k", "t", "v")
      .groupBy("k", "t").agg(max("v").as("v")) // unique per (k, t)
    trades.createOrReplaceTempView("trades")
    quotes.createOrReplaceTempView("quotes")

    val viaSql = spark.sql(
      """WITH u AS (
        |  SELECT k, t, trade_id, t AS mt, 1 AS side,
        |         CAST(NULL AS STRUCT<v: DOUBLE, qt: TIMESTAMP>) AS p
        |  FROM trades
        |  UNION ALL
        |  SELECT k, NULL, NULL, t AS mt, 0 AS side,
        |         named_struct('v', v, 'qt', t) AS p
        |  FROM quotes),
        |f AS (
        |  SELECT *, last(p, true) OVER (
        |      PARTITION BY k ORDER BY mt, side
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fp
        |  FROM u)
        |SELECT k, t, trade_id, fp.v AS v, fp.qt AS t_matched
        |FROM f WHERE side = 1""".stripMargin)
    val viaScala = Joins.asofJoin(trades, quotes, Seq("k"), "t", "t")
    val diff = viaSql.exceptAll(viaScala).count() +
      viaScala.exceptAll(viaSql).count()
    assert(diff === 0, "SQL recipe and asofJoin must agree row-for-row")
  }

  test("range join SQL recipe matches Joins.rangeJoin") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val probe = (1 to 400).map(i =>
        (new Timestamp(1700000000000L + rnd.nextInt(500000) * 1000L), i.toLong))
      .toDF("pt", "probe_id")
    val iv = (1 to 40).map { i =>
      val s = 1700000000000L + rnd.nextInt(400000) * 1000L
      (new Timestamp(s), new Timestamp(s + (1 + rnd.nextInt(120000)) * 1000L),
        i.toLong)
    }.toDF("ws", "we", "iv_id")
    probe.createOrReplaceTempView("probes")
    iv.createOrReplaceTempView("intervals")

    // 60 s buckets = 60000000 us; floordiv via (x - pmod(x, d)) / d is
    // exact on integers and correct for pre-1970 (negative) micros
    val viaSql = spark.sql(
      """WITH pb AS (
        |  SELECT *, CAST((unix_micros(pt) - pmod(unix_micros(pt), 60000000))
        |      / 60000000 AS BIGINT) AS bucket
        |  FROM probes),
        |ib AS (
        |  SELECT iv.*, b.bucket FROM (
        |    SELECT * FROM intervals WHERE we > ws) iv
        |  LATERAL VIEW explode(sequence(
        |    CAST((unix_micros(ws) - pmod(unix_micros(ws), 60000000))
        |      / 60000000 AS BIGINT),
        |    CAST((unix_micros(we) - 1 - pmod(unix_micros(we) - 1, 60000000))
        |      / 60000000 AS BIGINT))) b AS bucket)
        |SELECT pb.pt, pb.probe_id, ib.ws, ib.we, ib.iv_id
        |FROM pb JOIN ib USING (bucket)
        |WHERE pb.pt >= ib.ws AND pb.pt < ib.we""".stripMargin)
    val viaScala = Joins.rangeJoin(probe, "pt", iv, "ws", "we",
        bucketSeconds = 60L)
      .select("pt", "probe_id", "ws", "we", "iv_id")
    val diff = viaSql.exceptAll(viaScala).count() +
      viaScala.exceptAll(viaSql).count()
    assert(diff === 0, "SQL recipe and rangeJoin must agree row-for-row")
  }
}
