package graft

/** Every driver query must run at sf0.001 (schema/analysis regressions
  * surface here without waiting for the driver's round). Oracle-value
  * correctness is the driver's DuckDB compare; this is the cheap local
  * gate.
  */
class QueriesSmokeSpec extends SparkTestBase {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without queries: $missing")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"query $name runs at sf0.001") {
      val df = fn(spark, sf0001)
      assert(df.count() >= 0)
      assert(df.columns.nonEmpty)
    }
  }

  test("metrics survives degenerate no-trade tickers (ANSI div-by-zero guards)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // constant net worth -> zero variance; single order with 0 shares ->
    // zero total_risked: every guarded division path exercised
    val daily = (1 to 5).map(i =>
      ("flat", java.sql.Timestamp.valueOf(f"2024-01-0$i 00:00:00"),
        100.0, 100.0)).toDF("ticker", "date", "net_worth", "SP500")
    val orders = spark.createDataset(Seq(
      graft.model.OrderRow("flat", 0, 0.0,
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 10.0,
        filled = true, Some(java.sql.Timestamp.valueOf("2024-01-02 00:00:00")),
        Some(11.0), Some(0.0))))
    val m = graft.analytics.Metrics.compute(daily, orders, 100.0, 0.03)
    val row = m.collect()(0)
    assert(row.getAs[Any]("beta") === null)
    assert(row.getAs[Any]("sharpe_ratio") === null)
    assert(row.getAs[Any]("risk_reward") === null)
  }
}
