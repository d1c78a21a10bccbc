package graft
// Sample user code through the public package boundary (graft.api, graft.text)
import graft.api.Backtest
import graft.opt.LocalMACross
import graft.strategy.MACross
import graft.text.TextPipeline
object FacadeDemo {
  def main(args: Array[String]): Unit = {
    val spark = LocalSessions.builder(4, 4).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // user flow 1: multi-ticker backtest over driver events data
    val bars = graft.sources.Sources.eventsAsBars(spark, "/root/testdata/sf0.001")
    val bt = new Backtest(10000.0, MACross(5, 20), bars)
    println("== metrics() BEFORE run() (auto-run probe):")
    bt.metrics().select("ticker","end_amount","max_drawdown_pct","profit_factor").show(3)
    println("== finalNetWorth head:")
    bt.finalNetWorth().orderBy(desc("net_worth")).show(3)
    println("== optimize over tiny grid:")
    bt.optimize(st => LocalMACross(st(0).toInt, st(1).toInt), Seq((3,7,2),(10,30,10))).show(3)
    // probe: empty range grid
    try {
      bt.optimize(st => LocalMACross(st(0).toInt, st(1).toInt), Seq((5,5,1))).show(1)
      println("empty-grid probe: returned empty result (no crash)")
    } catch { case e: Throwable => println("empty-grid probe: " + e.getClass.getSimpleName + ": " + e.getMessage.take(100)) }
    // user flow 2: most-common tickers over documents-as-posts
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(upper(col("text")).as("title"), col("text").as("selftext"))
    val dims = Seq("table","spark","value","scan").toDF("symbol")
    println("== mostCommonTickers:")
    TextPipeline.mostCommonTickers(Seq(docs), Seq("title","selftext"), dims, "symbol", Seq("value"), 3).show()
    spark.stop()
  }
}
