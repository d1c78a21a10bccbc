package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ops.Joins
import graft.streaming.StreamingJoins
import graft.streaming.StreamingJoins.TickRow

/** The streaming as-of enrichment must agree with the batch asofJoin
  * when each key's rows arrive in event-time order across batches.
  */
class StreamingJoinsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: Int): Timestamp =
    new Timestamp(1700000000000L + s * 1000L)

  test("streaming asof equals batch asofJoin across micro-batches") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[TickRow]
    val q = StreamingJoins.asofStream(input.toDS())
      .writeStream.format("memory").queryName("asof_out")
      .outputMode("append").start()

    val batch1 = Seq(
      TickRow("a", ts(0), isQuote = true, 100.0, 0),
      TickRow("a", ts(1), isQuote = false, 0.0, 1),
      TickRow("a", ts(5), isQuote = true, 101.0, 0),
      TickRow("b", ts(2), isQuote = false, 0.0, 2)) // no quote yet
    val batch2 = Seq(
      TickRow("a", ts(6), isQuote = false, 0.0, 3),
      TickRow("a", ts(7), isQuote = true, 102.0, 0),
      TickRow("a", ts(7), isQuote = false, 0.0, 4), // tie -> inclusive
      TickRow("b", ts(8), isQuote = true, 50.0, 0),
      TickRow("b", ts(9), isQuote = false, 0.0, 5))
    input.addData(batch1: _*)
    q.processAllAvailable()
    input.addData(batch2: _*)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("asof_out")
      .select(col("key"), col("id"), col("quote"), col("quote_ts"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        Option(r.get(2)), Option(r.get(3)))).toSet

    val all = (batch1 ++ batch2).toDS()
    val quotes = all.filter(_.isQuote)
      .select(col("key"), col("ts"), col("value").as("quote"))
    val probes = all.filter(!_.isQuote).select(col("key"), col("ts"), col("id"))
    val batch = Joins.asofJoin(probes.toDF(), quotes.toDF(), Seq("key"),
        "ts", "ts")
      .select(col("key"), col("id"), col("quote"),
        col("ts_matched").as("quote_ts"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        Option(r.get(2)), Option(r.get(3)))).toSet

    assert(streamed === batch)
    // spot checks: pre-quote probe null, tie inclusive
    assert(streamed.contains(("b", 2L, None, None)))
    assert(streamed.exists(t => t._2 == 4L && t._3.contains(102.0)))
  }

  test("out-of-order rows WITHIN a batch are applied in event-time order") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[TickRow]
    val q = StreamingJoins.asofStream(input.toDS())
      .writeStream.format("memory").queryName("asof_ooo")
      .outputMode("append").start()
    // arrival order scrambled: the probe at t=4 must still see the
    // quote at t=3, not the later one at t=6
    input.addData(
      TickRow("k", ts(6), isQuote = true, 200.0, 0),
      TickRow("k", ts(4), isQuote = false, 0.0, 10),
      TickRow("k", ts(3), isQuote = true, 150.0, 0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("asof_ooo")
      .select("id", "quote").as[(Long, Option[Double])].collect().toMap
    assert(got(10L).contains(150.0))
  }

  test("quote buffer is bounded: probes older than the horizon join null") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[TickRow]
    val q = StreamingJoins.asofStream(input.toDS(), maxQuotes = 2)
      .writeStream.format("memory").queryName("asof_bound")
      .outputMode("append").start()
    input.addData(
      TickRow("k", ts(1), isQuote = true, 1.0, 0),
      TickRow("k", ts(2), isQuote = true, 2.0, 0),
      TickRow("k", ts(3), isQuote = true, 3.0, 0)) // evicts ts(1)
    q.processAllAvailable()
    input.addData(TickRow("k", ts(1), isQuote = false, 0.0, 20)) // too old
    q.processAllAvailable()
    q.stop()
    val got = spark.table("asof_bound")
      .select("id", "quote").as[(Long, Option[Double])].collect().toMap
    assert(got(20L).isEmpty)
  }
}
