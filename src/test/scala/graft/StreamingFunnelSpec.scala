package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamingFunnel
import graft.ts.TimeSeriesOps

/** The streaming funnel: watermark-buffered per-user step times,
  * finalized to the exact batch chain when the user goes quiet. The
  * batch twin must equal TimeSeriesOps.funnel row-for-row; the
  * streamed run must equal the batch twin under out-of-order,
  * cross-batch arrival.
  */
class StreamingFunnelSpec extends SparkTestBase {
  import spark.implicits._

  private def sec(s: Long): Timestamp = new Timestamp(s * 1000L)

  private val steps = Seq("view", "click", "purchase")

  // the TimeSeriesOpsSpec funnel fixture: clean completion, pre-funnel
  // purchase, equal-ts click + chain-breaking order, and (batch-only)
  // a user with step events but no view
  private def events = Seq(
    (1L, "view", sec(10)), (1L, "click", sec(20)), (1L, "purchase", sec(30)),
    (2L, "purchase", sec(5)), (2L, "view", sec(10)),
    (2L, "click", sec(20)), (2L, "purchase", sec(25)),
    (3L, "view", sec(10)), (3L, "click", sec(10)),
    (3L, "purchase", sec(12)), (3L, "click", sec(15)),
    (4L, "click", sec(5)), (4L, "purchase", sec(6)))

  test("batch twin equals TimeSeriesOps.funnel row-for-row") {
    val df = events.toDF("user_id", "event_type", "ts")
    val twin = StreamingFunnel.asColumns(
      StreamingFunnel.funnelRowsBatch(df, "user_id", "event_type", "ts",
        steps, horizonUs = 20000000L), 3)
      .orderBy("user_id").collect().map(_.toSeq).toSeq
    val batch = TimeSeriesOps.funnel(df, "user_id", "event_type", "ts",
      steps, horizonUs = 20000000L)
      .orderBy("user_id").collect().map(_.toSeq).toSeq
    assert(twin === batch)
    assert(twin.size === 4)
  }

  test("batch twin keeps full MICROSECOND precision (getTime is millis)") {
    def usTs(us: Long): Timestamp = {
      val t = new Timestamp(us / 1000L)
      t.setNanos(((us % 1000000L) * 1000L).toInt)
      t
    }
    // micro-offset events: truncating to millis would shift every step
    // time and flip the strictly-after comparison at us(1000999) vs
    // us(1000999) boundaries
    val df = Seq(
      (1L, "view", usTs(10000123L)), (1L, "click", usTs(10000124L)),
      (1L, "purchase", usTs(10000999L))).toDF("user_id", "event_type", "ts")
    val twin = StreamingFunnel.asColumns(
      StreamingFunnel.funnelRowsBatch(df, "user_id", "event_type", "ts",
        steps, horizonUs = 1000L), 3).collect()(0)
    assert(twin.getLong(1) === 10000123L)
    assert(twin.getLong(2) === 10000124L)
    assert(twin.getLong(3) === 10000999L)
    assert(twin.getBoolean(5), "876 us span converts within 1000 us")
    val batch = TimeSeriesOps.funnel(df, "user_id", "event_type", "ts",
      steps, 1000L).collect()(0)
    assert(twin.toSeq === batch.toSeq)
  }

  test("streamed funnel equals the batch twin under out-of-order, " +
      "cross-batch arrival") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val stream = input.toDS().toDF("user_id", "event_type", "ts")
    val q = StreamingFunnel.asColumns(
      StreamingFunnel.funnelRows(stream, "user_id", "event_type", "ts",
        steps, horizonUs = 20000000L, quiet = "1 minute"), 3)
      .writeStream.format("memory").queryName("funnel_out")
      .outputMode("append").start()
    // batch 1: a user's LATER events arrive first (out of order), and
    // user 3's chain-relevant later click arrives before the early pair
    val (early, late) = events.partition(_._3.getTime <= 10000L)
    input.addData(late: _*)
    q.processAllAvailable()
    // batch 2: the earlier events — within the 1-minute watermark, so
    // the buffered chain must revise correctly
    input.addData(early: _*)
    q.processAllAvailable()
    // flush: advance the watermark far past every user's quiet window
    // (two batches — the watermark a batch SETS gates the NEXT one)
    input.addData((999L, "view", sec(10000)))
    q.processAllAvailable()
    input.addData((999L, "view", sec(20000)))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("funnel_out").filter($"user_id" < 999L)
      .orderBy("user_id").collect().map(_.toSeq).toSeq
    val want = StreamingFunnel.asColumns(
      StreamingFunnel.funnelRowsBatch(
        events.toDF("user_id", "event_type", "ts"),
        "user_id", "event_type", "ts", steps, 20000000L), 3)
      .orderBy("user_id").collect().map(_.toSeq).toSeq
    assert(got === want, s"streamed $got vs batch twin $want")
  }

  test("the per-step buffer cap fails loudly, never silently drops") {
    val noisy = (1 to 20).map(i => (7L, "view", sec(i.toLong)))
    val e = intercept[Exception](
      StreamingFunnel.funnelRowsBatch(
        noisy.toDF("user_id", "event_type", "ts"),
        "user_id", "event_type", "ts", steps, 1000000L,
        maxEventsPerStep = 8).collect())
    val msg = e.getMessage +
      (if (e.getCause != null) e.getCause.getMessage else "")
    assert(msg.contains("StreamingFunnel"), msg)
    assert(msg.contains("exceeded"), msg)
  }

  test("a non-integral key is rejected by name, not an encoder NPE") {
    val df = Seq(("alice", "view", sec(1L)))
      .toDF("user_id", "event_type", "ts")
    val e = intercept[IllegalArgumentException](
      StreamingFunnel.funnelRowsBatch(
        df, "user_id", "event_type", "ts", steps, 1000000L))
    assert(e.getMessage.contains("must be integral"), e.getMessage)
    assert(e.getMessage.contains("user_id"), e.getMessage)
  }

  test("the buffer-cap diagnostic names the STEP, not its index") {
    val noisy = (1 to 20).map(i => (7L, "view", sec(i.toLong)))
    val e = intercept[Exception](
      StreamingFunnel.funnelRowsBatch(
        noisy.toDF("user_id", "event_type", "ts"),
        "user_id", "event_type", "ts", steps, 1000000L,
        maxEventsPerStep = 8).collect())
    val msg = e.getMessage +
      (if (e.getCause != null) e.getCause.getMessage else "")
    assert(msg.contains("'view'-step"), msg)
  }

  test("guards: empty/duplicate/oversized steps, bad horizon and cap") {
    val df = events.toDF("user_id", "event_type", "ts")
    intercept[IllegalArgumentException](StreamingFunnel.funnelRowsBatch(
      df, "user_id", "event_type", "ts", Seq.empty, 1L))
    intercept[IllegalArgumentException](StreamingFunnel.funnelRowsBatch(
      df, "user_id", "event_type", "ts", Seq("a", "a"), 1L))
    intercept[IllegalArgumentException](StreamingFunnel.funnelRowsBatch(
      df, "user_id", "event_type", "ts", (1 to 9).map("s" + _), 1L))
    intercept[IllegalArgumentException](StreamingFunnel.funnelRowsBatch(
      df, "user_id", "event_type", "ts", steps, 0L))
    intercept[IllegalArgumentException](StreamingFunnel.funnelRowsBatch(
      df, "user_id", "event_type", "ts", steps, 1L, maxEventsPerStep = 0))
  }
}
