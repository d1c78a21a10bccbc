package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ops.ScaleOps
import graft.streaming.StreamingScd2

/** Streaming SCD2 (graft.streaming.StreamingScd2): the batch-mode twin
  * equals ScaleOps.scd2 row-for-row, and the continuous run emits the
  * same CLOSED versions under out-of-order, cross-batch changelog
  * arrival — the CDC contract.
  */
class Scd2StreamSpec extends SparkTestBase {
  import spark.implicits._

  private def usTs(us: Long): Timestamp = {
    val t = new Timestamp(us / 1000L)
    t.setNanos(((us % 1000000L) * 1000L).toInt)
    t
  }

  // a changelog with collapses (consecutive identical status), ties at
  // one timestamp, multiple keys, and a single-version key
  private val changes = Seq(
    (1L, "new", usTs(1000000L)), (1L, "new", usTs(2000000L)),
    (1L, "active", usTs(3000000L)), (1L, "active", usTs(4000000L)),
    (1L, "closed", usTs(9000000L)),
    (2L, "active", usTs(5000000L)), (2L, "new", usTs(5000000L)),
    (3L, "new", usTs(7000000L)))

  private def batchOp(df: org.apache.spark.sql.DataFrame) =
    ScaleOps.scd2(df, Seq("user_id"), "ts", Seq("status"))
      .select(col("user_id"), col("status"),
        unix_micros(col("valid_from")).as("valid_from_us"),
        unix_micros(col("valid_to")).as("valid_to_us"),
        col("is_current"), col("version_no").cast("bigint"))

  test("batch-mode twin equals ScaleOps.scd2 row-for-row") {
    val df = changes.toDF("user_id", "status", "ts")
    val want = batchOp(df).collect().map(_.toSeq).toSet
    val got = StreamingScd2.asColumns(
        StreamingScd2.scd2RowsBatch(df, "user_id", "ts", "status"),
        "user_id", "status")
      .collect().map(_.toSeq).toSet
    assert(got == want, s"twin $got vs operator $want")
    // key 2's same-timestamp tie resolves (ts, attr)-ascending on both
    // paths: "active" then "new"
    val k2 = got.filter(_.head == 2L).toSeq.sortBy(_(5).asInstanceOf[Long])
    assert(k2.map(_(1)) == Seq("active", "new"), s"tie order: $k2")
  }

  test("streamed closed versions equal the batch history under " +
      "out-of-order cross-batch arrival") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val stream = input.toDS().toDF("user_id", "status", "ts")
    val q = StreamingScd2.asColumns(
        StreamingScd2.scd2Rows(stream, "user_id", "ts", "status",
          watermark = "10 seconds"), "user_id", "status")
      .writeStream.format("memory").queryName("scd2_out")
      .outputMode("append").start()
    // batch 1: LATER changes arrive first; batch 2 back-fills earlier
    // ones — all within the 10 s watermark, so the buffered fold must
    // order them correctly before sealing
    val (early, late) = changes.partition(_._3.getTime < 4000L)
    input.addData(late: _*)
    q.processAllAvailable()
    input.addData(early: _*)
    q.processAllAvailable()
    // flush: two advancing batches push the watermark far past every
    // buffered change (a batch's watermark gates the NEXT batch)
    input.addData((999L, "x", usTs(600000000L)))
    q.processAllAvailable()
    input.addData((999L, "x", usTs(1200000000L)))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("scd2_out").filter($"user_id" < 999L)
      .collect().map(_.toSeq).toSet
    // the stream emits exactly the CLOSED versions of the batch history
    val want = batchOp(changes.toDF("user_id", "status", "ts"))
      .filter(!col("is_current")).collect().map(_.toSeq).toSet
    assert(got == want, s"streamed $got vs batch closed $want")
  }

  test("the buffer cap fails loudly, never silently drops a change") {
    val noisy = (1 to 20).map(i => (7L, s"s$i", usTs(i * 1000000L)))
    val e = intercept[Exception](
      StreamingScd2.scd2RowsBatch(noisy.toDF("user_id", "status", "ts"),
        "user_id", "ts", "status", maxBufferedChanges = 8).collect())
    val msg = e.getMessage +
      (if (e.getCause != null) e.getCause.getMessage else "")
    assert(msg.contains("StreamingScd2") && msg.contains("exceeded"), msg)
  }

  test("a non-integral key is rejected by name; null attrs collapse " +
      "null-safe like the batch operator") {
    val bad = Seq(("alice", "new", usTs(1L))).toDF("user_id", "status", "ts")
    val e = intercept[IllegalArgumentException](
      StreamingScd2.scd2RowsBatch(bad, "user_id", "ts", "status"))
    assert(e.getMessage.contains("must be integral"), e.getMessage)
    val withNulls = Seq(
      (1L, Some("a"), usTs(1000000L)), (1L, None, usTs(2000000L)),
      (1L, None, usTs(3000000L)), (1L, Some("b"), usTs(4000000L)))
      .map { case (k, a, t) => (k, a.orNull, t) }
      .toDF("user_id", "status", "ts")
    val got = StreamingScd2.asColumns(
        StreamingScd2.scd2RowsBatch(withNulls, "user_id", "ts",
          "status"), "user_id", "status")
      .orderBy("version_no")
      .collect().map(r => (r.get(1), r.getLong(5))).toSeq
    // a -> null (the two nulls collapse) -> b: three versions
    assert(got == Seq(("a", 1L), (null, 2L), ("b", 3L)), s"got $got")
    val op = batchOp(withNulls).orderBy("version_no")
      .collect().map(r => (r.get(1), r.getLong(5))).toSeq
    assert(got == op, s"twin $got vs operator $op")
  }
}
