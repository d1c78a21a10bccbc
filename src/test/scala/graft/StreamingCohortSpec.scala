package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamingPipeline

/** Streaming cohort retention: the per-user first-activity state +
  * retraction-delta design must settle to the exact batch matrix even
  * when a user's EARLIEST event arrives in a later micro-batch (the
  * cohort-shift path a frozen append-only design gets wrong forever).
  */
class StreamingCohortSpec extends SparkTestBase {
  import spark.implicits._

  private def at(day: Int, h: Int = 0) =
    java.sql.Timestamp.valueOf(f"2024-01-$day%02d $h%02d:00:00")

  private def matrixOf(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("cohort_us", "period_no").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  test("batch mode equals the exact cohort matrix (and the " +
      "cohortRetention activity cells)") {
    val events = Seq(
      (1L, at(1)), (1L, at(1, 5)), (1L, at(2)), (1L, at(4)),
      (2L, at(1)), (2L, at(2)),
      (3L, at(1)),
      (4L, at(2)), (4L, at(4))).toDF("user_id", "ts")
    val got = matrixOf(StreamingPipeline.streamingCohortRetention(
      events, "user_id", "ts", unit = "day"))
    val twin = graft.ts.TimeSeriesOps
      .cohortRetention(events, "user_id", "ts", unit = "day")
      .select(col("cohort_us"), col("period_no"), col("active_users"))
    assert(got === matrixOf(twin))
    assert(got.map(_._3) === Seq(3L, 2L, 1L, 1L, 1L))
  }

  test("out-of-order cross-batch arrival with a COHORT SHIFT settles " +
      "to the batch matrix (retraction deltas)") {
    implicit val sc = spark.sqlContext
    // user 10's chronology: day 1 (first), day 3, day 5 — but day 1
    // arrives LAST, so the streaming run first believes the cohort is
    // day 3 and must retract/re-base every emitted cell. user 20 is
    // in-order control; user 10's day-3 event also REPEATS across
    // batches (the emitted-mask dedup path).
    val rows = Seq(
      (10L, at(3)), (20L, at(1)), (10L, at(5)),
      (10L, at(3, 6)), (20L, at(2)),
      (10L, at(1)))
    val input = MemoryStream[(Long, java.sql.Timestamp)]
    val upserts = scala.collection.concurrent.TrieMap
      .empty[(Long, Long), Long]
    val q = StreamingPipeline.streamingCohortRetention(
        input.toDS().toDF("user_id", "ts"), "user_id", "ts",
        unit = "day", watermark = "30 days")
      .writeStream.outputMode("update")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.collect().foreach { r =>
          upserts.put((r.getLong(0), r.getLong(1)), r.getLong(2))
        }
      }.start()
    input.addData(rows.take(3): _*)
    q.processAllAvailable()
    input.addData(rows.slice(3, 5): _*)
    q.processAllAvailable()
    input.addData(rows.drop(5): _*)
    q.processAllAvailable()
    q.stop()
    // positive cells of the final upserted state == the batch matrix
    val got = upserts.toSeq.collect {
      case ((c, p), n) if n > 0L => (c, p, n)
    }.sortBy(t => (t._1, t._2))
    val twin = matrixOf(StreamingPipeline.streamingCohortRetention(
      rows.toDF("user_id", "ts"), "user_id", "ts", unit = "day"))
    assert(got === twin)
    // the shift really happened: user 10's cells sit on cohort day 1
    // (periods 0, 2, 4), user 20 contributes periods 0 and 1
    val day1us = at(1).getTime * 1000L
    assert(twin === Seq(
      (day1us, 0L, 2L), (day1us, 1L, 1L), (day1us, 2L, 1L),
      (day1us, 4L, 1L)))
  }

  test("maxPeriods caps tracked cells; week unit and validation") {
    val events = Seq(
      (1L, at(1)), (1L, at(8)), (1L, at(29)),
      (2L, at(1))).toDF("user_id", "ts")
    val capped = matrixOf(StreamingPipeline.streamingCohortRetention(
      events, "user_id", "ts", unit = "day", maxPeriods = 7))
    assert(capped.map(t => (t._2, t._3)) === Seq((0L, 2L), (7L, 1L)))
    val weekly = matrixOf(StreamingPipeline.streamingCohortRetention(
      events, "user_id", "ts", unit = "week"))
    assert(weekly.map(t => (t._2, t._3)) === Seq((0L, 2L), (1L, 1L), (4L, 1L)))
    intercept[IllegalArgumentException] {
      StreamingPipeline.streamingCohortRetention(
        events, "user_id", "ts", unit = "month")
    }
    intercept[IllegalArgumentException] {
      StreamingPipeline.streamingCohortRetention(
        events, "user_id", "ts", maxPeriods = 64)
    }
  }
}
