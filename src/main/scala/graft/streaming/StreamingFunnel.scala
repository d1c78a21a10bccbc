package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming ordered-funnel analysis — the continuous twin of
  * [[graft.ts.TimeSeriesOps.funnel]]. Each user's step-typed event
  * times are buffered per step while the user is active; when the
  * watermark passes `quiet` beyond the user's newest event the funnel
  * FINALIZES: the exact batch chain (step i = earliest `steps(i)` time
  * strictly after step i−1) runs over the buffered times and one row
  * per (user, quiet-session) is emitted (Append mode).
  * Buffering-then-finalizing is what makes the result EXACT under any
  * within-watermark arrival order — an online chain that kept only the
  * current step times could not revise step 1 when an earlier step-0
  * event arrives late.
  *
  * Row contract: a user whose event-time gap exceeds `quiet` is
  * finalized mid-stream and re-buffered, so such a user emits one row
  * PER quiet-session, each chained over that session's events only.
  * Batch equivalence with [[funnelRowsBatch]] therefore holds exactly
  * when each user's events fall within one quiet window (the spec's
  * arrangement); across sessions the streaming result is the
  * per-session funnel — the sessionized reading of the same analysis.
  *
  * Scale contract:
  *  - State per user = the step-typed event TIMES only (longs — never
  *    payloads), bounded by `maxEventsPerStep` per step. Exceeding the
  *    cap fails loudly (the rangeJoin discipline): silently dropping a
  *    time could mis-finalize the chain, and a user with > cap events
  *    of one step type inside one quiet window is a bot to pre-filter,
  *    not data to silently mangle.
  *  - Only (user, stepIdx, ts) shuffles — events of non-step types are
  *    filtered before the state operator.
  *  - State is evicted at finalization (event-time timeout), so memory
  *    is bounded by (users active within `quiet`) × buffered times.
  *
  * [[funnelRowsBatch]] is the batch-mode twin: the IDENTICAL finalize
  * function over fully-buffered groups — its output equals
  * `TimeSeriesOps.funnel` row-for-row (spec-pinned), which is what
  * makes the streaming semantics DuckDB-oracle-checkable.
  */
object StreamingFunnel {

  final case class StepEvent(user_id: Long, step: Int, ts: Timestamp)

  /** Per-user buffered step times. `times(i)` holds the type-i event
    * times (micros, arrival order — finalize sorts what it needs).
    */
  final case class FunnelBuffer(times: Array[Array[Long]], lastUs: Long)

  /** One finalized funnel row: `step_us(i)` = −1 encodes "step never
    * completed" (the DataFrame surface turns it into NULL).
    */
  final case class FunnelRow(user_id: Long, step_us: Array[Long],
      steps_completed: Long, converted: Boolean)

  /** The ONE chain evaluation both modes share: step 0 at the minimum
    * type-0 time, step i at the minimum type-i time strictly greater
    * than step i−1; conversion within `horizonUs` of step 0.
    */
  private[streaming] def finalizeChain(times: Array[Array[Long]],
      horizonUs: Long): FunnelRow = {
    val k = times.length
    val s = Array.fill(k)(-1L)
    var prev = Long.MinValue
    var completed = 0
    var i = 0
    var stop = false
    while (i < k && !stop) {
      // min time strictly after prev (strict for i > 0; step 0 takes
      // its plain minimum since prev = MinValue admits everything)
      var best = Long.MaxValue
      val ts = times(i)
      var j = 0
      while (j < ts.length) {
        if ((i == 0 || ts(j) > prev) && ts(j) < best) best = ts(j)
        j += 1
      }
      if (best == Long.MaxValue) stop = true
      else {
        s(i) = best; prev = best; completed += 1
      }
      i += 1
    }
    val converted = completed == k && s(k - 1) - s(0) <= horizonUs
    FunnelRow(0L, s, completed.toLong, converted) // user filled by caller
  }

  private def checkArgs(steps: Seq[String], horizonUs: Long,
      maxEventsPerStep: Int): Unit = {
    require(steps.nonEmpty && steps.size <= 8,
      s"steps must be 1..8 events, got ${steps.size}")
    require(steps.distinct.size == steps.size,
      s"funnel steps must be distinct, got $steps")
    require(horizonUs > 0, s"horizonUs must be positive, got $horizonUs")
    require(maxEventsPerStep >= 1,
      s"maxEventsPerStep must be positive, got $maxEventsPerStep")
  }

  /** Project the raw event frame down to (user, stepIdx, ts) — the only
    * columns the state operator ever holds or shuffles.
    */
  private def stepEvents(events: DataFrame, keyCol: String,
      typeCol: String, tsCol: String,
      steps: Seq[String]): Dataset[StepEvent] = {
    val spark = events.sparkSession
    import spark.implicits._
    // the state key is a Long: a non-integral key (e.g. string user
    // ids, which the batch operator accepts) would cast to null and
    // surface as an opaque encoder NPE — reject it by name instead
    val keyType = events.schema(keyCol).dataType
    require(graft.dedup.Dedup.integralIdTypes.contains(keyType),
      s"StreamingFunnel: key column '$keyCol' must be integral (the " +
        s"streaming state key is a Long), got $keyType — hash or " +
        "dictionary-encode the key first, or use TimeSeriesOps.funnel")
    val stepIdx = steps.zipWithIndex
      .foldLeft(lit(-1)) { case (acc, (s, i)) =>
        when(col(typeCol) === s, lit(i)).otherwise(acc)
      }
    events.filter(col(keyCol).isNotNull)
      .select(col(keyCol).cast("long").as("user_id"),
        stepIdx.as("step"), col(tsCol).cast("timestamp").as("ts"))
      .filter(col("step") >= 0)
      .as[StepEvent]
  }

  private def insert(buf: FunnelBuffer, e: StepEvent, cap: Int,
      steps: Seq[String]): FunnelBuffer = {
    val ts = if (buf == null) Array.fill(steps.size)(Array.emptyLongArray)
      else buf.times
    // full microsecond precision: getTime is MILLIS — dropping the
    // sub-ms micros would desynchronize the chain from the batch
    // operator's unix_micros on micro-timestamped data
    val us = e.ts.getTime * 1000L + (e.ts.getNanos % 1000000L) / 1000L
    if (ts(e.step).length >= cap)
      throw new IllegalStateException(
        s"StreamingFunnel: user ${e.user_id} exceeded $cap buffered " +
          s"'${steps(e.step)}'-step events inside one quiet window — a " +
          "degenerate emitter; pre-filter it or raise maxEventsPerStep")
    val next = ts.clone()
    next(e.step) = ts(e.step) :+ us
    FunnelBuffer(next,
      math.max(if (buf == null) Long.MinValue else buf.lastUs, us))
  }

  /** Streaming funnel rows (Append mode): one row per user, emitted
    * when the event-time watermark passes `quiet` beyond the user's
    * newest event. `step_us` keeps the −1 sentinel for incomplete
    * steps; see [[asColumns]] for the named-column surface.
    */
  def funnelRows(events: DataFrame, keyCol: String, typeCol: String,
      tsCol: String, steps: Seq[String], horizonUs: Long,
      quiet: String = "1 hour",
      maxEventsPerStep: Int = 4096): Dataset[FunnelRow] = {
    checkArgs(steps, horizonUs, maxEventsPerStep)
    val spark = events.sparkSession
    import spark.implicits._
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
      org.apache.spark.unsafe.types.UTF8String.fromString(quiet))
    require(iv.months == 0,
      s"quiet must not contain month/year units (got '$quiet')")
    val quietMs = iv.days * 86400000L + iv.microseconds / 1000L
    // watermark the PROJECTED frame: tagging before the ts cast would
    // lose the watermark attribute to the cast's new expression id
    stepEvents(events, keyCol, typeCol, tsCol, steps)
      .withWatermark("ts", quiet)
      .as[StepEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[StepEvent],
            state: GroupState[FunnelBuffer]) =>
          if (state.hasTimedOut) {
            val buf = state.get
            state.remove()
            Iterator.single(
              finalizeChain(buf.times, horizonUs).copy(user_id = user))
          } else {
            var buf = state.getOption.orNull
            rows.foreach { e => buf = insert(buf, e, maxEventsPerStep, steps) }
            state.update(buf)
            // finalize once the watermark passes `quiet` beyond the
            // user's newest event — the sessionization-style contract
            state.setTimeoutTimestamp(buf.lastUs / 1000L + quietMs)
            Iterator.empty
          }
      }
  }

  /** Batch-mode twin: the identical [[finalizeChain]] over each user's
    * fully-buffered events — equals [[graft.ts.TimeSeriesOps.funnel]]
    * row-for-row, and is the DuckDB-checkable surface of the streaming
    * semantics.
    */
  def funnelRowsBatch(events: DataFrame, keyCol: String, typeCol: String,
      tsCol: String, steps: Seq[String], horizonUs: Long,
      maxEventsPerStep: Int = 4096): Dataset[FunnelRow] = {
    checkArgs(steps, horizonUs, maxEventsPerStep)
    val spark = events.sparkSession
    import spark.implicits._
    stepEvents(events, keyCol, typeCol, tsCol, steps)
      .groupByKey(_.user_id)
      .mapGroups { (user, rows) =>
        var buf: FunnelBuffer = null
        rows.foreach { e => buf = insert(buf, e, maxEventsPerStep, steps) }
        finalizeChain(buf.times, horizonUs).copy(user_id = user)
      }
  }

  /** The named-column surface shared with the batch operator:
    * (user_id, step0_us…, steps_completed, converted), −1 → NULL.
    */
  def asColumns(rows: Dataset[FunnelRow], nSteps: Int): DataFrame = {
    val stepCols = (0 until nSteps).map(i =>
      when(col("step_us").getItem(i) >= 0, col("step_us").getItem(i))
        .as(s"step${i}_us"))
    rows.toDF().select(col("user_id") +: stepCols :+
      col("steps_completed") :+ col("converted"): _*)
  }
}
