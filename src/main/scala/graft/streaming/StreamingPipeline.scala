package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.textstats.TextStats

/** Streaming halves of the LLM-data-pipeline operators (SURVEY.md §7.5):
  * the same dedup / sessionization / token-count semantics as the batch
  * tier, expressed over `readStream` sources so a 100 TB ingest can run
  * continuously instead of in backfill batches.
  *
  * Scale notes:
  *  - Streaming exact dedup uses `dropDuplicatesWithinWatermark` on the
  *    canonical fingerprint: state is keyed by the 128-bit digest and
  *    EVICTED once the watermark passes — bounded memory, unlike a plain
  *    `dropDuplicates` whose state grows forever. Dedup scope is "within
  *    the watermark horizon", which is the only sound contract for an
  *    unbounded stream.
  *  - Sessionization uses Spark's native `session_window` (gap-merged
  *    windows in the state store, watermark-evicted) — the streaming
  *    analogue of TimeSeriesOps.sessionize's two-window batch form.
  *  - Token counting is a watermarked tumbling-window aggregation over
  *    exploded tokens: partial aggregation runs map-side per batch, so
  *    only (window, token, partial count) rows shuffle.
  */
object StreamingPipeline {

  /** Drop exact-duplicate documents within the watermark horizon: the
    * canonical-fingerprint column is added, late data beyond `watermark`
    * is dropped, and duplicate state is watermark-evicted. Works on both
    * streaming and batch frames (batch = global dedup).
    */
  def streamingExactDedup(docs: DataFrame, tsCol: String = "ts",
      textCol: String = "text", watermark: String = "1 hour"): DataFrame =
    docs.withColumn("fp", TextStats.fingerprint(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("fp")

  /** The composite corpus-cleaning pipeline (ts_clean_corpus) on an
    * unbounded stream: watermark-horizon exact dedup, then the quality
    * gate, PII scrub, and deterministic split label — the latter three
    * are stateless per-row stages, so the ONLY state is the dedup
    * digest store (watermark-evicted). Dedup scope is "within the
    * horizon" rather than the batch job's global scope; everything
    * downstream is identical code, so batch backfill and continuous
    * ingest produce the same rows for in-horizon data.
    */
  def streamingCleanCorpus(docs: DataFrame, tsCol: String = "ts",
      idCol: String = "doc_id", textCol: String = "text",
      watermark: String = "1 hour"): DataFrame = {
    val deduped = streamingExactDedup(docs, tsCol, textCol, watermark)
    TextStats.qualityFeatures(deduped, textCol)
      .filter(col("quality_score") >= 1.0 && col("n_tokens") >= 20)
      .select(col(idCol), col(tsCol),
        col("n_tokens").cast("bigint").as("n_tokens"),
        graft.ops.Sampling.splitColumn(col(idCol),
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
          denom = 100).as("split"),
        TextStats.redactPii(col(textCol)).as("clean_text"))
  }

  /** Gap-based sessionization with native session windows: one row per
    * (key, session) holding the merged window bounds and per-session
    * aggregates. Same session-boundary semantics as the batch
    * TimeSeriesOps.sessionize (a new session starts when the gap to the
    * previous event exceeds `gap`).
    */
  def streamingSessionize(events: DataFrame, gap: String,
      keyCol: String = "user_id", tsCol: String = "ts",
      watermark: String = "1 hour"): DataFrame =
    events.withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value")).as("sum_value"))
      .select(col(keyCol),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("sum_value"))

  /** Windowed token counting over a document stream — the streaming
    * analogue of the batch top-k token frequency (A4): tumbling
    * event-time windows, watermark-bounded state.
    */
  def streamingTokenCounts(docs: DataFrame, window_ : String,
      tsCol: String = "ts", textCol: String = "text",
      watermark: String = "1 hour"): DataFrame =
    docs.withWatermark(tsCol, watermark)
      .select(col(tsCol),
        explode(graft.text.TextPipeline.tokenize(col(textCol))).as("token"))
      .groupBy(window(col(tsCol), window_), col("token"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("window_start"), col("token"),
        col("cnt"))

  /** Watermarked per-window KMV distinct estimate — the continuous
    * twin of [[graft.sketch.Kmv.distinctEstimate]]: state per window is
    * ONE bounded sketch (≤ k longs), merged across micro-batches by
    * the same aggregator, evicted when the watermark closes the
    * window. Runs identically in batch mode (withWatermark is a
    * batch no-op), which is the oracle twin.
    */
  def streamingKmvDistinct(events: DataFrame, window_ : String,
      valueCol: String, tsCol: String = "ts", k: Int = 256,
      watermark: String = "1 hour"): DataFrame =
    events.withWatermark(tsCol, watermark)
      .where(col(valueCol).isNotNull && col(tsCol).isNotNull)
      .groupBy(window(col(tsCol), window_))
      .agg(graft.sketch.Kmv.sketchAgg(col(valueCol), k).as("__sk"))
      .select(unix_micros(col("window.start")).as("window_start_us"),
        size(col("__sk")).cast("long").as("n_retained"),
        graft.sketch.Kmv.estimateCol(col("__sk"), k).as("est_kmv"))

  /** One user's activity row after period normalization. */
  private[streaming] case class CohortEvent(user: Long, day: Long)

  /** Per-user cohort state: the first-activity period (as epoch days)
    * and a 64-bit mask of the period numbers already emitted — 16
    * bytes per user, the ENTIRE state.
    */
  private[streaming] case class CohortState(cohortDay: Long, mask: Long)

  /** A retraction-capable cell increment: sums settle to the exact
    * distinct-user count per (cohort, period_no) cell.
    */
  private[streaming] case class CellDelta(cohortDay: Long, periodNo: Int,
      delta: Int)

  /** Streaming cohort retention — the continuous twin of
    * [[graft.ts.TimeSeriesOps.cohortRetention]]'s activity matrix:
    * per-user FIRST-ACTIVITY state + periods-since emission, exactly
    * the r12-verdict shape. Emits `(cohort_us, period_no,
    * active_users)` cells; run the SAME code on a batch frame for the
    * oracle twin (each user group folds once, no retractions fire).
    *
    * Semantics under OUT-OF-ORDER arrival (the part a naive windowed
    * agg cannot do): a user's cohort is the minimum period EVER seen
    * (within the watermark horizon). When a late-arriving EARLIER
    * event shifts a user's cohort, the stateful stage emits -1 deltas
    * for every previously-emitted cell and +1 deltas for the
    * re-based cells, so the downstream sum-aggregation settles to the
    * same matrix a batch recompute would produce — eventual exactness
    * instead of the frozen-wrong cohorts of an append-only design.
    *
    * Scale shape: state is ONE 16-byte (cohortDay, mask) pair per
    * user (the mask bounds tracked periods to `maxPeriods` ≤ 63 —
    * retention reports read a fixed horizon anyway); the stateful
    * stage is keyed by user (hash-distributed, no skew beyond a
    * user's own events); deltas are ≤ 64 rows per user per shift and
    * the final aggregation is matrix-sized. flatMapGroupsWithState
    * runs in Append mode, so the downstream aggregation chains
    * legally in a streaming query (update/complete sink).
    *
    * `unit` is day|week (the batch operator additionally supports
    * month; calendar months have no fixed day width, so the compact
    * epoch-day state would need month arithmetic — use the batch
    * operator for monthly reports).
    */
  def streamingCohortRetention(events: DataFrame, userCol: String,
      tsCol: String, unit: String = "day", maxPeriods: Int = 63,
      watermark: String = "30 days"): DataFrame = {
    val width = unit match {
      case "day" => 1L
      case "week" => 7L
      case other => throw new IllegalArgumentException(
        s"unit must be day or week, got '$other'")
    }
    require(maxPeriods >= 1 && maxPeriods <= 63,
      s"maxPeriods must be in [1, 63], got $maxPeriods")
    val spark = events.sparkSession
    import spark.implicits._
    val isStreaming = events.isStreaming
    val wm = if (isStreaming) events.withWatermark(tsCol, watermark)
      else events
    val ev = wm
      .where(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol).cast("long").as("user"),
        datediff(date_trunc(unit, col(tsCol)),
          lit("1970-01-01").cast("timestamp")).cast("long").as("day"))
      .as[CohortEvent]

    val deltas = ev.groupByKey(_.user).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.NoTimeout) {
      (_: Long, rows: Iterator[CohortEvent],
          state: GroupState[CohortState]) =>
        val days = rows.map(_.day).toSet
        if (days.isEmpty) Iterator.empty
        else {
          val newMin = days.min
          val (c0, mask0) =
            if (state.exists) (state.get.cohortDay, state.get.mask)
            else (Long.MaxValue, 0L)
          val c = math.min(newMin, c0)
          // period numbers (relative to the NEW cohort) of this
          // batch's activity, capped at the tracked horizon
          var addMask = 0L
          days.foreach { d =>
            val p = (d - c) / width
            if (p <= maxPeriods) addMask |= 1L << p
          }
          val out = Iterator.newBuilder[CellDelta]
          if (c0 != Long.MaxValue && c < c0) {
            // cohort shifted earlier: retract every emitted cell and
            // re-base the old activity onto the new cohort
            val shift = ((c0 - c) / width).toInt
            var i = 0
            while (i <= maxPeriods) {
              if ((mask0 & (1L << i)) != 0L) {
                out += CellDelta(c0, i, -1)
                val j = i + shift
                if (j <= maxPeriods) addMask |= 1L << j
              }
              i += 1
            }
            state.update(CohortState(c, addMask))
            var j = 0
            while (j <= maxPeriods) {
              if ((addMask & (1L << j)) != 0L) out += CellDelta(c, j, 1)
              j += 1
            }
          } else {
            // same (or first) cohort: emit only the NEW period bits
            val fresh = addMask & ~mask0
            state.update(CohortState(c, mask0 | addMask))
            var j = 0
            while (j <= maxPeriods) {
              if ((fresh & (1L << j)) != 0L) out += CellDelta(c, j, 1)
              j += 1
            }
          }
          out.result()
        }
    }

    // NO ">0" filter here: in an update-mode continuous run a cell
    // retracted to zero MUST be emitted so the sink can drop it (a
    // filter would leave the stale positive value standing); in batch
    // mode no retraction ever fires, so every settled cell is >= 1
    // anyway and the output is exactly the distinct-active matrix
    deltas.toDF("cohortDay", "periodNo", "delta")
      .groupBy((col("cohortDay") * lit(86400000000L)).as("cohort_us"),
        col("periodNo").cast("long").as("period_no"))
      .agg(sum(col("delta")).cast("long").as("active_users"))
  }
}
