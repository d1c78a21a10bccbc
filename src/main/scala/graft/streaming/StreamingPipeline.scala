package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
}
