package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming Type-2 SCD history build — the CDC-ingestion twin of
  * [[graft.ops.ScaleOps.scd2]]: a changelog stream folds into
  * versioned `[valid_from, valid_to)` dimension rows per business key.
  * This is the one scale-utility operator with obvious continuous
  * demand (round-13 verdict #4): a warehouse dimension fed by change
  * data capture cannot re-sort the full history per batch.
  *
  * Semantics under OUT-OF-ORDER arrival (the reason a naive per-row
  * fold is wrong): changes buffer per key while their event time is
  * above the watermark, and FINALIZE — in (ts, attr) order, the batch
  * operator's exact tie rule — only once the watermark guarantees no
  * earlier change can still arrive. A closed version is emitted
  * exactly once, append-mode, and never needs revision: every
  * still-possible arrival has event time ≥ the watermark that sealed
  * it. The OPEN (current) version stays in state — it is the one row
  * a later change may still close — so the continuous stream emits
  * closed history rows only.
  *
  * Batch mode runs the IDENTICAL fold once per fully-buffered key with
  * an infinite effective watermark and ALSO emits the trailing open
  * row (`is_current = true`, null `valid_to`): the output equals
  * [[graft.ops.ScaleOps.scd2]] row-for-row (spec-pinned), which makes
  * the streaming semantics DuckDB-oracle-checkable.
  *
  * Scale contract (the funnel-tier discipline):
  *  - state per key = the open version (one attr + two longs) plus the
  *    in-horizon change buffer, capped at `maxBufferedChanges` with a
  *    LOUD failure (silently dropping a change would corrupt history);
  *  - only (key, ts, attr) shuffles — the projection drops payloads
  *    before the state operator;
  *  - buffered changes evict at finalization (event-time timeout), so
  *    the BUFFER side is bounded by keys-active-within-watermark ×
  *    cap. The per-key OPEN version (one attr + two longs) has no
  *    TTL — SCD2 must be able to close a version however late the
  *    next change arrives — so that slice of state grows with TOTAL
  *    key cardinality, not watermark-active keys. At 100 TB that is
  *    ~tens of bytes per entity, which is the irreducible cost of
  *    type-2 history; bound the key domain upstream if that is too
  *    much.
  *
  * Key is integral (the funnel contract — rejected by name otherwise);
  * the tracked attribute is ONE string column (dictionary-encode or
  * concat composite attrs); null attribute values are allowed and
  * compare null-safe, like the batch operator's `<=>`.
  */
object StreamingScd2 {

  final case class Change(key: Long, ts: Timestamp, attr: String) {
    /** Full microsecond precision (getTime is millis — the funnel
      * precision rule). */
    def us: Long = ts.getTime * 1000L + (ts.getNanos % 1000000L) / 1000L
  }

  /** Per-key state: the open version (valid when `hasCur`) + the
    * not-yet-finalizable change buffer (arrival order; finalize sorts).
    */
  final case class Scd2State(curFromUs: Long, curAttr: String,
      curVersion: Long, hasCur: Boolean,
      bufUs: Array[Long], bufAttr: Array[String])

  /** One emitted history row; `validToUs` None = still current (batch
    * mode only — a continuous stream never emits the open row).
    */
  final case class Scd2Row(key: Long, attr: String, validFromUs: Long,
      validToUs: Option[Long], isCurrent: Boolean, versionNo: Long)

  private val emptyState =
    Scd2State(0L, null, 0L, hasCur = false,
      Array.emptyLongArray, Array.empty[String])

  /** Spark's string sort order for the (ts, attr) tie rule: nulls
    * first, then UTF8String binary comparison — so same-timestamp
    * deliveries resolve exactly like the batch operator's window sort.
    */
  private val attrOrd: Ordering[String] = (a: String, b: String) =>
    if (a == null && b == null) 0
    else if (a == null) -1
    else if (b == null) 1
    else org.apache.spark.unsafe.types.UTF8String.fromString(a)
      .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b))

  /** Fold every buffered change with `us < horizonUs` into the version
    * chain in (us, attr) order — the batch operator's pinned tie rule —
    * returning (closed rows to emit, next state). Consecutive
    * null-safe-identical attrs collapse, exactly like scd2's `<=>`.
    */
  private[streaming] def finalizeBelow(key: Long, st: Scd2State,
      horizonUs: Long): (Seq[Scd2Row], Scd2State) = {
    val (ready, hold) = st.bufUs.indices
      .partition(i => st.bufUs(i) < horizonUs)
    if (ready.isEmpty) (Nil, st)
    else {
      val sorted = ready.map(i => (st.bufUs(i), st.bufAttr(i)))
        .sortBy(identity)(Ordering.Tuple2(Ordering.Long, attrOrd))
      val out = Seq.newBuilder[Scd2Row]
      var (from, attr, ver, has) =
        (st.curFromUs, st.curAttr, st.curVersion, st.hasCur)
      sorted.foreach { case (us, a) =>
        if (!has) { from = us; attr = a; ver += 1; has = true }
        else if (!java.util.Objects.equals(attr, a)) {
          out += Scd2Row(key, attr, from, Some(us), isCurrent = false,
            ver)
          from = us; attr = a; ver += 1
        } // identical consecutive attr: collapse (non-change)
      }
      (out.result(), Scd2State(from, attr, ver, has,
        hold.map(st.bufUs).toArray, hold.map(st.bufAttr).toArray))
    }
  }

  private def projected(changes: DataFrame, keyCol: String,
      tsCol: String, attrCol: String): Dataset[Change] = {
    val spark = changes.sparkSession
    import spark.implicits._
    val keyType = changes.schema(keyCol).dataType
    require(graft.dedup.Dedup.integralIdTypes.contains(keyType),
      s"StreamingScd2: key column '$keyCol' must be integral (the " +
        s"streaming state key is a Long), got $keyType — hash or " +
        "dictionary-encode the key first, or use ScaleOps.scd2")
    changes.filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(col(keyCol).cast("long").as("key"),
        col(tsCol).cast("timestamp").as("ts"),
        col(attrCol).cast("string").as("attr"))
      .as[Change]
  }

  private def insert(st: Scd2State, c: Change, cap: Int): Scd2State = {
    if (st.bufUs.length >= cap)
      throw new IllegalStateException(
        s"StreamingScd2: key ${c.key} exceeded $cap buffered changes " +
          "inside one watermark horizon — a degenerate emitter; " +
          "pre-filter it or raise maxBufferedChanges")
    st.copy(bufUs = st.bufUs :+ c.us, bufAttr = st.bufAttr :+ c.attr)
  }

  /** Streaming history rows (Append mode): closed versions emit once
    * the watermark seals them; the open version stays in state. The
    * timestamp column must carry the stream's event time.
    */
  def scd2Rows(changes: DataFrame, keyCol: String, tsCol: String,
      attrCol: String, watermark: String = "1 hour",
      maxBufferedChanges: Int = 65536): Dataset[Scd2Row] = {
    require(maxBufferedChanges >= 1,
      s"maxBufferedChanges must be positive, got $maxBufferedChanges")
    val spark = changes.sparkSession
    import spark.implicits._
    // watermark the PROJECTED frame: tagging before the ts cast would
    // lose the watermark attribute to the cast's new expression id
    projected(changes, keyCol, tsCol, attrCol)
      .withWatermark("ts", watermark)
      .as[Change]
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (key: Long, rows: Iterator[Change],
            state: GroupState[Scd2State]) =>
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          var st = state.getOption.getOrElse(emptyState)
          rows.foreach { c => st = insert(st, c, maxBufferedChanges) }
          val (closed, next) = finalizeBelow(key, st, wmUs)
          state.update(next)
          if (next.bufUs.nonEmpty) {
            // wake when the watermark can seal the oldest held change
            // (timeout timestamps must sit strictly above the current
            // watermark)
            val oldestMs = next.bufUs.min / 1000L
            state.setTimeoutTimestamp(
              math.max(oldestMs, state.getCurrentWatermarkMs() + 1L))
          }
          closed.iterator
      }
  }

  /** Batch-mode twin: the identical fold per fully-buffered key under
    * an infinite watermark, PLUS the trailing open row — equals
    * [[graft.ops.ScaleOps.scd2]] row-for-row (Scd2StreamSpec), the
    * DuckDB-checkable surface of the streaming semantics.
    */
  def scd2RowsBatch(changes: DataFrame, keyCol: String, tsCol: String,
      attrCol: String, maxBufferedChanges: Int = 65536): Dataset[Scd2Row] = {
    require(maxBufferedChanges >= 1,
      s"maxBufferedChanges must be positive, got $maxBufferedChanges")
    val spark = changes.sparkSession
    import spark.implicits._
    projected(changes, keyCol, tsCol, attrCol)
      .groupByKey(_.key)
      .mapGroups { (key, rows) =>
        var st = emptyState
        rows.foreach { c => st = insert(st, c, maxBufferedChanges) }
        val (closed, fin) = finalizeBelow(key, st, Long.MaxValue)
        (key, closed, fin)
      }
      .flatMap { case (key, closed, fin) =>
        closed ++ (if (fin.hasCur)
          Seq(Scd2Row(key, fin.curAttr, fin.curFromUs, None,
            isCurrent = true, fin.curVersion))
        else Nil)
      }
  }

  /** The named-column surface matching the batch operator's gate shape:
    * (key, attr, valid_from_us, valid_to_us, is_current, version_no).
    */
  def asColumns(rows: Dataset[Scd2Row], keyName: String,
      attrName: String): DataFrame =
    rows.toDF().select(col("key").as(keyName),
      col("attr").as(attrName),
      col("validFromUs").as("valid_from_us"),
      col("validToUs").as("valid_to_us"),
      col("isCurrent").as("is_current"),
      col("versionNo").as("version_no"))
}
