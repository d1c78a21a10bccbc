package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series join operators Spark lacks natively: point-in-time (as-of)
  * join and interval (range) join — the two staples of financial and
  * event-log analytics (pandas `merge_asof`; reference index alignment,
  * strats.py:592-601, is the backward-as-of special case with a shared
  * calendar).
  *
  * Scale design:
  *  - As-of is NOT implemented as a range join: the union+window
  *    formulation shuffles each side once on the key, forward-fills the
  *    latest right payload, and never materializes a candidate pair — at
  *    100 TB the cost is one sort-based window over (key, time), the same
  *    plan class as any cumulative window. A per-pair formulation would
  *    explode quadratically on dense quotes.
  *  - Range join buckets the time axis: each interval is exploded onto the
  *    fixed-width buckets it covers, each probe row to its one bucket, and
  *    the match is an equi-join on (keys…, bucket) + a precise residual
  *    predicate. Candidate pairs shrink from |L|·|R| to pairs sharing a
  *    bucket — the published interval-bucketing technique. For a tiny
  *    interval side, pass it as the right: the equi-join broadcasts.
  */
object Joins {

  /** Point-in-time join: for every left row, attach the payload of the
    * latest right row with `right.time <= left.time` on the same key
    * (direction "backward", ties inclusive), or the earliest right row
    * with `right.time >= left.time` ("forward"). Right payload columns =
    * all right columns except keys and time; they are appended to the left
    * row (null when no match / outside `toleranceMicros`). The matched
    * right time is appended as `<rightTimeCol>_matched`.
    *
    * Right rows should be unique per (keys, time) — with duplicates the
    * surviving payload is the last in encounter order, which is not
    * deterministic across shuffles (same caveat as pandas merge_asof).
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTimeCol: String, rightTimeCol: String,
      direction: String = "backward",
      toleranceMicros: Option[Long] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    val payload = right.columns.filterNot(c =>
      keyCols.contains(c) || c == rightTimeCol).toSeq
    require(payload.nonEmpty, "right side has no payload columns")
    val clash = payload.filter(left.columns.contains)
    require(clash.isEmpty, "right payload columns collide with left " +
      s"columns (${clash.mkString(", ")}) — rename them before joining")
    val matchedCol = s"${rightTimeCol}_matched"

    // tag and union: right rows sort before left rows at the same
    // timestamp, so an exactly-equal right row is visible to the left row
    // (inclusive semantics, both directions). The whole right payload
    // travels in ONE struct so the fill below always splices a complete
    // right row — a per-column fill would tear rows whenever the matched
    // right row holds a null in one payload column (splicing that column
    // from an older row, unlike pandas merge_asof / DuckDB ASOF).
    val rightTagged = right.select(
      keyCols.map(col) ++ Seq(
        col(rightTimeCol).as("__t"), lit(0).as("__side"),
        struct((payload.map(col) :+ col(rightTimeCol).as("__mt")): _*)
          .as("__p")): _*)
    val leftTagged = left
      .withColumn("__t", col(leftTimeCol))
      .withColumn("__side", lit(1))
    val unioned = leftTagged.unionByName(rightTagged,
      allowMissingColumns = true)

    val ord = if (direction == "backward")
      Seq(col("__t").asc, col("__side").asc)
    else Seq(col("__t").desc, col("__side").asc)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // __p is null on every left row, so one ignoreNulls fill carries the
    // latest complete right row forward
    val out = unioned
      .withColumn("__f", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val tolOk: Column = toleranceMicros match {
      case Some(tol) =>
        abs(unix_micros(col("__t")) -
          unix_micros(col("__f").getField("__mt"))) <= tol
      case None => lit(true)
    }
    val projected = payload.foldLeft(out) { (df, c) =>
      df.withColumn(c, when(tolOk, col("__f").getField(c)))
    }.withColumn(matchedCol, when(tolOk, col("__f").getField("__mt")))
    projected.select(
      (left.columns.toIndexedSeq.map(col) ++ payload.map(col) :+ col(matchedCol)): _*)
  }

  /** Interval (range) join: rows of `probe` whose `probeTimeCol` falls in
    * `[startCol, endCol)` of `intervals`, optionally also matching
    * `extraKeys` equi-columns. Implemented as bucket-exploded equi-join:
    * intervals land on every `bucketSeconds`-wide bucket they overlap,
    * probes on exactly one, so the join is an equi-join on
    * (extraKeys…, bucket) with the precise containment as a residual
    * filter. Pick `bucketSeconds` near the typical interval length: much
    * smaller multiplies the interval-side explode, much larger multiplies
    * the per-bucket candidates.
    */
  def rangeJoin(probe: DataFrame, probeTimeCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      bucketSeconds: Long, extraKeys: Seq[String] = Nil,
      maxBucketsPerInterval: Int = 65536): DataFrame = {
    require(maxBucketsPerInterval > 0,
      s"maxBucketsPerInterval must be positive, got $maxBucketsPerInterval")
    // buckets derive from MICROsecond timestamps: unix_seconds truncates,
    // so an exclusive end inside a fractional second (e.g. end = 10.5 s,
    // bucket = 1 s) would stop one bucket short and silently drop probes
    // in the interval's final fraction. floorDiv on exact integers — no
    // double rounding, correct for pre-1970 (negative) times too.
    val us = lit(bucketSeconds * 1000000L)
    def floorDiv(x: Column, d: Column): Column =
      ((x - pmod(x, d)) / d).cast("long")
    val probeB = probe.withColumn("__bucket",
      floorDiv(unix_micros(col(probeTimeCol).cast("timestamp")), us))
    // an interval [s, e) covers buckets floorDiv(s) .. floorDiv(e-1µs);
    // sequence() is inclusive on both ends. The explode is the one fan-out
    // in this operator, and it is UNBOUNDED in the interval length: a
    // year-long interval at 1 s buckets would emit 31M rows from one input
    // row and quietly melt an executor. Fail fast instead — a span over
    // maxBucketsPerInterval means bucketSeconds is mis-sized for this
    // data; the fix is a coarser bucket (or splitting outlier intervals),
    // never silently eating the explosion. assert_true rides inside the
    // end-bucket expression so it cannot be pruned away.
    //
    // Degenerate intervals are dropped BEFORE the explode: an
    // empty/inverted interval (end <= start, also covering a zeroed or
    // null timestamp) can never match a probe, but sequence() would
    // still fan it out — descending and unboundedly for an inverted one
    // (sequence auto-steps -1), which would both melt the executor AND
    // bypass a naive non-negative span check. The strict filter also
    // drops null bounds, keeping them non-matches rather than errors.
    val valid = intervals.filter(
      col(endCol).cast("timestamp") > col(startCol).cast("timestamp"))
    val startB = floorDiv(unix_micros(col(startCol).cast("timestamp")), us)
    val endB = floorDiv(unix_micros(col(endCol).cast("timestamp")) - 1, us)
    val span = endB - startB + 1 // >= 1 after the validity filter
    val guardedEndB = when(
      assert_true(span <= lit(maxBucketsPerInterval.toLong),
        concat(lit("rangeJoin: an interval spans "), span,
          lit(s" buckets > maxBucketsPerInterval=$maxBucketsPerInterval; " +
            s"raise bucketSeconds (=$bucketSeconds) or split the interval"))
      ).isNull, endB)
    val intervalsB = valid.withColumn("__bucket",
      explode(sequence(startB, guardedEndB)))
    probeB.join(intervalsB, extraKeys :+ "__bucket")
      .filter(col(probeTimeCol) >= col(startCol) &&
        col(probeTimeCol) < col(endCol))
      .drop("__bucket")
  }
}
