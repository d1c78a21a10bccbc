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
    val matchedCol = s"${rightTimeCol}_matched"

    // tag and union: right rows sort before left rows at the same
    // timestamp, so an exactly-equal right row is visible to the left row
    // (inclusive semantics, both directions)
    val rightTagged = right.select(
      (keyCols.map(col) :+ col(rightTimeCol).as("__t") :+ lit(0).as("__side"))
        ++ payload.map(c => col(c).as(s"__p_$c")): _*)
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

    val matchedT = last(when(col("__side") === 0, col("__t")),
      ignoreNulls = true).over(w)
    val withFill = payload.foldLeft(
        unioned.withColumn(matchedCol, matchedT)) { (df, c) =>
      df.withColumn(s"__f_$c",
        last(col(s"__p_$c"), ignoreNulls = true).over(w))
    }

    val tolOk: Column = toleranceMicros match {
      case Some(tol) =>
        abs(unix_micros(col("__t")) - unix_micros(col(matchedCol))) <= tol
      case None => lit(true)
    }
    val out = withFill.filter(col("__side") === 1)
    val projected = payload.foldLeft(out) { (df, c) =>
      df.withColumn(c, when(tolOk, col(s"__f_$c")))
    }.withColumn(matchedCol, when(tolOk, col(matchedCol)))
    projected.select(
      (left.columns.map(col) ++ payload.map(col) :+ col(matchedCol)): _*)
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
      bucketSeconds: Long, extraKeys: Seq[String] = Nil): DataFrame = {
    val b = lit(bucketSeconds)
    val probeB = probe.withColumn("__bucket",
      floor(unix_seconds(col(probeTimeCol).cast("timestamp")) / b))
    // an interval [s, e) covers buckets floor(s/b) .. floor((e-1)/b);
    // sequence() is inclusive on both ends
    val intervalsB = intervals.withColumn("__bucket", explode(sequence(
      floor(unix_seconds(col(startCol).cast("timestamp")) / b),
      floor((unix_seconds(col(endCol).cast("timestamp")) - 1) / b))))
    probeB.join(intervalsB, extraKeys :+ "__bucket")
      .filter(col(probeTimeCol) >= col(startCol) &&
        col(probeTimeCol) < col(endCol))
      .drop("__bucket")
  }
}
