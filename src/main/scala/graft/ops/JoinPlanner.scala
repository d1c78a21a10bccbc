package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.sketch.CountMin

/** Sketch-driven equi-join planning — the tie between the profiling
  * tier and the scale utilities it was built to inform. At 100 TB the
  * join-strategy decision (broadcast the small side? salt the hot
  * keys? plain shuffle?) is usually made blind and discovered to be
  * wrong by an executor OOM three hours in. This helper makes the
  * decision FROM MEASUREMENTS, each a bounded one-pass aggregation:
  *
  *  - the small side's exact row count (one order-free count),
  *  - the large side's key-skew profile ([[Profile.keySkew]] — one
  *    map-side-combined shuffle of per-key counts, top-N by bounded
  *    heap),
  *  - optionally the Count-Min inner-product join-size estimate
  *    ([[CountMin.joinSizeEstimate]], Cormode–Muthukrishnan): two
  *    one-pass d×w sketches bound the output cardinality from above
  *    BEFORE paying the join — the planner-style blow-up check.
  *
  * Decision: small side under `broadcastRowLimit` → broadcast (no
  * shuffle of the large side at all); otherwise, if the large side's
  * hottest key holds more than `hotKeyShare` of its rows (or the hot
  * tail above `hotFactor`× the mean holds more than `hotShare`) →
  * [[ScaleOps.saltedJoin]] (the replicate-small-by-salt shape that
  * spreads a hot key over `salts` reducers); otherwise a plain
  * shuffle join (AQE's runtime skew handling stays available).
  * The decision record carries every measured input, so the choice is
  * auditable and re-checkable as the data drifts.
  *
  * Composite keys concatenate with the 0x1F unit separator for the
  * sketch (the engine's documented composite-key convention): keys
  * containing a literal 0x1F could alias in the ESTIMATE only — the
  * join itself always uses the real columns.
  */
object JoinPlanner {

  /** The auditable decision: `strategy` ∈ broadcast | salted |
    * shuffle, plus the measurements that produced it. `estJoinRows` is
    * the CMS upper-bound estimate (−1 when not measured).
    */
  final case class JoinDecision(strategy: String, smallRows: Long,
      largeRows: Long, topKeyShare: Double, hotShare: Double,
      estJoinRows: Long, salts: Int)

  private def keyExpr(keyCols: Seq[String]): Column =
    if (keyCols.length == 1) col(keyCols.head).cast("string")
    else concat_ws("\u001f", keyCols.map(c => col(c).cast("string")): _*)

  private def cmsOf(df: DataFrame, keyCols: Seq[String], depth: Int,
      width: Int): DataFrame =
    CountMin.sketch(df.select(array(keyExpr(keyCols)).as("__k")),
      col("__k"), depth, width)

  /** Measure and decide. Planning cost: one count of `small`, one
    * key-count shuffle of `large`, and (when `estimate`) one extra
    * scan of each side for the sketches — all bounded-state passes; no
    * join is executed.
    */
  def plan(large: DataFrame, small: DataFrame, keyCols: Seq[String],
      broadcastRowLimit: Long = 1000000L, hotKeyShare: Double = 0.05,
      hotFactor: Double = 10.0, hotShare: Double = 0.2,
      salts: Int = 16, estimate: Boolean = true, cmsDepth: Int = 4,
      cmsWidth: Int = 1024): JoinDecision = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    require(broadcastRowLimit > 0, "broadcastRowLimit must be positive")
    require(hotKeyShare > 0 && hotKeyShare <= 1,
      s"hotKeyShare must be in (0, 1], got $hotKeyShare")
    require(salts > 0, s"salts must be positive, got $salts")
    val smallRows = small.count()
    val est =
      if (!estimate) -1L
      else CountMin.joinSizeEstimate(
        cmsOf(large, keyCols, cmsDepth, cmsWidth),
        cmsOf(small, keyCols, cmsDepth, cmsWidth),
        cmsDepth, cmsWidth).head().getLong(0)
    if (smallRows <= broadcastRowLimit)
      // the large side's skew is irrelevant under broadcast — skip its
      // profile pass entirely
      return JoinDecision("broadcast", smallRows, -1L, -1.0, -1.0, est,
        salts)
    val skewRows = Profile.keySkew(large, keyCols, topN = 1,
      hotFactor = hotFactor).collect()
    if (skewRows.isEmpty)
      // a zero-row large side has no skew profile (keySkew emits no
      // rows); nothing to protect — the plain shuffle join is free
      return JoinDecision("shuffle", smallRows, 0L, 0.0, 0.0, est, salts)
    val skew = skewRows(0)
    val largeRows = skew.getAs[Long]("n_rows")
    val topShare = skew.getAs[Double]("share")
    val hotSh = skew.getAs[Double]("hot_share")
    val strategy =
      if (topShare > hotKeyShare || hotSh > hotShare) "salted"
      else "shuffle"
    JoinDecision(strategy, smallRows, largeRows, topShare, hotSh, est,
      salts)
  }

  /** Execute the decided join. `uniqueCol` is only consulted on the
    * salted path (the per-row salt source — any high-cardinality
    * column of `large`, see [[ScaleOps.saltedJoin]]). Returns the
    * joined frame plus the decision for the caller's logs.
    */
  def autoJoin(large: DataFrame, small: DataFrame, keyCols: Seq[String],
      uniqueCol: Column, broadcastRowLimit: Long = 1000000L,
      hotKeyShare: Double = 0.05, hotFactor: Double = 10.0,
      hotShare: Double = 0.2, salts: Int = 16,
      estimate: Boolean = true): (DataFrame, JoinDecision) = {
    val d = plan(large, small, keyCols, broadcastRowLimit, hotKeyShare,
      hotFactor, hotShare, salts, estimate)
    val joined = d.strategy match {
      case "broadcast" => large.join(broadcast(small), keyCols)
      case "salted" =>
        ScaleOps.saltedJoin(large, small, keyCols, d.salts, uniqueCol)
      case _ => large.join(small, keyCols)
    }
    (joined, d)
  }
}
