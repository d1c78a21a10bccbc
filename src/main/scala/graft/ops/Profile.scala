package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** Dataset profiling — the ingest-QC primitive of a large-scale pipeline:
  * before 100 TB of new data joins a training corpus, per-column row /
  * null / distinct counts, ranges and exact sums are what catches schema
  * drift, silently-null feeds and unit blunders.
  *
  * Everything emitted is ORDER-FREE by construction, so results are
  * bit-identical on any partitioning and a DuckDB oracle can pin them:
  * counts are integers, min/max are exact, and sums run through an
  * exact decimal type (no float-order drift) before the final single
  * rounding back to double.
  *
  * Scale notes:
  *  - [[profileNumeric]] is ONE aggregation pass. With `exact = true`
  *    the per-column distinct counts make Catalyst plan an Expand (one
  *    input replica per distinct aggregate) — exact, but the map side
  *    grows |cols|×. At 100 TB pass `exact = false`: HyperLogLog++
  *    sketches (`approx_count_distinct`) are partial-aggregable, no
  *    Expand, one scan — the standard profiling trade.
  *  - [[equiWidthHistogram]] with explicit bounds is one scan; with
  *    derived bounds it is two scans (min/max pass + count pass) — at
  *    scale prefer explicit bounds from a prior [[profileNumeric]].
  */
object Profile {

  /** One profile row per numeric column: (column, n_rows, n_nulls,
    * n_distinct, min_value, max_value, sum_value), ordered by column
    * name. See object doc for the `exact` trade-off.
    *
    * @param sumType the exact decimal type sums accumulate in before the
    *   single rounding back to double — size it to the data (the default
    *   DECIMAL(18,2) covers money-style 2-decimal values and stays in
    *   the engine's fast 64-bit decimal path; widen the scale for
    *   finer-grained values).
    */
  def profileNumeric(df: DataFrame, cols: Seq[String],
      exact: Boolean = true,
      sumType: String = "decimal(18,2)"): DataFrame = {
    require(cols.nonEmpty, "cols must be non-empty")
    cols.foreach { c =>
      val f = df.schema.find(_.name == c).getOrElse(
        throw new IllegalArgumentException(s"no such column: $c"))
      require(f.dataType.isInstanceOf[NumericType],
        s"column $c is ${f.dataType.simpleString}, not numeric")
    }
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__cnt_$c"),
        (if (exact) count_distinct(col(c))
         else approx_count_distinct(col(c))).as(s"__dst_$c"),
        min(col(c)).cast("double").as(s"__min_$c"),
        max(col(c)).cast("double").as(s"__max_$c"),
        sum(col(c).cast(sumType)).cast("double").as(s"__sum_$c"))
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    one.select(explode(array(cols.map(c => struct(
        lit(c).as("column"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__cnt_$c")).as("n_nulls"),
        col(s"__dst_$c").as("n_distinct"),
        col(s"__min_$c").as("min_value"),
        col(s"__max_$c").as("max_value"),
        col(s"__sum_$c").as("sum_value"))): _*)).as("__p"))
      .select(col("__p.*"))
      .orderBy(col("column"))
  }

  /** Equi-width histogram of a numeric column: nBins buckets over
    * [min, max] (derived in a first pass when `bounds` is None), the top
    * edge closed (x == max lands in the last bin). Returns (bin,
    * bin_lo, bin_hi, n) for OCCUPIED bins, ordered by bin — integer
    * counts, order-free, exact on any partitioning. Null values are
    * excluded. Degenerate ranges (min == max, or an all-null column)
    * collapse to a single bin 0 row carrying the whole count (or an
    * empty frame when there are no non-null rows).
    */
  def equiWidthHistogram(df: DataFrame, c: String, nBins: Int,
      bounds: Option[(Double, Double)] = None): DataFrame = {
    require(nBins > 0, s"nBins must be positive, got $nBins")
    val f = df.schema.find(_.name == c).getOrElse(
      throw new IllegalArgumentException(s"no such column: $c"))
    require(f.dataType.isInstanceOf[NumericType],
      s"column $c is ${f.dataType.simpleString}, not numeric")
    bounds.foreach { case (lo, hi) => require(lo <= hi,
      s"bounds must satisfy lo <= hi, got ($lo, $hi)") }
    val withB = bounds match {
      case Some((lo, hi)) =>
        df.select(col(c).cast("double").as("__x"))
          .withColumn("__mn", lit(lo)).withColumn("__mx", lit(hi))
          .filter(col("__x") >= col("__mn") && col("__x") <= col("__mx"))
      case None =>
        val mm = broadcast(df.agg(
          min(col(c)).cast("double").as("__mn"),
          max(col(c)).cast("double").as("__mx")))
        df.select(col(c).cast("double").as("__x"))
          .filter(col("__x").isNotNull).crossJoin(mm)
    }
    // bin = clamp(floor((x - mn) * nBins / (mx - mn)), nBins - 1); the
    // degenerate mx == mn range divides to NaN/Inf → coalesce-style
    // fallback to bin 0 via the when guard
    val bin = when(col("__mx") === col("__mn"), lit(0))
      .otherwise(least(
        floor((col("__x") - col("__mn")) * lit(nBins.toDouble) /
          (col("__mx") - col("__mn"))).cast("int"),
        lit(nBins - 1)))
    withB
      .select(bin.as("bin"), col("__mn"), col("__mx"))
      .groupBy(col("bin"), col("__mn"), col("__mx"))
      .agg(count(lit(1)).as("n"))
      .select(col("bin"),
        (col("__mn") + col("bin").cast("double") *
          ((col("__mx") - col("__mn")) / lit(nBins.toDouble))).as("bin_lo"),
        (col("__mn") + (col("bin") + 1).cast("double") *
          ((col("__mx") - col("__mn")) / lit(nBins.toDouble))).as("bin_hi"),
        col("n"))
      .orderBy(col("bin"))
  }
}
