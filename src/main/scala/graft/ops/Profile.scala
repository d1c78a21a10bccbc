package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** Dataset profiling — the ingest-QC primitive of a large-scale pipeline:
  * before 100 TB of new data joins a training corpus, per-column row /
  * null / distinct counts, ranges and exact sums are what catches schema
  * drift, silently-null feeds and unit blunders.
  *
  * Everything emitted is ORDER-FREE by construction, so results are
  * bit-identical on any partitioning and a DuckDB oracle can pin them:
  * counts are integers, min/max come out as doubles (exact up to
  * double's 2^53 integer range — the profile is a QC report, not an
  * arithmetic source), and sums run through an exact decimal type (no
  * float-order drift) before the final single rounding back to double.
  *
  * Scale notes:
  *  - [[profileNumeric]] with `exact = false` is ONE aggregation pass:
  *    HyperLogLog++ sketches (`approx_count_distinct`) are
  *    partial-aggregable, so the whole profile is a single scan — the
  *    100 TB default. With `exact = true` the distinct counts run as a
  *    separate (column, value) pair aggregation — posexplode to pairs,
  *    map-side dedup, two-level count — which measures ~4× faster than
  *    letting Catalyst plan the per-column distinct aggregates via
  *    Expand (the Expand plan replicates every input row |cols|+1
  *    times into one mixed hash aggregate). Pairs explode per NATIVE
  *    column type (no cross-type coercion, so a long column never
  *    round-trips through double and distinct counts stay exact), and
  *    the shuffle still carries only per-partition-distinct pairs; when
  *    even that is too much (near-unique keys at corpus scale), the
  *    sketches are the knob.
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
    *   single rounding back to double — size it to the data. The default
    *   DECIMAL(38,6) absorbs 6-decimal values up to ~10^32. The per-value
    *   cast is the contract's edge: values FINER than the scale round to
    *   it before summing, and values beyond the precision cast to null
    *   and silently drop from the sum (Spark non-ANSI cast) — narrow
    *   scales like DECIMAL(18,2) are faster (64-bit decimal path) but
    *   only safe when the data is known coarser than the scale.
    */
  def profileNumeric(df: DataFrame, cols: Seq[String],
      exact: Boolean = true,
      sumType: String = "decimal(38,6)"): DataFrame = {
    require(cols.nonEmpty, "cols must be non-empty")
    require(cols.distinct == cols, "cols must not repeat a column")
    cols.foreach { c =>
      val f = df.schema.find(_.name == c).getOrElse(
        throw new IllegalArgumentException(s"no such column: $c"))
      require(f.dataType.isInstanceOf[NumericType],
        s"column $c is ${f.dataType.simpleString}, not numeric")
    }
    val aggs = cols.flatMap { c =>
      (if (exact) Nil
       else Seq(approx_count_distinct(col(c)).as(s"__dst_$c"))) ++ Seq(
        count(col(c)).as(s"__cnt_$c"),
        min(col(c)).cast("double").as(s"__min_$c"),
        max(col(c)).cast("double").as(s"__max_$c"),
        sum(col(c).cast(sumType)).cast("double").as(s"__sum_$c"))
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val perCol = one.select(explode(array(cols.map(c => struct(
        lit(c).as("column"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__cnt_$c")).as("n_nulls"),
        (if (exact) lit(0L) else col(s"__dst_$c")).as("n_distinct"),
        col(s"__min_$c").as("min_value"),
        col(s"__max_$c").as("max_value"),
        col(s"__sum_$c").as("sum_value"))): _*)).as("__p"))
      .select(col("__p.*"))
    val out = if (!exact) perCol else {
      // Expand-free exact distincts: one (column-index, value) pair
      // stream per NATIVE column type (no coercion), deduped map-side,
      // two-level count; nulls drop to match count_distinct semantics.
      // NaN and -0.0 normalize identically in grouping keys and in
      // count_distinct, so the swap is value-exact (spec-pinned).
      val dst = cols.zipWithIndex.groupBy { case (c, _) =>
          df.schema(df.schema.fieldIndex(c)).dataType }
        .values.toSeq
        .map { grp =>
          val names = array(grp.map { case (c, _) => lit(c) }: _*)
          df.select(posexplode(array(grp.map { case (c, _) => col(c) }: _*))
              .as(Seq("__i", "__v")))
            .filter(col("__v").isNotNull)
            .select("__i", "__v").distinct()
            .groupBy("__i").agg(count(lit(1)).as("__nd"))
            .select(element_at(names, col("__i") + 1).as("column"),
              col("__nd"))
        }
        .reduce(_ unionByName _)
      perCol.drop("n_distinct")
        .join(broadcast(dst), Seq("column"), "left")
        .select(col("column"), col("n_rows"), col("n_nulls"),
          coalesce(col("__nd"), lit(0L)).as("n_distinct"),
          col("min_value"), col("max_value"), col("sum_value"))
    }
    out.orderBy(col("column"))
  }

  /** Compare two [[profileNumeric]] outputs — the schema-drift /
    * feed-health check between corpus snapshots (yesterday's ingest vs
    * today's): a silently-nulled feed shows as a null-rate spike, an
    * id-space collapse as a distinct-count drop, a unit blunder as a
    * range widening — all BEFORE the snapshot joins the training
    * corpus. One row per column (full outer join, so added/removed
    * columns surface too):
    *
    *  - `status`: 'added' | 'removed' | 'drift' | 'ok' — 'drift' iff
    *    any flag fires
    *  - `null_spike` (1/0): null rate rose by more than `nullRateJump`
    *  - `distinct_collapse` (1/0): distinct count fell below
    *    `distinctDropFrac` × the before count
    *  - `range_widened` (1/0): new min below the old, or new max above
    *
    * Pure plan-level arithmetic over two ≤|cols|-row frames (broadcast
    * join, no shuffle); every value derives from the order-free
    * profiles, so the drift report is itself bit-stable.
    */
  def profileDrift(before: DataFrame, after: DataFrame,
      nullRateJump: Double = 0.01,
      distinctDropFrac: Double = 0.5): DataFrame = {
    require(nullRateJump >= 0,
      s"nullRateJump must be non-negative, got $nullRateJump")
    require(distinctDropFrac > 0 && distinctDropFrac <= 1,
      s"distinctDropFrac must be in (0, 1], got $distinctDropFrac")
    val want = Seq("column", "n_rows", "n_nulls", "n_distinct",
      "min_value", "max_value", "sum_value")
    Seq(("before", before), ("after", after)).foreach { case (side, df) =>
      require(df.columns.toSeq == want,
        s"$side frame is not a profileNumeric output: ${df.columns.toSeq}")
    }
    // an empty snapshot (n_rows = 0) has no null rate — emit null, not
    // the NaN of 0.0/0.0 (NaN compares greatest in Spark, which would
    // false-fire null_spike on every column)
    def rate(rows: Column, nulls: Column): Column =
      when(rows === 0, lit(null).cast("double"))
        .otherwise(nulls.cast("double") / rows.cast("double"))
    val b = before.select(col("column") +: want.tail.map(c =>
      col(c).as(s"${c}_before")): _*)
    val a = after.select(col("column") +: want.tail.map(c =>
      col(c).as(s"${c}_after")): _*)
    val nullSpike = (rate(col("n_rows_after"), col("n_nulls_after")) -
      rate(col("n_rows_before"), col("n_nulls_before"))) > lit(nullRateJump)
    val distinctCollapse = col("n_distinct_before") > 0 &&
      col("n_distinct_after").cast("double") <
        lit(distinctDropFrac) * col("n_distinct_before").cast("double")
    val rangeWidened = col("min_value_after") < col("min_value_before") ||
      col("max_value_after") > col("max_value_before")
    broadcast(b).join(broadcast(a), Seq("column"), "full_outer")
      .select(col("column"),
        when(col("n_rows_before").isNull, lit("added"))
          .when(col("n_rows_after").isNull, lit("removed"))
          .when(nullSpike || distinctCollapse || rangeWidened, lit("drift"))
          .otherwise(lit("ok")).as("status"),
        col("n_rows_before"), col("n_rows_after"),
        rate(col("n_rows_before"), col("n_nulls_before"))
          .as("null_rate_before"),
        rate(col("n_rows_after"), col("n_nulls_after"))
          .as("null_rate_after"),
        col("n_distinct_before"), col("n_distinct_after"),
        coalesce(nullSpike, lit(false)).cast("int").as("null_spike"),
        coalesce(distinctCollapse, lit(false)).cast("int")
          .as("distinct_collapse"),
        coalesce(rangeWidened, lit(false)).cast("int").as("range_widened"))
      .orderBy(col("column"))
  }

  /** Text-column twin of [[profileNumeric]] — the ingest-QC pass for
    * string columns: rows, nulls, distincts, EMPTY-string count and
    * character-length min/max/sum per column in one scan (plus the
    * Expand-free pair aggregation for exact distincts — all string
    * columns share one native type, so it is a single pair stream).
    * Every emitted value is an integer or a bounded extremum —
    * order-free, bit-stable on any partitioning and engine.
    * `exact = false` switches distincts to one-scan HLL++ sketches,
    * the 100 TB knob. A column of empty strings vs a column of nulls
    * vs a collapsed-vocabulary column are three different feed
    * failures; this separates them.
    */
  def profileText(df: DataFrame, cols: Seq[String],
      exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "cols must be non-empty")
    require(cols.distinct == cols, "cols must not repeat a column")
    cols.foreach { c =>
      val f = df.schema.find(_.name == c).getOrElse(
        throw new IllegalArgumentException(s"no such column: $c"))
      require(f.dataType == org.apache.spark.sql.types.StringType,
        s"column $c is ${f.dataType.simpleString}, not string")
    }
    val aggs = cols.flatMap { c =>
      (if (exact) Nil
       else Seq(approx_count_distinct(col(c)).as(s"__dst_$c"))) ++ Seq(
        count(col(c)).as(s"__cnt_$c"),
        sum(when(col(c) === "", 1L).otherwise(0L)).as(s"__emp_$c"),
        min(length(col(c))).cast("long").as(s"__mnl_$c"),
        max(length(col(c))).cast("long").as(s"__mxl_$c"),
        sum(length(col(c)).cast("long")).as(s"__sml_$c"))
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val perCol = one.select(explode(array(cols.map(c => struct(
        lit(c).as("column"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__cnt_$c")).as("n_nulls"),
        (if (exact) lit(0L) else col(s"__dst_$c")).as("n_distinct"),
        coalesce(col(s"__emp_$c"), lit(0L)).as("n_empty"),
        col(s"__mnl_$c").as("min_len"),
        col(s"__mxl_$c").as("max_len"),
        coalesce(col(s"__sml_$c"), lit(0L)).as("sum_len"))): _*))
        .as("__p"))
      .select(col("__p.*"))
    val out = if (!exact) perCol else {
      val names = array(cols.map(lit): _*)
      val dst = df
        .select(posexplode(array(cols.map(col): _*)).as(Seq("__i", "__v")))
        .filter(col("__v").isNotNull)
        .select("__i", "__v").distinct()
        .groupBy("__i").agg(count(lit(1)).as("__nd"))
        .select(element_at(names, col("__i") + 1).as("column"),
          col("__nd"))
      perCol.drop("n_distinct")
        .join(broadcast(dst), Seq("column"), "left")
        .select(col("column"), col("n_rows"), col("n_nulls"),
          coalesce(col("__nd"), lit(0L)).as("n_distinct"),
          col("n_empty"), col("min_len"), col("max_len"), col("sum_len"))
    }
    out.orderBy(col("column"))
  }

  /** Key-skew profile for a prospective join / groupBy key — the
    * diagnostic that decides between a plain shuffle join, a broadcast,
    * or [[graft.ops.ScaleOps.saltedJoin]]/[[graft.ops.ScaleOps.saltedAggregate]]
    * BEFORE the
    * expensive stage runs at scale. One row per top-N heaviest key
    * (rank 1..topN by count desc, then key asc — deterministic), each
    * carrying the global stats:
    *
    *  - `n`: rows for this key; `share` = n / n_rows;
    *    `skew` = n / mean group size (a key at skew 50 needs ~50 salts
    *    to level its partitions)
    *  - `n_rows`, `n_keys`, `max_n`: totals; mean group size is
    *    n_rows / n_keys
    *  - `hot_keys`, `hot_share`: how many keys exceed `hotFactor` × the
    *    mean group size, and the fraction of ALL rows they hold — the
    *    "is the skew a few heads or a fat tail" signal
    *
    * Scale shape: ONE shuffle (the groupBy count, map-side partial);
    * the global stats are an order-free aggregation over the per-key
    * counts, the top-N is a TakeOrderedAndProject (per-task heap, no
    * global sort), and the ≤ topN result joins the one-row stats frame
    * by broadcast. Nothing key-table-sized is ever sorted or collected.
    * Null keys count as a group, matching groupBy semantics downstream.
    */
  def keySkew(df: DataFrame, keyCols: Seq[String], topN: Int = 20,
      hotFactor: Double = 10.0): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    require(topN > 0, s"topN must be positive, got $topN")
    require(hotFactor > 0, s"hotFactor must be positive, got $hotFactor")
    keyCols.foreach { c =>
      require(df.schema.exists(_.name == c), s"no such column: $c")
    }
    val sizes = df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__kn"))
    val meanN = col("__rows").cast("double") / col("__keys").cast("double")
    // the sizes exchange feeds three consumers (global agg, hot agg,
    // top-N heap) — identical subplans, so the shuffle is planned once
    // and reused
    val base = sizes.agg(
      count(lit(1)).as("__keys"),
      sum(col("__kn")).as("__rows"),
      max(col("__kn")).as("__max"))
    val hot = sizes.crossJoin(broadcast(base))
      .filter(col("__kn").cast("double") > lit(hotFactor) * meanN)
      .agg(count(lit(1)).as("hot_keys"),
        coalesce(sum(col("__kn")), lit(0L)).as("__hotrows"))
    val stats = broadcast(base.crossJoin(broadcast(hot)))
    sizes
      .orderBy(col("__kn").desc +: keyCols.map(col(_).asc): _*)
      .limit(topN)
      .crossJoin(stats)
      .select(keyCols.map(col) ++ Seq(
        col("__kn").as("n"),
        (col("__kn").cast("double") / col("__rows").cast("double"))
          .as("share"),
        (col("__kn").cast("double") / meanN).as("skew"),
        col("__rows").as("n_rows"), col("__keys").as("n_keys"),
        col("__max").as("max_n"), col("hot_keys"),
        (col("__hotrows").cast("double") / col("__rows").cast("double"))
          .as("hot_share")): _*)
      .orderBy(col("n").desc +: keyCols.map(col(_).asc): _*)
  }

  /** Equi-width histogram of a numeric column: nBins buckets over
    * [min, max] (derived in a first pass when `bounds` is None), the top
    * edge closed (x == max lands in the last bin). Returns (bin,
    * bin_lo, bin_hi, n) for OCCUPIED bins, ordered by bin — integer
    * counts, order-free, exact on any partitioning. Null AND NaN values
    * are excluded (a NaN would otherwise poison the derived max — Spark
    * orders NaN greatest — and collapse every row into the last bin).
    * Degenerate ranges (min == max, or an all-null column) collapse to
    * a single bin 0 row carrying the whole count (or an empty frame
    * when there are no non-null rows).
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
    val xs = df.select(col(c).cast("double").as("__x"))
      .filter(col("__x").isNotNull && !isnan(col("__x")))
    val withB = bounds match {
      case Some((lo, hi)) =>
        xs.withColumn("__mn", lit(lo)).withColumn("__mx", lit(hi))
          .filter(col("__x") >= col("__mn") && col("__x") <= col("__mx"))
      case None =>
        val mm = broadcast(xs.agg(
          min(col("__x")).as("__mn"), max(col("__x")).as("__mx")))
        xs.crossJoin(mm)
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

  /** REFERENTIAL-INTEGRITY audit of one foreign-key edge — the
    * cross-table QC check the per-column profiles above can't express:
    * one row `(relation, n_child, n_null_key, n_orphan, orphan_frac)`
    * where an ORPHAN is a child row whose non-null key has no match in
    * the parent (the state a bad partition delete, a short load, or an
    * out-of-order ingest leaves behind). `n_null_key` is reported
    * separately — a null FK is absent-by-design, not broken.
    *
    * Shape: the totals are one partial-aggregable scan of the child;
    * orphan counting is a LEFT ANTI equi-join against the parent's key
    * projection (broadcast when the parent is a dimension, shuffle
    * otherwise — AQE decides) feeding another count. Two one-row
    * frames cross via broadcast. Exact integer counts; the fraction is
    * one int/int division — deterministic cross-engine.
    */
  def riAudit(child: DataFrame, childKey: String, parent: DataFrame,
      parentKey: String, relation: String): DataFrame = {
    val totals = child.agg(
      count(lit(1)).as("n_child"),
      (count(lit(1)) - count(col(childKey))).as("n_null_key"))
    val orphans = child
      .filter(col(childKey).isNotNull)
      .select(col(childKey).as("__k"))
      .join(parent.filter(col(parentKey).isNotNull)
        .select(col(parentKey).as("__k")), Seq("__k"), "left_anti")
      .agg(count(lit(1)).as("n_orphan"))
    totals.crossJoin(broadcast(orphans))
      .select(lit(relation).as("relation"),
        col("n_child").cast("long").as("n_child"),
        col("n_null_key").cast("long").as("n_null_key"),
        col("n_orphan").cast("long").as("n_orphan"),
        when(col("n_child") - col("n_null_key") > 0,
          col("n_orphan").cast("double") /
            (col("n_child") - col("n_null_key")).cast("double"))
          .otherwise(lit(0.0)).as("orphan_frac"))
  }
}
