package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** KMV / theta sketch for distinct counting with SET OPERATIONS
  * (Bar-Yossef et al. 2002; the theta-sketch framework of the Apache
  * DataSketches literature): keep the k smallest distinct hash values
  * of a column; the k-th smallest, read as a fraction of the hash
  * space, estimates the distinct count as (k−1)·2⁶⁴/θ — and because
  * two sketches over the SAME hash function sample the SAME region of
  * hash space, intersections and unions estimate directly (count the
  * matching retained hashes below the common θ), which HLL cannot do
  * without inclusion-exclusion error stacking.
  *
  * Everything is deterministic and cross-engine exact:
  *  - hash = Spark `xxhash64` (seed 42) of the LongType value — the
  *    same function the dedup/split tier pins, replayed in pure SQL by
  *    the generated oracle (scripts/xxh64_sql.py);
  *  - sketches are SORTED arrays of FLIPPED hashes (h ^ Long.MinValue),
  *    so ascending signed order is ascending UNSIGNED hash order;
  *  - the aggregation is the bounded [[graft.functions.SmallestKLongsAgg]]
  *    (map-side combinable, ≤ k longs of state per partial — the same
  *    100 TB-safe shape as the LSH bucket caps);
  *  - estimates divide exactly-representable doubles: θ converts to
  *    DOUBLE through DECIMAL(38,0) (one correctly-rounded conversion,
  *    matching DuckDB's HUGEINT→DOUBLE) and (k−1)·2⁶⁴ is a power-of-two
  *    scaling of a small int — both engines produce the same bits.
  */
object Kmv {

  /** 2⁶³ as the exact decimal literal used to un-flip into unsigned. */
  private val Half = new java.math.BigDecimal("9223372036854775808")

  /** 2⁶⁴ as an (exactly representable) double. */
  val TwoPow64: Double = 1.8446744073709552e19

  private def validate(k: Int): Unit =
    require(k >= 16 && k <= 65536, s"k must be in [16, 65536], got $k")

  /** Flipped hash: ascending signed order == ascending unsigned
    * xxhash64 order.
    *
    * PRECONDITION: `value` must be non-null (enforced by the estimate
    * entry points below). Spark's `xxhash64` SKIPS null children and
    * returns the bare seed (42) — a near-minimal unsigned hash that
    * would always be retained and silently skew θ low / every estimate
    * high.
    */
  def flippedHash(value: Column): Column =
    xxhash64(value.cast("long")).bitwiseXOR(lit(Long.MinValue))

  /** Every estimate entry point validates its value column is INTEGRAL
    * (the pinned hash domain is xxhash64 over LongType): a silent
    * cast("long") of a string/double column would null out (and
    * previously seed-hash) non-parsing values instead of failing
    * loudly.
    */
  private def requireIntegral(df: DataFrame, value: Column): Unit = {
    import org.apache.spark.sql.types._
    val dt = df.select(value).schema.head.dataType
    dt match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case other => throw new IllegalArgumentException(
        s"KMV value column must be integral (byte/short/int/long); " +
          s"got $other — hash the natural key to a long upstream " +
          s"(e.g. xxhash64) instead of relying on a silent cast")
    }
  }

  /** KMV sketch aggregate column: sorted array of the k smallest
    * distinct flipped hashes. PRECONDITION: `value` must be non-null —
    * filter `value.isNotNull` upstream (the estimate entry points and
    * the streaming twin all do); see [[flippedHash]] for why a null
    * reaching the hash would skew every estimate.
    */
  def sketchAgg(value: Column, k: Int): Column = {
    validate(k)
    val agg = udaf(new graft.functions.SmallestKLongsAgg(k))
    agg(flippedHash(value))
  }

  /** Exact unsigned θ as DOUBLE: one DECIMAL(38,0) un-flip then one
    * correctly-rounded cast — bit-equal to DuckDB's HUGEINT→DOUBLE.
    * Shared with the hash-uniform consumers (Sampling.prioritySample).
    */
  private[graft] def unsignedDouble(flipped: Column): Column =
    (flipped.cast("decimal(38,0)") + lit(Half)).cast("double")

  /** Distinct-count estimate from a sketch array: exact size when the
    * sketch is not full (fewer than k distinct values exist), else
    * (k−1)·2⁶⁴/θ with θ = the k-th smallest unsigned hash.
    */
  def estimateCol(sketch: Column, k: Int): Column = {
    validate(k)
    when(size(sketch) < k, size(sketch).cast("double"))
      .otherwise(lit((k - 1).toDouble) * lit(TwoPow64) /
        unsignedDouble(element_at(sketch, k)))
  }

  /** Merge two sketch arrays (same k): k smallest distinct of the
    * union — flipped-signed sort IS unsigned hash order.
    */
  def mergeCol(a: Column, b: Column, k: Int): Column = {
    validate(k)
    slice(array_sort(array_distinct(concat(a, b))), 1, k)
  }

  /** Global distinct estimate: one row (k, n_retained, est_kmv[,
    * exact_distinct]). Null values are skipped (never hashed —
    * matching `countDistinct` and the streaming twin). The default is
    * SKETCH-ONLY — bounded ≤ k-longs state end to end, the 100 TB
    * path; `audit = true` rides an exact `countDistinct` along the
    * same pass (a full distinct aggregation — gate/QC runs only, it
    * dwarfs the sketch it audits at scale).
    */
  def distinctEstimate(df: DataFrame, value: Column, k: Int,
      audit: Boolean = false): DataFrame = {
    validate(k)
    requireIntegral(df, value)
    // project to the single value column and spread it to the
    // size-adaptive parallelism BEFORE the aggregation: the driver
    // testdata ships one parquet row group per table, so the un-widened
    // partial aggregate ran on ONE core; the exchange ships 8 B/row and
    // no-ops at 100 TB where the scan is already wide. The aggregation
    // itself is order-free, so the result is unchanged on any
    // partitioning.
    val in = graft.ops.ScaleOps.widen(
      df.filter(value.isNotNull).select(value.as("__v")))
    val v = col("__v")
    // audit branch (r16 verdict #6): dedup FIRST with a plain grouped
    // aggregate — partial (map-side) dedup per task, one exchange of
    // the surviving distinct values — then compute sketch AND exact
    // count over the distinct stream. Equivalent by construction: the
    // KMV aggregate retains the k smallest DISTINCT hashes (duplicate
    // values hash identically and collapse either way), and
    // countDistinct(v) == count over the deduped stream. The previous
    // single-pass mixed aggregate planned countDistinct via Expand —
    // every row duplicated per aggregate group, no map-side combine on
    // the distinct leg, and one straggler reducer holding all values.
    val agged = if (audit) {
      val dv = in.distinct()
      dv.agg(sketchAgg(v, k).as("__sk"),
        count(v).cast("long").as("exact_distinct"))
    } else in.agg(sketchAgg(v, k).as("__sk"))
    agged.select(Seq(lit(k.toLong).as("k"),
      size(col("__sk")).cast("long").as("n_retained"),
      estimateCol(col("__sk"), k).as("est_kmv")) ++
      (if (audit) Seq(col("exact_distinct")) else Nil): _*)
  }

  /** Per-group distinct estimates — same row shape plus the group key,
    * one bounded sketch per group. Null values are skipped; a group
    * whose values are ALL null is absent (it has no non-null distinct
    * values to estimate). Same `audit` contract as
    * [[distinctEstimate]]: default is sketch-only.
    */
  def groupedEstimate(df: DataFrame, grp: Column, value: Column,
      k: Int, audit: Boolean = false): DataFrame = {
    validate(k)
    requireIntegral(df, value)
    val in = df.filter(value.isNotNull)
    val agged = if (audit)
      in.groupBy(grp.as("grp"))
        .agg(sketchAgg(value, k).as("__sk"),
          countDistinct(value).cast("long").as("exact_distinct"))
    else in.groupBy(grp.as("grp")).agg(sketchAgg(value, k).as("__sk"))
    agged.select(Seq(col("grp"), lit(k.toLong).as("k"),
      size(col("__sk")).cast("long").as("n_retained"),
      estimateCol(col("__sk"), k).as("est_kmv")) ++
      (if (audit) Seq(col("exact_distinct")) else Nil): _*)
  }

  /** Theta-sketch set operations over two keyed value sets sketched
    * with the SAME k. Semantics (pinned identically in the SQL twin):
    *
    *   θ_X   = k-th smallest unsigned hash when X's sketch is full,
    *           else "no cut" (the whole set was retained);
    *   θ     = the smaller defined θ (none ⇒ both sets exact);
    *   A', B' = retained hashes strictly below θ (no cut ⇒ all);
    *   est_inter = |A'∩B'|·2⁶⁴/θ,  est_union = |A'∪B'|·2⁶⁴/θ
    *               (ratio 1 when no cut — the exact regime);
    *   jaccard   = |A'∩B'|/|A'∪B'|  (0 when the union is empty).
    *
    * Input frames carry one value column each; output is one row of
    * estimates plus per-set KMV estimates.
    */
  def setEstimates(a: DataFrame, b: DataFrame, valueCol: String,
      k: Int): DataFrame = {
    validate(k)
    requireIntegral(a, col(valueCol))
    requireIntegral(b, col(valueCol))
    // nulls are skipped (never hashed) — see flippedHash
    val sa = a.filter(col(valueCol).isNotNull)
      .agg(sketchAgg(col(valueCol), k).as("ska"))
    val sb = b.filter(col(valueCol).isNotNull)
      .agg(sketchAgg(col(valueCol), k).as("skb"))
    // two one-row frames: a broadcast cross of scalars, not a join
    val both = sa.crossJoin(broadcast(sb))
    val fullA = size(col("ska")) >= k
    val fullB = size(col("skb")) >= k
    val thetaA = when(fullA, element_at(col("ska"), k))
    val thetaB = when(fullB, element_at(col("skb"), k))
    val theta = when(fullA && fullB, least(thetaA, thetaB))
      .otherwise(coalesce(thetaA, thetaB)) // null when neither is full
    val cut = (arr: Column) => when(theta.isNull, arr)
      .otherwise(filter(arr, x => x < theta))
    val interN = size(array_intersect(cut(col("ska")), cut(col("skb"))))
    val unionN = size(array_union(cut(col("ska")), cut(col("skb"))))
    val ratio = when(theta.isNull, lit(1.0))
      .otherwise(lit(TwoPow64) / unsignedDouble(theta))
    both.select(
      size(col("ska")).cast("long").as("n_a"),
      size(col("skb")).cast("long").as("n_b"),
      estimateCol(col("ska"), k).as("est_a"),
      estimateCol(col("skb"), k).as("est_b"),
      (unionN.cast("double") * ratio).as("est_union"),
      (interN.cast("double") * ratio).as("est_inter"),
      when(unionN === 0, lit(0.0))
        .otherwise(interN.cast("double") / unionN.cast("double"))
        .as("jaccard_kmv"))
  }
}
