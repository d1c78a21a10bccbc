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
    */
  def flippedHash(value: Column): Column =
    xxhash64(value.cast("long")).bitwiseXOR(lit(Long.MinValue))

  /** KMV sketch aggregate column: sorted array of the k smallest
    * distinct flipped hashes. Null values are skipped (never hashed).
    */
  def sketchAgg(value: Column, k: Int): Column = {
    validate(k)
    val agg = udaf(new graft.functions.SmallestKLongsAgg(k))
    agg(flippedHash(value))
  }

  /** Exact unsigned θ as DOUBLE: one DECIMAL(38,0) un-flip then one
    * correctly-rounded cast — bit-equal to DuckDB's HUGEINT→DOUBLE.
    */
  private def unsignedDouble(flipped: Column): Column =
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

  /** Global distinct estimate: one row (k, n_retained, est_kmv,
    * exact_distinct) — the exact count rides the same pass for audit.
    */
  def distinctEstimate(df: DataFrame, value: Column, k: Int): DataFrame = {
    validate(k)
    df.agg(sketchAgg(value, k).as("__sk"),
        countDistinct(value).cast("long").as("exact_distinct"))
      .select(lit(k.toLong).as("k"),
        size(col("__sk")).cast("long").as("n_retained"),
        estimateCol(col("__sk"), k).as("est_kmv"),
        col("exact_distinct"))
  }

  /** Per-group distinct estimates — same row shape plus the group key,
    * one bounded sketch per group.
    */
  def groupedEstimate(df: DataFrame, grp: Column, value: Column,
      k: Int): DataFrame = {
    validate(k)
    df.groupBy(grp.as("grp"))
      .agg(sketchAgg(value, k).as("__sk"),
        countDistinct(value).cast("long").as("exact_distinct"))
      .select(col("grp"), lit(k.toLong).as("k"),
        size(col("__sk")).cast("long").as("n_retained"),
        estimateCol(col("__sk"), k).as("est_kmv"),
        col("exact_distinct"))
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
    val sa = a.agg(sketchAgg(col(valueCol), k).as("ska"))
    val sb = b.agg(sketchAgg(col(valueCol), k).as("skb"))
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
