package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Quantile estimation from a BOTTOM-K-BY-HASH sample (the bottom-k
  * sketch family of Cohen–Kaplan 2007, specialized to uniform weights):
  * retain the k lexicographically smallest distinct
  * `(xxhash64(key), value)` pairs — a fixed-size uniform
  * without-replacement sample of the keyed population — and read any
  * quantile off the sorted sampled values with the pinned
  * nearest-rank-floor rule `v[⌊q·(n−1)⌋]`.
  *
  * Why this shape instead of a KLL/GK sketch at 100 TB:
  *  - the aggregation state is BOUNDED (≤ k pairs per partial buffer,
  *    map-side combinable) and MERGEABLE with merge ≡ one-shot — the
  *    same [[graft.functions.SmallestKLongsAgg]] discipline the KMV
  *    sketch pins, so per-day sketches roll up to per-month exactly;
  *  - it is DETERMINISTIC on any partitioning AND cross-engine exact —
  *    the sample membership is a pure function of the pinned hash, so
  *    the DuckDB oracle replays it bit-for-bit, which no
  *    rank-error-bound sketch (whose state depends on arrival order)
  *    can offer;
  *  - the same retained sample answers EVERY quantile (and any other
  *    statistic) after the fact — one pass, reusable artifact.
  * Error is the classic sampling bound (rank error O(1/√k)), vs KLL's
  * O(1/k) for the same state — the price of determinism + set-op
  * composability; size k accordingly.
  *
  * Hash domain and null discipline follow [[Kmv]]: the key column must
  * be INTEGRAL (pinned xxhash64-of-long, seed 42), null keys/values are
  * skipped, and NaN values are REJECTED by filter (their sort order is
  * engine-specific).
  */
object SampleQuantiles {

  private def validate(k: Int): Unit =
    require(k >= 16 && k <= 65536, s"k must be in [16, 65536], got $k")

  /** Bottom-k sample aggregate column: sorted array of the k smallest
    * distinct (flipped hash, value) structs. PRECONDITION: key and
    * value non-null, value non-NaN (the entry point below filters).
    */
  def sampleAgg(key: Column, value: Column, k: Int): Column = {
    validate(k)
    val agg = udaf(new graft.functions.SmallestKHashValsAgg(k))
    agg(Kmv.flippedHash(key), value)
  }

  /** Quantile estimates at `probs` from one bottom-k sample of
    * (`key`, `value`): output one row per prob —
    * `(q, n_sample, est)` with `est = v[⌊q·(n−1)⌋]` over the ASCENDING
    * sorted sampled values (null when the population is empty). The
    * whole plan is one bounded aggregation + a literal-sized explode.
    */
  def quantiles(df: DataFrame, key: Column, value: Column, k: Int,
      probs: Seq[Double]): DataFrame = {
    validate(k)
    require(probs.nonEmpty && probs.forall(q => q >= 0.0 && q <= 1.0),
      s"probs must be in [0, 1], got $probs")
    val in = df.filter(key.isNotNull && value.isNotNull && !isnan(value))
    val sampled = in.agg(sampleAgg(key, value, k).as("__sample"))
      .select(array_sort(transform(col("__sample"), p => p("v")))
        .as("__vals"))
    sampled
      .select(explode(array(probs.map(lit): _*)).as("q"), col("__vals"))
      .select(col("q"),
        size(col("__vals")).cast("long").as("n_sample"),
        when(size(col("__vals")) > 0,
          element_at(col("__vals"),
            floor(col("q") * (size(col("__vals")) - 1).cast("double"))
              .cast("int") + 1)).as("est"))
  }

  /** Per-group quantile estimates — one bounded bottom-k sample PER
    * GROUP (the grouped twin of [[quantiles]]; same row shape plus the
    * group key). Null group keys are excluded; a group whose values
    * are all null/NaN is absent (no sample exists to read). State per
    * group is ≤ k pairs — a million-group corpus costs k·|groups|
    * bounded buffers, never a per-group value sort.
    */
  def groupedQuantiles(df: DataFrame, grp: Column, key: Column,
      value: Column, k: Int, probs: Seq[Double]): DataFrame = {
    validate(k)
    require(probs.nonEmpty && probs.forall(q => q >= 0.0 && q <= 1.0),
      s"probs must be in [0, 1], got $probs")
    val in = df.filter(grp.isNotNull && key.isNotNull &&
      value.isNotNull && !isnan(value))
    in.groupBy(grp.as("grp"))
      .agg(sampleAgg(key, value, k).as("__sample"))
      .select(col("grp"),
        array_sort(transform(col("__sample"), p => p("v")))
          .as("__vals"))
      .select(col("grp"),
        explode(array(probs.map(lit): _*)).as("q"), col("__vals"))
      .select(col("grp"), col("q"),
        size(col("__vals")).cast("long").as("n_sample"),
        when(size(col("__vals")) > 0,
          element_at(col("__vals"),
            floor(col("q") * (size(col("__vals")) - 1).cast("double"))
              .cast("int") + 1)).as("est"))
  }
}
