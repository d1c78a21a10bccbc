package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic distributed vector reductions — the linear-algebra
  * tier an embedding pipeline needs beyond per-row kernels: per-label
  * centroids (cluster/domain prototypes) and the corpus' top principal
  * component via power iteration (the PCA direction SemDeDup-style
  * pipelines whiten against, and the cheap "is there one dominant
  * axis" diagnostic for a batch of embeddings).
  *
  * The core problem at scale is that a double sum over corpus rows is
  * SHUFFLE-ORDER-DEPENDENT — the one thing this engine never ships.
  * Both operators therefore accumulate in FIXED POINT: each per-row
  * contribution is quantized once (`round(x·scale)` as a 64-bit
  * integer — a deterministic function of the row alone), summed as
  * integers (exact, associative, order-free), and de-scaled at the
  * end. Quantization costs ~1/scale absolute precision per row — far
  * below the statistical noise of a centroid or an iterative
  * eigenvector — and buys bit-stable results on ANY partitioning, and
  * cross-engine reproducibility (the DuckDB twins run the identical
  * integer arithmetic).
  *
  * Scale design: one map-side-combined hash aggregation per pass with
  * constant per-group state (`dim` longs); the power iteration's
  * driver state is one `dim`-length double vector per round (the
  * bounded-driver-model discipline of the IVF quantizer / NB model /
  * DSIR table). Overflow headroom: |Σ round(c·scale)| must stay below
  * 2^63 — for unit-scale embeddings the default 1e10 leaves room for
  * ~10^8 rows per label; lower `scale` for bigger corpora (the
  * trade-off knob is documented, not silent).
  */
object Spectral {

  /** Quantized fixed-point value: round(x · scale) as a long. */
  private def quant(x: Column, scale: Double): Column =
    round(x * scale).cast("long")

  /** Shared null/length-checked double-cast vector column — one
    * definition for every fixed-point vector operator ([[Spectral]],
    * [[KMeans]]); a silently-skipped or short row would bias every
    * reduction, so malformed vectors fail loudly with the operator
    * name. NULL ELEMENTS are rejected too (checked after the double
    * cast, so a non-numeric element whose cast nulls out also fails):
    * sum() would silently skip them while count() still counts the
    * row — exactly the biased-centroid hazard the guard exists for.
    * NaN elements are rejected for the same reason: the fixed-point
    * long cast maps NaN to 0 (non-ANSI Spark), silently zeroing that
    * contribution while the row still counts.
    */
  private[sim] def checkedVec(vecCol: String, dim: Int,
      op: String): Column = {
    val casted = col(vecCol).cast("array<double>")
    when(col(vecCol).isNotNull && size(col(vecCol)) === dim &&
        !exists(casted, e => e.isNull || isnan(e)),
      casted)
      .otherwise(raise_error(lit(s"$op: vector must be non-null " +
        s"with exactly $dim non-null, non-NaN numeric elements")))
  }

  /** Per-label mean vector. Output: (labelCol, dim_idx, coord, n) —
    * `coord` the fixed-point-exact mean component, `n` the label's row
    * count. Rows whose vector is null or not `dim`-long are rejected
    * loudly (a silently-skipped row would bias every centroid).
    */
  def labelCentroids(df: DataFrame, labelCol: String, vecCol: String,
      dim: Int, scale: Double = 1e10): DataFrame = {
    require(dim >= 1, s"dim must be >= 1, got $dim")
    require(scale > 0.0, s"scale must be positive, got $scale")
    val checked = df.select(col(labelCol).as("__lb"),
      checkedVec(vecCol, dim, "labelCentroids").as("__v"))
    checked
      .select(col("__lb"), posexplode(col("__v")).as(Seq("__j", "__x")))
      .groupBy(col("__lb"), col("__j"))
      .agg(sum(quant(col("__x"), scale)).as("__q"),
        count(lit(1)).as("__n"))
      .select(col("__lb").as(labelCol),
        col("__j").cast("long").as("dim_idx"),
        (col("__q").cast("double") / scale / col("__n").cast("double"))
          .as("coord"),
        col("__n").as("n"))
  }

  /** Top principal component of the (uncentered) second-moment matrix
    * by `iterations` rounds of power iteration. Each round is one
    * distributed pass: s = x·v per row (element-ordered codegen'd
    * fold), per-dimension contributions s·x_j quantized and
    * integer-summed, then the driver (holding only `dim` doubles)
    * de-scales and max-normalizes. Start vector: uniform 1/√dim.
    *
    * Returns (dim_idx, coord) of the final max-normalized direction —
    * deterministic on any partitioning; to get the centered PCA
    * direction, subtract the [[labelCentroids]] global mean first.
    */
  def powerIterTopComponent(df: DataFrame, vecCol: String, dim: Int,
      iterations: Int, scale: Double = 1e10): DataFrame = {
    require(dim >= 1, s"dim must be >= 1, got $dim")
    require(iterations >= 1 && iterations <= 50,
      s"iterations must be in [1, 50], got $iterations")
    require(scale > 0.0, s"scale must be positive, got $scale")
    val spark = df.sparkSession
    val vecs = df.select(
      checkedVec(vecCol, dim, "powerIterTopComponent").as("__v"))
    var v = Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
    var i = 0
    while (i < iterations) {
      val vLit = array(v.toSeq.map(lit): _*)
      val rows = vecs
        .select(graft.functions.VectorFunctions.dot(col("__v"), vLit)
          .as("__s"), col("__v"))
        .select(posexplode(col("__v")).as(Seq("__j", "__x")),
          col("__s"))
        .groupBy(col("__j"))
        .agg(sum(quant(col("__s") * col("__x"), scale)).as("__q"))
        .collect()
      require(rows.nonEmpty,
        "powerIterTopComponent: empty input — nothing to iterate")
      val w = Array.fill(dim)(0.0)
      rows.foreach(r => w(r.getInt(0)) = r.getLong(1).toDouble / scale)
      val m = w.map(math.abs).max
      require(m > 0.0, "powerIterTopComponent: the iterate collapsed " +
        "to zero (all-zero vectors, or scale too small)")
      v = w.map(_ / m)
      i += 1
    }
    import spark.implicits._
    v.toSeq.zipWithIndex.map { case (c, j) => (j.toLong, c) }
      .toDF("dim_idx", "coord")
  }
}
