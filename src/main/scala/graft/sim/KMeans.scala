package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fully-distributed Lloyd k-means over an embedding column — the
  * clustering pass SemDeDup-style curation pipelines and IVF indexes
  * are built on. The existing quantizer ([[Similarity]]) refines
  * centroids over a BOUNDED DRIVER SAMPLE (256 rows) — the right call
  * for seeding, but the sample's view of cluster mass is only as good
  * as 256 rows. This operator is the full-corpus refinement: every
  * Lloyd round is ONE distributed map-side-combined aggregation over
  * all rows, and the driver holds exactly k·dim doubles of model state
  * (the bounded-model discipline of the IVF/NB/DSIR tiers).
  *
  * Determinism, the non-negotiable:
  *  - Seeding is hash-ranked, not sampled: the k rows with the
  *    smallest (xxhash64(id), id) — a pure function of the data, the
  *    same on any cluster, and append-stable in the
  *    [[graft.ops.Sampling]] sense (new rows only displace seeds if
  *    they hash lower).
  *  - Assignment is row-local exact double arithmetic: squared L2 via
  *    an ELEMENT-ORDERED fold of (x_j − c_j)², argmin with
  *    first-of-min (= lowest cluster id) tie-break — reproducible
  *    cross-engine because the fold order is pinned.
  *  - Centroid updates accumulate in FIXED POINT ([[Spectral]]):
  *    per-row contributions quantized once (round(x·scale) as long),
  *    integer-summed (exact, order-free), de-scaled on the driver —
  *    bit-stable on ANY partitioning. Empty clusters keep their
  *    previous centroid (deterministic, no resampling).
  *
  * The DuckDB oracle twins unroll the identical rounds (same seeding
  * hash via the pure-SQL XXH64, same fold order, same quantization),
  * so results are bit-exact cross-engine.
  *
  * Scale: per round, the corpus is scanned once; the shuffle carries
  * only k·dim (cluster, dim) groups of partial integer sums. Overflow
  * headroom as in [[Spectral]]: ~10^8 rows per cluster at the default
  * scale 1e10 for unit-scale embeddings; `scale` is the documented
  * knob for bigger corpora.
  */
object KMeans {

  /** Element-ordered squared-L2 fold between a vector column and a
    * centroid literal — the pinned arithmetic both engines run.
    */
  private def sqDist(v: Column, centroid: Array[Double]): Column =
    aggregate(
      zip_with(v, array(centroid.toSeq.map(lit): _*),
        (a, b) => (a - b) * (a - b)),
      lit(0.0), (acc, x) => acc + x)

  /** 0-based argmin cluster under `centroids`, first-of-min tie-break.
    */
  private def assignExpr(v: Column,
      centroids: Array[Array[Double]]): Column = {
    val dists = array(centroids.toSeq.map(c => sqDist(v, c)): _*)
    (array_position(dists, array_min(dists)) - 1L).cast("int")
  }

  /** Shared null/length-checked double-cast vector column. */
  private def checkedVec(vecCol: String, dim: Int): Column =
    Spectral.checkedVec(vecCol, dim, "kmeans")

  /** The k hash-ranked seed vectors (k rows to the driver — bounded by
    * construction; TakeOrderedAndProject, never a sort of the corpus).
    * The id column must be integral: a silent cast of a non-numeric id
    * to a NULL long would hash every row identically and degrade the
    * deterministic seeding to a partition-order pick.
    */
  private def seedCentroids(df: DataFrame, idCol: String,
      vecCol: String, dim: Int, k: Int): Array[Array[Double]] = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val idType = df.schema(idCol).dataType
    require(Seq(LongType, IntegerType, ShortType, ByteType)
      .contains(idType),
      s"kmeans: idCol '$idCol' must be an integral type for " +
        s"deterministic hash-ranked seeding, got ${idType.catalogString}")
    val rows = df
      .select(col(idCol).cast("long").as("__id"),
        checkedVec(vecCol, dim).as("__v"))
      .orderBy(xxhash64(col("__id")), col("__id"))
      .limit(k)
      .collect()
    require(rows.length == k,
      s"kmeans: need at least k=$k rows, got ${rows.length}")
    rows.map(_.getSeq[Double](1).toArray)
  }

  /** Runs `iterations` Lloyd rounds; returns (centroids, counts) where
    * counts are the LAST round's cluster sizes (0 for a cluster that
    * went empty and kept its previous centroid).
    */
  private def lloyd(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, k: Int, iterations: Int, scale: Double,
      smallCorpusCells: Long = SmallCorpusCells):
      (Array[Array[Double]], Array[Long]) =
    lloydFrom(df, vecCol, dim,
      seedCentroids(df, idCol, vecCol, dim, k), iterations, scale,
      smallCorpusCells)

  /** Below this many vector CELLS (rows × dim ≈ 64 MB of doubles at
    * the bound), the whole Lloyd iteration replays as ONE task
    * ([[lloydLocal]]) — the GraphOps smallGraphEdges / LogReg
    * SmallCorpusDocs discipline: T rounds of
    * assign→posexplode→aggregate job scheduling collapse to one job,
    * bit-identically (the fixed-point sums are order-free, and the
    * local quantization replays Spark's HALF_UP BigDecimal round +
    * truncating long cast op-for-op). Above the bound the distributed
    * rounds run unchanged.
    */
  val SmallCorpusCells: Long = 1L << 23

  /** Exact allocation-free replay of Spark's `round(double)` → long
    * cast (BigDecimal.valueOf + HALF_UP + truncating cast): for
    * |y| < 2^52, floor(y) and frac = y − floor(y) are EXACT doubles,
    * and the decimal-string boundary comparison BigDecimal performs
    * agrees with the exact binary comparison of frac against 0.5 (a
    * double strictly below/above a representable decimal boundary has
    * its shortest round-trip string strictly below/above it too), so
    *   y ≥ 0: frac ≥ 0.5 → floor + 1;  y < 0: frac > 0.5 → floor + 1
    * is bit-for-bit HALF_UP (away-from-zero on the .5 tie). Larger
    * magnitudes (already integral at that scale, but kept exact) take
    * the BigDecimal path.
    */
  private def roundHalfUpLong(y: Double): Long =
    if (math.abs(y) < 4.503599627370496e15) {
      val f = math.floor(y)
      val frac = y - f
      val up = if (y >= 0.0) frac >= 0.5 else frac > 0.5
      (if (up) f + 1.0 else f).toLong
    } else
      java.math.BigDecimal.valueOf(y)
        .setScale(0, java.math.RoundingMode.HALF_UP)
        .doubleValue().toLong

  /** One-task Lloyd replay: same element-ordered squared-L2 argmin
    * (strict < keeps the first minimum — `array_position(dists,
    * array_min(dists))`), same round(x·scale)→long quantization
    * ([[roundHalfUpLong]] — the Round codegen semantics), same
    * q/scale/n de-scale, empty clusters keep their previous centroid.
    * KMeansFastPathSpec pins fast ≡ iterative to the bit on the real
    * corpus.
    */
  private def lloydLocal(vecs: DataFrame, dim: Int,
      initial: Array[Array[Double]], iterations: Int,
      scale: Double): (Array[Array[Double]], Array[Long]) = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val k = initial.length
    val encOut = org.apache.spark.sql.Encoders.tuple(
      org.apache.spark.sql.Encoders.scalaInt,
      org.apache.spark.sql.Encoders.scalaInt,
      org.apache.spark.sql.Encoders.scalaDouble,
      org.apache.spark.sql.Encoders.scalaLong)
    val out = vecs.as[Seq[Double]]
      .groupByKey(_ => 0)(org.apache.spark.sql.Encoders.scalaInt)
      .flatMapGroups { (_, it) =>
        val xs = it.map(_.toArray).toArray
        var cents = initial
        val counts = new Array[Long](k)
        var r = 0
        while (r < iterations) {
          val q = Array.ofDim[Long](k, dim)
          java.util.Arrays.fill(counts, 0L)
          var i = 0
          while (i < xs.length) {
            val v = xs(i)
            var best = 0
            var bd = Double.PositiveInfinity
            var c = 0
            while (c < k) {
              var d = 0.0
              var j = 0
              while (j < dim) {
                val t = v(j) - cents(c)(j)
                d += t * t
                j += 1
              }
              if (d < bd) { bd = d; best = c }
              c += 1
            }
            counts(best) += 1
            val qc = q(best)
            var j = 0
            while (j < dim) {
              qc(j) = Math.addExact(qc(j), roundHalfUpLong(v(j) * scale))
              j += 1
            }
            i += 1
          }
          val next = cents.map(_.clone())
          var c = 0
          while (c < k) {
            if (counts(c) > 0L) {
              var j = 0
              while (j < dim) {
                next(c)(j) = q(c)(j).toDouble / scale /
                  counts(c).toDouble
                j += 1
              }
            }
            c += 1
          }
          cents = next
          r += 1
        }
        (0 until k).iterator.flatMap(c =>
          (0 until dim).iterator.map(j =>
            (c, j, cents(c)(j), counts(c))))
      }(encOut)
      .collect() // bounded: k·dim model rows
    val cs = initial.map(_.clone())
    val ns = Array.fill(k)(0L)
    out.foreach { case (c, j, x, n) => cs(c)(j) = x; ns(c) = n }
    (cs, ns)
  }

  private def lloydFrom(df: DataFrame, vecCol: String, dim: Int,
      initial: Array[Array[Double]], iterations: Int, scale: Double,
      smallCorpusCells: Long = SmallCorpusCells):
      (Array[Array[Double]], Array[Long]) = {
    val vecs = df.select(checkedVec(vecCol, dim).as("__v"))
    // the gate count is a metadata count for a parquet source — it
    // never evaluates the checked vector projection
    if (df.count() * dim.toLong <= smallCorpusCells)
      return lloydLocal(vecs, dim, initial, iterations, scale)
    var centroids = initial
    val k = initial.length
    val counts = Array.fill(k)(0L)
    var r = 0
    while (r < iterations) {
      val rows = vecs
        .select(assignExpr(col("__v"), centroids).as("__c"), col("__v"))
        .select(col("__c"), posexplode(col("__v")).as(Seq("__j", "__x")))
        .groupBy(col("__c"), col("__j"))
        .agg(sum(round(col("__x") * scale).cast("long")).as("__q"),
          count(lit(1)).as("__n"))
        .collect()
      java.util.Arrays.fill(counts, 0L)
      val next = centroids.map(_.clone())
      rows.foreach { row =>
        val c = row.getInt(0)
        next(c)(row.getInt(1)) =
          row.getLong(2).toDouble / scale / row.getLong(3).toDouble
        counts(c) = row.getLong(3)
      }
      centroids = next
      r += 1
    }
    (centroids, counts)
  }

  /** Final centroids as (cluster, dim_idx, coord, n) — `n` the last
    * round's cluster size. `iterations` Lloyd rounds from the
    * hash-ranked seeds.
    */
  def kmeansCentroids(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, k: Int, iterations: Int, scale: Double = 1e10,
      smallCorpusCells: Long = SmallCorpusCells): DataFrame = {
    validate(dim, k, iterations, scale)
    val spark = df.sparkSession
    val (cs, ns) = lloyd(df, idCol, vecCol, dim, k, iterations, scale,
      smallCorpusCells)
    import spark.implicits._
    (for { c <- 0 until k; j <- 0 until dim }
      yield (c.toLong, j.toLong, cs(c)(j), ns(c)))
      .toDF("cluster", "dim_idx", "coord", "n")
  }

  /** Full-corpus Lloyd refinement from CALLER-SUPPLIED starting
    * centroids — the quantizer-improvement seam: seed with the
    * spread (farthest-point + sample-Lloyd) [[Similarity.ivfCentroids]]
    * model, then let every corpus row vote on the refinement instead
    * of a 256-row sample. Same fixed-point determinism contract as
    * [[kmeansCentroids]]; empty clusters keep their previous centroid.
    * Output: (cluster, dim_idx, coord, n), clusters indexed by the
    * position in `initial`.
    */
  def kmeansRefine(df: DataFrame, vecCol: String, dim: Int,
      initial: Array[Array[Double]], iterations: Int,
      scale: Double = 1e10,
      smallCorpusCells: Long = SmallCorpusCells): DataFrame = {
    require(initial.nonEmpty && initial.length <= 4096,
      s"initial centroid count must be in [1, 4096], got " +
        s"${initial.length}")
    require(initial.forall(_.length == dim),
      s"every initial centroid must have exactly dim = $dim coords")
    validate(dim, initial.length, iterations, scale)
    val spark = df.sparkSession
    val (cs, ns) = lloydFrom(df, vecCol, dim, initial, iterations,
      scale, smallCorpusCells)
    import spark.implicits._
    (for { c <- cs.indices; j <- 0 until dim }
      yield (c.toLong, j.toLong, cs(c)(j), ns(c)))
      .toDF("cluster", "dim_idx", "coord", "n")
  }

  /** Per-row assignment (idCol, cluster) under the FINAL centroids —
    * one extra distributed argmin pass after the last update, so the
    * output is consistent with [[kmeansCentroids]]' model. Re-runs the
    * full Lloyd training; when the centroids are already computed (or
    * persisted), use the [[assignWithCentroids]] overload instead and
    * pay only the assignment pass.
    */
  def kmeansAssign(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, k: Int, iterations: Int, scale: Double = 1e10,
      smallCorpusCells: Long = SmallCorpusCells): DataFrame = {
    validate(dim, k, iterations, scale)
    val (cs, _) = lloyd(df, idCol, vecCol, dim, k, iterations, scale,
      smallCorpusCells)
    df.select(col(idCol),
      assignExpr(checkedVec(vecCol, dim), cs).cast("long").as("cluster"))
  }

  /** Per-row assignment under a PRECOMPUTED model — the reuse path
    * that makes the kmeansCentroids → assign pairing cost ONE training
    * run instead of two, and lets a persisted centroid table drive
    * assignment of new batches without retraining. `centroids` is the
    * (cluster, dim_idx, coord) shape [[kmeansCentroids]] emits (extra
    * columns like `n` are ignored); clusters must be 0..k−1 each with
    * exactly `dim` coords — a ragged or gapped model fails loudly.
    * Driver state: the k·dim bounded model pull, nothing else.
    */
  def assignWithCentroids(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, centroids: DataFrame): DataFrame = {
    require(dim >= 1, s"dim must be >= 1, got $dim")
    df.select(col(idCol),
      assignExpr(checkedVec(vecCol, dim),
        centroidMatrix(centroids, dim)).cast("long").as("cluster"))
  }

  /** Collects a (cluster, dim_idx, coord) frame into the dense k×dim
    * model, validating completeness: every (c, j) cell exactly once,
    * clusters contiguous from 0. k ≤ 4096 — the bounded-driver cap.
    * Public as [[centroidsArray]]: the seam that feeds the full-corpus
    * Lloyd model into [[Similarity.ivfTopKWithCentroids]] as the IVF
    * coarse quantizer.
    */
  def centroidsArray(centroids: DataFrame,
      dim: Int): Array[Array[Double]] = centroidMatrix(centroids, dim)

  private def centroidMatrix(centroids: DataFrame,
      dim: Int): Array[Array[Double]] = {
    val rows = centroids.select(col("cluster").cast("int").as("c"),
      col("dim_idx").cast("int").as("j"),
      col("coord").cast("double").as("x")).collect()
    require(rows.nonEmpty, "centroid model: empty centroid frame")
    val k = rows.iterator.map(_.getInt(0)).max + 1
    require(k >= 1 && k <= 4096,
      s"centroid model: cluster ids must be 0..k-1 with k <= " +
        s"4096, got max id ${k - 1}")
    require(rows.length == k * dim,
      s"centroid model: expected k*dim = ${k * dim} centroid " +
        s"cells, got ${rows.length} — ragged or duplicated model")
    // presence tracked explicitly (not via a NaN sentinel, which would
    // misreport a corrupt NaN coord as a "gapped model"); null/NaN
    // coords are rejected with their own message — getDouble on a null
    // cell would silently read 0.0
    val cs = Array.ofDim[Double](k, dim)
    val seen = Array.ofDim[Boolean](k, dim)
    rows.foreach { r =>
      val (c, j) = (r.getInt(0), r.getInt(1))
      require(c >= 0 && j >= 0 && j < dim,
        s"centroid model: cell ($c, $j) outside k x dim")
      require(!seen(c)(j),
        s"centroid model: duplicate centroid cell ($c, $j)")
      require(!r.isNullAt(2) && !r.getDouble(2).isNaN,
        s"centroid model: null/NaN coord at cell ($c, $j)")
      seen(c)(j) = true
      cs(c)(j) = r.getDouble(2)
    }
    require(seen.forall(_.forall(identity)),
      "centroid model: missing centroid cells (gapped model)")
    cs
  }

  private def validate(dim: Int, k: Int, iterations: Int,
      scale: Double): Unit = {
    require(dim >= 1, s"dim must be >= 1, got $dim")
    require(k >= 1 && k <= 4096, s"k must be in [1, 4096], got $k")
    require(iterations >= 1 && iterations <= 50,
      s"iterations must be in [1, 50], got $iterations")
    require(scale > 0.0, s"scale must be positive, got $scale")
  }
}
