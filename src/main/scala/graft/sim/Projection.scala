package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Johnson–Lindenstrauss random projection — the embedding-compression
  * primitive of a 100 TB vector pipeline (Achlioptas 2003 sign-matrix
  * variant): p[j] = Σ_i v[i]·s[j,i] / √k with s ∈ {−1, +1}. Pairwise
  * distances and cosines survive within (1 ± ε) at k = O(log n / ε²),
  * so downstream dedup/ANN runs on k ≪ d coordinates — no training
  * pass, unlike PCA, which is exactly why it is the scale tool: the
  * "model" is a hash formula, not a fitted artifact.
  *
  * Scale + determinism design:
  *  - the sign matrix derives from Spark's own xxhash64 —
  *    s[j,i] = parity of XXH64(j·d + i, seed 42) — so it is a pure
  *    function of (j, i): no randomness to persist, any executor (and
  *    the DuckDB oracle, via the bit-verified pure-SQL XXH64)
  *    regenerates it identically. It rides the plan as a k×d byte
  *    reference object (~4 KB at 64→64).
  *  - projection is a codegen'd scan-stage expression
  *    ([[graft.functions.JlProject]]): one walk per row, each output
  *    coordinate folded in ELEMENT order — row-local float arithmetic,
  *    bit-stable on any partitioning, zero shuffles. No ln/pow in the
  *    path and √k is IEEE-exact, so results compare EXACTLY.
  */
object Projection {

  /** The deterministic sign matrix: signs(j)(i) = +1 if
    * xxhash64(j·dim + i, seed 42) is even, else −1 — j, i 0-based.
    */
  private[graft] def jlSigns(dim: Int, outDim: Int): Array[Array[Byte]] =
    Array.tabulate(outDim) { j =>
      Array.tabulate(dim) { i =>
        val h = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashLong(j.toLong * dim + i, 42L)
        if ((h & 1L) == 0L) 1.toByte else (-1).toByte
      }
    }

  /** Column API: project an array<float|double> of length `dim` to
    * array<double> of length `outDim`. Wrong-length rows or null
    * elements yield null (the vec_dot convention).
    */
  def jlProject(vec: Column, dim: Int, outDim: Int): Column = {
    require(dim >= 1, s"dim must be positive, got $dim")
    require(outDim >= 1 && outDim <= dim,
      s"outDim must be in [1, dim=$dim], got $outDim")
    VectorFunctions.jlProject(vec, jlSigns(dim, outDim))
  }

  /** Long-form projection table (id, coord index, value) — the
    * oracle-friendly shape; one scan, zero shuffles before the caller's
    * consumption.
    */
  def jlProjectTable(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, outDim: Int): DataFrame =
    df.select(col(idCol),
        posexplode(jlProject(col(vecCol), dim, outDim))
          .as(Seq("proj_dim", "coord")))
      .select(col(idCol), col("proj_dim").cast("long").as("proj_dim"),
        col("coord"))
}
