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

  /** Two-stage ANN through the projection: coarse top-(k·overFetch) per
    * query on PROJECTED cosine (dim/projDim× cheaper per pair — the
    * whole corpus pays 16-dim folds instead of 64-dim), exact rerank of
    * the surviving candidates on the full vectors. `overFetch` large
    * enough to cover the corpus makes the result IDENTICAL to
    * [[Similarity.bruteForceTopK]] (the rerank is exact) — that
    * equivalence is spec-pinned; small overFetch trades recall for the
    * cheap coarse pass like every two-stage retriever.
    *
    * Scale: the corpus is scanned twice (coarse pass; rerank join); the
    * candidate list is |queries|·k·overFetch rows — broadcast back, so
    * nothing corpus-sized shuffles; both rankings are the bounded
    * k-heap aggregation.
    */
  def jlTopK(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, queryIdCol: String, queryVecCol: String,
      k: Int, dim: Int, projDim: Int = 16, overFetch: Int = 4,
      excludeSelf: Boolean = true): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    require(overFetch >= 1, s"overFetch must be positive, got $overFetch")
    val cp = corpus.select(col(idCol).as("vec_id"),
      jlProject(col(vecCol), dim, projDim).as("__cp"))
    val qp = broadcast(queries.select(col(queryIdCol).as("query_id"),
      col(queryVecCol).as("__qv"),
      jlProject(col(queryVecCol), dim, projDim).as("__qp")))
    val paired = cp.crossJoin(qp.select(col("query_id"), col("__qp")))
    // excludeSelf as in Similarity.bruteForceTopK: drop only for
    // self-retrieval id spaces, never across unrelated tables
    val coarse = (if (excludeSelf)
        paired.filter(col("vec_id") =!= col("query_id")) else paired)
      .withColumn("cosine", Similarity.cosine(col("__cp"), col("__qp")))
      .select("query_id", "vec_id", "cosine")
    val cands = Similarity.rankTopK(coarse, k * overFetch)
      .select("query_id", "vec_id")
    // candidate list joins the query vectors first, then ONE broadcast
    // onto the corpus (inner-join reassociation — see Pq.rerankExact)
    val candsQ = broadcast(cands.join(
      qp.select(col("query_id"), col("__qv")), Seq("query_id")))
    val rerank = corpus
      .select(col(idCol).as("vec_id"), col(vecCol).as("__cv"))
      .join(candsQ, Seq("vec_id"))
      .withColumn("cosine", Similarity.cosine(col("__cv"), col("__qv")))
      .select("query_id", "vec_id", "cosine")
    Similarity.rankTopK(rerank, k)
  }
}
