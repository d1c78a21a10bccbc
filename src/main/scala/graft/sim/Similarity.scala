package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (SURVEY.md §7.5).
  *
  * Scale design:
  *  - Brute-force top-k is the exact baseline: queries broadcast (small),
  *    corpus streamed — per-partition ranking then a global
  *    TakeOrderedAndProject per query; the corpus is never shuffled.
  *  - The LSH path buckets by random-hyperplane sign patterns (planes are
  *    deterministic hash functions of (plane, dim) — no RNG state to ship)
  *    so candidate generation is a hash-partitioned equi-join on bucket
  *    id; probing multiple band permutations trades recall for cost.
  *  - Dot products use `aggregate(zip_with(...))` higher-order exprs —
  *    per-row JVM columnar work, no UDF serialization.
  */
object Similarity {

  /** Dot product of two array<double> columns — a single-pass custom
    * expression (graft.functions.DotProduct); accumulates left-to-right
    * exactly like the HOF `aggregate(zip_with(...))` fold it replaced,
    * so results are bit-identical (and the DuckDB oracles stay green).
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.dot(a, b)

  /** L2 norm (single-pass custom expression, same fold order). */
  def norm(a: Column): Column =
    graft.functions.VectorFunctions.norm(a)

  /** Cosine similarity. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact brute-force cosine top-k: for each query row (small set,
    * broadcast), the k nearest corpus rows. Returns (query_id, vec_id,
    * cosine, rank).
    */
  def bruteForceTopK(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, queryIdCol: String, queryVecCol: String,
      k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("__cv"))
    val q = broadcast(queries.select(col(queryIdCol).as("query_id"),
      col(queryVecCol).as("__qv")))
    val scored = c.crossJoin(q)
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cosine", cosine(col("__cv"), col("__qv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "vec_id", "cosine", "rank")
  }

  /** Sign-pattern bucket id from `planes` deterministic pseudo-random
    * hyperplanes: component (p, i) = xxhash64(p, i) scaled to [−1, 1) —
    * reproducible on any executor with no shipped RNG state.
    */
  def lshBucket(vec: Column, planes: Int): Column =
    (0 until planes).map { p =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (v, i) => v * (xxhash64(lit(p), i).cast("double") /
            lit(Long.MaxValue.toDouble))),
        lit(0.0), (a, v) => a + v)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Approximate cosine top-k: candidates restricted to the query's LSH
    * bucket (equi-join on bucket id), then exact cosine rank within the
    * candidates. Recall grows with fewer planes / more probes; this is the
    * scale path when the corpus no longer fits a crossJoin.
    */
  def lshTopK(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, queryIdCol: String, queryVecCol: String,
      k: Int, planes: Int = 8): DataFrame = {
    val c = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("__cv"),
      lshBucket(col(vecCol), planes).as("__bucket"))
    val q = broadcast(queries.select(col(queryIdCol).as("query_id"),
      col(queryVecCol).as("__qv"),
      lshBucket(col(queryVecCol), planes).as("__bucket")))
    val scored = c.join(q, Seq("__bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cosine", cosine(col("__cv"), col("__qv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "vec_id", "cosine", "rank")
  }

  /** IVF (inverted-file) approximate top-k — the other standard ANN scale
    * path. Coarse quantizer: `nCentroids` vectors sampled deterministically
    * from the corpus by id-rank (no RNG state); every corpus vector is
    * assigned to its nearest centroid once (one pass, expressions only);
    * a query probes its `nProbe` nearest centroids' cells. Corpus cells
    * are hash-partitioned by centroid id, so the probe is an equi-join on
    * cell id over ~nProbe/nCentroids of the corpus — at 100 TB the scan
    * shrinks by that factor while recall tracks nProbe.
    */
  def ivfTopK(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, queryIdCol: String, queryVecCol: String,
      k: Int, nCentroids: Int = 16, nProbe: Int = 4): DataFrame = {
    // deterministic coarse centroids: the nCentroids corpus rows with the
    // smallest id-hash — a uniform pseudo-random sample that plans as
    // TakeOrderedAndProject (per-partition top-k, tiny merge on the
    // driver; no count pass, no global sort, ONE scan of the corpus).
    // id as the secondary sort key: a duplicate id or a 64-bit hash tie at
    // the nCentroids boundary would otherwise make the cut
    // partition-order-dependent
    val centroids = corpus
      .select(col(vecCol), xxhash64(col(idCol)).as("__h"), col(idCol).as("__i"))
      .orderBy(col("__h"), col("__i")).limit(nCentroids)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Double](0).toArray)
    require(centroids.nonEmpty, "IVF: empty corpus")

    def nearestCells(vec: Column, m: Int): Column = {
      // squared L2 distance to each centroid, as static expressions
      val dists = centroids.zipWithIndex.map { case (c, i) =>
        struct(
          aggregate(zip_with(vec, lit(c), (a, b) => (a - b) * (a - b)),
            lit(0.0), (acc, v) => acc + v).as("d"),
          lit(i).as("cell"))
      }
      slice(transform(sort_array(array(dists: _*)), s => s("cell")), 1, m)
    }

    val assigned = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("__cv"),
      nearestCells(col(vecCol), 1).getItem(0).as("__cell"))
    val probes = broadcast(queries.select(col(queryIdCol).as("query_id"),
        col(queryVecCol).as("__qv"),
        explode(nearestCells(col(queryVecCol), nProbe)).as("__cell")))
    val scored = assigned.join(probes, Seq("__cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cosine", cosine(col("__cv"), col("__qv")))
    val rankW = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(rankW))
      .filter(col("rank") <= k)
      .select("query_id", "vec_id", "cosine", "rank")
  }

  /** All-pairs near-duplicates by cosine ≥ threshold, LSH-bucketed
    * (pairs only form inside a bucket; bucket size capped upstream by the
    * planes count). Used by Dedup.embeddingNearDups.
    */
  def cosineNearDups(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, planes: Int): DataFrame = {
    // norms are computed ONCE per vector before the pair join — inside
    // the join condition each candidate pair costs one dot-product fold,
    // not three (norm folds dominate when buckets are dense)
    val v = df.select(col(idCol).as("id"), col(vecCol).as("__v"),
      norm(col(vecCol)).as("__n"),
      lshBucket(col(vecCol), planes).as("__bucket"))
    v.as("a").join(v.as("b"),
        col("a.__bucket") === col("b.__bucket") && col("a.id") < col("b.id"))
      .withColumn("cosine",
        dot(col("a.__v"), col("b.__v")) / (col("a.__n") * col("b.__n")))
      .filter(col("cosine") >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("cosine"))
  }
}
