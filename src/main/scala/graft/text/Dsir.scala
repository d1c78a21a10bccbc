package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023):
  * select raw-corpus documents that look like a TARGET distribution
  * (curated text, a downstream domain) by importance weight under
  * hashed n-gram features. The pretraining-data selection method used
  * when a small high-quality corpus must steer what is kept from a
  * 100 TB crawl.
  *
  *  - Features: each word hashes into one of `buckets` slots
  *    (`pmod(xxhash64(w), buckets)` — Spark's own seeded hash, nothing
  *    to persist).
  *  - Two bucket histograms — target and raw — give add-one-smoothed
  *    unigram models p̂_target / p̂_raw over the bucket alphabet.
  *  - A document's importance is its log-likelihood ratio
  *    `Σ_i log(p̂_t[b_i] / p̂_r[b_i])` over its word positions; keep
  *    the top-k (deterministic rank, the resampling step's
  *    temperature-0 limit).
  *
  * Scale design: the two histograms are one map-side-combined hash
  * aggregation each, bounded by `buckets` rows; the log-ratio table is
  * DRIVER-LOCAL and tiny (`buckets` doubles — the bounded-driver-model
  * discipline of the IVF quantizer and the NB model), and scoring is
  * ZERO-shuffle: the array literal rides the plan and each document
  * folds its own positions in the scan stage. Selection is one
  * TakeOrdered top-k.
  *
  * Determinism: integer histograms; the per-document fold runs in
  * POSITION order (transform + aggregate are left-to-right), so the
  * double sum is partition-independent. `log` is the only
  * transcendental — round emitted scores (the tier's round-6
  * discipline) when pinning cross-engine.
  */
object Dsir {

  /** Hashed-unigram feature bucket of a word. */
  def wordBucket(w: Column, buckets: Int): Column =
    pmod(xxhash64(w), lit(buckets.toLong))

  /** Bucket histogram of a corpus: Array[Long] of length `buckets`
    * (driver-local, bounded by construction). */
  def bucketCounts(df: DataFrame, textCol: String,
      buckets: Int): Array[Long] = {
    require(buckets >= 2 && buckets <= (1 << 20),
      s"buckets must be in [2, 2^20], got $buckets")
    val rows = df
      .select(explode(TextPipeline.tokenize(col(textCol))).as("__w"))
      .groupBy(wordBucket(col("__w"), buckets).as("__b"))
      .agg(count(lit(1)).as("__n"))
      .collect()
    val arr = Array.fill(buckets)(0L)
    rows.foreach(r => arr(r.getLong(0).toInt) = r.getLong(1))
    arr
  }

  /** Per-bucket log(p̂_target/p̂_raw) under add-one smoothing. */
  def featureLogRatios(target: DataFrame, raw: DataFrame,
      textCol: String, buckets: Int): Array[Double] = {
    val ct = bucketCounts(target, textCol, buckets)
    val cr = bucketCounts(raw, textCol, buckets)
    val tt = ct.sum.toDouble + buckets
    val tr = cr.sum.toDouble + buckets
    Array.tabulate(buckets) { b =>
      math.log((ct(b) + 1L).toDouble / tt) -
        math.log((cr(b) + 1L).toDouble / tr)
    }
  }

  /** Score every document: (idCol, n_tokens, logw) with `logw` the
    * position-ordered log-likelihood-ratio fold (0.0 for an empty
    * document — an evidence-free doc is ratio 1). Zero shuffles: the
    * `logRatios` table (from [[featureLogRatios]]) rides the plan as
    * an array literal.
    */
  def importanceWeights(df: DataFrame, idCol: String, textCol: String,
      logRatios: Array[Double]): DataFrame = {
    require(logRatios.nonEmpty, "logRatios must be non-empty")
    val lrLit = array(logRatios.toSeq.map(lit): _*)
    // a NULL text is an evidence-free doc, same as an empty one —
    // coalesce keeps the documented "ratio 1 → logw 0.0" contract
    // instead of leaking NULLs that would sort apart from real scores
    val toks = coalesce(TextPipeline.tokenize(col(textCol)),
      array().cast("array<string>"))
    df.select(col(idCol),
      size(toks).cast("long").as("n_tokens"),
      aggregate(
        transform(toks, w => element_at(lrLit,
          (wordBucket(w, logRatios.length) + 1L).cast("int"))),
        lit(0.0), (a, v) => a + v).as("logw"))
  }

  /** The composed endpoint: train both histograms, score `raw`, keep
    * the top `k` documents by (logw desc, id) — one TakeOrdered.
    * Returns (idCol, n_tokens, logw, rank).
    */
  def selectTopK(raw: DataFrame, idCol: String, textCol: String,
      target: DataFrame, targetTextCol: String, k: Int,
      buckets: Int = 64): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val lr = featureLogRatios(target.select(col(targetTextCol)
      .as(textCol)), raw, textCol, buckets)
    importanceWeights(raw, idCol, textCol, lr)
      .orderBy(col("logw").desc, col(idCol))
      .limit(k)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("logw").desc, col(idCol))).cast("long"))
  }
}
