package graft.text

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Byte-pair-encoding tokenizer training and application — the
  * vocabulary-learning step of a training-data pipeline (Sennrich et al.
  * 2016; the dictionary formulation HuggingFace `tokenizers` and
  * SentencePiece's BPE trainer use). Learning operates on the WORD
  * DICTIONARY, not the token stream: the corpus-sized work is one
  * word-count aggregation, and the merge loop runs over the capped
  * dictionary — vocabulary-bounded by construction, the same
  * bounded-driver-sample discipline as the IVF quantizer
  * ([[graft.sim.Similarity]]).
  *
  * Scale design:
  *  - `wordCounts` is the only corpus pass: tokenize in the scan stage,
  *    one hash aggregation on the word key with map-side partials. Its
  *    output is vocabulary-bounded (≪ corpus — Heaps' law), and the
  *    merge learner consumes only the top `maxVocabWords` rows by
  *    (count desc, word asc) — a TakeOrdered, not a full sort. At 64k
  *    dictionary words the driver state is a few MB.
  *  - the merge loop itself is inherently sequential (merge r+1's pair
  *    counts depend on merge r having been applied), so running it
  *    distributed would pay `numMerges` shuffles over a dictionary that
  *    fits in memory; driver-local over the capped dictionary is the
  *    scale-correct shape, exactly as production tokenizer trainers do.
  *  - [[encode]] applies the learned merges as a codegen'd scan-stage
  *    expression ([[graft.functions.BpeEncode]]) — no shuffle, no UDF;
  *    a bounded per-executor memo cache makes repeated words (the
  *    overwhelming majority of a natural corpus) a hash lookup.
  *
  * Determinism: integer pair counts; the best pair is max count with
  * ties to the codepoint-wise smallest (left, right) — the same total
  * order as DuckDB's binary VARCHAR collation, so the learned table is
  * bit-reproducible cross-engine. Merges are applied as one full
  * left-to-right non-overlapping pass per rank, in rank order. This is
  * a deliberate, self-consistent semantics: [[trainMerges]],
  * [[graft.functions.BpeEncode]] and the DuckDB oracle all apply
  * merges this way, so the learned table and every encoded output
  * agree bit-for-bit across engines. (It is NOT claimed equal to the
  * lowest-rank-first priority-queue formulation in every corner: two
  * distinct merges can fuse to the same string and re-create an
  * earlier-rank pair after that rank's pass already ran — a case the
  * queue would merge and a rank-order pass leaves split. All three
  * implementations here share one behavior, which is the property
  * correctness rests on.)
  */
object Bpe {

  /** One learned merge: at `rank`, adjacent pieces (`left`, `right`)
    * fused with dictionary-weighted pair frequency `freq`.
    */
  final case class Merge(rank: Int, left: String, right: String, freq: Long)

  /** Corpus word dictionary: (word, n) via the text tier's shared
    * tokenizer — one hash aggregation, vocabulary-bounded output.
    */
  def wordCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextPipeline.tokenize(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))

  /** Learn `numMerges` BPE merges from the corpus. The distributed part
    * is the word-count aggregation; the returned table is
    * `numMerges`-bounded. `maxVocabWords` caps the driver-local
    * dictionary (count desc, word asc — deterministic cutoff).
    */
  def trainMerges(df: DataFrame, textCol: String, numMerges: Int,
      maxVocabWords: Int = 1 << 16): Seq[Merge] = {
    require(numMerges >= 1 && numMerges <= 100000,
      s"numMerges must be in [1, 100000], got $numMerges")
    require(maxVocabWords >= 1,
      s"maxVocabWords must be positive, got $maxVocabWords")
    val dict = wordCounts(df, textCol)
      .orderBy(col("n").desc, col("word"))
      .limit(maxVocabWords)
      .collect() // bounded: ≤ maxVocabWords rows by construction
      .map(r => (r.getString(0), r.getLong(1)))
    learnFromDict(dict, numMerges)
  }

  /** The learned merges as a DataFrame (rank, lft, rgt, freq) — the
    * persistable model artifact.
    */
  def mergeTable(spark: SparkSession, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.map(m => (m.rank.toLong, m.left, m.right, m.freq))
      .toDF("rank", "lft", "rgt", "freq")
  }

  /** Encode an array<string> of words into BPE tokens (per-word pieces,
    * concatenated in word order) with the learned merges — a codegen'd
    * scan-stage expression, no shuffle.
    */
  def encode(tokens: Column, merges: Seq[Merge]): Column =
    TextFunctions.bpeEncode(tokens,
      merges.sortBy(_.rank).map(m => (m.left, m.right)))

  /** Corpus token frequencies under the learned tokenizer: encode every
    * document in the scan stage, one hash aggregation on the token key.
    * Output is (token, n), bounded by |vocab chars| + numMerges.
    */
  def tokenFrequencies(df: DataFrame, textCol: String,
      merges: Seq[Merge]): DataFrame =
    df.select(explode(encode(TextPipeline.tokenize(col(textCol)), merges))
        .as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))

  // ------------------------------------------------------------------
  // driver-local dictionary learner (package-visible for the spec's
  // independent-model comparison)
  // ------------------------------------------------------------------

  /** Codepoint-wise string comparison — the UTF-8 byte order DuckDB's
    * binary VARCHAR collation uses (Java's compareTo differs on
    * supplementary characters: UTF-16 code-unit order).
    */
  private[graft] def cpCompare(a: String, b: String): Int = {
    var i = 0
    var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i)
      val cb = b.codePointAt(j)
      if (ca != cb) return java.lang.Integer.compare(ca, cb)
      i += Character.charCount(ca)
      j += Character.charCount(cb)
    }
    java.lang.Integer.compare(a.length - i, b.length - j)
  }

  private[graft] def splitCodepoints(w: String): Array[String] = {
    val out = new mutable.ArrayBuffer[String](w.length)
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      val n = Character.charCount(cp)
      out += w.substring(i, i + n)
      i += n
    }
    out.toArray
  }

  /** One full left-to-right non-overlapping merge pass. */
  private[graft] def applyMergePass(p: Array[String], l: String,
      r: String): Array[String] = {
    if (p.length < 2) return p
    val out = new mutable.ArrayBuffer[String](p.length)
    var i = 0
    while (i < p.length) {
      if (i + 1 < p.length && p(i) == l && p(i + 1) == r) {
        out += l + r
        i += 2
      } else {
        out += p(i)
        i += 1
      }
    }
    out.toArray
  }

  /** Classic dictionary BPE: count adjacent pairs weighted by word
    * frequency, fuse the most frequent (ties to the codepoint-smallest
    * pair), repeat. Stops early when no pair remains.
    */
  private[graft] def learnFromDict(dict: Array[(String, Long)],
      numMerges: Int): Seq[Merge] = {
    var words: Array[(Array[String], Long)] =
      dict.map { case (w, c) => (splitCodepoints(w), c) }
    val out = mutable.ArrayBuffer.empty[Merge]
    var rank = 0
    var exhausted = false
    while (rank < numMerges && !exhausted) {
      val counts = mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (p, c) =>
        var i = 0
        while (i < p.length - 1) {
          val k = (p(i), p(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + c)
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        var best: ((String, String), Long) = null
        counts.foreach { kv =>
          if (best == null) best = kv
          else if (kv._2 > best._2) best = kv
          else if (kv._2 == best._2) {
            val cl = cpCompare(kv._1._1, best._1._1)
            if (cl < 0 || (cl == 0 && cpCompare(kv._1._2, best._1._2) < 0))
              best = kv
          }
        }
        val ((l, r), f) = best
        out += Merge(rank, l, r, f)
        words = words.map { case (p, c) => (applyMergePass(p, l, r), c) }
        rank += 1
      }
    }
    out.toSeq
  }
}
