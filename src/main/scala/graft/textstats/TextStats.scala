package graft.textstats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines
  * (SURVEY.md §7.5): language ID, quality scoring, token counting,
  * document fingerprinting. All pure column expressions — codegen'd, no
  * UDFs in the hot path, and every op is per-row (embarrassingly
  * parallel; no shuffle at all).
  */
object TextStats {

  /** Tiny per-language function-word lists for the n-gram/stopword
    * heuristic language detector. Public-knowledge word lists.
    */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "of", "and", "to", "in", "is", "that", "it", "was", "for"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein", "mit", "zu", "den"),
    "fr" -> Seq("le", "la", "les", "et", "des", "est", "une", "dans", "que", "pour"),
    "es" -> Seq("el", "la", "los", "de", "que", "es", "una", "por", "con", "para"))

  private def tokens(c: Column): Column =
    filter(split(lower(c), "\\s+"), t => length(t) > 0)

  /** Language-ID heuristic: fraction of tokens that are function words of
    * each candidate language; argmax with a deterministic tiebreak (score
    * desc, language asc). Emits (lang, score).
    */
  def langId(c: Column): Column = {
    val scores = graft.functions.TextFunctions.langMarkerScores(tokens(c),
      langMarkers)
    val scored = langMarkers.keys.toSeq.sorted.zipWithIndex.map {
      case (lang, i) =>
        struct(scores.getItem(i).as("score"), lit(lang).as("lang"))
    }
    // array_max on (score, lang) structs orders lexicographically:
    // max score wins, ties broken by max lang — flip: we want smallest
    // lang on ties, so compare on (score, negated-rank) via sort.
    sort_array(array(scored: _*), asc = false).getItem(0)
  }

  /** Quality-scoring features: char/word counts, mean word length,
    * punctuation / digit / stopword / uppercase ratios, plus a composite
    * [0,1] score. Thresholds follow common published heuristics (e.g.
    * C4/Gopher-style rules) simplified to ratio features.
    */
  def qualityFeatures(df: DataFrame, textCol: String): DataFrame = {
    val c = col(textCol)
    val toks = tokens(c)
    val nChars = length(c).cast("double")
    val nTokens = size(toks).cast("double")
    val safeTokens = greatest(nTokens, lit(1.0))
    val punct = length(regexp_replace(c, "[^.,;:!?]", "")).cast("double")
    val digits = length(regexp_replace(c, "[^0-9]", "")).cast("double")
    val upper = length(regexp_replace(c, "[^A-Z]", "")).cast("double")
    val stops = size(filter(toks, t => t.isInCollection(langMarkers("en")))).cast("double")
    df.withColumn("n_chars_calc", nChars)
      .withColumn("n_tokens", nTokens)
      .withColumn("mean_word_len", nChars / safeTokens)
      .withColumn("punct_ratio", punct / greatest(nChars, lit(1.0)))
      .withColumn("digit_ratio", digits / greatest(nChars, lit(1.0)))
      .withColumn("upper_ratio", upper / greatest(nChars, lit(1.0)))
      .withColumn("stopword_ratio", stops / safeTokens)
      .withColumn("quality_score",
        when(nTokens < 5, 0.0).otherwise(
          lit(1.0)
            - least(col("digit_ratio") * 2, lit(0.5))
            - least(col("punct_ratio") * 2, lit(0.3))
            + least(col("stopword_ratio"), lit(0.2))))
  }

  /** Whitespace token count. */
  def tokenCount(c: Column): Column = size(tokens(c))

  /** BPE-ish subword count: word-piece regex `\p{L}+|\p{N}+|[^\p{L}\p{N}\s]`
    * matches (letters runs, digit runs, single punctuation) — a cheap,
    * deterministic proxy for tokenizer counts at scale.
    */
  def subwordCount(c: Column): Column =
    size(regexp_extract_all(c, lit("\\p{L}+|\\p{N}+|[^\\p{L}\\p{N}\\s]"), lit(0)))

  /** Canonical-form document fingerprint: lowercase, strip non-alnum,
    * collapse whitespace, md5 — identical normalization is expressible in
    * any engine, so exact dedup on the fingerprint is portable.
    */
  def fingerprint(c: Column): Column =
    md5(regexp_replace(trim(regexp_replace(lower(c), "[^a-z0-9\\s]", "")),
      "\\s+", " "))

  /** Tokens of the canonical form above — the token basis for shingling /
    * minhash / simhash so near-dup detection ignores case & punctuation.
    */
  def fingerprintTokens(c: Column): Column =
    filter(split(trim(regexp_replace(lower(c), "[^a-z0-9\\s]", "")), "\\s+"),
      t => length(t) > 0)

  /** TF-IDF over a document table (SURVEY.md §7.5 token/count analytics):
    * tf = term count / doc length (exact integer ratio), df = documents
    * containing the term, idf = ln(N / df), tfidf = tf · idf. Two hash
    * aggregations (term-per-doc, term-df) + one broadcast-able join —
    * the canonical map-side-combinable shape; no collect. N rides as a
    * one-row scalar aggregate broadcast back via cross join (the
    * lastYearsGlobal pattern) instead of an eager df.count() — one job,
    * not two, and no driver round-trip in the lineage.
    */
  def tfidf(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val corpusN = df.agg(count(lit(1)).cast("double").as("__corpus_n"))
    val terms = df.select(col(idCol).as("doc_id"),
        explode(tokens(col(textCol))).as("token"))
    val perDoc = terms.groupBy("doc_id", "token")
      .agg(count(lit(1)).as("term_count"))
    val docLen = terms.groupBy("doc_id").agg(count(lit(1)).as("doc_len"))
    val docFreq = perDoc.groupBy("token").agg(count(lit(1)).as("doc_freq"))
    perDoc.join(docLen, Seq("doc_id"))
      .join(docFreq, Seq("token"))
      .crossJoin(broadcast(corpusN))
      .withColumn("tf", col("term_count").cast("double") / col("doc_len"))
      .withColumn("idf", log(col("__corpus_n") / col("doc_freq")))
      .withColumn("tfidf", col("tf") * col("idf"))
      .drop("__corpus_n")
  }

  /** Repetition signals in the Gopher/MassiveText style (duplicate-token
    * and top-n-gram fractions, published in Rae et al. 2021 §A1.1 as
    * filtering heuristics): how much of the document is the same token
    * or bigram repeated. Emitted as exact integer counts (not ratios) so
    * the numbers are engine-portable; callers derive fractions.
    *
    * Shape: the stats are per-document, i.e. row-local — so this is ONE
    * walk of the token array per row (functions.GramStats: two per-row
    * hash maps, unigrams and bigrams in the same pass). No explode, no
    * shuffle, empty docs get zeros naturally. The first cut exploded the
    * gram stream through groupBy(doc, gram) — that pushed the whole
    * corpus through an exchange for arithmetic that never needed to
    * leave the row.
    */
  def repetitionFeatures(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // NULL text counts as an empty doc (zeros), matching the oracle's
    // left-join + coalesce shape — without this a nullable corpus column
    // would yield NULL stats instead
    val toks = coalesce(tokens(col(textCol)),
      array().cast("array<string>"))
    val g = graft.functions.TextFunctions.gramStats(toks)
    df.select(col(idCol).as("doc_id"), g.as("__g"))
      .select(col("doc_id"),
        col("__g.n_tokens").as("n_tokens"),
        col("__g.n_distinct_tokens").as("n_distinct_tokens"),
        (col("__g.n_tokens") - col("__g.n_distinct_tokens"))
          .as("dup_token_count"),
        col("__g.top_token_count").as("top_token_count"),
        col("__g.n_bigrams").as("n_bigrams"),
        col("__g.n_distinct_bigrams").as("n_distinct_bigrams"),
        col("__g.top_bigram_count").as("top_bigram_count"))
  }

  /** PII patterns (email, dotted-quad IP, short phone) — deliberately in
    * the common subset of Java regex and RE2 (no backrefs, no lookaround)
    * so scrubbing is reproducible across engines.
    */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val phoneRe = "\\b\\d{3}-\\d{4}\\b"

  /** Count matches of a PII pattern (pre-redaction audit column). */
  def piiCount(c: Column, pattern: String): Column =
    size(regexp_extract_all(c, lit(pattern), lit(0))).cast("long")

  /** Redact PII in place: emails, then IPs, then phone fragments —
    * email first so an address is consumed whole before the narrower
    * numeric patterns can bite into its domain. Pure codegen'd
    * expressions, embarrassingly parallel.
    */
  def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, emailRe, "<EMAIL>"),
        ipv4Re, "<IP>"),
      phoneRe, "<PHONE>")

  /** Polynomial rolling hash over word shingles (Rabin-Karp style, base
    * 1000003 mod 2^61−1) — returns the array of shingle hashes, the basis
    * for content-defined chunking / near-dup candidates.
    */
  def rollingShingleHashes(c: Column, shingle: Int): Column = {
    val toks = tokens(c)
    val n = size(toks)
    when(n >= shingle,
      transform(sequence(lit(0), n - shingle),
        i => xxhash64(concat_ws(" ", slice(toks, i + 1, lit(shingle))))))
      .otherwise(array().cast("array<bigint>"))
  }
}
