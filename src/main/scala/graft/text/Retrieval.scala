package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.sim.Similarity

/** BM25 ranked full-text retrieval over a document corpus — the
  * sparse-retrieval primitive of a training-data pipeline: mine the
  * corpus neighbors of an eval/benchmark set (retrieval-based
  * decontamination, the complement of the n-gram-overlap check in
  * [[graft.dedup.Dedup.contaminatedDocs]]), find near-topical documents
  * for curriculum/mixture design, or power corpus exploration, without
  * any embedding model in the loop.
  *
  * Scoring is textbook Okapi BM25 with the Lucene-style always-positive
  * idf: for document d, query q,
  * `score = Σ_{t ∈ distinct(q)} ln(1 + (N - df_t + 0.5)/(df_t + 0.5))
  *   · tf_td·(k1+1) / (tf_td + k1·(1 - b + b·|d|/avgdl))`.
  *
  * Scale design (the inverted-index probe shape, not a text cross join):
  *  - the query set is SMALL by contract (an eval suite, not a second
  *    corpus) and is broadcast — twice: its distinct terms prune the
  *    corpus token stream BEFORE the tf aggregation (a `left_semi`
  *    against the broadcast term list inside the explode stage), and the
  *    (query, term) list attaches query ids to the surviving postings.
  *    Nothing corpus-sized ever shuffles on anything but the pruned
  *    postings themselves.
  *  - document length |d| is `size(tokens)` computed in the tokenize
  *    stage — no corpus-side length join.
  *  - N and avgdl are one order-free scalar aggregation (integer count +
  *    integer sum, one division), broadcast as a single row. The corpus
  *    is scanned twice (stats pass + postings pass) — at 100 TB two
  *    scans beat materializing a corpus-sized intermediate.
  *  - per-term df for the query terms is derived from the pruned
  *    postings (a term's postings already list every document containing
  *    it), so no full-vocabulary df table is ever built; the df frame is
  *    bounded by |distinct query terms| and broadcast back.
  *  - `maxDfFrac` is the stop-term guard: a term present in more than
  *    that fraction of documents is excluded from scoring entirely
  *    (its postings would fan in ~N rows per query term for a
  *    near-zero idf contribution). This is a deliberate, documented
  *    semantic knob — the same role as `maxDf` in
  *    [[graft.dedup.Dedup.ngramJaccardNearDups]] — not a silent cap.
  *  - ranking is the bounded k-heap aggregation
  *    ([[graft.functions.TopKAgg]] via `Similarity.rankTopK`) for
  *    integral doc ids: each task forwards ≤ k candidates per query, so
  *    the final exchange carries ≤ k·partitions rows per query. Other id
  *    types take the ranking-window fallback (correct, shuffles all
  *    scored candidates).
  *
  * Determinism: per-(query, doc) term contributions are folded in TERM
  * order inside the row (`sort_array` + `aggregate`), so the double sum
  * never depends on shuffle arrival order — the same discipline as
  * [[graft.textstats.TextStats.lmScore]], and what lets a DuckDB oracle
  * reproduce scores bit-exactly. Ties rank by ascending doc id.
  *
  * Tokenization matches the rest of the text tier: lowercase,
  * whitespace-split, empty tokens dropped. Documents and queries that
  * tokenize to nothing are excluded (an empty query matches nothing; an
  * empty document can match nothing). Duplicate doc ids are a documented
  * precondition violation (postings would double-count df).
  *
  * Reference scope: the reference has no retrieval operator — this is
  * part of the LLM-pipeline tier the brief adds on top of SURVEY.md §2.
  */
object Retrieval {

  private def toks(c: Column): Column =
    filter(split(lower(c), "\\s+"), t => length(t) > 0)

  /** Same reliable-or-local lineage cut as graft.dedup.Dedup.cut: the
    * pruned postings feed two consumers (df counts + scoring) and Spark
    * does not reuse the exchange across them.
    */
  private def cut(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint(eager = true)
    else df.localCheckpoint(eager = true)

  /** Top-k BM25 hits per query. Returns (query_id, doc_id, score, rank),
    * rank 1..k by (score desc, doc_id asc); queries with no surviving
    * term match are absent from the output.
    *
    * @param maxDfFrac exclude terms whose document frequency exceeds
    *   this fraction of the corpus (stop-term guard; 1.0 = score every
    *   term). Exclusion is exact-semantics: the term contributes nothing
    *   for every query, symmetrically.
    */
  def bm25TopK(corpus: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, queryIdCol: String, queryTextCol: String,
      k: Int, k1: Double = 1.2, b: Double = 0.75,
      maxDfFrac: Double = 1.0): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(k1 > 0, s"k1 must be positive, got $k1")
    require(b >= 0 && b <= 1, s"b must be in [0, 1], got $b")
    require(maxDfFrac > 0 && maxDfFrac <= 1,
      s"maxDfFrac must be in (0, 1], got $maxDfFrac")

    val corp = corpus
      .select(col(idCol).as("doc_id"), toks(col(textCol)).as("__tk"))
      .filter(size(col("__tk")) > 0)
      .select(col("doc_id"), col("__tk"),
        size(col("__tk")).cast("long").as("__dl"))
    val q = queries
      .select(col(queryIdCol).as("query_id"),
        toks(col(queryTextCol)).as("__qtk"))
      .filter(size(col("__qtk")) > 0)
      .select(col("query_id"), explode(array_distinct(col("__qtk"))).as("__w"))
    val qw = q.select("__w").distinct()

    // N + avgdl: one scalar row (integer count, integer token sum, one
    // division) — order-free, broadcast
    val stats = broadcast(corp.agg(
      count(lit(1)).as("__n"),
      (sum(col("__dl")).cast("double") / count(lit(1)).cast("double"))
        .as("__avgdl")))

    // postings for QUERY TERMS ONLY: the broadcast semi-join prunes the
    // token stream before the (doc, term) aggregation ever shuffles
    val post = cut(corp
      .select(col("doc_id"), col("__dl"), explode(col("__tk")).as("__w"))
      .join(broadcast(qw), Seq("__w"), "left_semi")
      .groupBy("doc_id", "__dl", "__w").agg(count(lit(1)).as("__tf")))

    // df per query term from the pruned postings (one row per (doc,
    // term) ⇒ count = document frequency); bounded by |query terms|
    val dft = post.groupBy("__w").agg(count(lit(1)).as("__dfc"))

    val nD = col("__n").cast("double")
    val dfD = col("__dfc").cast("double")
    val tfD = col("__tf").cast("double")
    val dlD = col("__dl").cast("double")
    val idf = log(lit(1.0) + (nD - dfD + lit(0.5)) / (dfD + lit(0.5)))
    val tfPart = (tfD * lit(k1 + 1.0)) /
      (tfD + lit(k1) * (lit(1.0 - b) + lit(b) * (dlD / col("__avgdl"))))

    val contrib = post
      .join(broadcast(q), Seq("__w"))
      .join(broadcast(dft), Seq("__w"))
      .crossJoin(stats)
      .filter(dfD <= lit(maxDfFrac) * nD)
      .select(col("query_id"), col("doc_id"), col("__w"),
        (idf * tfPart).as("__c"))

    // fold contributions in TERM order inside the row — shuffle-order-
    // independent double sum (no duplicate terms per (query, doc): tf is
    // grouped and query terms are distinct)
    val scored = contrib.groupBy("query_id", "doc_id")
      .agg(sort_array(collect_list(struct(col("__w"), col("__c"))))
        .as("__cs"))
      .select(col("query_id"), col("doc_id").as("vec_id"),
        aggregate(transform(col("__cs"), x => x("__c")), lit(0.0),
          (a, v) => a + v).as("cosine"))

    Similarity.rankTopK(scored, k)
      .select(col("query_id"), col("vec_id").as("doc_id"),
        col("cosine").as("score"), col("rank"))
  }
}
