package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.text.Retrieval

/** Streaming twin of the BM25 index probe: a stream of queries answered
  * against the static persisted postings index.
  *
  * In probe mode every score input is per-query independent — N/avgdl
  * ride the persisted stats row and df derives from the INDEX postings,
  * never from the query batch — so scoring a stream batch-by-batch is
  * EXACT: the union of per-micro-batch results equals the one-shot
  * batch probe over the union of queries (StreamingRetrievalSpec pins
  * this). That makes `foreachBatch` the right streaming shape — each
  * micro-batch of queries runs the identical bounded batch plan (terms
  * broadcast, postings pruned, k-heap ranking) with no streaming state
  * at all — rather than forcing the two chained aggregations of the
  * scoring pipeline through stateful streaming operators.
  *
  * Usage:
  * {{{
  * val handler = StreamingRetrieval.bm25ProbeBatches(postings, stats,
  *   "q_id", "q_text", k = 5)
  * queryStream.writeStream.foreachBatch { (batch, id) =>
  *   handler(batch).write.mode("append").parquet(outDir)
  * }
  * }}}
  */
object StreamingRetrieval {

  /** A per-micro-batch scoring function over a STATIC index: apply it to
    * each batch of (query id, query text) rows inside `foreachBatch`.
    * Returns the standard (query_id, doc_id, score, rank) shape.
    */
  def bm25ProbeBatches(postings: DataFrame, stats: DataFrame,
      queryIdCol: String, queryTextCol: String, k: Int,
      k1: Double = 1.2, b: Double = 0.75,
      maxDfFrac: Double = 1.0): DataFrame => DataFrame = {
    // validate ALL params at handler-build time (same checks the probe
    // runs), so a bad k1/b fails before the stream ever starts instead
    // of killing the running query in its first micro-batch
    Retrieval.checkParams(k, k1, b, maxDfFrac)
    batch =>
      Retrieval.bm25ProbeIndex(postings, stats, batch,
        queryIdCol, queryTextCol, k, k1, b, maxDfFrac)
  }

  // ------------------------------------------------------------------
  // Streaming INDEX-UPDATE twin (round-14 verdict #4): the other half
  // of the incremental lifecycle. bm25ProbeBatches answers a query
  // stream against a frozen index; streamingPostingsUpdate maintains
  // the index itself against a stream of re-ingested/edited documents,
  // newest-wins by EVENT TIME — graft.text.Retrieval.updateBm25Index
  // as a stateful operator.
  //
  // Semantics are order-free in the settled sense: per doc the state
  // keeps only the max-event-time version seen, so arbitrary batching,
  // re-delivery (same (doc, ts) again → silent no-op) and out-of-order
  // arrival (older version after newer → ignored) all settle to the
  // same postings. Each ACCEPTED version emits its full postings
  // refresh tagged with a monotone `rev`, plus one null-term SENTINEL
  // row per version — the per-doc length record (dl) and, crucially,
  // the eviction marker: a re-ingested doc whose new text tokenizes to
  // EMPTY emits only the sentinel, which [[mergeSettledPostings]]
  // turns into eviction-without-replacement, exactly
  // updateBm25Index's evict-on-fresh-corpus-ids rule. Sinks upsert by
  // doc keeping the highest rev ([[settlePostings]]).
  //
  // Scale contract: tokenization and tf-counting run in the
  // PROJECTION (scan stage) — the shuffle carries (doc, us, dl,
  // terms[], tfs[]), i.e. the postings themselves, never raw text;
  // state per doc is three longs (us, rev) — no per-term state. Like
  // the SCD2 open version, the per-doc latest-version marker has no
  // TTL (newest-wins must recognize staleness however late the next
  // version arrives), so state grows with total re-ingested-doc
  // cardinality — tens of bytes per doc.
  //
  // A (doc, ts) pair carrying two DIFFERENT texts is a precondition
  // violation (first arrival wins — the only arrival-order-dependent
  // case, same class as duplicate doc ids in the batch operator).
  // ------------------------------------------------------------------

  /** Per-doc state: latest accepted event-time micros + emission rev. */
  final case class Bm25DocState(us: Long, rev: Long)

  /** Stateful newest-wins postings maintenance over a document stream.
    * Input: (idCol: integral, tsCol: timestamp, textCol: string).
    * Output: `(doc_id, dl, term, tf, rev)` — the full postings refresh
    * of each accepted version (term null = the sentinel/eviction row,
    * always present; dl = 0 for an empty-tokenization version).
    */
  def streamingPostingsUpdate(docs: DataFrame, idCol: String,
      tsCol: String, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(graft.dedup.Dedup.integralIdTypes
        .contains(docs.select(col(idCol)).schema.head.dataType),
      s"streamingPostingsUpdate: id column '$idCol' must be integral " +
        "(the stateful-key contract), got " +
        docs.select(col(idCol)).schema.head.dataType)
    val tk = graft.text.TextPipeline.tokenize(col(textCol))
    // scan-stage tokenize + tf: sorted distinct terms with their
    // counts (the O(|terms|·|tokens|) per-doc count is row-local; the
    // shuffle then carries postings, not text)
    val in = docs.select(col(idCol).cast("long").as("doc_id"),
        (unix_micros(col(tsCol).cast("timestamp"))).as("us"),
        tk.as("__tk"))
      .select(col("doc_id"), col("us"),
        size(col("__tk")).cast("long").as("dl"),
        array_sort(array_distinct(col("__tk"))).as("terms"),
        col("__tk"))
      .select(col("doc_id"), col("us"), col("dl"), col("terms"),
        transform(col("terms"),
          t => size(filter(col("__tk"), x => x === t)).cast("long"))
          .as("tfs"))
    implicit val encIn:
        Encoder[(Long, Long, Long, Seq[String], Seq[Long])] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
        Encoders.scalaLong, implicitly[Encoder[Seq[String]]],
        implicitly[Encoder[Seq[Long]]])
    val encOut: Encoder[(Long, Long, String, Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
        Encoders.STRING, Encoders.scalaLong, Encoders.scalaLong)
    in.as[(Long, Long, Long, Seq[String], Seq[Long])]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (doc: Long, rows: Iterator[(Long, Long, Long, Seq[String],
            Seq[Long])], state: GroupState[Bm25DocState]) =>
          val st = state.getOption.getOrElse(Bm25DocState(Long.MinValue, 0L))
          // newest version in this batch that beats the state — the
          // max-us fold is order-free; strictly-newer-only acceptance
          // makes re-delivery and out-of-order arrival no-ops
          var best: (Long, Long, Seq[String], Seq[Long]) = null
          var bestUs = st.us
          rows.foreach { r =>
            if (r._2 > bestUs) { bestUs = r._2; best = (r._3, r._2, r._4, r._5) }
          }
          if (best == null) Iterator.empty
          else {
            val rev = st.rev + 1
            state.update(Bm25DocState(bestUs, rev))
            val (dl, _, terms, tfs) = best
            Iterator.single((doc, dl, null.asInstanceOf[String], 0L, rev)) ++
              terms.iterator.zip(tfs.iterator).map { case (t, f) =>
                (doc, dl, t, f, rev)
              }
          }
      }(Encoders.product[Bm25DocState], encOut)
      .toDF("doc_id", "dl", "term", "tf", "rev")
  }

  /** Upsert a sink of [[streamingPostingsUpdate]] emissions to the
    * SETTLED postings: per doc, keep only the highest-rev version's
    * rows. (In batch mode every doc folds once — rev is uniformly 1 —
    * and this is a no-op passthrough.)
    */
  def settlePostings(updates: DataFrame): DataFrame = {
    // a window (not a self-join against the max-rev aggregate): sink
    // views self-join with conflicting references, and the settle runs
    // over emission-sized data anyway. The trailing dedup absorbs
    // at-least-once sinks: a retried micro-batch written twice leaves
    // two copies of the max-rev version's rows, which would
    // double-count tf in a downstream probe — per (doc, rev) a
    // version's terms are distinct (and the sentinel unique), so the
    // key set identifies each row exactly once.
    val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
    updates.withColumn("__mr", max(col("rev")).over(w))
      .filter(col("rev") === col("__mr")).drop("__mr")
      .dropDuplicates("doc_id", "rev", "term")
  }

  /** Merge SETTLED update emissions into a base postings index,
    * newest-wins — the streaming twin of
    * [[graft.text.Retrieval.updateBm25Index]]: every doc with a
    * settled version (sentinel row) evicts its base postings; the
    * non-sentinel rows are its replacement (none for an
    * empty-tokenization version). Returns the merged (term, doc_id,
    * tf, dl) postings; recompute stats via
    * [[graft.text.Retrieval.bm25IndexStats]].
    */
  def mergeSettledPostings(basePostings: DataFrame,
      settled: DataFrame): DataFrame = {
    val freshIds = settled.filter(col("term").isNull)
      .select(col("doc_id")).distinct()
    val fresh = settled.filter(col("term").isNotNull)
      .select(col("term"), col("doc_id"), col("tf"), col("dl"))
    basePostings.join(freshIds, Seq("doc_id"), "left_anti")
      .select(col("term"), col("doc_id"), col("tf"), col("dl"))
      .unionByName(fresh)
  }
}
