package graft.streaming

import org.apache.spark.sql.DataFrame

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
}
