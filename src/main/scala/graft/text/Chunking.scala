package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sliding-window document chunking — the retrieval-corpus front-end
  * (RAG indexing): each document is cut into word windows of
  * `chunkWords` words advancing by `strideWords`, so consecutive
  * chunks overlap by `chunkWords - strideWords` words and no passage
  * straddles a boundary unseen. This is the windowing used when a
  * corpus is embedded for similarity search (a chunk, not a whole
  * document, is the retrieval unit), complementing [[graft.ops.Packing]]
  * (disjoint packing for PRETRAINING) with the overlapping layout
  * retrieval needs.
  *
  * Window rule (the tokenizer-overflow convention): starts are
  * 0, stride, 2·stride, …; each chunk covers words
  * `[start, min(start + chunkWords, n))`; iteration stops WITH the
  * first chunk whose `start + chunkWords >= n` — full coverage, and no
  * trailing chunk that is a pure suffix of its predecessor. An empty
  * document yields zero chunks.
  *
  * Scale: the whole operator is row-local — tokenize, a bounded
  * per-document explode (≈ n/stride chunk rows), and slice/concat on
  * the token array. No shuffle, no state; it composes with any
  * downstream embed/index stage which will shuffle on its own keys.
  * All emitted numbers are integer arithmetic — bit-stable on any
  * partitioning.
  */
object Chunking {

  /** Chunk `textCol` into overlapping word windows. Output:
    * (idCol, chunk_id, start_word, n_words, chunk_text) — `chunk_id`
    * 0-based per document, `start_word` the 0-based word offset,
    * `chunk_text` the single-spaced window.
    */
  def slidingChunks(df: DataFrame, idCol: String, textCol: String,
      chunkWords: Int, strideWords: Int): DataFrame = {
    require(chunkWords >= 1, s"chunkWords must be >= 1, got $chunkWords")
    require(strideWords >= 1 && strideWords <= chunkWords,
      s"strideWords must be in [1, chunkWords], got $strideWords " +
        s"(a stride above the width would skip words)")
    val toks = df.select(col(idCol),
      TextPipeline.tokenize(col(textCol)).as("__w"))
      .withColumn("__n", size(col("__w")).cast("long"))
    // number of chunks: 1 if n <= chunk else 1 + ceil((n-chunk)/stride);
    // 0-word docs emit none. Integer arithmetic end to end.
    // Column `/` is double division — floor+cast keeps the count an
    // exact integer (word counts sit far below 2^53)
    val k = when(col("__n") === 0L, lit(0L))
      .when(col("__n") <= chunkWords, lit(1L))
      .otherwise(lit(1L) + floor(
        (col("__n") - chunkWords + strideWords - 1L) /
          strideWords.toDouble).cast("long"))
    toks.withColumn("__k", k)
      .filter(col("__k") > 0L)
      .select(col(idCol), col("__w"), col("__n"),
        posexplode(sequence(lit(0L), col("__k") - 1L))
          .as(Seq("__i", "__c")))
      .select(col(idCol),
        col("__c").cast("long").as("chunk_id"),
        (col("__c") * strideWords).as("start_word"),
        least(col("__c") * strideWords + chunkWords, col("__n"))
          .minus(col("__c") * strideWords).as("n_words"),
        concat_ws(" ", slice(col("__w"),
          (col("__c") * strideWords + 1L).cast("int"),
          least(lit(chunkWords.toLong),
            col("__n") - col("__c") * strideWords).cast("int")))
          .as("chunk_text"))
  }
}
