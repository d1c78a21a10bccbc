package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Concat-and-chunk sequence packing — the standard LLM-pretraining
  * layout: documents are laid end-to-end in a deterministic order and
  * the token stream is cut into fixed-size chunks (context windows).
  * A document with token interval `[start, end)` in its shard's stream
  * therefore occupies chunks `floor(start/maxTokens) ..
  * floor((end-1)/maxTokens)`.
  *
  * Scale: the stream is sharded (`pmod(id, nShards)`) so the cumulative
  * sum — the only stateful step — is an independent per-shard window:
  * one shuffle on the shard key, shards fill the cluster, and a chunk id
  * is the pair (shard, chunk). No driver state, no global sequence.
  */
object Packing {

  /** Assign every document its token interval and chunk span.
    * Output adds: `shard`, `start_tok` (offset of the doc's first token
    * in its shard stream), `first_chunk`, `last_chunk`, `n_chunks`
    * (chunks the doc touches; 0-token docs touch none → n_chunks 0 and
    * first/last on the boundary it sits at).
    */
  def packChunks(df: DataFrame, idCol: String, tokenCol: String,
      maxTokens: Long, nShards: Int): DataFrame = {
    require(maxTokens > 0 && nShards > 0, "maxTokens and nShards must be > 0")
    val shard = pmod(col(idCol), lit(nShards.toLong))
    val w = Window.partitionBy("shard").orderBy(col(idCol))
    val endTok = sum(col(tokenCol)).over(w)
    val startTok = endTok - col(tokenCol)
    df.withColumn("shard", shard)
      .withColumn("start_tok", startTok)
      .withColumn("first_chunk", floor(startTok / maxTokens))
      .withColumn("last_chunk",
        when(col(tokenCol) > 0, floor((endTok - 1) / maxTokens))
          .otherwise(floor(startTok / maxTokens)))
      .withColumn("n_chunks",
        when(col(tokenCol) > 0,
          col("last_chunk") - col("first_chunk") + 1).otherwise(lit(0L)))
  }
}
