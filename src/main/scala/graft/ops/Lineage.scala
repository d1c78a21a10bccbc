package graft.ops

import org.apache.spark.sql.DataFrame

/** The ONE lineage-cut policy shared by every iterative/expensive
  * operator (PageRank rounds, connected components, BM25 postings, HLL
  * registers, LM/NB count tables): reliable `checkpoint` when the
  * session has a checkpoint dir (the cluster path — survives executor
  * loss), `localCheckpoint` otherwise (local/test path). One
  * definition so a future policy change (storage level, eagerness)
  * cannot silently diverge between operators.
  */
object Lineage {

  def cut(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint(eager = true)
    else df.localCheckpoint(eager = true)
}
