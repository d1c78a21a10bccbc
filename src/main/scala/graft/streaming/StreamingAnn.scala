package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming maintenance of the IVFADC vector index — the ANN
  * analogue of [[StreamingRetrieval.streamingPostingsUpdate]]: a
  * stream of re-ingested/edited embeddings keeps the (id, cell,
  * codes) table current, newest-wins by EVENT TIME, under FROZEN
  * quantizer models (the production continuously-updated-vector-DB
  * shape: assignment and residual encoding are pure scan-stage
  * projections of the frozen models, so only 8-byte codes + a cell id
  * ever reach the state operator — never a raw vector).
  *
  * Same settled-order-freedom contract as the BM25 twin: per id the
  * state keeps only the max-event-time version, so arbitrary
  * batching, re-delivery (same (id, ts) again → silent no-op) and
  * out-of-order arrival (older after newer → ignored) all settle to
  * the same index. Each accepted version emits one (id, cell, codes)
  * refresh with a monotone `rev`; sinks upsert by id keeping the
  * highest rev ([[settleIndex]]) and fold into a base index with
  * [[mergeSettledIndex]] — with frozen models the result is
  * row-for-row [[graft.sim.Pq.updateIvfAdcIndex]] (and therefore a
  * fresh rebuild over the merged corpus). Per-id state is two longs;
  * like the SCD2 open version it has no TTL (newest-wins must
  * recognize staleness however late the next version arrives), so
  * state grows with re-ingested-id cardinality.
  *
  * A (id, ts) pair carrying two DIFFERENT vectors is a precondition
  * violation (first arrival wins — the only arrival-order-dependent
  * case).
  */
object StreamingAnn {

  /** Per-id state: latest accepted event-time micros + emission rev. */
  final case class AnnState(us: Long, rev: Long)

  /** Stateful newest-wins index maintenance over an embedding stream.
    * Input: (idCol: integral, tsCol: timestamp, vecCol:
    * array&lt;double&gt;). Output: `(vec_id, cell, codes, rev)` — one
    * row per accepted version.
    */
  def streamingIndexUpdate(vecs: DataFrame, idCol: String,
      tsCol: String, vecCol: String,
      centroids: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]]): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    require(graft.dedup.Dedup.integralIdTypes
        .contains(vecs.select(col(idCol)).schema.head.dataType),
      s"streamingIndexUpdate: id column '$idCol' must be integral " +
        "(the stateful-key contract), got " +
        vecs.select(col(idCol)).schema.head.dataType)
    // scan-stage assign + residual-encode with the frozen models; the
    // shuffle then carries (id, us, cell, codes) — ≤ 16 B of payload
    val in = graft.sim.Pq.ivfAdcIndex(
        vecs.select(col(idCol).cast("long").as("__vid"),
          unix_micros(col(tsCol).cast("timestamp")).as("__us"),
          col(vecCol)),
        "__vid", vecCol, centroids, codebooks, keep = Seq("__us"))
      .select(col("__vid"), col("__us"), col("cell"), col("codes"))
    implicit val encIn: Encoder[(Long, Long, Int, Seq[Int])] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
        Encoders.scalaInt, implicitly[Encoder[Seq[Int]]])
    val encOut: Encoder[(Long, Int, Seq[Int], Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaInt,
        implicitly[Encoder[Seq[Int]]], Encoders.scalaLong)
    in.as[(Long, Long, Int, Seq[Int])]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (id: Long, rows: Iterator[(Long, Long, Int, Seq[Int])],
            state: GroupState[AnnState]) =>
          val st = state.getOption.getOrElse(AnnState(Long.MinValue, 0L))
          var best: (Int, Seq[Int]) = null
          var bestUs = st.us
          rows.foreach { r =>
            if (r._2 > bestUs) { bestUs = r._2; best = (r._3, r._4) }
          }
          if (best == null) Iterator.empty
          else {
            val rev = st.rev + 1
            state.update(AnnState(bestUs, rev))
            Iterator.single((id, best._1, best._2, rev))
          }
      }(Encoders.product[AnnState], encOut)
      .toDF("vec_id", "cell", "codes", "rev")
  }

  /** Upsert a sink of [[streamingIndexUpdate]] emissions to the
    * settled rows: per id, the highest-rev version (a window, not a
    * self-join — sink views self-join with conflicting references).
    */
  def settleIndex(updates: DataFrame): DataFrame = {
    // the trailing dedup absorbs at-least-once sinks: a retried
    // micro-batch written twice leaves two copies of the max-rev row,
    // which would duplicate ANN candidates downstream. An emission is
    // one row per (id, rev), so that pair is the exact key; payloads
    // of duplicates are identical by construction.
    val w = org.apache.spark.sql.expressions.Window.partitionBy("vec_id")
    updates.withColumn("__mr", max(col("rev")).over(w))
      .filter(col("rev") === col("__mr")).drop("__mr")
      .dropDuplicates("vec_id", "rev")
  }

  /** Merge settled emissions into a base (id, cell, codes) index,
    * newest-wins — ≡ [[graft.sim.Pq.updateIvfAdcIndex]] under frozen
    * models. `idCol` names the base index's id column.
    */
  def mergeSettledIndex(baseIndex: DataFrame, idCol: String,
      settled: DataFrame): DataFrame = {
    val fresh = settled.select(col("vec_id").as(idCol), col("cell"),
      col("codes"))
    baseIndex.join(fresh.select(col(idCol)).distinct(), Seq(idCol),
        "left_anti")
      .select(col(idCol), col("cell"), col("codes"))
      .unionByName(fresh)
  }
}
