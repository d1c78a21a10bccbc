package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}

/** Streaming twins of the bounded-sample sketch tier (round-13 verdict
  * #5): per-group bottom-k quantile samples
  * ([[graft.sketch.SampleQuantiles.groupedQuantiles]]) and per-group
  * priority sampling
  * ([[graft.ops.Sampling.prioritySamplePerGroup]]) as stateful
  * streaming operators.
  *
  * Both sketches are BOUNDED-STATE AND ORDER-FREE by construction —
  * membership is a pure function of the pinned id hash, so arrival
  * order, batching, and out-of-order delivery cannot change the settled
  * result and no watermark/event-time machinery is needed (contrast
  * [[StreamingScd2]], whose versions depend on time order). Each group
  * carries ≤ k (quantiles) / ≤ k+1 (priority) entries of state; the
  * hash/priority arithmetic runs in the PROJECTION (the same Column
  * expressions as the batch operators), so the stateful fold merges
  * plain longs/doubles and is trivially bit-equal to the batch
  * aggregation.
  *
  * Emission contract: a group re-emits its full refreshed snapshot
  * (with a monotone `rev`) whenever a micro-batch CHANGES its sketch —
  * sinks upsert by (group, q) / (group, id) keeping the highest rev;
  * unchanged groups stay silent. In batch mode every group folds once
  * (rev = 1) and the output equals the batch operator row-for-row —
  * the DuckDB-oracle-checkable surface (the gate rows
  * sc_group_quantiles_stream_batch / ts_group_priority_stream_batch
  * are pinned by the SAME oracle SQL as the batch operators).
  *
  * Group keys may be long or string (rejected by name otherwise — the
  * GraphOps fast-path gating contract); id/key columns must be
  * integral (the pinned xxhash64-of-long domain of
  * [[graft.sketch.Kmv]]).
  */
object StreamingSketches {

  /** Bottom-k sample state: the ≤ k smallest distinct (flipped hash,
    * value) pairs in (h, v) order — the
    * [[graft.functions.SmallestKHashValsAgg]] buffer, plus the
    * emission revision.
    */
  final case class BkState(hs: Array[Long], vs: Array[Double], rev: Long)

  /** Priority-sample state: the top-(k+1) (q desc, id asc) entries. */
  final case class PsState(ids: Array[Long], ws: Array[Long],
      qs: Array[Double], rev: Long)

  /** The SmallestKHashValsAgg reduce step — identical lt/equality
    * (IEEE ==, so -0.0 collapses with 0.0 exactly like the UDAF's
    * case-class equality).
    */
  private def bkInsert(b: Vector[(Long, Double)], h: Long, v: Double,
      k: Int): Vector[(Long, Double)] = {
    def lt(a: (Long, Double), c: (Long, Double)): Boolean =
      a._1 < c._1 || (a._1 == c._1 && a._2 < c._2)
    val a = (h, v)
    if (b.size >= k && !lt(a, b.last)) b
    else {
      val (lo, hi) = b.span(lt(_, a))
      if (hi.nonEmpty && hi.head._1 == h && hi.head._2 == v) b
      else ((lo :+ a) ++ hi).take(k)
    }
  }

  private def requireGroupable(df: DataFrame, grp: Column): DataType = {
    val dt = df.select(grp).schema.head.dataType
    require(dt == LongType || dt == StringType,
      s"streaming sketch group key must be long or string (the state " +
        s"key), got $dt — cast or dictionary-encode it first")
    dt
  }

  private def requireIntegral(df: DataFrame, c: Column,
      what: String): Unit = {
    val dt = df.select(c).schema.head.dataType
    require(graft.dedup.Dedup.integralIdTypes.contains(dt),
      s"StreamingSketches: $what must be integral (the pinned " +
        s"xxhash64-of-long domain), got $dt")
  }

  // ------------------------------------------------------- quantiles

  /** Streaming per-group bottom-k quantiles. Output columns
    * `(grp, q, n_sample, est, rev)`; drop `rev` to compare against
    * [[graft.sketch.SampleQuantiles.groupedQuantiles]] (batch mode is
    * row-for-row equal).
    */
  def streamingGroupedQuantiles(df: DataFrame, grp: Column, key: Column,
      value: Column, k: Int, probs: Seq[Double]): DataFrame = {
    require(k >= 16 && k <= 65536, s"k must be in [16, 65536], got $k")
    require(probs.nonEmpty && probs.forall(q => q >= 0.0 && q <= 1.0),
      s"probs must be in [0, 1], got $probs")
    requireIntegral(df, key, "the sample key column")
    val gt = requireGroupable(df, grp)
    val in = df.filter(grp.isNotNull && key.isNotNull &&
        value.isNotNull && !isnan(value))
      .select(grp.as("grp"),
        graft.sketch.Kmv.flippedHash(key).as("h"),
        value.cast("double").as("v"))
    gt match {
      case LongType => quantileRows[Long](in, k, probs)(Encoders.scalaLong)
      case _ => quantileRows[String](in, k, probs)(Encoders.STRING)
    }
  }

  private def quantileRows[G](in: DataFrame, k: Int, probs: Seq[Double])(
      implicit encG: Encoder[G]): DataFrame = {
    implicit val encIn: Encoder[(G, Long, Double)] =
      Encoders.tuple(encG, Encoders.scalaLong, Encoders.scalaDouble)
    val encOut: Encoder[(G, Double, Long, Double, Long)] =
      Encoders.tuple(encG, Encoders.scalaDouble, Encoders.scalaLong,
        Encoders.scalaDouble, Encoders.scalaLong)
    in.toDF("_1", "_2", "_3").as[(G, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (g: G, rows: Iterator[(G, Long, Double)],
            state: GroupState[BkState]) =>
          val st = state.getOption.getOrElse(
            BkState(Array.emptyLongArray, Array.emptyDoubleArray, 0L))
          var buf = st.hs.indices.map(i => (st.hs(i), st.vs(i))).toVector
          rows.foreach { case (_, h, v) => buf = bkInsert(buf, h, v, k) }
          val changed = buf.size != st.hs.length ||
            buf.indices.exists(i =>
              buf(i)._1 != st.hs(i) || buf(i)._2 != st.vs(i))
          if (!changed && state.exists) Iterator.empty
          else {
            val rev = st.rev + 1
            state.update(BkState(buf.map(_._1).toArray,
              buf.map(_._2).toArray, rev))
            // the batch read: values ascending, nearest-rank-floor
            val vals = buf.map(_._2).toArray
            java.util.Arrays.sort(vals)
            val n = vals.length
            probs.iterator.map { q =>
              val est = vals(math.floor(q * (n - 1).toDouble).toInt)
              (g, q, n.toLong, est, rev)
            }
          }
      }(Encoders.product[BkState], encOut)
      .toDF("grp", "q", "n_sample", "est", "rev")
  }

  // ------------------------------------------------- priority sample

  /** Streaming per-group Duffield–Lund–Thorup priority sampling.
    * Output columns `(grpCol, idCol, weightCol, priority, est_w, rev)`
    * with the weight surfaced as long (the pinned-hash id domain);
    * drop `rev` to compare against
    * [[graft.ops.Sampling.prioritySamplePerGroup]] (batch mode is
    * row-for-row equal on long-weight inputs).
    */
  def streamingGroupPrioritySample(df: DataFrame, grpCol: String,
      idCol: String, weightCol: String, k: Int): DataFrame = {
    require(k >= 1 && k <= 1000000, s"k must be in [1, 1e6], got $k")
    requireIntegral(df, col(idCol), s"id column '$idCol'")
    requireIntegral(df, col(weightCol), s"weight column '$weightCol' " +
      "(the streaming state holds longs; pre-scale fractional weights)")
    val gt = requireGroupable(df, col(grpCol))
    import graft.sketch.Kmv
    val ud = Kmv.unsignedDouble(Kmv.flippedHash(col(idCol)))
    val q = col(weightCol).cast("double") * lit(Kmv.TwoPow64) /
      (ud + lit(1.0))
    val in = df.filter(col(grpCol).isNotNull && col(idCol).isNotNull &&
        col(weightCol).isNotNull && col(weightCol) > 0)
      .select(col(grpCol).as("grp"), col(idCol).cast("long").as("id"),
        col(weightCol).cast("long").as("w"), q.as("q"))
    val out = gt match {
      case LongType => priorityRows[Long](in, k)(Encoders.scalaLong)
      case _ => priorityRows[String](in, k)(Encoders.STRING)
    }
    out.toDF(grpCol, idCol, weightCol, "priority", "est_w", "rev")
  }

  private def priorityRows[G](in: DataFrame, k: Int)(
      implicit encG: Encoder[G]): DataFrame = {
    implicit val encIn: Encoder[(G, Long, Long, Double)] =
      Encoders.tuple(encG, Encoders.scalaLong, Encoders.scalaLong,
        Encoders.scalaDouble)
    // Encoders.tuple caps at 5 fields: nest (est_w, rev) in a pair and
    // flatten below
    val encOut: Encoder[(G, Long, Long, Double, (Double, Long))] =
      Encoders.tuple(encG, Encoders.scalaLong, Encoders.scalaLong,
        Encoders.scalaDouble,
        Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong))
    // (q desc, id asc) — the batch rank's total order (ids unique)
    val ord = new Ordering[(Long, Long, Double)] {
      def compare(a: (Long, Long, Double), b: (Long, Long, Double)): Int = {
        val c = java.lang.Double.compare(b._3, a._3)
        if (c != 0) c else java.lang.Long.compare(a._1, b._1)
      }
    }
    in.toDF("_1", "_2", "_3", "_4").as[(G, Long, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (g: G, rows: Iterator[(G, Long, Long, Double)],
            state: GroupState[PsState]) =>
          val st = state.getOption.getOrElse(PsState(
            Array.emptyLongArray, Array.emptyLongArray,
            Array.emptyDoubleArray, 0L))
          // .distinct mirrors bkInsert's duplicate check: a record
          // re-delivered across micro-batches (at-least-once source)
          // or duplicated within one must not occupy two top-(k+1)
          // slots — that would evict a genuine item and skew tau.
          // q is a pure function of (id, w), so distinct on the triple
          // is exactly the (id, q) identity.
          val merged = (st.ids.indices
            .map(i => (st.ids(i), st.ws(i), st.qs(i))) ++
            rows.map(r => (r._2, r._3, r._4)))
            .distinct.sorted(ord).take(k + 1).toArray
          val changed = merged.length != st.ids.length ||
            merged.indices.exists(i => merged(i)._1 != st.ids(i) ||
              merged(i)._3 != st.qs(i))
          if (!changed && state.exists) Iterator.empty
          else {
            val rev = st.rev + 1
            state.update(PsState(merged.map(_._1), merged.map(_._2),
              merged.map(_._3), rev))
            // tau = the (k+1)-th priority of the population (top-(k+1)
            // sets merge exactly); est_w = max(w, tau), w when exact
            val tau = if (merged.length == k + 1)
              Some(merged.last._3) else None
            merged.iterator.take(k).map { case (id, w, p) =>
              val est = tau.map(t => math.max(w.toDouble, t))
                .getOrElse(w.toDouble)
              (g, id, w, p, (est, rev))
            }
          }
      }(Encoders.product[PsState], encOut)
      .toDF("grp", "id", "w", "priority", "tail")
      .select(col("grp"), col("id"), col("w"), col("priority"),
        col("tail")("_1").as("est_w"), col("tail")("_2").as("rev"))
  }
}
