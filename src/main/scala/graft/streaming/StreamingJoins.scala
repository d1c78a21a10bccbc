package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.model.Time

/** Streaming point-in-time (as-of) enrichment — the continuous analogue
  * of `graft.ops.Joins.asofJoin`: a stream of probe rows ("trades") is
  * enriched with the latest reference row ("quote") at-or-before its
  * event time, per key.
  *
  * Spark's built-in stream-stream joins cannot express "latest earlier
  * row" (they are equi/range predicates over buffered windows), so this
  * is a `flatMapGroupsWithState` fold: per key the state holds a
  * BOUNDED, time-ordered buffer of recent quotes (`maxQuotes`), new
  * batch rows are applied in event-time order (quotes before trades at
  * equal timestamps — the same inclusive tie rule as the batch
  * operator), and each trade emits its floor-match from the buffer.
  *
  * Out-of-order tolerance is the buffer depth: a trade older than the
  * oldest retained quote joins null (documented trade-off — unbounded
  * retention is unsound on an infinite stream). With each key's rows in
  * event-time order across batches the output equals the batch
  * asofJoin exactly (StreamingJoinsSpec pins this parity).
  */
object StreamingJoins {

  /** One input row: a quote (isQuote) carrying `value`, or a probe row
    * carrying an opaque id. One stream, two roles — union upstream.
    */
  final case class TickRow(key: String, ts: Timestamp, isQuote: Boolean,
      value: Double, id: Long)

  final case class EnrichedRow(key: String, ts: Timestamp, id: Long,
      quote: Option[Double], quote_ts: Option[Timestamp])

  /** Per-key state: recent quotes as parallel arrays sorted by
    * epoch-nanos time, capped at `maxQuotes` (oldest evicted).
    */
  @SerialVersionUID(1L)
  final class QuoteBuffer(val maxQuotes: Int) extends Serializable {
    var times: Array[Long] = Array.emptyLongArray
    var values: Array[Double] = Array.emptyDoubleArray

    def insert(tNs: Long, v: Double): Unit = {
      val pos = {
        val i = java.util.Arrays.binarySearch(times, tNs)
        if (i >= 0) i + 1 else -(i + 1)
      }
      val nt = new Array[Long](times.length + 1)
      val nv = new Array[Double](values.length + 1)
      System.arraycopy(times, 0, nt, 0, pos)
      System.arraycopy(values, 0, nv, 0, pos)
      nt(pos) = tNs; nv(pos) = v
      System.arraycopy(times, pos, nt, pos + 1, times.length - pos)
      System.arraycopy(values, pos, nv, pos + 1, values.length - pos)
      val drop = math.max(0, nt.length - maxQuotes)
      times = java.util.Arrays.copyOfRange(nt, drop, nt.length)
      values = java.util.Arrays.copyOfRange(nv, drop, nv.length)
    }

    /** Index of the latest quote with time <= tNs, or -1. */
    def floorIndex(tNs: Long): Int = {
      val i = java.util.Arrays.binarySearch(times, tNs)
      if (i >= 0) {
        // step to the LAST equal timestamp (inclusive ties)
        var j = i
        while (j + 1 < times.length && times(j + 1) == tNs) j += 1
        j
      } else -(i + 1) - 1
    }
  }

  implicit private val bufEnc: Encoder[QuoteBuffer] =
    Encoders.javaSerialization[QuoteBuffer]

  /** Enrich the probe rows of a mixed quote/probe stream. `maxQuotes`
    * bounds per-key state (out-of-order join horizon).
    */
  def asofStream(ticks: Dataset[TickRow], maxQuotes: Int = 1024): Dataset[EnrichedRow] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks.groupByKey(_.key).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.NoTimeout) {
      (key: String, rows: Iterator[TickRow], state: GroupState[QuoteBuffer]) =>
        val buf = state.getOption.getOrElse(new QuoteBuffer(maxQuotes))
        // event-time order within the batch; quotes before probes at the
        // same timestamp (inclusive as-of, matching Joins.asofJoin)
        val batch = rows.toArray.sortBy(r =>
          (Time.epochNanos(r.ts), if (r.isQuote) 0 else 1))
        val out = Vector.newBuilder[EnrichedRow]
        batch.foreach { r =>
          val ns = Time.epochNanos(r.ts)
          if (r.isQuote) buf.insert(ns, r.value)
          else {
            val i = buf.floorIndex(ns)
            if (i >= 0)
              out += EnrichedRow(key, r.ts, r.id, Some(buf.values(i)),
                Some(Time.fromEpochNanos(buf.times(i))))
            else out += EnrichedRow(key, r.ts, r.id, None, None)
          }
        }
        state.update(buf)
        out.result().iterator
    }
  }
}
