package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.engine.TradingSession
import graft.model.{SignalBar, Time, TradeDay}

/** Structured-Streaming mode (SURVEY.md §2.10): the same TradingSession
  * state machine the batch fold uses, held as per-ticker `GroupState` in
  * `flatMapGroupsWithState`. The reference's trading loop is an
  * event-time-ordered single pass with evolving state — exactly this
  * shape.
  *
  * Ordering contract: bars must arrive in event-time order per ticker
  * *across* batches (daily bars, no late data — the reference's world,
  * custom_strats.py:56-62). Within a batch rows are sorted here. Late
  * rows older than the session's last processed bar are dropped and
  * counted, not applied retroactively.
  */
object StreamingBacktest {

  /** Mutable per-ticker streaming state: the live session plus the last
    * processed event time and emitted-trade watermarks for incremental
    * output. Java-serialized (see the encoder note below) — which is also
    * what makes the @SerialVersionUID fail-fast on old checkpoints work.
    */
  // serialVersionUID bumped when the key semantics changed from
  // epoch-millis to epoch-nanos: a checkpoint written with the old keys
  // must fail fast on restore (InvalidClassException) instead of
  // silently re-emitting the whole trade history with ns/ms-confused
  // keys
  @SerialVersionUID(2L)
  final class SessionState(val session: TradingSession) extends Serializable {
    var lastTime: Long = Long.MinValue
    var emittedTrades: Map[Long, (Double, Double, Double)] = Map.empty
  }

  // Java serialization, not Kryo: Kryo's field serializers corrupt Scala
  // mutable collections (ArrayDeque/PriorityQueue) on state-store
  // round-trips; the per-ticker state is tiny (open orders + trade log),
  // so the encoder cost is irrelevant.
  implicit private val sessionStateEnc: Encoder[SessionState] =
    Encoders.javaSerialization[SessionState]

  /** Fold a stream of signal bars into incremental TradeDay updates.
    * Emits a row per trade date whose (buy, sell, shares) triple changed
    * in this batch — retroactive mutations (stop-loss exits at past
    * dates) re-emit the affected date, so a downstream upsert sink stays
    * correct.
    */
  def foldStream(signals: Dataset[SignalBar],
      initialAmount: Double): Dataset[TradeDay] = {
    val spark = signals.sparkSession
    import spark.implicits._
    signals.groupByKey(_.ticker).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.NoTimeout) {
      (ticker: String, rows: Iterator[SignalBar], state: GroupState[SessionState]) =>
        val st = state.getOption.getOrElse(
          new SessionState(new TradingSession(initialAmount)))
        // epoch-nanos keys throughout (graft.model.Time): getTime is
        // millisecond-truncated — ms-keyed state would collide distinct
        // sub-ms trade dates and re-emit them truncated
        val batch = rows.toArray.sortBy(r => Time.epochNanos(r.date))
        batch.foreach { r =>
          if (Time.epochNanos(r.date) >= st.lastTime) {
            if (r.isBuy) st.session.buy(r.date, r.close)
            else if (r.isSell) st.session.sell(r.date, r.close)
            st.session.observeBar(r.date, r.close)
            st.lastTime = Time.epochNanos(r.date)
          }
        }
        // snapshot current trade-day triples; emit changed/new dates
        val buy = st.session.buyOrders.map { case (d, o) =>
          Time.epochNanos(d) -> o.numShares }
        val sell = st.session.sellOrders.map { case (d, e) =>
          Time.epochNanos(d) -> e.fold(_.numShares, identity)
        }
        val owned = st.session.orders.sharesOwned.map { case (d, v) =>
          Time.epochNanos(d) -> v }
        val dates = (buy.keySet ++ sell.keySet ++ owned.keySet).toVector.sorted
        val out = dates.flatMap { ns =>
          val triple = (buy.getOrElse(ns, 0.0), sell.getOrElse(ns, 0.0),
            owned.getOrElse(ns, Double.NaN))
          if (st.emittedTrades.get(ns).contains(triple)) None
          else {
            st.emittedTrades += ns -> triple
            Some(TradeDay(ticker, Time.fromEpochNanos(ns),
              buy.get(ns), sell.get(ns), owned.get(ns)))
          }
        }
        state.update(st)
        out.iterator
    }
  }

  /** Per-ticker streaming state for [[maCrossSignals]]: the rolling close
    * window (one slot per BAR, null closes occupy a slot without counting
    * — pandas `rolling(n).mean()` min_periods semantics), the previous
    * crossover flag for edge detection, and the first-buy gate.
    */
  @SerialVersionUID(1L)
  final class MaCrossState(val lagging: Int) extends Serializable {
    // ring of the last `lagging` closes by row (null close = None slot)
    var closes: Vector[Option[Double]] = Vector.empty
    var prevCross: Option[Boolean] = None
    var firstBuyNanos: Option[Long] = None
    var lastTime: Long = Long.MinValue
  }

  implicit private val maCrossStateEnc: Encoder[MaCrossState] =
    Encoders.javaSerialization[MaCrossState]

  /** Streaming twin of [[graft.strategy.MACross]].signals — the rolling
    * windows the batch strategy declares (no time bound, so Structured
    * Streaming cannot run them as window functions) re-expressed as
    * per-ticker `flatMapGroupsWithState`. Bit-exact with the batch
    * operator on in-order bars: the rolling mean sums the frame's closes
    * in ascending row order and divides once (exactly how WindowExec
    * re-aggregates a sliding frame), requires `n` non-null closes among
    * the last `n` rows (the min_periods guard), the crossover edge fires
    * on the first bar (null-safe inequality against a missing previous
    * flag), and sells are honored only strictly after the first buy —
    * StreamingSignalsSpec pins row parity with `MACross(fast, lagging)
    * .signals` across micro-batch splits. Same ordering contract as
    * [[foldStream]]: per-ticker event-time order across batches; late
    * rows are dropped, not applied retroactively.
    */
  def maCrossSignals(bars: DataFrame, fast: Int,
      lagging: Int): Dataset[SignalBar] = {
    require(fast >= 1 && lagging >= 1,
      s"window widths must be >= 1, got fast=$fast lagging=$lagging")
    val spark = bars.sparkSession
    import spark.implicits._
    val slim = bars.select(col("ticker"),
        col("date").cast("timestamp").as("date"),
        col("close").cast("double").as("close"))
      .as[(String, Timestamp, Option[Double])]
    val keep = math.max(fast, lagging)
    slim.groupByKey(_._1).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.NoTimeout) {
      (ticker: String, rows: Iterator[(String, Timestamp, Option[Double])],
          state: GroupState[MaCrossState]) =>
        val st = state.getOption.getOrElse(new MaCrossState(keep))
        // frame mean over the last n ROW slots: null iff any slot of the
        // last n is missing/None (count(c) over frame === n); the sum
        // folds ascending from 0.0, one divide — WindowExec's order
        def rollMean(n: Int): Option[Double] = {
          if (st.closes.length < n) None
          else {
            val frame = st.closes.takeRight(n)
            if (frame.exists(_.isEmpty)) None
            else Some(frame.foldLeft(0.0)((a, v) => a + v.get) / n)
          }
        }
        val batch = rows.toArray
        scala.util.Sorting.stableSort(batch,
          (a: (String, Timestamp, Option[Double]),
              b: (String, Timestamp, Option[Double])) =>
            Time.epochNanos(a._2) < Time.epochNanos(b._2))
        val out = batch.iterator.flatMap { case (_, date, close) =>
          if (Time.epochNanos(date) < st.lastTime) None
          else {
            st.lastTime = Time.epochNanos(date)
            st.closes = (st.closes :+ close).takeRight(keep)
            val cross = (for (f <- rollMean(fast); l <- rollMean(lagging))
              yield f > l).getOrElse(false)
            val edge = !st.prevCross.contains(cross)
            st.prevCross = Some(cross)
            val isBuy = cross && edge
            val isSell = !cross && edge
            if (isBuy && st.firstBuyNanos.isEmpty)
              st.firstBuyNanos = Some(Time.epochNanos(date))
            val honored = isBuy ||
              (isSell && st.firstBuyNanos.exists(Time.epochNanos(date) > _))
            if (honored)
              // a flagged row's close decodes into SignalBar.close like the
              // batch path (null close on a signal row fails there too)
              Some(SignalBar(ticker, date, close.get, isBuy, isSell))
            else None
          }
        }.toVector
        state.update(st)
        out.iterator
    }
  }

  /** Per-ticker streaming state for [[tenPercentSignals]]: the anchor
    * close (the close of the last emitted trade row), the direction of
    * that last move, and whether the unconditional first-bar buy fired.
    */
  @SerialVersionUID(1L)
  final class TenPercentState extends Serializable {
    var started: Boolean = false
    var anchorClose: Double = Double.NaN
    var lastMoveSell: Boolean = false
    var lastTime: Long = Long.MinValue
  }

  implicit private val tenPercentStateEnc: Encoder[TenPercentState] =
    Encoders.javaSerialization[TenPercentState]

  /** Streaming twin of [[graft.strategy.TenPercent]].signals. The batch
    * strategy is already a per-ticker sequential fold (the anchor is the
    * close of the last trade row — a self-referencing state machine no
    * window expresses), so the streaming form just persists that fold's
    * three scalars as `GroupState`: buy the first bar unconditionally,
    * then sell at anchor × sellMult, buy back at anchor × buyMult,
    * alternating. Null closes carry NaN exactly like the batch fold (a
    * NaN anchor silences every later comparison). Same ordering/late-row
    * contract as [[foldStream]]; parity across micro-batch splits pinned
    * by StreamingSignalsSpec.
    */
  def tenPercentSignals(bars: DataFrame, sellMult: Double = 1.05,
      buyMult: Double = 0.99): Dataset[SignalBar] = {
    val spark = bars.sparkSession
    import spark.implicits._
    val slim = bars.select(col("ticker"),
        col("date").cast("timestamp").as("date"),
        col("close").cast("double").as("close"))
      .as[(String, Timestamp, Option[Double])]
    slim.groupByKey(_._1).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.NoTimeout) {
      (ticker: String, rows: Iterator[(String, Timestamp, Option[Double])],
          state: GroupState[TenPercentState]) =>
        val st = state.getOption.getOrElse(new TenPercentState)
        val batch = rows.toArray
        scala.util.Sorting.stableSort(batch,
          (a: (String, Timestamp, Option[Double]),
              b: (String, Timestamp, Option[Double])) =>
            Time.epochNanos(a._2) < Time.epochNanos(b._2))
        val out = batch.iterator.flatMap { case (_, date, close) =>
          if (Time.epochNanos(date) < st.lastTime) None
          else {
            st.lastTime = Time.epochNanos(date)
            val v = close.getOrElse(Double.NaN)
            if (!st.started) {
              st.started = true
              st.anchorClose = v
              st.lastMoveSell = false
              Some(SignalBar(ticker, date, v, isBuy = true, isSell = false))
            } else if (v >= st.anchorClose * sellMult && !st.lastMoveSell) {
              st.anchorClose = v
              st.lastMoveSell = true
              Some(SignalBar(ticker, date, v, isBuy = false, isSell = true))
            } else if (v <= st.anchorClose * buyMult && st.lastMoveSell) {
              st.anchorClose = v
              st.lastMoveSell = false
              Some(SignalBar(ticker, date, v, isBuy = true, isSell = false))
            } else None
          }
        }.toVector
        state.update(st)
        out.iterator
    }
  }

  /** Watermarked sliding-window aggregation over an event stream — the
    * streaming analogue of the rolling-indicator family (SURVEY.md §2.6):
    * per-window count/sum/min/max of `value`.
    */
  def windowedIndicator(events: Dataset[_], window_ : String, slide: String,
      watermark: String): Dataset[_] = {
    events.toDF()
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_, slide), col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"),
        min(col("value")).as("min_value"), max(col("value")).as("max_value"))
  }
}
