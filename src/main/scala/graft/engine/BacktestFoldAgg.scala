package graft.engine

import java.sql.Timestamp

import org.apache.spark.sql.{Encoder, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

import graft.model.{FoldOut, SignalBar, Time}

/** One input row of the SQL-callable backtest fold: a signal bar plus the
  * starting cash (constant within a group — passed as a literal column so
  * plain SQL can parameterize the fold without a separate registration per
  * amount).
  */
final case class FoldInput(ticker: String, date: Timestamp, close: Double,
    isBuy: Boolean, isSell: Boolean, initialAmount: Double)

/** Aggregation buffer: the collected (unsorted) signal bars for the group
  * plus the captured initial amount (NaN until the first row lands).
  */
final case class FoldBuf(initialAmount: Double, rows: Seq[SignalBar])

/** The per-ticker backtest fold as a SQL aggregate (SURVEY.md §2.11 /
  * §7.3 optional item): `backtest_fold(ticker, date, close, is_buy,
  * is_sell, 10000.0)` under `GROUP BY ticker` runs the same
  * TradingSession state machine as the typed `groupByKey.mapGroups` path
  * (BacktestEngine.foldSignals) and returns the full FoldOut struct —
  * `orders` (the completed+open order table) and `trades` (per-date
  * share movements) as nested arrays the caller can explode.
  *
  * Under `functions.udaf` Spark plans this as a ScalaAggregator, i.e. a
  * TypedImperativeAggregate: partial buffers accumulate signal rows per
  * task and only the group's signal set (sparse — O(#trades), not
  * O(#bars)) crosses the exchange. The fold itself is order-sensitive so
  * no work happens until `finish`, which sorts by full-precision epoch
  * nanos (graft.model.Time, same comparator as the typed path) and drives
  * BacktestEngine.runSession — one shared implementation for the typed,
  * streaming, optimizer, and SQL surfaces.
  *
  * Buffers are built by prepend (List cons, O(1) per row within a task;
  * deserialized partials only ever concatenate), so accumulation is
  * linear in group size.
  */
class BacktestFoldAgg extends Aggregator[FoldInput, FoldBuf, FoldOut] {

  def zero: FoldBuf = FoldBuf(Double.NaN, Nil)

  // The starting cash must be constant within a group (it is passed as a
  // literal column so plain SQL can parameterize the fold). NaN is the
  // "unset" sentinel; differing non-NaN amounts ERROR rather than
  // resolving by partial-merge order — a mis-parameterized SQL call must
  // fail loudly, not return an order-dependent fold.
  def reduce(b: FoldBuf, in: FoldInput): FoldBuf = {
    require(b.initialAmount.isNaN || b.initialAmount == in.initialAmount,
      s"backtest_fold: initial_amount must be constant per group " +
        s"(${b.initialAmount} vs ${in.initialAmount})")
    FoldBuf(in.initialAmount,
      SignalBar(in.ticker, in.date, in.close, in.isBuy, in.isSell) +: b.rows)
  }

  def merge(l: FoldBuf, r: FoldBuf): FoldBuf = {
    require(l.initialAmount.isNaN || r.initialAmount.isNaN ||
        l.initialAmount == r.initialAmount,
      s"backtest_fold: initial_amount must be constant per group " +
        s"(${l.initialAmount} vs ${r.initialAmount})")
    FoldBuf(
      if (l.initialAmount.isNaN) r.initialAmount else l.initialAmount,
      if (l.rows.isEmpty) r.rows else if (r.rows.isEmpty) l.rows
      else l.rows ++ r.rows)
  }

  def finish(b: FoldBuf): FoldOut = {
    if (b.rows.isEmpty) return FoldOut(Nil, Nil)
    val rows = b.rows.toArray
    scala.util.Sorting.stableSort(rows, (a: SignalBar, c: SignalBar) =>
      Time.epochNanos(a.date) < Time.epochNanos(c.date))
    BacktestEngine.runSession(rows.head.ticker, rows, b.initialAmount)
  }

  def bufferEncoder: Encoder[FoldBuf] = ExpressionEncoder[FoldBuf]()
  def outputEncoder: Encoder[FoldOut] = ExpressionEncoder[FoldOut]()
}

object BacktestFoldAgg {
  /** Register `backtest_fold` on a live session's UDF registry (udaf-based
    * aggregates go through UDFRegistration, not the expression-builder
    * path GraftExtensions uses for scalar functions).
    */
  def register(spark: SparkSession): Unit =
    spark.udf.register("backtest_fold",
      udaf(new BacktestFoldAgg(), ExpressionEncoder[FoldInput]()))
}
