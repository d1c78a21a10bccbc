package graft.model

import java.sql.Timestamp

/** Core data model of the engine (see SURVEY.md §1.1).
  *
  * The reference keeps OHLCV bars in a pandas DataFrame with a
  * DatetimeIndex (reference strats.py:527-543); here the index becomes an
  * ordinary `date` column and multi-ticker data is one long Dataset with a
  * `ticker` column — the idiomatic Spark layout (partitionable by ticker,
  * window-orderable by date).
  */
final case class Bar(
    ticker: String,
    date: Timestamp,
    open: Option[Double],
    high: Option[Double],
    low: Option[Double],
    close: Option[Double],
    volume: Option[Long])

/** A bar restricted to what the trading fold needs, with precomputed
  * vectorized signal flags (reference custom_strats.py:45-48).
  */
final case class SignalBar(
    ticker: String,
    date: Timestamp,
    close: Double,
    isBuy: Boolean,
    isSell: Boolean)

/** One order row, mirroring the reference's order table projection
  * (reference strats.py:226-245): open orders have null end/profit.
  * `seq` preserves the reference's output order (completed then open,
  * FIFO) for deterministic downstream comparison.
  */
final case class OrderRow(
    ticker: String,
    seq: Int,
    num_shares: Double,
    start_time: Timestamp,
    start_amount: Double,
    filled: Boolean,
    end_time: Option[Timestamp],
    end_amount: Option[Double],
    profit: Option[Double])

/** Per-date trade outcome emitted by the fold: shares bought/sold that day
  * and the running share count after the day's trades (reference
  * strats.py:557-565 carries exactly this information into the daily
  * frame; the pandas "object column" trick collapses to plain doubles,
  * SURVEY.md §1.2).
  */
final case class TradeDay(
    ticker: String,
    date: Timestamp,
    buy_shares: Option[Double],
    sell_shares: Option[Double],
    shares_owned: Option[Double])

/** Output of the per-ticker backtest fold before re-joining the daily
  * frame.
  */
final case class FoldOut(
    orders: Seq[OrderRow],
    trades: Seq[TradeDay])

/** The ~19 scalar portfolio metrics (reference strats.py:657-789). */
final case class MetricsRow(
    ticker: String,
    start_time: Timestamp,
    end_time: Timestamp,
    start_amount: Double,
    end_amount: Double,
    average_hold_time: String,
    average_losses: Option[Double],
    average_profits: Option[Double],
    biggest_loss: Option[Double],
    biggest_win: Option[Double],
    cagr_pct: Double,
    max_drawdown_pct: Double,
    average_drawdown_pct: Double,
    net_profit: Double,
    profit_factor: Double,
    risk_reward: Option[Double],
    sharpe_ratio: Double,
    volatility_annualized: Double,
    beta: Double,
    alpha: Double,
    r_squared: Double)
