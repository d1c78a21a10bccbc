package graft.api

import org.apache.spark.sql.DataFrame

import graft.analytics.Metrics
import graft.engine.{BacktestEngine, BacktestResult}
import graft.opt.{GridSearch, LocalStrategy}
import graft.strategy.Strategy

/** Ergonomic facade mirroring the reference's public API
  * (`Backtest(initial_amount, ticker, strat, input_data=...).run()` /
  * `.metrics()` / `.optimize(...)`, reference strats.py:489-655) so a
  * user of the reference can switch with the same call shapes — while
  * everything underneath is the distributed engine. `bars` is the long
  * multi-ticker frame; single-ticker use is just a one-ticker frame.
  */
final class Backtest(
    initialAmount: Double,
    strategy: Strategy,
    bars: DataFrame,
    riskFreeRate: Double = 0.0,
    index: Option[DataFrame] = None) {

  private var result: Option[BacktestResult] = None

  /** Run the backtest; returns the daily frame (reference run(),
    * strats.py:581-601), with the index column appended when configured.
    */
  def run(): DataFrame = {
    val res = BacktestEngine.run(bars, strategy, initialAmount)
    val daily = index match {
      case Some(idx) => res.daily.transform(BacktestEngine.joinIndex(_, idx))
      case None => res.daily
    }
    result = Some(BacktestResult(daily, res.orders))
    daily
  }

  /** Final net worth per ticker — the reference's `run().net_worth[-1]`. */
  def finalNetWorth(): DataFrame = {
    ensureRun()
    BacktestEngine.finalNetWorth(result.get)
  }

  /** Orders table (reference Order_Manager.to_df, strats.py:226-245). */
  def orders(): DataFrame = { ensureRun(); result.get.orders.toDF() }

  /** The 19-metric stats table (reference metrics(), strats.py:657-789).
    * Requires an index frame for beta/alpha/R² — without one those
    * columns are null.
    */
  def metrics(): DataFrame = {
    ensureRun()
    val daily = if (index.isDefined) result.get.daily
      else result.get.daily.withColumn("SP500",
        org.apache.spark.sql.functions.lit(null).cast("double"))
    Metrics.compute(daily, result.get.orders, initialAmount, riskFreeRate)
  }

  /** Grid-search optimization over strategy parameters (reference
    * optimize(opt_type="grid_search", **ranges), strats.py:603-655 /
    * optimize.py:209-229): returns (ticker, best_state, best_net_worth).
    */
  def optimize(mkStrategy: Seq[Double] => LocalStrategy,
      ranges: Seq[(Double, Double, Double)]): DataFrame =
    GridSearch.best(
      GridSearch.evaluate(bars, mkStrategy, initialAmount, ranges))

  private def ensureRun(): Unit = if (result.isEmpty) run()
}
