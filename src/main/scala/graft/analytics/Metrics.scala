package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.OrderRow
import graft.ts.TimeSeriesOps

/** Portfolio analytics (reference strats.py:657-789, SURVEY.md §3.3).
  *
  * One window pass (pct_change, cummax) + ONE groupBy(ticker) aggregation
  * over the daily frame (covariance folds into the same pass via the
  * E[xy]−E[x]E[y] expansion — no second scan, no means join), one
  * aggregation over the orders table, and a broadcast-sized join of the
  * two — no collect, metrics for any number of tickers in a single
  * distributed plan.
  *
  * Pandas-quirk parity (SURVEY.md §7.4 quirk 7), kept deliberately:
  *  - Sharpe annualizes the mean with `** 255` but the std with `sqrt(252)`
  *    (strats.py:730-733).
  *  - Covariance is population-style but divides by the FULL row count
  *    including the null first pct_change row (strats.py:745-748), while
  *    variance is sample variance — so do NOT use covar_pop.
  *  - CAGR floors years to an integer (strats.py:696); a span < 1 year
  *    yields null here (the reference raises ZeroDivisionError).
  *  - Profit factor substitutes loss = −1 when the loss sum is 0 or null
  *    (strats.py:712-716).
  */
object Metrics {

  /** Compute the metrics table from a backtest daily frame (must contain
    * `ticker, date, net_worth` and an index column, default `SP500`) and
    * the orders table.
    */
  def compute(daily: DataFrame, orders: Dataset[OrderRow],
      initialAmount: Double, riskFreeRate: Double,
      indexCol: String = "SP500"): DataFrame = {
    val w = TimeSeriesOps.keyed()
    val withPct = daily
      .withColumn("__pct_nw", TimeSeriesOps.pctChange(col("net_worth"), w))
      .withColumn("__pct_sp", TimeSeriesOps.pctChange(col(indexCol), w))
      .withColumn("__dd",
        col("net_worth") / TimeSeriesOps.cumMax(col("net_worth"), w) - 1)

    val dailyAgg = withPct.groupBy("ticker").agg(
      min(col("date")).as("start_time"),
      max(col("date")).as("end_time"),
      expr("max_by(net_worth, date)").as("end_amount"),
      expr("min_by(net_worth, date)").as("first_net_worth"),
      expr("max_by(" + indexCol + ", date)").as("last_sp"),
      expr("min_by(" + indexCol + ", date)").as("first_sp"),
      count(lit(1)).as("n_rows"),
      avg(col("__pct_nw")).as("mean_pct_nw"),
      stddev_samp(col("__pct_nw")).as("std_pct_nw"),
      var_samp(col("__pct_nw")).as("var_pct_nw"),
      avg(col("__pct_sp")).as("mean_pct_sp"),
      stddev_samp(col("__pct_sp")).as("std_pct_sp"),
      min(col("__dd")).as("min_dd"),
      avg(col("__dd")).as("mean_dd"),
      // covariance ingredients, same pass: sums restricted to rows where
      // BOTH series are non-null (the product/when forms skip the rest)
      sum(col("__pct_nw") * col("__pct_sp")).as("__sum_xy"),
      sum(when(col("__pct_sp").isNotNull, col("__pct_nw"))).as("__sum_x_b"),
      sum(when(col("__pct_nw").isNotNull, col("__pct_sp"))).as("__sum_y_b"),
      count(col("__pct_nw") * col("__pct_sp")).as("__n_both"))

    // The reference's hand-rolled covariance is Σ(x−mx)(y−my) over
    // both-non-null rows / FULL row count, with mx, my the per-column
    // means. Expanded to Σxy − mx·Σy_b − my·Σx_b + n11·mx·my it needs no
    // second pass over the daily frame and no means join — one scan, one
    // shuffle for the whole metrics block. (The expansion is within an
    // ulp of the two-pass form at these magnitudes; the DuckDB oracle
    // folds the identical expression, so the gate stays bit-exact.)
    val withCov = dailyAgg.withColumn("covariance",
      (col("__sum_xy")
        - col("mean_pct_nw") * col("__sum_y_b")
        - col("mean_pct_sp") * col("__sum_x_b")
        + col("__n_both").cast("double") * col("mean_pct_nw") * col("mean_pct_sp"))
        / col("n_rows"))

    val o = orders.toDF()
    val holdMicros = unix_micros(col("end_time")) - unix_micros(col("start_time"))
    val orderAgg = o.groupBy("ticker").agg(
      sum(holdMicros).as("hold_sum_us"),
      count(holdMicros).as("hold_n"),
      avg(when(col("profit") < 0, col("profit"))).as("average_losses"),
      avg(when(col("profit") > 0, col("profit"))).as("average_profits"),
      min(when(col("profit") < 0, col("profit"))).as("biggest_loss"),
      max(col("profit")).as("biggest_win"),
      sum(when(col("profit") < 0, col("profit"))).as("loss_sum"),
      sum(when(col("profit") > 0, col("profit"))).as("profit_sum"),
      sum(when(col("filled"), col("profit"))).as("filled_profit_sum"),
      count(when(col("filled"), lit(1))).as("n_filled"),
      sum(col("start_amount") * col("num_shares")).as("total_risked"),
      count(lit(1)).as("n_orders"))

    val joined = withCov
      .join(orderAgg, Seq("ticker"), "left")

    // Degenerate-ticker guards: ANSI Spark errors on x/0 even for doubles
    // (pandas yields inf/NaN); nullif turns those metrics null instead of
    // failing the whole job — essential when one of thousands of tickers
    // never trades.
    val years = floor(datediff(col("end_time"), col("start_time")) / 365)
    val annualEr = pow(col("mean_pct_nw") + 1, 255) - 1
    val vol = col("std_pct_nw") * math.sqrt(252)
    val beta = col("covariance") / nullif(col("var_pct_nw"), lit(0.0))
    val stockReturn = (col("end_amount") - col("first_net_worth")) /
      nullif(col("first_net_worth"), lit(0.0))

    joined.select(
      col("ticker"),
      col("start_time"),
      col("end_time"),
      lit(initialAmount).as("start_amount"),
      col("end_amount"),
      formatHoldTime(col("hold_sum_us"), col("hold_n")).as("average_hold_time"),
      col("average_losses"),
      col("average_profits"),
      col("biggest_loss"),
      col("biggest_win"),
      when(years > 0,
        (pow(col("end_amount") / initialAmount, lit(1.0) / years) - 1) * 100)
        .as("cagr_pct"),
      (col("min_dd") * 100).as("max_drawdown_pct"),
      (col("mean_dd") * 100).as("average_drawdown_pct"),
      (col("end_amount") - initialAmount).as("net_profit"),
      (coalesce(col("profit_sum"), lit(0.0)) /
        -when(col("loss_sum").isNull || col("loss_sum") === 0, lit(-1.0))
          .otherwise(col("loss_sum"))).as("profit_factor"),
      when(col("n_orders") > 0 && col("n_filled") > 0,
        col("filled_profit_sum") / nullif(col("total_risked"), lit(0.0)))
        .as("risk_reward"),
      ((annualEr - riskFreeRate) / nullif(vol, lit(0.0))).as("sharpe_ratio"),
      vol.as("volatility_annualized"),
      beta.as("beta"),
      (stockReturn - riskFreeRate -
        beta * ((col("last_sp") / nullif(col("first_sp"), lit(0.0)) - 1)
          - riskFreeRate)).as("alpha"),
      (col("covariance") /
        nullif(sqrt(col("var_pct_nw")) * col("std_pct_sp"), lit(0.0)))
        .as("r_squared"))
  }

  /** Pandas `str(Timedelta.mean())` formatting: "156 days 13:30:00", with
    * fractional ".ffffff[fff]" for sub-second parts. Pandas averages the
    * int64-nanosecond view in float64 (Series.mean → np.nanmean) — so the
    * exact-long micros sum is float-divided in nanoseconds here, matching
    * its last-digit behavior.
    */
  private def formatHoldTime(sumUsCol: Column, nCol: Column): Column = {
    val f = udf { (sumUs: java.lang.Long, n: java.lang.Long) =>
      if (sumUs == null || n == null || n == 0L) null
      else {
        val avgNs = math.rint((sumUs.longValue() * 1000L).toDouble / n.longValue()).toLong
        val neg = avgNs < 0
        val t = math.abs(avgNs)
        val days = t / 86400000000000L
        val rem = t % 86400000000000L
        val h = rem / 3600000000000L
        val m = (rem % 3600000000000L) / 60000000000L
        val s = (rem % 60000000000L) / 1000000000L
        val ns = rem % 1000000000L
        val base = f"${if (neg) "-" else ""}$days days $h%02d:$m%02d:$s%02d"
        if (ns == 0) base
        else if (ns % 1000 == 0) f"$base.${ns / 1000}%06d"
        else f"$base.$ns%09d"
      }
    }
    f(sumUsCol, nCol)
  }
}
