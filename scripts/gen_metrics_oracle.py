#!/usr/bin/env python3
"""Generate the DuckDB oracle for bt_metrics and emit graft.MetricsOracle.

The daily net-worth series comes from the reference-run fixture
(scripts/gen_bt_goldens.py -> bt_daily.parquet); the SP500 stand-in is
recomputed from events with an order-independent DECIMAL day mean
(matching the query); order profits come from bt_orders.parquet. Every
aggregate is then folded in DATE ORDER with Spark's exact algorithms:

  - avg        = sequential double sum / count (AverageAgg)
  - var/stddev = Welford central moments, Spark CentralMomentAgg update:
                 newN = n+1; delta = x-avg; deltaN = delta/newN;
                 avg += deltaN; m2 += delta*(delta - deltaN)
  - covariance = the reference's hand-rolled semantics (both-non-null
                 rows, FULL row count denominator) in the single-pass
                 E[xy] expansion the Spark side now uses:
                 (Sxy - mx*Sy - my*Sx + n11*mx*my) / n_rows
                 with Sxy/Sx/Sy date-order folds over both-non-null rows
                 (Metrics.scala)
  - drawdown   = running-max fold

so sharpe/vol/beta/alpha/r2 are bit-equal to the distributed plan.

Validate against a Spark Verify dump, then emit:
    python3 scripts/gen_metrics_oracle.py /root/testdata/sf0.01 /tmp/verify_out01
"""
import sys

GOLD = "@GOLDENS@"  # placeholder: MetricsOracle substitutes Goldens.dir at runtime


def fold_sum(xs):
    return f"list_reduce(list_prepend(0.0, {xs}), (sa, sx) -> sa + sx)"


def nn(xs):
    return f"list_filter({xs}, nx -> nx IS NOT NULL)"


def welford(xs):
    """[n, avg, m2] after Spark's CentralMomentAgg updates over xs."""
    step = ("list_transform([we[1] - wa[2]], wd -> "
            "list_transform([wa[1] + 1.0], wn -> "
            "[wn, wa[2] + wd/wn, "
            "wa[3] + wd*(wd - wd/wn)])[1])[1]")
    return (f"list_reduce(list_prepend([0.0, 0.0, 0.0], "
            f"list_transform({nn(xs)}, wx -> [wx, 0.0, 0.0])), "
            f"(wa, we) -> {step})")


def bt_metrics_sql():
    pct = ("list_concat([CAST(NULL AS DOUBLE)], "
           "list_transform(range(2, len({v}) + 1), "
           "pi -> {v}[pi] / nullif({v}[pi - 1], 0.0) - 1))")
    pct_nw = pct.format(v="nwl")
    pct_sp = pct.format(v="spl")
    # running-max drawdown fold -> min drawdown
    dd_min = ("list_reduce(list_prepend("
              "[CAST('-infinity' AS DOUBLE), CAST('infinity' AS DOUBLE)], "
              "list_transform(nwl, dx -> [dx, 0.0])), (da, de) -> "
              "list_transform([greatest(da[1], de[1])], dm -> "
              "[dm, least(da[2], de[1]/dm - 1)])[1])[2]")
    # single-pass covariance ingredients: per-row products / components in
    # date order, restricted to rows where BOTH series are non-null
    # (mirrors Spark's sum(x*y), sum(when(y notnull, x)), count(x*y))
    both = ("list_filter(list_transform(range(1, n_rows + 1), ci -> "
            "CASE WHEN pnw[ci] IS NOT NULL AND psp[ci] IS NOT NULL "
            "THEN [pnw[ci], psp[ci]] END), bx -> bx IS NOT NULL)")
    # let-bind the filtered pair list once (bl), then the same left-assoc
    # expression tree as Spark's: ((Sxy - mx*Sy) - my*Sx) + n11*mx*my,
    # all over n_rows
    cov_expr = (
        f"list_transform([{both}], bl -> "
        f"({fold_sum('list_transform(bl, bp -> bp[1] * bp[2])')}"
        f" - mean_nw * {fold_sum('list_transform(bl, bp -> bp[2])')}"
        f" - mean_sp * {fold_sum('list_transform(bl, bp -> bp[1])')}"
        f" + CAST(len(bl) AS DOUBLE) * mean_nw * mean_sp)"
        f" / n_rows)[1]")
    return f"""WITH sp_day AS (
  SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS sp
  FROM events GROUP BY 1),
d AS (
  SELECT g.ticker, g.date_us, g.net_worth, sp_day.sp
  FROM read_parquet('{GOLD}/bt_daily.parquet') g
  LEFT JOIN sp_day
    ON date_trunc('day', make_timestamp(g.date_us)) = sp_day.day),
series AS (
  SELECT ticker,
    list(net_worth ORDER BY date_us) AS nwl,
    list(sp ORDER BY date_us) AS spl,
    count(*) AS n_rows
  FROM d GROUP BY ticker),
op AS (
  SELECT ticker,
    sum(CASE WHEN profit > 0 THEN profit END) AS profit_sum,
    sum(CASE WHEN profit < 0 THEN profit END) AS loss_sum
  FROM read_parquet('{GOLD}/bt_orders.parquet') GROUP BY ticker),
calc AS (
  SELECT ticker, n_rows, nwl[len(nwl)] AS end_amount, nwl[1] AS first_nw,
    spl[len(spl)] AS last_sp, spl[1] AS first_sp,
    {pct_nw} AS pnw, {pct_sp} AS psp, {dd_min} AS min_dd
  FROM series),
agg AS (
  SELECT ticker, n_rows, end_amount, first_nw, last_sp, first_sp, min_dd,
    pnw, psp,
    {fold_sum(nn('pnw'))} / len({nn('pnw')}) AS mean_nw,
    {fold_sum(nn('psp'))} / len({nn('psp')}) AS mean_sp,
    {welford('pnw')} AS w_nw, {welford('psp')} AS w_sp
  FROM calc),
met AS (
  SELECT ticker, end_amount, end_amount - 10000.0 AS net_profit,
    min_dd * 100 AS max_drawdown_pct,
    coalesce(op.profit_sum, 0.0) /
      -(CASE WHEN op.loss_sum IS NULL OR op.loss_sum = 0 THEN -1.0
             ELSE op.loss_sum END) AS profit_factor,
    list_transform([(power(mean_nw + 1, 255) - 1 - 0.03) /
      nullif(sqrt(w_nw[3] / (w_nw[1] - 1)) * sqrt(252), 0.0)], shx ->
      CASE WHEN abs(shx) >= 3.4028235677973366e+38
        THEN CAST(sign(shx) * CAST('infinity' AS DOUBLE) AS FLOAT)
        ELSE CAST(shx AS FLOAT) END)[1] AS sharpe_f,
    sqrt(w_nw[3] / (w_nw[1] - 1)) * sqrt(252) AS volatility_annualized,
    {cov_expr} AS cov,
    w_nw[3] / (w_nw[1] - 1) AS var_nw,
    sqrt(w_sp[3] / (w_sp[1] - 1)) AS std_sp,
    (end_amount - first_nw) / nullif(first_nw, 0.0) AS stock_return,
    last_sp, first_sp
  FROM agg LEFT JOIN op USING (ticker))
SELECT ticker, end_amount, net_profit, max_drawdown_pct, profit_factor,
  sharpe_f, volatility_annualized,
  cov / nullif(var_nw, 0.0) AS beta,
  stock_return - 0.03 - (cov / nullif(var_nw, 0.0)) *
    ((last_sp / nullif(first_sp, 0.0) - 1) - 0.03) AS alpha,
  cov / nullif(sqrt(var_nw) * std_sp, 0.0) AS r_squared
FROM met ORDER BY ticker"""


def validate(sf_dir, verify_dir):
    import glob
    import time

    import duckdb
    import pandas as pd
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'")
    t0 = time.time()
    d = con.sql(bt_metrics_sql().replace(
        GOLD, "src/test/resources/goldens/sf0.01")).df()
    s = pd.concat([pd.read_parquet(f) for f in
                   sorted(glob.glob(f"{verify_dir}/bt_metrics/*.parquet"))])
    s = s[sorted(s.columns)].reset_index(drop=True)
    d = d[sorted(d.columns)].reset_index(drop=True)
    try:
        pd.testing.assert_frame_equal(s, d, check_exact=True)
        print(f"bt_metrics: EXACT MATCH ({len(s)} rows, {time.time()-t0:.1f}s)")
        return True
    except AssertionError as e:
        print(f"bt_metrics: MISMATCH {str(e)[:400]}")
        for c in s.columns:
            ne = (s[c] != d[c]) & ~(s[c].isna() & d[c].isna())
            if ne.any():
                i = ne.idxmax()
                print(f"  col {c}: {int(ne.sum())} diffs, e.g. row {i}: "
                      f"spark={s[c][i]!r} duck={d[c][i]!r}")
        return False


def emit_scala(path):
    sql = bt_metrics_sql()
    esc = sql.replace("\\", "\\\\").replace('"', '\\"').replace("\n", "\\n")
    src = f"""package graft

/** GENERATED by scripts/gen_metrics_oracle.py — do not edit by hand.
  *
  * DuckDB oracle for bt_metrics: reference-run daily fixture + date-order
  * folds replicating Spark's aggregate algorithms (sequential mean,
  * Welford central moments, two-pass covariance) bit-for-bit.
  */
object MetricsOracle {{
  val btMetrics: String =\n    "{esc}".replace("@GOLDENS@", Goldens.dir)
}}
"""
    with open(path, "w") as f:
        f.write(src)
    print(f"wrote {path}")


if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    verify_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out01"
    if validate(sf_dir, verify_dir):
        emit_scala("src/main/scala/graft/MetricsOracle.scala")
    else:
        sys.exit(1)
