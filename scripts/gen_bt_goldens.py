#!/usr/bin/env python3
"""Mint backtest-tier oracle fixtures by running the ACTUAL reference
implementation (dhruvsamdani/strat-backtest) offline over the driver's
events-as-bars testdata.

Run (driver-side python has pandas/pyarrow; scripts/refstubs stubs
yfinance/praw/requests/matplotlib so the reference imports offline):

    PYTHONPATH=scripts/refstubs:/root/reference python3 scripts/gen_bt_goldens.py \
        /root/testdata/sf0.01 src/test/resources/goldens/sf0.01

Outputs (schemas exactly match SparkEntry's bt_orders / bt_backtest_fold
driver queries so the DuckDB oracle can SELECT straight from them):
    bt_orders.parquet          ticker, seq, num_shares, start_us,
                               start_amount, filled, end_us, end_amount,
                               profit
    bt_backtest_fold.parquet   ticker, net_worth
    opt_grid.parquet           ticker, best_net_worth   (u1/u2/u3 over the
                               fast=arange(3,9,2) x lagging=arange(10,30,10)
                               grid, reference numpy.arange semantics)
    opt_common_stocks.parquet  ticker, mentions, best_net_worth (the
                               _find_common_stocks composition over
                               deterministic connector seams; reference
                               regex mention counting, same grid)

Sanity-checked first against the reference's own golden: aapl last-10Y
MA_Cross(36,40) @ 5000 -> 1283666.449897766 (tests/test_strat.py).
"""
import sys

import numpy as np
import pandas as pd

import contextlib

from strat_backtest.backtest.strats import Backtest
from strat_backtest.backtest.custom_strats import MA_Cross_Strat, Ten_Percent_Strat


@contextlib.contextmanager
def legacy_int_indexing():
    """The reference's Ten_Percent_Strat indexes Series positionally with
    ints (data.close[0], written against pre-2.0 pandas). Scoped so the
    fallback cannot leak into the MA_Cross / opt-grid golden paths."""
    orig = pd.Series.__getitem__

    def compat(self, key):
        if isinstance(key, (int, np.integer)) and key not in self.index:
            return self.iloc[key]
        return orig(self, key)

    pd.Series.__getitem__ = compat
    try:
        yield
    finally:
        pd.Series.__getitem__ = orig


def run_reference(ticker: str, bars: pd.DataFrame, initial: float,
                  fast: int, lagging: int, collect_daily=None,
                  strat=None, **strat_kwargs):
    """One reference backtest; returns (orders_df_rows, final_net_worth).
    When `collect_daily` is a list, appends the full per-bar net-worth
    series as (ticker, date_us, net_worth) rows."""
    if strat is None:
        strat, strat_kwargs = MA_Cross_Strat, {"fast": fast, "lagging": lagging}
    bt = Backtest(initial, ticker, strat, input_data=bars, **strat_kwargs)
    daily = bt.run()
    net_worth = daily.net_worth.iloc[-1]
    if collect_daily is not None:
        # run() unions the stub market-data calendar into the index
        # (pd.concat axis=1); keep only the actual bar dates
        bar_dates = set(bars.index)
        for d, nw in zip(daily.index, daily.net_worth):
            if d in bar_dates:
                collect_daily.append({"ticker": ticker, "date_us": ts_us(d),
                                      "net_worth": float(nw)})
    om = bt.strat.orders
    rows = []
    # completed + open, enumerated — the same layout as graft's
    # BacktestEngine.collectFold OrderRow emission
    for seq, o in enumerate(list(om.completed_orders) + list(om.open_orders)):
        rows.append({
            "ticker": ticker,
            "seq": seq,
            "num_shares": float(o.num_shares),
            "start_us": ts_us(o.start_time),
            "start_amount": float(o.start_amount),
            "filled": bool(o.filled),
            "end_us": ts_us(o.end_time) if o.end_time is not None else None,
            "end_amount": float(o.end_amount) if o.filled else None,
            "profit": float(o.profit) if o.filled else None,
        })
    return rows, float(net_worth)


def ts_us(t) -> int:
    return int(pd.Timestamp(t).value // 1000)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]

    # sanity pin against the reference's own shipped golden
    aapl = pd.read_csv("/root/reference/strat_backtest/data/aapl.csv",
                       index_col=0, parse_dates=True)
    aapl.columns = aapl.columns.str.lower()
    aapl10 = aapl.last("10Y")
    _, nw = run_reference("aapl", aapl10, 5000.0, 36, 40)
    assert nw == 1283666.449897766, nw

    # events-as-bars, the same mapping as graft.sources.Sources.eventsAsBars:
    # ticker = "u"+user_id, date = ts truncated ns->us, close = value
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "value"])
    ev["ts"] = ev["ts"].dt.floor("us")
    all_orders, all_nw, all_daily = [], [], []
    for uid, g in sorted(ev.groupby("user_id"), key=lambda kv: kv[0]):
        ticker = f"u{uid}"
        g = g.sort_values("ts")
        bars = pd.DataFrame({"close": g["value"].to_numpy()},
                            index=pd.DatetimeIndex(g["ts"]))
        rows, nw = run_reference(ticker, bars, 10000.0, 5, 20,
                                 collect_daily=all_daily)
        all_orders.extend(rows)
        all_nw.append({"ticker": ticker, "net_worth": nw})

    # TenPercent strategy fold golden (reference Ten_Percent_Strat with
    # its default sell=1.05 / buy=0.99 multipliers)
    tenpct_rows = []
    with legacy_int_indexing():
        for uid, g in sorted(ev.groupby("user_id"), key=lambda kv: kv[0]):
            ticker = f"u{uid}"
            g = g.sort_values("ts")
            bars = pd.DataFrame({"close": g["value"].to_numpy()},
                                index=pd.DatetimeIndex(g["ts"]))
            _, nw = run_reference(ticker, bars, 10000.0, 0, 0,
                                  strat=Ten_Percent_Strat)
            tenpct_rows.append({"ticker": ticker, "net_worth": nw})

    # opt_grid golden: best net worth per ticker over the same grid the
    # driver query runs (numpy.arange endpoints-exclusive semantics)
    grid = [(int(f), int(l)) for f in np.arange(3, 9, 2)
            for l in np.arange(10, 30, 10)]
    opt_rows = []
    for uid, g in sorted(ev.groupby("user_id"), key=lambda kv: kv[0]):
        ticker = f"u{uid}"
        if ticker not in ("u1", "u2", "u3"):
            continue
        g = g.sort_values("ts")
        bars = pd.DataFrame({"close": g["value"].to_numpy()},
                            index=pd.DatetimeIndex(g["ts"]))
        best = max(run_reference(ticker, bars, 10000.0, f, l)[1]
                   for f, l in grid)
        opt_rows.append({"ticker": ticker, "best_net_worth": best})

    # opt_common_stocks golden: the _find_common_stocks composition
    # (optimize.py:67-99) with its two external connectors replaced by
    # deterministic seams — a synthetic mention corpus (one doc per
    # event, text "check $<SYM> today" where SYM = 'U' + digits->letters
    # of user_id so the reference's ticker regex matches) and
    # events-as-bars. Mention counting uses the reference's OWN regex
    # semantics (common_stock.py:125-127: findall two-group alternation,
    # groups joined, leading '$' dropped); top-3 by (count desc, symbol
    # asc); then the same reference grid search as opt_grid per winner.
    import re
    digit2alpha = str.maketrans("0123456789", "ABCDEFGHIJ")
    def sym(uid):
        return "U" + str(uid).translate(digit2alpha)
    mention_counts = {}
    for uid, cnt in ev.groupby("user_id").size().items():
        text = f"check ${sym(uid)} today"
        toks = ["".join(m) for m in
                re.findall(r"([A-Z]{2,5})|\$([A-z]+)", text)]
        toks = [t.lstrip("$") for t in toks]
        for t in toks:
            if t.lower() == "spy":  # the query's blacklist
                continue
            mention_counts[t] = mention_counts.get(t, 0) + int(cnt)
    top3 = sorted(mention_counts.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    common_rows = []
    for ticker, cnt in top3:
        # invert the symbol back to the user id for the bar lookup
        uid_str = ticker[1:].translate(
            str.maketrans("ABCDEFGHIJ", "0123456789"))
        g = ev[ev["user_id"] == int(uid_str)].sort_values("ts")
        bars = pd.DataFrame({"close": g["value"].to_numpy()},
                            index=pd.DatetimeIndex(g["ts"]))
        best = max(run_reference(ticker, bars, 10000.0, f, l)[1]
                   for f, l in grid)
        common_rows.append({"ticker": ticker, "mentions": cnt,
                            "best_net_worth": best})

    import pathlib
    pathlib.Path(out_dir).mkdir(parents=True, exist_ok=True)
    od = pd.DataFrame(all_orders, columns=["ticker", "seq", "num_shares",
        "start_us", "start_amount", "filled", "end_us", "end_amount",
        "profit"])
    od = od.astype({"seq": "int64", "start_us": "int64",
                    "end_us": "Int64"})
    od.to_parquet(f"{out_dir}/bt_orders.parquet", index=False)

    def write_preserving_nan(df, path):
        """pandas->parquet turns float NaN into parquet NULL (pyarrow's
        nan_as_null default); the reference REALLY produces NaN net
        worths on zero-priced bars (inf-share orders), and the engine
        reproduces them — the fixture must keep NaN a VALUE so the
        DuckDB oracle compares NaN vs NaN, not NULL vs NaN."""
        import pyarrow as pa
        import pyarrow.parquet as pq
        cols = {}
        for c in df.columns:
            if df[c].dtype == "float64":
                cols[c] = pa.array(df[c].to_numpy(), type=pa.float64(),
                                   from_pandas=False)
            else:
                cols[c] = pa.array(df[c])
        pq.write_table(pa.table(cols), path)

    write_preserving_nan(pd.DataFrame(all_nw),
                         f"{out_dir}/bt_backtest_fold.parquet")
    pd.DataFrame(opt_rows).to_parquet(f"{out_dir}/opt_grid.parquet",
                                      index=False)
    pd.DataFrame(all_daily).to_parquet(f"{out_dir}/bt_daily.parquet",
                                       index=False)
    write_preserving_nan(pd.DataFrame(tenpct_rows),
                         f"{out_dir}/bt_tenpct_fold.parquet")
    cs = pd.DataFrame(common_rows,
                      columns=["ticker", "mentions", "best_net_worth"])
    cs = cs.astype({"mentions": "int64"})
    cs.to_parquet(f"{out_dir}/opt_common_stocks.parquet", index=False)
    print(f"wrote {len(od)} orders, {len(all_nw)} tickers, "
          f"{len(opt_rows)} opt rows, {len(all_daily)} daily rows, "
          f"{len(cs)} common-stock rows -> {out_dir}")


if __name__ == "__main__":
    main()
