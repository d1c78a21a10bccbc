#!/usr/bin/env python3
"""Time the DuckDB oracle SQL for the named queries (or all) at a scale
factor — the same 32-thread DuckDB the driver's gate uses — so engine
bench numbers can be compared against the oracle's cost for the same
work. Usage:

  python3 scripts/time_oracles.py <sfDir> <verifyOut> [query ...]

Reads oracle_sql.json from <verifyOut> (a graft.Verify / DumpQuery
output dir) and prints one `name: seconds rows` line per query plus a
JSON summary line.
"""
import json
import sys
import time

import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_sf01"
names = sys.argv[3:]

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf}/{t}.parquet')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
todo = names if names else sorted(oracle)
res = {}
for name in todo:
    t0 = time.time()
    n = len(con.execute(oracle[name]).fetchall())
    dt = time.time() - t0
    res[name] = round(dt, 3)
    print(f"{name}: {dt:.2f}s {n} rows", flush=True)
print(json.dumps({"sf": sf, "oracle_sec": res}))
