#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare (rows/schema/values)."""
import duckdb, json, glob, math, sys

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))

def norm(v):
    if v is None: return "NULL"
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return repr(v)
    return str(v)

fails, passes, errs = [], [], []
for name in sorted(oracle):
    try:
        sparkdir = f"{OUT}/{name}"
        files = glob.glob(f"{sparkdir}/*.parquet")
        if not files:
            errs.append((name, "no spark output")); continue
        s = con.execute(f"SELECT * FROM read_parquet('{sparkdir}/*.parquet')")
        scols = [d[0] for d in s.description]; srows = s.fetchall()
        o = con.execute(oracle[name])
        ocols = [d[0] for d in o.description]; orows = o.fetchall()
        schema_ok = sorted(scols) == sorted(ocols)
        rows_ok = len(srows) == len(orows)
        val_ok = False
        if schema_ok and rows_ok:
            sidx = [scols.index(c) for c in sorted(scols)]
            oidx = [ocols.index(c) for c in sorted(ocols)]
            sset = sorted(tuple(norm(r[i]) for i in sidx) for r in srows)
            oset = sorted(tuple(norm(r[i]) for i in oidx) for r in orows)
            val_ok = sset == oset
        if schema_ok and rows_ok and val_ok:
            passes.append(name)
        else:
            detail = ""
            if not schema_ok: detail = f"schema {sorted(scols)} vs {sorted(ocols)}"
            elif not rows_ok: detail = f"rows {len(srows)} vs {len(orows)}"
            else:
                diff = [(a,b) for a,b in zip(sset,oset) if a!=b][:2]
                detail = f"values, first diffs: {diff}"
            fails.append((name, detail))
    except Exception as e:
        errs.append((name, str(e)[:300]))

print(f"PASS {len(passes)} / {len(oracle)}")
for n,d in fails: print("FAIL", n, d)
for n,d in errs: print("ERR ", n, d)
sys.exit(1 if fails or errs else 0)
