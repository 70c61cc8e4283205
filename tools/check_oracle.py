#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate: run each
oracle SQL against the sf tables and compare with the engine's parquet
dump (column-name-sorted, row-sorted, exact values)."""
import sys, json, glob
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = p.split("/")[-1].replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    try:
        want = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {e}")
        fails += 1
        continue
    try:
        got = pd.concat([pd.read_parquet(f) for f in glob.glob(f"{out_dir}/{name}/*.parquet")])
    except Exception as e:
        print(f"FAIL {name}: engine output missing: {e}")
        fails += 1
        continue
    want = want[sorted(want.columns)].sort_values(by=sorted(want.columns)).reset_index(drop=True)
    got = got[sorted(got.columns)] if set(got.columns) == set(want.columns) else got
    if set(got.columns) != set(want.columns):
        print(f"FAIL {name}: columns {sorted(got.columns)} vs {sorted(want.columns)}")
        fails += 1
        continue
    got = got.sort_values(by=sorted(got.columns)).reset_index(drop=True)
    # normalize dtypes for compare
    want = want.astype(str)
    got = got.astype(str)
    if want.equals(got):
        print(f"PASS {name}: {len(got)} rows")
    else:
        fails += 1
        print(f"FAIL {name}: {len(got)} engine rows vs {len(want)} oracle rows")
        merged = got.merge(want, how="outer", indicator=True)
        diff = merged[merged["_merge"] != "both"]
        print(diff.head(10).to_string())
print("FAILS:", fails)
sys.exit(1 if fails else 0)
