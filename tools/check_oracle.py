#!/usr/bin/env python3
"""Local replica of the driver's correctness check: run graft.Verify output
against DuckDB oracles on the same parquet tables, sort columns by name,
sort rows, and compare values. Usage: check_oracle.py <verifyOutDir> <sfDir>
"""
import sys, json, glob, os
import duckdb
import pandas as pd

outdir, sfdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p)[:-len(".parquet")]
    con.sql(f"create view {name} as select * from '{p}'")

sqls = json.load(open(f"{outdir}/oracle_sql.json"))
fails = 0
for name in sorted(sqls):
    sql = sqls[name]
    spark_dir = f"{outdir}/{name}"
    if not os.path.isdir(spark_dir):
        print(f"FAIL {name}: no spark output dir"); fails += 1; continue
    try:
        got = con.sql(f"select * from parquet_scan('{spark_dir}/*.parquet')").df()
        want = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: {e}"); fails += 1; continue
    gc, wc = sorted(got.columns), sorted(want.columns)
    if gc != wc:
        print(f"FAIL {name}: columns {gc} != {wc}"); fails += 1; continue
    g = got[gc].sort_values(gc).reset_index(drop=True)
    w = want[wc].sort_values(wc).reset_index(drop=True)
    if len(g) != len(w):
        print(f"FAIL {name}: rows {len(g)} != {len(w)}"); fails += 1; continue
    # value compare (stringify like a hash would)
    gs = g.astype(str); ws = w.astype(str)
    if not gs.equals(ws):
        diff = (gs != ws).any(axis=1)
        print(f"FAIL {name}: {diff.sum()} differing rows of {len(g)}")
        print("  spark:", g[diff].head(3).to_dict('records'))
        print("  oracle:", w[diff].head(3).to_dict('records'))
        fails += 1
        continue
    print(f"OK   {name}: {len(g)} rows")
print("FAILURES:", fails)
sys.exit(1 if fails else 0)
