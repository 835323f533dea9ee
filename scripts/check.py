#!/usr/bin/env python3
"""Dev harness mimicking the driver's correctness gate: for each query
result parquet under OUT, run the matching oracle SQL from oracle_sql.json
in DuckDB (tables = the sf parquet files) and compare values.
Usage: check.py [sfDir] [outDir] [query_filter_substr]
"""
import json, sys, os, glob
import duckdb
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
FILT = sys.argv[3] if len(sys.argv) > 3 else ""

def fresh_con():
    # one connection PER QUERY: a single long-lived connection accumulates
    # reserved buffer-pool memory across ~140 heavy queries and starts
    # failing small allocations ("bad allocation") despite free RAM
    c = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = f"{SF}/{t}.parquet"
        if os.path.exists(p):
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return c

if os.path.exists(f"{OUT}/_PARTIAL_DUMP.txt"):
    with open(f"{OUT}/_PARTIAL_DUMP.txt") as f:
        print(f"WARNING: {OUT} was produced by a FILTERED Verify run "
              f"({f.read().strip()}); entries outside the filter are stale "
              f"relative to oracle_sql.json — only trust the filtered names.")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
ok = fail = 0
for name, sql in sorted(oracle.items()):
    if FILT and FILT not in name:
        continue
    d = f"{OUT}/{name}"
    files = glob.glob(f"{d}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output");  fail += 1;  continue
    try:
        con = fresh_con()
        spark_df = con.execute(
            f"SELECT * FROM read_parquet('{d}/*.parquet')").df()
        ora_df = con.execute(sql).df()
        con.close()
    except Exception as e:
        print(f"FAIL {name}: exec error: {e}");  fail += 1;  continue
    sd = spark_df.reindex(sorted(spark_df.columns), axis=1)
    od = ora_df.reindex(sorted(ora_df.columns), axis=1)
    if list(sd.columns) != list(od.columns):
        print(f"FAIL {name}: columns {list(sd.columns)} vs {list(od.columns)}")
        fail += 1;  continue
    if len(sd) != len(od):
        print(f"FAIL {name}: rows {len(sd)} vs {len(od)}");  fail += 1
        continue
    # normalize: lists -> tuples, sort rows
    def norm(df):
        for c in df.columns:
            if df[c].dtype == object:
                df[c] = df[c].map(
                    lambda v: tuple(v) if isinstance(v, (list,)) or
                    type(v).__name__ == "ndarray" else v)
        return df.sort_values(by=list(df.columns)).reset_index(drop=True)
    sd, od = norm(sd), norm(od)
    diff = None
    for c in sd.columns:
        a, b = sd[c], od[c]
        if str(a.dtype).startswith("float") and str(b.dtype).startswith("float"):
            neq = ~((a == b) | (a.isna() & b.isna()))
        else:
            neq = ~((a == b) | (a.isna() & b.isna()))
        if neq.any():
            i = neq.idxmax()
            diff = f"col {c} row {i}: spark={a[i]!r} oracle={b[i]!r}"
            break
    if diff:
        print(f"FAIL {name}: {diff}");  fail += 1
    else:
        print(f"OK   {name} ({len(sd)} rows)");  ok += 1
print(f"\n{ok} ok, {fail} fail")
sys.exit(1 if fail else 0)
