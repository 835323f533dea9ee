#!/usr/bin/env python3
"""Dev harness mimicking the driver's correctness gate: for each query
result parquet under OUT, run the matching oracle SQL from oracle_sql.json
in DuckDB (tables = the sf parquet files) and compare values.

Besides the human-readable OK/FAIL lines, every FULL (unfiltered) run
writes a machine-readable per-entry verdict in the driver-artifact shape
({name: {rows_match, schema_match, hash_match, spark_rows, oracle_rows,
err}}) to CORRECTNESS_SELF.json in the repo root, so the hard correctness
signal survives a driver-side artifact flake (round-3's CORRECTNESS_r03
.json arrived as an empty `{}`). Filtered runs write the same shape to
OUT/correctness_partial.json instead, never touching the committed record.

DuckDB's known flake on this guest — "Out of Memory ... bad allocation"
when a big JVM is hogging RAM — is retried per entry with a fresh
connection and a short backoff before an entry is allowed to FAIL.

Usage: check.py [sfDir] [outDir] [query_filter_substr]
"""
import json, sys, os, glob, time
import duckdb
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
FILT = sys.argv[3] if len(sys.argv) > 3 else ""
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SELF_JSON = os.path.join(REPO, "CORRECTNESS_SELF.json")
OOM_RETRIES = 3
OOM_BACKOFF_SEC = 5.0


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


def is_oom(e):
    s = str(e).lower()
    return "out of memory" in s or "bad allocation" in s


def run_entry(name, sql, d):
    """One oracle-vs-spark comparison. Returns the driver-artifact record."""
    rec = {"rows_match": False, "schema_match": False, "hash_match": False,
           "spark_rows": None, "oracle_rows": None, "err": None}
    spark_df = ora_df = None
    for attempt in range(1 + OOM_RETRIES):
        try:
            con = fresh_con()
            spark_df = con.execute(
                f"SELECT * FROM read_parquet('{d}/*.parquet')").df()
            ora_df = con.execute(sql).df()
            con.close()
            break
        except Exception as e:
            if is_oom(e) and attempt < OOM_RETRIES:
                print(f"RETRY {name}: DuckDB OOM flake "
                      f"(attempt {attempt + 1}/{OOM_RETRIES}): {e}")
                time.sleep(OOM_BACKOFF_SEC * (attempt + 1))
                continue
            rec["err"] = f"exec error: {e}"
            return rec
    sd = spark_df.reindex(sorted(spark_df.columns), axis=1)
    od = ora_df.reindex(sorted(ora_df.columns), axis=1)
    rec["spark_rows"], rec["oracle_rows"] = len(sd), len(od)
    rec["schema_match"] = list(sd.columns) == list(od.columns)
    rec["rows_match"] = len(sd) == len(od)
    if not rec["schema_match"]:
        rec["err"] = f"columns {list(sd.columns)} vs {list(od.columns)}"
        return rec
    if not rec["rows_match"]:
        rec["err"] = f"rows {len(sd)} vs {len(od)}"
        return rec

    # normalize: lists -> tuples, sort rows (the driver sorts columns by
    # name then hashes values; a full value-equality check subsumes it)
    def norm(df):
        for c in df.columns:
            if df[c].dtype == object:
                df[c] = df[c].map(
                    lambda v: tuple(v) if isinstance(v, (list,)) or
                    type(v).__name__ == "ndarray" else v)
        return df.sort_values(by=list(df.columns)).reset_index(drop=True)
    sd, od = norm(sd), norm(od)
    for c in sd.columns:
        a, b = sd[c], od[c]
        neq = ~((a == b) | (a.isna() & b.isna()))
        if neq.any():
            i = neq.idxmax()
            rec["err"] = f"col {c} row {i}: spark={a[i]!r} oracle={b[i]!r}"
            return rec
    rec["hash_match"] = True
    return rec


if os.path.exists(f"{OUT}/_PARTIAL_DUMP.txt"):
    with open(f"{OUT}/_PARTIAL_DUMP.txt") as f:
        print(f"WARNING: {OUT} was produced by a FILTERED Verify run "
              f"({f.read().strip()}); entries outside the filter are stale "
              f"relative to oracle_sql.json — only trust the filtered names.")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
verdicts = {}
ok = fail = 0
for name, sql in sorted(oracle.items()):
    if FILT and FILT not in name:
        continue
    d = f"{OUT}/{name}"
    if not glob.glob(f"{d}/*.parquet"):
        verdicts[name] = {"rows_match": False, "schema_match": False,
                          "hash_match": False, "spark_rows": 0,
                          "oracle_rows": None, "err": "no spark output"}
        print(f"FAIL {name}: no spark output");  fail += 1;  continue
    rec = run_entry(name, sql, d)
    verdicts[name] = rec
    if rec["hash_match"]:
        print(f"OK   {name} ({rec['spark_rows']} rows)");  ok += 1
    else:
        print(f"FAIL {name}: {rec['err']}");  fail += 1

partial = bool(FILT) or os.path.exists(f"{OUT}/_PARTIAL_DUMP.txt")
dest = f"{OUT}/correctness_partial.json" if partial else SELF_JSON
with open(dest, "w") as f:
    json.dump(verdicts, f, indent=2, sort_keys=True)
    f.write("\n")
print(f"\n{ok} ok, {fail} fail   (self-record: {dest})")
sys.exit(1 if fail else 0)
