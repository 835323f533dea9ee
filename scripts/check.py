#!/usr/bin/env python3
"""Dev harness mimicking the driver's correctness gate: for each query
result parquet under OUT, run the matching oracle SQL from oracle_sql.json
in DuckDB (tables = the sf parquet files) and compare values.

ISOLATION (round-5 judge ask #1): every entry runs in its OWN forked
subprocess. DuckDB's flake on this guest ("Out of Memory ... bad
allocation" once a big JVM has hogged RAM) is PROCESS-WIDE — after the
first failure every retry in the same Python process fails too, while
the identical entry passes instantly in a fresh process (measured: 3x~150
in-process retries all dead vs 157/157 first-pass in subprocesses). So
the parent never imports duckdb at all; it fans entries out to
`check.py --entry NAME` children (8 at a time), retries an OOM-failed
entry in up to 2 more fresh children, and merges the verdicts.

The verdict file is written INCREMENTALLY after every entry, so a crash
half-way still leaves a usable record. FULL (unfiltered) runs write the
driver-artifact shape ({name: {rows_match, schema_match, hash_match,
spark_rows, oracle_rows, err}}) to CORRECTNESS_SELF.json in the repo
root; filtered runs write OUT/correctness_partial.json instead, never
touching the committed record.

Usage: check.py [sfDir] [outDir] [query_filter_substr]
       check.py --entry NAME sfDir outDir   (internal: one entry, JSON on stdout)
"""
import json, subprocess, sys, os, glob
from concurrent.futures import ThreadPoolExecutor

OOM_RETRIES = 2          # extra fresh-subprocess attempts per entry
ENTRY_TIMEOUT_SEC = 600  # hard wall per child (a hung child <> a dead gate)
POOL = 8


def is_oom(msg):
    s = str(msg).lower()
    return "out of memory" in s or "bad allocation" in s


# --------------------------------------------------------------------------
# child mode: ONE entry, fresh process, one JSON line on stdout
# --------------------------------------------------------------------------
def run_entry_child(name, sf, out):
    import duckdb
    rec = {"rows_match": False, "schema_match": False, "hash_match": False,
           "spark_rows": None, "oracle_rows": None, "err": None}
    sql = json.load(open(f"{out}/oracle_sql.json"))[name]
    d = f"{out}/{name}"
    try:
        con = duckdb.connect()
        for t in ["region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events", "documents", "embeddings"]:
            p = f"{sf}/{t}.parquet"
            if os.path.exists(p):
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
        spark_df = con.execute(
            f"SELECT * FROM read_parquet('{d}/*.parquet')").df()
        ora_df = con.execute(sql).df()
        con.close()
    except Exception as e:
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


if len(sys.argv) > 1 and sys.argv[1] == "--entry":
    print(json.dumps(run_entry_child(sys.argv[2], sys.argv[3], sys.argv[4])))
    sys.exit(0)


# --------------------------------------------------------------------------
# parent mode: fan out, retry OOM in fresh children, merge + write as we go
# --------------------------------------------------------------------------
SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
FILT = sys.argv[3] if len(sys.argv) > 3 else ""
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SELF_JSON = os.path.join(REPO, "CORRECTNESS_SELF.json")


def run_entry(name):
    """One entry in a fresh subprocess; OOM retries get new processes."""
    last = None
    for attempt in range(1 + OOM_RETRIES):
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--entry", name, SF, OUT],
                capture_output=True, text=True, timeout=ENTRY_TIMEOUT_SEC)
            if r.returncode == 0 and r.stdout.strip():
                rec = json.loads(r.stdout.strip().splitlines()[-1])
            else:
                rec = {"rows_match": False, "schema_match": False,
                       "hash_match": False, "spark_rows": None,
                       "oracle_rows": None,
                       "err": f"child rc={r.returncode}: "
                              f"{(r.stderr or '')[-400:]}"}
        except subprocess.TimeoutExpired:
            rec = {"rows_match": False, "schema_match": False,
                   "hash_match": False, "spark_rows": None,
                   "oracle_rows": None,
                   "err": f"child timeout after {ENTRY_TIMEOUT_SEC}s"}
        except Exception as e:
            rec = {"rows_match": False, "schema_match": False,
                   "hash_match": False, "spark_rows": None,
                   "oracle_rows": None, "err": f"harness error: {e}"}
        last = rec
        if rec["hash_match"] or not is_oom(rec.get("err")):
            return name, rec, attempt
    return name, last, OOM_RETRIES


if os.path.exists(f"{OUT}/_PARTIAL_DUMP.txt"):
    with open(f"{OUT}/_PARTIAL_DUMP.txt") as f:
        print(f"WARNING: {OUT} was produced by a FILTERED Verify run "
              f"({f.read().strip()}); entries outside the filter are stale "
              f"relative to oracle_sql.json — only trust the filtered names.")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
names = [n for n in sorted(oracle) if not FILT or FILT in n]
partial = bool(FILT) or os.path.exists(f"{OUT}/_PARTIAL_DUMP.txt")
dest = f"{OUT}/correctness_partial.json" if partial else SELF_JSON

verdicts = {}
ok = fail = 0


def flush():
    # incremental atomic write: a crash mid-run leaves the last good record
    tmp = dest + ".tmp"
    with open(tmp, "w") as f:
        json.dump(verdicts, f, indent=2, sort_keys=True)
        f.write("\n")
    os.replace(tmp, dest)


todo = []
for n in names:
    if glob.glob(f"{OUT}/{n}/*.parquet"):
        todo.append(n)
    else:
        verdicts[n] = {"rows_match": False, "schema_match": False,
                       "hash_match": False, "spark_rows": 0,
                       "oracle_rows": None, "err": "no spark output"}
        print(f"FAIL {n}: no spark output")
        fail += 1
flush()

with ThreadPoolExecutor(max_workers=POOL) as ex:
    for name, rec, attempts in ex.map(run_entry, todo):
        verdicts[name] = rec
        retried = f" (after {attempts} OOM retries)" if attempts else ""
        if rec["hash_match"]:
            print(f"OK   {name} ({rec['spark_rows']} rows){retried}")
            ok += 1
        else:
            print(f"FAIL {name}: {rec['err']}{retried}")
            fail += 1
        flush()

print(f"\n{ok} ok, {fail} fail   (self-record: {dest})")
sys.exit(1 if fail else 0)
