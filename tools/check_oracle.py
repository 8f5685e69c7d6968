#!/usr/bin/env python3
"""Local pre-check of the driver's DuckDB oracle compare.

Usage: python3 tools/check_oracle.py /tmp/verify_out /root/testdata/sf0.01
Loads each <name>/ parquet result written by graft.Verify, runs the
matching oracle SQL from oracle_sql.json in DuckDB over the same sf dir,
sorts columns by name and rows by all columns, and diffs values.
"""
import json, math, sys, glob, time
import duckdb
import pandas as pd

outdir, sfdir = sys.argv[1], sys.argv[2]
# optional 3rd arg: write a per-query JSON record (the driver's
# CORRECTNESS_r{N}.json shape) to this path
json_out = sys.argv[3] if len(sys.argv) > 3 else None
record = {}
oracle = json.load(open(f"{outdir}/oracle_sql.json"))

con = duckdb.connect()
import os
# Survive the big scale passes: spill hash joins/aggregates to disk
# instead of dying, and honor an explicit cap so a concurrently running
# Spark JVM can't push the process into the kernel OOM killer (the
# default limit is 80% of physical RAM with no spill directory).
os.makedirs("/tmp/duckdb_spill", exist_ok=True)
con.execute("SET temp_directory='/tmp/duckdb_spill'")
if os.environ.get("GRAFT_DUCKDB_MEM"):
    con.execute(f"SET memory_limit='{os.environ['GRAFT_DUCKDB_MEM']}'")
# GRAFT_ORACLE_ONLY=a,b,c restricts the compare to the named queries.
# The big scale passes accumulate process memory across hundreds of
# heavy oracles (DuckDB buffer blocks + pandas fragmentation) until
# allocations fail mid-pass; chunking into fresh processes — one
# invocation per subset, merge the JSON records — sidesteps it.
if os.environ.get("GRAFT_ORACLE_ONLY"):
    keep = set(os.environ["GRAFT_ORACLE_ONLY"].split(","))
    oracle = {k: v for k, v in oracle.items() if k in keep}
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    # driver corpora are single files; Spark-written corpora (graft.ScaleUp's
    # up-scale output) are directories of part files — read either shape
    path = f"{sfdir}/{t}.parquet"
    if os.path.isdir(path):
        path = f"{path}/*.parquet"
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]) or df[c].dtype == object and \
           df[c].map(lambda v: hasattr(v, "isoformat") or v is None).all() and len(df):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

fails = 0
for name in sorted(oracle):
    rec = {"rows_match": False, "schema_match": False, "hash_match": False,
           "spark_rows": None, "oracle_rows": None, "err": None,
           "oracle_sec": None}
    record[name] = rec
    paths = glob.glob(f"{outdir}/{name}/*.parquet")
    if not paths:
        print(f"MISSING  {name}"); rec["err"] = "missing spark result"
        fails += 1; continue
    try:
        got = norm(pd.concat([pd.read_parquet(p) for p in paths]))
        t0 = time.time()
        want = norm(con.execute(oracle[name]).df())
        rec["oracle_sec"] = round(time.time() - t0, 3)
    except Exception as e:
        print(f"ERROR    {name}: {e}"); rec["err"] = str(e)[:300]
        fails += 1; continue
    rec["spark_rows"], rec["oracle_rows"] = len(got), len(want)
    if list(got.columns) != list(want.columns):
        print(f"SCHEMA   {name}: got {list(got.columns)} want {list(want.columns)}")
        rec["err"] = "schema mismatch"; fails += 1; continue
    rec["schema_match"] = True
    if len(got) != len(want):
        print(f"ROWS     {name}: got {len(got)} want {len(want)}")
        rec["err"] = "row count mismatch"; fails += 1; continue
    rec["rows_match"] = True
    if not got.equals(want):
        diff = (got != want) & ~(got.isna() & want.isna())
        bad = diff.any(axis=1)
        print(f"VALUES   {name}: {int(bad.sum())}/{len(got)} rows differ")
        print(pd.concat([got[bad].head(3).add_suffix("_got"),
                         want[bad].head(3).add_suffix("_want")], axis=1).to_string())
        rec["err"] = "value mismatch"; fails += 1; continue
    rec["hash_match"] = True
    print(f"OK       {name} ({len(got)} rows)")
print(f"\n{len(oracle)-fails}/{len(oracle)} pass")
if json_out:
    with open(json_out, "w") as f:
        json.dump(record, f, indent=2, sort_keys=True)
sys.exit(1 if fails else 0)
