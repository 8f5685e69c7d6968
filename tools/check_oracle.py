#!/usr/bin/env python3
"""Local pre-check of the driver's DuckDB oracle compare.

Usage: python3 tools/check_oracle.py /tmp/verify_out /root/testdata/sf0.01
Loads each <name>/ parquet result written by graft.Verify, runs the
matching oracle SQL from oracle_sql.json in DuckDB over the same sf dir,
sorts columns by name and rows by all columns, and diffs values.
"""
import json, math, sys, glob
import duckdb
import pandas as pd

outdir, sfdir = sys.argv[1], sys.argv[2]
oracle = json.load(open(f"{outdir}/oracle_sql.json"))

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

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
    paths = glob.glob(f"{outdir}/{name}/*.parquet")
    if not paths:
        print(f"MISSING  {name}"); fails += 1; continue
    got = norm(pd.concat([pd.read_parquet(p) for p in paths]))
    want = norm(con.execute(oracle[name]).df())
    if list(got.columns) != list(want.columns):
        print(f"SCHEMA   {name}: got {list(got.columns)} want {list(want.columns)}")
        fails += 1; continue
    if len(got) != len(want):
        print(f"ROWS     {name}: got {len(got)} want {len(want)}"); fails += 1; continue
    if not got.equals(want):
        diff = (got != want) & ~(got.isna() & want.isna())
        bad = diff.any(axis=1)
        print(f"VALUES   {name}: {int(bad.sum())}/{len(got)} rows differ")
        print(pd.concat([got[bad].head(3).add_suffix("_got"),
                         want[bad].head(3).add_suffix("_want")], axis=1).to_string())
        fails += 1; continue
    print(f"OK       {name} ({len(got)} rows)")
print(f"\n{len(oracle)-fails}/{len(oracle)} pass")
sys.exit(1 if fails else 0)
