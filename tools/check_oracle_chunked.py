#!/usr/bin/env python3
"""Chunked driver for check_oracle.py — the reliable harness for the
big scale corpora (testdata_up/sf1, sf10).

A single DuckDB/pandas process accumulates memory across hundreds of
large-scale oracles (buffer blocks plus dataframe fragmentation) until
allocations fail mid-pass, poisoning every later query in the process.
This wrapper runs check_oracle.py in FRESH processes — `chunk` queries
per invocation via GRAFT_ORACLE_ONLY — and retries any failed query
once, alone, with a raised memory cap (a failure inside a chunk can be
cascade damage from an earlier query in the same process, not a real
mismatch). Exit code 0 iff every query hash-matches.

Usage:
  python3 tools/check_oracle_chunked.py <verify_outdir> <sfdir> <out.json>
      [chunk_size=10] [mem=64GB] [retry_mem=100GB]
"""
import json, os, subprocess, sys, tempfile

outdir, sfdir, outjson = sys.argv[1], sys.argv[2], sys.argv[3]
chunk = int(sys.argv[4]) if len(sys.argv) > 4 else 10
mem = sys.argv[5] if len(sys.argv) > 5 else "64GB"
retry_mem = sys.argv[6] if len(sys.argv) > 6 else "100GB"
here = os.path.dirname(os.path.abspath(__file__))

names = sorted(json.load(open(f"{outdir}/oracle_sql.json")))

# GRAFT_ORACLE_SKIP: comma-list of queries NOT to attempt in this pass —
# for rows whose one-piece DuckDB form is known-infeasible at the scale
# (the 100x store-served kNN rows need ~230 GB; their evidence is the
# chunked knnbucket sweep). The skip is loud and the assembler writes
# the delegation into the row itself.
skip = [s for s in os.environ.get("GRAFT_ORACLE_SKIP", "").split(",") if s]
if skip:
    print(f"[chunked] skipping by GRAFT_ORACLE_SKIP: {sorted(skip)}")
    names = [n for n in names if n not in skip]
merged = {}

# Resume: a prior (possibly killed) run of this tool left a partial or
# complete record at outjson — preload it and skip every query that
# already hash-matched, so a crash mid-pass costs one chunk, not the
# whole multi-hour pass. Combined with the per-chunk dump below this
# makes the pass restartable by re-running the same command line.
if os.path.exists(outjson):
    try:
        prior = json.load(open(outjson))
        merged.update({k: v for k, v in prior.items()
                       if k != "_meta" and isinstance(v, dict)
                       and v.get("hash_match")})
        if merged:
            print(f"[chunked] resume: {len(merged)} hash-matched rows "
                  f"preloaded from {outjson}")
    except Exception:
        pass

def run(subset, memlimit):
    fd, part = tempfile.mkstemp(suffix=".json"); os.close(fd)
    env = dict(os.environ, GRAFT_ORACLE_ONLY=",".join(subset),
               GRAFT_DUCKDB_MEM=memlimit)
    subprocess.run([sys.executable, "-u", os.path.join(here, "check_oracle.py"),
                    outdir, sfdir, part], env=env)
    try:
        rec = json.load(open(part))
    except Exception:
        rec = {}  # the process died before writing — every query retries
    os.unlink(part)
    return {k: v for k, v in rec.items() if k != "_meta"}

def checkpoint():
    json.dump(merged, open(outjson, "w"), indent=1, sort_keys=True)

for i in range(0, len(names), chunk):
    todo = [n for n in names[i:i + chunk]
            if not (isinstance(merged.get(n), dict)
                    and merged[n].get("hash_match"))]
    if not todo:
        continue
    merged.update(run(todo, mem))
    checkpoint()  # crash-durable progress: each chunk lands on disk

failed = [k for k in names
          if not (isinstance(merged.get(k), dict) and merged[k].get("hash_match"))]
for q in failed:  # one-at-a-time retry: fresh process, raised cap
    merged.update(run([q], retry_mem))
    checkpoint()

ok = sum(1 for k in names
         if isinstance(merged.get(k), dict) and merged[k].get("hash_match"))
merged["_meta"] = {"harness": "check_oracle_chunked.py "
                   f"(chunk={chunk}, mem={mem}, retry_mem={retry_mem})",
                   "result": f"{ok}/{len(names)} pass"}
json.dump(merged, open(outjson, "w"), indent=1, sort_keys=True)
print(f"\n[chunked] {ok}/{len(names)} pass -> {outjson}")
sys.exit(0 if ok == len(names) else 1)
