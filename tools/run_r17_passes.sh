#!/bin/bash
# Round-17 one-command evidence runner (round-16 verdict stretch #8):
# regenerates every gate this round owns, resumable per stage — each
# stage is skipped when its record already exists, so a partial failure
# resumes with the same invocation. Stages are STRICTLY serialized and
# ordered so no Spark JVM ever runs beside a big DuckDB pass and the
# bench measures a quiet host:
#   1. 100x stream kNN chunk sweep (Spark dump + DuckDB per chunk)
#   2. assemble chunks into CORRECTNESS_STREAM.json
#   3. local bench @ sf0.1 (tagged r17) — quiet host
#   4. 100x K-sweep at deployment K=633 + the K~2000 rung, warm,
#      probe+store pairs (round-16 verdict #6)
#   5. merge the sf10 sweep into KSWEEP.json
# Run from /root/repo. Log: /tmp/r17_passes.log
cd /root/repo || exit 1
LOG=/tmp/r17_passes.log
exec >>"$LOG" 2>&1
echo; echo "==== run_r17_passes $(date -u +%FT%TZ) ===="
set -o pipefail
stage() { echo; echo "== [$(date -u +%T)] $1 =="; }

# 1+2. stream kNN chunks -> CORRECTNESS_STREAM
if ! python3 - <<'EOF'
import json, sys
d = json.load(open("CORRECTNESS_STREAM.json"))
sys.exit(0 if "round17_delta" in d.get("_meta", {}) else 1)
EOF
then
  stage "100x stream kNN chunk sweep"
  bash tools/run_r17_streamknn.sh || exit 1
  stage "assemble chunks -> CORRECTNESS_STREAM.json"
  python3 tools/assemble_r17.py || exit 1
fi

# 3. local bench (median of 3) at sf0.1, tagged
if [ ! -f BENCH_LOCAL_r17.json ]; then
  stage "local bench sf0.1 (tag r17)"
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_BENCH_TAG=r17 \
    sbt -batch "runMain graft.Bench" | tail -2
fi

# 4+5. 100x K-sweep: deployment K=633 + the rung above, WARM — reps=1
# now measures a warmed run (KSweep's warm-ups are unconditional since
# r16 advice #4), which is exactly the "one warm rep per rung" the
# verdict asked for at minutes-per-measurement cost. One invocation
# per K so a round boundary keeps whichever rungs finished.
if [ ! -f /tmp/KSWEEP_sf10_k633_r17.json ]; then
  stage "100x K-sweep rung K=633 (probe+store; warm, reps=1)"
  sbt -batch "runMain graft.KSweep testdata_up/sf10 633 8 probe,store /tmp/KSWEEP_sf10_k633_r17.json 1" | grep -E "\[ksweep\]"
fi
if [ ! -f /tmp/KSWEEP_sf10_k2000_r17.json ]; then
  stage "100x K-sweep rung K=2000 (probe+store; warm, reps=1)"
  sbt -batch "runMain graft.KSweep testdata_up/sf10 2000 8 probe,store /tmp/KSWEEP_sf10_k2000_r17.json 1" | grep -E "\[ksweep\]"
fi
if [ -f /tmp/KSWEEP_sf10_k633_r17.json ]; then
  stage "merge sf10 rungs into KSWEEP.json"
  python3 - <<'EOF'
import json
rows = []
for p in ("/tmp/KSWEEP_sf10_k633_r17.json", "/tmp/KSWEEP_sf10_k2000_r17.json"):
    try:
        rows += json.load(open(p))["sweep"]
    except Exception:
        pass
rec = {"corpus": "testdata_up/sf10", "trainbuckets": "8", "reps": 1,
       "warm": True, "sweep": rows}
json.dump(rec, open("/tmp/KSWEEP_sf10_r17.json", "w"))
EOF
  python3 tools/merge_ksweep.py KSWEEP.json /tmp/KSWEEP_sf10_r17.json \
    "round 17: the 100x sweep re-ran WARM (unconditional warm-ups before every measured rep - r16 advice #4; reps=1 thereafter) at the deployment K=633 plus the K=2000 rung above (r16 verdict #6), probe+store pairs; rows carry probe_auto/store_auto - what the new probe=auto policy picks at each (corpus, K, context) and whether the pick is the measured winner. The sf1 rows keep r15/r16 provenance (the superseded reps=1-cold sf10 single-shot lives in git history)." || true
fi

stage "DONE"
ls -la BENCH_LOCAL_r17.json /tmp/KSWEEP_sf10_r17.json 2>/dev/null
