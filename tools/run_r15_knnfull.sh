#!/bin/bash
# Round-15 stretch: FULL-corpus kNN oracle coverage at 100x, as 20
# DuckDB-feasible chunks (judge stretch #8). The sim.knnsamplebucket
# knob restricts sim_knn_ann_sample to source bucket b; the 20 buckets
# PARTITION the source ids (spec-pinned in QueriesSpec), and the probe
# is per-source independent, so bucket-by-bucket hash equality IS
# full-corpus equality. Each bucket is one Spark dump + one fresh
# DuckDB process (the chunked-oracle discipline), strictly serialized.
# Restartable per bucket; run from /root/repo AFTER run_r15_passes.sh.
cd /root/repo || exit 1
LOG=/tmp/r15_knnfull.log
exec >>"$LOG" 2>&1
echo "==== run_r15_knnfull $(date -u +%FT%TZ) ===="
set -o pipefail

for b in $(seq 0 19); do
  if [ -f /tmp/rec_up2_knnb$b.json ]; then continue; fi
  echo; echo "---- bucket $b $(date -u +%T) ----"
  rm -rf /tmp/verify_up2_knnb$b
  sbt -batch "runMain graft.Verify testdata_up/sf10 /tmp/verify_up2_knnb$b sim_knn_ann_sample conf:spark.graft.sim.ncells=80,spark.graft.sim.knnsamplebucket=$b" | grep -E "\[verify\]" || exit 1
  python3 tools/check_oracle_chunked.py /tmp/verify_up2_knnb$b testdata_up/sf10 /tmp/rec_up2_knnb$b.json 1 64GB 100GB | tail -3
done

echo; echo "---- knnfull DONE $(date -u +%T) ----"
ls -la /tmp/rec_up2_knnb*.json 2>/dev/null | wc -l
