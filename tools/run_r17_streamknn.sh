#!/bin/bash
# Round-17 verdict #2: close the 100x STREAM drain to 9/9 by running
# the two DuckDB-OOM oracle rows (sim_knn_ann_kmeans@sf10up,
# sim_knn_ann_hier@sf10up) as 20 source-bucket chunks — the exact
# partition idiom that closed full-corpus kNN (r15, 20/20) and the
# clean string form (r16, 20/20) at 100x. The sim.knnbucket knob
# restricts the SOURCE side of both rows (candidates stay corpus-wide;
# partition laws pinned in QueriesSpec), VerifyStream's nBatches=0
# REUSES the r16-drained root (Doctor-gated) instead of re-draining
# per bucket, and the oracle SQL regenerates the same bucket filter
# from the live conf. One Spark dump + one fresh DuckDB process per
# bucket, strictly serialized (the chunked-oracle discipline).
# Restartable per bucket; run from /root/repo.
cd /root/repo || exit 1
ROOT=${1:-/tmp/stream_root_r16up2}
LOG=/tmp/r17_streamknn.log
exec >>"$LOG" 2>&1
echo "==== run_r17_streamknn $(date -u +%FT%TZ) root=$ROOT ===="
set -o pipefail

# a bucket is done only when its record exists AND is all-green —
# check_oracle_chunked resumes a partial/red record in place, so a
# red bucket re-enters the loop instead of being skipped as done
green() {
  python3 - "$1" <<'EOF'
import json, sys
try:
    rec = json.load(open(sys.argv[1]))
except Exception:
    sys.exit(1)
rows = [v for k, v in rec.items() if k != "_meta" and isinstance(v, dict)]
sys.exit(0 if len(rows) == 2 and all(v.get("hash_match") for v in rows) else 1)
EOF
}

# width-5 chunks (knnbucket=b:5): the oracle's Lloyd chain is
# bucket-independent and dominates each DuckDB run's TIME (~9 min at
# 100x), while the per-source tail dominates MEMORY — 4 chunks/query
# pays the chain 8x instead of 40x, and the w=5 tail (~55 GB) still
# sits under the 85 GB first-attempt cap (the one-piece form's ~230 GB
# tail is the original OOM).
# chunk 0 ran as width-1 before the b:w lever landed (its hier row is
# already green) — keep it and cover the rest as 1:4 + three width-5s
for bw in 0:1 1:4 5:5 10:5 15:5; do
  b=${bw%%:*}; w=${bw##*:}
  if green /tmp/rec_r17_streamknn_b$b.json; then continue; fi
  echo; echo "---- chunk $bw $(date -u +%T) ----"
  if [ ! -f /tmp/vs17up2_b$b/oracle_sql.json ]; then
    rm -rf /tmp/vs17up2_b$b
    sbt -batch "runMain graft.VerifyStream testdata_up/sf10 $ROOT /tmp/vs17up2_b$b 0 conf:spark.graft.sim.ncells=auto,spark.graft.sim.knnbucket=$bw only:sim_knn_ann" \
      | grep -E "\[verify|\[doctor\].*checks|error" || exit 1
  fi
  # first attempt 85GB: the K=633 Lloyd chain alone exceeds the usual
  # 64GB first-try cap, so the cheap attempt is a guaranteed waste here
  python3 tools/check_oracle_chunked.py /tmp/vs17up2_b$b testdata_up/sf10 /tmp/rec_r17_streamknn_b$b.json 1 85GB 100GB | tail -3
done

echo; echo "---- streamknn DONE $(date -u +%T) ----"
ls /tmp/rec_r17_streamknn_b*.json 2>/dev/null | wc -l
python3 - <<'EOF'
import glob, json
ok = bad = 0
for f in sorted(glob.glob('/tmp/rec_r17_streamknn_b*.json')):
    rec = json.load(open(f))
    for k, v in rec.items():
        if k == '_meta' or not isinstance(v, dict):
            continue
        if v.get('hash_match'):
            ok += 1
        else:
            bad += 1
            print('FAIL', f, k, v.get('err'))
print(f'[streamknn] {ok} green, {bad} red across buckets')
EOF
