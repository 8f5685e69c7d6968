#!/bin/bash
# Round-14 verification pass runner — produces the five /tmp inputs
# tools/assemble_r14.py consumes, in dependency order. Restartable:
# each stage is skipped when its output already exists (delete the
# /tmp file to force a rerun). Run from /root/repo.
cd /root/repo || exit 1
LOG=/tmp/r14_passes.log
exec >>"$LOG" 2>&1
echo "==== run_r14_passes $(date -u +%FT%TZ) ===="

# kernel-riding exclusions for the 10x pass — keep in lockstep with
# Bench.UpExcluded
# kernel-riding exclusions (9 names as of the probe-tradeoff + hier rows)
KNN_EX="sim_pairs_threshold,sim_pairs_recall,sim_knn_join,sim_knn_ann_recall,sim_knn_ann_pq_recall,sim_knn_ann_pq_res_recall,sim_knn_ann_pq_tradeoff,sim_knn_ann_probe_tradeoff,sim_knn_ann_hier_recall"

stage() { echo; echo "---- $1 $(date -u +%T) ----"; }

set -o pipefail

# 0. scaled corpora
if [ ! -d testdata_up/sf1 ]; then
  stage "ScaleUp 10x"
  sbt -batch "runMain graft.ScaleUp /root/testdata/sf0.1 testdata_up/sf1 10" | grep -E "\[scaleup\]|error" || exit 1
fi
if [ ! -d testdata_up/sf10 ]; then
  stage "ScaleUp 100x"
  sbt -batch "runMain graft.ScaleUp /root/testdata/sf0.1 testdata_up/sf10 100" | grep -E "\[scaleup\]|error" || exit 1
fi

# 1. sf0.01 full sanity pass (all registered queries, incl. the two
#    new IVFADC rows) — not an assembler input, but the cheap gate that
#    catches a broken registration before the expensive passes run
if [ ! -f /tmp/rec_001.json ]; then
  stage "Verify sf0.01 (full)"
  sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_001" | grep -E "\[verify\]" ;
  python3 tools/check_oracle.py /tmp/verify_001 /root/testdata/sf0.01 /tmp/rec_001.json | tail -3
fi

# 2. stream pass at sf0.01 (8 store-backed queries)
if [ ! -f /tmp/rec_stream.json ]; then
  stage "VerifyStream sf0.01"
  rm -rf /tmp/stream_root /tmp/verify_stream
  sbt -batch "runMain graft.VerifyStream /root/testdata/sf0.01 /tmp/stream_root /tmp/verify_stream 6" | grep -E "\[verify|\[drain|\[doctor|checks" ;
  python3 tools/check_oracle.py /tmp/verify_stream /root/testdata/sf0.01 /tmp/rec_stream.json | tail -3
fi

# 3. stream pass over the 10x corpus at deployment-scaled K
if [ ! -f /tmp/rec_stream_up.json ]; then
  stage "VerifyStream 10x (K=200)"
  rm -rf /tmp/stream_root_up /tmp/verify_stream_up
  sbt -batch "runMain graft.VerifyStream testdata_up/sf1 /tmp/stream_root_up /tmp/verify_stream_up 6 conf:spark.graft.sim.ncells=200" | grep -E "\[verify|\[drain|\[doctor|checks" ;
  python3 tools/check_oracle_chunked.py /tmp/verify_stream_up testdata_up/sf1 /tmp/rec_stream_up.json 4 64GB 100GB | tail -5
fi

# 4. full 10x oracle pass at scaled K (the round-14 K-contract pass;
#    adds sim_knn_ann_pq / _pq_sample / _kmeans / _pq_res — verdict #5)
if [ ! -f /tmp/rec_up.json ]; then
  stage "Verify 10x (K=200)"
  sbt -batch "runMain graft.Verify testdata_up/sf1 /tmp/verify_up exclude:$KNN_EX conf:spark.graft.sim.ncells=200" | grep -E "\[verify\]" ;
  python3 tools/check_oracle_chunked.py /tmp/verify_up testdata_up/sf1 /tmp/rec_up.json 10 64GB 100GB | tail -5
fi

# 5. kNN sample rows over the 100x corpus @K=80 (verdict #3)
if [ ! -f /tmp/rec_up2_knn.json ]; then
  stage "Verify 100x kNN samples (K=80)"
  sbt -batch "runMain graft.Verify testdata_up/sf10 /tmp/verify_up2_knn sim_knn_ann_sample,sim_knn_ann_pq_sample conf:spark.graft.sim.ncells=80" | grep -E "\[verify\]" ;
  python3 tools/check_oracle_chunked.py /tmp/verify_up2_knn testdata_up/sf10 /tmp/rec_up2_knn.json 1 64GB 100GB | tail -5
fi

# 6. substr clean sample over the 100x corpus (verdict #3)
if [ ! -f /tmp/rec_up2_substr.json ]; then
  stage "Verify 100x substr sample"
  sbt -batch "runMain graft.Verify testdata_up/sf10 /tmp/verify_up2_substr dedup_substr_clean_sample" | grep -E "\[verify\]" ;
  python3 tools/check_oracle_chunked.py /tmp/verify_up2_substr testdata_up/sf10 /tmp/rec_up2_substr.json 1 64GB 100GB | tail -5
fi

stage "DONE"
ls -la /tmp/rec_*.json
