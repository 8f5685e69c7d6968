#!/bin/bash
# Round-15 verification pass runner — produces the /tmp inputs
# tools/assemble_r15.py consumes, in dependency order. Restartable:
# each stage skips when its output exists (delete the /tmp file to
# force a rerun). Spark JVMs and the big DuckDB passes are strictly
# serialized (verify-skill gotcha: a capped DuckDB next to a Spark JVM
# gets OOM-killed). Run from /root/repo.
cd /root/repo || exit 1
LOG=/tmp/r15_passes.log
exec >>"$LOG" 2>&1
echo "==== run_r15_passes $(date -u +%FT%TZ) ===="

# kernel-riding exclusions — keep in lockstep with Bench.UpExcluded
KNN_EX="sim_pairs_threshold,sim_pairs_recall,sim_knn_join,sim_knn_ann_recall,sim_knn_ann_pq_recall,sim_knn_ann_pq_res_recall,sim_knn_ann_pq_tradeoff,sim_knn_ann_probe_tradeoff,sim_knn_ann_hier_recall"

stage() { echo; echo "---- $1 $(date -u +%T) ----"; }
set -o pipefail

# 0. full test suite (fast, sf0.001) — the cheap gate first
if [ ! -f /tmp/r15_tests.ok ]; then
  stage "sbt test"
  sbt -batch test 2>&1 | tail -8 | tee /tmp/r15_tests.tail
  grep -q "All tests passed" /tmp/r15_tests.tail && touch /tmp/r15_tests.ok
fi

# 1. the r15 bench record: fork-per-scale JVMs, auto-resolved decade K,
#    compact summary as the last stdout line
if [ ! -f BENCH_LOCAL_r15.json ]; then
  stage "Bench r15 (forked scales)"
  SPARK_GRAFT_BENCH_TAG=r15 SPARK_GRAFT_BENCH_PREV=BENCH_LOCAL_r14.json \
    sbt -batch "runMain graft.Bench" 2>&1 | grep -E "\[bench\]|\[graft\]" | tail -40
fi

# 2. full 10x oracle pass under the AUTO contract (judge item #3's
#    done-criterion: NO explicit ncells — auto resolves K=200 from the
#    corpus; trainbuckets=2 stays the decade's training bound)
if [ ! -f /tmp/rec_up.json ]; then
  stage "Verify 10x (ncells=auto -> 200, tb=2)"
  rm -rf /tmp/verify_up
  sbt -batch "runMain graft.Verify testdata_up/sf1 /tmp/verify_up exclude:$KNN_EX conf:spark.graft.sim.ncells=auto,spark.graft.sim.trainbuckets=2" | grep -E "\[verify\]|\[graft\]" ;
  python3 tools/check_oracle_chunked.py /tmp/verify_up testdata_up/sf1 /tmp/rec_up.json 10 64GB 100GB | tail -5
fi

# 3. stream pass at sf0.01
if [ ! -f /tmp/rec_stream.json ]; then
  stage "VerifyStream sf0.01"
  rm -rf /tmp/stream_root /tmp/verify_stream
  sbt -batch "runMain graft.VerifyStream /root/testdata/sf0.01 /tmp/stream_root /tmp/verify_stream 6" | grep -E "\[verify|\[drain|\[doctor|checks" ;
  python3 tools/check_oracle.py /tmp/verify_stream /root/testdata/sf0.01 /tmp/rec_stream.json | tail -3
fi

# 4. stream pass over the 10x corpus under the AUTO contract
if [ ! -f /tmp/rec_stream_up.json ]; then
  stage "VerifyStream 10x (ncells=auto -> 200)"
  rm -rf /tmp/stream_root_up /tmp/verify_stream_up
  sbt -batch "runMain graft.VerifyStream testdata_up/sf1 /tmp/stream_root_up /tmp/verify_stream_up 6 conf:spark.graft.sim.ncells=auto" | grep -E "\[verify|\[drain|\[doctor|checks|\[graft\]" ;
  python3 tools/check_oracle_chunked.py /tmp/verify_stream_up testdata_up/sf1 /tmp/rec_stream_up.json 4 64GB 100GB | tail -5
fi

# 5. kNN sample rows over the 100x corpus @K=80 (r14 comparability row;
#    auto-assign resolves flat below the 500 threshold)
if [ ! -f /tmp/rec_up2_knn.json ]; then
  stage "Verify 100x kNN samples (K=80)"
  rm -rf /tmp/verify_up2_knn
  sbt -batch "runMain graft.Verify testdata_up/sf10 /tmp/verify_up2_knn sim_knn_ann_sample,sim_knn_ann_pq_sample,sim_knn_ann_hier_sample conf:spark.graft.sim.ncells=80" | grep -E "\[verify\]" ;
  python3 tools/check_oracle_chunked.py /tmp/verify_up2_knn testdata_up/sf10 /tmp/rec_up2_knn.json 1 64GB 100GB | tail -5
fi

# 6. substr clean sample over the 100x corpus
if [ ! -f /tmp/rec_up2_substr.json ]; then
  stage "Verify 100x substr sample"
  rm -rf /tmp/verify_up2_substr
  sbt -batch "runMain graft.Verify testdata_up/sf10 /tmp/verify_up2_substr dedup_substr_clean_sample" | grep -E "\[verify\]" ;
  python3 tools/check_oracle_chunked.py /tmp/verify_up2_substr testdata_up/sf10 /tmp/rec_up2_substr.json 1 64GB 100GB | tail -5
fi

# 7. the r15 bench up2 contract as oracle rows: ncells=633 (what auto
#    resolves at 100x) with DEFAULT assign — auto escalates to hier at
#    K>=500, so these rows gate the exact configuration the bench runs,
#    over the 10x corpus where the DuckDB chain stays feasible
if [ ! -f /tmp/rec_k633aa.json ]; then
  stage "Verify 10x @k633 (assign auto->hier)"
  rm -rf /tmp/verify_k633aa
  sbt -batch "runMain graft.Verify testdata_up/sf1 /tmp/verify_k633aa sim_kmeans_cells,sim_knn_ann_kmeans,sim_knn_ann_sample conf:spark.graft.sim.ncells=633,spark.graft.sim.trainbuckets=8" | grep -E "\[verify\]" ;
  python3 tools/check_oracle_chunked.py /tmp/verify_k633aa testdata_up/sf1 /tmp/rec_k633aa.json 1 64GB 100GB | tail -5
fi

# 8. the r14 @k200ha row re-gated under the K2-consistency fix + native
#    expression (K=200 at 10x is where trained cells can die)
if [ ! -f /tmp/rec_k200ha.json ]; then
  stage "Verify 10x @k200 assign=hier (sim_kmeans_cells)"
  rm -rf /tmp/verify_k200ha
  sbt -batch "runMain graft.Verify testdata_up/sf1 /tmp/verify_k200ha sim_kmeans_cells,sim_knn_ann_kmeans conf:spark.graft.sim.ncells=200,spark.graft.sim.assign=hier,spark.graft.sim.trainbuckets=2" | grep -E "\[verify\]" ;
  python3 tools/check_oracle_chunked.py /tmp/verify_k200ha testdata_up/sf1 /tmp/rec_k200ha.json 1 64GB 100GB | tail -5
fi

stage "DONE (core)"
ls -la /tmp/rec_*.json 2>/dev/null
