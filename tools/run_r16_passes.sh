#!/bin/bash
# Round-16 verification pass runner — produces the /tmp inputs
# tools/assemble_r16.py consumes, in dependency order. Restartable:
# each stage skips when its output exists (delete the /tmp file to
# force a rerun). All outputs carry the r16 suffix — /tmp persists
# across rounds on this host, so unsuffixed names would silently skip
# stages on a PREVIOUS round's artifacts. Spark JVMs and the big
# DuckDB passes are strictly serialized (a capped DuckDB next to a
# Spark JVM gets OOM-killed). Run from /root/repo.
cd /root/repo || exit 1
LOG=/tmp/r16_passes.log
exec >>"$LOG" 2>&1
echo "==== run_r16_passes $(date -u +%FT%TZ) ===="

# kernel-riding exclusions — keep in lockstep with Bench.UpExcluded
KNN_EX="sim_pairs_threshold,sim_pairs_recall,sim_knn_join,sim_knn_ann_recall,sim_knn_ann_pq_recall,sim_knn_ann_pq_res_recall,sim_knn_ann_pq_tradeoff,sim_knn_ann_probe_tradeoff,sim_knn_ann_hier_recall,sim_knn_ann_hier_pq_recall,sim_knn_ann_hier_pq_res_recall"

stage() { echo; echo "---- $1 $(date -u +%T) ----"; }
set -o pipefail

# 0. full test suite (fast, sf0.001) — the cheap gate first. A red
#    suite ABORTS the runner (round-15 advice: falling through let the
#    verification stages run against a failing tree).
if [ ! -f /tmp/r16_tests.ok ]; then
  stage "sbt test"
  sbt -batch test 2>&1 | tail -8 | tee /tmp/r16_tests.tail
  if grep -q "All tests passed" /tmp/r16_tests.tail; then
    touch /tmp/r16_tests.ok
  else
    echo "FATAL: sbt test is red — aborting all verification stages"
    exit 1
  fi
fi

# 1. the r16 bench record: fork-per-scale JVMs, auto-resolved decade K,
#    compact summary (now genuinely tail-sized) as the last stdout line
if [ ! -f BENCH_LOCAL_r16.json ]; then
  stage "Bench r16 (forked scales)"
  SPARK_GRAFT_BENCH_TAG=r16 SPARK_GRAFT_BENCH_PREV=BENCH_LOCAL_r15.json \
    sbt -batch "runMain graft.Bench" 2>&1 | grep -E "\[bench\]|\[graft\]" | tail -40
fi

# 2. full sf0.01 sanity pass (the driver produces the official
#    CORRECTNESS_r16; this catches a broken oracle before the long
#    stages — now 143 queries incl. the composed hier+PQ family and
#    the clean chunk row)
if [ ! -f /tmp/rec_r16a.json ]; then
  stage "Verify sf0.01 (full surface)"
  rm -rf /tmp/verify_r16a
  sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_r16a" | grep -E "\[verify\]|\[graft\]" | tail -5
  python3 tools/check_oracle.py /tmp/verify_r16a /root/testdata/sf0.01 /tmp/rec_r16a.json | tail -3
fi

# 3. full 10x oracle pass under the AUTO contract (auto resolves K=200;
#    trainbuckets=2 stays the decade's training bound) — now includes
#    sim_knn_ann_hier_pq + _sample and dedup_substr_clean_chunk
if [ ! -f /tmp/rec_r16_up.json ]; then
  stage "Verify 10x (ncells=auto -> 200, tb=2)"
  rm -rf /tmp/verify_r16_up
  sbt -batch "runMain graft.Verify testdata_up/sf1 /tmp/verify_r16_up exclude:$KNN_EX conf:spark.graft.sim.ncells=auto,spark.graft.sim.trainbuckets=2" | grep -E "\[verify\]|\[graft\]" ;
  python3 tools/check_oracle_chunked.py /tmp/verify_r16_up testdata_up/sf1 /tmp/rec_r16_up.json 10 64GB 100GB | tail -5
fi

# 4. stream pass at sf0.01
if [ ! -f /tmp/rec_r16_stream.json ]; then
  stage "VerifyStream sf0.01"
  rm -rf /tmp/stream_root_r16 /tmp/verify_stream_r16
  sbt -batch "runMain graft.VerifyStream /root/testdata/sf0.01 /tmp/stream_root_r16 /tmp/verify_stream_r16 6" | grep -E "\[verify|\[drain|\[doctor|checks" ;
  python3 tools/check_oracle.py /tmp/verify_stream_r16 /root/testdata/sf0.01 /tmp/rec_r16_stream.json | tail -3
fi

# 5. stream pass over the 10x corpus under the AUTO contract
if [ ! -f /tmp/rec_r16_stream_up.json ]; then
  stage "VerifyStream 10x (ncells=auto -> 200)"
  rm -rf /tmp/stream_root_r16up /tmp/verify_stream_r16up
  sbt -batch "runMain graft.VerifyStream testdata_up/sf1 /tmp/stream_root_r16up /tmp/verify_stream_r16up 6 conf:spark.graft.sim.ncells=auto" | grep -E "\[verify|\[drain|\[doctor|checks|\[graft\]" ;
  python3 tools/check_oracle_chunked.py /tmp/verify_stream_r16up testdata_up/sf1 /tmp/rec_r16_stream_up.json 4 64GB 100GB | tail -5
fi

# 6. knob waves for the NEW composed family at sf0.01 — the same
#    configurations the r15 sim_ waves gated: hier at a cell-death K,
#    the auto-resolved K, and the degenerate escalated K
if [ ! -f /tmp/rec_r16_hpq_h29.json ]; then
  stage "Verify sf0.01 hier+PQ @h29"
  rm -rf /tmp/verify_r16_hpq_h29
  sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_r16_hpq_h29 sim_knn_ann_hier_pq,sim_knn_ann_hier_pq_sample,sim_knn_ann_hier_pq_recall conf:spark.graft.sim.ncells=29,spark.graft.sim.assign=hier" | grep -E "\[verify\]" ;
  python3 tools/check_oracle.py /tmp/verify_r16_hpq_h29 /root/testdata/sf0.01 /tmp/rec_r16_hpq_h29.json | tail -3
fi
if [ ! -f /tmp/rec_r16_hpq_auto.json ]; then
  stage "Verify sf0.01 hier+PQ @auto"
  rm -rf /tmp/verify_r16_hpq_auto
  sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_r16_hpq_auto sim_knn_ann_hier_pq,sim_knn_ann_hier_pq_sample,sim_knn_ann_hier_pq_recall conf:spark.graft.sim.ncells=auto" | grep -E "\[verify\]|\[graft\]" ;
  python3 tools/check_oracle.py /tmp/verify_r16_hpq_auto /root/testdata/sf0.01 /tmp/rec_r16_hpq_auto.json | tail -3
fi
if [ ! -f /tmp/rec_r16_hpq_aa.json ]; then
  stage "Verify sf0.01 hier+PQ @aa2000"
  rm -rf /tmp/verify_r16_hpq_aa
  sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_r16_hpq_aa sim_knn_ann_hier_pq,sim_knn_ann_hier_pq_sample conf:spark.graft.sim.ncells=2000,spark.graft.sim.assign=auto" | grep -E "\[verify\]" ;
  python3 tools/check_oracle.py /tmp/verify_r16_hpq_aa /root/testdata/sf0.01 /tmp/rec_r16_hpq_aa.json | tail -3
fi

# 7. kNN sample rows over the 100x corpus @K=80 — the r15 comparability
#    row plus the NEW composed sample; also the clean chunk knob's
#    bucket-0 row at 100x (the other 19 run in run_r16_cleanfull.sh)
if [ ! -f /tmp/rec_r16_up2_knn.json ]; then
  stage "Verify 100x kNN samples (K=80, + hier_pq)"
  rm -rf /tmp/verify_r16_up2_knn
  sbt -batch "runMain graft.Verify testdata_up/sf10 /tmp/verify_r16_up2_knn sim_knn_ann_sample,sim_knn_ann_pq_sample,sim_knn_ann_hier_sample,sim_knn_ann_hier_pq_sample conf:spark.graft.sim.ncells=80" | grep -E "\[verify\]" ;
  python3 tools/check_oracle_chunked.py /tmp/verify_r16_up2_knn testdata_up/sf10 /tmp/rec_r16_up2_knn.json 1 64GB 100GB | tail -5
fi

# 8. the composed sample at the bench's actual 100x contract K, gated
#    at the 10x corpus where the DuckDB chain stays feasible (the
#    @k633aa wave, extended to the new family)
if [ ! -f /tmp/rec_r16_k633aa.json ]; then
  stage "Verify 10x @k633 (assign auto->hier, + hier_pq sample)"
  rm -rf /tmp/verify_r16_k633aa
  sbt -batch "runMain graft.Verify testdata_up/sf1 /tmp/verify_r16_k633aa sim_kmeans_cells,sim_knn_ann_kmeans,sim_knn_ann_sample,sim_knn_ann_hier_pq_sample conf:spark.graft.sim.ncells=633,spark.graft.sim.trainbuckets=8" | grep -E "\[verify\]" ;
  python3 tools/check_oracle_chunked.py /tmp/verify_r16_k633aa testdata_up/sf1 /tmp/rec_r16_k633aa.json 1 64GB 100GB | tail -5
fi

stage "DONE (core)"
ls -la /tmp/rec_r16*.json 2>/dev/null
