#!/bin/bash
# Round-16 extras — the two remaining verdict items that need the host
# QUIET (timing) or a long solo JVM, run strictly AFTER
# run_r16_passes.sh and run_r16_cleanfull.sh:
#   * verdict #5: the probe+store K-sweep at the 100x corpus (auto-K
#     regime: 633 is the corpus-derived K, 2000/5000 the rungs above)
#     merged into the committed KSWEEP.json beside the 10x assignment
#     sweep;
#   * verdict #7 (stretch): the 100x stream drain under the auto-K
#     contract (the 10x drain is stage 5 of run_r16_passes.sh; the
#     100x drain last ran in r11, pre-auto), with one drained-store
#     query oracle-checked through the chunked DuckDB gate.
# Restartable per stage. Run from /root/repo.
cd /root/repo || exit 1
LOG=/tmp/r16_extras.log
exec >>"$LOG" 2>&1
echo "==== run_r16_extras $(date -u +%FT%TZ) ===="
set -o pipefail

stage() { echo; echo "---- $1 $(date -u +%T) ----"; }

# 0. the round-16 residual composition (sim_knn_ann_hier_pq_res):
#    knob wave at the corpus-derived K, and the full row over the 10x
#    corpus under the auto contract — assemble_r16.py merges both.
if [ ! -f /tmp/rec_r16_hpqres_auto.json ]; then
  stage "Verify sf0.01 hier+PQ-res @auto"
  rm -rf /tmp/verify_r16_hpqres_auto
  sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_r16_hpqres_auto sim_knn_ann_hier_pq_res conf:spark.graft.sim.ncells=auto" | grep -E "\[verify\]|\[graft\]" ;
  python3 tools/check_oracle.py /tmp/verify_r16_hpqres_auto /root/testdata/sf0.01 /tmp/rec_r16_hpqres_auto.json | tail -3
fi
if [ ! -f /tmp/rec_r16_up_res.json ]; then
  stage "Verify 10x hier+PQ-res (ncells=auto -> 200, tb=2)"
  rm -rf /tmp/verify_r16_up_res
  sbt -batch "runMain graft.Verify testdata_up/sf1 /tmp/verify_r16_up_res sim_knn_ann_hier_pq_res conf:spark.graft.sim.ncells=auto,spark.graft.sim.trainbuckets=2" | grep -E "\[verify\]|\[graft\]" ;
  python3 tools/check_oracle_chunked.py /tmp/verify_r16_up_res testdata_up/sf1 /tmp/rec_r16_up_res.json 1 64GB 100GB | tail -3
fi

# 1. probe + store sweep where auto-K lives (judge item #5). tb=8
#    matches the bench's 100x contract; K=633 is what ncells=auto
#    resolves to on this corpus (2M vectors).
if [ ! -f /tmp/KSWEEP_sf10.json ]; then
  stage "KSweep 100x probe+store (K=633,2000,5000)"
  sbt -batch "runMain graft.KSweep testdata_up/sf10 633,2000,5000 8 probe,store /tmp/KSWEEP_sf10.json" \
    | grep -E "\[ksweep\]|error" || exit 1
fi

# 2. merge into the committed record (replaces any prior sf10 entry)
if [ -f /tmp/KSWEEP_sf10.json ]; then
  stage "merge KSWEEP"
  python3 tools/merge_ksweep.py KSWEEP.json /tmp/KSWEEP_sf10.json \
    "round 16: probe+store pairs at the 100x corpus (2M vectors, auto-K 633 and two rungs above, trainbuckets=8) join the 10x assignment sweep — the serving layer's O(sqrt(K)) claim now carries a number at the K the deployment contract resolves"
fi

# 3. 100x stream drain under auto-K (judge item #7): drain, Doctor
#    gate, then the drained-store vector query re-answered from the
#    store and oracle-checked chunked (DuckDB needs the big caps at
#    this scale).
if [ ! -f /tmp/rec_r16_stream_up2.json ]; then
  stage "VerifyStream 100x (ncells=auto -> 633)"
  rm -rf /tmp/stream_root_r16up2 /tmp/verify_stream_r16up2
  sbt -batch "runMain graft.VerifyStream testdata_up/sf10 /tmp/stream_root_r16up2 /tmp/verify_stream_r16up2 6 conf:spark.graft.sim.ncells=auto" \
    | grep -E "\[verify|\[drain|\[doctor|checks|\[graft\]" ;
  python3 tools/check_oracle_chunked.py /tmp/verify_stream_r16up2 testdata_up/sf10 /tmp/rec_r16_stream_up2.json 1 64GB 100GB | tail -5
fi

stage "DONE (extras)"
ls -la /tmp/KSWEEP_sf10.json /tmp/rec_r16_stream_up2.json 2>/dev/null
