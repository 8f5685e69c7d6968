#!/bin/bash
# Round-14 second knob wave: the probe-width (sim.nprobe) and
# bounded-trainer (sim.trainbuckets) knobs through the full DuckDB
# gate, plus the combined decade row matching the bench's up-decade
# deployment contract (K=200, B=2 over testdata_up/sf1). Restartable:
# stages skip when their /tmp output exists. Run from /root/repo.
cd /root/repo || exit 1
LOG=/tmp/r14_knobs2.log
exec >>"$LOG" 2>&1
echo "==== run_r14_knobs2 $(date -u +%FT%TZ) ===="

stage() { echo; echo "---- $1 $(date -u +%T) ----"; }
set -o pipefail

# 1. probe-width knob: the whole sim_ family at nprobe=6 (queries that
#    don't consume nprobe dump identically and still hash-check)
if [ ! -f /tmp/rec_np6.json ]; then
  stage "Verify sf0.01 sim_ @np6"
  rm -rf /tmp/verify_np6
  sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_np6 sim_ conf:spark.graft.sim.nprobe=6" | grep -E "\[verify\]" ;
  python3 tools/check_oracle.py /tmp/verify_np6 /root/testdata/sf0.01 /tmp/rec_np6.json | tail -3
fi

# 2. bounded-trainer knob: the whole sim_ family at trainbuckets=3
if [ ! -f /tmp/rec_tb3.json ]; then
  stage "Verify sf0.01 sim_ @tb3"
  rm -rf /tmp/verify_tb3
  sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_tb3 sim_ conf:spark.graft.sim.trainbuckets=3" | grep -E "\[verify\]" ;
  python3 tools/check_oracle.py /tmp/verify_tb3 /root/testdata/sf0.01 /tmp/rec_tb3.json | tail -3
fi

# 3. the bench decade contract as an oracle row: K=200 AND B=2 over the
#    10x corpus for the trained-quantizer representatives
if [ ! -f /tmp/rec_k200tb2_up.json ]; then
  stage "Verify 10x (K=200, B=2)"
  rm -rf /tmp/verify_k200tb2
  sbt -batch "runMain graft.Verify testdata_up/sf1 /tmp/verify_k200tb2 sim_kmeans_cells,sim_knn_ann_kmeans,sim_knn_ann_sample,sim_knn_ann_pq_sample conf:spark.graft.sim.ncells=200,spark.graft.sim.trainbuckets=2" | grep -E "\[verify\]" ;
  python3 tools/check_oracle_chunked.py /tmp/verify_k200tb2 testdata_up/sf1 /tmp/rec_k200tb2_up.json 2 64GB 100GB | tail -5
fi

# 4. the hierarchical-probe kNN at the 10x decade (K=200: K2=15 > the
#    probe width, so the two-level pruning actually bites here) — a
#    supplementary row for CORRECTNESS_UP (the full 10x pass predates
#    the query)
if [ ! -f /tmp/rec_hier_up.json ]; then
  stage "Verify 10x sim_knn_ann_hier (K=200)"
  rm -rf /tmp/verify_hier_up
  # the prefix also catches sim_knn_ann_hier_recall, which rides the
  # exact kernel and refuses at this scale (a loud [verify] failed line,
  # expected); the oracle compare scopes to the parent row
  sbt -batch "runMain graft.Verify testdata_up/sf1 /tmp/verify_hier_up sim_knn_ann_hier conf:spark.graft.sim.ncells=200" | grep -E "\[verify\]" ;
  GRAFT_ORACLE_ONLY=sim_knn_ann_hier GRAFT_DUCKDB_MEM=64GB \
    python3 tools/check_oracle.py /tmp/verify_hier_up testdata_up/sf1 /tmp/rec_hier_up.json | tail -3
fi

stage "DONE"
ls -la /tmp/rec_np6.json /tmp/rec_tb3.json /tmp/rec_k200tb2_up.json /tmp/rec_hier_up.json
