#!/bin/bash
# Parameterized per-round evidence runner (round-17 verdict #4: the
# per-round runner copies were ~90% identical — this is the one copy).
#
# Usage: tools/run_passes.sh --round N [--stages s1,s2,...]
# Stages (default: all, in this order):
#   test      sbt test gate — red suite aborts everything after it
#   bench     BENCH_LOCAL_rN.json (forked per-scale JVMs, all 4+ scales)
#   verify    full sf0.01 Verify + DuckDB sanity pass
#   stream    FRESH StreamDrain + store-served oracle pass at sf0.01,
#             10x (auto-K) and 100x (auto-K) — three new roots
#   streamknn 100x store-served kNN rows as width-5 source-bucket
#             chunks over THIS round's drained root (the one-piece
#             DuckDB form needs ~230 GB — permanently infeasible here;
#             measured r16, see CORRECTNESS_STREAM _meta)
#   assemble  rebuild CORRECTNESS_STREAM.json from this round's passes
#   knobs     new knob-matrix waves + CORRECTNESS_KNOBS meta refresh
#   ksweep    warm 100x K-sweep, K=633 + K=2000, probe+store, reps=2
#             (round-17 verdict #6), merged into KSWEEP.json
#   rotation  first 100x timing for queries the up2 budget never
#             admitted -> BENCH_UP2_ROTATION.json (round-17 verdict #5)
#
# Every stage skips when its output exists (delete the /tmp artifact to
# force a rerun); outputs carry the rN suffix because /tmp persists
# across rounds on this host. Spark JVMs and big DuckDB passes are
# strictly serialized. Run from /root/repo. Log: /tmp/rN_passes.log
cd /root/repo || exit 1

ROUND=""
STAGES="test,bench,verify,stream,streamknn,assemble,knobs,ksweep,rotation"
while [ $# -gt 0 ]; do
  case "$1" in
    --round) ROUND="$2"; shift 2 ;;
    --stages) STAGES="$2"; shift 2 ;;
    *) echo "unknown arg $1"; exit 2 ;;
  esac
done
[ -n "$ROUND" ] || { echo "usage: $0 --round N [--stages ...]"; exit 2; }
R="r$ROUND"
PREV="r$((ROUND - 1))"
LOG=/tmp/${R}_passes.log
exec >>"$LOG" 2>&1
echo; echo "==== run_passes --round $ROUND --stages $STAGES $(date -u +%FT%TZ) ===="
set -o pipefail
has() { case ",$STAGES," in *",$1,"*) return 0 ;; *) return 1 ;; esac; }
stage() { echo; echo "---- $1 $(date -u +%T) ----"; }

# 0. full test suite — the cheap gate first; red aborts.
if has test && [ ! -f /tmp/${R}_tests.ok ]; then
  stage "sbt test"
  sbt -batch test 2>&1 | tail -8 | tee /tmp/${R}_tests.tail
  if grep -q "All tests passed" /tmp/${R}_tests.tail; then
    touch /tmp/${R}_tests.ok
  else
    echo "FATAL: sbt test is red — aborting all verification stages"
    exit 1
  fi
fi

# 1. the round's bench record: forked per-scale JVMs, auto decade K
if has bench && [ ! -f BENCH_LOCAL_${R}.json ]; then
  stage "Bench $R (forked scales)"
  SPARK_GRAFT_BENCH_TAG=$R SPARK_GRAFT_BENCH_PREV=BENCH_LOCAL_${PREV}.json \
    sbt -batch "runMain graft.Bench" 2>&1 | grep -E "\[bench\]|\[graft\]" | tail -40
fi

# 2. full sf0.01 sanity pass (the driver produces the official
#    CORRECTNESS_rN; this catches a broken oracle before the long stages)
if has verify && [ ! -f /tmp/rec_${R}a.json ]; then
  stage "Verify sf0.01 (full surface)"
  rm -rf /tmp/verify_${R}a
  sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_${R}a" | grep -E "\[verify\]|\[graft\]" | tail -5
  python3 tools/check_oracle.py /tmp/verify_${R}a /root/testdata/sf0.01 /tmp/rec_${R}a.json | tail -3
fi

# 3. FRESH stream drains at all three scales (round-17 verdict #4: the
#    prior 100x stream evidence rode the r16 drained root)
if has stream && [ ! -f /tmp/rec_${R}_stream.json ]; then
  stage "VerifyStream sf0.01 (fresh drain)"
  rm -rf /tmp/stream_root_${R} /tmp/verify_stream_${R}
  sbt -batch "runMain graft.VerifyStream /root/testdata/sf0.01 /tmp/stream_root_${R} /tmp/verify_stream_${R} 6" | grep -E "\[verify|\[drain|\[doctor|checks"
  python3 tools/check_oracle.py /tmp/verify_stream_${R} /root/testdata/sf0.01 /tmp/rec_${R}_stream.json | tail -3
fi
if has stream && [ ! -f /tmp/rec_${R}_stream_up.json ]; then
  stage "VerifyStream 10x (fresh drain, ncells=auto)"
  rm -rf /tmp/stream_root_${R}up /tmp/verify_stream_${R}up
  sbt -batch "runMain graft.VerifyStream testdata_up/sf1 /tmp/stream_root_${R}up /tmp/verify_stream_${R}up 6 conf:spark.graft.sim.ncells=auto" | grep -E "\[verify|\[drain|\[doctor|checks|\[graft\]"
  python3 tools/check_oracle_chunked.py /tmp/verify_stream_${R}up testdata_up/sf1 /tmp/rec_${R}_stream_up.json 4 64GB 100GB | tail -5
fi
if has stream && [ ! -f /tmp/rec_${R}_stream_up2.json ]; then
  stage "VerifyStream 100x (FRESH drain, ncells=auto)"
  rm -rf /tmp/stream_root_${R}up2 /tmp/verify_stream_${R}up2
  sbt -batch "runMain graft.VerifyStream testdata_up/sf10 /tmp/stream_root_${R}up2 /tmp/verify_stream_${R}up2 6 conf:spark.graft.sim.ncells=auto" | grep -E "\[verify|\[drain|\[doctor|checks|\[graft\]"
  # the store-served kNN rows are one-piece-infeasible in DuckDB at
  # this scale (needs ~230 GB; measured OOM r16) — their evidence is the
  # streamknn chunk stage over the same root; the auto dispatcher row
  # resolves hier at trained K=633 (dispatch identity spec-pinned in
  # VectorLayoutSpec), so the hier chunk cover is its evidence too
  GRAFT_ORACLE_SKIP=sim_knn_ann_kmeans,sim_knn_ann_hier,sim_knn_ann_auto \
    python3 tools/check_oracle_chunked.py /tmp/verify_stream_${R}up2 testdata_up/sf10 /tmp/rec_${R}_stream_up2.json 1 64GB 100GB | tail -5
fi

# 4. 100x store-served kNN rows as width-5 source-bucket chunks over
#    THIS round's freshly drained root (VerifyStream nBatches=0 reuse,
#    Doctor-gated). One Spark dump + one fresh DuckDB per chunk.
if has streamknn; then
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
  for b in 0 5 10 15; do
    if green /tmp/rec_${R}_streamknn_b$b.json; then continue; fi
    stage "streamknn chunk $b:5"
    if [ ! -f /tmp/vs${R}up2_b$b/oracle_sql.json ]; then
      rm -rf /tmp/vs${R}up2_b$b
      sbt -batch "runMain graft.VerifyStream testdata_up/sf10 /tmp/stream_root_${R}up2 /tmp/vs${R}up2_b$b 0 conf:spark.graft.sim.ncells=auto,spark.graft.sim.knnbucket=$b:5 only:sim_knn_ann_kmeans,sim_knn_ann_hier" \
        | grep -E "\[verify|\[doctor\].*checks|error" || exit 1
    fi
    # first attempt 85GB: the K=633 Lloyd chain alone exceeds 64GB
    python3 tools/check_oracle_chunked.py /tmp/vs${R}up2_b$b testdata_up/sf10 /tmp/rec_${R}_streamknn_b$b.json 1 85GB 100GB | tail -3
  done
fi

# 5. rebuild CORRECTNESS_STREAM.json from this round's records
if has assemble; then
  stage "assemble CORRECTNESS_STREAM ($R)"
  python3 tools/assemble_stream.py "$ROUND" || exit 1
fi

# 5b. knob waves: the store-served probe=auto corner at trained K<500
#     (round-17 verdict stretch #8) — resolves flat, same oracle gate.
#     Rides the fresh sf0.01 drained root (nBatches=0, Doctor-gated).
if has knobs && [ ! -f /tmp/rec_${R}_storeauto.json ]; then
  stage "knobs: store-context auto dispatch @ trained K=8 (resolves flat)"
  # ProbeKey deliberately UNSET: the store dispatcher's default IS the
  # auto policy (knnAuto scaladoc), so this is the K<HierProbeStoreMinK
  # corner resolving FLAT; the kmeans row is the explicit-flat control
  # over the same drained root
  rm -rf /tmp/verify_${R}_storeauto
  sbt -batch "runMain graft.VerifyStream /root/testdata/sf0.01 /tmp/stream_root_${R} /tmp/verify_${R}_storeauto 0 only:sim_knn_ann_auto,sim_knn_ann_kmeans" \
    | grep -E "\[verify|\[doctor\].*checks|\[graft\]"
  python3 tools/check_oracle.py /tmp/verify_${R}_storeauto /root/testdata/sf0.01 /tmp/rec_${R}_storeauto.json | tail -3
fi
if has knobs && [ -f /tmp/rec_${R}_storeauto.json ] && [ ! -f /tmp/rec_${R}_knobs.merged ]; then
  stage "assemble CORRECTNESS_KNOBS ($R)"
  python3 tools/assemble_knobs.py "$ROUND" \
    "/tmp/rec_${R}_storeauto.json@store-auto-k8@store-served auto dispatch (ProbeKey unset -> store-context auto) at trained K=8 < HierProbeStoreMinK resolves FLAT — the untested corner of the auto contract; kmeans row is the explicit-flat control over the same drained root" \
    && touch /tmp/rec_${R}_knobs.merged
fi

# 7. 100x coverage rotation (round-17 verdict #5): one timing at the
#    100x corpus for every registered query the up2 budget has never
#    admitted — except the exact-kernel-riding rows (UpExcluded for
#    cause: the O(n^2) kernel is infeasible at 100x by design) and the
#    corpus-wide FULL kNN rows (their 100x evidence is the chunk-oracle
#    records). The rotation rule: compute never-timed = registered
#    minus every scale_queries_up2 key across all committed BENCH
#    records, run the runnable remainder once via a Bench child pass
#    (same auto-K/tb=8 contract as the up2 pass), commit as
#    BENCH_UP2_ROTATION.json.
if has rotation && [ ! -f BENCH_UP2_ROTATION.json ]; then
  stage "100x coverage rotation"
  ROT=$(python3 - <<'EOF'
import json, glob
timed = set()
for p in glob.glob('BENCH_LOCAL_r*.json') + glob.glob('BENCH_r*.json') \
        + glob.glob('BENCH_UP2_ROTATION*.json'):
    try:
        d = json.load(open(p))
    except Exception:
        continue
    for k in (d.get('scale_queries_up2') or {}):
        timed.add(k)
    for k in (d.get('queries') or {} if 'ROTATION' in p else {}):
        timed.add(k)
import re
allq = set()
for p in sorted(glob.glob('CORRECTNESS_r*.json'))[-1:]:
    allq = set(json.load(open(p))) - {'_meta'}
excluded = {"sim_pairs_threshold", "sim_pairs_recall", "sim_knn_join",
            "sim_knn_ann_recall", "sim_knn_ann_pq_recall",
            "sim_knn_ann_pq_res_recall", "sim_knn_ann_pq_tradeoff",
            "sim_knn_ann_probe_tradeoff", "sim_knn_ann_hier_recall",
            "sim_knn_ann_hier_pq_recall", "sim_knn_ann_hier_pq_res_recall",
            "sim_knn_ann", "sim_knn_ann_auto", "sim_knn_ann_kmeans",
            "sim_knn_ann_hier", "sim_knn_ann_pq", "sim_knn_ann_pq_res",
            "sim_knn_ann_hier_pq", "sim_knn_ann_hier_pq_res"}
print(",".join(sorted(allq - timed - excluded)))
EOF
)
  echo "rotation set: $ROT"
  if [ -n "$ROT" ]; then
    CP="target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
    SPARK_GRAFT_CPUS=32 java \
      $(grep -o 'java.base/[a-z.]*' build.sbt | sed 's/^/--add-opens /;s/$/=ALL-UNNAMED/' | tr '\n' ' ') \
      -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
      -Xmx${SPARK_DRIVER_MEM:-8g} -cp "$CP" graft.Bench child \
      testdata_up/sf10 1 "include:$ROT" auto 8 none /tmp/rot_${R}.json \
      2>&1 | grep -E "\[graft\]|\[bench\]" | tail -5
    python3 - "$ROUND" <<'EOF'
import json, sys
rnd = sys.argv[1]
d = json.load(open(f"/tmp/rot_r{rnd}.json"))
d["_meta"] = {
    "round": int(rnd),
    "what": ("first 100x (testdata_up/sf10, ncells=auto, trainbuckets=8, "
             "1 iter) timing for every registered query the up2 budget "
             "selection never admitted; exact-kernel-riding rows and "
             "corpus-wide FULL kNN rows are excluded for cause (kernel "
             "infeasible by design at 100x / evidence lives in the "
             "chunk-oracle records). Rotation rule: never-timed = "
             "registered - union(scale_queries_up2 over all committed "
             "BENCH records) - this record's own queries; re-run by "
             "tools/run_passes.sh stage 'rotation' whenever new queries "
             "register."),
}
json.dump(d, open("BENCH_UP2_ROTATION.json", "w"), indent=1, sort_keys=True)
print("wrote BENCH_UP2_ROTATION.json:", len(d.get("queries", {})), "queries")
EOF
  fi
fi

# 7b. rotation ADJUDICATION (round-18 verdict #1/#5): the r18 rotation
#     child ran 18 never-timed queries in one 8g JVM and the last 7 (in
#     sorted execution order) errored with the cause discarded. Re-run
#     exactly those 7 with a 32g child and the new errors_detail field,
#     re-run the two >=5s first-touch successes at iters=3 (medians),
#     and merge both into BENCH_UP2_ROTATION.json with the story in
#     _meta. Requires `sbt compile` current (uses target classes).
if has rotfix && [ ! -f /tmp/rotfix_${R}.merged ]; then
  CP="target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
  ADDOPENS=$(grep -o 'java.base/[a-z.]*' build.sbt | sed 's/^/--add-opens /;s/$/=ALL-UNNAMED/' | tr '\n' ' ')
  FAILED7="sim_pairs_lsh,text_corpus_funnel,text_curriculum,text_dsir_manifest,text_dsir_select,text_dsir_weights,text_export_manifest"
  if [ ! -f /tmp/rotfix_${R}.json ]; then
    stage "rotation re-run: the 7 errored rows (32g child, errors_detail)"
    SPARK_GRAFT_CPUS=32 java $ADDOPENS \
      -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
      -Xmx32g -cp "$CP" graft.Bench child \
      testdata_up/sf10 1 "include:$FAILED7" auto 8 none /tmp/rotfix_${R}.json \
      2>&1 | grep -E "\[graft\]|\[bench\]|Error|Exception" | tail -10
  fi
  if [ ! -f /tmp/rotslow_${R}.json ]; then
    stage "rotation medians: the two >=5s first-touch rows (iters=3)"
    SPARK_GRAFT_CPUS=32 java $ADDOPENS \
      -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
      -Xmx32g -cp "$CP" graft.Bench child \
      testdata_up/sf10 3 "include:rel_local_supplier_volume,rel_join_fact" auto 8 none /tmp/rotslow_${R}.json \
      2>&1 | grep -E "\[graft\]|\[bench\]|Error|Exception" | tail -10
  fi
  if [ -f /tmp/rotfix_${R}.json ] && [ -f /tmp/rotslow_${R}.json ]; then
    stage "merge rotation adjudication into BENCH_UP2_ROTATION.json"
    python3 - "$ROUND" <<'EOF'
import json, sys
rnd = sys.argv[1]
rec = json.load(open("BENCH_UP2_ROTATION.json"))
fix = json.load(open(f"/tmp/rotfix_r{rnd}.json"))
slow = json.load(open(f"/tmp/rotslow_r{rnd}.json"))
iters = dict(rec.get("iters", {"default": 1}))
for src, it in ((fix, 1), (slow, 3)):
    for q, t in src["queries"].items():
        rec["queries"][q] = t
        if it != 1:
            iters[q] = it
    for q, n in src.get("rows", {}).items():
        rec["rows"][q] = n
    for q, d in src.get("errors_detail", {}).items():
        rec.setdefault("errors_detail", {})[q] = d
rec["errors"] = sorted(q for q, t in rec["queries"].items() if t < 0)
for q in list(rec.get("errors_detail", {})):
    if rec["queries"].get(q, -1) >= 0:
        del rec["errors_detail"][q]
rec["iters"] = iters
rec["_meta"]["round19"] = (
    "the 7 rows that errored in the r18 one-shot (an 8g child running "
    "18 queries + 20 builders; every row after sim_ann_recall in sorted "
    "execution order died, the signature of mid-pass memory exhaustion, "
    "not 7 independent bugs) were re-run in a 32g child with the new "
    "errors_detail field: see errors/errors_detail for anything still "
    "red. rel_local_supplier_volume and rel_join_fact (the two >=5s "
    "first-touch successes) re-ran at iters=3 - their times are now "
    "medians (see the iters map). All other rows keep their r18 "
    "first-touch timings (iters=1).")
json.dump(rec, open("BENCH_UP2_ROTATION.json", "w"), indent=1, sort_keys=True)
nerr = len(rec["errors"])
print(f"merged: {len(rec['queries'])} queries, {nerr} still red: {rec['errors']}")
EOF
    touch /tmp/rotfix_${R}.merged
  fi
fi

# 7c. sim_pairs_lsh 100x timing under the AUTO band geometry (round
#     19): the rotfix re-run adjudicated the row's failure as the fixed
#     8x8 sign-band shape saturating at n=200k (~6e8 candidates, disk
#     death — errors_detail in the record); the geometry is now a knob
#     whose auto form the execPass couples to ncells=auto (rows=16 at
#     this n). One child run of the single row, merged over the red row
#     with the geometry note. Requires target classes AFTER the knob
#     landed (sbt compile current).
if has rotlsh && [ ! -f /tmp/rotlsh_${R}.merged ]; then
  CP="target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
  ADDOPENS=$(grep -o 'java.base/[a-z.]*' build.sbt | sed 's/^/--add-opens /;s/$/=ALL-UNNAMED/' | tr '\n' ' ')
  if [ ! -f /tmp/rotlsh_${R}.json ]; then
    stage "rotation: sim_pairs_lsh under signrows=auto (100x)"
    SPARK_GRAFT_CPUS=32 java $ADDOPENS \
      -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
      -Xmx32g -cp "$CP" graft.Bench child \
      testdata_up/sf10 1 "include:sim_pairs_lsh" auto 8 none /tmp/rotlsh_${R}.json \
      2>&1 | grep -E "\[graft\]|\[bench\]|Error|Exception" | tail -10
  fi
  if [ -f /tmp/rotlsh_${R}.json ]; then
    stage "merge sim_pairs_lsh geometry adjudication"
    python3 - "$ROUND" <<'EOF'
import json, sys
rnd = sys.argv[1]
rec = json.load(open("BENCH_UP2_ROTATION.json"))
lsh = json.load(open(f"/tmp/rotlsh_r{rnd}.json"))
t = lsh["queries"].get("sim_pairs_lsh", -1.0)
if t > 0:
    rec["queries"]["sim_pairs_lsh"] = t
    rec["rows"]["sim_pairs_lsh"] = lsh["rows"]["sim_pairs_lsh"]
    rec.get("errors_detail", {}).pop("sim_pairs_lsh", None)
    rec["errors"] = sorted(q for q, v in rec["queries"].items() if v < 0)
    rec.setdefault("resolved_signrows", {})["sim_pairs_lsh"] = \
        lsh.get("resolved_signrows", "?")
    rec["_meta"]["round19_lsh"] = (
        "sim_pairs_lsh's r19 32g re-run still died: errors_detail "
        "recorded SPILL_OUT_OF_MEMORY / no space left on device - the "
        "fixed 8x8 sign-band geometry saturates at n=200k (781 "
        "vectors/bucket -> ~6e8 scored candidates whose vector join "
        "spills ~350 GB). Adjudication: a real defect in the fixed "
        "geometry, fixed by the spark.graft.sim.signrows knob whose "
        "auto form scales rows-per-band with the corpus (occupancy "
        "n/2^rows <= 64; QueriesSpec pins auto thresholds + the "
        "wider-rows-only-lose-candidates monotonicity law). This row's "
        "timing runs the auto contract (ncells=auto couples "
        "signrows=auto -> rows=16, bands=4 at 100x), the same contract "
        "the bench up-decades run; the default 8x8 form at 100x is "
        "refused by measurement, not by a guard - resolved_signrows "
        "in this record names the geometry that ran.")
    print(f"sim_pairs_lsh: {t:.2f}s green under signrows="
          f"{lsh.get('resolved_signrows')}")
else:
    print("sim_pairs_lsh STILL red:", lsh.get("errors_detail"))
    sys.exit(1)
json.dump(rec, open("BENCH_UP2_ROTATION.json", "w"), indent=1, sort_keys=True)
EOF
    touch /tmp/rotlsh_${R}.merged
  fi
fi

# 8. sim_pairs_lsh 100x oracle coverage (round-18 verdict #6): the
#    registered 100 TB semantic-near-dup path had neither a 100x
#    correctness row (excluded_oracle_cost in the up2 budget) nor a
#    100x timing. Its 10x oracle measured 2.65s; one-piece at 100x is
#    projected well within a fresh-process DuckDB at a 64GB cap.
#    Merged into CORRECTNESS_UP2.json by the caller (see round notes).
if has pairslsh && [ ! -f /tmp/rec_${R}_pairslsh.json ]; then
  stage "sim_pairs_lsh 100x dump + oracle"
  rm -rf /tmp/verify_${R}_pairslsh
  sbt -batch "runMain graft.Verify testdata_up/sf10 /tmp/verify_${R}_pairslsh only:sim_pairs_lsh conf:spark.graft.sim.ncells=auto,spark.graft.sim.signrows=auto" | grep -E "\[verify\]|\[graft\]" | tail -3
  python3 tools/check_oracle_chunked.py /tmp/verify_${R}_pairslsh testdata_up/sf10 /tmp/rec_${R}_pairslsh.json 1 64GB 100GB | tail -3
fi

# 9. store-served auto dispatcher at 100x, DIRECTLY gated (round-18
#    ADVICE medium, closed end-to-end): VerifyStream now pins the
#    STORE resolution (trained K=633 -> hier) into ProbeKey before the
#    oracle strings generate, so the dispatcher row verifies through
#    the same hash gate as the explicit arms instead of being skipped
#    out-of-band. Runs as width-5 source-bucket chunks over the r18
#    drained 100x root (nBatches=0 reuse, Doctor-gated) - the same
#    chunking that verified the kmeans/hier arms.
if has storeauto100; then
  for b in 0 5 10 15; do
    if [ -f /tmp/rec_${R}_storeauto100_b$b.json ] && \
       python3 -c "import json,sys; r=json.load(open('/tmp/rec_${R}_storeauto100_b$b.json')); rows=[v for k,v in r.items() if k!='_meta' and isinstance(v,dict)]; sys.exit(0 if rows and all(v.get('hash_match') for v in rows) else 1)"; then
      continue
    fi
    stage "storeauto100 chunk $b:5"
    if [ ! -f /tmp/vs${R}auto_b$b/oracle_sql.json ]; then
      rm -rf /tmp/vs${R}auto_b$b
      sbt -batch "runMain graft.VerifyStream testdata_up/sf10 /tmp/stream_root_r18up2 /tmp/vs${R}auto_b$b 0 conf:spark.graft.sim.ncells=auto,spark.graft.sim.knnbucket=$b:5 only:sim_knn_ann_auto" \
        | grep -E "\[verify|\[doctor\].*checks|\[graft\]|error" || exit 1
    fi
    python3 tools/check_oracle_chunked.py /tmp/vs${R}auto_b$b testdata_up/sf10 /tmp/rec_${R}_storeauto100_b$b.json 1 85GB 100GB | tail -3
  done
fi

# 6. warm 100x K-sweep at the deployment K and the rung above, reps=2
#    (round-17 verdict #6: the 1.03x store-parity call was one warm shot)
if has ksweep; then
  for K in 633 2000; do
    if [ ! -f /tmp/KSWEEP_sf10_k${K}_${R}.json ]; then
      stage "100x K-sweep rung K=$K (probe+store; warm, reps=2)"
      sbt -batch "runMain graft.KSweep testdata_up/sf10 $K 8 probe,store /tmp/KSWEEP_sf10_k${K}_${R}.json 2" | grep -E "\[ksweep\]"
    fi
  done
  # merge whatever rungs finished (K=633 is the verdict's must-have —
  # the store parity call needs a median; K=2000 re-measures a clear win)
  if [ -f /tmp/KSWEEP_sf10_k633_${R}.json ] && [ ! -f /tmp/KSWEEP_sf10_${R}.merged ]; then
    stage "merge sf10 rungs into KSWEEP.json"
    python3 - "$R" <<'EOF'
import json, os, sys
r = sys.argv[1]
rows = []
for k in (633, 2000):
    p = f"/tmp/KSWEEP_sf10_k{k}_{r}.json"
    if os.path.exists(p):
        rows += json.load(open(p))["sweep"]
rec = {"corpus": "testdata_up/sf10", "trainbuckets": "8", "reps": 2,
       "warm": True, "sweep": rows}
json.dump(rec, open(f"/tmp/KSWEEP_sf10_{r}.json", "w"))
EOF
    python3 tools/merge_ksweep.py KSWEEP.json /tmp/KSWEEP_sf10_${R}.json \
      "round $ROUND: the warm 100x sweep re-ran with reps=2 (medians, not single warm shots - r17 verdict #6) at the deployment K=633 and the K=2000 rung, probe+store pairs; probe_auto/store_auto columns adjudicate the auto policy against the engine's own crossover helper (sessionProbeModeFor/probeModeForStore - one formula, no drift)." \
      && touch /tmp/KSWEEP_sf10_${R}.merged
  fi
fi

stage "DONE"
ls -la BENCH_LOCAL_${R}.json /tmp/rec_${R}*.json 2>/dev/null
