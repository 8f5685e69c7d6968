#!/bin/bash
# Round-16: FULL-corpus string-granularity oracle coverage for
# dedup_substr_clean at 100x, as 20 DuckDB-feasible chunks — closing
# the last non-pass in CORRECTNESS_UP2 (round-15 verdict #2). The
# dedup.cleanchunk knob restricts the excision RE-JOIN to doc bucket b
# (span derivation stays corpus-wide); the 20 buckets PARTITION the
# doc_ids (spec-pinned in SubstrDedupSpec), and the re-join is per-doc
# independent, so bucket-by-bucket hash equality IS full-corpus
# equality of the string form — while each chunk's ordered string_agg
# stays ~1/20 of the token rows that made the one-piece oracle die
# even at a 100 GB cap. One Spark dump + one fresh DuckDB process per
# bucket, strictly serialized; restartable per bucket. Run from
# /root/repo AFTER run_r16_passes.sh.
cd /root/repo || exit 1
LOG=/tmp/r16_cleanfull.log
exec >>"$LOG" 2>&1
echo "==== run_r16_cleanfull $(date -u +%FT%TZ) ===="
set -o pipefail

for b in $(seq 0 19); do
  if [ -f /tmp/rec_r16_cleanb$b.json ]; then continue; fi
  echo; echo "---- clean bucket $b $(date -u +%T) ----"
  rm -rf /tmp/verify_r16_cleanb$b
  sbt -batch "runMain graft.Verify testdata_up/sf10 /tmp/verify_r16_cleanb$b dedup_substr_clean_chunk conf:spark.graft.dedup.cleanchunk=$b" | grep -E "\[verify\]" || exit 1
  python3 tools/check_oracle_chunked.py /tmp/verify_r16_cleanb$b testdata_up/sf10 /tmp/rec_r16_cleanb$b.json 1 64GB 100GB | tail -3
done

echo; echo "---- cleanfull DONE $(date -u +%T) ----"
ls /tmp/rec_r16_cleanb*.json 2>/dev/null | wc -l
