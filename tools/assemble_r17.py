#!/usr/bin/env python3
"""Round-17 assembler: fold the 100x stream-drain kNN chunk oracles
into CORRECTNESS_STREAM.json (round-16 verdict #2 — the two rows that
OOM'd DuckDB one-piece at the 64 GB cap).

Inputs: /tmp/rec_r17_streamknn_b{0,1,5,10,15}.json — per-chunk DuckDB
compares of the STORE-SERVED sim_knn_ann_{kmeans,hier} rows over the
reused r16 100x drained root, under spark.graft.sim.knnbucket=b:w
(chunk 0 ran width-1 before the b:w lever landed; 1:4 + three width-5s
cover the rest; the five ranges partition 0..19 — QueriesSpec pins the
exact-restriction / disjointness / cover laws).

Each chunk row lands as <name>@sf10up@b<start>-<end>; the one-piece
rows keep their r16 red result but gain oracle_infeasible=true with the
in-record chunk cover named (the CORRECTNESS_UP2 dedup_substr_clean
discipline), so the record reads all-green-or-delegated. Per-wave
counts are keyed by rec path (round-16 advice #2: duplicate tags
overwrote each other).
"""
import json
import os
import sys

P = "CORRECTNESS_STREAM.json"
CHUNKS = [(0, 1), (1, 4), (5, 5), (10, 5), (15, 5)]


def load(p):
    with open(p) as f:
        return json.load(f)


def main():
    d = load(P)
    counts = {}
    missing = []
    for b, w in CHUNKS:
        path = f"/tmp/rec_r17_streamknn_b{b}.json"
        if not os.path.exists(path):
            missing.append(path)
            continue
        rec = load(path)
        rows = {k: v for k, v in rec.items()
                if k != "_meta" and isinstance(v, dict)}
        tag = f"b{b}" if w == 1 else f"b{b}-{b + w - 1}"
        for k, v in rows.items():
            d[f"{k}@sf10up@{tag}"] = v
        counts[path] = [sum(1 for v in rows.values() if v.get("hash_match")),
                        len(rows)]
    if missing:
        print(f"[assemble_r17] REFUSING: missing chunk recs {missing}")
        sys.exit(1)
    total = sum(c[0] for c in counts.values())
    want = sum(c[1] for c in counts.values())
    if total != want or want != 2 * len(CHUNKS):
        print(f"[assemble_r17] REFUSING: {total}/{want} chunk rows green "
              f"(need {2 * len(CHUNKS)}/{2 * len(CHUNKS)})")
        sys.exit(1)
    for name in ("sim_knn_ann_hier@sf10up", "sim_knn_ann_kmeans@sf10up"):
        row = d[name]
        if not row.get("hash_match"):
            row["oracle_infeasible"] = True
            row["oracle_infeasible_why"] = (
                "the one-piece oracle's K=633 model chain + full-corpus "
                "candidate window exceeds the DuckDB memory cap (r16: OOM at "
                "64 GB, the 100 GB retry did not finish); the SAME "
                "store-served output is fully hash-verified IN THIS RECORD "
                "by the source-bucket chunk rows "
                f"{name}@b0/@b1-4/@b5-9/@b10-14/@b15-19 — the buckets "
                "partition the source ids and the probe is per-source "
                "independent (laws pinned in QueriesSpec), so chunk-by-chunk "
                "equality IS full-corpus equality")
    d["_meta"]["round17_delta"] = (
        "the two 100x kNN rows that OOM'd DuckDB one-piece are now fully "
        "verified as 5 source-bucket chunks each (knnbucket=b:w over the "
        "REUSED r16 drained root, VerifyStream nBatches=0): 10/10 chunk "
        "rows green -> the 100x stream drain reads 9/9 "
        "(7 one-piece + 2 delegated-to-chunks, all chunk rows green)")
    d["_meta"]["round17_waves"] = {p: f"{c[0]}/{c[1]}"
                                   for p, c in sorted(counts.items())}
    d["_meta"]["result"] = (
        "9/9 pass at sf0.01 AND 9/9 at 10x (auto K) AND 9/9 at 100x "
        "(auto K=633; the two one-piece-infeasible kNN rows verified as "
        "5 green source-bucket chunks each — round-17)")
    json.dump(d, open(P, "w"), indent=1, sort_keys=True)
    print(f"[assemble_r17] merged {total}/{want} chunk rows into {P}")


if __name__ == "__main__":
    main()
