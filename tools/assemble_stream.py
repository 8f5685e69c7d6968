#!/usr/bin/env python3
"""Rebuild CORRECTNESS_STREAM.json from one round's FRESH stream passes.

Inputs (produced by tools/run_passes.sh --round N, stages stream+streamknn):
  /tmp/rec_rN_stream.json       9 store-served rows at sf0.01, fresh drain
  /tmp/rec_rN_stream_up.json    the same over testdata_up/sf1 (auto-K)
  /tmp/rec_rN_stream_up2.json   testdata_up/sf10 (auto-K) — the two
                                store-served kNN rows are SKIPPED there
                                (GRAFT_ORACLE_SKIP) because their
                                one-piece DuckDB form needs ~230 GB
                                (measured OOM, round 16)
  /tmp/rec_rN_streamknn_b{0,5,10,15}.json  those two rows as width-5
                                source-bucket chunks over the SAME
                                fresh root (knnbucket=b:5)

The record is rebuilt CLEAN each round — `_meta.round`/`result` always
describe the latest state (round-17 verdict #3: amended records kept
stale top-level summaries beside bolted-on roundN_delta fields).
"""
import json
import os
import sys

KNN_DELEGATED = ["sim_knn_ann_kmeans", "sim_knn_ann_hier"]
CHUNKS = [0, 5, 10, 15]
WIDTH = 5


def load(p):
    with open(p) as f:
        return json.load(f)


def rows(rec):
    return {k: v for k, v in rec.items()
            if k != "_meta" and isinstance(v, dict)}


def npass(rs):
    return sum(1 for v in rs.values() if v.get("hash_match")), len(rs)


def main():
    rnd = int(sys.argv[1])
    r = f"r{rnd}"
    need = [f"/tmp/rec_{r}_stream.json", f"/tmp/rec_{r}_stream_up.json",
            f"/tmp/rec_{r}_stream_up2.json"] + \
        [f"/tmp/rec_{r}_streamknn_b{b}.json" for b in CHUNKS]
    missing = [p for p in need if not os.path.exists(p)]
    if missing:
        sys.exit(f"missing inputs — run tools/run_passes.sh --round {rnd} "
                 f"stages stream,streamknn first: {missing}")

    base = rows(load(need[0]))
    up = rows(load(need[1]))
    up2 = rows(load(need[2]))
    out = dict(base)
    out.update({f"{k}@sf1up": v for k, v in up.items()})
    out.update({f"{k}@sf10up": v for k, v in up2.items()})

    chunk_ok = chunk_n = 0
    chunk_tags = []
    for b in CHUNKS:
        rec = rows(load(f"/tmp/rec_{r}_streamknn_b{b}.json"))
        tag = f"b{b}-{b + WIDTH - 1}"
        chunk_tags.append(tag)
        for k, v in rec.items():
            out[f"{k}@sf10up@{tag}"] = v
            chunk_n += 1
            chunk_ok += 1 if v.get("hash_match") else 0

    # the one-piece kNN rows at 100x: delegated, with the rationale and
    # the green chunk cover IN the row (CORRECTNESS_UP2 discipline)
    for q in KNN_DELEGATED:
        covers = [f"{q}@sf10up@{t}" for t in chunk_tags]
        green = all(out.get(c, {}).get("hash_match") for c in covers)
        out[f"{q}@sf10up"] = {
            "rows_match": None, "schema_match": None, "hash_match": None,
            "err": None,
            "oracle_infeasible": True,
            "oracle_infeasible_reason": (
                "one-piece DuckDB oracle needs ~230 GB for the per-source "
                "rank tail at this scale (measured OOM at the 100 GB cap, "
                "round 16); not attempted this round"),
            "delegated_to_chunks": covers,
            "chunks_green": green,
        }
    # the store probe=auto dispatcher at 100x resolves hier (trained
    # K=633 >= HierProbeStoreMinK) — its output is BY CONSTRUCTION the
    # sim_knn_ann_hier read (VectorLayoutSpec pins dispatch identity),
    # so the hier chunk cover is its evidence
    hier_covers = [f"sim_knn_ann_hier@sf10up@{t}" for t in chunk_tags]
    out["sim_knn_ann_auto@sf10up"] = {
        "rows_match": None, "schema_match": None, "hash_match": None,
        "err": None,
        "oracle_infeasible": True,
        "oracle_infeasible_reason": (
            "resolves to the hier serving path at trained K=633 "
            "(probeModeForStore; dispatch identity pinned in "
            "VectorLayoutSpec) — one-piece oracle infeasible like the "
            "explicit rows; evidence is the hier chunk cover"),
        "delegated_to_chunks": hier_covers,
        "chunks_green": all(out.get(c, {}).get("hash_match")
                            for c in hier_covers),
    }

    p1, n1 = npass(base)
    p2, n2 = npass(up)
    p3, n3 = npass(up2)
    delegated = [f"{q}@sf10up" for q in KNN_DELEGATED] + \
        ["sim_knn_ann_auto@sf10up"]
    deleg_ok = all(out[d]["chunks_green"] for d in delegated)
    nd = len(delegated)
    out["_meta"] = {
        "round": rnd,
        "result": (
            f"{p1}/{n1} pass at sf0.01 AND {p2}/{n2} at 10x (auto K) AND "
            f"{p3 + (nd if deleg_ok else 0)}/{n3 + nd} at 100x (auto K; "
            f"{p3} one-piece + {nd} delegated to {chunk_ok}/{chunk_n} green "
            f"width-{WIDTH} source-bucket chunks) — ALL from FRESH "
            f"round-{rnd} drains at every scale"),
        "what": (
            "store-backed registered queries over STREAM-BUILT roots "
            "(graft.VerifyStream): StreamDrain (80% bases + 20% as 6 "
            "micro-batches through all four ingest streams + StoreMaintain "
            "+ Doctor gate), then one registered query per store family "
            "answered by READING the drained store and hash-compared "
            "against the registered DuckDB oracle over the raw corpus "
            "tables; all scales run the auto-K contract"),
        "fresh_drains": {
            "sf0.01": f"/tmp/stream_root_{r}",
            "sf1up": f"/tmp/stream_root_{r}up",
            "sf10up": f"/tmp/stream_root_{r}up2 (kNN chunk rows re-dump "
                      f"this root via VerifyStream nBatches=0, Doctor-gated)",
        },
    }
    json.dump(out, open("CORRECTNESS_STREAM.json", "w"),
              indent=1, sort_keys=True)
    print(f"STREAM: {out['_meta']['result']}")


if __name__ == "__main__":
    main()
