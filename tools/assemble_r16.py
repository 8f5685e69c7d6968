#!/usr/bin/env python3
"""One-shot assembler for the round-16 verification artifacts.

Inputs (graft.Verify / graft.VerifyStream Spark dumps followed by
tools/check_oracle*.py DuckDB compares — run tools/run_r16_passes.sh,
then optionally tools/run_r16_cleanfull.sh):
  /tmp/rec_r16a.json         full 143-query pass at sf0.01 (sanity; the
                             driver produces the official CORRECTNESS_r16)
  /tmp/rec_r16_hpq_h29.json  composed hier+PQ @ assign=hier, ncells=29
  /tmp/rec_r16_hpq_auto.json composed hier+PQ @ ncells=auto (resolves 32)
  /tmp/rec_r16_hpq_aa.json   composed hier+PQ @ assign=auto, ncells=2000
  /tmp/rec_r16_k633aa.json   10x rows @ ncells=633 (auto->hier) + the
                             composed sample at the bench's 100x K
  /tmp/rec_r16_up.json       full 10x pass @ ncells=AUTO (resolves 200)
  /tmp/rec_r16_stream.json   store-backed queries at sf0.01
  /tmp/rec_r16_stream_up.json the SAME over testdata_up/sf1 @ auto
  /tmp/rec_r16_up2_knn.json  kNN/PQ/hier/hier+PQ sample rows @K=80, sf10
  /tmp/rec_r16_cleanb{0..19}.json full-corpus string-granularity clean
                             at 100x, one doc bucket per record

Outputs: CORRECTNESS_KNOBS.json (merged waves), CORRECTNESS_STREAM.json,
CORRECTNESS_UP.json, CORRECTNESS_UP2.json.

Round-15 advice fix: a re-gate attempt that dies in the ORACLE process
(DuckDB OOM) no longer silently RETAINS the prior green row as if
re-verified — the row keeps its old result but gains an explicit
"stale": true + "stale_reason", and _meta counts stale rows separately.
"""
import glob
import json
import os
import sys

def load(p):
    with open(p) as f:
        return json.load(f)

def rows(rec):
    return {k: v for k, v in rec.items() if k != "_meta"}

def npass(rec):
    rs = rows(rec)
    return sum(1 for v in rs.values() if v.get("hash_match")), len(rs)

mode = sys.argv[1] if len(sys.argv) > 1 else "all"

if mode in ("all", "knobs"):
    out = dict(rows(load("CORRECTNESS_KNOBS.json")))
    waves = [
        ("/tmp/rec_r16_hpq_h29.json", "h29"),
        ("/tmp/rec_r16_hpq_auto.json", "auto"),
        ("/tmp/rec_r16_hpq_aa.json", "aa2000"),
        ("/tmp/rec_r16_k633aa.json", "k633aa"),
        ("/tmp/rec_r16_hpqres_auto.json", "auto"),
    ]
    counts = {}
    stale = []
    for path, tag in waves:
        if not os.path.exists(path):
            continue
        rec = load(path)
        for k, v in rows(rec).items():
            key = f"{k}@{tag}"
            # round-15 advice: an oracle-side OOM on a re-gate of an
            # unchanged code path keeps the old row but MARKS it stale
            # (unverified this round), never silently re-certifies it
            if v.get("err") and "emory" in str(v.get("err")) \
                    and out.get(key, {}).get("hash_match"):
                out[key] = dict(out[key], stale=True, stale_reason=(
                    "round-16 re-gate hit the DuckDB retry memory "
                    "ceiling (oracle infrastructure, not an engine "
                    "mismatch); result shown is the last genuine "
                    "verification"))
                stale.append(key)
                continue
            out[key] = v
        counts[tag] = npass(rec)
    ok = sum(1 for k, v in out.items() if k != "_meta" and v.get("hash_match")
             and not v.get("stale"))
    n_stale = sum(1 for v in out.values()
                  if isinstance(v, dict) and v.get("stale"))
    meta = load("CORRECTNESS_KNOBS.json").get("_meta", {})
    meta.update({
        "round": 16,
        "round16_waves": {
            "@h29 (hier_pq)": ("the composed hier+PQ family at "
                               "assign=hier, ncells=29 — a K where "
                               "trained cells die"),
            "@auto (hier_pq)": ("the composed family under the "
                                "corpus-derived K (resolves 32 at "
                                "sf0.01)"),
            "@aa2000 (hier_pq)": ("degenerate K > n with auto "
                                  "assignment escalation"),
            "@k633aa (+hier_pq_sample)": ("the bench's actual 100x "
                                          "contract K, gated at the "
                                          "10x corpus; now includes "
                                          "the composed sample"),
        },
        "per_wave_r16": {t: f"{p}/{n}" for t, (p, n) in counts.items()},
        "stale_rows": n_stale,
        "result": "filled below",
    })
    n_rows = sum(1 for k in out if k != "_meta")
    meta["result"] = (f"{ok}/{n_rows} verified-green"
                      + (f" + {n_stale} stale (prior-round green, "
                         f"oracle-infra re-gate failure)" if n_stale else ""))
    out["_meta"] = meta
    json.dump(out, open("CORRECTNESS_KNOBS.json", "w"), indent=1, sort_keys=True)
    print(f"KNOBS: {ok}/{n_rows} (+{n_stale} stale)  waves: {counts}")

if mode in ("all", "stream"):
    base, up = load("/tmp/rec_r16_stream.json"), load("/tmp/rec_r16_stream_up.json")
    p1, n1 = npass(base)
    p2, n2 = npass(up)
    out = dict(rows(base))
    out.update({f"{k}@sf1up": v for k, v in rows(up).items()})
    up2line = ""
    if os.path.exists("/tmp/rec_r16_stream_up2.json"):
        up2 = load("/tmp/rec_r16_stream_up2.json")
        p3, n3 = npass(up2)
        out.update({f"{k}@sf10up": v for k, v in rows(up2).items()})
        up2line = (f" AND {p3}/{n3} at 100x (auto K=633 — the first 100x "
                   "drain under the auto contract; r11's ran pre-auto)")
    out["_meta"] = {
        "round": 16,
        "what": ("store-backed registered queries over a STREAM-BUILT root "
                 "(graft.VerifyStream): StreamDrain (80% bases + 20% as 6 "
                 "micro-batches through all four ingest streams + "
                 "StoreMaintain + Doctor gate), then one registered query per "
                 "store family answered by READING the drained store and "
                 "hash-compared against the registered DuckDB oracle over the "
                 "raw corpus tables; all scales run the auto-K contract"),
        "result": (f"{p1}/{n1} pass at sf0.01 AND {p2}/{n2} pass at 10x "
                   f"(auto K){up2line}"),
    }
    json.dump(out, open("CORRECTNESS_STREAM.json", "w"), indent=1, sort_keys=True)
    print(f"STREAM: {p1}/{n1} base, {p2}/{n2} up")

if mode in ("all", "up"):
    up = load("/tmp/rec_r16_up.json")
    # the residual composition landed after the main 10x pass ran —
    # its supplemental row (same corpus, same auto contract) merges in
    if os.path.exists("/tmp/rec_r16_up_res.json"):
        up.update(rows(load("/tmp/rec_r16_up_res.json")))
    p, n = npass(up)
    out = dict(rows(up))
    out["_meta"] = {
        "round": 16,
        "what": ("the full registered-query surface over testdata_up/sf1 "
                 "(10x the main correctness scale), minus only the "
                 "exact-O(n^2) kernel family (Bench.UpExcluded — their "
                 "documented scale paths run instead); runs under "
                 "conf:spark.graft.sim.ncells=AUTO (the engine derives and "
                 "pins K=200) with trainbuckets=2 as in the bench decade"),
        "round16_delta": ("now includes the composed IMI+IVFADC family "
                          "(sim_knn_ann_hier_pq + _sample) and the "
                          "string-granularity clean chunk row "
                          "(dedup_substr_clean_chunk)"),
        "result": f"{p}/{n} pass (rows + schema + values) at 10x under auto K",
    }
    json.dump(out, open("CORRECTNESS_UP.json", "w"), indent=1, sort_keys=True)
    print(f"UP: {p}/{n}")

if mode in ("all", "up2"):
    d = load("CORRECTNESS_UP2.json")
    add = {}
    stale = []
    for k, v in rows(load("/tmp/rec_r16_up2_knn.json")).items():
        key = f"{k}@k80"
        if v.get("err") and "emory" in str(v.get("err")) \
                and d.get(key, {}).get("hash_match"):
            d[key] = dict(d[key], stale=True, stale_reason=(
                "round-16 re-gate hit the DuckDB retry memory ceiling "
                "(oracle infrastructure, not an engine mismatch); result "
                "shown is the last genuine verification"))
            stale.append(key)
            continue
        add[key] = v
    buckets = sorted(glob.glob("/tmp/rec_r16_cleanb*.json"))
    bpass = btot = 0
    for p in buckets:
        b = os.path.basename(p)[len("rec_r16_cleanb"):-len(".json")]
        for k, v in rows(load(p)).items():
            add[f"{k}@b{b}"] = v
            btot += 1
            bpass += 1 if v.get("hash_match") else 0
    d.update(add)
    ok = sum(1 for k, v in d.items() if k != "_meta" and isinstance(v, dict)
             and v.get("hash_match") and not v.get("stale"))
    n_stale = sum(1 for v in d.values()
                  if isinstance(v, dict) and v.get("stale"))
    meta = d.get("_meta", {})
    meta.update({
        "round": 16,
        "round16_delta": (
            "the composed hier+PQ sample joins the @k80 comparability "
            "rows; FULL-corpus string-granularity clean coverage via the "
            "dedup.cleanchunk knob: "
            f"{bpass}/{btot} chunk rows green across {len(buckets)}/20 "
            "doc buckets (the 20 buckets PARTITION the doc_ids — "
            "SubstrDedupSpec pins exact-restriction + disjointness + "
            "cover — so bucket-by-bucket hash equality IS full-corpus "
            "equality of dedup_substr_clean's string form, closing the "
            "round-15 125/126)"
            + ("" if len(buckets) == 20 else
               f"; remaining {20 - len(buckets)} buckets not yet run — "
               "tools/run_r16_cleanfull.sh is resumable per bucket")),
        "stale_rows": n_stale,
    })
    d["_meta"] = meta
    json.dump(d, open("CORRECTNESS_UP2.json", "w"), indent=1, sort_keys=True)
    print(f"UP2: merged {len(add)} rows (clean buckets {len(buckets)}/20, "
          f"{bpass}/{btot} green); verified green {ok}, stale {n_stale}")
