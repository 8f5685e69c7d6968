#!/usr/bin/env python3
"""Merge knob-wave records into CORRECTNESS_KNOBS.json and refresh the
top-level summary.

Usage: assemble_knobs.py <round> <rec.json>@<tag>[@<note>] ...

Each wave record (a check_oracle*.py output) contributes its rows as
<query>@<tag>. `_meta.round`/`result` are rewritten to describe the
record's CURRENT state (round-17 verdict #3: amended records kept stale
top-level summaries beside bolted-on per-round fields); per-round wave
descriptions accumulate under round<N>_waves.
"""
import json
import os
import sys

P = "CORRECTNESS_KNOBS.json"


def load(p):
    with open(p) as f:
        return json.load(f)


def main():
    rnd = int(sys.argv[1])
    d = load(P)
    meta = d.pop("_meta", {})
    waves = {}
    for spec in sys.argv[2:]:
        parts = spec.split("@")
        path, tag = parts[0], parts[1]
        note = parts[2] if len(parts) > 2 else ""
        if not os.path.exists(path):
            sys.exit(f"missing wave record {path}")
        rec = load(path)
        rows = {k: v for k, v in rec.items()
                if k != "_meta" and isinstance(v, dict)}
        for k, v in rows.items():
            d[f"{k}@{tag}"] = v
        ok = sum(1 for v in rows.values() if v.get("hash_match"))
        waves[f"@{tag}"] = f"{ok}/{len(rows)}" + (f" — {note}" if note else "")
    ok = sum(1 for v in d.values()
             if isinstance(v, dict) and v.get("hash_match")
             and not v.get("stale"))
    n_stale = sum(1 for v in d.values()
                  if isinstance(v, dict) and v.get("stale"))
    n = len(d)
    meta["round"] = rnd
    meta[f"round{rnd}_waves"] = waves
    meta["stale_rows"] = n_stale
    meta["result"] = (f"{ok}/{n} verified-green"
                      + (f" + {n_stale} stale" if n_stale else ""))
    # round-17 verdict #3: drop superseded per-round result aliases —
    # `result` above is the single current summary
    meta.pop("result_r17", None)
    d["_meta"] = meta
    json.dump(d, open(P, "w"), indent=1, sort_keys=True)
    print(f"KNOBS: {meta['result']}  (+{len(waves)} new waves)")


if __name__ == "__main__":
    main()
