#!/usr/bin/env python3
"""Fold per-corpus graft.KSweep outputs into one committed KSWEEP.json.

Usage: merge_ksweep.py out.json in1.json [in2.json ...] ["note text"]

Each input is one KSweep run record ({"corpus", "trainbuckets",
"sweep": [...]}); the output is {"sweeps": [...], "note": ...} so the
record can hold the assignment sweep (10x corpus, round 15) beside the
probe/store sweep at the 100x corpus (round-15 judge item #5). A later
run for the same corpus+mode replaces the earlier entry (matched on
"corpus" and the presence of probe/store fields).
"""
import json
import sys

out_path = sys.argv[1]
ins = []
note = None
for a in sys.argv[2:]:
    if a.endswith(".json"):
        with open(a) as f:
            ins.append(json.load(f))
    else:
        note = a

def kind(rec):
    fields = set()
    for row in rec.get("sweep", []):
        fields.update(row.keys())
    return (rec.get("corpus"),
            "store" in "".join(fields),
            "probe" in "".join(fields))

sweeps = []
try:
    with open(out_path) as f:
        prev = json.load(f)
    sweeps = prev["sweeps"] if "sweeps" in prev else [prev]
    if note is None:
        note = prev.get("note")
except FileNotFoundError:
    pass

for rec in ins:
    sweeps = [s for s in sweeps if kind(s) != kind(rec)]
    sweeps.append(rec)

out = {"sweeps": sweeps}
if note:
    out["note"] = note
with open(out_path, "w") as f:
    json.dump(out, f, indent=1, sort_keys=True)
print(f"{out_path}: {len(sweeps)} sweeps"
      + (f", note: {note[:60]}..." if note and len(note) > 60 else ""))
