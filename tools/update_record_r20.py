#!/usr/bin/env python3
"""Fold a clean full-census bench run into the committed per-query record.

round-20 policy (the r16-r19 precedent): queries NEW this round enter at
the run's measured time; existing entries are lowered where the run beat
the prior minimum (records are historical clean minima, never raised).
The summary `value` is re-derived as the sum of the per-query entries.

Usage: python3 tools/update_record_r20.py <bench_run.json> <note-suffix>
"""
import json, sys

run_path, note_suffix = sys.argv[1], sys.argv[2]
rec_path = "src/main/resources/graft/bench_record.json"

run = json.load(open(run_path))
rec = json.load(open(rec_path))
assert run.get("sf") == rec.get("sf"), (run.get("sf"), rec.get("sf"))
assert not run.get("filtered"), "filtered runs never enter the record"
assert run.get("failed") == [], run.get("failed")
assert run.get("flags_open") == [], run.get("flags_open")

q = rec["queries"]
entered, lowered = [], []
for name, t in run["queries"].items():
    if name not in q:
        q[name] = t
        entered.append(name)
    elif t < q[name]:
        q[name] = t
        lowered.append(name)

rec["value"] = sum(q.values())
rec["note"] = rec["note"] + " " + note_suffix
json.dump(rec, open(rec_path, "w"), indent=None)
print(f"entered {len(entered)}: {sorted(entered)}")
print(f"lowered {len(lowered)}: {sorted(lowered)}")
print(f"new total: {rec['value']:.2f} over {len(q)} queries")
