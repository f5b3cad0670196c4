#!/usr/bin/env python3
"""Per-query bench regression gate.

Compares two bench outputs and fails loudly when any query slowed by
more than THRESHOLD (default 1.5x) — a regression on one query must not
ship silently inside an improving total (round 3 shipped a 2.5x
dedup_minhash regression that way).

Inputs can be either the driver's BENCH_r{N}.json wrapper (which holds
the bench line under "parsed") or a raw one-line JSON printed by
graft.Bench. With no arguments, compares the two most recent
BENCH_r*.json in the repo root.

Usage:
  tools/bench_gate.py [old.json new.json] [--threshold 1.5]

Exit codes: 0 ok, 1 regression(s), 2 unusable input.
"""
import glob
import json
import os
import re
import sys


def load_queries(path):
    with open(path) as f:
        d = json.load(f)
    if "parsed" in d and isinstance(d["parsed"], dict):
        d = d["parsed"]
    elif "queries" not in d and "tail" in d:
        # driver wrapper with parsed=null: the bench line is embedded in
        # the captured output tail — take the LAST metric line
        lines = re.findall(r'\{"metric".*', d["tail"])
        if not lines:
            sys.exit(f"[gate] {path}: no bench JSON line in tail")
        d = json.loads(lines[-1])
    if "queries" not in d:
        sys.exit(f"[gate] {path}: no 'queries' field (rc!=0 bench run?)")
    if d.get("filtered"):
        sys.exit(f"[gate] {path}: filtered (partial) bench run — not comparable")
    # host calibration stanza (round 7+): min of before/after is the best
    # view of the host's speed during the run (the after number can be
    # inflated by lingering GC/compaction from the query loop itself)
    cal = None
    cals = [d[k] for k in ("host_cal_before", "host_cal_after")
            if isinstance(d.get(k), (int, float)) and d[k] > 0]
    if cals:
        cal = min(cals)
        if len(cals) == 2 and max(cals) / min(cals) > 1.3:
            print(f"[gate] note: {os.path.basename(path)} host drifted "
                  f"{max(cals) / min(cals):.2f}x DURING the run "
                  f"(cal {cals[0]:.2f}s -> {cals[1]:.2f}s)")
    return d["queries"], cal


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    threshold = 1.5
    for a in sys.argv[1:]:
        if a.startswith("--threshold"):
            threshold = float(a.split("=", 1)[1] if "=" in a else sys.argv[sys.argv.index(a) + 1])
    if len(args) == 2:
        old_path, new_path = args
    elif not args:
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        benches = sorted(glob.glob(os.path.join(root, "BENCH_r*.json")),
                         key=lambda p: int(re.search(r"r(\d+)", p).group(1)))
        if len(benches) < 2:
            sys.exit("[gate] need two BENCH_r*.json files to compare")
        old_path, new_path = benches[-2], benches[-1]
    else:
        sys.exit(__doc__)

    (old_q, old_cal), (new_q, new_cal) = load_queries(old_path), load_queries(new_path)
    print(f"[gate] {os.path.basename(old_path)} -> {os.path.basename(new_path)} "
          f"(threshold {threshold}x)")

    # Host-drift normalization: when both runs carry a calibration number
    # and the host speed differs >1.3x, rescale the new run's timings to
    # the old run's host before ratio-ing. The cal workload is fixed and
    # data-independent, so its ratio measures the host, not the engine —
    # without this, a slow host reads as a uniform phantom regression
    # (BENCH_r06's 2.5-4x dedup "regressions" vs same-code gate runs).
    scale = 1.0
    if old_cal and new_cal:
        cal_ratio = new_cal / old_cal
        if cal_ratio > 1.3 or cal_ratio < 1 / 1.3:
            scale = 1.0 / cal_ratio
            print(f"[gate] HOST DRIFT: cal {old_cal:.2f}s -> {new_cal:.2f}s "
                  f"({cal_ratio:.2f}x) — rescaling new-run timings by {scale:.2f} "
                  f"to compare engines, not hosts")
        else:
            print(f"[gate] host cal: {old_cal:.2f}s -> {new_cal:.2f}s "
                  f"({cal_ratio:.2f}x, within 1.3x — no rescale)")
    elif old_cal or new_cal:
        print("[gate] note: only one run has host_cal — comparing raw timings")

    bad = []
    for name in sorted(new_q):
        new_s = new_q[name]
        old_s = old_q.get(name)
        if new_s < 0:
            bad.append((name, old_s, new_s, "FAILED in new run"))
            continue
        new_s = new_s * scale
        if old_s is None:
            print(f"  new   {name}: {new_s:.2f}s (no prior)")
            continue
        if old_s <= 0:
            continue  # failed in the old run; nothing to ratio against
        ratio = new_s / old_s
        # sub-second absolute deltas are host noise, not regressions
        if ratio > threshold and new_s - old_s > 1.0:
            bad.append((name, old_s, new_s, f"{ratio:.2f}x"))
        elif ratio > threshold:
            print(f"  note  {name}: {old_s:.2f}s -> {new_s:.2f}s "
                  f"({ratio:.2f}x, <1s absolute — ignored)")
    gone = sorted(set(old_q) - set(new_q))
    if gone:
        print(f"  note  queries dropped since old run: {', '.join(gone)}")

    total_old = sum(v for v in old_q.values() if v > 0)
    total_new = sum(v * scale for v in new_q.values() if v > 0)
    scaled = " (host-normalized)" if scale != 1.0 else ""
    print(f"[gate] totals: {total_old:.1f}s -> {total_new:.1f}s{scaled}")
    if bad:
        print("[gate] REGRESSIONS:")
        for name, old_s, new_s, why in bad:
            old_str = f"{old_s:.2f}s" if old_s is not None else "n/a"
            print(f"  FAIL  {name}: {old_str} -> {new_s:.2f}s  ({why})")
        sys.exit(1)
    print("[gate] OK — no per-query regression above threshold")


if __name__ == "__main__":
    main()
