#!/usr/bin/env python3
"""Per-query bench regression gate.

Compares two bench outputs and fails loudly when any query slowed by
more than THRESHOLD (default 1.5x) — a regression on one query must not
ship silently inside an improving total (round 3 shipped a 2.5x
dedup_minhash regression that way).

Inputs can be either the driver's BENCH_r{N}.json wrapper (which holds
the bench line under "parsed") or a raw output of graft.Bench (which
since round 8 prints TWO lines: the detailed per-query line, then a
compact {"metric":"summary",...} line that survives any tail window).
With no arguments, compares the two most recent BENCH_r*.json in the
repo root.

Host-drift normalization prefers the engine-INDEPENDENT jvm_cal
(pure-JVM loop, round 8+) over the Spark-based host_cal: the Spark cal
runs through the engine under test, so a genuine uniform engine
regression would inflate it and be rescaled away. When only the Spark
cal is available AND rescaling flips a per-query pass/fail outcome, the
gate exits 3 unless --ack-drift is passed — a masked outcome must be
acknowledged, not silently normalized.

In-band adjudication (round 13+): when the new run's record carries
per-flag evidence (re-run, mem-cal snapshot, control-pair times), a
CLOSED flag's query is scored at its adjudicated effective time instead
of the phase-contaminated main-pass time; OPEN flags keep the main time
and fail like any other regression. Round-12-format records (rerun-only
evidence) are reconstructed under their original closure rule.

Usage:
  tools/bench_gate.py [old.json new.json] [--threshold=1.5] [--ack-drift]

Exit codes: 0 ok, 1 regression(s), 2 unusable input,
            3 spark-cal rescale changed an outcome (pass --ack-drift).
"""
import glob
import json
import os
import re
import sys


def load_queries(path):
    """Returns (queries_or_None, cal_dict, total_or_None).

    cal_dict maps 'jvm'/'spark' to the min of before/after when present.
    queries is None when only the compact summary survived (truncated
    official record) — the caller falls back to a totals-only compare.
    """
    with open(path) as f:
        text = f.read()
    try:
        d = json.loads(text)
    except ValueError:
        # raw graft.Bench output is TWO json lines (detail, then summary) —
        # route through the same line scanner the driver-wrapper tail uses
        d = {"tail": text}
    detail, summary = None, None
    if "parsed" in d and isinstance(d["parsed"], dict):
        p = d["parsed"]
        if p.get("metric") == "summary":
            summary = p
        else:
            detail = p
    if detail is None and "tail" in d:
        # driver wrapper: bench lines are embedded in the captured output
        # tail. The detailed line may be front-truncated; the summary line
        # is last and compact, so it always parses.
        for line in re.findall(r'\{"metric".*', d["tail"]):
            try:
                obj = json.loads(line)
            except ValueError:
                continue  # front-truncated detailed line
            if obj.get("metric") == "summary":
                summary = obj
            elif "queries" in obj:
                detail = obj
    if detail is None and summary is None:
        if "queries" in d:  # raw single-line bench output
            detail = d
        else:
            sys.exit(f"[gate] {path}: no parseable bench line")
    src = detail or summary
    if src.get("filtered"):
        sys.exit(f"[gate] {path}: filtered (partial) bench run — not comparable")
    cal = {}
    # "mem" (round 12+) is evidence-only: a DRAM-bandwidth loop that sees
    # host phases the pure-ALU jvm loop stays flat through; rescaling is
    # still done by jvm/spark (mem would over-correct CPU-bound queries),
    # but its drift note is the tiebreaker when jvm is flat and queries
    # are uniformly elevated.
    for key, names in (("jvm", ("jvm_cal_before", "jvm_cal_after")),
                       ("spark", ("host_cal_before", "host_cal_after")),
                       ("mem", ("mem_cal_before", "mem_cal_after"))):
        vals = [src[k] for k in names
                if isinstance(src.get(k), (int, float)) and src[k] > 0]
        if vals:
            cal[key] = min(vals)
            if len(vals) == 2 and max(vals) / min(vals) > 1.3:
                print(f"[gate] note: {os.path.basename(path)} host drifted "
                      f"{max(vals) / min(vals):.2f}x DURING the run "
                      f"({key} cal {vals[0]:.2f}s -> {vals[1]:.2f}s)")
    # round 18: records carry an adjudicated_total (per-query min of
    # main/rerun/interleave — the run's own refutations folded in) beside
    # the raw sum; prefer it for totals-only compares, same reasoning as
    # the per-query effective-time rule below
    total = next((src[k] for k in ("adjudicated_total", "value")
                  if isinstance(src.get(k), (int, float))), None)
    queries = detail.get("queries") if detail else None
    if queries is None:
        print(f"[gate] note: {os.path.basename(path)} has only the compact "
              f"summary (detailed line truncated) — totals-only compare")
    adj = detail.get("adjudication") if detail else None
    return queries, cal, total, adj if isinstance(adj, dict) else {}


def pick_cal(old_cal, new_cal):
    """Prefer the engine-independent jvm cal; fall back to spark cal."""
    for key in ("jvm", "spark"):
        if old_cal.get(key) and new_cal.get(key):
            return key, old_cal[key], new_cal[key]
    return None, None, None


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    threshold = 1.5
    ack_drift = "--ack-drift" in sys.argv[1:]
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

    old_q, old_cal, old_total, _ = load_queries(old_path)
    new_q, new_cal, new_total, new_adj = load_queries(new_path)
    print(f"[gate] {os.path.basename(old_path)} -> {os.path.basename(new_path)} "
          f"(threshold {threshold}x)")

    # In-band self-adjudication (round 13+): a flagged query's record entry
    # carries its own re-run, a mem-cal snapshot, and two control-query
    # times, and Bench closes the flag when the re-run is back in band —
    # raw, or after dividing out the host slowdown the controls measured
    # (closed_by: "rerun" / "control"). The gate honors a CLOSED flag by
    # scoring the query at its adjudicated effective time instead of the
    # phase-contaminated main-pass time; OPEN flags keep the main time and
    # fail like any other regression. This is the "zero gate archaeology"
    # contract: the record refutes (or confirms) itself.
    if new_adj and new_q is not None:
        for name, ev in sorted(new_adj.items()):
            if not isinstance(ev, dict) or name not in new_q:
                continue
            rerun = ev.get("rerun", -1)
            norm = ev.get("norm", 1) or 1
            if "closed_by" in ev:
                closed = ev.get("closed_by") or ""
            else:
                # round-12 record format: no control evidence; reconstruct
                # its rerun-only closure rule (2x + 1 s floor)
                rec = ev.get("record", 0) or 0
                closed = ("rerun" if isinstance(rerun, (int, float)) and rerun >= 0
                          and not (rerun > 2 * rec and rerun - rec > 1.0) else "")
            if closed and isinstance(rerun, (int, float)) and rerun > 0:
                eff = min(new_q[name], rerun / norm if closed == "control" else rerun)
                print(f"  adj   {name}: main {new_q[name]:.2f}s -> effective "
                      f"{eff:.2f}s (closed_by={closed}, rerun {rerun:.2f}s, "
                      f"norm {norm:.2f}x)")
                new_q[name] = eff
            elif not closed:
                print(f"  adj   {name}: flag OPEN (main {new_q[name]:.2f}s, "
                      f"rerun {rerun if isinstance(rerun, (int, float)) else -1:.2f}s, "
                      f"norm {norm:.2f}x) — scored at main time")

    # Host-drift normalization: when both runs carry a calibration number
    # and the host speed differs >1.3x, rescale the new run's timings to
    # the old run's host before ratio-ing — a slow host must not read as a
    # uniform phantom regression (BENCH_r06's 2.5-4x dedup "regressions"
    # vs same-code gate runs).
    scale = 1.0
    cal_kind, oc, nc = pick_cal(old_cal, new_cal)
    if cal_kind:
        cal_ratio = nc / oc
        if cal_ratio > 1.3 or cal_ratio < 1 / 1.3:
            scale = 1.0 / cal_ratio
            print(f"[gate] HOST DRIFT ({cal_kind} cal): {oc:.2f}s -> {nc:.2f}s "
                  f"({cal_ratio:.2f}x) — rescaling new-run timings by {scale:.2f} "
                  f"to compare engines, not hosts")
        else:
            print(f"[gate] host cal ({cal_kind}): {oc:.2f}s -> {nc:.2f}s "
                  f"({cal_ratio:.2f}x, within 1.3x — no rescale)")
    else:
        print("[gate] note: no shared calibration — comparing raw timings")

    if old_q is None or new_q is None:
        # Truncated official record: compare totals only, cal-normalized.
        if old_total is None or new_total is None:
            sys.exit("[gate] cannot compare: no per-query data and no totals")
        scaled_new = new_total * scale
        ratio = scaled_new / old_total if old_total > 0 else float("inf")
        scaled = " (host-normalized)" if scale != 1.0 else ""
        print(f"[gate] totals-only: {old_total:.1f}s -> {scaled_new:.1f}s{scaled} "
              f"({ratio:.2f}x)")
        if ratio > threshold:
            print(f"[gate] FAIL: suite total regressed {ratio:.2f}x")
            sys.exit(1)
        print("[gate] OK — total within threshold (per-query detail unavailable)")
        return

    def find_bad(s):
        out = []
        for name in sorted(new_q):
            new_s = new_q[name]
            old_s = old_q.get(name)
            if new_s < 0:
                out.append((name, old_s, new_s, "FAILED in new run"))
                continue
            new_s = new_s * s
            if old_s is None or old_s <= 0:
                continue
            ratio = new_s / old_s
            # sub-second absolute deltas are host noise, not regressions
            if ratio > threshold and new_s - old_s > 1.0:
                out.append((name, old_s, new_s, f"{ratio:.2f}x"))
        return out

    bad = find_bad(scale)
    for name in sorted(new_q):
        new_s, old_s = new_q[name] * scale, old_q.get(name)
        if new_q[name] < 0:
            continue
        if old_s is None:
            print(f"  new   {name}: {new_s:.2f}s (no prior)")
        elif old_s > 0 and new_s / old_s > threshold and new_s - old_s <= 1.0:
            print(f"  note  {name}: {old_s:.2f}s -> {new_s:.2f}s "
                  f"({new_s / old_s:.2f}x, <1s absolute — ignored)")
    gone = sorted(set(old_q) - set(new_q))
    if gone:
        print(f"  note  queries dropped since old run: {', '.join(gone)}")

    total_old = sum(v for v in old_q.values() if v > 0)
    total_new = sum(v * scale for v in new_q.values() if v > 0)
    scaled = " (host-normalized)" if scale != 1.0 else ""
    print(f"[gate] totals: {total_old:.1f}s -> {total_new:.1f}s{scaled}")

    # An engine-DEPENDENT (spark) cal rescale that flips outcomes needs
    # explicit acknowledgment, in BOTH directions: the drift it "corrects"
    # could itself be a uniform engine regression (rescale masks a real
    # failure), or the cal could just be noisy — it bounces >1.3x WITHIN
    # single runs on this host — and the rescale then manufactures
    # failures the raw timings don't show. The jvm cal cannot be inflated
    # by the engine, so its rescale is trusted.
    if scale != 1.0 and cal_kind == "spark":
        raw_bad = find_bad(1.0)
        bad_names = {b[0] for b in bad}
        raw_names = {b[0] for b in raw_bad}
        masked = [b for b in raw_bad if b[0] not in bad_names]
        invented = [b for b in bad if b[0] not in raw_names]
        if (masked or invented) and not ack_drift:
            print("[gate] spark-cal rescale CHANGES pass/fail outcomes — the "
                  "spark cal runs through the engine under test and is noisy; "
                  "re-run with --ack-drift to accept the rescaled view, or "
                  "bench on a settled host:")
            for name, old_s, new_s, why in masked:
                print(f"  MASKED   {name}: {old_s:.2f}s -> {new_s:.2f}s  ({why} raw, "
                      "pass after rescale)")
            for name, old_s, new_s, why in invented:
                print(f"  INVENTED {name}: {old_s:.2f}s -> {new_s:.2f}s  ({why} "
                      "after rescale, pass raw)")
            sys.exit(3)
        if ack_drift and invented:
            # acknowledged: trust raw timings for rescale-only failures
            print("[gate] note: --ack-drift — dropping rescale-only failures "
                  f"({', '.join(b[0] for b in invented)}); raw timings pass")
            bad = [b for b in bad if b[0] in raw_names]

    if bad:
        print("[gate] REGRESSIONS:")
        for name, old_s, new_s, why in bad:
            old_str = f"{old_s:.2f}s" if old_s is not None else "n/a"
            print(f"  FAIL  {name}: {old_str} -> {new_s:.2f}s  ({why})")
        sys.exit(1)
    print("[gate] OK — no per-query regression above threshold")


if __name__ == "__main__":
    main()
