#!/usr/bin/env python3
"""Diff two bench runs and flag real per-query moves.

Separates genuine regressions from loadavg noise without archaeology:
any query whose time moved by more than THRESH x (default 1.5) in either
direction is flagged, everything else is summarized as a band.

Usage:
  python3 tools/bench_diff.py              # last two BENCH_HISTORY.jsonl runs
  python3 tools/bench_diff.py old.json new.json

graft.Bench appends every run's complete JSON line to BENCH_HISTORY.jsonl
(BENCH_SELF.json is overwritten per run; the driver's BENCH_r*.json files
keep only a truncated tail), so the no-arg form compares the last run
against the one before it.
"""
import json
import sys

THRESH = 1.5
MIN_SEC = 0.05  # ignore ratio churn under this floor (timer noise)


def load(path):
    # bench files are one JSON line, possibly preceded by log noise
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith("{") and '"queries"' in line:
                return json.loads(line)
    sys.exit(f"{path}: no bench JSON line found")


def last_two_history():
    try:
        with open("BENCH_HISTORY.jsonl") as f:
            lines = [l for l in f if l.strip().startswith("{")]
    except FileNotFoundError:
        sys.exit("no BENCH_HISTORY.jsonl yet (run graft.Bench twice), "
                 "or pass two files explicitly")
    if len(lines) < 2:
        sys.exit(f"BENCH_HISTORY.jsonl has {len(lines)} run(s); need 2")
    return json.loads(lines[-2]), json.loads(lines[-1])


def main():
    if len(sys.argv) > 2:
        old_path, new_path = sys.argv[1], sys.argv[2]
        old, new = load(old_path), load(new_path)
    else:
        old_path, new_path = ("BENCH_HISTORY.jsonl[-2]",
                              "BENCH_HISTORY.jsonl[-1]")
        old, new = last_two_history()
    oq, nq = old["queries"], new["queries"]
    flagged, band = [], []
    for q in sorted(set(oq) | set(nq)):
        a, b = oq.get(q), nq.get(q)
        if a is None or b is None:
            flagged.append((q, a, b, "added" if a is None else "removed"))
            continue
        if max(a, b) < MIN_SEC:
            continue
        ratio = b / a if a > 0 else float("inf")
        if ratio > THRESH or ratio < 1 / THRESH:
            flagged.append((q, a, b,
                            f"{'slower' if ratio > 1 else 'faster'} {ratio:.2f}x"))
        else:
            band.append(ratio)
    print(f"old: {old_path} total={old['value']:.2f}s "
          f"({len(oq)} queries)")
    print(f"new: {new_path} total={new['value']:.2f}s "
          f"({len(nq)} queries)")
    if band:
        lo, hi = min(band), max(band)
        print(f"in-band ({len(band)} queries): ratios {lo:.2f}x..{hi:.2f}x")
    if not flagged:
        print(f"no moves beyond {THRESH}x — all within the noise band")
        return
    print(f"\nflagged (> {THRESH}x move, or added/removed):")
    for q, a, b, why in flagged:
        fa = "-" if a is None else f"{a:.3f}s"
        fb = "-" if b is None else f"{b:.3f}s"
        print(f"  {q:35s} {fa:>9} -> {fb:>9}  {why}")


if __name__ == "__main__":
    main()
