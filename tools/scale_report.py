#!/usr/bin/env python3
"""Scaling study report: reads Bench JSON lines produced at several scale
factors (tools/ScaleGen data), fits the marginal scaling exponent per query,
and prints a markdown table.

Exponent between consecutive scales (rows grow R=10x per step):
    p = log(t_hi / t_lo) / log(R)
p ~ 1 is linear, p < 1 is sublinear (fixed overhead still amortizing, or
parallel slack absorbing the growth), p > 1 is superlinear (a plan that
does not hold — the thing this study exists to catch).

Usage: python3 tools/scale_report.py sf0.1=target/scale/BENCH_sf0.1.json \
           sf1=target/scale/BENCH_sf1.json [sf10=target/scale/BENCH_sf10.json]
"""
import json, math, sys

runs = []  # (label, factor, {q: sec})
for arg in sys.argv[1:]:
    label, path = arg.split("=", 1)
    d = json.load(open(path))
    runs.append((label, float(label.replace("sf", "")), d["queries"]))
runs.sort(key=lambda r: r[1])

names = sorted(set().union(*[set(q) for _, _, q in runs]))
steps = [(runs[i], runs[i + 1]) for i in range(len(runs) - 1)]

hdr = ["query"] + [f"t({l})" for l, _, _ in runs] + [
    f"p({a[0]}→{b[0]})" for a, b in steps]
print("| " + " | ".join(hdr) + " |")
print("|" + "---|" * len(hdr))
flagged = []
for n in names:
    row = [n]
    for _, _, q in runs:
        row.append(f"{q[n]:.2f}" if n in q else "—")
    ps = []
    for (la, fa, qa), (lb, fb, qb) in steps:
        if n in qa and n in qb and qa[n] > 0:
            p = math.log(qb[n] / qa[n]) / math.log(fb / fa)
            ps.append(p)
            row.append(f"{p:.2f}")
        else:
            row.append("—")
    print("| " + " | ".join(row) + " |")
    # flag on the LAST (largest-scale) step only: the early step is mostly
    # fixed-overhead amortization and a meaningless exponent.
    if ps and ps[-1] > 1.15 and n in runs[-1][2] and runs[-1][2][n] > 1.0:
        flagged.append((n, ps[-1], runs[-1][2][n]))

tot = [sum(q.values()) for _, _, q in runs]
print()
print("totals:", ", ".join(f"{l}={t:.1f}s" for (l, _, _), t in zip(runs, tot)))
if flagged:
    print("\nSUPERLINEAR (p>1.15 at the largest step AND >1s):")
    for n, p, t in sorted(flagged, key=lambda x: -x[1]):
        print(f"  {n}: p={p:.2f}, t={t:.1f}s")
else:
    print("\nno superlinear queries at the largest step (p<=1.15 or <1s)")
