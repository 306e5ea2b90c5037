#!/usr/bin/env python3
"""Cross-validate OUR refine stage against the REFERENCE's refine.py on the
identical unified CSV, and report both runtimes.

Flow: `sbt runMain graft.etl.RefineDump <dir>` (example corpus) or
`graft.etl.RefineBench <dir> <rows>` (synthetic corpus) has produced
  <dir>/data/result_all_banks.csv         (stage input)
  <dir>/data/refined_all_banks_spark.csv  (our refine output)
  <dir>/configs/*                          (rule tables)
This script copies /root/reference/refine.py next to them, runs it (pure
pandas — same CSV + configs), and diffs the refined outputs cell-by-cell
with float-aware, vectorized comparison.

Usage: python3 tools/compare_refine.py <dir>
"""
import shutil, subprocess, sys, time

import numpy as np
import pandas as pd

d = sys.argv[1]
shutil.copy("/root/reference/refine.py", f"{d}/refine.py")
t0 = time.time()
r = subprocess.run([sys.executable, "refine.py"], cwd=d,
                   capture_output=True, text=True)
ref_secs = time.time() - t0
if r.returncode != 0:
    print("reference refine.py FAILED:\n", r.stdout[-2000:], r.stderr[-2000:])
    sys.exit(1)

ref = pd.read_csv(f"{d}/data/refined_all_banks.csv", dtype=str,
                  encoding="utf-8-sig")
ours = pd.read_csv(f"{d}/data/refined_all_banks_spark.csv", dtype=str)

if list(ref.columns) != list(ours.columns):
    print(f"SCHEMA MISMATCH\n ref: {list(ref.columns)}\nours: {list(ours.columns)}")
    sys.exit(1)
if len(ref) != len(ours):
    print(f"ROWCOUNT MISMATCH ref={len(ref)} ours={len(ours)}")
    sys.exit(1)

bad = 0
for c in ref.columns:
    a = ref[c].fillna("")
    b = ours[c].fillna("")
    same = a.str.strip() == b.str.strip()
    if not same.all():
        # float-aware second pass: '500.0' == '500.00' == '500'
        fa = pd.to_numeric(a, errors="coerce")
        fb = pd.to_numeric(b, errors="coerce")
        same = same | (fa.notna() & fb.notna() & (fa == fb))
    n_bad = int((~same).sum())
    if n_bad:
        i = int((~same).idxmax())
        print(f"DIFF col {c}: {n_bad} cells, first@row {i}: "
              f"ref={a.iloc[i]!r} ours={b.iloc[i]!r}")
        bad += n_bad

total = len(ref) * len(ref.columns)
print(f"{total - bad}/{total} cells match"
      + ("" if bad else " — OUR REFINE == REFERENCE refine.py"))
print(f"reference refine.py wall time: {ref_secs:.2f}s over {len(ref)} rows")
sys.exit(1 if bad else 0)
