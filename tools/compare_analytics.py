#!/usr/bin/env python3
"""Cross-validate OUR RFM analytics against the REFERENCE's own scripts on
identical data.

Prereq: tools/compare_refine.py ran in <dir> (so refine.py and the
reference refined CSV exist) and `sbt runMain graft.etl.AnalyticsDump <dir>`
wrote rfm_{merchant,payment,card}_spark.csv.

This script runs the reference chain — load_to_db.py (SQLite load) then
db_to_RFManalysis.py / db_to_Payment_RFM.py / db_to_card_RFM.py — in <dir>,
and diffs each output against ours, merged on the group keys (output sort
order differs only within ties): numeric columns exact-or-1e-9, labels
exact.

Usage: python3 tools/compare_analytics.py <dir>
"""
import shutil, subprocess, sys, time

import pandas as pd

d = sys.argv[1]
for f in ["load_to_db.py", "db_to_RFManalysis.py", "db_to_Payment_RFM.py",
          "db_to_card_RFM.py"]:
    shutil.copy(f"/root/reference/{f}", f"{d}/{f}")

t0 = time.time()
for f in ["load_to_db.py", "db_to_RFManalysis.py", "db_to_Payment_RFM.py",
          "db_to_card_RFM.py"]:
    r = subprocess.run([sys.executable, f], cwd=d, capture_output=True,
                       text=True)
    if r.returncode != 0:
        print(f"reference {f} FAILED:\n", r.stdout[-1500:], r.stderr[-1500:])
        sys.exit(1)
ref_secs = time.time() - t0

failures = 0

def compare(name, ref_path, ours_path, keys, encoding="utf-8"):
    global failures
    ref = pd.read_csv(ref_path, encoding=encoding)
    ours = pd.read_csv(ours_path)
    extra = [c for c in ours.columns if c not in ref.columns]
    if extra:  # we keep diagnostics (e.g. card f_rank/m_rank) the ref drops
        print(f"[{name}] ours carries extra columns {extra} — ignored")
        ours = ours[[c for c in ours.columns if c in ref.columns]]
    if sorted(ref.columns) != sorted(ours.columns):
        print(f"[{name}] SCHEMA MISMATCH\n ref: {sorted(ref.columns)}\n"
              f"ours: {sorted(ours.columns)}")
        failures += 1
        return
    m = ref.merge(ours, on=keys, how="outer", suffixes=("_ref", "_ours"),
                  indicator=True)
    if (m["_merge"] != "both").any():
        print(f"[{name}] KEY MISMATCH: "
              f"{m[m._merge != 'both'][keys].head(5).to_dict('records')}")
        failures += 1
        return
    bad = []
    for c in ref.columns:
        if c in keys:
            continue
        a, b = m[f"{c}_ref"], m[f"{c}_ours"]
        if pd.api.types.is_numeric_dtype(a) and \
           pd.api.types.is_numeric_dtype(b):
            diff = (a - b).abs()
            ok = (diff <= 1e-9) | (a.isna() & b.isna())
        else:
            ok = (a.fillna("").astype(str).str.strip()
                  == b.fillna("").astype(str).str.strip())
        if not ok.all():
            i = int((~ok).idxmax())
            bad.append(f"{c}: {int((~ok).sum())} diffs, first "
                       f"{m.loc[i, keys[0]]}: ref={a.iloc[i]!r} "
                       f"ours={b.iloc[i]!r}")
    if bad:
        print(f"[{name}] VALUE MISMATCH: " + "; ".join(bad[:5]))
        failures += 1
    else:
        print(f"[{name}] OK — {len(ref)} groups x "
              f"{len(ref.columns) - len(keys)} metrics identical")

compare("merchant", f"{d}/data/rfm_analysis_result.csv",
        f"{d}/data/rfm_merchant_spark.csv", ["clean_merchant_name"])
compare("payment", f"{d}/payment_rfm_result.csv",
        f"{d}/data/rfm_payment_spark.csv", ["Payment_Method"])
compare("card", f"{d}/data/card_rfm_result.csv",
        f"{d}/data/rfm_card_spark.csv", ["bank_name", "card_name"],
        encoding="utf-8-sig")

print(f"reference analytics chain wall time: {ref_secs:.2f}s")
sys.exit(1 if failures else 0)
