#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify output
(parquet per query) against the oracle SQL in DuckDB over the same test
tables, compare values exactly (columns sorted by name, rows as produced).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json, sys, glob, os
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
results = {}
for name in sorted(oracle):
    sql = oracle[name]
    spark_path = f"{out_dir}/{name}"
    if not os.path.isdir(spark_path):
        results[name] = "MISSING_SPARK_OUTPUT"
        continue
    try:
        exp = con.sql(sql).df()
    except Exception as e:
        results[name] = f"ORACLE_SQL_ERROR: {e}"
        continue
    got = con.sql(f"SELECT * FROM '{spark_path}/*.parquet'").df()
    exp = exp[sorted(exp.columns)]
    got = got[sorted(got.columns)]
    if list(exp.columns) != list(got.columns):
        results[name] = f"SCHEMA_MISMATCH exp={list(exp.columns)} got={list(got.columns)}"
        continue
    if len(exp) != len(got):
        results[name] = f"ROWCOUNT_MISMATCH exp={len(exp)} got={len(got)}"
        continue
    exp = exp.reset_index(drop=True)
    got = got.reset_index(drop=True)
    bad = []
    for c in exp.columns:
        e, g = exp[c], got[c]
        try:
            same = (e.astype(object).where(pd.notna(e), None)
                    == g.astype(object).where(pd.notna(g), None))
            same = same | (e.isna() & g.isna())  # both-missing == equal
        except Exception:
            same = pd.Series([False] * len(e))
        n_diff = int((~same).sum())
        if n_diff:
            idx = (~same).idxmax()
            bad.append(f"{c}: {n_diff} diffs, first@{idx}: "
                       f"exp={e.iloc[idx]!r} got={g.iloc[idx]!r}")
        elif e.dtype.kind != g.dtype.kind:
            # the driver hash-compares RENDERED values: int32 2 vs int64 2
            # both render "2" (r01 hash-matched those), but float64 2.0 vs
            # int64 2 renders "2.0" vs "2" and FAILS there even though ==
            # passes here (round-1 q12: DuckDB HUGEINT -> pandas float64)
            bad.append(f"{c}: DTYPE_KIND_MISMATCH exp={e.dtype} got={g.dtype}")
    results[name] = "OK" if not bad else "VALUE_MISMATCH " + "; ".join(bad[:3])

n_ok = sum(1 for v in results.values() if v == "OK")
for k, v in results.items():
    print(f"{'PASS' if v == 'OK' else 'FAIL'} {k}: {v}")
print(f"\n{n_ok}/{len(results)} queries match")
