#!/usr/bin/env python3
"""Authoritative validation of graft's dependency-free SQLite writer:
open the file with the REAL sqlite3 library, run integrity_check, and
poke at the data. Usage: python3 tools/check_sqlite.py <db-file>
(Driver-side tooling — the engine itself never links sqlite.)
"""
import sys
import sqlite3

path = sys.argv[1]
con = sqlite3.connect(path)
cur = con.cursor()

ok = cur.execute("PRAGMA integrity_check").fetchall()
assert ok == [("ok",)], f"integrity_check failed: {ok[:3]}"

tables = [r[0] for r in cur.execute(
    "SELECT name FROM sqlite_master WHERE type='table' ORDER BY name")]
assert tables, "no tables in sqlite_master"
for t in tables:
    n = cur.execute(f'SELECT count(*) FROM "{t}"').fetchone()[0]
    cols = [r[1] for r in cur.execute(f'PRAGMA table_info("{t}")')]
    # full scan + a point query through the rowid btree
    if n:
        first = cur.execute(f'SELECT * FROM "{t}" LIMIT 1').fetchall()
        mid = cur.execute(
            f'SELECT * FROM "{t}" WHERE rowid = ?', (max(1, n // 2),)
        ).fetchall()
        assert first and mid, f"{t}: btree lookup failed"
    print(f"PASS {t}: {n} rows, cols={cols}")

# secondary indexes: integrity_check above already proved every index
# b-tree is well-formed AND in 1:1 correspondence with its table; here we
# additionally prove the query planner USES them and gets the same answer
# as a full scan.
indexes = cur.execute(
    "SELECT name, tbl_name, sql FROM sqlite_master WHERE type='index'"
).fetchall()
for name, tbl, sql in indexes:
    col = sql[sql.rindex("(") + 1:].rstrip(')"').lstrip('"')
    probe = cur.execute(
        f'SELECT "{col}" FROM "{tbl}" WHERE "{col}" IS NOT NULL LIMIT 1'
    ).fetchone()
    if probe is None:
        print(f"PASS {name}: empty table, structure ok")
        continue
    plan = " ".join(str(r) for r in cur.execute(
        f'EXPLAIN QUERY PLAN SELECT count(*) FROM "{tbl}" WHERE "{col}" = ?',
        (probe[0],)).fetchall())
    assert name in plan, f"{name}: planner did not use the index: {plan}"
    via_idx = cur.execute(
        f'SELECT count(*) FROM "{tbl}" WHERE "{col}" = ?', (probe[0],)
    ).fetchone()[0]
    via_scan = cur.execute(
        f'SELECT count(*) FROM "{tbl}" NOT INDEXED WHERE "{col}" = ?',
        (probe[0],)).fetchone()[0]
    assert via_idx == via_scan and via_idx > 0, \
        f"{name}: indexed lookup {via_idx} != scan {via_scan}"
    print(f"PASS {name} ON {tbl}({col}): planner uses index, "
          f"{via_idx} rows match scan")
print(f"{len(tables)} tables, {len(indexes)} indexes OK, integrity ok")
