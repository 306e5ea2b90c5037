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
print(f"{len(tables)} tables OK, integrity ok")
