#!/usr/bin/env python3
"""Local pre-flight for the driver's correctness gate.

Runs each oracle_sql.json query in DuckDB over the sf parquet tables and
compares (column names sorted, rows sorted, exact values) against the
Spark parquet written by graft.Verify.

Usage: python3 tools/compare_oracle.py <sfDir> <verifyOutDir>
"""
import duckdb, json, math, sys, glob, os

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out}/oracle_sql.json"))

def canon(cols, rows):
    # repr(), not str(): the driver's hasher is type-sensitive (a Decimal
    # and an int with the same digits hash apart). repr keeps the type
    # visible — Decimal('42') != 42 — so the local gate sees what the
    # driver sees. Round-9 shipped 14 value-correct/type-misaligned
    # queries because str() hid exactly this distinction.
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out_rows = []
    for r in rows:
        out_rows.append(tuple(repr(r[i]) for i in order))
    return [cols[i] for i in order], sorted(out_rows)

fails = 0
for name, sql in sorted(oracle.items()):
    try:
        oc = con.execute(sql)
        ocols = [d[0] for d in oc.description]
        orows = oc.fetchall()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {str(e).splitlines()[0][:160]}")
        fails += 1
        continue
    try:
        sc = con.execute(f"SELECT * FROM '{out}/{name}/*.parquet'")
        scols = [d[0] for d in sc.description]
        srows = sc.fetchall()
    except Exception as e:
        print(f"FAIL {name}: spark output missing: {str(e).splitlines()[0][:120]}")
        fails += 1
        continue
    c1, r1 = canon(ocols, orows)
    c2, r2 = canon(scols, srows)
    if c1 != c2:
        print(f"FAIL {name}: columns oracle={c1} spark={c2}")
        fails += 1
    elif r1 != r2:
        diffs = [(a, b) for a, b in zip(r1, r2) if a != b]
        print(f"FAIL {name}: rows oracle={len(r1)} spark={len(r2)}, "
              f"first diffs: {diffs[:3]}" if len(r1) == len(r2)
              else f"FAIL {name}: row count oracle={len(r1)} spark={len(r2)}")
        fails += 1
    else:
        print(f"ok   {name} ({len(r1)} rows)")

no_oracle = [d for d in os.listdir(out)
             if os.path.isdir(f"{out}/{d}") and d not in oracle]
for d in sorted(no_oracle):
    n = con.execute(f"SELECT count(*) FROM '{out}/{d}/*.parquet'").fetchone()[0]
    print(f"--   {d}: no oracle, {n} rows")
sys.exit(1 if fails else 0)
