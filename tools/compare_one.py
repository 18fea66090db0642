#!/usr/bin/env python3
"""compare_oracle.py scoped to the named queries only (dev iteration).

Usage: python3 tools/compare_one.py <sfDir> <verifyOutDir> <query> [query ...]
"""
import duckdb, json, sys, glob, os

sf, out = sys.argv[1], sys.argv[2]
names = sys.argv[3:]
con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    con.execute(f"CREATE VIEW {os.path.basename(p)[:-8]} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out}/oracle_sql.json"))

def canon(cols, rows):
    # repr(), not str(): type-visible canonicalization (Decimal vs int),
    # matching the driver's type-sensitive hasher. See compare_oracle.py.
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return ([cols[i] for i in order],
            sorted(tuple(repr(r[i]) for i in order) for r in rows))

fails = 0
for name in names:
    if name not in oracle:
        print(f"FAIL {name}: no oracle entry"); fails += 1; continue
    try:
        oc = con.execute(oracle[name])
        ocols = [d[0] for d in oc.description]; orows = oc.fetchall()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {str(e).splitlines()[0][:200]}")
        fails += 1; continue
    try:
        sc = con.execute(f"SELECT * FROM '{out}/{name}/*.parquet'")
        scols = [d[0] for d in sc.description]; srows = sc.fetchall()
    except Exception as e:
        print(f"FAIL {name}: spark output missing: {str(e).splitlines()[0][:120]}")
        fails += 1; continue
    c1, r1 = canon(ocols, orows)
    c2, r2 = canon(scols, srows)
    if c1 != c2:
        print(f"FAIL {name}: columns oracle={c1} spark={c2}"); fails += 1
    elif r1 != r2:
        if len(r1) != len(r2):
            print(f"FAIL {name}: row count oracle={len(r1)} spark={len(r2)}")
        else:
            diffs = [(a, b) for a, b in zip(r1, r2) if a != b]
            print(f"FAIL {name}: {len(diffs)} differing rows, first: {diffs[:3]}")
        fails += 1
    else:
        print(f"OK   {name}: {len(r1)} rows")
sys.exit(1 if fails else 0)
