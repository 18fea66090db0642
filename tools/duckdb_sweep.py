#!/usr/bin/env python3
"""DuckDB head-to-head baseline: time every oracle SQL from a Verify dump
(oracle_sql.json) against the same parquet tables, warm (run each twice,
keep the second), 32 threads. Usage:

    python3 tools/duckdb_sweep.py <sf_dir> <verify_out_dir>

Prints one JSON line {"total_sec": ..., "n_queries": ..., "queries": {...}}.
Run on an IDLE box (no concurrent Spark JVM) — same discipline as Bench.
"""
import duckdb, json, sys, time, glob, os

sf_dir, vdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
con.execute("SET threads TO 32")
for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
    t = os.path.basename(p)[:-len(".parquet")]
    # Spark writes each table as a DIRECTORY of part files (the ScaleUp
    # stress dirs); the hand-built fixture dirs are single files
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")

oracle = json.load(open(os.path.join(vdir, "oracle_sql.json")))
times = {}
for name in sorted(oracle):
    sql = oracle[name]
    con.execute(sql).fetchall()  # warm: plan cache, buffer pool
    t0 = time.perf_counter()
    con.execute(sql).fetchall()
    times[name] = round(time.perf_counter() - t0, 3)

print(json.dumps({
    "total_sec": round(sum(times.values()), 2),
    "n_queries": len(times),
    "queries": dict(sorted(times.items(), key=lambda kv: -kv[1])),
}))
