#!/usr/bin/env python3
"""DuckDB head-to-head baseline: time every oracle SQL from a Verify dump
(oracle_sql.json) against the same parquet tables, warm (run each twice,
keep the second), 32 threads. Usage:

    python3 tools/duckdb_sweep.py <sf_dir> <verify_out_dir> [timeout_sec]

Prints one JSON line {"total_sec": ..., "n_queries": ..., "queries": {...}}.
A query exceeding timeout_sec (default: none) is interrupted and recorded
as "timeout"; total_sec then counts timed-out queries at the cap (a lower
bound). Run on an IDLE box (no concurrent Spark JVM) — same discipline as
Bench.
"""
import duckdb, json, sys, time, glob, os, threading

sf_dir, vdir = sys.argv[1], sys.argv[2]
timeout_sec = float(sys.argv[3]) if len(sys.argv) > 3 else None
con = duckdb.connect()
con.execute("SET threads TO 32")
for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
    t = os.path.basename(p)[:-len(".parquet")]
    # Spark writes each table as a DIRECTORY of part files (the ScaleUp
    # stress dirs); the hand-built fixture dirs are single files
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")

def timed(sql):
    """Run once; returns seconds, or None on interrupt (timeout)."""
    cancel, done = None, threading.Event()
    if timeout_sec is not None:
        # gate on `done` so a timer firing in the gap between query
        # completion and cancel() can't interrupt the NEXT query
        cancel = threading.Timer(
            timeout_sec, lambda: None if done.is_set() else con.interrupt())
        cancel.start()
    t0 = time.perf_counter()
    try:
        con.execute(sql).fetchall()
        return time.perf_counter() - t0
    except duckdb.InterruptException:
        return None
    finally:
        done.set()
        if cancel is not None:
            cancel.cancel()

oracle = json.load(open(os.path.join(vdir, "oracle_sql.json")))
times, timeouts = {}, []
for name in sorted(oracle):
    sql = oracle[name]
    warm = timed(sql)  # warm: plan cache, buffer pool
    second = timed(sql) if warm is not None else None
    if second is None:
        timeouts.append(name)
        times[name] = "timeout"
    else:
        times[name] = round(second, 3)

numeric = [v for v in times.values() if isinstance(v, float)]
print(json.dumps({
    "total_sec": round(sum(numeric) + len(timeouts) * (timeout_sec or 0), 2),
    "n_queries": len(times),
    "n_timeouts": len(timeouts),
    "timeout_sec": timeout_sec,
    "queries": dict(sorted(times.items(),
        key=lambda kv: -((timeout_sec or 1e9) if kv[1] == "timeout" else kv[1]))),
}))
