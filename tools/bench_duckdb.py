#!/usr/bin/env python3
"""Time DuckDB running the oracle SQL set on the same parquet tables.

Usage: python3 tools/bench_duckdb.py <sfDir> <oracle_sql.json> [repeat]

Prints one JSON line {"total": sec, "queries": {name: sec}} — the
apples-to-apples baseline for BENCH_r{N}: identical SQL, identical
data, same machine. Each query is fully materialized (fetchall) so
lazy execution can't flatter the numbers.
"""
import json
import os
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, sql_path = sys.argv[1], sys.argv[2]
    repeat = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    con = duckdb.connect()
    for t in TABLES:
        # testdata ships single parquet FILES; Spark-generated scale-up
        # dirs (graft.ScaleUp) are DIRECTORIES of part files - glob those
        p = f"{sf_dir}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    with open(sql_path) as f:
        sqls = json.load(f)
    times = {}
    for name in sorted(sqls):
        best = None
        for _ in range(repeat):
            t0 = time.monotonic()
            con.execute(sqls[name]).fetchall()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        times[name] = round(best, 4)
    print(json.dumps(
        {"total": round(sum(times.values()), 3), "queries": times}))


if __name__ == "__main__":
    main()
