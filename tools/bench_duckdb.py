#!/usr/bin/env python3
"""Same-machine DuckDB baseline for the TPC-H-shaped gates (driver-side
tooling only — NOT part of the Spark library).

Usage: python3 tools/bench_duckdb.py <sfDir> <oracle_sql.json> [runs]

Runs each q[0-9][0-9]_* oracle SQL from oracle_sql.json in DuckDB over
the raw parquet at <sfDir>, interleaved passes, reports per-query
MEDIANS (the graft.Bench protocol) as one JSON line. This turns the 2x
bench-vs-baseline gate into a measured same-machine, same-scale ratio
instead of a 1000x extrapolation from the reference's published SF100
numbers (BASELINE.md).
"""
import json
import os
import re
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, oracle_json = sys.argv[1], sys.argv[2]
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if not os.path.exists(path):
            continue  # scaled dirs (e.g. /tmp/sf1) carry TPC-H tables only
        # Spark-written tables are DIRECTORIES of part files; the
        # driver-generated testdata tables are single files
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{path}')")
    oracles = json.load(open(oracle_json))
    qs = sorted(k for k in oracles if re.match(r"q\d\d_", k))
    times = {k: [] for k in qs}
    # warmup pass (buffer cache, DuckDB's own compilation)
    for k in qs:
        con.execute(oracles[k]).fetchall()
    for _ in range(runs):
        for k in qs:
            t0 = time.perf_counter()
            con.execute(oracles[k]).fetchall()
            times[k].append(time.perf_counter() - t0)
    med = {k: sorted(v)[len(v) // 2] for k, v in times.items()}
    print(json.dumps({
        "metric": "duckdb_tpch_total",
        "value": round(sum(med.values()), 3),
        "unit": "sec",
        "runs_per_query": runs,
        "protocol": "interleaved-median",
        "queries": {k: round(v, 4) for k, v in med.items()},
        "sf": sf_dir}))


if __name__ == "__main__":
    main()
