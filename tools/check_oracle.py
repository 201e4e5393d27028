#!/usr/bin/env python3
"""Local replica of the driver's t2 DuckDB-oracle gate (driver-side tooling
only — NOT part of the Spark library).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query directory under <verifyOutDir>: read the Spark result
parquet, run the matching oracle SQL from oracle_sql.json in DuckDB over
the raw tables in <sfDir>, sort columns by name + sort rows, and compare
cell-by-cell. Exact match required (the engine's aggregation convention
makes doubles bit-identical); near-misses are reported with deltas.
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        return v
    if hasattr(v, "as_py"):
        v = v.as_py()
    return v


def load_spark(qdir: Path):
    files = sorted(qdir.glob("*.parquet"))
    if not files:
        return None, None
    tbl = pq.read_table(qdir)
    cols = sorted(tbl.column_names)
    rows = [tuple(norm(tbl.column(c)[i].as_py()) for c in cols)
            for i in range(tbl.num_rows)]
    return cols, sorted(rows, key=lambda r: tuple(str(x) for x in r))


def run_oracle(con, sql: str):
    res = con.execute(sql)
    names = [d[0] for d in res.description]
    data = res.fetchall()
    order = sorted(range(len(names)), key=lambda i: names[i])
    cols = [names[i] for i in order]
    rows = [tuple(norm(r[i]) for i in order) for r in data]
    return cols, sorted(rows, key=lambda r: tuple(str(x) for x in r))


def cells_equal(a, b):
    if isinstance(a, float) and isinstance(b, (float, int)):
        if a == b:
            return True, 0.0
        if math.isnan(a) and isinstance(b, float) and math.isnan(b):
            return True, 0.0
        return False, abs(a - float(b))
    # decimal vs float etc.
    if type(a) is not type(b):
        try:
            fa, fb = float(a), float(b)
            return (fa == fb), abs(fa - fb)
        except (TypeError, ValueError):
            pass
    return a == b, None


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    out = Path(out_dir)
    oracles = json.loads((out / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    n_pass = n_fail = n_noracle = 0
    qdirs = sorted(d for d in out.iterdir() if d.is_dir())
    for qdir in qdirs:
        name = qdir.name
        scols, srows = load_spark(qdir)
        if scols is None:
            print(f"FAIL  {name}: no spark output")
            n_fail += 1
            continue
        if name not in oracles:
            status = "ok(rows-only)" if len(srows) > 0 else "EMPTY"
            print(f"----  {name}: no oracle, rows={len(srows)} {status}")
            n_noracle += 1
            continue
        try:
            ocols, orows = run_oracle(con, oracles[name])
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}")
            n_fail += 1
            continue
        if scols != ocols:
            print(f"FAIL  {name}: columns spark={scols} oracle={ocols}")
            n_fail += 1
            continue
        if len(srows) != len(orows):
            print(f"FAIL  {name}: rowcount spark={len(srows)} oracle={len(orows)}")
            n_fail += 1
            continue
        bad = None
        for i, (sr, orow) in enumerate(zip(srows, orows)):
            for c, (sv, ov) in enumerate(zip(sr, orow)):
                eq, delta = cells_equal(sv, ov)
                if not eq:
                    bad = (i, scols[c], sv, ov, delta)
                    break
            if bad:
                break
        if bad:
            i, cname, sv, ov, delta = bad
            d = f" delta={delta:.3e}" if delta is not None else ""
            print(f"FAIL  {name}: row {i} col {cname}: spark={sv!r} oracle={ov!r}{d}")
            n_fail += 1
        else:
            print(f"PASS  {name} ({len(srows)} rows, {len(scols)} cols)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
