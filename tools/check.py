#!/usr/bin/env python3
"""Dev-only parity harness (mirrors the driver's correctness gate).

Runs DuckDB oracle SQL from outDir/oracle_sql.json against the sf parquet
tables and compares with the Spark results Verify wrote to outDir/<name>/.
Not part of the shipped library — the engine itself has no Python deps.

Usage: python3 tools/check.py <sfDir> <outDir> [query ...]
"""
import json, sys, glob, os
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

import datetime

def norm(v):
    if isinstance(v, float):
        return round(v, 9)
    if hasattr(v, "isoformat"):  # datetime.datetime / date / pandas Timestamp
        return v.isoformat()
    return v

def rows_of(table):
    cols = sorted(table.column_names)
    data = [table.column(c).to_pylist() for c in cols]
    rows = [tuple(norm(x) for x in row) for row in zip(*data)] if data else []
    return cols, rows

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    # modest worker pool: at threads=n_cores the allocator intermittently
    # fails on a loaded box (EAGAIN thread spawn / spurious bad_alloc)
    con.execute("SET threads=8")
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        spark_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{spark_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            duck = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}")
            n_fail += 1
            continue
        spark = pq.read_table(spark_dir)
        dc, dr = rows_of(duck)
        sc, sr = rows_of(spark)
        if dc != sc:
            print(f"FAIL {name}: cols duck={dc} spark={sc}")
            n_fail += 1
            continue
        if sorted(map(repr, dr)) != sorted(map(repr, sr)):
            print(f"FAIL {name}: {len(dr)} duck rows vs {len(sr)} spark rows")
            for i, (a, b) in enumerate(zip(sorted(map(repr, dr)), sorted(map(repr, sr)))):
                if a != b:
                    print(f"  first diff at {i}:\n    duck : {a}\n    spark: {b}")
                    break
            n_fail += 1
            continue
        print(f"PASS {name} ({len(dr)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
