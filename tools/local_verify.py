#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs after `graft.Verify` has dumped per-query parquet + oracle_sql.json:
registers the sf tables as DuckDB views, executes each oracle SQL, and
compares column-name-sorted, row-sorted results against Spark's output.

Usage: python3 tools/local_verify.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return repr(v)


def rows_key(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm(r[i]) for i in order))
    out.sort()
    return out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)

    failures = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            spark_rel = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            spark_cols = [c.lower() for c in spark_rel.columns]
            spark_rows = spark_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}")
            failures += 1
            continue
        try:
            duck_rel = con.sql(sql)
            duck_cols = [c.lower() for c in duck_rel.columns]
            duck_rows = duck_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            failures += 1
            continue
        if sorted(spark_cols) != sorted(duck_cols):
            print(f"FAIL {name}: columns spark={sorted(spark_cols)} "
                  f"duck={sorted(duck_cols)}")
            failures += 1
            continue
        a = rows_key(spark_rows, spark_cols)
        b = rows_key(duck_rows, duck_cols)
        if len(a) != len(b):
            print(f"FAIL {name}: rows spark={len(a)} duck={len(b)}")
            failures += 1
            continue
        if a != b:
            bad = [i for i, (x, y) in enumerate(zip(a, b)) if x != y][:3]
            print(f"FAIL {name}: value mismatch at sorted rows {bad}")
            for i in bad[:2]:
                print(f"   spark: {a[i]}")
                print(f"   duck : {b[i]}")
            failures += 1
            continue
        print(f"PASS {name} ({len(a)} rows)")
    print(f"{'OK' if failures == 0 else 'FAILED'}: "
          f"{len(oracle) - failures}/{len(oracle)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
