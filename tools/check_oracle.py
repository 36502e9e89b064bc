"""Local twin of the driver's correctness gate.

Runs every __spark_entry__.queries() entry on Spark and its oracle_sql()
on DuckDB at the given sf dir, then compares: row count, column names,
and order-insensitive values (columns sorted by name, rows sorted).

Usage: python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # driver-style value normalization: fixed decimal text
        return f"{v:.6f}"
    return str(v)


def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from olaf_spark.session import get_spark

    spark = get_spark(8, app_name="check_oracle")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, osql = e.queries(), e.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            spark_cols = df.columns
            spark_rows = [tuple(r) for r in df.collect()]
        except Exception as ex:
            failures.append((name, f"SPARK ERROR: {ex}"))
            print(f"{name:28s} SPARK ERROR: {str(ex)[:200]}")
            continue
        if name not in osql:
            print(f"{name:28s} rows={len(spark_rows):7d}  (no oracle — rows-only)")
            continue
        try:
            rel = con.sql(osql[name])
            duck_cols = [c for c in rel.columns]
            duck_rows = rel.fetchall()
        except Exception as ex:
            failures.append((name, f"DUCKDB ERROR: {ex}"))
            print(f"{name:28s} DUCKDB ERROR: {str(ex)[:200]}")
            continue
        ok_cols = sorted(spark_cols) == sorted(duck_cols)
        ok_count = len(spark_rows) == len(duck_rows)
        a = normalize(spark_rows, spark_cols)
        b = normalize(duck_rows, duck_cols)
        ok_vals = a == b
        status = "OK" if (ok_cols and ok_count and ok_vals) else "MISMATCH"
        print(f"{name:28s} rows={len(spark_rows):7d}  cols={'OK' if ok_cols else spark_cols}  "
              f"count={'OK' if ok_count else len(duck_rows)}  values={'OK' if ok_vals else 'DIFF'}")
        if status == "MISMATCH":
            failures.append((name, "diff"))
            if not ok_vals and ok_count and ok_cols:
                diff_a = [x for x in a if x not in set(b)][:3]
                diff_b = [x for x in b if x not in set(a)][:3]
                print(f"   spark-only: {diff_a}")
                print(f"   duck-only : {diff_b}")
    spark.stop()
    if failures:
        print(f"\nFAILED: {[f[0] for f in failures]}")
        sys.exit(1)
    print("\nALL OK")


if __name__ == "__main__":
    main()
