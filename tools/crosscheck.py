"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB at
sf0.01, compare row count + column names + order-insensitive values.

Usage: python tools/crosscheck.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")

import duckdb

from go_html_transform_spark.session import get_spark

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6g}"
    if isinstance(v, bool):
        return str(int(v))
    if v is None:
        return ""
    return str(v)


def norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_cell(r[i]) for i in idx) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as E

    spark = get_spark(app_name="crosscheck", cores=8, shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, os_ = E.queries(), E.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sorted(sdf.columns)
            s_rows = norm_rows(sdf.columns, [tuple(r) for r in sdf.collect()])
        except Exception as e:
            failures.append((name, f"spark error: {e}"))
            print(f"FAIL {name}: spark error: {str(e)[:400]}")
            continue
        if name not in os_:
            print(f"SKIP-ORACLE {name}: rows={len(s_rows)} (rows-only check)")
            if len(s_rows) == 0:
                failures.append((name, "zero rows with no oracle"))
            continue
        try:
            rel = con.sql(os_[name])
            d_cols = sorted(rel.columns)
            d_rows = norm_rows(rel.columns, rel.fetchall())
        except Exception as e:
            failures.append((name, f"duckdb error: {e}"))
            print(f"FAIL {name}: duckdb error: {str(e)[:400]}")
            continue
        if s_cols != d_cols:
            failures.append((name, f"schema mismatch: {s_cols} vs {d_cols}"))
            print(f"FAIL {name}: schema {s_cols} vs {d_cols}")
        elif len(s_rows) != len(d_rows):
            failures.append((name, f"rowcount {len(s_rows)} vs {len(d_rows)}"))
            print(f"FAIL {name}: rowcount {len(s_rows)} vs {len(d_rows)}")
        elif s_rows != d_rows:
            diff = next(
                (i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b
            )
            failures.append((name, f"value mismatch at sorted row {diff[0]}"))
            print(f"FAIL {name}: first diff @{diff[0]}\n  spark={diff[1]}\n  duck ={diff[2]}")
        else:
            print(f"OK   {name}: {len(s_rows)} rows")

    print(f"\n{len(qs) - len(failures)}/{len(qs)} ok")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
