"""Local stand-in for the driver's correctness gate: run every
__spark_entry__ query on Spark and its oracle on DuckDB over the same
parquet, compare row count + (sorted-columns, sorted-rows) value frames.

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(4)
        else:
            try:
                df[c] = df[c].astype("int64")
            except (TypeError, ValueError):
                df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from ontoweaver_spark.session import get_spark

    spark = get_spark(
        app_name="oracle-check", master="local[8]", shuffle_partitions=8,
        extra_conf={"spark.ui.enabled": "false"},
    )
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = normalize(fn(spark, sf_dir).toPandas())
        except Exception as e:
            print(f"FAIL {name}: spark error: {type(e).__name__} {str(e)[:200]}")
            failures.append(name)
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"rows-only {name}: {len(got)} rows (no oracle)")
            continue
        try:
            exp = normalize(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {type(e).__name__} {str(e)[:200]}")
            failures.append(name)
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: row count {len(got)} vs oracle {len(exp)}")
            failures.append(name)
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
            failures.append(name)
            continue
        exp.columns = got.columns
        try:
            pd.testing.assert_frame_equal(got, exp, check_dtype=False, rtol=0, atol=1e-9)
            print(f"OK   {name}: {len(got)} rows")
        except AssertionError as e:
            print(f"FAIL {name}: value mismatch: {str(e)[:300]}")
            failures.append(name)

    spark.stop()
    if failures:
        print(f"\n{len(failures)} FAILURES: {failures}")
        return 1
    print("\nall queries match their oracles")
    return 0


if __name__ == "__main__":
    sys.exit(main())
