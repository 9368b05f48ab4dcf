"""Local replica of the driver's correctness gate.

Runs every queries() entry at a given sf dir, compares with oracle_sql()
through DuckDB: row count, column names, and order-insensitive values
(sorted by all columns). Exits nonzero on any mismatch.
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:] or None
    from linkgraph.session import get_spark

    spark = get_spark(app_name="contract-check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    e = E.entry(spark)
    print(f"entry: rows={e.count()} schema={e.schema.simpleString()}")

    qs, oracles = E.queries(), E.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            mine = fn(spark, sf).toPandas()
        except Exception as ex:
            failures.append(name)
            print(f"FAIL {name}: spark error {type(ex).__name__}: {str(ex)[:300]}")
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok   {name}: rows-only {len(mine)} rows ({dt:.1f}s)")
            continue
        try:
            theirs = con.execute(oracles[name]).fetchdf()
        except Exception as ex:
            failures.append(name)
            print(f"FAIL {name}: duckdb error {str(ex)[:300]}")
            continue
        a, b = canon(mine), canon(theirs)
        if list(a.columns) != list(b.columns):
            failures.append(name)
            print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}")
            continue
        if len(a) != len(b):
            failures.append(name)
            print(f"FAIL {name}: rows {len(a)} vs {len(b)}")
            continue
        if not a.equals(b):
            neq = (a != b).any(axis=1)
            failures.append(name)
            print(f"FAIL {name}: {int(neq.sum())}/{len(a)} differing rows")
            print("  mine:  ", a[neq].head(3).to_dict("records"))
            print("  oracle:", b[neq].head(3).to_dict("records"))
            continue
        print(f"ok   {name}: {len(a)} rows match ({dt:.1f}s)")
    spark.stop()
    if failures:
        print("FAILURES:", failures)
        return 1
    print("ALL MATCH")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
