"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() in DuckDB over the same parquet tables, compare
row count + schema + order-insensitive value hash.

Usage: python scripts/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> str:
    n = _normalize(df)
    payload = n.to_csv(index=False, float_format="%.6f").encode()
    return hashlib.sha256(payload).hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    from engine.session import get_spark, ship_package

    spark = get_spark(app="oracle-check")
    ship_package(spark)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spark_df = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error: {str(e)[:300]}")
            continue
        dt = time.time() - t0
        if name not in oracles:
            ok = len(spark_df) >= 0
            print(f"rows-only {name}: rows={len(spark_df)} ({dt:.1f}s)")
            continue
        try:
            oracle_df = con.sql(oracles[name]).df()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: oracle error: {str(e)[:300]}")
            continue
        problems = []
        if len(spark_df) != len(oracle_df):
            problems.append(f"rows {len(spark_df)} != {len(oracle_df)}")
        if sorted(spark_df.columns) != sorted(oracle_df.columns):
            problems.append(
                f"cols {sorted(spark_df.columns)} != {sorted(oracle_df.columns)}"
            )
        else:
            hs, ho = value_hash(spark_df), value_hash(oracle_df)
            if hs != ho:
                problems.append(f"hash {hs} != {ho}")
                a, b = _normalize(spark_df), _normalize(oracle_df)
                diff = a.compare(b) if a.shape == b.shape else None
                if diff is not None and len(diff):
                    print(diff.head(5))
        if problems:
            failures.append(name)
            print(f"FAIL {name}: {'; '.join(problems)} ({dt:.1f}s)")
        else:
            print(f"OK   {name}: rows={len(spark_df)} hash match ({dt:.1f}s)")

    spark.stop()
    print(f"\n{'ALL OK' if not failures else 'FAILURES: ' + ', '.join(failures)}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
