"""Deterministically derive an sf1-scale dataset (10x sf0.1) for the
scale-sweep of the oracle gate (VERDICT r3 #9). No randomness: replica i
shifts keys by fixed offsets and perturbs payloads arithmetically, so both
Spark and DuckDB read the identical parquet files and the sweep exercises
10x rows/group in every aggregate (r3's 10x sweep caught an ANSI sum
overflow and an oracle-shape bug; this is the next notch).

Key-offset design keeps the gate's planted-id arithmetic collision-free:
doc_id +i*100_000 stays far below the +10_000_000 planting offset; replica
texts get a ' r{i}' suffix so exact-dup mass doesn't grow 10x (the
original exact-dup structure is preserved inside each replica... i=0 is
byte-identical to sf0.1).

Usage: python scripts/make_sf1.py [out_dir] [copies]
       (defaults /tmp/sg_sf1_v1 and 10; copies=100 -> sf10, used for the
       r5 heavy-path spot-probe. Key offsets stay collision-free up to
       copies=100: doc/vec ids reach 9.9M + base < the 10M planting
       offset.)
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
COPIES = 10  # default; argv[2] overrides


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sg_sf1_v1"
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else COPIES
    if copies > 100:
        raise SystemExit("copies > 100 breaks the planted-id offset headroom")
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    # dimension tables: byte-identical copies
    for t in ("region", "nation", "customer", "supplier", "part"):
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{out}/{t}.parquet")

    derivations = {
        "orders": """
            SELECT o_orderkey + i * 200000 AS o_orderkey, o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM src, range({n}) r(i)
        """,
        "lineitem": """
            SELECT l_orderkey + i * 200000 AS l_orderkey, l_partkey,
                   l_suppkey, l_linenumber, l_quantity, l_extendedprice,
                   l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM src, range({n}) r(i)
        """,
        "events": """
            SELECT event_id + i * 10000000 AS event_id, ts, user_id,
                   event_type, value, props
            FROM src, range({n}) r(i)
        """,
        "documents": """
            SELECT doc_id + i * 100000 AS doc_id,
                   CASE WHEN i = 0 THEN text
                        ELSE text || ' r' || CAST(i AS VARCHAR) END AS text,
                   lang, source,
                   CAST(length(CASE WHEN i = 0 THEN text
                        ELSE text || ' r' || CAST(i AS VARCHAR) END) AS BIGINT)
                       AS n_chars
            FROM src, range({n}) r(i)
        """,
        "embeddings": """
            SELECT vec_id + i * 100000 AS vec_id,
                   CAST(list_transform(embedding,
                        x -> x + CAST(i AS FLOAT) * CAST(0.001 AS FLOAT))
                        AS FLOAT[]) AS embedding,
                   label
            FROM src, range({n}) r(i)
        """,
    }
    for t, sql in derivations.items():
        q = sql.format(n=copies)
        con.execute(
            f"""
            COPY (WITH src AS (SELECT * FROM '{SRC}/{t}.parquet')
                  {q} ORDER BY 1)
            TO '{out}/{t}.parquet' (FORMAT PARQUET)
            """
        )
        n = con.execute(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n:,} rows")
    print(f"dataset ({copies}x sf0.1) at {out}")


if __name__ == "__main__":
    main()
