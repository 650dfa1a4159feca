"""Synthesize a larger scale factor by key-shifted replication of sf0.1.

Copies /root/testdata/sf0.1 K times into OUT_DIR with every key column
shifted by i*stride per replica, so relational integrity holds (orders
still join customers, lineitem still joins orders/part/supplier) and
group cardinalities grow with data size the way a real bigger dataset's
would. Dimension tables nation/region stay fixed (they are bounded in
TPC-H too). Written with DuckDB (fast, multi-row-group parquet output —
so Spark scans of the result parallelize, unlike the single-row-group
driver files).

Usage: python tools/gen_scaled_data.py [K] [OUT_DIR]
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
STRIDE = 10_000_000

# key columns to shift per table (everything else is copied verbatim)
SHIFTS: dict[str, list[str]] = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "nation": [],   # bounded dims: single copy
    "region": [],
}


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfbig"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    for table, keys in SHIFTS.items():
        src = f"{SRC}/{table}.parquet"
        dst = f"{out}/{table}.parquet"
        if not keys:
            con.execute(
                f"COPY (SELECT * FROM read_parquet('{src}')) TO '{dst}' (FORMAT parquet)"
            )
            continue
        selects = []
        cols = [c[0] for c in con.sql(f"DESCRIBE SELECT * FROM read_parquet('{src}')").fetchall()]
        for i in range(k):
            exprs = ", ".join(
                f"{c} + {i * STRIDE} AS {c}" if c in keys else c for c in cols
            )
            selects.append(f"SELECT {exprs} FROM read_parquet('{src}')")
        union = " UNION ALL ".join(selects)
        con.execute(
            f"COPY ({union}) TO '{dst}' (FORMAT parquet, ROW_GROUP_SIZE 262144)"
        )
        n = con.sql(f"SELECT count(*) FROM read_parquet('{dst}')").fetchone()[0]
        print(f"{table}: {n} rows")
    print(f"wrote {out} at ~sf{0.1 * k:g}")


if __name__ == "__main__":
    raise SystemExit(main())
