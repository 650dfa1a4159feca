"""Per-query Spark vs DuckDB timing comparison at the bench scale factor.

Times every ``oracle_sql()`` query on DuckDB (32 threads, same machine,
same parquet) and joins the result with the Spark timings in
``BENCH_local.json`` (produced by ``python bench.py``). Prints a table
sorted by Spark/DuckDB ratio plus aggregate totals — the evidence behind
PERF.md's two-regime analysis (fixed ~0.3-0.6 s Spark job floor on
sub-100 ms queries vs algorithmic wins on the heavy ones).

Usage: python tools/compare_bench.py [--md]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from local_data_pipeline_spark.queries import QUERIES  # noqa: E402
from local_data_pipeline_spark.session import TABLES  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
BENCH_JSON = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH_local.json")


def main() -> None:
    md = "--md" in sys.argv
    with open(BENCH_JSON) as f:
        spark_times = json.load(f)["queries"]

    con = duckdb.connect()
    con.execute(f"SET threads TO {os.environ.get('SPARK_GRAFT_CPUS', '32')}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    rows = []
    for name, spec in QUERIES.items():
        if spec.oracle is None or name not in spark_times:
            continue
        # warm once (catalog/IO), time the second run
        con.sql(spec.oracle).fetchall()
        t0 = time.time()
        con.sql(spec.oracle).fetchall()
        duck_s = time.time() - t0
        rows.append((name, spark_times[name], duck_s))

    rows.sort(key=lambda r: r[1] / max(r[2], 1e-9))
    total_spark = sum(r[1] for r in rows)
    total_duck = sum(r[2] for r in rows)

    if md:
        print("| query | spark s | duckdb s | ratio |")
        print("|---|---|---|---|")
    for name, s, d in rows:
        ratio = s / max(d, 1e-9)
        if md:
            print(f"| {name} | {s:.2f} | {d:.3f} | {ratio:.1f}x |")
        else:
            print(f"{name:42s} spark {s:6.2f}  duck {d:7.3f}  ratio {ratio:8.1f}x")
    print(
        f"\nTOTAL over {len(rows)} oracle queries: "
        f"spark {total_spark:.1f}s vs duckdb {total_duck:.1f}s "
        f"({'spark faster' if total_spark < total_duck else 'duckdb faster'}, "
        f"{max(total_spark, total_duck) / max(min(total_spark, total_duck), 1e-9):.2f}x)"
    )


if __name__ == "__main__":
    main()
