"""Benchmark: run every declared query at $SPARK_GRAFT_SF_DIR and print one
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is fully executed via a noop-format write (materializes every
row through the whole plan, no driver collect overhead). One warm-up query
first so JVM/codegen warmup isn't billed to the first measured query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from local_data_pipeline_spark.queries import QUERIES  # noqa: E402
from local_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _sf_label(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def main() -> None:
    spark = get_spark(app_name="bench")
    # warm-up: JVM + codegen + parquet footer caches
    QUERIES["q1_pricing_summary"].fn(spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()

    times: dict[str, float] = {}
    for name, spec in QUERIES.items():
        t0 = time.perf_counter()
        spec.fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        times[name] = round(time.perf_counter() - t0, 3)

    print(
        json.dumps(
            {
                "metric": "total_query_wall_seconds",
                "value": round(sum(times.values()), 3),
                "unit": "sec",
                "queries": times,
                "sf": _sf_label(SF_DIR),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
