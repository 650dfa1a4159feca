"""SF-scaling probe: time representative queries at sf0.001 / 0.01 / 0.1.

The 100x data range separates the two cost regimes PERF.md describes:
a scale-INDEPENDENT per-query job floor (driver scheduling + stage
launch + plan compile) and the scale-LINEAR data cost. A query whose
sf0.1 time is close to its sf0.001 time is floor-bound at bench scale —
its cost at cluster scale is the data term, which the plan pins in
tests/test_plans.py show shuffles/prunes correctly.

Usage: python tools/scaling_probe.py [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from local_data_pipeline_spark.queries import QUERIES  # noqa: E402
from local_data_pipeline_spark.session import get_spark  # noqa: E402

# Override with SPARK_GRAFT_PROBE_DIRS=dir1,dir2,... (absolute paths) to
# probe extra scales, e.g. a /tmp sf1 from tools/gen_scaled_data.py.
SFS = ("sf0.001", "sf0.01", "sf0.1")
PROBE_DIRS = [
    p
    for p in os.environ.get(
        "SPARK_GRAFT_PROBE_DIRS",
        ",".join(f"/root/testdata/{sf}" for sf in SFS),
    ).split(",")
    if p
]
DEFAULT = (
    "q1_pricing_summary",        # single-pass scan agg (decimal sums)
    "q9_product_profit",         # 5-way join
    "daily_max_event",           # window argmax
    "sessionize_events",         # lag + running sum + rollup
    "minhash_near_dups",         # explode + seeded-hash + min agg
    "ngram_jaccard_within_source",  # shingle equi-join
    "cosine_topk_arrow",         # Arrow matmul top-k
    "near_dup_clusters_documents",  # iterative connected components
    "exact_dedup_documents",     # content-hash window
    "broadcast_dim_enrich",      # pure job floor probe
)


def main() -> None:
    names = sys.argv[1:] or list(DEFAULT)
    spark = get_spark(app_name="scaling_probe")
    # warm-up on the largest sf so JVM/codegen cost isn't billed to queries
    QUERIES["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.1").write.format(
        "noop"
    ).mode("overwrite").save()
    labels = [os.path.basename(d.rstrip("/")) for d in PROBE_DIRS]
    for name in names:
        per_sf = []
        for d in PROBE_DIRS:
            t0 = time.perf_counter()
            QUERIES[name].fn(spark, d).write.format("noop").mode(
                "overwrite"
            ).save()
            per_sf.append(time.perf_counter() - t0)
        print(
            f"{name:32s} " + "  ".join(f"{t:6.2f}" for t in per_sf)
            + f"   {labels[-1]}/{labels[0]} time x{per_sf[-1] / max(per_sf[0], 1e-9):.1f}"
        )
    print("\ncolumns: " + " / ".join(labels) + " seconds")
    spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
