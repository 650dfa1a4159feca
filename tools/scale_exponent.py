"""Spark-side scaling-exponent probe for the algorithm-bound heavies.

The sf1 gate proves 10x correctness+walls; the 100 TB question is the
GROWTH RATE. This probe times queries()[name] (noop write, no driver
collect) at two scale factors and reports the fitted exponent

    alpha = log(t_big / t_small) / log(data_ratio)

per query. alpha <= ~1.2 means the shape survives a 100x scale-up
(sub-quadratic with margin); alpha >> 1 names a fix. Queries with
scale-ADAPTIVE sampling (widening anchor/panel moduli) may come out
sublinear by design — the point of recording them here.

Usage: python tools/scale_exponent.py [--small DIR] [--big DIR]
                                   [--ratio R] [query ...]
Defaults: /tmp/sf1 vs /tmp/sf10 (ratio 10), the five shapes the
round-8 verdict asked to probe. One untimed sf0.1 warm-up run per
query eats JIT/Arrow/first-touch costs (bench.py's lesson).
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from local_data_pipeline_spark.queries import QUERIES  # noqa: E402
from local_data_pipeline_spark.session import get_spark  # noqa: E402

DEFAULT_QUERIES = (
    "near_dup_clusters_documents",
    "sparse_cosine_topk_documents",
    "winnowing_overlap_pairs",
    "label_propagation_copurchase",
    "bpe_merge_table_documents",
)
WARM_DIR = "/root/testdata/sf0.1"


def run_once(spark, name: str, sf_dir: str) -> float:
    t0 = time.time()
    QUERIES[name].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    return time.time() - t0


def main() -> int:
    args = sys.argv[1:]

    def opt(flag: str, default: str) -> str:
        if flag in args:
            i = args.index(flag)
            v = args[i + 1]
            del args[i : i + 2]
            return v
        return default

    small = opt("--small", "/tmp/sf1")
    big = opt("--big", "/tmp/sf10")
    ratio = float(opt("--ratio", "10"))
    names = args or list(DEFAULT_QUERIES)
    spark = get_spark()
    print(f"# scale probe: {small} -> {big} (data ratio {ratio:g}x)")
    rows = []
    for name in names:
        run_once(spark, name, WARM_DIR)  # untimed warm-up
        t_small = run_once(spark, name, small)
        t_big = run_once(spark, name, big)
        alpha = math.log(t_big / t_small) / math.log(ratio)
        rows.append((name, t_small, t_big, alpha))
        print(
            f"{name:40s} small={t_small:7.1f}s big={t_big:7.1f}s "
            f"alpha={alpha:5.2f}"
        )
    worst = max(a for _, _, _, a in rows)
    print(f"# worst exponent: {worst:.2f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
