"""Spark-side scaling-exponent probe for the algorithm-bound heavies.

The sf1 gate proves 10x correctness+walls; the 100 TB question is the
GROWTH RATE. This probe times each shape (noop write, no driver
collect) at two scale factors and reports the fitted exponent

    alpha = log(t_big / t_small) / log(data_ratio)

per shape. alpha <= ~1.2 means the shape survives a 100x scale-up
(sub-quadratic with margin); alpha >> 1 names a fix. Shapes with
scale-ADAPTIVE sampling (widening anchor/panel moduli) may come out
sublinear by design — the point of recording them here.

Two kinds of entries:

- QUERY entries run declared catalog queries end-to-end.
- OPERATOR entries time the LINEAR stages of the pair-emitting dedup
  pipelines (signatures, fingerprints, banded buckets). Their
  pair-EMISSION stages are excluded on purpose: gen_scaled_data.py
  builds sfK by K-fold key-shifted replication, so every document
  becomes a K-clique and every all-pairs output is Θ(K²) BY
  CONSTRUCTION — measured: within-source shingle-join fan-out 385,584
  rows at sf0.1 → 38,558,400 at sf1 (the ~207k-shingle key space
  saturates, so per-key df grows linearly); winnowing emits 24,394
  pairs at sf0.1 → 2,068,200 at sf1. No operator exponent can beat
  its own output size; the production knobs for real corpora (where
  near-dup mass is a bounded fraction, not all-pairs cliques) are the
  documented caps — lsh max_bucket_size, winnowing max_df, the MOSS
  stop rules — plus streaming pairs into the closure instead of
  materializing a report.

Usage: python tools/scale_exponent.py [--small DIR] [--big DIR]
                                      [--ratio R] [name ...]
Defaults: /tmp/sf1 vs /tmp/sf10 (ratio 10), the five shapes the
round-8 verdict asked to probe. One untimed sf0.1 warm-up run per
shape eats JIT/Arrow/first-touch costs (bench.py's lesson). Single-JVM
sf10 runs want SPARK_GRAFT_DRIVER_MEM=48g (on a cluster this is
per-executor memory sizing at the target SF).
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from local_data_pipeline_spark.queries import QUERIES  # noqa: E402
from local_data_pipeline_spark.session import get_spark, load_table  # noqa: E402

WARM_DIR = "/root/testdata/sf0.1"


def _minhash_signatures(spark, sf_dir):
    from local_data_pipeline_spark.operators.dedup import minhash_signature

    return minhash_signature(
        load_table(spark, sf_dir, "documents"), n_hashes=32, shingle_k=3
    )


def _lsh_buckets_guarded(spark, sf_dir):
    from local_data_pipeline_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signature,
    )

    sigs = minhash_signature(
        load_table(spark, sf_dir, "documents"), n_hashes=32, shingle_k=3
    )
    # the production guard: jumbo buckets (the replicated corpus makes
    # every bucket a K-clique) are skipped, bounding candidate pairs
    return lsh_candidate_pairs(sigs, n_bands=8, max_bucket_size=50)


def _winnowing_fingerprints(spark, sf_dir):
    from local_data_pipeline_spark.operators.dedup import (
        winnowing_fingerprints_arrow,
    )

    return winnowing_fingerprints_arrow(
        load_table(spark, sf_dir, "documents"), k=16, w=8
    )


def _minhash_signatures_rk(spark, sf_dir):
    """The round-10 replayable family's hot stage: per-shingle Rabin-
    Karp fold (interpreted HOF) + 32 codegen'd power permutations —
    the declared minhash_near_dups' linear stage."""
    from local_data_pipeline_spark.operators.dedup import minhash_signature

    return minhash_signature(
        load_table(spark, sf_dir, "documents"),
        n_hashes=32,
        shingle_k=3,
        hash_family="rk_pow5",
    )


def _closure_on_guarded_pairs(spark, sf_dir):
    """The near-dup closure's iterative stage on the guarded candidate
    pairs: min-label propagation until fixpoint (includes the per-round
    changed-probe counts — they are part of the shape's real cost)."""
    from local_data_pipeline_spark.operators.dedup import dedup_clusters

    return dedup_clusters(_lsh_buckets_guarded(spark, sf_dir))


#: name -> callable(spark, sf_dir) -> DataFrame for the operator-stage
#: probes; query names resolve through QUERIES.
OPERATOR_SHAPES = {
    "minhash_signatures_op": _minhash_signatures,
    "minhash_signatures_rk_op": _minhash_signatures_rk,
    "lsh_buckets_guarded_op": _lsh_buckets_guarded,
    "winnowing_fingerprints_op": _winnowing_fingerprints,
    "near_dup_closure_op": _closure_on_guarded_pairs,
}

DEFAULT_SHAPES = (
    "sparse_cosine_topk_documents",   # hot-token-salted sparse cosine
    "label_propagation_copurchase",   # iterative Pregel-as-joins
    "bpe_merge_table_documents",      # corpus scan -> vocab-sized loop
    "minhash_signatures_op",          # near-dup scale path, linear stage
    "lsh_buckets_guarded_op",         # + banding with the bucket guard
    "winnowing_fingerprints_op",      # winnowing's linear stage
)


def run_once(spark, name: str, sf_dir: str) -> float:
    fn = OPERATOR_SHAPES.get(name) or QUERIES[name].fn
    t0 = time.time()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
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
    names = args or list(DEFAULT_SHAPES)
    unknown = [n for n in names if n not in OPERATOR_SHAPES and n not in QUERIES]
    if unknown:
        print(f"ERROR: not probe shapes or query names: {unknown}")
        return 2
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
