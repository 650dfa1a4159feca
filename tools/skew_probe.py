"""Planted-skew stress probe (VERDICT r9 #5): measure the GUARDED hot
paths on the uniform corpus vs the planted-skew twin
(tools/gen_skewed_data.py) and show the guards hold walls within ~1.5x
— plus the tail stats (max bucket size, max fingerprint df, hot-token
df) that quantify what each guard cut, since the unguarded forms on a
10^4-clique corpus would emit 5·10^7 pairs and prove nothing except
that quadratic output is quadratic.

Shapes probed (guard in parentheses):

- sparse_cosine_topk_documents   (salt_hot_postings, in-plan hot set)
- minhash signatures -> banded buckets (lsh max_bucket_size=50)
- winnowing_overlap_pairs        (MOSS stop-fingerprint max_df=1000)
- label_propagation_copurchase   (support filter + mode aggregate —
  the hot node rides a groupBy whose partial aggregation absorbs the
  degree skew map-side)
- sessionize_events              (per-user windows under a 10% hot user)

Usage: python tools/skew_probe.py [--uniform DIR] [--skew DIR]
Defaults: /tmp/sf1 vs /tmp/sf1skew. Quiet host required (bench rules).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from local_data_pipeline_spark.queries import QUERIES  # noqa: E402
from local_data_pipeline_spark.session import get_spark, load_table  # noqa: E402

WARM_DIR = "/root/testdata/sf0.1"


def _lsh_buckets_guarded(spark, sf_dir):
    from local_data_pipeline_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signature,
    )

    sigs = minhash_signature(
        load_table(spark, sf_dir, "documents"), n_hashes=32, shingle_k=3
    )
    return lsh_candidate_pairs(sigs, n_bands=8, max_bucket_size=50)


def _winnowing_guarded(spark, sf_dir):
    from local_data_pipeline_spark.operators.dedup import winnowing_overlap_pairs

    return winnowing_overlap_pairs(
        load_table(spark, sf_dir, "documents"), k=16, w=8, min_shared=3,
        max_df=1000,
    )


SHAPES = {
    "sparse_cosine_salted": lambda s, d: QUERIES[
        "sparse_cosine_topk_documents"
    ].fn(s, d),
    "lsh_buckets_guarded": _lsh_buckets_guarded,
    "winnowing_capped": _winnowing_guarded,
    "label_propagation": lambda s, d: QUERIES[
        "label_propagation_copurchase"
    ].fn(s, d),
    "sessionize_events": lambda s, d: QUERIES["sessionize_events"].fn(s, d),
}


def _ivm_minhash_hot_changelog(spark, sf_dir):
    """IVM minhash maintenance under a hot changelog: on the skew twin
    the mod-5-residue-1 upsert batch IS the 10^4-doc byte-identical
    clique (every fresh signature bands into the same buckets) and the
    mod-10-residue-3 deletes are the hot-token docs — ~30% of keys
    touched in one batch. The maintainer never bucket-joins (anti-join
    on unique keys + per-doc signing), so identical texts must cost the
    same wall as distinct ones."""
    from local_data_pipeline_spark.operators.cdc import maintain_minhash_index
    from local_data_pipeline_spark.operators.dedup import (
        banded_signatures,
        minhash_signature,
    )

    d = load_table(spark, sf_dir, "documents")
    base_index = banded_signatures(
        minhash_signature(d, hash_family="rk_pow5"), "doc_id", 8, "rk_pow5"
    )
    changes = (
        d.filter(F.col("doc_id") % 5 == 1)
        .select(
            F.col("doc_id").alias("key"),
            F.lit("U").alias("op"),
            F.concat(F.col("text"), F.lit(" rev2")).alias("after_text"),
        )
        .unionByName(
            d.filter(F.col("doc_id") % 10 == 3).select(
                F.col("doc_id").alias("key"),
                F.lit("D").alias("op"),
                F.lit(None).cast("string").alias("after_text"),
            )
        )
    )
    return maintain_minhash_index(base_index, changes)


def _epoch_shuffle_ids(spark, sf_dir):
    """Epoch shuffle / distributed_rank under a pathological doc_id
    VALUE distribution: on the skew leg the ids are remapped
    (injectively: div/mod decomposition) into blocks of 100 consecutive
    values separated by 10^9 gaps — the clustered-id layout a
    hash-range sharder would straggle on. The design's claim: the pow5
    bijection scrambles value-space clustering before the rank's
    repartitionByRange ever samples it, and the range sampler adapts to
    whatever distribution survives — wall parity expected."""
    from local_data_pipeline_spark.functions.replay import (
        POW_P,
        POW_SALT,
        pow5,
    )
    from local_data_pipeline_spark.operators.packing import distributed_rank

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    if "skew" in os.path.basename(sf_dir.rstrip("/")):
        d = d.select(
            (
                (F.col("doc_id") / 100).cast("bigint") * F.lit(10**9)
                + F.col("doc_id") % 100
            ).alias("doc_id")
        )
    keyed = d.withColumn(
        "shuffle_key",
        pow5(F.pmod(F.col("doc_id") + F.lit(3 * POW_SALT), F.lit(POW_P))),
    )
    ranked = distributed_rank(keyed, ["shuffle_key", "doc_id"], out_col="__rank")
    return ranked.select(
        "doc_id",
        F.expr("(__rank - 1) div 64").alias("batch_id"),
        F.expr("(__rank - 1) % 64").alias("batch_pos"),
    )


#: Batch 2 (VERDICT r10 #4): the graph family on the 10%-degree hot
#: node (only LPA was probed in batch 1), the IVM minhash maintainer
#: under a hot changelog, and distributed_rank under clustered ids.
SHAPES_BATCH2 = {
    "pagerank": lambda s, d: QUERIES["pagerank_copurchase_parts"].fn(s, d),
    "hits": lambda s, d: QUERIES["hits_customer_parts"].fn(s, d),
    "kcore": lambda s, d: QUERIES["kcore_copurchase_parts"].fn(s, d),
    "ivm_minhash_hot_changelog": _ivm_minhash_hot_changelog,
    "epoch_shuffle_clustered_ids": _epoch_shuffle_ids,
}


def run_once(spark, fn, sf_dir: str) -> float:
    t0 = time.time()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.time() - t0


def tail_stats(spark, sf_dir: str) -> dict:
    """The skew quantities the guards exist for: unguarded max banded-
    bucket size, max winnowing-fingerprint df, and max token df."""
    from local_data_pipeline_spark.operators.dedup import (
        minhash_signature,
        winnowing_fingerprints_arrow,
    )
    from local_data_pipeline_spark.functions.text import tokens

    d = load_table(spark, sf_dir, "documents")
    sigs = minhash_signature(d, n_hashes=32, shingle_k=3)
    rpb = 4
    banded = sigs.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(7)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.slice(F.col("signature"), b * rpb + 1, rpb).cast(
                            "string"
                        )
                    ).alias("bh"),
                ),
            )
        ).alias("x")
    ).select("x.band", "x.bh")
    max_bucket = (
        banded.groupBy("band", "bh").count().agg(F.max("count")).first()[0]
    )
    fps = winnowing_fingerprints_arrow(d, k=16, w=8)
    max_df = (
        fps.groupBy("fingerprint").count().agg(F.max("count")).first()[0]
    )
    tok_df = (
        d.select(F.explode(tokens(F.col("text"))).alias("t"))
        .groupBy("t")
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    return {"max_bucket": max_bucket, "max_fp_df": max_df,
            "max_token_df": tok_df}


def main() -> int:
    args = sys.argv[1:]

    def opt(flag: str, default: str) -> str:
        if flag in args:
            i = args.index(flag)
            v = args[i + 1]
            del args[i : i + 2]
            return v
        return default

    uniform = opt("--uniform", "/tmp/sf1")
    skew = opt("--skew", "/tmp/sf1skew")
    batch2 = "--batch2" in args
    if batch2:
        args.remove("--batch2")
    shapes = SHAPES_BATCH2 if batch2 else SHAPES
    spark = get_spark()
    print(f"# skew probe: uniform={uniform} skew={skew} batch2={batch2}")
    if not batch2:
        for name, corpus in (("uniform", uniform), ("skew", skew)):
            print(f"# tail stats [{name}]: {tail_stats(spark, corpus)}")
    rows = []
    for name, fn in shapes.items():
        run_once(spark, fn, WARM_DIR)  # untimed warm-up
        t_u = run_once(spark, fn, uniform)
        t_s = run_once(spark, fn, skew)
        rows.append((name, t_u, t_s, t_s / t_u))
        print(
            f"{name:28s} uniform={t_u:7.1f}s skew={t_s:7.1f}s "
            f"ratio={t_s / t_u:5.2f}x"
        )
    worst = max(r for _, _, _, r in rows)
    print(f"# worst skew ratio: {worst:.2f}x")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
