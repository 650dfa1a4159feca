"""End-to-end training-data curation pipeline over ``documents``.

The composition a real LLM data pipeline runs, as one registry DAG:

  stg_doc_features   (view)   per-doc text statistics + fingerprint
  int_doc_candidates (view)   exact-dedup winners, quality/lang gated
  int_near_dup_drops (view)   MinHash-LSH near-dup losers (keep min id)
  pres_curated_docs  (table)  candidates minus near-dup losers,
                              with not_null/unique data tests

Filter thresholds are explicit constants so the DuckDB oracle twin of the
SQL-expressible subset (`curated_documents_exact` in queries.py) can
reproduce the exact row set.

100 TB shape: stages are map-only except the dedup shuffles (fingerprint
hash agg; MinHash band join); the final table is partitioned by ``lang``
— the dominant downstream filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text as TX
from ..operators.dedup import minhash_near_dups
from ..registry import Registry, not_null, unique
from ..session import load_table

MIN_TOKENS = 30
MIN_QUALITY = 0.5
KEEP_LANGS = ("en", "es", "fr", "de", "zh")
NEAR_DUP_JACCARD = 0.5


def build_curation_registry(sf_dir: str) -> Registry:
    reg = Registry()

    reg.source("raw_documents", lambda _r, s: load_table(s, sf_dir, "documents"))

    @reg.model("stg_doc_features", deps=("raw_documents",), group="curation")
    def _stg(r: Registry, _s: SparkSession) -> DataFrame:
        d = r.ref("raw_documents")
        return d.select(
            "doc_id",
            "text",
            "lang",
            "source",
            "n_chars",
            TX.token_count(F.col("text")).alias("n_tokens"),
            TX.quality_score(F.col("text")).alias("quality"),
            TX.fingerprint(F.col("text")).alias("fp"),
        )

    @reg.model("int_doc_candidates", deps=("stg_doc_features",), group="curation")
    def _cand(r: Registry, _s: SparkSession) -> DataFrame:
        d = r.ref("stg_doc_features")
        w = Window.partitionBy("fp").orderBy(F.asc("doc_id"))
        return (
            d.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)  # exact-dedup winner per fingerprint
            .drop("__rn")
            .filter(
                (F.col("n_tokens") >= MIN_TOKENS)
                & (F.col("quality") >= MIN_QUALITY)
                & F.col("lang").isin(*KEEP_LANGS)
            )
        )

    @reg.model("int_near_dup_drops", deps=("int_doc_candidates",), group="curation")
    def _drops(r: Registry, _s: SparkSession) -> DataFrame:
        from ..operators.dedup import dedup_clusters

        cands = r.ref("int_doc_candidates")
        pairs = minhash_near_dups(
            cands, text_col="text", id_col="doc_id", threshold=NEAR_DUP_JACCARD
        )
        # transitive closure: A~B, B~C collapses {A,B,C} to one canonical
        # doc even without a direct A~C pair (pairwise keep-first would
        # under-delete on chains)
        clusters = dedup_clusters(pairs)
        return clusters.filter(F.col("doc_id") != F.col("cluster_id")).select("doc_id")

    @reg.model(
        "pres_curated_docs",
        deps=("int_doc_candidates", "int_near_dup_drops"),
        materialization="table",
        group="curation",
        partition_by=("lang",),
        tests=(not_null("doc_id"), unique("doc_id"), not_null("text")),
    )
    def _pres(r: Registry, _s: SparkSession) -> DataFrame:
        cands = r.ref("int_doc_candidates")
        drops = r.ref("int_near_dup_drops")
        return cands.join(drops, "doc_id", "left_anti").select(
            "doc_id", "text", "lang", "source", "n_chars", "n_tokens", "quality"
        )

    return reg
