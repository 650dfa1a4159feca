"""Misra-Gries heavy hitters: single-pass approximate top-k over a
token stream, the mergeable-summary alternative to an exact
count-all-tokens aggregate.

Reference scope: the reference delegates all aggregation to DuckDB
(SURVEY §2.C) — this operator is part of the §2.E training-data
extension surface (corpus frequency analysis at 100 TB, where the
exact token count shuffle is the bottleneck).

Guarantee (classic Misra-Gries): with summary size k per partition,
any token whose true corpus frequency exceeds N/k survives in the
merged candidate set, and each merged estimate undercounts by at most
N/k. The per-partition summaries are fixed-size (k entries), so the
merge stage aggregates P*k tiny rows no matter how large the corpus —
the shuffle is O(partitions * k), never O(distinct tokens).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_partition(batches: Iterator[pd.DataFrame], k: int) -> Iterator[pd.DataFrame]:
    """Misra-Gries sketch of one partition's token stream (size k)."""
    counters: dict[str, int] = {}
    for pdf in batches:
        for tok in pdf["token"]:
            if tok in counters:
                counters[tok] += 1
            elif len(counters) < k:
                counters[tok] = 1
            else:
                # decrement-all step; drop zeros
                dead = []
                for key in counters:
                    counters[key] -= 1
                    if counters[key] == 0:
                        dead.append(key)
                for key in dead:
                    del counters[key]
    yield pd.DataFrame(
        {"token": list(counters), "mg_count": list(counters.values())}
    )


def heavy_hitter_candidates(tokens: DataFrame, k: int = 50) -> DataFrame:
    """Merged Misra-Gries candidates: token + summed sketch count.

    ``tokens`` must have a single string column named ``token``. The
    per-partition sketches run in one ``mapInPandas`` pass (no shuffle);
    the merge is a hash aggregate over at most partitions*k rows.
    Estimates are lower bounds; any token with frequency > N/k per
    partition-stream is guaranteed present."""
    sketches = tokens.select("token").mapInPandas(
        lambda it: _mg_partition(it, k),
        schema="token string, mg_count long",
    )
    return sketches.groupBy("token").agg(F.sum("mg_count").alias("mg_count"))


def heavy_hitters_topk(tokens: DataFrame, k: int = 50, top: int = 20) -> DataFrame:
    """Top ``top`` candidates by merged sketch count (ties → token asc)."""
    return (
        heavy_hitter_candidates(tokens, k)
        .orderBy(F.desc("mg_count"), F.asc("token"))
        .limit(top)
    )
