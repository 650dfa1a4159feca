"""Skew-mitigation aggregation: two-stage salted group-by.

A single hot key (one language dominating `documents`, one event type
dominating `events`) turns a plain ``groupBy(key)`` into one straggler
task at cluster scale. Salting splits every group into ``n_salts``
sub-groups for the first (wide, parallel) aggregation, then re-aggregates
the ``n_salts × |groups|`` partials — a second shuffle whose input is
tiny. With decimal-exact sums the two-stage result is bit-identical to
the direct aggregation at any salt count or partitioning, which is what
the oracle-matched `salted_agg_event_type` query proves.

AQE's skew handling (``spark.sql.adaptive.skewJoin``) covers *joins*;
aggregation skew still needs this shape when a single group's partials
exceed one task — the classic two-level combine. Spark's own partial
aggregation already handles most cases map-side; explicit salting is for
HLL-style or collect-style aggregates with no partial merge, and is
declared here as the documented pattern.

Parity note: extension surface (SURVEY.md §2.E intro); the reference has
no aggregation at all beyond a window argmax.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.numeric import dsum

#: Default split factor: enough to spread one hot key over a wait-free
#: number of tasks without exploding the partial-row count.
DEFAULT_SALTS = 16


def salted_sum_count(
    df: DataFrame,
    keys: Sequence[str],
    value: str,
    n_salts: int = DEFAULT_SALTS,
    salt_on: str | None = None,
) -> DataFrame:
    """``groupBy(keys).agg(count(*), exact-decimal sum(value))`` computed
    through a salted two-stage aggregation.

    Returns ``(*keys, n bigint, total double)`` — bit-identical to the
    direct aggregation (decimal partials are associative), but no single
    reducer ever sees more than ~1/n_salts of a hot group.

    ``salt_on`` picks the deterministic salt source column (defaults to a
    hash of all columns via ``xxhash64`` on the value column, which is
    deterministic for a given row content).
    """
    salt_src = F.col(salt_on) if salt_on else F.col(value)
    salted = df.withColumn("__salt", F.pmod(F.xxhash64(salt_src), F.lit(n_salts)))
    partial = salted.groupBy(*keys, "__salt").agg(
        F.count("*").alias("__n"),
        F.sum(F.col(value).cast("decimal(25,6)")).alias("__s"),
    )
    return partial.groupBy(*keys).agg(
        F.sum("__n").cast("bigint").alias("n"),
        F.sum("__s").cast("double").alias("total"),
    )


def direct_sum_count(
    df: DataFrame, keys: Sequence[str], value: str
) -> DataFrame:
    """The unsalted twin of :func:`salted_sum_count` (same schema), for
    equivalence testing and for inputs known to be skew-free."""
    return df.groupBy(*keys).agg(
        F.count("*").alias("n"), dsum(value).alias("total")
    )
