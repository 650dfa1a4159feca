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

    The salt must spread a hot GROUP's rows across reducers, so it must
    not be derived from the group keys — and hashing the value column
    fails the same way when values are constant or low-cardinality
    (counters, flags: every row of the hot group hashes to ONE salt and
    the straggler survives). Default: round-robin within each input
    partition (``monotonically_increasing_id() % n_salts``), which
    spreads uniformly regardless of data values; the final result is
    salt-assignment-independent because the partials are exact. Pass
    ``salt_on`` to salt on a known-high-cardinality column instead when
    a *stable* per-row salt matters (e.g. reproducing a partial-level
    debug trace).
    """
    if salt_on:
        salt_src = F.xxhash64(F.col(salt_on))
    else:
        salt_src = F.monotonically_increasing_id()
    salted = df.withColumn("__salt", F.pmod(salt_src, F.lit(n_salts)))
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
