"""Top-k-per-group operators (the reference's signature computation shape).

``top1_per_group`` generalizes the reference's daily-max-swell argmax
(`/root/reference/dbt/models/intermediate/int_open_meteo__max_swell_per_day.sql:10-30`):
``row_number()`` over a multi-key partition with a multi-key order, then
``rn = 1``. The exact-order tie-break (int sql:14-15) is preserved by
requiring the caller to pass a total order.

100 TB notes: the window induces ONE hash exchange on the partition keys —
the minimum possible for exact semantics. For k=1 Spark can also express
this as ``max_by(struct(*), struct(order))`` which enables partial (map-side)
aggregation and avoids sorting whole partitions; ``top1_per_group_agg``
provides that form. For skewed group keys, pre-aggregate with a salt:
see ``salted_top1``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    partition_by: list[str | Column],
    order_by: list[Column],
    k: int = 1,
    rank_col: str | None = None,
) -> DataFrame:
    """Keep the top-k rows of each group under a TOTAL order (pass enough
    tie-break keys to make ranking deterministic)."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    out = df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= k)
    if rank_col:
        return out.withColumnRenamed("__rn", rank_col)
    return out.drop("__rn")


def top1_per_group(
    df: DataFrame, partition_by: list[str | Column], order_by: list[Column]
) -> DataFrame:
    return top_k_per_group(df, partition_by, order_by, k=1)


def top1_per_group_agg(
    df: DataFrame, partition_by: list[str], order_desc: list[str]
) -> DataFrame:
    """Aggregate form of top-1: ``max_by(struct(all_cols), struct(order))``.

    Same result as the window form when the order is total, but executes as
    a hash aggregate with map-side combine — at scale this shuffles one
    struct per (group, map task) instead of every row, and never sorts.
    """
    ordering = F.struct(*[F.col(c) for c in order_desc])
    packed = F.struct(*[F.col(c) for c in df.columns])
    agg = df.groupBy(*partition_by).agg(F.max_by(packed, ordering).alias("__row"))
    return agg.select(*[F.col(f"__row.{c}").alias(c) for c in df.columns])


def salted_top1(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[Column],
    salt_buckets: int = 32,
) -> DataFrame:
    """Skew-resistant top-1: two-phase window with a random-ish salt derived
    from a hash of the full row ordering keys. Phase 1 takes the per-salt
    winner (small partitions), phase 2 the winner of winners. Use when one
    group holds a large fraction of all rows (e.g. a bot user_id)."""
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_buckets))
    )
    phase1 = top_k_per_group(salted, [*partition_by, "__salt"], order_by, k=1)
    return top_k_per_group(phase1.drop("__salt"), partition_by, order_by, k=1)


def pareto_frontier(
    df: DataFrame,
    maximize: str,
    minimize: str,
) -> DataFrame:
    """Skyline: rows not dominated on (``minimize`` lower-or-equal,
    ``maximize`` higher-or-equal, strict in one). O(n log n) distributed
    rewrite of the O(n^2) dominance self-join: collapse to one row per
    ``minimize`` level, running-max the ``maximize`` over strictly
    cheaper levels, keep rows beating it. Equal (minimize, maximize)
    ties are all kept — neither dominates the other.

    Rows with a NULL in either dimension are EXCLUDED up front (a null
    cost/value has no place in the dominance order; dropping explicitly
    beats the silent join-and-filter loss a naive formulation gives).

    CARDINALITY CONTRACT: ``minimize`` must have bounded distinct
    cardinality (a price grid, a discrete level — anything comfortably
    collect-sized), because the running max over strictly-cheaper levels
    is an unpartitioned window over the per-level relation: one task
    sorting #levels rows, and the level relation is broadcast into the
    join back. With a near-unique continuous ``minimize`` (e.g. raw
    float cost), #levels ≈ n and this degenerates to a single-partition
    global sort — bucket/round the measure first, or route the running
    max through a range-partitioned prefix pass
    (``packing.distributed_cumsum`` with max-combine) before using this.

    Used by the `pareto_frontier_parts` query (p_retailprice: a
    generator-bounded price grid; ~#distinct prices << n rows);
    property-tested against brute-force dominance on ties-heavy
    generated data."""
    df = df.filter(F.col(maximize).isNotNull() & F.col(minimize).isNotNull())
    per_level = df.groupBy(minimize).agg(F.max(maximize).alias("__max_val"))
    w = Window.orderBy(minimize).rowsBetween(Window.unboundedPreceding, -1)
    lvl = per_level.withColumn("__best_cheaper", F.max("__max_val").over(w))
    out = (
        df.join(F.broadcast(lvl), minimize)
        .filter(
            (F.col(maximize) == F.col("__max_val"))
            & (
                F.col("__best_cheaper").isNull()
                | (F.col(maximize) > F.col("__best_cheaper"))
            )
        )
        .drop("__max_val", "__best_cheaper")
    )
    return out
