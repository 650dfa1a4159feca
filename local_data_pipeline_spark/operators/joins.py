"""Join operators Spark lacks as built-ins: as-of and range joins.

- **as-of join**: for each left row, the single latest right row with
  ``right.ts <= left.ts`` on the same key. The naive form is a correlated
  subquery / non-equi join (quadratic per key); the scalable form used
  here is the union trick: tag both sides, union, sort per key by time,
  and carry the last-seen right row forward with ``last(..., ignorenulls)``
  over an unbounded-preceding window. ONE shuffle on the key, linear work
  — this survives 100×.
- **range join**: equi-key + time-interval overlap, expressed as a
  bucketed equi-join on coarse time buckets + exact residual predicate,
  turning an O(n·m) non-equi join into bucket-local work.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    strict: bool = False,
) -> DataFrame:
    """For each left row, attach the latest right row at-or-before
    (``strict``: strictly-before) its timestamp, per ``on`` key.

    Output: all left columns + ``right_cols`` (null when no prior right
    row exists). Ties on equal right timestamps resolve to the row that
    sorts last on (ts, side-order) — supply pre-deduplicated right rows
    for full determinism."""
    lt = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
    )
    rt = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c) for c in right_cols]).alias("__r"),
    )
    unioned = lt.withColumn(
        "__r", F.lit(None).cast(rt.schema["__r"].dataType)
    ).unionByName(rt.withColumn("__l", F.lit(None).cast(lt.schema["__l"].dataType)))
    # at-or-before: a right row at equal ts sorts BEFORE the left row so
    # last() sees it; strictly-before: it sorts after and is invisible.
    side_order = F.asc("__side") if not strict else F.desc("__side")
    w = (
        Window.partitionBy("__k")
        .orderBy(F.asc("__ts"), side_order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = unioned.withColumn(
        "__last_r", F.last("__r", ignorenulls=True).over(w)
    ).filter(F.col("__side") == 1)
    return out.select(
        *[F.col(f"__l.{c}").alias(c) for c in left.columns],
        *[F.col(f"__last_r.{c}").alias(c) for c in right_cols],
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: the (large, skewed) ``left`` gets a
    deterministic per-row salt; the (smaller) ``right`` is replicated
    across all salts; the join key becomes (key, salt), so a hot key's
    rows spread over ``n_salts`` partitions instead of one straggler task.

    This is the manual form of what AQE skew-join does adaptively —
    needed when skew is known a priori (bot user_ids, null-ish defaults)
    or when AQE's thresholds won't trigger. Cost: right side × n_salts.
    """
    salted_l = left.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(n_salts)),
    )
    replicated_r = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<long>"))
    )
    out = salted_l.join(replicated_r, [on, "__salt"], how)
    return out.drop("__salt")


def range_join_buckets(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_start: str,
    right_end: str,
    bucket: str = "1 hour",
) -> DataFrame:
    """left.ts ∈ [right.start, right.end) with the same key, via coarse
    time-bucket equi-join + exact residual filter.

    Each right interval is exploded into the buckets it spans; the join is
    then (key, bucket)-equi and Catalyst can hash-partition it — no
    broadcast-nested-loop."""
    bucket_sec = {"1 hour": 3600, "1 day": 86400, "15 minutes": 900}[bucket]
    lb = left.withColumn(
        "__bucket", (F.unix_timestamp(F.col(left_ts)) / bucket_sec).cast("long")
    )
    rb = right.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                (F.unix_timestamp(F.col(right_start)) / bucket_sec).cast("long"),
                (F.unix_timestamp(F.col(right_end)) / bucket_sec).cast("long"),
            )
        ),
    )
    joined = lb.join(rb, [on, "__bucket"]).filter(
        (F.col(left_ts) >= F.col(right_start)) & (F.col(left_ts) < F.col(right_end))
    )
    return joined.drop("__bucket")
