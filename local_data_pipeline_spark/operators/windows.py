"""Event-time windowing & sessionization over the ``events`` stream table.

Batch-form implementations of the streaming-shaped operators (SURVEY §2.E6):
tumbling and sliding time windows via ``F.window`` (the same operator
Structured Streaming uses, so these plans lift directly to ``readStream``
with a watermark), and gap-based sessionization via lag + running sum —
the classic sessionize idiom.

100 TB notes: tumbling agg is a single hash exchange on (window, keys) with
map-side partial aggregation. Sliding windows multiply rows by
(window/slide); keep that factor small or pre-aggregate to the slide
granularity first. Sessionization shuffles once on the entity key; skewed
entities (bots) should be salted or capped upstream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.numeric import dsum


def tumbling_agg(
    df: DataFrame,
    ts: str,
    duration: str,
    keys: list[str] | None = None,
    aggs: list[Column] | None = None,
) -> DataFrame:
    """Fixed, non-overlapping event-time windows (e.g. '1 hour')."""
    aggs = aggs or [F.count("*").alias("n_events"), dsum("value").alias("sum_value")]
    gb = [F.window(F.col(ts), duration).alias("w"), *(keys or [])]
    return (
        df.groupBy(*gb)
        .agg(*aggs)
        .withColumn("window_start", F.col("w.start"))
        .withColumn("window_end", F.col("w.end"))
        .drop("w")
    )


def sliding_agg(
    df: DataFrame,
    ts: str,
    duration: str,
    slide: str,
    keys: list[str] | None = None,
    aggs: list[Column] | None = None,
) -> DataFrame:
    """Overlapping windows (duration, slide); each row lands in
    duration/slide windows."""
    aggs = aggs or [F.count("*").alias("n_events"), dsum("value").alias("sum_value")]
    gb = [F.window(F.col(ts), duration, slide).alias("w"), *(keys or [])]
    return (
        df.groupBy(*gb)
        .agg(*aggs)
        .withColumn("window_start", F.col("w.start"))
        .withColumn("window_end", F.col("w.end"))
        .drop("w")
    )


def sessionize(
    df: DataFrame,
    ts: str = "ts",
    entity: str = "user_id",
    gap: str = "30 minutes",
    order_tiebreak: str | None = "event_id",
) -> DataFrame:
    """Assign gap-based session ids per entity: a new session starts when
    the time since the previous event exceeds ``gap``.

    One shuffle on ``entity``; session_id is a running sum of
    session-start flags under a deterministic total order.
    """
    order = [F.col(ts)] + ([F.col(order_tiebreak)] if order_tiebreak else [])
    w = Window.partitionBy(entity).orderBy(*order)
    prev_ts = F.lag(ts).over(w)
    new_session = F.when(
        prev_ts.isNull()
        | (F.col(ts) > prev_ts + F.expr(f"INTERVAL {gap}")),
        F.lit(1),
    ).otherwise(F.lit(0))
    running = Window.partitionBy(entity).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return df.withColumn("session_id", F.sum(new_session).over(running))


def session_stats(sessions: DataFrame, entity: str = "user_id") -> DataFrame:
    """Collapse sessionized events to one row per session."""
    return sessions.groupBy(entity, "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        dsum("value").alias("sum_value"),
    )
