"""Incremental (streaming) variants of the pipeline hops.

The reference recomputes every layer from the full raw table on each cron
tick (SURVEY §4 — no ``is_incremental()`` anywhere). The idiomatic Spark
upgrade is Structured Streaming with ``Trigger.AvailableNow``: each run
processes exactly the raw files that arrived since the last checkpoint,
then exits — same cron-shaped operational model, incremental cost.

Also provides watermarked tumbling-window aggregation over an event
stream — the streaming twin of ``operators.windows.tumbling_agg`` (same
``F.window`` operator, so the batch plans lift unchanged).

100 TB notes: AvailableNow + checkpoint turns the daily full-rebuild
O(history) into O(new data). The stg transform is stateless (per-row
explode), so no state store is involved; the windowed agg keeps state
bounded by the watermark horizon.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..models.swell import stg_swell_hourly
from ..sources.rest import RAW_SCHEMA


def incremental_stg_swell(
    spark: SparkSession,
    raw_path: str,
    out_path: str,
    checkpoint: str,
) -> None:
    """raw parquet dir → staged hourly rows, AvailableNow + checkpoint.

    Runs the SAME ``stg_swell_hourly`` transform as the batch model (one
    code path for both), appending only newly arrived files' rows."""
    raw = spark.readStream.schema(RAW_SCHEMA).parquet(raw_path)
    staged = stg_swell_hourly(raw)
    (
        staged.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def windowed_event_counts(
    events: DataFrame,
    ts: str = "ts",
    duration: str = "1 hour",
    watermark: str = "2 hours",
    keys: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Watermarked tumbling-window counts for a STREAMING events frame.

    Late rows beyond ``watermark`` are dropped and window state is evicted
    past the horizon — the standard late-data contract."""
    return (
        events.withWatermark(ts, watermark)
        .groupBy(F.window(F.col(ts), duration).alias("w"), *keys)
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *keys,
            "n_events",
        )
    )


def streaming_dedup(
    events: DataFrame, key: str = "event_id", ts: str = "ts", watermark: str = "1 hour"
) -> DataFrame:
    """Exactly-once-per-key streaming dedup: ``dropDuplicatesWithinWatermark``
    keeps state only for the watermark horizon — the scale-safe form of
    stream dedup (unbounded ``dropDuplicates`` state grows forever)."""
    return events.withWatermark(ts, watermark).dropDuplicatesWithinWatermark([key])


def clicks_to_purchases_join(
    clicks: DataFrame, purchases: DataFrame, horizon: str = "1 hour"
) -> DataFrame:
    """Stream-stream interval join: each purchase joined to same-user
    clicks in the preceding ``horizon``. Watermarks on BOTH sides bound
    the join state; the time-range predicate lets Spark evict old rows."""
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    ).withWatermark("click_ts", horizon)
    p = purchases.select(
        "user_id", F.col("ts").alias("purchase_ts"), F.col("event_id").alias("purchase_id"), "value"
    ).withWatermark("purchase_ts", horizon)
    return p.join(
        c,
        (F.col("c_user") == F.col("user_id"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {horizon}")),
        "inner",
    ).select("user_id", "purchase_id", "purchase_ts", "value", "click_id", "click_ts")


def enrich_with_static_dim(
    events: DataFrame,
    dim: DataFrame,
    on: str = "event_type",
    how: str = "left",
) -> DataFrame:
    """Stream-static broadcast enrichment — the most common production
    streaming shape: a streaming fact joined to a small static dimension.
    The static side is broadcast, so every micro-batch is a map-side
    hash join with zero shuffle and NO join state (unlike stream-stream
    joins, nothing is watermark-evicted: the dim is re-resolved per
    micro-batch, so an updated dim parquet is picked up on the next
    trigger). At 100 TB-of-stream this is the only join shape whose cost
    is independent of stream history."""
    return events.join(F.broadcast(dim), on=on, how=how)


def run_stream_upsert(
    spark: SparkSession,
    src_path: str,
    table_path: str,
    checkpoint: str,
    schema,
    key: str,
    partition_col: str,
) -> None:
    """Streaming upsert sink via ``foreachBatch``: each micro-batch is
    MERGEd into a partitioned Parquet table (sources/maintenance.py
    upsert_partitioned) — the standard pattern for keyed mutable sinks
    that plain append streaming can't express. Batch-id dedup makes the
    merge effectively-once on retries."""
    from ..sources.maintenance import upsert_partitioned

    import os

    def merge(batch_df, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if not os.path.exists(table_path):
            batch_df.write.partitionBy(partition_col).parquet(table_path)
        else:
            upsert_partitioned(
                batch_df.sparkSession, batch_df, table_path, key, partition_col
            )

    stream = spark.readStream.schema(schema).parquet(src_path)
    (
        stream.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def run_windowed_event_stream(
    spark: SparkSession,
    events_path: str,
    out_path: str,
    checkpoint: str,
    schema,
    duration: str = "1 hour",
    watermark: str = "2 hours",
) -> None:
    """File-stream → watermarked windowed counts → parquet, AvailableNow."""
    stream = spark.readStream.schema(schema).parquet(events_path)
    out = windowed_event_counts(stream, duration=duration, watermark=watermark)
    (
        out.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def session_window_counts(
    events: DataFrame,
    ts: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    key: str = "user_id",
) -> DataFrame:
    """Per-key session aggregation with the NATIVE ``session_window``
    operator: a session is a run of events where consecutive gaps stay
    under ``gap``; the window closes (and its single result row emits)
    once the watermark passes the last event + gap.

    This is the built-in counterpart of the two custom sessionizers —
    the batch lag/gap window (operators/windows.py sessionize) and the
    cross-batch applyInPandasWithState stitcher (streaming/stateful.py).
    Prefer this form when "one output row per closed session" is the
    contract: state eviction, merge of out-of-order events into one
    session, and the gap semantics are engine-managed (dynamic gaps via
    a column/expression are also supported upstream).

    Scale: state is hash-partitioned by (key); each key holds only its
    OPEN sessions — bounded by the watermark horizon, independent of
    history length."""
    return (
        events.withWatermark(ts, watermark)
        .groupBy(F.session_window(F.col(ts), gap).alias("sw"), key)
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("session_value"),
        )
        .select(
            key,
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


def run_session_window_stream(
    spark: SparkSession,
    events_path: str,
    out_path: str,
    checkpoint: str,
    schema,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> None:
    """File-stream → native session windows → parquet, AvailableNow."""
    stream = spark.readStream.schema(schema).parquet(events_path)
    out = session_window_counts(stream, gap=gap, watermark=watermark)
    (
        out.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def run_streaming_agg_mv(
    spark: SparkSession,
    src_path: str,
    mv_path: str,
    checkpoint: str,
    schema,
    group_cols: list[str],
    partition_col: str,
    sum_cols: dict[str, str],
    derive=None,
) -> None:
    """Streaming CONTINUOUS AGGREGATE: each micro-batch's per-group
    partials merge into the partitioned rollup
    (sources/maintenance.refresh_aggregate_mv) via ``foreachBatch`` under
    ``Trigger.AvailableNow`` — the cron-shaped incremental materialized
    view. ``derive(df)`` optionally adds computed columns (e.g. a date
    partition) before grouping.

    Replay protection: the MV merge is ADDITIVE, so a retried batch
    would double-count — a ledger file under the MV records the highest
    applied batch id (written atomically via rename) and replayed ids
    are skipped. Honest limits of the pattern: (a) a crash in the window
    AFTER the merge commits but BEFORE the ledger rename still
    double-applies that one batch on restart — closing it needs a sink
    that can commit data+batch-id in one transaction (a lakehouse table
    storing per-batch partials, compacted later); (b) the ledger is
    bound to its checkpoint — deleting/recreating the checkpoint resets
    batch ids to 0, which would silently skip everything, so the ledger
    records the checkpoint path and a mismatch raises instead.
    At 100 TB each tick costs one aggregate over the new files plus a
    rewrite of the touched partitions only.
    """
    import json
    import os

    from ..sources.maintenance import refresh_aggregate_mv

    ledger = mv_path + "._applied_batches.json"

    def merge(batch_df, batch_id: int) -> None:
        applied = -1
        if os.path.exists(ledger):
            with open(ledger) as fh:
                state = json.load(fh)
            applied = state["max_batch_id"]
            if state.get("checkpoint", checkpoint) != checkpoint:
                raise ValueError(
                    f"MV ledger {ledger} belongs to checkpoint "
                    f"{state['checkpoint']!r}, not {checkpoint!r}: batch ids "
                    "restart from 0 under a new checkpoint and the ledger "
                    "would silently skip all new data. Reset the MV and "
                    "ledger together, or reuse the original checkpoint."
                )
        if batch_id <= applied or batch_df.isEmpty():
            return
        df = derive(batch_df) if derive is not None else batch_df
        refresh_aggregate_mv(
            batch_df.sparkSession,
            df,
            mv_path,
            group_cols=group_cols,
            partition_col=partition_col,
            sum_cols=sum_cols,
        )
        tmp = ledger + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"max_batch_id": batch_id, "checkpoint": checkpoint}, fh)
        os.replace(tmp, ledger)

    stream = spark.readStream.schema(schema).parquet(src_path)
    (
        stream.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
