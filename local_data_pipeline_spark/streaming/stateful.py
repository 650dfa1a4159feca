"""Custom stateful streaming operator via ``applyInPandasWithState``.

Demonstrates the arbitrary-state API (the Spark-idiomatic home for
operators that windowed aggregation can't express): per-user running
totals that persist in the state store ACROSS micro-batches and across
``Trigger.AvailableNow`` runs (checkpointed). Each batch emits the
updated totals for the users it touched.

100 TB notes: state is partitioned by the grouping key across executors
(RocksDB-backed in production configs); keep per-key state small and
bounded — for unbounded sessions add a ``GroupStateTimeout`` eviction.
"""

from __future__ import annotations

from typing import Any, Iterator

from pyspark.sql import SparkSession


def _update_totals(key: tuple, pdfs: Iterator[Any], state) -> Iterator[Any]:
    import pandas as pd

    (user_id,) = key
    if state.exists:
        n_events, sum_value = state.get
    else:
        n_events, sum_value = 0, 0.0
    for pdf in pdfs:
        n_events += len(pdf)
        sum_value += float(pdf["value"].sum())
    state.update((n_events, round(sum_value, 6)))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n_events], "sum_value": [round(sum_value, 6)]}
    )


def _sessionizer(gap_seconds: int):
    """Build the per-key state function: carries (session_start, last_ts,
    n_events, sum_value) across batches; emits a CLOSED session row
    whenever the event-time gap exceeds ``gap_seconds`` — including gaps
    that span micro-batches (the part batch-window sessionize can't do
    incrementally). The open tail session stays in state (an
    EventTimeTimeout would flush it on watermark expiry)."""

    def update(key: tuple, pdfs: Iterator[Any], state) -> Iterator[Any]:
        import pandas as pd

        (user_id,) = key
        if state.exists:
            start_us, last_us, n_events, sum_value = state.get
        else:
            start_us = last_us = None
            n_events, sum_value = 0, 0.0
        closed = []
        # concat-then-sort: multi-chunk batches must be ordered globally
        # before the order-sensitive gap walk (same rule as _ewma_updater)
        chunks = list(pdfs)
        if chunks:
            batch = pd.concat(chunks).sort_values(["ts", "event_id"])
            for ts, value in zip(batch["ts"], batch["value"]):
                ts_us = int(ts.value // 1000)  # pandas ns -> µs
                if last_us is not None and ts_us - last_us > gap_seconds * 1_000_000:
                    closed.append((user_id, start_us, last_us, n_events, round(sum_value, 6)))
                    start_us, n_events, sum_value = ts_us, 0, 0.0
                if start_us is None:
                    start_us = ts_us
                last_us = ts_us
                n_events += 1
                sum_value += float(value)
        state.update((start_us, last_us, n_events, round(sum_value, 6)))
        yield pd.DataFrame(
            closed,
            columns=["user_id", "session_start_us", "session_end_us", "n_events", "sum_value"],
        )

    return update


def run_streaming_sessionizer(
    spark: SparkSession,
    events_path: str,
    out_path: str,
    checkpoint: str,
    schema,
    gap_seconds: int = 1800,
) -> None:
    """File stream → gap-closed sessions via applyInPandasWithState →
    parquet, AvailableNow. Sessions spanning batch boundaries are stitched
    by the state store; only CLOSED sessions are emitted."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    stream = spark.readStream.schema(schema).parquet(events_path)
    out = stream.groupBy("user_id").applyInPandasWithState(
        _sessionizer(gap_seconds),
        outputStructType=(
            "user_id long, session_start_us long, session_end_us long, "
            "n_events long, sum_value double"
        ),
        stateStructType=(
            "session_start_us long, last_us long, n_events long, sum_value double"
        ),
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    (
        out.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def run_running_user_totals(
    spark: SparkSession,
    events_path: str,
    out_path: str,
    checkpoint: str,
    schema,
) -> None:
    """File stream → per-user cumulative (count, sum) with persistent
    state → parquet, AvailableNow. Rerunning after new files arrive
    CONTINUES the totals (state survives in the checkpoint)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    stream = spark.readStream.schema(schema).parquet(events_path)
    out = stream.groupBy("user_id").applyInPandasWithState(
        _update_totals,
        outputStructType="user_id long, n_events long, sum_value double",
        stateStructType="n_events long, sum_value double",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    (
        out.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def run_running_user_totals_tws(
    spark: SparkSession,
    events_path: str,
    out_path: str,
    checkpoint: str,
    schema,
) -> None:
    """The same per-user running totals on the modern Spark 4.x
    ``transformWithStateInPandas`` API (StatefulProcessor + typed
    ValueState) — the successor to ``applyInPandasWithState`` with
    composable state variables, timers, and schema evolution. Results
    are identical to ``run_running_user_totals`` (pinned in tests).

    Requires the RocksDB state store provider (how production deploys
    run it anyway: state spills to disk instead of executor heap) and
    the ``protobuf`` package (the API's state-server wire protocol —
    ships with real Spark deployments; absent in minimal containers, so
    the test gates on it)."""
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as e:  # pragma: no cover - environment-dependent
        raise ImportError(
            "transformWithStateInPandas needs the protobuf package "
            "(its state-server protocol); use run_running_user_totals "
            "(applyInPandasWithState) where protobuf is unavailable"
        ) from e
    import pandas as pd
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState(
                "totals", "n_events long, sum_value double"
            )

        def handleInputRows(self, key, rows, timerValues):
            prev = self._totals.get()
            n_events, sum_value = prev if prev is not None else (0, 0.0)
            for pdf in rows:
                n_events += len(pdf)
                sum_value += float(pdf["value"].sum())
            self._totals.update((n_events, round(sum_value, 6)))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n_events],
                    "sum_value": [round(sum_value, 6)],
                }
            )

        def close(self) -> None:
            pass

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = spark.readStream.schema(schema).parquet(events_path)
        out = stream.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=RunningTotals(),
            outputStructType="user_id long, n_events long, sum_value double",
            outputMode="append",
            timeMode="none",
        )
        (
            out.writeStream.format("parquet")
            .option("path", out_path)
            .option("checkpointLocation", checkpoint)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def _ewma_updater(alpha: float):
    """Per-key EWMA state function: the TRUE sequential recurrence
    ewma_t = alpha*x_t + (1-alpha)*ewma_{t-1}, carried exactly across
    micro-batches by the state store — the streaming complement of the
    batch query `ewma_value_by_user`, which truncates the recurrence to
    8 lags precisely because batch windows cannot carry running state.
    Events are applied in (ts, event_id) order within each batch; one
    row per touched user per batch reports the post-batch smoothed
    value."""

    def update(key: tuple, pdfs: Iterator[Any], state) -> Iterator[Any]:
        import pandas as pd

        (user_id,) = key
        if state.exists:
            last_us, ewma, n_events = state.get
        else:
            last_us, ewma, n_events = None, None, 0
        # a group's batch can arrive as MULTIPLE Arrow chunks in arbitrary
        # relative order — the order-sensitive recurrence must sort the
        # whole batch once, not each chunk independently
        chunks = list(pdfs)
        if chunks:
            batch = pd.concat(chunks).sort_values(["ts", "event_id"])
            for ts, value in zip(batch["ts"], batch["value"]):
                x = float(value)
                ewma = x if ewma is None else alpha * x + (1.0 - alpha) * ewma
                last_us = int(ts.value // 1000)
                n_events += 1
        state.update((last_us, ewma, n_events))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "last_event_us": [last_us],
                "n_events": [n_events],
                "ewma_value": [ewma],
            }
        )

    return update


def run_streaming_ewma(
    spark: SparkSession,
    events_path: str,
    out_path: str,
    checkpoint: str,
    schema,
    alpha: float = 0.5,
) -> None:
    """File stream → per-user exponentially-weighted moving average with
    persistent state → parquet, AvailableNow. Rerunning after new files
    arrive CONTINUES the recurrence from the checkpointed state — no
    reprocessing of history, which is the whole point of the streaming
    formulation at 100 TB (the batch 8-lag window would re-read the
    trailing events of every user every run)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    stream = spark.readStream.schema(schema).parquet(events_path)
    out = stream.groupBy("user_id").applyInPandasWithState(
        _ewma_updater(alpha),
        outputStructType=(
            "user_id long, last_event_us long, n_events long, ewma_value double"
        ),
        stateStructType="last_us long, ewma double, n_events long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    (
        out.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
