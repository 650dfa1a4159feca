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
