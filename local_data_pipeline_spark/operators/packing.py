"""Training-sequence packing at scale: distributed cumulative sums.

``pack_training_sequences`` (queries.py) expresses concat-and-chunk
packing with a global ordered window — correct, oracle-checkable, but a
global ``Window.orderBy`` with no partition key executes as ONE task:
the classic scale trap. This module provides the shape that survives
100 TB: range-partition by the ordering key, cumsum within each
partition, then add per-partition offsets (a tiny driver-side prefix
sum broadcast back). Identical results (tested), linear scaling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def distributed_cumsum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "cumsum",
    n_partitions: int = 32,
) -> DataFrame:
    """Exclusive prefix sum of ``value_col`` under the total order of
    ``order_col`` (unique key), computed without any single-task stage.

    Plan: ``repartitionByRange(order_col)`` assigns contiguous key ranges
    to partitions IN PARTITION-ID ORDER — that ordering is the range
    partitioner's contract and survives AQE coalescing (only adjacent
    partitions merge). ``spark_partition_id()`` therefore is a valid
    shard key: per-shard window cumsums are independent tasks, the K
    shard totals (a few bytes) come to the driver for a sequential
    prefix sum, and each shard's base offset broadcasts back. The exact
    result does not depend on where the sampled range boundaries fall —
    only on shards being contiguous in key order.
    """
    ranged = df.repartitionByRange(n_partitions, F.col(order_col)).withColumn(
        "__shard", F.spark_partition_id()
    )
    w_in = (
        Window.partitionBy("__shard")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # Materialize once: the totals collect and the final join are two
    # jobs, and range boundaries come from sampling — recomputing the
    # partitioning per job could shift shard assignment between them.
    local = ranged.withColumn("__local", F.sum(value_col).over(w_in)).localCheckpoint()

    totals = (
        local.groupBy("__shard")
        .agg(F.sum(value_col).alias("__total"))
        .orderBy("__shard")
        .collect()
    )
    offsets, acc = [], 0
    for r in totals:
        offsets.append((r["__shard"], acc))
        acc += r["__total"]
    off_df = df.sparkSession.createDataFrame(offsets, "__shard int, __offset bigint")
    return (
        local.join(F.broadcast(off_df), "__shard")
        .withColumn(out_col, F.col("__local") + F.col("__offset") - F.col(value_col))
        .drop("__shard", "__local", "__offset")
    )
