"""Bucketed (pre-partitioned) tables: shuffle-free co-located joins.

At 100 TB the dominant cost of a fact-fact join is shuffling both sides.
Writing both tables bucketed by the join key (same bucket count) lets
Spark plan a SortMergeJoin with ZERO Exchange — each task reads matching
buckets from both sides. This is the engine's answer to "is there a
shuffle here that becomes the bottleneck at scale?" for repeated joins on
stable keys (orderkey, user_id): pay the partitioning once at write time,
reuse it on every subsequent join/aggregate on that key.

Verified by plan assertion in tests/test_bucketing.py (no shuffle
exchange in the join plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 8,
    sort_cols: list[str] | None = None,
) -> None:
    """Materialize as a bucketed+sorted managed table (overwrite)."""
    writer = (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*(sort_cols or bucket_cols))
        .format("parquet")
    )
    writer.saveAsTable(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables; with matching bucket specs Catalyst
    plans SortMergeJoin without Exchange on either side."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
