"""Table maintenance: small-file compaction and statistics.

The two operational chores every long-running Parquet warehouse needs:

- **Compaction**: streaming/incremental appends produce many small files;
  scan cost at 100 TB is dominated by file-open overhead once files drop
  well below the HDFS/S3-friendly 128 MB-1 GB range. ``compact_parquet``
  rewrites a directory to ~``target_mb`` files (per partition directory
  when partitioned), preserving data exactly.
- **Statistics**: ``analyze_table`` runs ANALYZE TABLE (+ per-column) so
  Catalyst's cost-based optimizer has row counts / NDVs for join
  reordering and broadcast decisions.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import SparkSession


def _dir_size_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def compact_parquet(
    spark: SparkSession, path: str, target_mb: int = 128
) -> tuple[int, int]:
    """Rewrite a Parquet directory into ~target_mb files. Returns
    (files_before, files_after). Uses a temp sibling + atomic-ish swap so
    a failed rewrite never destroys the source."""
    import shutil

    def count_files(p: str) -> int:
        return sum(
            1
            for root, _d, files in os.walk(p)
            for f in files
            if f.endswith(".parquet")
        )

    before = count_files(path)
    size = _dir_size_bytes(path)
    n_files = max(1, math.ceil(size / (target_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + "__compacting"
    df.repartition(n_files).write.mode("overwrite").parquet(tmp)
    # verify row parity before swapping
    n_new = spark.read.parquet(tmp).count()
    n_old = df.count()
    if n_new != n_old:
        shutil.rmtree(tmp)
        raise RuntimeError(f"compaction row mismatch {n_new} != {n_old}; aborted")
    shutil.rmtree(path)
    os.rename(tmp, path)
    return before, count_files(path)


def upsert_partitioned(
    spark: SparkSession,
    updates,
    path: str,
    key: str,
    partition_col: str,
) -> None:
    """MERGE-INTO semantics on plain Parquet: upsert ``updates`` into a
    partitioned dataset by key, rewriting ONLY the partitions the updates
    touch (dynamic partition overwrite).

    Shape at 100 TB: read just the affected partitions (partition-pruned
    scan), anti-join out the updated keys, union the new rows, overwrite
    those partitions in place. Cost is proportional to touched partitions,
    not the table. (A lakehouse format — Delta/Iceberg — does this with
    ACID guarantees; this is the dependency-free equivalent for
    append-mostly pipelines.)"""
    from pyspark.sql import functions as F

    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        touched = [r[0] for r in updates.select(partition_col).distinct().collect()]
        existing = spark.read.parquet(path).filter(
            F.col(partition_col).isin(touched)
        )
        keys = updates.select(key).distinct()
        kept = existing.join(keys, key, "left_anti")
        merged = kept.unionByName(updates)
        (
            merged.repartition(partition_col)
            .write.mode("overwrite")
            .partitionBy(partition_col)
            .parquet(path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def analyze_table(
    spark: SparkSession, table: str, columns: list[str] | None = None
) -> None:
    """ANALYZE TABLE for CBO statistics (row count + optional column NDV/
    min/max). Registry table materializations call this when asked."""
    spark.sql(f"ANALYZE TABLE {table} COMPUTE STATISTICS")
    if columns:
        cols = ", ".join(columns)
        spark.sql(f"ANALYZE TABLE {table} COMPUTE STATISTICS FOR COLUMNS {cols}")


def refresh_aggregate_mv(
    spark: SparkSession,
    new_data,
    mv_path: str,
    group_cols: list[str],
    partition_col: str,
    sum_cols: dict[str, str],
    count_col: str = "n",
    scale: int = 6,
) -> None:
    """Incrementally maintain a partitioned AGGREGATE materialized view:
    merge the new batch's per-group partials into the existing rollup,
    rewriting only the partitions the batch touches.

    The MV schema is ``group_cols + count_col (bigint) + one
    decimal(25,scale) column per sum_cols entry``. Sums are STORED as
    decimal, not double: decimal partials are associative, so any
    sequence of refreshes — day by day, backfill chunks, replays of the
    same batch boundary — produces the bit-identical rollup a full
    recompute would (the test pins this). Readers cast to double at
    query time.

    Cost shape at 100 TB: one aggregate over the NEW data only (map-side
    combinable), a partition-pruned read of the touched MV partitions
    (group-cardinality-sized, not fact-sized), and a dynamic-partition
    overwrite of just those partitions. The full-refresh alternative
    re-scans the entire fact table; this is the O(new data) upgrade —
    the same role dbt's incremental aggregates / continuous aggregates
    play. ``partition_col`` must be one of ``group_cols``.
    """
    import os

    from pyspark.sql import functions as F

    if partition_col not in group_cols:
        raise ValueError("partition_col must be one of group_cols")
    dec = f"decimal(25,{scale})"
    partials = new_data.groupBy(*group_cols).agg(
        F.count("*").alias(count_col),
        *[
            F.sum(F.col(src).cast(dec)).cast(dec).alias(out)
            for out, src in sum_cols.items()
        ],
    )
    if not os.path.exists(mv_path):
        (
            partials.repartition(partition_col)
            .write.mode("overwrite")
            .partitionBy(partition_col)
            .parquet(mv_path)
        )
        return
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    # cache: `touched` and the merge both read the partials — without the
    # pin the aggregate over the new batch (and the scan feeding it)
    # would execute twice, breaking the one-pass cost contract
    partials = partials.cache()
    try:
        touched = [r[0] for r in partials.select(partition_col).distinct().collect()]
        # NULL partition values: isin() never matches NULL (three-valued
        # logic), which would DROP the existing null partition's rows
        # while the dynamic overwrite rewrites that partition — silent
        # data loss. Match nulls explicitly when the batch touches them.
        non_null = [t for t in touched if t is not None]
        cond = F.col(partition_col).isin(non_null)
        if None in touched:
            cond = cond | F.col(partition_col).isNull()
        existing = spark.read.parquet(mv_path).filter(cond)
        merged = existing.unionByName(partials).groupBy(*group_cols).agg(
            F.sum(count_col).cast("bigint").alias(count_col),
            *[
                F.sum(out).cast(dec).alias(out)
                for out in sum_cols
            ],
        )
        (
            merged.repartition(partition_col)
            .write.mode("overwrite")
            .partitionBy(partition_col)
            .parquet(mv_path)
        )
    finally:
        partials.unpersist()
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
