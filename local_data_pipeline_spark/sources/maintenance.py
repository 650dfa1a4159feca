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
