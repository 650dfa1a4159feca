"""File sources/sinks with explicit schemas (never inferred — SURVEY §1.3).

The reference's only storage is DuckDB files; a Spark engine's native
equivalents are Parquet (canonical), CSV, and JSON-lines. All readers take
an explicit schema or DDL string: schema inference is a full extra pass at
100 TB and produces type drift between runs.

Sinks: ``write_table`` is the canonical partitioned-Parquet writer — at
scale, partition columns are the pruning contract with every downstream
reader (see tests/test_file_sources.py for the PartitionFilters proof).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    header: bool = True,
    **options,
) -> DataFrame:
    return spark.read.options(header=header, **options).schema(schema).csv(path)


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType | str, **options
) -> DataFrame:
    """JSON-lines with a declared schema (missing fields → null, extra
    fields dropped — the tolerant-reader contract)."""
    return spark.read.options(**options).schema(schema).json(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_table(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Partitioned columnar sink. ``partition_by`` should be the dominant
    filter columns (date, tenant) — each becomes a directory level the
    scanner prunes without reading footers."""
    writer = df.write.mode(mode).format(fmt)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def write_csv(df: DataFrame, path: str, header: bool = True, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", header).csv(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)
