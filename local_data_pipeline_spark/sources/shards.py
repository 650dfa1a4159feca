"""Training-shard writer: the sink shape an LLM data pipeline feeds to a
trainer.

Deterministic sharding (hash of a stable id, NOT random), documents sorted
within each shard, bounded file sizes — so a re-run of the pipeline
produces byte-stable shards and a trainer's dataloader can seek/resume.

At 100 TB: ``repartition(n_shards, hash)`` is one full shuffle — the
unavoidable one — and ``maxRecordsPerFile`` bounds memory on both writer
and reader sides. Sorting within partitions is a local sort (no extra
exchange).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_training_shards(
    df: DataFrame,
    path: str,
    id_col: str,
    n_shards: int,
    sort_by: list[str] | None = None,
    max_records_per_file: int | None = None,
    fmt: str = "parquet",
) -> None:
    """Write ``n_shards`` deterministic shards: shard = pmod(xxhash64(id),
    n_shards); rows sorted by ``sort_by`` (default: id) within each shard."""
    sharded = df.withColumn(
        "shard", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards)).cast("int")
    )
    out = sharded.repartition(n_shards, "shard").sortWithinPartitions(
        *(sort_by or [id_col])
    )
    writer = out.write.mode("overwrite").format(fmt).partitionBy("shard")
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.save(path)
