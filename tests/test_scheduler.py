"""Scheduler shim tests: cron parsing + due-job firing over a registry."""

from datetime import datetime

from local_data_pipeline_spark.models.swell import build_registry, synthesize_raw_swell
from local_data_pipeline_spark.scheduler import Job, Scheduler, next_fire


def test_next_fire_nightly():
    assert next_fire("0 0 * * *", datetime(2026, 8, 13, 10, 30)) == datetime(
        2026, 8, 14, 0, 0
    )
    # ≙ the reference's second schedule, 1am (dbt_defs.py:10)
    assert next_fire("0 1 * * *", datetime(2026, 8, 13, 0, 30)) == datetime(
        2026, 8, 13, 1, 0
    )


def test_next_fire_step_and_range():
    assert next_fire("*/15 * * * *", datetime(2026, 8, 13, 10, 1)) == datetime(
        2026, 8, 13, 10, 15
    )
    assert next_fire("0 9-10 * * *", datetime(2026, 8, 13, 9, 30)) == datetime(
        2026, 8, 13, 10, 0
    )


def test_scheduler_runs_due_jobs(spark):
    reg = build_registry(lambda s: synthesize_raw_swell(s))
    job = Job(name="nightly_assets", registry=reg, cron="0 0 * * *")
    sched = Scheduler([job])
    # anchor is now-1d, so the nightly tick has always passed
    results = sched.run_due(spark, now=datetime(2026, 8, 13, 0, 5))
    assert "nightly_assets" in results
    assert any(r.model == "pres_daily_max_swell" for r in results["nightly_assets"])
    # immediately after, nothing is due until the next midnight
    assert sched.due(datetime(2026, 8, 13, 0, 6)) == []
    assert sched.due(datetime(2026, 8, 14, 0, 1)) != []


def test_backfill_partitions_idempotent_and_scoped(spark, tmp_path):
    """backfill(): chunked, idempotent, touches only listed partitions."""
    import glob
    import os

    from pyspark.sql import functions as F

    from local_data_pipeline_spark.scheduler import backfill
    from local_data_pipeline_spark.session import load_table

    SF = "/root/testdata/sf0.001"
    ev = load_table(spark, SF, "events").withColumn(
        "dt", F.col("ts").cast("date").cast("string")
    )
    days = sorted(r[0] for r in ev.select("dt").distinct().collect())[:4]
    path = str(tmp_path / "daily")

    def compute(spark_, day):
        return (
            ev.filter(F.col("dt") == day)
            .groupBy("dt", "event_type")
            .agg(F.count("*").alias("n"), F.sum("value").alias("v"))
            .withColumn("key", F.concat_ws("|", "dt", "event_type"))
        )

    res = backfill(
        spark, compute, path, "dt", days, key="key", chunk_size=2
    )
    assert len(res) == 2 and all(r.rows > 0 for r in res)
    first = spark.read.parquet(path)
    total0 = first.count()
    # (read-back dt is date-typed: Spark infers partition-dir value types)
    assert sorted(str(r[0]) for r in first.select("dt").distinct().collect()) == days

    # snapshot untouched partition files, then re-backfill ONE day
    untouched = {
        f: os.path.getmtime(f)
        for f in glob.glob(path + "/dt=*/*.parquet")
        if f"dt={days[0]}" not in f
    }
    backfill(spark, compute, path, "dt", [days[0]], key="key")
    after = spark.read.parquet(path)
    assert after.count() == total0  # idempotent: no duplicate rows
    for f, mtime in untouched.items():
        assert os.path.getmtime(f) == mtime  # other partitions untouched
