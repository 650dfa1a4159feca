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
