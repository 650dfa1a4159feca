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


def test_next_fire_schedule_tz_follows_wall_clock_across_dst():
    """SCHEDULE_TZ semantics (≙ Dagster execution_timezone, reference
    schedules.py:17-23): a nightly cron in America/Los_Angeles fires at
    the operator's midnight — 08:00 UTC under PST, 07:00 UTC under PDT —
    so the UTC firing instant shifts by an hour across spring-forward."""
    from datetime import timezone

    # 2026-03-07 is PST (UTC-8); next midnight LA = 08:00 UTC
    before = next_fire(
        "0 0 * * *",
        datetime(2026, 3, 7, 12, 0),  # naive = UTC convention
        tz="America/Los_Angeles",
    )
    assert before.astimezone(timezone.utc).replace(tzinfo=None) == datetime(
        2026, 3, 8, 8, 0
    )
    # 2026-03-08 02:00 PST jumps to 03:00 PDT; the NEXT midnight after
    # that morning is 2026-03-09 00:00 PDT = 07:00 UTC — one UTC hour
    # earlier than the previous tick's offset
    after = next_fire(
        "0 0 * * *", datetime(2026, 3, 8, 12, 0), tz="America/Los_Angeles"
    )
    assert after.astimezone(timezone.utc).replace(tzinfo=None) == datetime(
        2026, 3, 9, 7, 0
    )


def test_next_fire_skips_spring_forward_gap():
    """A 02:30 schedule on the spring-forward day (02:00→03:00 LA,
    2026-03-08): 02:30 does not exist — cron convention fires the next
    REAL matching wall time (02:30 the following day), never a phantom."""
    tick = next_fire(
        "30 2 * * *", datetime(2026, 3, 8, 8, 0), tz="America/Los_Angeles"
    )
    # after = 00:00 LA on Mar 8; 02:30 LA that day is skipped by DST
    assert (tick.month, tick.day, tick.hour, tick.minute) == (3, 9, 2, 30)


def test_next_fire_env_var_default(monkeypatch):
    """SCHEDULE_TZ env var is honored when no explicit tz is passed
    (≙ the reference's env-overridable execution timezone)."""
    monkeypatch.setenv("SCHEDULE_TZ", "America/Los_Angeles")
    tick = next_fire("0 0 * * *", datetime(2026, 1, 10, 12, 0))
    from datetime import timezone

    assert tick.tzinfo is not None
    assert tick.astimezone(timezone.utc).replace(tzinfo=None) == datetime(
        2026, 1, 11, 8, 0
    )
    monkeypatch.delenv("SCHEDULE_TZ")
    naive = next_fire("0 0 * * *", datetime(2026, 1, 10, 12, 0))
    assert naive.tzinfo is None and naive == datetime(2026, 1, 11, 0, 0)


def test_scheduler_due_with_tz_job():
    """A tz-carrying Job fires on its wall-clock midnight when compared
    against a naive-UTC `now`."""
    from local_data_pipeline_spark.scheduler import Scheduler

    job = Job(name="la_nightly", registry=None, cron="0 0 * * *",
              tz="America/Los_Angeles")
    sched = Scheduler([job])
    sched.last_run["la_nightly"] = datetime(2026, 1, 10, 9, 0)  # UTC
    # 07:59 UTC Jan 11 = 23:59 LA Jan 10 — not yet due
    assert sched.due(datetime(2026, 1, 11, 7, 59)) == []
    # 08:01 UTC = 00:01 LA — due
    assert [j.name for j in sched.due(datetime(2026, 1, 11, 8, 1))] == [
        "la_nightly"
    ]


def test_scheduler_due_mixed_tz_fleet_aware_clock():
    """Round-5 ADVICE fix: a no-tz (naive-tick) job polled alongside a
    tz job with an AWARE `now` must not TypeError — naive ticks are UTC
    by engine convention, so they promote before comparison."""
    from datetime import timezone

    from local_data_pipeline_spark.scheduler import Scheduler

    naive_job = Job(name="utc_nightly", registry=None, cron="0 0 * * *")
    la_job = Job(name="la_nightly", registry=None, cron="0 0 * * *",
                 tz="America/Los_Angeles")
    sched = Scheduler([naive_job, la_job])
    sched.last_run["utc_nightly"] = datetime(2026, 1, 10, 9, 0)
    sched.last_run["la_nightly"] = datetime(2026, 1, 10, 9, 0)
    aware = datetime(2026, 1, 11, 0, 1, tzinfo=timezone.utc)
    # 00:01 UTC Jan 11: the UTC job's midnight has passed, LA's has not
    assert [j.name for j in sched.due(aware)] == ["utc_nightly"]
    aware_late = datetime(2026, 1, 11, 8, 1, tzinfo=timezone.utc)
    assert {j.name for j in sched.due(aware_late)} == {
        "utc_nightly", "la_nightly"
    }


def test_sensor_fires_once_per_run_key(spark, tmp_path):
    """new_files_sensor: triggers on a fresh data drop, dedupes on the
    run_key until the drop changes, re-triggers on the next arrival."""
    from local_data_pipeline_spark.scheduler import (
        Definitions,
        Job,
        new_files_sensor,
    )

    reg = build_registry(lambda s: synthesize_raw_swell(s))
    job = Job(name="on_drop", registry=reg, cron="0 0 * * *")
    drop = tmp_path / "landing"
    defs = Definitions(
        registry=reg,
        jobs=(job,),
        sensors=(new_files_sensor("landing_watch", str(drop), "on_drop"),),
    )
    assert defs.schedules == (job,)  # cron-bearing jobs fill the slot
    sched = defs.build_scheduler()

    # empty landing zone: no requests, no runs
    assert sched.poll_sensors(spark) == {}
    drop.mkdir()
    (drop / "_SUCCESS").write_text("")  # marker files are not data
    assert sched.poll_sensors(spark) == {}

    (drop / "part-000.json").write_text("{}")
    first = sched.poll_sensors(spark)
    assert len(first) == 1
    (runs,) = first.values()
    assert any(r.model == "pres_daily_max_swell" for r in runs)
    # same state: the run_key has been seen, nothing fires
    assert sched.poll_sensors(spark) == {}

    # a new file arrives -> new run_key -> exactly one more run
    import os
    import time

    (drop / "part-001.json").write_text("{}")
    os.utime(drop / "part-001.json", (time.time() + 2, time.time() + 2))
    again = sched.poll_sensors(spark)
    assert len(again) == 1
    assert sched.poll_sensors(spark) == {}


def test_sensor_unknown_job_raises(spark, tmp_path):
    from local_data_pipeline_spark.scheduler import (
        RunRequest,
        Scheduler,
        Sensor,
    )
    import pytest

    bad = Sensor(name="bad", evaluate=lambda: [RunRequest(job_name="nope")])
    sched = Scheduler([], sensors=[bad])
    with pytest.raises(KeyError):
        sched.poll_sensors(spark)
