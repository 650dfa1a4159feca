"""Cron-shaped scheduling shim (SURVEY §2.D5/D6).

The reference schedules two jobs over "all assets" via Dagster cron
(`/root/reference/src/dagster_pipeline/defs/schedules.py:6-23`,
`dbt_defs.py:10-11,43-49` — both env-overridable). This engine keeps the
same operational contract without a daemon: a ``Job`` is a named callable
over a Registry selection; ``next_fire`` computes the next cron tick;
``run_due`` executes every job whose tick has arrived. An external cron /
systemd timer / CI scheduler calls ``run_all()`` or ``run_due()`` — the
idiomatic replacement for an always-on scheduler process in a batch
pipeline (and the incremental hop uses Trigger.AvailableNow, so each tick
costs only the new data).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from datetime import datetime, timedelta, timezone
from typing import Callable
from zoneinfo import ZoneInfo

from pyspark.sql import SparkSession

from .registry import BuildResult, Registry

#: ≙ NIGHTLY_CRON / SCHEDULE_TZ env overrides (schedules.py:6-7).
DEFAULT_CRON = os.environ.get("NIGHTLY_CRON", "0 0 * * *")


def _schedule_tz() -> str | None:
    """≙ the reference's `SCHEDULE_TZ` / `DBT_SCHEDULE_TZ` env override
    (schedules.py:7, dbt_defs.py:11 → Dagster's execution_timezone).
    None = naive/UTC ticks, the pre-override default."""
    return os.environ.get("SCHEDULE_TZ") or None


@dataclass(frozen=True)
class Job:
    """A named run over a registry selection (≙ define_asset_job)."""

    name: str
    registry: Registry
    cron: str = DEFAULT_CRON
    select: tuple[str, ...] | None = None
    #: wall-clock zone for the cron fields (None → SCHEDULE_TZ env → UTC)
    tz: str | None = None

    def run(self, spark: SparkSession) -> list[BuildResult]:
        return self.registry.build(
            spark, select=list(self.select) if self.select else None
        )


def _parse_field(field: str, lo: int, hi: int) -> set[int]:
    if field == "*":
        return set(range(lo, hi + 1))
    vals: set[int] = set()
    for part in field.split(","):
        if part.startswith("*/"):
            vals.update(range(lo, hi + 1, int(part[2:])))
        elif "-" in part:
            a, b = part.split("-")
            vals.update(range(int(a), int(b) + 1))
        else:
            vals.add(int(part))
    return vals


def next_fire(cron: str, after: datetime, tz: str | None = None) -> datetime:
    """Next ``minute hour dom month dow`` tick strictly after ``after``
    (standard 5-field cron, OR-semantics quirk of dom/dow not needed for
    the reference's simple schedules).

    ``tz`` (default: the ``SCHEDULE_TZ`` env var, ≙ Dagster's
    ``execution_timezone`` at reference schedules.py:17-23): cron fields
    are matched against the WALL CLOCK of that zone, so a nightly
    "0 0 * * *" in America/Los_Angeles fires at 08:00 UTC in winter and
    07:00 UTC in summer — the operator's midnight, not UTC's. A naive
    ``after`` is interpreted as UTC (the engine's session convention);
    the returned tick is zone-aware. DST edges follow cron convention:
    wall times skipped by spring-forward don't match (the next matching
    wall time fires instead); ambiguous fall-back times fire on the
    first (pre-transition, fold=0) occurrence only. With no tz, naive
    datetimes pass through unchanged (UTC ticks, the old contract)."""
    minute, hour, dom, month, dow = cron.split()
    minutes = _parse_field(minute, 0, 59)
    hours = _parse_field(hour, 0, 23)
    doms = _parse_field(dom, 1, 31)
    months = _parse_field(month, 1, 12)
    dows = _parse_field(dow, 0, 6)  # 0 = Sunday
    tz = tz if tz is not None else _schedule_tz()
    zone = ZoneInfo(tz) if tz else None
    if zone is not None:
        aware = (
            after.replace(tzinfo=timezone.utc)
            if after.tzinfo is None
            else after
        )
        # scan in naive wall time of the zone; convert back per candidate
        t = aware.astimezone(zone).replace(
            second=0, microsecond=0, tzinfo=None
        ) + timedelta(minutes=1)
    else:
        t = after.replace(second=0, microsecond=0) + timedelta(minutes=1)
    for _ in range(366 * 24 * 60):  # bounded scan, ≤1 year of minutes
        if (
            t.minute in minutes
            and t.hour in hours
            and t.day in doms
            and t.month in months
            and (t.weekday() + 1) % 7 in dows
        ):
            if zone is None:
                return t
            cand = t.replace(tzinfo=zone)  # fold=0: first occurrence
            # Spring-forward gap: a wall time the zone skips doesn't
            # round-trip (02:30 PDT-day normalizes to 03:30). Skip it —
            # the next matching REAL wall time fires, cron convention.
            rt = cand.astimezone(timezone.utc).astimezone(zone)
            if (rt.hour, rt.minute, rt.day) == (t.hour, t.minute, t.day):
                return cand
        t += timedelta(minutes=1)
    raise ValueError(f"no fire time within a year for cron {cron!r}")


@dataclass(frozen=True)
class RunRequest:
    """One sensor-requested run. ``run_key`` is the idempotency token
    (≙ Dagster's RunRequest.run_key): the scheduler executes at most one
    run per (sensor, run_key), so a sensor that keeps reporting the same
    state ("newest file is X") triggers exactly once until X changes."""

    job_name: str
    run_key: str | None = None


@dataclass(frozen=True)
class Sensor:
    """Poll-driven trigger (≙ Dagster's ``@sensor``; the reference's
    ``Definitions`` wires a ``sensors`` slot at definitions.py:12 — it
    defines none, so this completes the API shape with working
    semantics). ``evaluate()`` inspects the world (files, tables, a
    clock) and returns the runs it wants; the scheduler dedupes on
    ``run_key`` and routes each request to the named job."""

    name: str
    evaluate: Callable[[], list[RunRequest]]


def new_files_sensor(name: str, path: str, job_name: str) -> Sensor:
    """Sensor that requests one run of ``job_name`` whenever new data
    files land under ``path`` (run_key = newest mtime+count snapshot, so
    each distinct arrival state triggers exactly once — the standard
    "kick the pipeline when the upstream drop completes" trigger)."""

    def _evaluate() -> list[RunRequest]:
        if not os.path.exists(path):
            return []
        newest, count = 0.0, 0
        for root, _dirs, files in os.walk(path):
            for f in files:
                if f.startswith((".", "_")):
                    continue
                count += 1
                newest = max(newest, os.path.getmtime(os.path.join(root, f)))
        if count == 0:
            return []
        return [RunRequest(job_name=job_name, run_key=f"{newest:.6f}:{count}")]

    return Sensor(name=name, evaluate=_evaluate)


class Scheduler:
    """Tracks last-run per job; ``run_due`` fires everything whose next
    tick has passed, ``poll_sensors`` fires sensor-requested runs (at
    most once per run_key). State is in-memory by design — persistence
    belongs to the external cron runner."""

    def __init__(self, jobs: list[Job], sensors: list[Sensor] | None = None):
        self.jobs = {j.name: j for j in jobs}
        self.sensors = {s.name: s for s in (sensors or [])}
        self.last_run: dict[str, datetime] = {}
        self._seen_run_keys: set[tuple[str, str | None]] = set()

    def poll_sensors(self, spark: SparkSession) -> dict[str, list[BuildResult]]:
        """Evaluate every sensor; run each requested job whose
        (sensor, run_key) has not run before. Unknown job names raise —
        a mis-wired sensor is a deployment bug, not a skippable tick."""
        results: dict[str, list[BuildResult]] = {}
        for sensor in self.sensors.values():
            for req in sensor.evaluate():
                key = (sensor.name, req.run_key)
                if req.run_key is not None and key in self._seen_run_keys:
                    continue
                job = self.jobs[req.job_name]
                results[f"{sensor.name}:{req.run_key}"] = job.run(spark)
                self._seen_run_keys.add(key)
        return results

    def due(self, now: datetime) -> list[Job]:
        out = []
        for job in self.jobs.values():
            anchor = self.last_run.get(job.name, now - timedelta(days=1))
            tick = next_fire(job.cron, anchor, tz=job.tz)
            ref = now
            if tick.tzinfo is not None and ref.tzinfo is None:
                # naive `now` follows the engine convention: it IS UTC
                ref = ref.replace(tzinfo=timezone.utc)
            elif tick.tzinfo is None and ref.tzinfo is not None:
                # the symmetric case: a no-tz job polled with an aware
                # clock — naive ticks ARE UTC, so promote the tick (a
                # mixed fleet of tz and non-tz jobs must not TypeError)
                tick = tick.replace(tzinfo=timezone.utc)
            if tick <= ref:
                out.append(job)
        return out

    def run_due(
        self, spark: SparkSession, now: datetime | None = None
    ) -> dict[str, list[BuildResult]]:
        now = now or datetime.now()
        results = {}
        for job in self.due(now):
            results[job.name] = job.run(spark)
            self.last_run[job.name] = now
        return results


@dataclass(frozen=True)
class Definitions:
    """One assembled deployment object (≙ the reference's
    ``Definitions(assets, schedules=…, sensors=…, jobs=…, resources=…)``
    at definitions.py:7-18 / defs/__init__.py:1-8): everything an
    operator deploys as a unit. ``schedules`` are the cron-bearing jobs
    (a ``Job`` carries its own cron, so the slot is a selection, not a
    separate type); ``build_scheduler()`` wires jobs + sensors into the
    runnable scheduler the external timer drives."""

    registry: Registry
    jobs: tuple[Job, ...] = ()
    sensors: tuple[Sensor, ...] = ()
    resources: dict[str, object] = field(default_factory=dict)

    @property
    def schedules(self) -> tuple[Job, ...]:
        return tuple(j for j in self.jobs if j.cron)

    def build_scheduler(self) -> Scheduler:
        return Scheduler(list(self.jobs), sensors=list(self.sensors))


@dataclass
class BackfillResult:
    """Per-chunk run metadata for a partitioned backfill."""

    partitions: tuple[str, ...]
    rows: int
    seconds: float


def backfill(
    spark: SparkSession,
    compute_partition: Callable[[SparkSession, str], "object"],
    path: str,
    partition_col: str,
    partitions: list[str],
    key: str,
    chunk_size: int = 7,
) -> list[BackfillResult]:
    """Dagster-style partitioned backfill: (re)materialize a list of
    partition values (typically dates) of a partitioned parquet dataset,
    in bounded chunks.

    ``compute_partition(spark, value) -> DataFrame`` produces one
    partition's rows (it must include ``partition_col`` = value). Each
    chunk is unioned and merged via dynamic partition overwrite
    (``maintenance.upsert_partitioned``), so a backfill run:

    - is **idempotent** — re-running a partition overwrites exactly that
      partition, never duplicating rows;
    - touches **only the listed partitions** — untouched partition files
      stay byte-identical (tested);
    - bounds driver/cluster memory by ``chunk_size`` regardless of how
      many partitions are being rebuilt — a year-long backfill is 52
      chunks of 7, not one 365-partition job.

    ≙ the operational gap in the reference (full rebuild per run, no
    partition-scoped rerun; its raw table docstring "Partitioned by:
    location" is aspirational — open_meteo.py:101-102).
    """
    import time as _time

    from .sources.maintenance import upsert_partitioned

    out: list[BackfillResult] = []
    for i in range(0, len(partitions), chunk_size):
        chunk = partitions[i : i + chunk_size]
        t0 = _time.time()
        dfs = [compute_partition(spark, v) for v in chunk]
        updates = dfs[0]
        for d in dfs[1:]:
            updates = updates.unionByName(d)
        n = updates.count()
        if not os.path.exists(path):
            # first chunk bootstraps the dataset; later chunks merge
            updates.write.mode("overwrite").partitionBy(partition_col).parquet(path)
        else:
            upsert_partitioned(
                spark, updates, path, key=key, partition_col=partition_col
            )
        out.append(
            BackfillResult(
                partitions=tuple(chunk), rows=n, seconds=_time.time() - t0
            )
        )
    return out
