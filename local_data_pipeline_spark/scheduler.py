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
from dataclasses import dataclass
from datetime import datetime, timedelta
from typing import Callable

from pyspark.sql import SparkSession

from .registry import BuildResult, Registry

#: ≙ NIGHTLY_CRON / SCHEDULE_TZ env overrides (schedules.py:6-7).
DEFAULT_CRON = os.environ.get("NIGHTLY_CRON", "0 0 * * *")


@dataclass(frozen=True)
class Job:
    """A named run over a registry selection (≙ define_asset_job)."""

    name: str
    registry: Registry
    cron: str = DEFAULT_CRON
    select: tuple[str, ...] | None = None

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


def next_fire(cron: str, after: datetime) -> datetime:
    """Next ``minute hour dom month dow`` tick strictly after ``after``
    (standard 5-field cron, OR-semantics quirk of dom/dow not needed for
    the reference's simple schedules)."""
    minute, hour, dom, month, dow = cron.split()
    minutes = _parse_field(minute, 0, 59)
    hours = _parse_field(hour, 0, 23)
    doms = _parse_field(dom, 1, 31)
    months = _parse_field(month, 1, 12)
    dows = _parse_field(dow, 0, 6)  # 0 = Sunday
    t = after.replace(second=0, microsecond=0) + timedelta(minutes=1)
    for _ in range(366 * 24 * 60):  # bounded scan, ≤1 year
        if (
            t.minute in minutes
            and t.hour in hours
            and t.day in doms
            and t.month in months
            and (t.weekday() + 1) % 7 in dows
        ):
            return t
        t += timedelta(minutes=1)
    raise ValueError(f"no fire time within a year for cron {cron!r}")


class Scheduler:
    """Tracks last-run per job; ``run_due`` fires everything whose next
    tick has passed. State is in-memory by design — persistence belongs
    to the external cron runner."""

    def __init__(self, jobs: list[Job]):
        self.jobs = {j.name: j for j in jobs}
        self.last_run: dict[str, datetime] = {}

    def due(self, now: datetime) -> list[Job]:
        out = []
        for job in self.jobs.values():
            anchor = self.last_run.get(job.name, now - timedelta(days=1))
            if next_fire(job.cron, anchor) <= now:
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
