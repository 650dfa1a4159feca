"""Spark 4 Python DataSource: the reference's ingestion as a SOURCE.

The reference ingests by looping locations on the driver and appending one
row per (fetch, location) (`/root/reference/src/dagster_pipeline/defs/
open_meteo.py:106-108, 73-76`). The idiomatic Spark 4 restatement is a
custom *Python DataSource* (SPARK-44076): each (ingest-day, location) is an
``InputPartition``, so fetch/generate work runs ON EXECUTORS, in parallel,
with the engine owning retries and task placement — `spark.read.format(
"swell_synth")` instead of a driver loop.

Two readers are registered under one source name:

- batch (``reader``): partitions = ingest_days × locations; each partition
  emits exactly its own payload row (deterministic fixture shape from
  models/swell.py payload_row — the network seam stays injectable/offline,
  SURVEY A1).
- streaming (``simpleStreamReader``): each micro-batch is one ingest day —
  the cron-per-day cadence of the reference (SURVEY D6) expressed as a
  Structured Streaming source with offset tracking; `Trigger.AvailableNow`
  drains all pending days, a checkpoint restart resumes from the last
  committed day.

At 100 TB the same pattern carries a real HTTP/queue-backed source: one
partition per shard/endpoint, offsets = source cursors.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

#: Default fan-out (≙ reference LOCATIONS, ordered — the set-literal quirk
#: documented in SURVEY §1.2 is deliberately not replicated).
DEFAULT_LOCATIONS = (
    ("mavericks", 37.4936, -122.5010),
    ("oceanside", 33.1505, -117.3483),
    ("trestles", 33.3828, -117.5931),
)

SCHEMA = "timestamp string, location string, data string"


class SwellPartition(InputPartition):
    def __init__(self, day: int, li: int, loc: str, lat: float, lon: float):
        self.day, self.li, self.loc, self.lat, self.lon = day, li, loc, lat, lon


def _opts(options) -> tuple[int, int]:
    return (
        int(options.get("n_ingest_days", 3)),
        int(options.get("payload_hours", 48)),
    )


class SwellSynthReader(DataSourceReader):
    def __init__(self, options):
        self.n_days, self.payload_hours = _opts(options)

    def partitions(self) -> list[InputPartition]:
        return [
            SwellPartition(day, li, loc, lat, lon)
            for day in range(self.n_days)
            for li, (loc, lat, lon) in enumerate(DEFAULT_LOCATIONS)
        ]

    def read(self, p: SwellPartition) -> Iterator[tuple]:
        # import inside read(): runs on the executor's Python worker
        from ..models.swell import payload_row

        yield payload_row(p.day, p.li, p.loc, p.lat, p.lon, self.payload_hours)


class SwellSynthStreamReader(SimpleDataSourceStreamReader):
    """One ingest day per micro-batch; offset = next unread day."""

    def __init__(self, options):
        self.n_days, self.payload_hours = _opts(options)

    def initialOffset(self) -> dict:
        return {"day": 0}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        from ..models.swell import payload_row

        day = int(start["day"])
        if day >= self.n_days:  # fully drained: empty batch, same offset
            return iter(()), {"day": day}
        rows = [
            payload_row(day, li, loc, lat, lon, self.payload_hours)
            for li, (loc, lat, lon) in enumerate(DEFAULT_LOCATIONS)
        ]
        return iter(rows), {"day": day + 1}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        from ..models.swell import payload_row

        for day in range(int(start["day"]), int(end["day"])):
            for li, (loc, lat, lon) in enumerate(DEFAULT_LOCATIONS):
                yield payload_row(day, li, loc, lat, lon, self.payload_hours)


class SwellSynthDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "swell_synth"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return SwellSynthReader(self.options)

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return SwellSynthStreamReader(self.options)


class _JsonlCommit(WriterCommitMessage):
    def __init__(self, path: str, rows: int):
        self.path = path
        self.rows = rows


class JsonlSinkWriter(DataSourceWriter):
    """Per-task executor-side write: each partition lands one
    ``part-<uuid>.jsonl`` file under ``path``; the driver's ``commit``
    writes a ``_SUCCESS`` manifest listing every committed file+rowcount
    (so readers can detect partial output), ``abort`` removes the files
    this attempt produced. The write itself is distributed — no rows
    ever pass through the driver.

    The ``_SUCCESS`` manifest is the AUTHORITATIVE corpus listing —
    readers must consume via it, never by directory glob. ``commit``
    enforces that: in overwrite mode the manifest lists only this
    write's files; in append mode it MERGES the prior manifest's files
    with this write's; and in both modes any ``part-*.jsonl`` file NOT
    in the final manifest (stale overwritten data, orphans from failed
    or speculative task attempts) is removed from the directory, so
    manifest-readers and directory-glob readers see the same corpus."""

    def __init__(self, options, overwrite: bool = False):
        self.path = options.get("path")
        self.overwrite = overwrite
        if not self.path:
            raise ValueError("jsonl_sink requires option 'path'")

    def write(self, iterator) -> "_JsonlCommit":
        import json
        import os
        import uuid

        os.makedirs(self.path, exist_ok=True)
        fname = os.path.join(self.path, f"part-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(fname, "w") as fh:
            for row in iterator:
                fh.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return _JsonlCommit(fname, n)

    def commit(self, messages) -> None:
        import glob
        import json
        import os

        files = [{"path": m.path, "rows": m.rows} for m in messages if m]
        success = os.path.join(self.path, "_SUCCESS")
        if not self.overwrite and os.path.exists(success):
            # append: the manifest accumulates — prior committed files
            # stay part of the corpus
            with open(success) as fh:
                files = json.load(fh).get("files", []) + files
        manifest = {
            "files": files,
            "total_rows": sum(f["rows"] for f in files),
        }
        with open(success, "w") as fh:
            json.dump(manifest, fh)
        # sweep anything the manifest doesn't own: stale overwritten
        # parts (overwrite mode) and orphans from failed/speculative
        # attempts (both modes)
        owned = {os.path.abspath(f["path"]) for f in files}
        for p in glob.glob(os.path.join(self.path, "part-*.jsonl")):
            if os.path.abspath(p) not in owned:
                try:
                    os.remove(p)
                except OSError:
                    pass

    def abort(self, messages) -> None:
        import os

        for m in messages:
            if m is not None:
                try:
                    os.remove(m.path)
                except OSError:
                    pass


class JsonlStreamSinkWriter(DataSourceStreamWriter):
    """STREAMING write half (SPARK-45269, ``df.writeStream.format(
    "jsonl_sink")``): per micro-batch, each task writes one part file;
    the driver's per-batch ``commit`` appends an idempotent entry to a
    ``_LOG`` jsonl keyed by ``batchId`` — a replayed batch (Structured
    Streaming's at-least-once commit retry) is detected by its id and
    its files are dropped instead of double-counted, giving readers
    exactly-once visibility via the log. ``abort`` removes this
    attempt's files. Readers must consume via ``_LOG``, never by glob
    (speculative attempts can leave orphans until the next commit)."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_sink requires option 'path'")

    def write(self, iterator) -> "_JsonlCommit":
        import json
        import os
        import uuid

        os.makedirs(self.path, exist_ok=True)
        fname = os.path.join(self.path, f"part-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(fname, "w") as fh:
            for row in iterator:
                fh.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return _JsonlCommit(fname, n)

    def commit(self, messages, batchId: int) -> None:
        import json
        import os

        log = os.path.join(self.path, "_LOG")
        seen = set()
        if os.path.exists(log):
            with open(log) as fh:
                seen = {json.loads(line)["batch"] for line in fh if line.strip()}
        files = [{"path": m.path, "rows": m.rows} for m in messages if m]
        if batchId in seen:
            # replayed commit: the batch is already visible — drop the
            # duplicate files rather than double-count
            for f in files:
                try:
                    os.remove(f["path"])
                except OSError:
                    pass
            return
        entry = {
            "batch": batchId,
            "files": files,
            "rows": sum(f["rows"] for f in files),
        }
        with open(log, "a") as fh:
            fh.write(json.dumps(entry) + "\n")

    def abort(self, messages, batchId: int) -> None:
        import os

        for m in messages:
            if m is not None:
                try:
                    os.remove(m.path)
                except OSError:
                    pass


class JsonlSinkDataSource(DataSource):
    """Python DataSource WRITER (the write half of SPARK-44076):
    ``df.write.format("jsonl_sink").option("path", d).mode("append")``
    plus the STREAMING writer (``df.writeStream.format("jsonl_sink")``)
    — completing the full Python DSv2 matrix next to the batch and
    streaming READERS above (batch read / stream read / batch write /
    stream write). Local filesystem here; at scale the same classes
    wrap an object-store client, one upload per task."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_sink"

    def schema(self) -> str:  # pragma: no cover - writer-only source
        return "value string"

    def writer(self, schema, overwrite: bool) -> DataSourceWriter:
        return JsonlSinkWriter(self.options, overwrite)

    def streamWriter(self, schema, overwrite: bool) -> DataSourceStreamWriter:
        return JsonlStreamSinkWriter(self.options)


def register(spark) -> None:
    spark.dataSource.register(SwellSynthDataSource)
    spark.dataSource.register(JsonlSinkDataSource)
