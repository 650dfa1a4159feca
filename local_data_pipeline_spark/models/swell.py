"""Reference-parity swell pipeline: raw JSON → hourly staging → daily max.

Re-expresses the reference's three dbt models on Spark DataFrames:

- ``stg_swell_hourly`` ≙
  `/root/reference/dbt/models/staging/stg_open_meteo/stg_open_meteo__swell_data.sql`
  (JSON parse + 7-parallel-array explode → typed hourly rows). The reference
  explodes by building a per-index JSON path with ``printf`` and calling
  ``json_extract`` per element (stg sql:25-37, O(n²)-ish); here the payload is
  parsed ONCE per row with ``from_json`` into native arrays, zipped with
  ``arrays_zip`` and exploded with a single generator — vectorized,
  whole-stage-codegen'd, and linear.
- ``int_daily_max_swell`` ≙
  `/root/reference/dbt/models/intermediate/int_open_meteo__max_swell_per_day.sql`
  (``row_number() over (partition by dt, location order by swell_wave_height
  desc, timestamp desc)`` + ``rn = 1`` — the 2-key tie-break is replicated
  exactly, int sql:13-16).
- ``pres_daily_max_swell`` ≙
  `/root/reference/dbt/models/presentation/pres_open_meteo__daily_max_swell.sql`
  (passthrough projection, materialized as a table, pres sql:2).

Data tests ``not_null(dt)`` / ``not_null(location)`` ≙
`/root/reference/dbt/models/intermediate/_int_open_meteo.yml:9-16`.

100 TB notes: staging is embarrassingly parallel (per-row explode, no
shuffle); the only exchange in the whole pipeline is the window's hash
partitioning on ``(dt, location)``. At scale the raw table should be
Parquet partitioned by ingestion date and location so staging prunes, and
``pres`` written ``partition_by=("dt",)``.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import Registry, not_null

#: Explicit payload schema for from_json — fixed shape per the extraction
#: paths the reference consumes (stg sql:15-21; fields requested at
#: open_meteo.py:23-32). Declared, never inferred (SURVEY §1.3).
HOURLY_FIELDS = (
    "wave_height",
    "wave_direction",
    "wind_wave_direction",
    "swell_wave_height",
    "swell_wave_direction",
    "swell_wave_period",
)

PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("latitude", T.DoubleType()),
        T.StructField("longitude", T.DoubleType()),
        T.StructField("timezone", T.StringType()),
        T.StructField(
            "hourly",
            T.StructType(
                [T.StructField("time", T.ArrayType(T.StringType()))]
                + [
                    T.StructField(f, T.ArrayType(T.DoubleType()))
                    for f in HOURLY_FIELDS
                ]
            ),
        ),
    ]
)

#: Reference time format `%Y-%m-%dT%H:%M` (stg sql:39) in JDK form.
TIME_FORMAT = "yyyy-MM-dd'T'HH:mm"

RAW_COLUMNS = ("timestamp", "location", "data")


def stg_swell_hourly(raw: DataFrame) -> DataFrame:
    """JSON payload rows → one typed row per hourly observation (≙ stg sql)."""
    payload = F.from_json(F.col("data"), PAYLOAD_SCHEMA).alias("p")
    zipped = F.arrays_zip(
        F.col("p.hourly.time").alias("time"),
        *[F.col(f"p.hourly.{f}").alias(f) for f in HOURLY_FIELDS],
    )
    return (
        raw.select("timestamp", "location", payload)
        .select("location", F.explode(zipped).alias("h"))
        .select(
            F.to_timestamp(F.col("h.time"), TIME_FORMAT).alias("timestamp"),
            F.col("location"),
            *[F.col(f"h.{f}").cast("double").alias(f) for f in HOURLY_FIELDS],
        )
        .withColumn("dt", F.col("timestamp").cast("date"))
    )


def int_daily_max_swell(stg: DataFrame) -> DataFrame:
    """Top-1-per-(day, location) by swell height, ties → latest timestamp
    (≙ int sql:10-30, exact 2-key ordering int:14-15)."""
    w = Window.partitionBy("dt", "location").orderBy(
        F.desc("swell_wave_height"), F.desc("timestamp")
    )
    return (
        stg.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def pres_daily_max_swell(intm: DataFrame) -> DataFrame:
    """Passthrough projection (≙ pres sql:10-19)."""
    return intm.select(
        "timestamp",
        "location",
        *HOURLY_FIELDS,
        "dt",
    )


def build_registry(raw_provider) -> Registry:
    """Assemble the three-layer pipeline as a Registry.

    ``raw_provider(spark) -> DataFrame`` supplies the raw swell table
    (production: parquet append table; tests: synthesized fixture).
    """
    reg = Registry()
    reg.source("raw_swell_data", lambda _r, spark: raw_provider(spark))

    @reg.model(
        "stg_swell_hourly",
        deps=("raw_swell_data",),
        materialization="view",
        group="swell_data",
    )
    def _stg(r: Registry, _s: SparkSession) -> DataFrame:
        return stg_swell_hourly(r.ref("raw_swell_data"))

    @reg.model(
        "int_daily_max_swell",
        deps=("stg_swell_hourly",),
        materialization="view",
        group="swell_data",
        tests=(not_null("dt"), not_null("location")),
    )
    def _int(r: Registry, _s: SparkSession) -> DataFrame:
        return int_daily_max_swell(r.ref("stg_swell_hourly"))

    @reg.model(
        "pres_daily_max_swell",
        deps=("int_daily_max_swell",),
        materialization="table",
        group="swell_data",
        partition_by=("dt",),
    )
    def _pres(r: Registry, _s: SparkSession) -> DataFrame:
        return pres_daily_max_swell(r.ref("int_daily_max_swell"))

    return reg


# ------------------------------------------------------------------ fixture
def synthesize_raw_payloads(
    locations: dict[str, tuple[float, float]] | None = None,
    n_ingest_days: int = 3,
    payload_hours: int = 48,
) -> list[tuple[str, str, str]]:
    """Deterministic reference-shaped fixture rows (FIXTURES.md §A recipe):
    includes a mid-array null, an exact swell-height tie within one
    (day, location), and overlapping payload date ranges across runs."""
    locations = locations or {
        "oceanside": (33.1505, -117.3483),
        "trestles": (33.3828, -117.5931),
        "mavericks": (37.4936, -122.5010),
    }
    rows: list[tuple[str, str, str]] = []
    for day in range(n_ingest_days):
        for li, (loc, (lat, lon)) in enumerate(sorted(locations.items())):
            rows.append(payload_row(day, li, loc, lat, lon, payload_hours))
    return rows


def payload_row(
    day: int,
    li: int,
    loc: str,
    lat: float,
    lon: float,
    payload_hours: int = 48,
) -> tuple[str, str, str]:
    """One deterministic (ingest_ts, location, payload-JSON) row — the unit
    both the fixture above and the Python DataSource (sources/pyds.py)
    generate, so a DataSource partition can produce exactly its own row."""
    ingest_ts = f"2026-08-{10 + day:02d} 06:00:00"
    start_day = 10 + day  # overlapping 48h windows across runs
    times, series = [], {f: [] for f in HOURLY_FIELDS}
    for h in range(payload_hours):
        d, hh = start_day + h // 24, h % 24
        times.append(f"2026-08-{d:02d}T{hh:02d}:00")
        base = ((h * 7 + li * 13 + day * 3) % 40) / 10.0
        for fi, f in enumerate(HOURLY_FIELDS):
            if f == "wave_height" and h == 5:
                series[f].append(None)  # mid-array null (recipe a)
            elif f == "swell_wave_height":
                # exact tie at hours 3 and 9, above every base value,
                # so the argmax must use the timestamp tie-break
                # (recipe b; int sql:14-15)
                v = 9.9 if h in (3, 9) else base
                series[f].append(v)
            else:
                series[f].append(round(base * (fi + 1) + fi, 2))
    payload = {
        "latitude": lat,
        "longitude": lon,
        "timezone": "America/Los_Angeles",
        "hourly": {"time": times, **series},
    }
    return (ingest_ts, loc, json.dumps(payload))


def synthesize_raw_swell(spark: SparkSession, **kw) -> DataFrame:
    rows = synthesize_raw_payloads(**kw)
    schema = T.StructType(
        [
            T.StructField("timestamp", T.StringType()),
            T.StructField("location", T.StringType()),
            T.StructField("data", T.StringType()),
        ]
    )
    df = spark.createDataFrame(rows, schema)
    return df.withColumn("timestamp", F.to_timestamp("timestamp"))
