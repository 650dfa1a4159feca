"""REST ingestion source: the engine's version of the reference's
ingestion asset (`/root/reference/src/dagster_pipeline/defs/open_meteo.py`).

Reproduces the semantics of A1-A8 (SURVEY §2.A):

- ``fetch_wave_data(lat, lon)`` → GET the Open-Meteo Marine API with the
  fixed hourly field list, 60 s timeout, raise on HTTP error
  (open_meteo.py:18-38). The HTTP getter is injectable so tests run with
  canned payloads and no network.
- one (timestamp, location, data-JSON) row per (run, location)
  (open_meteo.py:48-91), fan-out over a static location dict
  (open_meteo.py:16,106-108 — ordered tuples here; the reference's set
  literals have hash-dependent iteration order, SURVEY §1.2 quirk).
- append to the ``raw`` layer: Parquet-backed table, ``CREATE TABLE IF NOT
  EXISTS`` + append ≙ open_meteo.py:62-76.

100 TB note: driver-side fetching is correct for 3 locations; for large
location sets, put locations in a DataFrame and fetch with
``mapInPandas`` so HTTP fan-out runs on executors (``fetch_partition``).
"""

from __future__ import annotations

import json
import os
from typing import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

WAVE_API_URL = "https://marine-api.open-meteo.com/v1/marine"

#: Hourly fields requested from the API (≙ open_meteo.py:23-32).
HOURLY_PARAMS = (
    "wave_height",
    "wave_direction",
    "wind_wave_direction",
    "swell_wave_height",
    "swell_wave_direction",
    "swell_wave_period",
)

#: Named sites → (lat, lon). Ordered tuples, not sets (SURVEY §1.2).
DEFAULT_LOCATIONS: dict[str, tuple[float, float]] = {
    "oceanside": (33.1505, -117.3483),
    "trestles": (33.3828, -117.5931),
    "mavericks": (37.4936, -122.5010),
}

RAW_SCHEMA = T.StructType(
    [
        T.StructField("timestamp", T.TimestampType(), False),
        T.StructField("location", T.StringType(), False),
        T.StructField("data", T.StringType(), False),
    ]
)

HttpGet = Callable[[str, dict], dict]


def _default_http_get(url: str, params: dict) -> dict:
    """Real HTTP getter (requests if available, stdlib otherwise);
    60 s timeout and raise-on-error ≙ open_meteo.py:36-37."""
    try:
        import requests  # type: ignore

        resp = requests.get(url, params=params, timeout=60)
        resp.raise_for_status()
        return resp.json()
    except ImportError:
        import urllib.parse
        import urllib.request

        qs = urllib.parse.urlencode(params, doseq=True)
        with urllib.request.urlopen(f"{url}?{qs}", timeout=60) as r:
            return json.loads(r.read().decode())


def fetch_wave_data(
    latitude: float, longitude: float, http_get: HttpGet | None = None
) -> dict:
    """One API payload for one coordinate (≙ open_meteo.py:18-38)."""
    params = {
        "latitude": latitude,
        "longitude": longitude,
        "hourly": ",".join(HOURLY_PARAMS),
        "timezone": "auto",
    }
    return (http_get or _default_http_get)(WAVE_API_URL, params)


def ingest_locations(
    spark: SparkSession,
    locations: dict[str, tuple[float, float]] | None = None,
    http_get: HttpGet | None = None,
    raw_path: str | None = None,
    table: str = "raw.swell_data",
) -> DataFrame:
    """Fetch every location and append one raw row each (≙ A7/A8).

    Returns the appended batch. ``raw_path`` appends to a Parquet
    directory (streaming-readable, §streaming); otherwise appends to the
    catalog ``table``."""
    locations = locations or DEFAULT_LOCATIONS
    rows = []
    for location, (lat, lon) in locations.items():
        payload = fetch_wave_data(lat, lon, http_get)
        rows.append((location, json.dumps(payload)))
    batch = (
        spark.createDataFrame(rows, "location string, data string")
        .select(
            F.current_timestamp().alias("timestamp"),  # ≙ open_meteo.py:56
            "location",
            "data",
        )
    )
    if raw_path:
        batch.write.mode("append").parquet(raw_path)
    else:
        db = table.split(".")[0] if "." in table else None
        if db:
            spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")  # ≙ om:62
        batch.write.mode("append").saveAsTable(table)  # ≙ om:63-76
    return batch


def fetch_partition(
    locations_df: DataFrame, http_get: HttpGet | None = None
) -> DataFrame:
    """Executor-side fan-out: fetch per partition via mapInPandas — the
    scale path when the location set is itself a big table."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                payload = fetch_wave_data(row["lat"], row["lon"], http_get)
                out.append((row["location"], json.dumps(payload)))
            yield pd.DataFrame(out, columns=["location", "data"])

    fetched = locations_df.mapInPandas(run, "location string, data string")
    return fetched.select(
        F.current_timestamp().alias("timestamp"), "location", "data"
    )
