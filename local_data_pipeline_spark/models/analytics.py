"""Second registry pipeline: event analytics over the driver warehouse.

Demonstrates the model registry as a general dbt/Dagster replacement
(beyond the swell parity pipeline): a three-layer DAG over ``events`` —

  stg_events      (view)  typed/enriched event rows + JSON extraction
  int_sessions    (view)  gap-based sessionization (30 min)
  pres_user_daily (table) per-(user, day) engagement rollup, partitioned
                          by event date for downstream pruning

with dbt-style data tests at each layer, exactly the reference's
staging → intermediate → presentation materialization ladder
(`/root/reference/dbt/dbt_project.yml:8-22`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import dsum
from ..operators.windows import sessionize
from ..registry import Registry, not_null, unique
from ..session import load_table


def build_analytics_registry(sf_dir: str) -> Registry:
    reg = Registry()

    reg.source("raw_events", lambda _r, spark: load_table(spark, sf_dir, "events"))

    @reg.model(
        "stg_events",
        deps=("raw_events",),
        materialization="view",
        group="events",
        tests=(not_null("event_id"), unique("event_id"), not_null("ts")),
    )
    def _stg(r: Registry, _s: SparkSession) -> DataFrame:
        ev = r.ref("raw_events")
        return ev.select(
            "event_id",
            "user_id",
            "ts",
            "event_type",
            "value",
            F.get_json_object("props", "$.k").cast("bigint").alias("prop_k"),
            F.col("ts").cast("date").alias("dt"),
        )

    @reg.model(
        "int_sessions",
        deps=("stg_events",),
        materialization="view",
        group="events",
        tests=(not_null("session_id"),),
    )
    def _sessions(r: Registry, _s: SparkSession) -> DataFrame:
        return sessionize(
            r.ref("stg_events"), ts="ts", entity="user_id", gap="30 minutes"
        )

    @reg.model(
        "pres_user_daily",
        deps=("int_sessions",),
        materialization="table",
        group="events",
        partition_by=("dt",),
        tests=(not_null("user_id"), not_null("dt"), unique(["user_id", "dt"])),
    )
    def _pres(r: Registry, _s: SparkSession) -> DataFrame:
        s = r.ref("int_sessions")
        return s.groupBy("user_id", "dt").agg(
            F.count("*").alias("n_events"),
            F.countDistinct("session_id").alias("n_sessions"),
            dsum("value").alias("sum_value"),
            F.max("value").alias("max_value"),
            F.min("ts").alias("first_event"),
            F.max("ts").alias("last_event"),
        )

    return reg
