"""Golden end-to-end test of the reference-parity swell pipeline:
raw JSON payload rows -> hourly explosion -> daily max, verified against
DuckDB running the reference SQL semantics verbatim (SURVEY.md §5)."""

import duckdb
from pyspark.sql import functions as F
import pytest

from local_data_pipeline_spark.models.swell import (
    build_registry,
    synthesize_raw_payloads,
    synthesize_raw_swell,
    stg_swell_hourly,
    int_daily_max_swell,
)

# The reference staging/intermediate SQL re-expressed for DuckDB over the
# same fixture rows (reference: stg_open_meteo__swell_data.sql,
# int_open_meteo__max_swell_per_day.sql).
DUCK_STG = """
with raw as (select location, json(data) as j from raw_swell),
arrays as (
  select location,
         json_extract(j, '$.hourly.time') as times_json,
         json_extract(j, '$.hourly.wave_height') as wave_height_json,
         json_extract(j, '$.hourly.wave_direction') as wave_direction_json,
         json_extract(j, '$.hourly.wind_wave_direction') as wind_wave_direction_json,
         json_extract(j, '$.hourly.swell_wave_height') as swell_wave_height_json,
         json_extract(j, '$.hourly.swell_wave_direction') as swell_wave_direction_json,
         json_extract(j, '$.hourly.swell_wave_period') as swell_wave_period_json,
         cast(json_array_length(json_extract(j, '$.hourly.time')) as bigint) as n
  from raw
),
indexed as (
  select *, unnest(range(0, n)) as i from arrays
),
exploded as (
  select a.location,
         json_extract_string(a.times_json, printf('$[%d]', i)) as time_str,
         cast(json_extract(a.wave_height_json, printf('$[%d]', i)) as double) as wave_height,
         cast(json_extract(a.wave_direction_json, printf('$[%d]', i)) as double) as wave_direction,
         cast(json_extract(a.wind_wave_direction_json, printf('$[%d]', i)) as double) as wind_wave_direction,
         cast(json_extract(a.swell_wave_height_json, printf('$[%d]', i)) as double) as swell_wave_height,
         cast(json_extract(a.swell_wave_direction_json, printf('$[%d]', i)) as double) as swell_wave_direction,
         cast(json_extract(a.swell_wave_period_json, printf('$[%d]', i)) as double) as swell_wave_period
  from indexed a
)
select strptime(time_str, '%Y-%m-%dT%H:%M') as timestamp, location,
       wave_height, wave_direction, wind_wave_direction,
       swell_wave_height, swell_wave_direction, swell_wave_period,
       cast(strptime(time_str, '%Y-%m-%dT%H:%M') as date) as dt
from exploded
"""

DUCK_INT = f"""
with stg as ({DUCK_STG}),
ranked as (
  select *, row_number() over (
    partition by dt, location
    order by swell_wave_height desc, timestamp desc) as rn
  from stg
)
select timestamp, location, wave_height, wave_direction, wind_wave_direction,
       swell_wave_height, swell_wave_direction, swell_wave_period, dt
from ranked where rn = 1
"""


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    rows = synthesize_raw_payloads()
    con.execute("create table raw_swell(timestamp timestamp, location text, data text)")
    con.executemany("insert into raw_swell values (?, ?, ?)", rows)
    return con


def _normalize(rows):
    return sorted(
        (tuple(r) for r in rows),
        key=lambda r: tuple((v is None, v) for v in r),
    )


def test_stg_matches_reference_semantics(spark, duck):
    raw = synthesize_raw_swell(spark)
    got = _normalize([tuple(r) for r in stg_swell_hourly(raw).collect()])
    want = _normalize(duck.sql(DUCK_STG).fetchall())
    assert len(got) == len(want) and got == want


def test_int_daily_max_matches_reference_semantics(spark, duck):
    raw = synthesize_raw_swell(spark)
    got = _normalize([tuple(r) for r in int_daily_max_swell(stg_swell_hourly(raw)).collect()])
    want = _normalize(duck.sql(DUCK_INT).fetchall())
    assert got == want
    # exactly one row per (dt, location)
    keys = [(r[-1], r[1]) for r in got]
    assert len(keys) == len(set(keys))


def test_registry_build_runs_models_and_tests(spark):
    reg = build_registry(lambda s: synthesize_raw_swell(s))
    results = reg.build(spark)
    by_name = {r.model: r for r in results}
    assert by_name["pres_daily_max_swell"].rows > 0
    assert by_name["pres_daily_max_swell"].materialization == "table"
    assert all(r.ok for r in results)
    # view models registered as temp views, table model queryable
    assert spark.table("pres_daily_max_swell").count() == by_name["pres_daily_max_swell"].rows


def test_null_elements_survive_explosion(spark):
    raw = synthesize_raw_swell(spark)
    stg = stg_swell_hourly(raw)
    assert stg.filter("wave_height is null").count() > 0


def test_analytics_registry_pipeline(spark):
    from conftest import SF_DIR
    from local_data_pipeline_spark.models.analytics import build_analytics_registry

    reg = build_analytics_registry(SF_DIR)
    results = reg.build(spark)
    by = {r.model: r for r in results}
    assert all(r.ok for r in results)
    assert by["pres_user_daily"].rows > 0
    pres = spark.table("pres_user_daily")
    assert pres.filter("n_sessions > n_events").count() == 0
    # partitioned table: dt filter prunes
    from local_data_pipeline_spark.plans.inspect import physical_plan
    one_day = pres.filter(F.col("dt") == pres.agg(F.min("dt")).collect()[0][0])
    assert "PartitionFilters" in physical_plan(one_day)


def test_curation_pipeline_end_to_end(spark):
    from conftest import SF_DIR
    from local_data_pipeline_spark.models.curation import build_curation_registry

    reg = build_curation_registry(SF_DIR)
    results = reg.build(spark)
    assert all(r.ok for r in results)
    curated = spark.table("pres_curated_docs")
    raw_n = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    n = curated.count()
    assert 0 < n <= raw_n
    # every gate actually held
    assert curated.filter("n_tokens < 30 or quality < 0.5").count() == 0
    assert curated.filter("lang not in ('en','es','fr','de','zh')").count() == 0


def test_incremental_materialization(spark):
    import itertools

    from local_data_pipeline_spark.registry import Registry

    counter = itertools.count()
    batches = [
        [(1, "2026-01-01 10:00:00", 1.0), (2, "2026-01-01 11:00:00", 2.0)],
        # batch 2 re-contains old rows (full source) + genuinely new ones
        [(1, "2026-01-01 10:00:00", 1.0), (2, "2026-01-01 11:00:00", 2.0),
         (3, "2026-01-02 09:00:00", 3.0)],
    ]

    def make_reg(batch):
        reg = Registry()
        reg.source("src_inc", lambda _r, s: s.createDataFrame(
            batch, "id long, ts string, v double"
        ).select("id", F.col("ts").cast("timestamp").alias("ts"), "v"))

        @reg.model("inc_events", deps=("src_inc",), materialization="incremental",
                   incremental_col="ts")
        def _m(r, _s):
            return r.ref("src_inc")
        return reg

    spark.sql("DROP TABLE IF EXISTS inc_events")
    make_reg(batches[0]).build(spark)
    assert spark.table("inc_events").count() == 2
    # second build sees the FULL source again but appends only ts > max(ts)
    make_reg(batches[1]).build(spark)
    rows = spark.table("inc_events").collect()
    assert len(rows) == 3  # no duplicates of rows 1-2
    assert {r.id for r in rows} == {1, 2, 3}


def test_incremental_requires_watermark_column(spark):
    from local_data_pipeline_spark.registry import Registry

    reg = Registry()
    with pytest.raises(ValueError, match="incremental_col"):
        @reg.model("bad_inc", materialization="incremental")
        def _m(r, s): ...


def test_run_all_builds_every_pipeline(spark):
    import local_data_pipeline_spark as eng

    results = eng.run_all(spark)
    assert set(results) == {"swell", "analytics", "quality", "curation"}
    for pipeline, rs in results.items():
        assert all(r.ok for r in rs), pipeline
    assert spark.table("pres_daily_max_swell").count() > 0
    assert spark.table("pres_user_daily").count() > 0
    assert spark.table("pres_curated_docs").count() >= 0


def test_build_select_pulls_upstream_deps(spark):
    reg = build_registry(lambda s: synthesize_raw_swell(s))
    results = reg.build(spark, select=["int_daily_max_swell"])
    names = [r.model for r in results]
    # upstream closure included automatically, downstream excluded
    assert "raw_swell_data" in names and "stg_swell_hourly" in names
    assert "pres_daily_max_swell" not in names

    import pytest as _pytest
    with _pytest.raises(ValueError, match="unknown model"):
        reg.build(spark, select=["nope"])


def test_manifest_and_docs_export(spark):
    """The manifest (dbt manifest.json analog) lists every model in topo
    order with deps/tests intact, and the docs renderer includes the
    lineage arrows and descriptions."""
    from local_data_pipeline_spark.models.swell import (
        build_registry,
        synthesize_raw_swell,
    )

    reg = build_registry(lambda s: synthesize_raw_swell(s))
    man = reg.manifest()
    names = [m["name"] for m in man["models"]]
    assert names.index("stg_swell_hourly") < names.index("int_daily_max_swell")
    assert names.index("int_daily_max_swell") < names.index("pres_daily_max_swell")
    by_name = {m["name"]: m for m in man["models"]}
    assert by_name["int_daily_max_swell"]["deps"] == ["stg_swell_hourly"]
    assert set(by_name["int_daily_max_swell"]["tests"]) == {
        "not_null(dt)",
        "not_null(location)",
    }
    assert by_name["pres_daily_max_swell"]["materialization"] == "table"
    docs = reg.docs_markdown()
    assert "## int_daily_max_swell" in docs and "← stg_swell_hourly" in docs
