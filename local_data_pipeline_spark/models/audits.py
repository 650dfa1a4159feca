"""Governance-audit pipeline: the round-6 audit queries packaged as
registry models with dbt-style data tests — the same build/test/schedule
semantics the reference applies to its swell models
(`src/dagster_pipeline/defs/dbt_defs.py:27` `dbt build`;
`dbt/models/intermediate/_int_open_meteo.yml:9-16` `not_null` tests),
applied to warehouse-wide quality: FK integrity, expectation suites, and
the catalog null profile.

The audits themselves are the oracle-checked query functions in
``queries.py``; this module binds them into a DAG a scheduler runs
nightly, with data tests that GATE the build — an orphaned FK or an
unexpected expectation failure raises after materialization, exactly
like a failing dbt test."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..registry import Registry, no_rows_where, not_null


def build_audit_registry(sf_dir: str) -> Registry:
    """Assemble the audit DAG over the parquet warehouse at ``sf_dir``.

    Models:
      - ``audit_fk_integrity`` — orphan counts per FK edge; test: no edge
        may report orphans.
      - ``audit_expectations`` — the lineitem expectation suite; test: no
        failures outside the documented generator defect (duplicate
        (orderkey, linenumber) pairs — tracked, not gating).
      - ``audit_null_profile`` — catalog-wide null stats; tests: profile
        is complete (no null cells) and no column is majority-null.
    """
    from ..queries import QUERIES

    reg = Registry()

    @reg.model(
        "audit_fk_integrity",
        materialization="table",
        group="governance",
        description="Orphan counts for every FK edge in the star schema",
        tests=(no_rows_where("fk_no_orphans", "NOT ok"),),
    )
    def _fk(_r: Registry, spark: SparkSession) -> DataFrame:
        return QUERIES["fk_integrity_audit"].fn(spark, sf_dir)

    @reg.model(
        "audit_expectations",
        materialization="table",
        group="governance",
        description="Range/domain/null/uniqueness expectation suite over lineitem",
        tests=(
            no_rows_where(
                "expectations_pass",
                "NOT pass AND expectation != 'orderkey_linenumber_unique'",
            ),
        ),
    )
    def _exp(_r: Registry, spark: SparkSession) -> DataFrame:
        return QUERIES["expectation_audit_lineitem"].fn(spark, sf_dir)

    @reg.model(
        "audit_null_profile",
        materialization="table",
        group="governance",
        description="Null fraction for every (table, column) in the catalog",
        tests=(
            not_null("null_frac"),
            no_rows_where("no_majority_null_column", "null_frac > 0.5"),
        ),
    )
    def _nulls(_r: Registry, spark: SparkSession) -> DataFrame:
        return QUERIES["null_profile_all_tables"].fn(spark, sf_dir)

    return reg


def nightly_audit_job(sf_dir: str, cron: str = "0 2 * * *"):
    """The governance audits as a scheduled job (≙ the reference's
    `define_asset_job` + `ScheduleDefinition`, `schedules.py:10-23`) —
    nightly at 02:00 by default, after the 00:00/01:00 ingest/transform
    schedules the reference stages, so audits always see the fresh
    build."""
    from ..scheduler import Job

    return Job(name="nightly_audits", registry=build_audit_registry(sf_dir), cron=cron)
