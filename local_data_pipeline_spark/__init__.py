"""local_data_pipeline_spark — PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of
`natekandler/local_data_pipeline` (Dagster + dbt + DuckDB), re-expressed
Spark-first: DataFrame/Spark-SQL plans optimized by Catalyst, a model
registry replacing dbt+Dagster, and an extended LLM-data-pipeline operator
surface (dedup, similarity search, text analysis, multimodal, event
windowing) designed for 100 TB scale. See SURVEY.md.
"""

from .session import get_spark, load_table, load_all, register_views, TABLES
from .registry import Registry, not_null, unique, accepted_values

__all__ = [
    "get_spark",
    "load_table",
    "load_all",
    "register_views",
    "TABLES",
    "Registry",
    "not_null",
    "unique",
    "accepted_values",
    "run_all",
]


def run_all(spark, sf_dir: str = "/root/testdata/sf0.001"):
    """Build every registered pipeline in topo order (≙ the reference's
    nightly all-assets job, schedules.py:10-14): swell parity, event
    analytics, quality checks, and document curation. Returns
    {pipeline: [BuildResult]}."""
    from .models.analytics import build_analytics_registry
    from .models.curation import build_curation_registry
    from .models.quality import build_quality_registry
    from .models.swell import build_registry, synthesize_raw_swell

    return {
        "swell": build_registry(lambda s: synthesize_raw_swell(s)).build(spark),
        "analytics": build_analytics_registry(sf_dir).build(spark),
        "quality": build_quality_registry(sf_dir).build(spark),
        "curation": build_curation_registry(sf_dir).build(spark),
    }
