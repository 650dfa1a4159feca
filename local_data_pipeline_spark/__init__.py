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
]
