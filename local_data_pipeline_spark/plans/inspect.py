"""Physical-plan inspection helpers: make plan quality testable.

"Would this survive 100×?" is a plan property, not a benchmark number —
filter/column pushdown, broadcast-vs-shuffle joins, exchange counts and
partial top-k are all visible in the formatted physical plan. These
helpers let tests pin the plans we chose (tests/test_plans.py), so a
refactor that silently turns a broadcast join into a shuffle or drops a
pushed filter fails CI, not the cluster.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters lines from parquet scans."""
    return [
        line.strip()
        for line in physical_plan(df).splitlines()
        if "PushedFilters" in line
    ]


def has_pushed_filter(df: DataFrame, column: str) -> bool:
    return any(column in line for line in pushed_filters(df))


def read_schemas(df: DataFrame) -> list[str]:
    return [
        line.split("ReadSchema:", 1)[1].strip()
        for line in physical_plan(df).splitlines()
        if "ReadSchema:" in line
    ]


def count_op(df: DataFrame, op: str) -> int:
    """Count occurrences of a physical operator in the plan tree section."""
    plan = physical_plan(df)
    tree = plan.split("\n\n", 1)[0]  # tree part, before per-node details
    return sum(1 for line in tree.splitlines() if op in line)


def broadcast_join_count(df: DataFrame) -> int:
    return count_op(df, "BroadcastHashJoin")


def shuffle_exchange_count(df: DataFrame) -> int:
    """Shuffle exchanges only (broadcast exchanges excluded)."""
    plan = physical_plan(df)
    tree = plan.split("\n\n", 1)[0]
    return sum(
        1
        for line in tree.splitlines()
        if "Exchange" in line and "Broadcast" not in line
    )


def uses_take_ordered(df: DataFrame) -> bool:
    return "TakeOrderedAndProject" in physical_plan(df)


def uses_window_group_limit(df: DataFrame) -> bool:
    """Spark's partial top-k pushdown for rank-limit windows (3.5+)."""
    return "WindowGroupLimit" in physical_plan(df)
