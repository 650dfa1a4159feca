"""Plan-quality pins: the scale properties we designed for, as assertions.

A failure here means a refactor changed the PHYSICAL plan for the worse
(dropped pushdown, broadcast became shuffle, extra exchange) even if the
results are still correct.
"""

from local_data_pipeline_spark.plans.inspect import (
    broadcast_join_count,
    has_pushed_filter,
    read_schemas,
    shuffle_exchange_count,
    uses_take_ordered,
    uses_window_group_limit,
)
from local_data_pipeline_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _df(spark, name):
    return QUERIES[name].fn(spark, SF)


def test_q1_filter_and_columns_reach_the_scan(spark):
    df = _df(spark, "q1_pricing_summary")
    assert has_pushed_filter(df, "l_shipdate")
    # projection pruning: scan must NOT read join keys it doesn't need
    (schema,) = read_schemas(df)
    assert "l_orderkey" not in schema and "l_partkey" not in schema


def test_q5_star_join_broadcasts_all_dims(spark):
    df = _df(spark, "q5_region_revenue")
    assert broadcast_join_count(df) == 4  # customer, nation, region + orders side
    # fact scan + final agg only: at most 2 shuffle exchanges (agg + AQE reads)
    assert shuffle_exchange_count(df) <= 2


def test_q3_orders_filter_pushed_and_broadcast(spark):
    df = _df(spark, "q3_shipping_priority")
    assert has_pushed_filter(df, "o_orderdate")
    assert has_pushed_filter(df, "l_shipdate")
    assert broadcast_join_count(df) >= 1
    assert uses_take_ordered(df)


def test_top10_avoids_global_sort(spark):
    assert uses_take_ordered(_df(spark, "top10_orders_by_price"))


def test_flagship_window_has_partial_top_k_and_one_shuffle(spark):
    df = _df(spark, "daily_max_event")
    assert uses_window_group_limit(df)  # rank<=1 applied map-side pre-shuffle
    assert shuffle_exchange_count(df) == 1  # exactly the (dt,event_type) hash


def test_semi_anti_joins_broadcast(spark):
    assert broadcast_join_count(_df(spark, "semi_join_customers_with_orders")) >= 1
    assert broadcast_join_count(_df(spark, "anti_join_customers_without_orders")) >= 1


def test_join_hints_change_physical_strategy(spark):
    """Join strategy hints: the engine exposes Catalyst's full join-
    strategy surface (broadcast/merge/shuffle_hash)."""
    from local_data_pipeline_spark.plans.inspect import count_op
    from local_data_pipeline_spark.session import load_table

    li = load_table(spark, SF, "lineitem")
    o = load_table(spark, SF, "orders")
    merge = li.join(o.hint("merge"), li.l_orderkey == o.o_orderkey)
    assert count_op(merge, "SortMergeJoin") >= 1
    shash = li.join(o.hint("shuffle_hash"), li.l_orderkey == o.o_orderkey)
    assert count_op(shash, "ShuffledHashJoin") >= 1
    bcast = li.join(o.hint("broadcast"), li.l_orderkey == o.o_orderkey)
    assert count_op(bcast, "BroadcastHashJoin") >= 1
