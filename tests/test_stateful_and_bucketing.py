"""applyInPandasWithState cross-run state + bucketed shuffle-free joins."""

from pyspark.sql import functions as F

from local_data_pipeline_spark.operators.bucketing import colocated_join, write_bucketed
from local_data_pipeline_spark.plans.inspect import shuffle_exchange_count
from local_data_pipeline_spark.session import load_table
from local_data_pipeline_spark.streaming.stateful import run_running_user_totals

EVENTS_DDL = "event_id long, user_id long, ts timestamp, value double"


def _write_events(spark, path, rows):
    spark.createDataFrame(rows, "event_id long, user_id long, ts string, value double").select(
        "event_id", "user_id", F.col("ts").cast("timestamp").alias("ts"), "value"
    ).write.mode("append").parquet(path)


def test_stateful_totals_persist_across_runs(spark, tmp_path):
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    schema = spark.createDataFrame([], EVENTS_DDL).schema
    _write_events(
        spark,
        src,
        [(1, 10, "2026-01-01 10:00:00", 1.5), (2, 10, "2026-01-01 10:05:00", 2.5),
         (3, 20, "2026-01-01 10:10:00", 4.0)],
    )
    run_running_user_totals(spark, src, out, ckpt, schema)
    first = {r.user_id: (r.n_events, r.sum_value) for r in spark.read.parquet(out).collect()}
    assert first == {10: (2, 4.0), 20: (1, 4.0)}

    # new events arrive; a second AvailableNow run CONTINUES the state
    _write_events(spark, src, [(4, 10, "2026-01-01 11:00:00", 6.0)])
    run_running_user_totals(spark, src, out, ckpt, schema)
    rows = spark.read.parquet(out).collect()
    latest_u10 = max((r for r in rows if r.user_id == 10), key=lambda r: r.n_events)
    assert (latest_u10.n_events, latest_u10.sum_value) == (3, 10.0)


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").withColumnRenamed("o_orderkey", "l_orderkey")
    write_bucketed(li, "b_lineitem", ["l_orderkey"], n_buckets=8)
    write_bucketed(o, "b_orders", ["l_orderkey"], n_buckets=8)
    joined = colocated_join(spark, "b_lineitem", "b_orders", ["l_orderkey"])
    assert shuffle_exchange_count(joined) == 0
    # and it still computes the right thing
    plain = li.join(
        load_table(spark, sf_dir, "orders"),
        li.l_orderkey == F.col("o_orderkey"),
    )
    assert joined.count() == plain.count() > 0
    # aggregation on the bucket key is also exchange-free
    agg = spark.table("b_lineitem").groupBy("l_orderkey").count()
    assert shuffle_exchange_count(agg) == 0


def test_streaming_sessionizer_stitches_across_batches(spark, tmp_path):
    from local_data_pipeline_spark.streaming.stateful import run_streaming_sessionizer

    src, out, ckpt = (str(tmp_path / d) for d in ("ssrc", "sout", "sckpt"))
    schema = spark.createDataFrame([], EVENTS_DDL).schema
    # batch 1: one session 10:00-10:05, then a gap, open session at 11:00
    _write_events(
        spark,
        src,
        [(1, 10, "2026-01-01 10:00:00", 1.0), (2, 10, "2026-01-01 10:05:00", 2.0),
         (3, 10, "2026-01-01 11:00:00", 3.0)],
    )
    run_streaming_sessionizer(spark, src, out, ckpt, schema, gap_seconds=1800)
    got1 = spark.read.parquet(out).collect()
    assert len(got1) == 1  # only the CLOSED session is emitted
    assert (got1[0].n_events, got1[0].sum_value) == (2, 3.0)

    # batch 2: 11:05 continues the OPEN session from batch 1 (stitched via
    # state), then 13:00 closes it
    _write_events(
        spark, src,
        [(4, 10, "2026-01-01 11:05:00", 4.0), (5, 10, "2026-01-01 13:00:00", 9.0)],
    )
    run_streaming_sessionizer(spark, src, out, ckpt, schema, gap_seconds=1800)
    rows = sorted(spark.read.parquet(out).collect(), key=lambda r: r.session_start_us)
    assert len(rows) == 2
    stitched = rows[1]
    assert stitched.n_events == 2  # 11:00 (batch 1) + 11:05 (batch 2)
    assert stitched.sum_value == 7.0


def test_transform_with_state_matches_apply_in_pandas_with_state(spark, tmp_path):
    """The Spark 4.x transformWithStateInPandas port of the running-totals
    operator must produce the same totals and equally persist state
    across AvailableNow runs (RocksDB provider). Skips where protobuf
    (the API's state-server protocol dependency) is not installed."""
    import pytest

    pytest.importorskip("google.protobuf.descriptor")
    from local_data_pipeline_spark.streaming.stateful import (
        run_running_user_totals_tws,
    )

    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    schema = spark.createDataFrame([], EVENTS_DDL).schema
    _write_events(
        spark,
        src,
        [(1, 10, "2026-01-01 10:00:00", 1.5), (2, 10, "2026-01-01 10:05:00", 2.5),
         (3, 20, "2026-01-01 10:10:00", 4.0)],
    )
    run_running_user_totals_tws(spark, src, out, ckpt, schema)
    first = {r.user_id: (r.n_events, r.sum_value) for r in spark.read.parquet(out).collect()}
    assert first == {10: (2, 4.0), 20: (1, 4.0)}

    _write_events(spark, src, [(4, 10, "2026-01-01 11:00:00", 6.0)])
    run_running_user_totals_tws(spark, src, out, ckpt, schema)
    rows = spark.read.parquet(out).collect()
    latest_u10 = max((r for r in rows if r.user_id == 10), key=lambda r: r.n_events)
    assert (latest_u10.n_events, latest_u10.sum_value) == (3, 10.0)


def test_streaming_ewma_continues_recurrence_across_runs(spark, tmp_path):
    """The streaming EWMA must equal the sequential recurrence over the
    FULL event history even when events arrive across two AvailableNow
    runs — state carries the smoothed value, no history reprocessing."""
    from local_data_pipeline_spark.streaming.stateful import run_streaming_ewma

    src, out, ckpt = (str(tmp_path / d) for d in ("esrc", "eout", "eckpt"))
    schema = spark.createDataFrame([], EVENTS_DDL).schema
    batch1 = [
        (1, 10, "2026-01-01 10:00:00", 4.0),
        (2, 10, "2026-01-01 10:05:00", 8.0),
        (3, 20, "2026-01-01 10:10:00", 2.0),
    ]
    batch2 = [
        (4, 10, "2026-01-01 11:00:00", 16.0),
        (5, 20, "2026-01-01 11:05:00", 10.0),
    ]
    _write_events(spark, src, batch1)
    run_streaming_ewma(spark, src, out, ckpt, schema, alpha=0.5)
    _write_events(spark, src, batch2)
    run_streaming_ewma(spark, src, out, ckpt, schema, alpha=0.5)

    rows = spark.read.parquet(out).collect()
    latest = {}
    for r in rows:
        if r.user_id not in latest or r.n_events > latest[r.user_id].n_events:
            latest[r.user_id] = r

    def seq_ewma(values, alpha=0.5):
        e = None
        for v in values:
            e = v if e is None else alpha * v + (1 - alpha) * e
        return e

    assert latest[10].n_events == 3
    assert latest[10].ewma_value == seq_ewma([4.0, 8.0, 16.0])
    assert latest[20].n_events == 2
    assert latest[20].ewma_value == seq_ewma([2.0, 10.0])
