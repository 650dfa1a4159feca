"""Ingestion adapter (A1-A8) and incremental streaming hop tests —
no network: canned payload injected through the HttpGet seam."""

import json

from pyspark.sql import functions as F

from local_data_pipeline_spark.models.swell import stg_swell_hourly
from local_data_pipeline_spark.sources import rest
from local_data_pipeline_spark.streaming.incremental import (
    incremental_stg_swell,
    run_windowed_event_stream,
)


def canned_payload(lat=33.0, lon=-117.0, hours=4, start_day=10):
    times = [f"2026-08-{start_day:02d}T{h:02d}:00" for h in range(hours)]
    mk = lambda base: [round(base + h * 0.1, 2) for h in range(hours)]
    return {
        "latitude": lat,
        "longitude": lon,
        "timezone": "America/Los_Angeles",
        "hourly": {
            "time": times,
            "wave_height": mk(1.0),
            "wave_direction": mk(270.0),
            "wind_wave_direction": mk(280.0),
            "swell_wave_height": mk(0.9),
            "swell_wave_direction": mk(265.0),
            "swell_wave_period": mk(14.0),
        },
    }


def fake_http_get(url, params):
    assert url == rest.WAVE_API_URL
    assert params["timezone"] == "auto"
    assert params["hourly"] == ",".join(rest.HOURLY_PARAMS)
    return canned_payload(params["latitude"], params["longitude"])


def test_fetch_wave_data_uses_injected_getter():
    payload = rest.fetch_wave_data(33.15, -117.35, http_get=fake_http_get)
    assert payload["latitude"] == 33.15
    assert len(payload["hourly"]["time"]) == 4


def test_ingest_appends_one_row_per_location(spark, tmp_path):
    raw = str(tmp_path / "raw")
    batch = rest.ingest_locations(
        spark,
        locations={"a": (1.0, 2.0), "b": (3.0, 4.0)},
        http_get=fake_http_get,
        raw_path=raw,
    )
    assert batch.count() == 2
    stored = spark.read.parquet(raw)
    assert stored.count() == 2
    assert set(stored.columns) == {"timestamp", "location", "data"}
    # payload round-trips as valid JSON and explodes in staging
    staged = stg_swell_hourly(stored)
    assert staged.count() == 8  # 2 locations x 4 hourly points
    # second ingest appends (never overwrites) — ≙ append-only raw table
    rest.ingest_locations(
        spark, locations={"a": (1.0, 2.0)}, http_get=fake_http_get, raw_path=raw
    )
    assert spark.read.parquet(raw).count() == 3


def test_executor_side_fetch_partition(spark):
    # self-contained getter: executors can't import this test module, so the
    # closure must not reference module-level names (cloudpickle by value)
    def standalone_get(url, params):
        return {
            "latitude": params["latitude"],
            "longitude": params["longitude"],
            "timezone": "UTC",
            "hourly": {"time": ["2026-08-10T00:00"], "wave_height": [1.0]},
        }

    locs = spark.createDataFrame(
        [("a", 1.0, 2.0), ("b", 3.0, 4.0)], "location string, lat double, lon double"
    )
    out = rest.fetch_partition(locs, http_get=standalone_get).collect()
    assert len(out) == 2
    assert json.loads(out[0]["data"])["hourly"]["time"]


def test_incremental_stg_processes_only_new_files(spark, tmp_path):
    raw, out, ckpt = (str(tmp_path / d) for d in ("raw", "out", "ckpt"))
    rest.ingest_locations(
        spark, locations={"a": (1.0, 2.0)}, http_get=fake_http_get, raw_path=raw
    )
    incremental_stg_swell(spark, raw, out, ckpt)
    assert spark.read.parquet(out).count() == 4
    # new batch arrives; rerun processes ONLY the new file
    rest.ingest_locations(
        spark, locations={"b": (3.0, 4.0)}, http_get=fake_http_get, raw_path=raw
    )
    incremental_stg_swell(spark, raw, out, ckpt)
    final = spark.read.parquet(out)
    assert final.count() == 8
    assert final.filter("location = 'b'").count() == 4
    # rerun with nothing new: no duplicates (checkpoint semantics)
    incremental_stg_swell(spark, raw, out, ckpt)
    assert spark.read.parquet(out).count() == 8


def test_windowed_event_stream_with_watermark(spark, tmp_path):
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "wout", "wckpt"))
    events = spark.createDataFrame(
        [
            (1, "2026-08-10 00:05:00", "click"),
            (2, "2026-08-10 00:55:00", "click"),
            (3, "2026-08-10 01:10:00", "view"),
            # sentinel far ahead: advances the watermark (2h behind max ts)
            # past the earlier windows so append mode finalizes them
            (4, "2026-08-10 06:00:00", "view"),
        ],
        "event_id long, ts string, event_type string",
    ).select("event_id", F.col("ts").cast("timestamp"), "event_type")
    events.write.parquet(src)
    run_windowed_event_stream(
        spark, src, out, ckpt, schema=events.schema, duration="1 hour"
    )
    got = {
        (str(r.window_start), r.event_type): r.n_events
        for r in spark.read.parquet(out).collect()
    }
    assert got[("2026-08-10 00:00:00", "click")] == 2
    assert got[("2026-08-10 01:00:00", "view")] == 1
    # the sentinel's own window is NOT finalized yet (watermark contract)
    assert ("2026-08-10 06:00:00", "view") not in got


def _stream_to_parquet(df, out, ckpt):
    (df.writeStream.format("parquet").option("path", out)
       .option("checkpointLocation", ckpt).outputMode("append")
       .trigger(availableNow=True).start().awaitTermination())


def test_streaming_dedup_within_watermark(spark, tmp_path):
    from local_data_pipeline_spark.streaming.incremental import streaming_dedup

    src, out, ckpt = (str(tmp_path / d) for d in ("dsrc", "dout", "dckpt"))
    rows = [
        (1, "2026-08-10 00:00:00", "click"),
        (1, "2026-08-10 00:01:00", "click"),   # duplicate event_id
        (2, "2026-08-10 00:02:00", "view"),
        (2, "2026-08-10 00:03:00", "view"),    # duplicate event_id
        (3, "2026-08-10 00:04:00", "click"),
    ]
    df = spark.createDataFrame(rows, "event_id long, ts string, event_type string").select(
        "event_id", F.col("ts").cast("timestamp").alias("ts"), "event_type"
    )
    df.write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    _stream_to_parquet(streaming_dedup(stream), out, ckpt)
    got = spark.read.parquet(out)
    assert got.count() == 3
    assert {r.event_id for r in got.collect()} == {1, 2, 3}


def test_stream_stream_interval_join(spark, tmp_path):
    from local_data_pipeline_spark.streaming.incremental import clicks_to_purchases_join

    src, out, ckpt = (str(tmp_path / d) for d in ("jsrc", "jout", "jckpt"))
    rows = [
        (1, 10, "2026-08-10 00:10:00", "click", 0.0),
        (2, 10, "2026-08-10 00:50:00", "click", 0.0),
        (3, 10, "2026-08-10 01:00:00", "purchase", 99.0),
        (4, 20, "2026-08-10 00:55:00", "click", 0.0),
        (5, 20, "2026-08-10 03:00:00", "purchase", 42.0),  # click outside 1h horizon
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, event_type string, value double"
    ).select("event_id", "user_id", F.col("ts").cast("timestamp").alias("ts"), "event_type", "value")
    df.write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    joined = clicks_to_purchases_join(
        stream.filter("event_type = 'click'"),
        stream.filter("event_type = 'purchase'"),
    )
    _stream_to_parquet(joined, out, ckpt)
    got = [(r.purchase_id, r.click_id) for r in spark.read.parquet(out).collect()]
    # purchase 3 joins clicks 1 (50 min before) and 2 (10 min before);
    # purchase 5's only click is 2h05m earlier -> outside horizon
    assert sorted(got) == [(3, 1), (3, 2)]


def test_stream_upsert_foreachbatch(spark, tmp_path):
    from local_data_pipeline_spark.streaming.incremental import run_stream_upsert

    src, tbl, ckpt = (str(tmp_path / d) for d in ("usrc", "utbl", "uckpt"))
    v1 = spark.createDataFrame(
        [(1, "a", "p1"), (2, "b", "p2")], "id long, v string, part string"
    )
    v1.write.mode("append").parquet(src)
    run_stream_upsert(spark, src, tbl, ckpt, v1.schema, key="id", partition_col="part")
    assert {(r.id, r.v) for r in spark.read.parquet(tbl).collect()} == {(1, "a"), (2, "b")}

    # batch 2 updates key 1 and inserts key 3 — merged, not appended
    spark.createDataFrame([(1, "A2", "p1"), (3, "c", "p1")], v1.schema).write.mode(
        "append"
    ).parquet(src)
    run_stream_upsert(spark, src, tbl, ckpt, v1.schema, key="id", partition_col="part")
    got = {(r.id, r.v) for r in spark.read.parquet(tbl).collect()}
    assert got == {(1, "A2"), (2, "b"), (3, "c")}


def test_native_session_window_stream(spark, tmp_path):
    """Native session_window: out-of-order events within the gap merge
    into ONE session; a quiet gap splits sessions; only sessions closed
    by the watermark emit (the far-ahead sentinel closes them)."""
    from local_data_pipeline_spark.streaming.incremental import (
        run_session_window_stream,
    )

    src, out, ckpt = (str(tmp_path / d) for d in ("ssrc", "sout", "sckpt"))
    rows = [
        # user 1, session A: 00:00, 00:10 (out of order), 00:05
        (1, "2026-08-10 00:00:00", 1, "click", 1.0),
        (2, "2026-08-10 00:10:00", 1, "click", 2.0),
        (3, "2026-08-10 00:05:00", 1, "view", 4.0),
        # user 1, session B after a >30min gap
        (4, "2026-08-10 01:00:00", 1, "view", 8.0),
        # user 2, one session
        (5, "2026-08-10 00:20:00", 2, "click", 16.0),
        # sentinel far ahead advances the watermark past all of the above
        (6, "2026-08-10 09:00:00", 9, "click", 0.0),
    ]
    events = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double"
    ).select(
        "event_id", F.col("ts").cast("timestamp"), "user_id", "event_type", "value"
    )
    events.write.parquet(src)
    run_session_window_stream(spark, src, out, ckpt, schema=events.schema)
    got = {
        (r.user_id, str(r.session_start)): (r.n_events, r.session_value)
        for r in spark.read.parquet(out).collect()
    }
    # session A merged the out-of-order event: 3 events, ends 00:10+gap
    assert got[(1, "2026-08-10 00:00:00")] == (3, 7.0)
    # the >30 min quiet gap split a second session
    assert got[(1, "2026-08-10 01:00:00")] == (1, 8.0)
    assert got[(2, "2026-08-10 00:20:00")] == (1, 16.0)
    # the sentinel's own session is still open -> not emitted
    assert all(u != 9 for (u, _s) in got)


def test_python_datasource_batch_matches_fixture(spark):
    """The custom Python DataSource must produce exactly the fixture rows,
    one executor-side partition per (day, location) — the reference's
    driver loop turned into a parallel source."""
    from local_data_pipeline_spark.models.swell import synthesize_raw_payloads
    from local_data_pipeline_spark.sources.pyds import register

    register(spark)
    df = spark.read.format("swell_synth").option("n_ingest_days", 2).load()
    assert df.rdd.getNumPartitions() == 6  # 2 days x 3 locations
    got = sorted((r.timestamp, r.location, r.data) for r in df.collect())
    want = sorted(synthesize_raw_payloads(n_ingest_days=2))
    assert got == want


def test_python_datasource_stream_one_day_per_batch(spark, tmp_path):
    """Streaming reader: each AvailableNow trigger run processes ONE
    pending ingest day (the simple stream reader prefetches one batch
    per start — exactly the reference's one-fetch-per-cron-tick
    cadence); once all days are drained, further runs add nothing."""
    from local_data_pipeline_spark.sources.pyds import register

    register(spark)
    out, ckpt = str(tmp_path / "pout"), str(tmp_path / "pckpt")

    def drain():
        (
            spark.readStream.format("swell_synth")
            .option("n_ingest_days", 3)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )

    for want in (3, 6, 9):  # one day per run, offsets committed
        drain()
        assert spark.read.parquet(out).count() == want
    back = spark.read.parquet(out)
    assert back.select("location").distinct().count() == 3
    drain()  # fully drained: nothing new
    assert spark.read.parquet(out).count() == 9


def test_stream_static_broadcast_enrichment(spark, tmp_path):
    """Stream-static join: every micro-batch map-side joins the broadcast
    dim with no streaming join state; rows with no dim match survive
    (left join) with nulls."""
    from local_data_pipeline_spark.streaming.incremental import enrich_with_static_dim

    src, out, ckpt = (str(tmp_path / d) for d in ("ssrc", "sout", "sckpt"))
    rows = [
        (1, "click", 1.0),
        (2, "view", 2.0),
        (3, "purchase", 3.0),
        (4, "scroll", 4.0),  # not in dim -> null weight
    ]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    df.write.parquet(src)
    dim = spark.createDataFrame(
        [("click", 0.5), ("view", 0.1), ("purchase", 5.0)],
        "event_type string, weight double",
    )
    stream = spark.readStream.schema(df.schema).parquet(src)
    _stream_to_parquet(enrich_with_static_dim(stream, dim), out, ckpt)
    got = {r.event_id: r.weight for r in spark.read.parquet(out).collect()}
    assert got == {1: 0.5, 2: 0.1, 3: 5.0, 4: None}


def test_streaming_agg_mv_incremental_and_replay_safe(spark, tmp_path):
    """The streaming continuous aggregate must (1) equal a batch
    recompute after two AvailableNow runs over a growing source dir and
    (2) skip already-applied batch ids on replay (additive merge must
    not double-count)."""
    import json
    import os

    from local_data_pipeline_spark.streaming.incremental import (
        run_streaming_agg_mv,
    )

    src = str(tmp_path / "src")
    mv = str(tmp_path / "mv")
    ckpt = str(tmp_path / "ckpt")
    schema = "k string, v double, dt string"
    df1 = spark.createDataFrame(
        [("a", 1.0, "d1"), ("a", 2.0, "d1"), ("b", 5.0, "d2")], schema
    )
    df1.write.mode("append").parquet(src)
    run_streaming_agg_mv(
        spark, src, mv, ckpt, schema,
        group_cols=["dt", "k"], partition_col="dt",
        sum_cols={"sv": "v"},
    )
    df2 = spark.createDataFrame([("a", 10.0, "d1"), ("c", 7.0, "d3")], schema)
    df2.write.mode("append").parquet(src)
    run_streaming_agg_mv(
        spark, src, mv, ckpt, schema,
        group_cols=["dt", "k"], partition_col="dt",
        sum_cols={"sv": "v"},
    )
    got = {
        (r["dt"], r["k"]): (r["n"], float(r["sv"]))
        for r in spark.read.parquet(mv).collect()
    }
    assert got == {
        ("d1", "a"): (3, 13.0),
        ("d2", "b"): (1, 5.0),
        ("d3", "c"): (1, 7.0),
    }
    # replay safety: rewind the ledger? no — simulate a RETRY of the last
    # batch by calling the merge path again with the same ledger state:
    # a third run with no new files must not change the MV
    run_streaming_agg_mv(
        spark, src, mv, ckpt, schema,
        group_cols=["dt", "k"], partition_col="dt",
        sum_cols={"sv": "v"},
    )
    again = {
        (r["dt"], r["k"]): (r["n"], float(r["sv"]))
        for r in spark.read.parquet(mv).collect()
    }
    assert again == got
    ledger = mv + "._applied_batches.json"
    assert os.path.exists(ledger)
    assert json.load(open(ledger))["max_batch_id"] >= 1


def test_python_datasource_writer_jsonl_sink(spark, tmp_path):
    """The write half of the Python DataSource surface: per-task jsonl
    files (distributed, no driver row path), driver commit writes a
    _SUCCESS manifest whose file rowcounts sum to the input."""
    import glob
    import json as _json

    from local_data_pipeline_spark.sources.pyds import register

    register(spark)
    d = str(tmp_path / "sink")
    df = spark.range(100).selectExpr("id", "concat('v', id) AS v").repartition(4)
    df.write.format("jsonl_sink").option("path", d).mode("append").save()

    files = sorted(glob.glob(d + "/part-*.jsonl"))
    assert len(files) == 4  # one file per task
    rows = [_json.loads(line) for f in files for line in open(f)]
    assert sorted(r["id"] for r in rows) == list(range(100))
    assert {r["v"] for r in rows} == {f"v{i}" for i in range(100)}

    manifest = _json.load(open(d + "/_SUCCESS"))
    assert manifest["total_rows"] == 100
    assert sorted(m["path"] for m in manifest["files"]) == files
    assert sum(m["rows"] for m in manifest["files"]) == 100


def test_python_datasource_stream_writer_jsonl_sink(spark, tmp_path):
    """The STREAMING write half of the Python DSv2 matrix: swell_synth
    stream (one micro-batch per ingest day) drains via AvailableNow into
    the jsonl_sink streamWriter; the _LOG commit journal holds one entry
    per batch whose rowcounts sum to the corpus; a checkpointed restart
    with no new data appends nothing (exactly-once via batch-id
    dedupe)."""
    import glob
    import json as _json

    from local_data_pipeline_spark.sources.pyds import register

    register(spark)
    d = str(tmp_path / "stream_sink")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        q = (
            spark.readStream.format("swell_synth")
            .option("n_ingest_days", 3)
            .load()
            .writeStream.format("jsonl_sink")
            .option("path", d)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # the simple stream reader advances one ingest day per AvailableNow
    # run (same cadence the swell-to-parquet test pins) — drain thrice
    for _ in range(3):
        drain()
    log = [
        _json.loads(line) for line in open(d + "/_LOG") if line.strip()
    ]
    batches = [e["batch"] for e in log]
    assert batches == sorted(set(batches))  # one entry per batch, ordered
    total = sum(e["rows"] for e in log)
    assert total == 9  # 3 days x 3 locations
    logged_files = [f["path"] for e in log for f in e["files"]]
    rows = [
        _json.loads(line) for f in logged_files for line in open(f)
    ]
    assert len(rows) == 9
    assert {r["location"] for r in rows} == {
        "mavericks", "oceanside", "trestles"
    }

    # restart on the same checkpoint: stream is drained, nothing appends
    drain()
    log2 = [
        _json.loads(line) for line in open(d + "/_LOG") if line.strip()
    ]
    assert sum(e["rows"] for e in log2) == 9

    # replayed-batch idempotence: re-commit batch 0's id with fake files
    from local_data_pipeline_spark.sources.pyds import (
        JsonlStreamSinkWriter,
        _JsonlCommit,
    )

    dup = d + "/part-replayed.jsonl"
    open(dup, "w").write('{"x": 1}\n')
    JsonlStreamSinkWriter({"path": d}).commit(
        [_JsonlCommit(dup, 1)], batchId=log[0]["batch"]
    )
    log3 = [
        _json.loads(line) for line in open(d + "/_LOG") if line.strip()
    ]
    assert sum(e["rows"] for e in log3) == 9  # no double-count
    assert not glob.glob(dup)  # duplicate files removed


def test_jsonl_sink_overwrite_append_and_orphan_sweep(spark, tmp_path):
    """Round-5 ADVICE fix: overwrite clears prior part files (no stale
    corpus under a fresh manifest); append MERGES the manifest so it stays
    the authoritative corpus listing; commit sweeps orphan part files not
    owned by the manifest (failed/speculative attempts)."""
    import glob
    import json as _json

    from local_data_pipeline_spark.sources.pyds import register

    register(spark)
    d = str(tmp_path / "sink2")
    w = spark.range(10).selectExpr("id", "concat('a', id) AS v").repartition(2)
    w.write.format("jsonl_sink").option("path", d).mode("append").save()

    # append: second write merges into the manifest — 4 files, 20 rows
    w2 = spark.range(10, 20).selectExpr("id", "concat('b', id) AS v").repartition(2)
    w2.write.format("jsonl_sink").option("path", d).mode("append").save()
    manifest = _json.load(open(d + "/_SUCCESS"))
    assert manifest["total_rows"] == 20 and len(manifest["files"]) == 4
    assert len(glob.glob(d + "/part-*.jsonl")) == 4

    # plant an orphan (a failed attempt's leftover) — overwrite must
    # remove both it and all prior committed parts
    orphan = d + "/part-deadbeef.jsonl"
    open(orphan, "w").write('{"id": 999}\n')
    w3 = spark.range(5).selectExpr("id", "concat('c', id) AS v").repartition(1)
    w3.write.format("jsonl_sink").option("path", d).mode("overwrite").save()
    manifest = _json.load(open(d + "/_SUCCESS"))
    assert manifest["total_rows"] == 5 and len(manifest["files"]) == 1
    files = glob.glob(d + "/part-*.jsonl")
    assert len(files) == 1  # stale parts + orphan swept
    rows = [_json.loads(line) for f in files for line in open(f)]
    assert sorted(r["id"] for r in rows) == list(range(5))
