"""File sources/sinks + partition pruning proof + quality model set."""

from pyspark.sql import functions as F

from local_data_pipeline_spark.models.quality import build_quality_registry
from local_data_pipeline_spark.plans.inspect import physical_plan
from local_data_pipeline_spark.session import load_table
from local_data_pipeline_spark.sources.files import (
    read_csv,
    read_jsonl,
    read_orc,
    write_jsonl,
    write_orc,
    write_table,
)

from conftest import SF_DIR


def test_csv_round_trip_with_declared_schema(spark, tmp_path):
    p = str(tmp_path / "csv")
    nation = load_table(spark, SF_DIR, "nation")
    nation.write.option("header", True).csv(p)
    back = read_csv(spark, p, "n_nationkey int, n_name string, n_regionkey int")
    assert back.count() == nation.count()
    assert dict(back.dtypes) == dict(nation.dtypes)


def test_jsonl_tolerant_reader(spark, tmp_path):
    p = str(tmp_path / "jsonl")
    events = load_table(spark, SF_DIR, "events").limit(100)
    write_jsonl(events.select("event_id", "event_type", "value"), p)
    # declared schema: extra file fields dropped, missing fields null
    back = read_jsonl(spark, p, "event_id long, event_type string, missing_col double")
    assert back.count() == 100
    assert back.filter("missing_col is not null").count() == 0


def test_orc_round_trip_with_pushdown(spark, tmp_path):
    p = str(tmp_path / "orc")
    orders = load_table(spark, SF_DIR, "orders")
    write_orc(orders, p)
    back = read_orc(spark, p)
    assert back.count() == orders.count()
    assert dict(back.dtypes) == dict(orders.dtypes)
    # predicate pushdown + column pruning reach the ORC scan
    q = back.filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    plan = physical_plan(q)
    assert "PushedFilters" in plan and "o_orderstatus" in plan.split("PushedFilters", 1)[1].split("]", 1)[0]
    sel = plan.split("ReadSchema", 1)[1].split("\n")[0]
    assert "o_orderkey" in sel and "o_totalprice" not in sel


def test_orc_partitioned_write_prunes(spark, tmp_path):
    p = str(tmp_path / "orc_by_status")
    orders = load_table(spark, SF_DIR, "orders")
    write_orc(orders, p, partition_by=["o_orderstatus"])
    back = read_orc(spark, p).filter(F.col("o_orderstatus") == "F")
    plan = physical_plan(back)
    assert "PartitionFilters" in plan and "o_orderstatus" in plan.split("PartitionFilters", 1)[1].split("\n")[0]
    assert back.count() == orders.filter("o_orderstatus = 'F'").count()


def test_partitioned_write_prunes_at_scan(spark, tmp_path):
    p = str(tmp_path / "events_by_type")
    events = load_table(spark, SF_DIR, "events")
    write_table(events, p, partition_by=["event_type"])
    back = spark.read.parquet(p).filter(F.col("event_type") == "click")
    plan = physical_plan(back)
    # partition filter on the directory column, NOT a data filter
    assert "PartitionFilters" in plan and "event_type" in plan.split("PartitionFilters", 1)[1].split("\n")[0]
    assert back.count() == events.filter("event_type = 'click'").count()


def test_quality_registry_all_checks_pass(spark):
    reg = build_quality_registry(SF_DIR)
    results = reg.build(spark)
    assert len(results) == 8
    assert all(r.ok for r in results)
    names = {t for r in results for t in r.test_failures}
    # the FK / accepted_values / unique surfaces all actually ran
    assert any(n.startswith("relationships") for n in names)
    assert any(n.startswith("accepted_values") for n in names)
    assert any(n.startswith("unique") for n in names)


def test_quality_fk_catches_violation(spark):
    from local_data_pipeline_spark.models.quality import relationships

    child = spark.createDataFrame([(1,), (99,)], "fk int")
    parent = spark.createDataFrame([(1,), (2,)], "pk int")
    assert relationships("fk", parent, "pk").check(child) > 0


def test_training_shards_deterministic_and_sorted(spark, tmp_path):
    import glob

    from local_data_pipeline_spark.sources.shards import write_training_shards

    docs = load_table(spark, SF_DIR, "documents")
    p = str(tmp_path / "shards")
    write_training_shards(docs, p, id_col="doc_id", n_shards=4, max_records_per_file=100)
    assert len(glob.glob(f"{p}/shard=*")) == 4
    back = spark.read.parquet(p)
    assert back.count() == docs.count()
    # shard assignment is a pure function of doc_id: rewriting produces
    # identical shard membership
    first = {(r.doc_id, r.shard) for r in back.select("doc_id", "shard").collect()}
    write_training_shards(docs, p, id_col="doc_id", n_shards=4)
    second = {(r.doc_id, r.shard) for r in spark.read.parquet(p).select("doc_id", "shard").collect()}
    assert first == second
    # rows inside each file are sorted by doc_id
    one_file = glob.glob(f"{p}/shard=0/*.parquet")[0]
    ids = [r.doc_id for r in spark.read.parquet(one_file).select("doc_id").collect()]
    assert ids == sorted(ids)


def test_compaction_reduces_files_preserves_rows(spark, tmp_path):
    from local_data_pipeline_spark.sources.maintenance import compact_parquet

    p = str(tmp_path / "smallfiles")
    ev = load_table(spark, SF_DIR, "events")
    ev.repartition(64).write.parquet(p)  # simulate small-file buildup
    n_rows = spark.read.parquet(p).count()
    before, after = compact_parquet(spark, p, target_mb=128)
    assert before == 64 and after < 8
    assert spark.read.parquet(p).count() == n_rows


def test_analyze_table_records_stats(spark):
    from local_data_pipeline_spark.sources.maintenance import analyze_table

    load_table(spark, SF_DIR, "nation").write.mode("overwrite").saveAsTable("t_nation")
    analyze_table(spark, "t_nation", columns=["n_nationkey"])
    desc = {r.col_name: r.data_type for r in spark.sql("DESCRIBE EXTENDED t_nation").collect()}
    assert "Statistics" in desc  # row count / size recorded for CBO


def test_upsert_partitioned_rewrites_only_touched_partitions(spark, tmp_path):
    import glob

    from local_data_pipeline_spark.sources.maintenance import upsert_partitioned

    p = str(tmp_path / "upsert")
    base = spark.createDataFrame(
        [(1, "a", "p1"), (2, "b", "p1"), (3, "c", "p2"), (4, "d", "p3")],
        "id long, v string, part string",
    )
    base.write.partitionBy("part").parquet(p)
    files_p3_before = set(glob.glob(f"{p}/part=p3/*.parquet"))

    updates = spark.createDataFrame(
        [(2, "B2", "p1"), (5, "e", "p2")], "id long, v string, part string"
    )
    upsert_partitioned(spark, updates, p, key="id", partition_col="part")

    got = {(r.id, r.v) for r in spark.read.parquet(p).collect()}
    assert got == {(1, "a"), (2, "B2"), (3, "c"), (4, "d"), (5, "e")}
    # untouched partition p3 was not rewritten
    assert set(glob.glob(f"{p}/part=p3/*.parquet")) == files_p3_before


def test_schema_evolution_merge_schema(spark, tmp_path):
    p = str(tmp_path / "evolve")
    spark.createDataFrame([(1, "x")], "id long, a string").write.mode("append").parquet(p)
    # v2 of the producer adds a column
    spark.createDataFrame([(2, "y", 9.5)], "id long, a string, score double").write.mode(
        "append"
    ).parquet(p)
    merged = spark.read.option("mergeSchema", True).parquet(p)
    assert set(merged.columns) == {"id", "a", "score"}
    rows = {r.id: r.score for r in merged.collect()}
    assert rows[1] is None and rows[2] == 9.5


def test_curation_to_training_shards_end_to_end(spark, tmp_path):
    """The full LLM-data story: curate -> deterministic split -> shards."""
    import glob

    from local_data_pipeline_spark.models.curation import build_curation_registry
    from local_data_pipeline_spark.operators.dedup import hash_split
    from local_data_pipeline_spark.sources.shards import write_training_shards

    reg = build_curation_registry(SF_DIR)
    reg.build(spark)
    curated = spark.table("pres_curated_docs")
    split = hash_split(curated)
    p = str(tmp_path / "train_shards")
    write_training_shards(
        split.filter("split = 'train'"), p, id_col="doc_id", n_shards=2
    )
    back = spark.read.parquet(p)
    assert back.count() == split.filter("split = 'train'").count() > 0
    assert len(glob.glob(f"{p}/shard=*")) == 2


def test_clustered_write_produces_skippable_layout(spark, tmp_path):
    """write_clustered: disjoint per-file key ranges, sorted row groups
    with tight min/max stats, and unchanged query results."""
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from local_data_pipeline_spark.session import load_table
    from local_data_pipeline_spark.sources.files import write_clustered

    events = load_table(spark, SF_DIR, "events").select(
        "event_id", "ts", "user_id", "value"
    )
    p = str(tmp_path / "clustered")
    write_clustered(events, p, cluster_by=["ts"], n_files=4, rows_per_rowgroup=4096)

    import glob

    files = sorted(glob.glob(p + "/*.parquet"))
    assert len(files) >= 2
    ranges = []
    for fp in files:
        f = pq.ParquetFile(fp)
        ts_idx = f.schema_arrow.get_field_index("ts")
        rg_ranges = []
        for i in range(f.num_row_groups):
            st = f.metadata.row_group(i).column(ts_idx).statistics
            rg_ranges.append((st.min, st.max))
        # row groups inside a file are sorted and non-overlapping
        for (a_min, a_max), (b_min, b_max) in zip(rg_ranges, rg_ranges[1:]):
            assert a_max <= b_min
        ranges.append((rg_ranges[0][0], rg_ranges[-1][1]))
    # files cover disjoint ranges (range partitioning)
    ranges.sort()
    for (a_min, a_max), (b_min, b_max) in zip(ranges, ranges[1:]):
        assert a_max <= b_min
    # correctness: a time-range scan over the clustered copy matches source
    lo, top = events.agg(F.min("ts"), F.max("ts")).collect()[0]
    hi = lo + (top - lo) / 4
    want = events.filter(F.col("ts") <= F.lit(hi)).count()
    got = spark.read.parquet(p).filter(F.col("ts") <= F.lit(hi)).count()
    assert want == got and got > 0


def test_zorder_write_skips_on_both_dimensions(spark, tmp_path):
    """write_zorder: row-group min/max footer stats must prune a narrow
    range predicate on EITHER Z dimension, where the linear-clustered
    layout prunes only its leading key. Also row parity and identical
    filter results."""
    import glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from local_data_pipeline_spark.session import load_table
    from local_data_pipeline_spark.sources.files import (
        write_clustered,
        write_zorder,
    )

    ev = load_table(spark, SF_DIR, "events").select(
        "event_id",
        "user_id",
        (F.col("value") % 1000).alias("v"),  # 2nd dim, independent of user
    )
    n = ev.count()
    p_lin = str(tmp_path / "linear")
    p_z = str(tmp_path / "zorder")
    write_clustered(ev, p_lin, cluster_by=["user_id"], n_files=8, rows_per_rowgroup=512)
    write_zorder(ev, p_z, zorder_by=["user_id", "v"], n_files=8, rows_per_rowgroup=512)

    def overlap_fraction(path: str, col: str, lo: float, hi: float) -> float:
        total = hit = 0
        for fp in glob.glob(path + "/*.parquet"):
            f = pq.ParquetFile(fp)
            idx = f.schema_arrow.get_field_index(col)
            for i in range(f.num_row_groups):
                st = f.metadata.row_group(i).column(idx).statistics
                total += 1
                if st.max >= lo and st.min <= hi:
                    hit += 1
        assert total >= 8, f"want several row groups, got {total}"
        return hit / total

    # narrow range on each dim (~5% of the value space)
    lin_u = overlap_fraction(p_lin, "user_id", 100, 150)
    lin_v = overlap_fraction(p_lin, "v", 100, 150)
    z_u = overlap_fraction(p_z, "user_id", 100, 150)
    z_v = overlap_fraction(p_z, "v", 100, 150)

    # linear layout: perfect on the leading key, useless on the other
    assert lin_u < 0.35
    assert lin_v > 0.9
    # z-order: substantially better than "read everything" on BOTH dims
    assert z_u < 0.7, f"zorder should prune user_id scans, got {z_u}"
    assert z_v < 0.7, f"zorder should prune v scans, got {z_v}"

    # row parity + filter-result parity through the rewritten layout
    back = spark.read.parquet(p_z)
    assert back.count() == n > 0
    want = ev.filter("v BETWEEN 100 AND 150").count()
    assert back.filter("v BETWEEN 100 AND 150").count() == want


def test_incremental_agg_mv_equals_full_recompute(spark, tmp_path):
    """Day-by-day incremental refreshes of the aggregate MV must yield
    the bit-identical rollup a single full-corpus refresh produces
    (decimal partials are associative), and a refresh must rewrite only
    the partitions its batch touches."""
    import os

    from pyspark.sql import functions as F

    from local_data_pipeline_spark.sources.maintenance import refresh_aggregate_mv
    from local_data_pipeline_spark.session import load_table

    ev = load_table(spark, SF_DIR, "events").withColumn(
        "dt", F.col("ts").cast("date").cast("string")
    )
    days = sorted(r["dt"] for r in ev.select("dt").distinct().collect())
    inc_path = str(tmp_path / "mv_inc")
    # feed three chunks: first day, middle days, last day
    chunks = [days[:1], days[1:-1], days[-1:]]
    for chunk in chunks:
        refresh_aggregate_mv(
            spark,
            ev.filter(F.col("dt").isin(chunk)),
            inc_path,
            group_cols=["dt", "event_type"],
            partition_col="dt",
            sum_cols={"sum_value": "value"},
        )
    full_path = str(tmp_path / "mv_full")
    refresh_aggregate_mv(
        spark,
        ev,
        full_path,
        group_cols=["dt", "event_type"],
        partition_col="dt",
        sum_cols={"sum_value": "value"},
    )
    inc = sorted(map(tuple, spark.read.parquet(inc_path).collect()))
    full = sorted(map(tuple, spark.read.parquet(full_path).collect()))
    assert inc == full and len(inc) > 0

    # refreshing ONE day again must leave other partitions' files alone
    first_day_dir = os.path.join(inc_path, f"dt={days[0]}")
    other_day_dir = os.path.join(inc_path, f"dt={days[-1]}")
    before_other = {
        f: os.path.getmtime(os.path.join(other_day_dir, f))
        for f in os.listdir(other_day_dir)
        if f.endswith(".parquet")
    }
    refresh_aggregate_mv(
        spark,
        ev.filter(F.col("dt") == days[0]),
        inc_path,
        group_cols=["dt", "event_type"],
        partition_col="dt",
        sum_cols={"sum_value": "value"},
    )
    after_other = {
        f: os.path.getmtime(os.path.join(other_day_dir, f))
        for f in os.listdir(other_day_dir)
        if f.endswith(".parquet")
    }
    assert before_other == after_other  # untouched partition not rewritten
    assert os.path.isdir(first_day_dir)
    # double-applying the same batch DOUBLES counts (refresh is additive,
    # not idempotent) — callers dedup batches by id; assert documented shape
    doubled = {
        (r["dt"], r["event_type"]): r["n"]
        for r in spark.read.parquet(inc_path).filter(F.col("dt") == days[0]).collect()
    }
    base = {
        (r["dt"], r["event_type"]): r["n"]
        for r in spark.read.parquet(full_path).filter(F.col("dt") == days[0]).collect()
    }
    assert doubled == {k: 2 * v for k, v in base.items()}


def test_incremental_agg_mv_preserves_null_partition(spark, tmp_path):
    """Merging a batch that touches the NULL partition must MERGE with
    (not replace) the null partition's existing aggregates — isin()
    alone would drop them under three-valued logic."""
    from pyspark.sql import functions as F

    from local_data_pipeline_spark.sources.maintenance import refresh_aggregate_mv

    p = str(tmp_path / "mv_null")
    schema = "k string, v double, part string"
    b1 = spark.createDataFrame([("a", 1.0, None), ("b", 2.0, "p1")], schema)
    refresh_aggregate_mv(
        spark, b1, p, group_cols=["part", "k"], partition_col="part",
        sum_cols={"sv": "v"},
    )
    b2 = spark.createDataFrame([("a", 10.0, None)], schema)
    refresh_aggregate_mv(
        spark, b2, p, group_cols=["part", "k"], partition_col="part",
        sum_cols={"sv": "v"},
    )
    rows = {
        (r["part"], r["k"]): (r["n"], float(r["sv"]))
        for r in spark.read.parquet(p).collect()
    }
    assert rows == {(None, "a"): (2, 11.0), ("p1", "b"): (1, 2.0)}
