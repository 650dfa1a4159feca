"""Round-13 additions: MIN/MAX incremental view maintenance
(operators/cdc.py:maintain_minmax) — the dirty-group recompute rule —
plus this round's guard hardening (maintain_join compaction check,
salt_hot_postings helper-column collision).
"""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"

CHG_SCHEMA = (
    "key bigint, op string, before_group string, before_value double, "
    "after_group string, after_value double"
)


def _minmax_frames(spark, rows):
    """(new_base_builder, old_agg) for a list of (key, grp, value)."""
    base = spark.createDataFrame(rows, "key bigint, grp string, value double")
    old_agg = base.groupBy("grp").agg(
        F.min("value").alias("min_value"), F.max("value").alias("max_value")
    )
    return base, old_agg


def _apply(rows, changes):
    """Driver-side reference apply: rows after the changelog batch."""
    touched = {c[0] for c in changes}
    out = [r for r in rows if r[0] not in touched]
    for key, op, bg, bv, ag, av in changes:
        if op == "U" and ag is not None:
            out.append((key, ag, av))
    return out


def _run(spark, rows, changes):
    from local_data_pipeline_spark.operators.cdc import maintain_minmax

    base, old_agg = _minmax_frames(spark, rows)
    new_rows = _apply(rows, changes)
    new_base = spark.createDataFrame(
        new_rows, "key bigint, grp string, value double"
    ).select("grp", "value")
    chg = spark.createDataFrame(changes, CHG_SCHEMA)
    got = {
        r.grp: (r.min_value, r.max_value)
        for r in maintain_minmax(
            old_agg, new_base, chg, "grp", "value"
        ).collect()
    }
    want = {}
    for _, g, v in new_rows:
        lo, hi = want.get(g, (v, v))
        want[g] = (min(lo, v), max(hi, v))
    return got, want, new_rows


def test_maintain_minmax_delete_current_max_recomputes(spark):
    """The case COUNT/SUM IVM cannot express: deleting the row holding
    the group max must fall back to recomputing the group from the
    surviving rows — across TWO sequential batches (the second deletes
    the max the first batch promoted)."""
    rows = [(1, "a", 1.0), (2, "a", 5.0), (3, "a", 10.0), (4, "b", 2.0)]
    batch1 = [(3, "D", "a", 10.0, None, None)]
    got, want, rows1 = _run(spark, rows, batch1)
    assert got == want == {"a": (1.0, 5.0), "b": (2.0, 2.0)}

    batch2 = [
        (2, "D", "a", 5.0, None, None),     # delete the NEW max
        (9, "U", None, None, "a", 3.0),     # and insert a middle value
    ]
    got2, want2, _ = _run(spark, rows1, batch2)
    assert got2 == want2 == {"a": (1.0, 3.0), "b": (2.0, 2.0)}


def test_maintain_minmax_monotone_inserts_skip_recompute(spark):
    """Insert-only batches merge in-plan (least/greatest): new global
    max, new global min, and a brand-new group."""
    rows = [(1, "a", 1.0), (2, "a", 5.0)]
    batch = [
        (10, "U", None, None, "a", 50.0),   # raises max
        (11, "U", None, None, "a", -1.0),   # lowers min
        (12, "U", None, None, "z", 7.0),    # new group
    ]
    got, want, _ = _run(spark, rows, batch)
    assert got == want == {"a": (-1.0, 50.0), "z": (7.0, 7.0)}


def test_maintain_minmax_group_empties_out(spark):
    """Deleting every row of a group necessarily retracts its min, so
    the dirty recompute returns no row and the group disappears."""
    rows = [(1, "a", 1.0), (2, "a", 5.0), (3, "b", 2.0)]
    batch = [
        (1, "D", "a", 1.0, None, None),
        (2, "D", "a", 5.0, None, None),
    ]
    got, want, _ = _run(spark, rows, batch)
    assert got == want == {"b": (2.0, 2.0)}


def test_maintain_minmax_duplicate_extreme_is_conservative(spark):
    """Two rows share the max; deleting one flags the group dirty and
    the recompute (correctly) keeps the max."""
    rows = [(1, "a", 10.0), (2, "a", 10.0), (3, "a", 1.0)]
    batch = [(1, "D", "a", 10.0, None, None)]
    got, want, _ = _run(spark, rows, batch)
    assert got == want == {"a": (1.0, 10.0)}


def test_maintain_minmax_middle_retraction_no_dirty_path(spark):
    """Retracting a strictly-interior value plus a same-batch update:
    extremes survive without a recompute (the plan's dirty set is empty
    — checked by result equality; the plan-shape pin lives in the
    operator's broadcast semi-join)."""
    rows = [(1, "a", 1.0), (2, "a", 5.0), (3, "a", 10.0)]
    batch = [
        (2, "D", "a", 5.0, None, None),
        (9, "U", None, None, "a", 6.0),
    ]
    got, want, _ = _run(spark, rows, batch)
    assert got == want == {"a": (1.0, 10.0)}


def test_maintain_minmax_group_move_dirty_on_source_only_when_extreme(spark):
    """A group-moving update retracts from the source group (dirty iff
    the moved value was its extreme) and inserts monotonically into the
    destination."""
    rows = [(1, "a", 1.0), (2, "a", 5.0), (3, "b", 2.0)]
    batch = [(2, "U", "a", 5.0, "b", 5.0)]  # a's max moves to b
    got, want, _ = _run(spark, rows, batch)
    assert got == want == {"a": (1.0, 1.0), "b": (2.0, 5.0)}


def test_maintain_minmax_invalid_op_fails_in_plan(spark):
    from local_data_pipeline_spark.operators.cdc import maintain_minmax

    rows = [(1, "a", 1.0)]
    base, old_agg = _minmax_frames(spark, rows)
    chg = spark.createDataFrame(
        [(1, "X", "a", 1.0, "a", 2.0)], CHG_SCHEMA
    )
    with pytest.raises(Exception, match="invalid changelog op"):
        maintain_minmax(
            old_agg, base.select("grp", "value"), chg, "grp", "value"
        ).collect()


def test_maintain_minmax_incremental_equals_full_recompute(spark):
    """Reconciliation over a larger synthetic batch mixing every change
    species — the property the query's oracle hash rides on."""
    rows = [(i, f"g{i % 7}", float((i * 37) % 101)) for i in range(300)]
    batch = (
        # in-place value bumps (some hit extremes)
        [(i, "U", f"g{i % 7}", float((i * 37) % 101),
          f"g{i % 7}", float((i * 37) % 101) + 0.5) for i in range(0, 60, 4)]
        # group moves
        + [(i, "U", f"g{i % 7}", float((i * 37) % 101),
            f"g{(i + 1) % 7}", float((i * 37) % 101)) for i in range(61, 90, 3)]
        # deletes targeting large values (extreme retractions)
        + [(i, "D", f"g{i % 7}", float((i * 37) % 101), None, None)
           for i in range(90, 300) if (i * 37) % 101 > 90]
        # brand-new keys
        + [(1000 + i, "U", None, None, f"g{i % 7}", 200.0 + i) for i in range(5)]
    )
    got, want, _ = _run(spark, rows, batch)
    assert got == want


def test_maintain_join_rejects_uncompacted_changelog(spark):
    """Duplicate keys in the dim changelog previously duplicated every
    re-derived view row SILENTLY; the in-plan cardinality guard must
    fail the job instead."""
    from local_data_pipeline_spark.operators.cdc import maintain_join

    fact = spark.createDataFrame([(1, 10.0), (2, 20.0)], "k bigint, amt double")
    dim = spark.createDataFrame([(1, "a"), (2, "b")], "k bigint, name string")
    view = fact.join(dim, "k").select("k", "amt", "name")
    dup_changes = spark.createDataFrame(
        [(1, "a2", "U"), (1, "a3", "U")], "k bigint, name string, op string"
    )
    with pytest.raises(Exception, match="not compacted"):
        maintain_join(view, fact, dup_changes, "k").collect()


def test_maintain_join_compacted_changelog_still_works(spark):
    from local_data_pipeline_spark.operators.cdc import maintain_join

    fact = spark.createDataFrame([(1, 10.0), (2, 20.0)], "k bigint, amt double")
    dim = spark.createDataFrame([(1, "a"), (2, "b")], "k bigint, name string")
    view = fact.join(dim, "k").select("k", "amt", "name")
    changes = spark.createDataFrame(
        [(1, "a2", "U")], "k bigint, name string, op string"
    )
    got = {
        (r.k, r.amt, r.name)
        for r in maintain_join(view, fact, changes, "k").collect()
    }
    assert got == {(1, 10.0, "a2"), (2, 20.0, "b")}


def test_salt_hot_postings_rejects_helper_column_collisions(spark):
    """A pre-existing __hot (or salt_col) on either input would make the
    internal left-joins ambiguous — the guard must raise up front."""
    from local_data_pipeline_spark.operators.similarity import (
        salt_hot_postings,
    )

    anchors = spark.createDataFrame(
        [("t1", 1)], "token string, a_id bigint"
    )
    corpus = spark.createDataFrame(
        [("t1", 2)], "token string, b_id bigint"
    )
    hot = spark.createDataFrame([("t1",)], "token string")
    for bad_side, a, c in (
        ("anchors", anchors.withColumn("__hot", F.lit(1)), corpus),
        ("corpus", anchors, corpus.withColumn("__salt", F.lit(0))),
    ):
        with pytest.raises(ValueError, match="helper column"):
            salt_hot_postings(a, c, hot)
    # clean inputs still work
    a_s, c_s, keys = salt_hot_postings(anchors, corpus, hot)
    assert keys == ["token", "__salt"]
    assert a_s.join(c_s, keys).count() == 1


# ------------------------------------------------- distinct-count IVM

def _support(spark, rows):
    """Support synopsis from (key, grp, value) base rows."""
    base = spark.createDataFrame(rows, "key bigint, grp string, value bigint")
    return base.groupBy("grp", "value").agg(
        F.count("*").cast("bigint").alias("n_support")
    )


DCHG_SCHEMA = (
    "key bigint, op string, before_group string, before_value bigint, "
    "after_group string, after_value bigint"
)


def test_maintain_distinct_multiplicity_semantics(spark):
    """THE distinct-IVM trap: user 7 has two events in group a —
    deleting one must keep the user distinct; deleting the second (next
    batch) must drop them. Exact across two sequential batches."""
    from local_data_pipeline_spark.operators.cdc import (
        distinct_counts,
        maintain_distinct,
    )

    rows = [(1, "a", 7), (2, "a", 7), (3, "a", 8), (4, "b", 7)]
    s0 = _support(spark, rows)
    b1 = spark.createDataFrame([(1, "D", "a", 7, None, None)], DCHG_SCHEMA)
    s1 = maintain_distinct(s0, b1, "grp", "value")
    got1 = {
        r.grp: (r.n_distinct, r.n_rows)
        for r in distinct_counts(s1, "grp").collect()
    }
    assert got1 == {"a": (2, 2), "b": (1, 1)}  # user 7 still distinct in a

    b2 = spark.createDataFrame([(2, "D", "a", 7, None, None)], DCHG_SCHEMA)
    s2 = maintain_distinct(s1, b2, "grp", "value")
    got2 = {
        r.grp: (r.n_distinct, r.n_rows)
        for r in distinct_counts(s2, "grp").collect()
    }
    assert got2 == {"a": (1, 1), "b": (1, 1)}  # now they drop


def test_maintain_distinct_group_move_and_netzero_update(spark):
    from local_data_pipeline_spark.operators.cdc import (
        distinct_counts,
        maintain_distinct,
    )

    rows = [(1, "a", 7), (2, "a", 8), (3, "b", 9)]
    s0 = _support(spark, rows)
    batch = spark.createDataFrame(
        [
            (1, "U", "a", 7, "b", 7),   # user 7 moves a -> b
            (2, "U", "a", 8, "a", 8),   # value-only update: net zero
        ],
        DCHG_SCHEMA,
    )
    s1 = maintain_distinct(s0, batch, "grp", "value")
    got = {
        r.grp: (r.n_distinct, r.n_rows)
        for r in distinct_counts(s1, "grp").collect()
    }
    assert got == {"a": (1, 1), "b": (2, 2)}


def test_maintain_distinct_negative_support_fails_in_plan(spark):
    """Retracting a (group, value) pair the base never held means the
    changelog is inconsistent — must fail loudly, not go negative."""
    from local_data_pipeline_spark.operators.cdc import maintain_distinct

    s0 = _support(spark, [(1, "a", 7)])
    bad = spark.createDataFrame(
        [(9, "D", "a", 999, None, None)], DCHG_SCHEMA
    )
    with pytest.raises(Exception, match="support driven negative"):
        maintain_distinct(s0, bad, "grp", "value").collect()


def test_maintain_distinct_incremental_equals_full_recompute(spark):
    from local_data_pipeline_spark.operators.cdc import (
        distinct_counts,
        maintain_distinct,
    )

    rows = [(i, f"g{i % 5}", (i * 13) % 37) for i in range(400)]
    batch_rows = (
        [(i, "U", f"g{i % 5}", (i * 13) % 37,
          f"g{(i + 1) % 5}", (i * 13) % 37) for i in range(0, 80, 3)]
        + [(i, "D", f"g{i % 5}", (i * 13) % 37, None, None)
           for i in range(80, 200, 2)]
        + [(1000 + i, "U", None, None, f"g{i % 5}", 100 + i)
           for i in range(10)]
    )
    s0 = _support(spark, rows)
    s1 = maintain_distinct(
        s0, spark.createDataFrame(batch_rows, DCHG_SCHEMA), "grp", "value"
    )
    got = {
        r.grp: (r.n_distinct, r.n_rows)
        for r in distinct_counts(s1, "grp").collect()
    }
    # reference: apply driver-side, recompute from scratch
    touched = {b[0] for b in batch_rows}
    post = [(g, v) for kk, g, v in rows if kk not in touched] + [
        (b[4], b[5]) for b in batch_rows if b[1] == "U" and b[4] is not None
    ]
    want = {}
    for g, v in post:
        d, n = want.get(g, (set(), 0))
        d.add(v)
        want[g] = (d, n + 1)
    want = {g: (len(d), n) for g, (d, n) in want.items()}
    assert got == want


def test_distinct_counts_null_value_matches_sql_semantics(spark):
    """A NULL-valued base row counts toward n_rows but must NOT count as
    a distinct value when value_col is passed (SQL COUNT(DISTINCT)
    ignores NULLs); without value_col the synopsis row count would."""
    from local_data_pipeline_spark.operators.cdc import distinct_counts

    support = spark.createDataFrame(
        [("a", 7, 2), ("a", None, 3), ("b", None, 1)],
        "grp string, value int, n_support bigint",
    )
    got = {
        r.grp: (r.n_distinct, r.n_rows)
        for r in distinct_counts(support, "grp", value_col="value").collect()
    }
    assert got == {"a": (1, 5), "b": (0, 1)}


def test_heavy_hitters_topk_orders_by_count_then_token(spark):
    """heavy_hitters_topk (the sketch-count top-k convenience over the
    candidates): descending merged count, token-ascending tie-break,
    and the counts are lower bounds of the exact frequencies."""
    from local_data_pipeline_spark.operators.heavy_hitters import (
        heavy_hitters_topk,
    )

    toks = (["aa"] * 30 + ["bb"] * 30 + ["cc"] * 10 + ["dd"] * 5
            + [f"x{i}" for i in range(20)])
    tokens = spark.createDataFrame([(t,) for t in toks], "token string")
    rows = heavy_hitters_topk(tokens.coalesce(1), k=50, top=3).collect()
    # k=50 > distinct tokens: sketch degenerates to exact counts
    assert [(r.token, r.mg_count) for r in rows] == [
        ("aa", 30), ("bb", 30), ("cc", 10)
    ]
