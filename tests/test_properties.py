"""Property-based checks (hypothesis) for operator equivalences.

Few examples + no deadline: each example spins Spark jobs. The properties
matter more than the volume — window-top1 ≡ max_by-top1 ≡ salted-top1 on
arbitrary data, and sessionization invariants.
"""

import datetime

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from local_data_pipeline_spark.operators.topk import (
    salted_top1,
    top1_per_group,
    top1_per_group_agg,
)
from local_data_pipeline_spark.operators.windows import sessionize

ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),      # key
        st.integers(min_value=0, max_value=50),     # order value
        st.integers(min_value=0, max_value=10_000), # unique-ish id
    ),
    min_size=1,
    max_size=25,
)


@settings(max_examples=12, deadline=None)
@given(ROWS)
def test_top1_window_agg_salted_equivalence(spark, rows):
    # make ids unique so the total order (v desc, id desc) is total
    rows = [(k, v, i) for i, (k, v, _) in enumerate(rows)]
    df = spark.createDataFrame(rows, "k int, v int, id int")
    order = [F.desc("v"), F.desc("id")]
    w = {(r.k, r.v, r.id) for r in top1_per_group(df, ["k"], order).collect()}
    a = {(r.k, r.v, r.id) for r in top1_per_group_agg(df, ["k"], ["v", "id"]).collect()}
    s = {(r.k, r.v, r.id) for r in salted_top1(df, ["k"], order, salt_buckets=4).collect()}
    assert w == a == s
    assert len(w) == len({k for k, _, _ in rows})


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=7200), min_size=1, max_size=20)
)
def test_sessionize_invariants(spark, offsets_s):
    base = datetime.datetime(2026, 1, 1)
    rows = [
        (i, 1, base + datetime.timedelta(seconds=s), 0.0)
        for i, s in enumerate(sorted(set(offsets_s)))
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp, value double")
    out = sorted(
        ((r.ts, r.session_id) for r in sessionize(df, gap="30 minutes").collect())
    )
    # session ids start at 1, are non-decreasing in time, and bump exactly
    # when the gap to the previous event exceeds 30 minutes
    expected, sid, prev = [], 0, None
    for ts, _ in out:
        if prev is None or (ts - prev).total_seconds() > 1800:
            sid += 1
        expected.append(sid)
        prev = ts
    assert [s for _, s in out] == expected


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.floats(min_value=-1e9, max_value=1e9, allow_nan=False).map(
            lambda x: round(x, 4)
        ),
        min_size=1,
        max_size=30,
    )
)
def test_dsum_is_exact_and_order_insensitive(spark, values):
    """dsum == exact decimal arithmetic regardless of partitioning —
    the core determinism helper behind every oracle-matched aggregate."""
    from decimal import Decimal

    from local_data_pipeline_spark.functions.numeric import dsum

    df = spark.createDataFrame([(v,) for v in values], "x double")
    got1 = df.agg(dsum("x").alias("s")).collect()[0].s
    got2 = df.repartition(5).agg(dsum("x").alias("s")).collect()[0].s
    exact = float(sum(Decimal(str(round(v, 6))) for v in values))
    assert got1 == got2 == exact


@settings(max_examples=10, deadline=None)
@given(
    st.lists(  # point events: (key, ts_offset_seconds)
        st.tuples(st.integers(0, 2), st.integers(0, 30_000)),
        min_size=1,
        max_size=20,
    ),
    st.lists(  # intervals: (key, start_offset, duration_seconds)
        st.tuples(st.integers(0, 2), st.integers(0, 30_000), st.integers(1, 10_000)),
        min_size=1,
        max_size=10,
    ),
)
def test_range_join_buckets_equals_naive_nonequi_join(spark, points, intervals):
    """range_join_buckets (bucketed equi-join + residual) must return
    exactly the rows of the naive non-equi join, for arbitrary point and
    interval layouts (spanning 0..n buckets, touching bucket edges)."""
    from local_data_pipeline_spark.operators.joins import range_join_buckets

    base = datetime.datetime(2024, 1, 1)
    lrows = [
        (k, base + datetime.timedelta(seconds=s), i)
        for i, (k, s) in enumerate(points)
    ]
    rrows = [
        (
            k,
            base + datetime.timedelta(seconds=s),
            base + datetime.timedelta(seconds=s + d),
            j,
        )
        for j, (k, s, d) in enumerate(intervals)
    ]
    left = spark.createDataFrame(lrows, "k int, ts timestamp, pid int")
    right = spark.createDataFrame(
        rrows, "k int, start timestamp, end timestamp, iid int"
    )
    got = sorted(
        (r.pid, r.iid)
        for r in range_join_buckets(
            left, right, on="k", left_ts="ts", right_start="start", right_end="end"
        ).collect()
    )
    want = sorted(
        (r.pid, r.iid)
        for r in left.join(
            right,
            (left.k == right.k)
            & (left.ts >= right.start)
            & (left.ts < right.end),
        ).collect()
    )
    assert got == want


@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(
            lambda p: p[0] != p[1]
        ),
        min_size=1,
        max_size=25,
    )
)
@settings(max_examples=10, deadline=None)
def test_dedup_clusters_equal_union_find(spark, edges):
    """Min-label propagation must compute exactly the connected components
    a driver-side union-find computes, on arbitrary small graphs —
    including chains longer than one propagation round."""
    from local_data_pipeline_spark.operators.dedup import dedup_clusters

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = {n for e in edges for n in e}
    expected = {n: find(n) for n in nodes}

    pairs = spark.createDataFrame(
        [(a, b) for a, b in edges], "id_a long, id_b long"
    )
    got = {r.doc_id: r.cluster_id for r in dedup_clusters(pairs).collect()}
    assert got == expected


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),  # maximize (heavy ties)
            st.integers(min_value=0, max_value=3),  # minimize (heavy ties)
        ),
        min_size=1,
        max_size=20,
    )
)
def test_pareto_frontier_equals_brute_force(spark, pts):
    """The O(n log n) level-sweep skyline must equal brute-force dominance
    on arbitrary ties-heavy data, including all-equal degenerate input."""
    from local_data_pipeline_spark.operators.topk import pareto_frontier

    rows = [(i, v, c) for i, (v, c) in enumerate(pts)]
    df = spark.createDataFrame(rows, "id int, val int, cost int")
    got = {r.id for r in pareto_frontier(df, "val", "cost").collect()}

    def dominated(me):
        i, v, c = me
        return any(
            oc <= c and ov >= v and (oc < c or ov > v)
            for oi, ov, oc in rows
            if oi != i
        )

    want = {i for i, v, c in rows if not dominated((i, v, c))}
    assert got == want


# ------------------------- replay-family properties (round 10) -------------
# One Spark round-trip per EXAMPLE SET (a whole column of generated values
# per call), not per example — Spark jobs dominate hypothesis runtime.

TEXTS = st.lists(
    st.text(
        alphabet=st.characters(
            codec="utf-8", exclude_categories=("Cs",)
        ),
        max_size=24,
    ),
    min_size=1,
    max_size=20,
)


@settings(max_examples=8, deadline=None)
@given(TEXTS)
def test_rk_string_matches_python_on_arbitrary_unicode(spark, texts):
    """Spark's rk_string (fold over split('') codepoints) must equal the
    plain-Python Rabin-Karp for ANY unicode payload — the cross-engine
    contract every rk_pow5 graduation rests on."""
    from local_data_pipeline_spark.functions.replay import (
        POW_P,
        RK_BASE,
        rk_string,
    )

    def rk_py(s: str) -> int:
        h = 0
        for ch in s:
            h = (h * RK_BASE + ord(ch)) % POW_P
        return h

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, s string"
    ).select("i", rk_string(F.col("s")).alias("h"))
    got = {r.i: r.h for r in df.collect()}
    assert got == {i: rk_py(t) for i, t in enumerate(texts)}


@settings(max_examples=20, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**31 - 2),
                min_size=2, max_size=40, unique=True))
def test_pow5_is_injective_and_in_range(xs):
    """x -> x^5 mod (2^31 - 1) is a bijection on [0, p): distinct inputs
    give distinct outputs in range (pure Python — the Spark expression
    is pinned equal elsewhere)."""
    from local_data_pipeline_spark.functions.replay import POW_P

    ys = [pow(x, 5, POW_P) for x in xs]
    assert len(set(ys)) == len(xs)
    assert all(0 <= y < POW_P for y in ys)


@settings(max_examples=10, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1),
                min_size=1, max_size=8))
def test_poly_fold_spark_matches_python_even_out_of_range(spark, vals):
    """poly_fold reduces ANY int64 inputs mod p before folding, so the
    key is deterministic (and Python-predictable) even for foreign
    full-range hash values — the family-mismatch guard."""
    from local_data_pipeline_spark.functions.replay import (
        FOLD_BASE,
        POW_P,
        poly_fold,
    )

    acc = 0
    for v in vals:
        acc = (acc * FOLD_BASE + (v % POW_P)) % POW_P
    df = spark.range(1).select(
        poly_fold(F.array(*[F.lit(v).cast("long") for v in vals])).alias("k")
    )
    assert df.first().k == acc
