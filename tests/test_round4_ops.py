"""Round-4 operator invariants beyond the oracle hash checks:
sequence analytics, sweep-line concurrency, weighted sampling, fuzzy
matching, and the UDTF surface."""

import pytest
from pyspark.sql import functions as F

from local_data_pipeline_spark.queries import QUERIES

from conftest import SF_DIR


def test_markov_rows_are_proper_distributions(spark):
    """Outgoing transition probabilities must sum to 1 per current state
    (up to the 6-decimal rounding of each term)."""
    rows = QUERIES["markov_event_transitions"].fn(spark, SF_DIR).collect()
    by_cur = {}
    for r in rows:
        by_cur.setdefault(r["cur"], []).append(r["p"])
        assert 0.0 < r["p"] <= 1.0
    for cur, ps in by_cur.items():
        assert abs(sum(ps) - 1.0) < 1e-5, (cur, sum(ps))


def test_top_paths_are_subsequences_of_transitions(spark):
    """Every step inside a frequent 3-path must exist as a Markov
    transition (the 3-gram relation marginalizes to the 2-gram one)."""
    trans = {
        (r["cur"], r["nxt"])
        for r in QUERIES["markov_event_transitions"].fn(spark, SF_DIR).collect()
    }
    for r in QUERIES["top_event_paths_3step"].fn(spark, SF_DIR).collect():
        e1, e2, e3 = r["path"].split(">")
        assert (e1, e2) in trans and (e2, e3) in trans


def test_weighted_sample_stable_under_repartition(spark):
    """A-ES keys are pure row functions, so the chosen sample must not
    depend on physical partitioning."""
    base = QUERIES["weighted_sample_documents"].fn(spark, SF_DIR)
    ids = [r["doc_id"] for r in base.collect()]
    rep = [
        r["doc_id"]
        for r in QUERIES["weighted_sample_documents"]
        .fn(spark, SF_DIR)
        .repartition(13)
        .collect()
    ]
    assert set(ids) == set(rep) and len(ids) == 100


def test_weighted_sample_favors_longer_documents(spark):
    """With weight = n_chars the sampled docs must skew long: the sample
    mean length exceeds the corpus mean."""
    from local_data_pipeline_spark.session import load_table

    sample = QUERIES["weighted_sample_documents"].fn(spark, SF_DIR)
    s_mean = sample.agg(F.avg("n_chars")).first()[0]
    c_mean = (
        load_table(spark, SF_DIR, "documents").agg(F.avg("n_chars")).first()[0]
    )
    assert s_mean > c_mean


def test_sweepline_peak_bounded_by_session_count(spark):
    """Daily peak concurrency is at least 1 and can't exceed the number
    of distinct users (one open session per user at a time by
    construction of gap sessionization)."""
    from local_data_pipeline_spark.session import load_table

    n_users = (
        load_table(spark, SF_DIR, "events").select("user_id").distinct().count()
    )
    rows = QUERIES["max_concurrent_sessions_daily"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 1 <= r["max_concurrent"] <= n_users


def test_fuzzy_pairs_blocked_by_brand(spark):
    """Every reported block must be a real brand and distances in
    [0, 3]."""
    from local_data_pipeline_spark.session import load_table

    brands = {
        r["p_brand"]
        for r in load_table(spark, SF_DIR, "part").select("p_brand").distinct().collect()
    }
    for r in QUERIES["fuzzy_part_name_pairs"].fn(spark, SF_DIR).collect():
        assert r["brand"] in brands
        assert 0 <= r["min_dist"] <= 3
        assert r["n_pairs"] >= 1


def test_token_rle_reconstructs_token_stream(spark):
    """Expanding the runs of one document must reproduce its exact token
    sequence (lossless RLE round-trip through the Python UDTF)."""
    from local_data_pipeline_spark.session import load_table

    doc = (
        load_table(spark, SF_DIR, "documents")
        .filter(F.col("text").isNotNull() & (F.trim("text") != ""))
        .orderBy("doc_id")
        .first()
    )
    runs = (
        QUERIES["token_rle_udtf_documents"]
        .fn(spark, SF_DIR)
        .filter(F.col("doc_id") == doc["doc_id"])
        .orderBy("run_idx")
        .collect()
    )
    rebuilt = [t for r in runs for t in [r["token"]] * r["run_len"]]
    assert rebuilt == doc["text"].strip().lower().split()
    # runs are maximal: no two adjacent runs share a token
    for a, b in zip(runs, runs[1:]):
        assert a["token"] != b["token"]


def test_regression_slope_matches_numpy(spark):
    """The sufficient-statistics OLS must agree with numpy's lstsq per
    group (to well beyond the 6-decimal emission rounding)."""
    import numpy as np

    from local_data_pipeline_spark.session import load_table

    ev = (
        load_table(spark, SF_DIR, "events")
        .select(
            "event_type",
            (F.unix_timestamp(F.date_trunc("hour", F.col("ts"))) / 3600)
            .cast("double")
            .alias("x"),
            F.col("value").alias("y"),
        )
        .collect()
    )
    groups = {}
    for r in ev:
        groups.setdefault(r["event_type"], []).append((r["x"], r["y"]))
    got = {
        r["event_type"]: (r["slope_per_hour"], r["intercept"])
        for r in QUERIES["regression_value_trend_by_type"].fn(spark, SF_DIR).collect()
    }
    for et, pts in groups.items():
        x = np.array([p[0] for p in pts])
        y = np.array([p[1] for p in pts])
        slope, intercept = np.polyfit(x, y, 1)
        assert got[et][0] == pytest.approx(slope, abs=2e-6)
        # the intercept extrapolates to x=0 from x ~ 4.7e5 hours, so an
        # O(1e-11) slope difference vs numpy's SVD route shifts it by
        # ~5e-6 absolute — compare relatively.
        assert got[et][1] == pytest.approx(intercept, rel=1e-6)


def test_churn_partitions_each_years_actives(spark):
    """retained(y) + new(y) must equal the distinct active customers of
    year y, and retained(y) + churned(y) the actives of y-1."""
    from local_data_pipeline_spark.session import load_table

    act = (
        load_table(spark, SF_DIR, "orders")
        .select(F.year("o_orderdate").alias("yr"), "o_custkey")
        .distinct()
        .groupBy("yr")
        .count()
        .collect()
    )
    actives = {r["yr"]: r["count"] for r in act}
    rows = QUERIES["customer_yearly_churn"].fn(spark, SF_DIR).collect()
    m = {}
    for r in rows:
        m.setdefault(r["yr"], {})[r["status"]] = r["n_customers"]
    for yr, d in m.items():
        assert d.get("retained", 0) + d.get("new", 0) == actives[yr]
        assert d.get("retained", 0) + d.get("churned", 0) == actives[yr - 1]


def test_misra_gries_contains_every_true_heavy_hitter(spark):
    """MG guarantee: any token with corpus frequency > N/k must appear
    in the candidate set, and sketch counts never exceed exact counts."""
    from local_data_pipeline_spark.operators.heavy_hitters import (
        heavy_hitter_candidates,
    )
    from local_data_pipeline_spark.functions import text as TX
    from local_data_pipeline_spark.session import load_table

    k = 200
    docs = load_table(spark, SF_DIR, "documents")
    tokens = docs.select(F.explode(TX.tokens(F.col("text"))).alias("token"))
    exact = {
        r["token"]: r["c"]
        for r in tokens.groupBy("token").agg(F.count("*").alias("c")).collect()
    }
    n_total = sum(exact.values())
    cand = {
        r["token"]: r["mg_count"]
        for r in heavy_hitter_candidates(tokens, k=k).collect()
    }
    for tok, c in exact.items():
        if c > n_total / k:
            assert tok in cand, (tok, c, n_total / k)
    for tok, mg in cand.items():
        assert mg <= exact[tok]


def test_bm25_scores_zero_docs_excluded_and_monotone_tf(spark):
    """Only docs containing at least one query term are scored, and the
    top doc's term frequencies are not dominated by any scored doc with
    uniformly higher tf (sanity of the saturation curve direction)."""
    rows = QUERIES["bm25_search_documents"].fn(spark, SF_DIR).collect()
    assert len(rows) == 20
    assert all(r["bm25"] > 0 for r in rows)
    assert rows == sorted(rows, key=lambda r: (-r["bm25"], r["doc_id"]))


def test_entropy_bounds(spark):
    """0 <= H <= ln(n_tokens), with equality cases meaningful (single
    repeated token -> 0; all-distinct tokens -> ln n)."""
    import math

    for r in QUERIES["token_entropy_documents"].fn(spark, SF_DIR).collect():
        assert -1e-9 <= r["entropy"] <= math.log(r["n_tokens"]) + 1e-6


def test_lift_symmetric_margins(spark):
    """Every reported pair must have support <= min of its parts' own
    marginal supports (co-occurrence can't beat either marginal)."""
    from local_data_pipeline_spark.session import load_table

    li = load_table(spark, SF_DIR, "lineitem")
    op = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    ).distinct()
    n_orders = op.select("ok").distinct().count()
    marg = {
        r["pk"]: r["c"] for r in op.groupBy("pk").agg(F.count("*").alias("c")).collect()
    }
    for r in QUERIES["co_purchase_lift_parts"].fn(spark, SF_DIR).collect():
        assert r["n_both"] <= min(marg[r["p1"]], marg[r["p2"]])
        assert abs(r["support"] - r["n_both"] / n_orders) < 1e-6


def test_pagerank_star_graph_and_mass_conservation(spark):
    """On a planted star (all leaves -> hub) the hub must rank first;
    total rank mass stays 1; repeated runs are bit-identical."""
    from local_data_pipeline_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(i, 0) for i in range(1, 8)] + [(0, i) for i in range(1, 8)],
        "src long, dst long",
    )
    r1 = {r["node"]: r["rank"] for r in pagerank(edges, iterations=8).collect()}
    r2 = {r["node"]: r["rank"] for r in pagerank(edges, iterations=8).collect()}
    assert r1 == r2
    assert abs(sum(r1.values()) - 1.0) < 1e-9
    assert r1[0] == max(r1.values())
    # leaves 1..7 are symmetric -> identical ranks
    leaf_ranks = {r1[i] for i in range(1, 8)}
    assert len(leaf_ranks) == 1


def test_pagerank_handles_dangling_nodes(spark):
    """A sink node (no out-edges) must not leak mass: totals still 1."""
    from local_data_pipeline_spark.operators.graph import pagerank

    edges = spark.createDataFrame([(1, 2), (2, 3), (1, 3)], "src long, dst long")
    ranks = {r["node"]: r["rank"] for r in pagerank(edges, iterations=12).collect()}
    assert abs(sum(ranks.values()) - 1.0) < 1e-9
    assert ranks[3] == max(ranks.values())


def test_dow_seasonality_weighted_mean_is_one(spark):
    """The n-weighted mean of seasonal indices equals 1 per type (the
    index is mean_dow / mean_total with shared denominators)."""
    rows = QUERIES["dow_seasonality_events"].fn(spark, SF_DIR).collect()
    by_type = {}
    for r in rows:
        assert 1 <= r["dow"] <= 7
        by_type.setdefault(r["event_type"], []).append((r["n"], r["seasonal_index"]))
    for et, pairs in by_type.items():
        total_n = sum(n for n, _ in pairs)
        wmean = sum(n * s for n, s in pairs) / total_n
        assert abs(wmean - 1.0) < 1e-4, (et, wmean)
