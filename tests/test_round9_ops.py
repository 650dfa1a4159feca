"""Round-9 operator tests: perceptual-hash (pHash) media near-dup and the
span-level exact-substring dedup's interval-union arithmetic."""

from pyspark.sql import functions as F

from local_data_pipeline_spark.operators.multimodal import (
    FEATURE_DIM,
    _phash_planes,
    phash64,
    phash_near_dups,
)
from local_data_pipeline_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"

#: A fixed feature vector (no runtime RNG — literal, like the planted
#: dedup fixtures elsewhere) plus a tiny perturbation of it and one
#: unrelated vector.
BASE = [0.91, 0.12, 0.55, 0.33, 0.78, 0.04, 0.62, 0.47,
        0.29, 0.85, 0.17, 0.70, 0.41, 0.96, 0.08, 0.53]
NEAR = [v + d for v, d in zip(BASE, [0.004, -0.003, 0.002, 0.001, -0.004,
                                     0.003, -0.002, 0.004, -0.001, 0.002,
                                     0.003, -0.004, 0.001, -0.002, 0.004,
                                     -0.003])]
FAR = [0.05, 0.93, 0.21, 0.88, 0.10, 0.76, 0.34, 0.02,
       0.67, 0.15, 0.99, 0.28, 0.81, 0.07, 0.59, 0.44]


def _features_df(spark):
    rows = [(1, BASE), (2, NEAR), (3, FAR)]
    return spark.createDataFrame(
        rows, "media_id long, features array<float>"
    )


def test_phash_planes_are_deterministic_and_well_shaped():
    p1 = _phash_planes()
    p2 = _phash_planes()
    assert p1 == p2
    assert len(p1) == 64 and all(len(r) == FEATURE_DIM for r in p1)
    flat = [v for r in p1 for v in r]
    assert all(-1.0 <= v < 1.0 for v in flat)
    # signs actually vary — the planes are not degenerate
    assert any(v < 0 for v in flat) and any(v > 0 for v in flat)


def test_phash_hamming_tracks_feature_distance(spark):
    h = {
        r.media_id: r.phash
        for r in phash64(_features_df(spark)).collect()
    }
    assert set(h) == {1, 2, 3}

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    near = ham(h[1], h[2])
    far_12 = ham(h[1], h[3])
    far_23 = ham(h[2], h[3])
    # a 0.4%-scale perturbation flips only a handful of hyperplane signs;
    # an unrelated vector sits near the 32-bit expectation
    assert near <= 6, near
    assert far_12 >= 16 and far_23 >= 16, (far_12, far_23)


def test_phash_near_dups_catches_planted_pair_only(spark):
    pairs = phash_near_dups(_features_df(spark), max_hamming=6).collect()
    assert [(r.id_a, r.id_b) for r in pairs] == [(1, 2)]
    assert pairs[0].hamming <= 6


def test_phash_is_stable_across_runs(spark):
    df = _features_df(spark)
    a = sorted((r.media_id, r.phash) for r in phash64(df).collect())
    b = sorted((r.media_id, r.phash) for r in phash64(df).collect())
    assert a == b


def test_phash_near_dup_media_query_finds_planted_twins(spark):
    """With the fake (content-hash) decoder, near-dup pairs are exactly
    the planted byte-identical re-upload twins (every 50th doc, shifted
    id) at hamming 0 — the fixture corpus itself has no duplicate texts
    at this SF."""
    out = QUERIES["phash_near_dup_media"].fn(spark, SF).collect()
    assert out, "planted twins must surface as pairs"
    assert all(r.hamming == 0 for r in out)
    from local_data_pipeline_spark.session import load_table

    d = load_table(spark, SF, "documents")
    # twin offset is 10^12 since driver round 10 (the +10^7 offset
    # collided with scaled-corpus replica doc_ids at sf1 — gate-caught)
    expected = {
        (r.doc_id, r.doc_id + 1_000_000_000_000)
        for r in d.filter(F.col("doc_id") % 50 == 0).collect()
    }
    assert {(r.id_a, r.id_b) for r in out} == expected


def test_substring_dedup_interval_union_math(spark, tmp_path):
    """Planted corpus: doc 1 and doc 2 share one 10-token passage (two
    overlapping duplicated 8-grams each → ONE merged span of 10 tokens);
    doc 3 shares nothing. Verifies span merging, counts, and ppm."""
    shared = "a b c d e f g h i j"  # 10 tokens
    docs = [
        (1, f"{shared} unique1 tail1 tail2 tail3"),
        (2, f"lead1 lead2 {shared} other2"),
        (3, "completely different words with no overlap at all here ok"),
    ]
    sf = str(tmp_path / "sf")
    import os

    os.makedirs(sf, exist_ok=True)
    spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    rows = {
        r.doc_id: r
        for r in QUERIES["substring_dedup_documents"].fn(spark, sf).collect()
    }
    assert rows[1].n_tokens == 14 and rows[2].n_tokens == 13
    for d in (1, 2):
        assert rows[d].dup_tokens == 10, rows[d]
        assert rows[d].dup_spans == 1
    assert rows[1].dup_share_ppm == 10 * 1_000_000 // 14
    assert rows[2].dup_share_ppm == 10 * 1_000_000 // 13
    assert rows[3].dup_tokens == 0 and rows[3].dup_spans == 0
    assert rows[3].dup_share_ppm == 0


def test_holt_winters_recovers_planted_trend_and_season():
    """Deterministic planted series: linear trend + exact weekly pattern,
    no noise. The additive model fits it exactly in the limit; with
    alpha/beta/gamma smoothing the one-step-ahead error must shrink and
    the 7-day forecast must extrapolate the trend direction."""
    import datetime

    from local_data_pipeline_spark.operators.forecast import HORIZON, hw_additive

    d0 = datetime.date(2024, 1, 1)
    season = [0.0, 10.0, 20.0, 5.0, -5.0, 15.0, 30.0]
    days = [d0 + datetime.timedelta(days=i) for i in range(28)]
    ys = [100.0 + 3.0 * i + season[i % 7] for i in range(28)]
    rows = hw_additive(days, ys)
    fitted = [r for r in rows if r[1] == 0]
    fc = [r for r in rows if r[1] > 0]
    assert len(fitted) == 21 and len(fc) == HORIZON
    # error shrinks: last week's mean abs error < first week's
    err = [abs(r[2] - r[3]) for r in fitted]
    assert sum(err[-7:]) < sum(err[:7])
    # forecast continues the +3/day trend within smoothing tolerance
    week_ahead = [r[3] for r in fc]
    actual_would_be = [100.0 + 3.0 * (28 + h) + season[(28 + h) % 7] for h in range(7)]
    for got, want in zip(week_ahead, actual_would_be):
        # beta=0.1 trend smoothing lags a fresh +3/day ramp by a few units
        assert abs(got - want) < 8.0, (got, want)
    # forecast days are consecutive after the last observation
    assert [r[0] for r in fc] == [days[-1] + datetime.timedelta(days=h) for h in range(1, 8)]


def test_holt_winters_short_series_yields_no_rows():
    import datetime

    from local_data_pipeline_spark.operators.forecast import hw_additive

    d0 = datetime.date(2024, 1, 1)
    days = [d0 + datetime.timedelta(days=i) for i in range(14)]
    assert hw_additive(days, [float(i) for i in range(14)]) == []


def test_eval_allocation_sums_to_budget_exactly(spark):
    rows = QUERIES["eval_set_allocation_embeddings"].fn(spark, SF).collect()
    assert sum(r.final_alloc for r in rows) == 100
    assert all(r.final_alloc >= r.base_alloc for r in rows)
    assert all(r.extra_seat in (0, 1) for r in rows)
    # proportionality: no label deviates from its exact quota by >= 1 seat
    total = sum(r.n_vecs for r in rows)
    for r in rows:
        assert abs(r.final_alloc - 100 * r.n_vecs / total) < 1.0, r


def test_zipf_slope_is_negative_and_sane(spark):
    (row,) = QUERIES["zipf_slope_tokens"].fn(spark, SF).collect()
    # frequency must decay with rank; the synthetic corpus has a tiny,
    # flat vocabulary (31 terms at sf0.001) so the fit is far from the
    # natural-text -1, but it must still be a clear decay
    assert row.n_terms > 20
    assert -3.0 < row.zipf_slope < -0.05, row.zipf_slope


def test_heldout_scoring_covers_only_valid_split_and_flags_oov(spark):
    from local_data_pipeline_spark.session import load_table

    rows = QUERIES["heldout_logprob_documents"].fn(spark, SF).collect()
    d = load_table(spark, SF, "documents").select("doc_id")
    n_docs = d.count()
    # ~20% of docs land in the valid split; every scored doc has tokens
    assert 0 < len(rows) < n_docs
    assert all(r.n_toks > 0 for r in rows)
    assert all(0 <= r.n_oov <= r.n_toks for r in rows)
    # log-probs are negative: the micro-sum must be strictly negative
    assert all(r.logprob_sum_micro < 0 for r in rows)


def test_exemplar_sample_is_exactly_k_and_stable(spark):
    a = QUERIES["exemplar_sample_per_source"].fn(spark, SF).collect()
    b = QUERIES["exemplar_sample_per_source"].fn(spark, SF).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    from collections import Counter

    per_source = Counter(r.source for r in a)
    assert all(v == 5 for v in per_source.values()), per_source


def test_holt_winters_short_series_parity_with_oracle(spark, tmp_path):
    """Regression (review finding): the oracle must apply the same
    >= 15-observation guard as hw_additive. A 14-day series and a 16-day
    series in one corpus: both engines emit rows ONLY for the long one."""
    import duckdb

    sf = str(tmp_path / "sf")
    import os

    os.makedirs(sf, exist_ok=True)
    rows = [(d, float(d), "short14") for d in range(1, 15)]
    rows += [(d, float(d) * 2, "long16") for d in range(1, 17)]
    spark.createDataFrame(
        [
            (i, f"2024-01-{d:02d} 00:00:00", 1, t, v, "{}")
            for i, (d, v, t) in enumerate(rows)
        ],
        "event_id long, ts_s string, user_id long, event_type string,"
        " value double, props string",
    ).selectExpr(
        "event_id", "cast(ts_s as timestamp_ntz) as ts", "user_id",
        "event_type", "value", "props"
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf}/events.parquet")

    out = QUERIES["holt_winters_by_type"].fn(spark, sf).collect()
    assert {r.series for r in out} == {"long16"}
    assert len(out) == (16 - 7) + 7

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf}/events.parquet/*.parquet')"
    )
    oracle = con.execute(QUERIES["holt_winters_by_type"].oracle).fetchall()
    assert {r[0] for r in oracle} == {"long16"}
    assert len(oracle) == len(out)
