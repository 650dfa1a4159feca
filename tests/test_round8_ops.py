"""Round-8 operator tests: boundary-respecting bin packing, epoch
mixture planning, and the q12 ship-band adaptation's band edges."""

import math

from pyspark.sql import functions as F

from local_data_pipeline_spark.operators.packing import bin_pack_nfd
from local_data_pipeline_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"
CAP = 2048


def test_bin_pack_invariants_on_corpus(spark):
    """Every document lands in exactly one bin; no bin exceeds capacity
    unless it is a dedicated oversize bin (single doc over capacity);
    bin indices are contiguous from 1 within each shard."""
    from local_data_pipeline_spark.functions import text as TX
    from local_data_pipeline_spark.session import load_table

    d = load_table(spark, SF, "documents").select(
        "doc_id", F.size(TX.tokens(F.col("text"))).cast("bigint").alias("w")
    )
    n_docs = d.count()
    packed = bin_pack_nfd(d, "doc_id", "w", capacity=CAP, n_shards=8).collect()
    assert len(packed) == n_docs
    assert len({r.doc_id for r in packed}) == n_docs
    from collections import defaultdict

    fills = defaultdict(list)
    for r in packed:
        fills[(r.shard, r.bin_idx)].append(r.w)
    for (_shard, _bin), ws in fills.items():
        if sum(ws) > CAP:
            assert len(ws) == 1 and ws[0] > CAP  # dedicated oversize bin
    shard_bins = defaultdict(set)
    for r in packed:
        shard_bins[r.shard].add(r.bin_idx)
    for s, bins in shard_bins.items():
        assert bins == set(range(1, max(bins) + 1)), s


def test_bin_pack_planted_nfd_order(spark):
    """Deterministic next-fit-decreasing on a hand-checkable shard:
    weights [1000, 900, 600, 500, 100] at capacity 2048 pack as
    {1000,900} then {600,500,100}; an oversize item gets its own bin
    and closes it (remaining 0)."""
    rows = [(i, w) for i, w in enumerate([1000, 900, 600, 500, 100, 5000])]
    df = spark.createDataFrame(rows, "doc_id bigint, w bigint")
    got = {
        r.doc_id: r.bin_idx
        for r in bin_pack_nfd(df, "doc_id", "w", capacity=CAP, n_shards=1).collect()
    }
    # NFD order: 5000, 1000, 900, 600, 500, 100
    # 5000 -> bin 1 (oversize, remaining 0); 1000 -> bin 2; 900 joins
    # (rem 148); 600 -> bin 3; 500 joins (rem 948); 100 joins (rem 848)
    assert got == {5: 1, 0: 2, 1: 2, 2: 3, 3: 3, 4: 3}


def test_bin_pack_partitioning_insensitive(spark):
    """The packing is a pure function of ids and weights — identical
    under a different input partitioning."""
    rows = [(i, (i * 37) % 900 + 10) for i in range(500)]
    a = spark.createDataFrame(rows, "doc_id bigint, w bigint")
    b = a.repartition(13, "w")
    pack = lambda df: sorted(
        (r.doc_id, r.shard, r.bin_idx)
        for r in bin_pack_nfd(df, "doc_id", "w", capacity=CAP, n_shards=4).collect()
    )
    assert pack(a) == pack(b)


def test_epoch_mixture_balanced_and_capped(spark):
    """Equal sources get weight 1/k and exactly 1.0 epochs; a tiny
    source is sqrt-upweighted, hits the 4-pass ceiling, and is flagged
    capped while a large source stays under 1 epoch."""
    import os
    import tempfile

    rows = []
    did = 0
    for _ in range(100):
        rows.append((did, "tok " * 400, "big", "en")); did += 1
    for _ in range(2):
        rows.append((did, "tok " * 2, "tiny", "en")); did += 1
    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(
            rows, "doc_id bigint, text string, source string, lang string"
        ).write.parquet(os.path.join(td, "documents.parquet"))
        got = {
            r.source: r
            for r in QUERIES["epoch_mixture_plan_sources"].fn(spark, td).collect()
        }
    big, tiny = got["big"], got["tiny"]
    assert big.n_tokens == 40000 and tiny.n_tokens == 4
    # sqrt weights: 200 vs 2 -> tiny gets ~1% of the budget = ~99 epochs
    assert tiny.capped and tiny.epochs == 4.0 and tiny.epochs_raw > 50
    assert not big.capped and big.epochs < 1.0
    assert math.isclose(big.weight + tiny.weight, 1.0, abs_tol=2e-6)


def test_epoch_mixture_equal_sources(spark):
    import os
    import tempfile

    rows = []
    did = 0
    for src in ("a", "b", "c", "d"):
        for _ in range(10):
            rows.append((did, "x " * 100, src, "en")); did += 1
    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(
            rows, "doc_id bigint, text string, source string, lang string"
        ).write.parquet(os.path.join(td, "documents.parquet"))
        out = QUERIES["epoch_mixture_plan_sources"].fn(spark, td).collect()
    assert len(out) == 4
    for r in out:
        assert r.weight == 0.25 and r.epochs == 1.0 and not r.capped


def test_q12_band_edges(spark):
    """Band boundaries are inclusive at 15 and 45 days (<=), matching
    the oracle's CASE."""
    import os
    import tempfile

    import datetime as dt

    base = dt.datetime(1996, 3, 1)
    orders = [
        (1, "1-URGENT", base),
        (2, "5-LOW", base),
        (3, "2-HIGH", base),
    ]
    lines = [
        (1, base + dt.timedelta(days=15)),  # FAST edge
        (2, base + dt.timedelta(days=45)),  # REGULAR edge
        (3, base + dt.timedelta(days=46)),  # SLOW
    ]
    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(
            orders, "o_orderkey bigint, o_orderpriority string, o_orderdate timestamp_ntz"
        ).write.parquet(os.path.join(td, "orders.parquet"))
        spark.createDataFrame(
            lines, "l_orderkey bigint, l_shipdate timestamp_ntz"
        ).write.parquet(os.path.join(td, "lineitem.parquet"))
        got = {
            r.ship_band: (r.high_line_count, r.low_line_count)
            for r in QUERIES["q12_shipband_priority"].fn(spark, td).collect()
        }
    assert got == {"FAST": (1, 0), "REGULAR": (0, 1), "SLOW": (1, 0)}


def test_rrf_dual_leg_beats_single_leg(spark):
    """A document retrieved by BOTH legs (lexical match + nearest dense
    neighbor) outranks one retrieved by the dense leg alone; documents
    outside the lexical posting list carry a null sparse rank."""
    import os
    import tempfile

    docs = [
        (0, "the query anchor document", "a", "en"),
        (1, "spark join fast spark", "a", "en"),      # lexical + dense hit
        (2, "nothing relevant here at all", "a", "en"),  # dense-only
        (3, "spark appears once", "a", "en"),          # lexical, dense-far
    ]
    vecs = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.99, 0.1, 0.0]),   # nearest to the query vector
        (2, [0.9, 0.2, 0.1]),    # second-nearest
        (3, [0.0, 0.0, 1.0]),    # orthogonal
    ]
    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(
            docs, "doc_id bigint, text string, source string, lang string"
        ).write.parquet(os.path.join(td, "documents.parquet"))
        spark.createDataFrame(
            vecs, "vec_id bigint, embedding array<float>"
        ).write.parquet(os.path.join(td, "embeddings.parquet"))
        rows = {
            r.doc_id: r
            for r in QUERIES["hybrid_rrf_search_documents"].fn(spark, td).collect()
        }
    assert rows[1].r_sparse is not None and rows[2].r_sparse is None
    assert rows[1].rrf_score > rows[2].rrf_score
    # every corpus doc appears (dense leg ranks the whole corpus)
    assert set(rows) == {0, 1, 2, 3}
    # dense ranks are a permutation of 1..4
    assert sorted(r.r_dense for r in rows.values()) == [1, 2, 3, 4]


def test_tokenizer_fertility_planted(spark):
    import os
    import tempfile

    docs = [
        (0, "ab cd", "x", "en"),   # 2 words, 2 subwords, 5 chars
        (1, "a,b", "x", "fr"),     # 1 word, 3 subwords ('a' ',' 'b')
    ]
    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(
            docs, "doc_id bigint, text string, source string, lang string"
        ).write.parquet(os.path.join(td, "documents.parquet"))
        got = {
            r.lang: r
            for r in QUERIES["tokenizer_fertility_by_lang"].fn(spark, td).collect()
        }
    assert got["en"].ws_tokens == 2 and got["en"].bpe_tokens == 2
    assert got["en"].fertility == 1.0 and got["en"].chars_per_token == 2.5
    assert got["fr"].ws_tokens == 1 and got["fr"].bpe_tokens == 3
    assert got["fr"].fertility == 3.0


def test_cdc_compact_and_apply_planted(spark):
    """Latest change per key wins regardless of arrival order; U inserts
    or replaces, D deletes, untouched keys pass through unchanged."""
    from local_data_pipeline_spark.operators.cdc import (
        apply_changes,
        compact_changelog,
    )

    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k bigint, name string, v double",
    )
    changes = spark.createDataFrame(
        [
            (2, "b2", 21.0, "U", 5),   # later version, listed first
            (2, "b1", 20.5, "U", 1),
            (3, None, None, "D", 1),
            (9, "new", 90.0, "U", 1),
            (9, None, None, "D", 0),   # stale delete loses to the upsert
        ],
        "k bigint, name string, v double, op string, seq bigint",
    )
    merged = apply_changes(
        target, compact_changelog(changes, "k", "seq"), "k"
    )
    got = {r.k: (r.name, r.v) for r in merged.collect()}
    assert got == {1: ("a", 10.0), 2: ("b2", 21.0), 9: ("new", 90.0)}
    assert merged.columns == target.columns


def test_cdc_apply_rejects_missing_columns(spark):
    from local_data_pipeline_spark.operators.cdc import apply_changes
    import pytest

    target = spark.createDataFrame([(1, "a")], "k bigint, name string")
    changes = spark.createDataFrame([(1, "U")], "k bigint, op string")
    with pytest.raises(ValueError, match="name"):
        apply_changes(target, changes, "k")


def test_cdc_apply_rejects_invalid_op(spark):
    """Round-5 ADVICE fix: an op outside OPS (e.g. an unfiltered Debezium
    'r' snapshot row) raises at execution instead of silently inserting an
    all-NULL payload row for a new key."""
    import pytest
    from py4j.protocol import Py4JJavaError

    from local_data_pipeline_spark.operators.cdc import apply_changes

    target = spark.createDataFrame([(1, "a")], "k bigint, name string")
    changes = spark.createDataFrame(
        [(9, "snap", "r")], "k bigint, name string, op string"
    )
    with pytest.raises(Exception, match="invalid changelog op") as ei:
        apply_changes(target, changes, "k").collect()
    assert isinstance(ei.value, Py4JJavaError) or "invalid changelog op" in str(
        ei.value
    )


def test_cdc_compact_requires_op_column(spark):
    """compact_changelog validates that the op column survives into the
    compacted payload — apply_changes needs it downstream."""
    import pytest

    from local_data_pipeline_spark.operators.cdc import compact_changelog

    changes = spark.createDataFrame(
        [(1, "a", 1)], "k bigint, name string, seq bigint"
    )
    with pytest.raises(ValueError, match="op column"):
        compact_changelog(changes, "k", "seq")


def test_split_leakage_detects_planted_cross_split_dup(spark):
    """Identical text under doc_ids hashing to train and test shows up
    as one train-test leak group with both docs counted."""
    import hashlib
    import os
    import tempfile

    bucket = lambda i: int(
        hashlib.md5(str(i).encode()).hexdigest()[:8], 16
    ) % 100
    train_id = next(i for i in range(1000) if bucket(i) < 80)
    test_id = next(i for i in range(1000) if bucket(i) >= 90)
    lone_id = next(
        i for i in range(1000) if bucket(i) < 80 and i != train_id
    )
    docs = [
        (train_id, "the shared leaked document", "a", "en"),
        (test_id, "the shared leaked document", "a", "en"),
        (lone_id, "a unique document", "a", "en"),
    ]
    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(
            docs, "doc_id bigint, text string, source string, lang string"
        ).write.parquet(os.path.join(td, "documents.parquet"))
        (row,) = QUERIES["split_leakage_audit"].fn(spark, td).collect()
    assert row.content_groups == 2
    assert row.dup_groups == 1
    assert row.train_test_leaks == 1
    assert row.train_valid_leaks == 0 and row.valid_test_leaks == 0
    assert row.leaked_docs == 2


def test_label_balance_planted(spark):
    """75/25 two-label split: imbalance 3.0, normalized entropy
    -(0.75 ln 0.75 + 0.25 ln 0.25)/ln 2 ~ 0.811278."""
    import os
    import tempfile

    rows = [(i, [1.0, 0.0], 0) for i in range(75)] + [
        (75 + i, [0.0, 1.0], 1) for i in range(25)
    ]
    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(
            rows, "vec_id bigint, embedding array<float>, label bigint"
        ).write.parquet(os.path.join(td, "embeddings.parquet"))
        (row,) = QUERIES["label_balance_embeddings"].fn(spark, td).collect()
    assert row.n_labels == 2 and row.n_vectors == 100
    assert row.max_n == 75 and row.min_n == 25
    assert row.imbalance_ratio == 3.0
    assert abs(row.entropy_norm - 0.811278) < 1e-6


def test_source_fair_cutoff_order_statistic(spark):
    """Per source, the cutoff is the quality value at rank ceil(0.4 n):
    strictly-below count stays under the rank, at-or-below reaches it."""
    from local_data_pipeline_spark.functions import text as TX
    from local_data_pipeline_spark.session import load_table

    cuts = {
        r.source: r
        for r in QUERIES["source_fair_quality_cutoffs"].fn(spark, SF).collect()
    }
    scored = (
        load_table(spark, SF, "documents")
        .select("source", TX.quality_score(F.col("text")).alias("q"))
        .collect()
    )
    from collections import defaultdict

    by_src = defaultdict(list)
    for r in scored:
        by_src[r.source].append(r.q)
    assert set(cuts) == set(by_src)
    for s, qs in by_src.items():
        n, cut = cuts[s].n_docs, cuts[s].cutoff
        assert n == len(qs)
        r_star = (2 * n + 4) // 5  # ceil(0.4 n)
        assert sum(1 for q in qs if q < cut) < r_star
        assert sum(1 for q in qs if q <= cut) >= r_star


def test_text_embedding_norm_corr_planted(spark):
    """Norm proportional to n_chars -> corr 1.0; constant norm -> NULL
    (zero variance guard)."""
    import os
    import tempfile

    docs = [(i, "x", "a", 100 + i * 10) for i in range(10)]
    prop = [(i, [float(100 + i * 10), 0.0], 0) for i in range(5)]
    const = [(i, [2.0, 0.0], 1) for i in range(5, 10)]
    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(
            docs, "doc_id bigint, text string, source string, n_chars bigint"
        ).write.parquet(os.path.join(td, "documents.parquet"))
        spark.createDataFrame(
            prop + const, "vec_id bigint, embedding array<float>, label bigint"
        ).write.parquet(os.path.join(td, "embeddings.parquet"))
        got = {
            r.label: r.corr_chars_norm
            for r in QUERIES["text_embedding_norm_corr"].fn(spark, td).collect()
        }
    assert got[0] == 1.0
    assert got[1] is None


def test_percentile_sketch_rank_guarantee(spark):
    """approx_percentile at accuracy 1000 must land within 1/1000 of the
    target rank (plus tie slack): the guarantee the sketch actually
    makes, checked on the real event values. Since the round-8 oracle
    graduation the query computes the realized-rank check itself and
    emits one flag per quantile — pin the flags and the exact ordering."""
    rows = QUERIES["percentile_sketch_error_eval"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.rank_ok_p50 == 1, r
        assert r.rank_ok_p95 == 1, r
        assert r.exact_p50 <= r.exact_p95, r
        assert r.n > 0


def test_cep_pattern_planted_sessions(spark):
    """Planted sessions pin the pattern semantics: an error breaks the
    click->purchase run, views/signups don't, matches don't overlap, and
    a >30-min gap splits the session (killing a would-be match)."""
    import datetime as dt
    import os
    import tempfile

    t0 = dt.datetime(2026, 1, 1, 12, 0)
    m = lambda k: t0 + dt.timedelta(minutes=k)

    def ev(eid, uid, ts, typ):
        return (eid, ts, uid, typ, 1.0)

    rows = [
        # user 1, one session: c v p c e p c s p  -> matches: cvp, csp = 2
        ev(1, 1, m(0), "click"), ev(2, 1, m(1), "view"), ev(3, 1, m(2), "purchase"),
        ev(4, 1, m(3), "click"), ev(5, 1, m(4), "error"), ev(6, 1, m(5), "purchase"),
        ev(7, 1, m(6), "click"), ev(8, 1, m(7), "signup"), ev(9, 1, m(8), "purchase"),
        # user 2: click ... 40-min gap ... purchase -> two sessions, 0 matches
        ev(10, 2, m(0), "click"), ev(11, 2, m(40), "purchase"),
    ]
    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(
            rows,
            "event_id bigint, ts timestamp_ntz, user_id bigint, "
            "event_type string, value double",
        ).write.parquet(os.path.join(td, "events.parquet"))
        got = {
            r.n_matches: r.n_sessions
            for r in QUERIES["cep_click_purchase_sessions"].fn(spark, td).collect()
        }
    # user 1: one session with 2 matches; user 2: two sessions with 0
    assert got == {2: 1, 0: 2}


def test_quality_threshold_sweep_monotone(spark):
    """Within a source, kept_docs is non-increasing in the threshold and
    consistent with the per-source p40 cutoff query: at any threshold at
    or below the cutoff, at least 60% of docs survive."""
    sweep = QUERIES["quality_threshold_sweep"].fn(spark, SF).collect()
    cuts = {
        r.source: r.cutoff
        for r in QUERIES["source_fair_quality_cutoffs"].fn(spark, SF).collect()
    }
    from collections import defaultdict

    by_src = defaultdict(dict)
    for r in sweep:
        by_src[r.source][r.thr] = r
    for src, rows in by_src.items():
        thrs = sorted(rows)
        assert len(thrs) == 7
        for a, b in zip(thrs, thrs[1:]):
            assert rows[a].kept_docs >= rows[b].kept_docs
            assert rows[a].n_docs == rows[b].n_docs
        for t in thrs:
            if t <= cuts[src]:
                assert rows[t].kept_frac >= 0.6 - 1e-9, (src, t)


def test_label_separability_planted_clusters(spark):
    """Two tight, far-apart planted clusters separate cleanly
    (separability >> 1); interleaving the labels on the same points
    destroys it (separability < 1)."""
    import os
    import tempfile

    def write(td, rows):
        spark.createDataFrame(
            rows, "vec_id bigint, embedding array<float>, label bigint"
        ).write.mode("overwrite").parquet(os.path.join(td, "embeddings.parquet"))

    # cluster 0 around (0,0), cluster 1 around (10,10); jitter 0.1
    tight = [
        (i, [0.0 + (i % 3) * 0.1, 0.0 + (i % 2) * 0.1], 0) for i in range(6)
    ] + [
        (6 + i, [10.0 + (i % 3) * 0.1, 10.0 + (i % 2) * 0.1], 1)
        for i in range(6)
    ]
    with tempfile.TemporaryDirectory() as td:
        write(td, tight)
        good = {
            r.label: r
            for r in QUERIES["label_separability_embeddings"].fn(spark, td).collect()
        }
        # labels assigned at random across BOTH blobs: centroids collide
        mixed = [
            (i, vec, i % 2) for i, (vid, vec, lab) in enumerate(tight)
        ]
        write(td, mixed)
        bad = {
            r.label: r
            for r in QUERIES["label_separability_embeddings"].fn(spark, td).collect()
        }
    for lab in (0, 1):
        assert good[lab].separability > 10
        assert bad[lab].separability < 1
        assert good[lab].n == 6 and bad[lab].n == 6


def test_shingle_novelty_curve_planted(spark):
    """A corpus whose second half repeats the first half flattens after
    bucket 4; a corpus of all-new content keeps adding shingles in every
    bucket. Cumulative count ends at the distinct-shingle total."""
    import os
    import tempfile

    def doc(i, words):
        return (i, " ".join(words), "a", "en")

    # 10 docs, ids 0..9 -> bucket = doc_id (m=10). Each doc has 5 tokens
    # (3 shingles + boundary partials are full here).
    fresh = [doc(i, [f"w{i}_{j}" for j in range(5)]) for i in range(10)]
    stale = [doc(i, [f"w{i % 5}_{j}" for j in range(5)]) for i in range(10)]
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "documents.parquet")
        spark.createDataFrame(
            fresh, "doc_id bigint, text string, source string, lang string"
        ).write.mode("overwrite").parquet(p)
        f = {r.bucket: r for r in QUERIES["shingle_novelty_curve"].fn(spark, td).collect()}
        spark.createDataFrame(
            stale, "doc_id bigint, text string, source string, lang string"
        ).write.mode("overwrite").parquet(p)
        s = {r.bucket: r for r in QUERIES["shingle_novelty_curve"].fn(spark, td).collect()}
    assert set(f) == set(range(10))          # novelty in every decile
    per_doc = f[0].new_shingles
    assert all(f[b].new_shingles == per_doc for b in f)
    assert f[9].cum_shingles == 10 * per_doc
    assert set(s) == set(range(5))           # flat after the repeat point
    assert s[4].cum_shingles == 5 * per_doc
