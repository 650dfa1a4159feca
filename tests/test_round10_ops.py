"""Round-10 (driver round 5) operator tests: product quantization
(train / encode / ADC top-k), the weighted-sampling priority math, and
the Gopher-rule quality flags."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from local_data_pipeline_spark.operators.pq import (
    adc_topk,
    exact_l2_topk,
    pq_encode,
    pq_train,
)
from local_data_pipeline_spark.session import load_table

SF = "/root/testdata/sf0.001"


def _np_codebook_encode(x, cb):
    """Driver-side numpy reference encoder (mirrors pq_encode exactly)."""
    cb = np.asarray(cb, dtype=np.float64)
    m, _, d_sub = cb.shape
    n = len(x)
    codes = np.empty((n, m), dtype=int)
    err = np.zeros(n)
    for s in range(m):
        xs = x[:, s * d_sub : (s + 1) * d_sub]
        c = cb[s]
        d = (
            (xs * xs).sum(axis=1)[:, None]
            - 2.0 * (xs @ c.T)
            + (c * c).sum(axis=1)[None, :]
        )
        codes[:, s] = np.argmin(d, axis=1)
        err += d[np.arange(n), codes[:, s]]
    return codes, np.round(np.maximum(err, 0.0) / x.shape[1], 6)


def test_pq_encode_planted_codebook_exact(spark):
    """Vectors that ARE codebook centroids encode to their own codes with
    zero reconstruction error; a perturbed vector picks the nearest."""
    # m=2 subspaces of 2 dims, k=2 codes each — tiny and fully checkable
    cb = [
        [[0.0, 0.0], [10.0, 10.0]],  # subspace 0
        [[0.0, 5.0], [5.0, 0.0]],    # subspace 1
    ]
    rows = [
        (1, [0.0, 0.0, 0.0, 5.0]),    # codes (0, 0), err 0
        (2, [10.0, 10.0, 5.0, 0.0]),  # codes (1, 1), err 0
        (3, [9.0, 9.0, 0.2, 4.9]),    # near centroid (1, 0)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r.vec_id: r for r in pq_encode(df, cb).collect()}
    assert list(got[1].codes) == [0, 0] and got[1].recon_mse == 0.0
    assert list(got[2].codes) == [1, 1] and got[2].recon_mse == 0.0
    assert list(got[3].codes) == [1, 0] and got[3].recon_mse > 0.0


def test_pq_train_encode_numpy_parity(spark):
    """The distributed trainer + encoder matches a driver-side numpy
    reference run of the identical algorithm on the same data."""
    emb = load_table(spark, SF, "embeddings")
    rows = sorted(
        ((r.vec_id, list(r.embedding)) for r in emb.collect()),
        key=lambda t: t[0],
    )
    ids = np.array([t[0] for t in rows])
    x = np.array([t[1] for t in rows], dtype=np.float64)
    m, k, iters = 4, 8, 2
    d_sub = x.shape[1] // m

    # reference trainer: same smallest-id init, same argmin/mean updates
    cb = np.stack(
        [x[:k, s * d_sub : (s + 1) * d_sub].copy() for s in range(m)]
    )
    for _ in range(iters):
        new_cb = cb.copy()
        for s in range(m):
            xs = x[:, s * d_sub : (s + 1) * d_sub]
            d = (
                (xs * xs).sum(axis=1)[:, None]
                - 2.0 * (xs @ cb[s].T)
                + (cb[s] * cb[s]).sum(axis=1)[None, :]
            )
            a = np.argmin(d, axis=1)
            for c in range(k):
                sel = a == c
                if sel.any():
                    new_cb[s][c] = xs[sel].mean(axis=0)
        cb = new_cb

    got_cb = np.asarray(pq_train(emb, m=m, k=k, n_iters=iters))
    assert got_cb.shape == cb.shape
    # exact-decimal sums vs numpy pairwise-summation means over float32
    # inputs: equal to accumulated-rounding tolerance (~1e-8 per mean)
    assert np.allclose(got_cb, cb, atol=1e-6)

    want_codes, want_err = _np_codebook_encode(x, got_cb)
    got = {
        r.vec_id: (list(r.codes), r.recon_mse)
        for r in pq_encode(emb, [[list(c) for c in s] for s in got_cb]).collect()
    }
    for i, vid in enumerate(ids):
        assert got[vid][0] == list(want_codes[i])
        assert got[vid][1] == pytest.approx(want_err[i], abs=1e-6)


def _planted_clusters(spark, n_clusters=8, per_cluster=40, dim=16, spread=0.05):
    """Deterministic clustered vectors (no RNG: md5-derived offsets) —
    the memory-safe recall fixture; uniform synthetic embeddings sit at
    the scanned-fraction floor and measure nothing."""
    import hashlib

    def h01(*args):
        b = hashlib.md5("|".join(map(str, args)).encode()).digest()
        return int.from_bytes(b[:4], "big") / 2**32

    rows = []
    vid = 0
    for c in range(n_clusters):
        center = [h01("center", c, d) * 10 for d in range(dim)]
        for i in range(per_cluster):
            vec = [
                center[d] + (h01("off", c, i, d) - 0.5) * spread
                for d in range(dim)
            ]
            rows.append((vid, vec, c))
            vid += 1
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, cluster int"
    )


def test_adc_topk_cluster_recall_on_planted_clusters(spark):
    """What PQ actually promises on lossy codes is COARSE neighborhood
    preservation: with well-separated planted clusters, every ADC top-10
    neighbor must come from the query's own cluster (exact intra-cluster
    micro-ranking among near-identical points is NOT recoverable from
    quantized codes — the lossless test below pins the exact-equality
    end of the contract)."""
    df = _planted_clusters(spark)
    emb = df.select("vec_id", "embedding")
    qs = emb.filter(F.col("vec_id") % 40 == 0)  # one query per cluster
    cb = pq_train(emb, m=4, k=16, n_iters=3)
    codes = pq_encode(emb, cb)
    approx = adc_topk(qs, codes, cb, k=10)
    truth = {r.vec_id: r.cluster for r in df.select("vec_id", "cluster").collect()}
    got = approx.select("query_id", "neighbor_id").collect()
    assert len(got) == qs.count() * 10
    in_cluster = sum(
        1 for r in got if truth[r.neighbor_id] == truth[r.query_id]
    )
    assert in_cluster / len(got) >= 0.9, in_cluster / len(got)


def test_gopher_rules_planted_flag_boundaries(spark, tmp_path):
    """Each Gopher flag trips on the document engineered to violate
    exactly it (and only it)."""
    import os

    from local_data_pipeline_spark.queries import QUERIES

    rows = [
        # (doc_id, text): good doc passes all rules
        (1, "the quick brown fox jumps over a lazy dog near the river bank"),
        # too few words (< 5)
        (2, "the cat sat"),
        # mean word length > 10 (milli > 10000) but enough words
        (3, " ".join(["supercalifragilistic"] * 6 + ["the"])),
        # all-numeric tokens: alpha fraction 0, no stopwords
        (4, "11 22 33 44 55 66 77 88"),
        # no stopwords but alphabetic and sized fine
        (5, "quick brown fox jumps over lazy dog near river bank"),
    ]
    pdf = [(i, t, "en", "srcX", len(t)) for i, t in rows]
    df = spark.createDataFrame(
        pdf, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = str(tmp_path / "gopher")
    os.makedirs(d)
    df.coalesce(1).write.parquet(d + "/documents.parquet")
    got = {
        r.doc_id: r
        for r in QUERIES["gopher_quality_rules_documents"].fn(spark, d).collect()
    }
    assert got[1].passes_gopher
    assert not got[2].words_ok and not got[2].passes_gopher
    assert not got[3].mean_len_ok and got[3].words_ok
    assert not got[4].alpha_ok and not got[4].stop_ok
    assert got[5].alpha_ok and not got[5].stop_ok and not got[5].passes_gopher


def test_weighted_sample_priority_is_exact_and_weight_monotone(spark):
    """weighted_sample_per_source: the sequential-Poisson priority matches a driver-side integer
    reference exactly, and for a FIXED hash a larger weight strictly
    lowers the priority (longer docs likelier)."""
    import hashlib

    from local_data_pipeline_spark.queries import QUERIES

    got = {
        r.doc_id: r.priority
        for r in QUERIES["weighted_sample_per_source"]
        .fn(spark, SF)
        .collect()
    }
    assert got  # sample is non-empty
    d = load_table(spark, SF, "documents").select("doc_id", "n_chars").collect()
    chars = {r.doc_id: r.n_chars for r in d}
    for doc_id, priority in got.items():
        u = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) + 1
        assert priority == (u * 1_000_000) // max(chars[doc_id], 1)
    # monotone in weight for fixed u
    u = 12345
    assert (u * 1_000_000) // 100 > (u * 1_000_000) // 1000


def test_ivf_bucketed_index_prunes_partitions_and_matches_ivf_topk(
    spark, tmp_path
):
    """The persisted IVF layout: searching a cell-partitioned index
    (1) partition-prunes the scan to the probed cells — visible as a
    cell PartitionFilter and a pruned selected-partition count — and
    (2) returns exactly what the in-memory ivf_topk computes with the
    same quantizer/probes."""
    from local_data_pipeline_spark.operators.similarity import (
        ivf_search_bucketed,
        ivf_topk,
        ivf_write_bucketed,
    )

    emb = load_table(spark, SF, "embeddings")
    qs = emb.filter(F.col("vec_id") < 10)
    path = str(tmp_path / "ivf_idx")
    ivf_write_bucketed(emb, path, n_centroids=16)

    got = ivf_search_bucketed(spark, path, qs, k=5, n_probe=2)
    plan = got._jdf.queryExecution().executedPlan().toString()
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "cell" in m.group(1), plan[:500]

    want = {
        (r.query_id, r.rank): (r.neighbor_id, r.cos_sim)
        for r in ivf_topk(qs, emb, k=5, n_centroids=16, n_probe=2).collect()
    }
    res = {
        (r.query_id, r.rank): (r.neighbor_id, r.cos_sim)
        for r in got.collect()
    }
    assert res == want

    # pruning is real: the filtered scan actually READS only the probed
    # cell directories (input_file_name over the executed scan — the
    # static inputFiles() listing ignores filters)
    def files_read(df):
        return {
            r[0] for r in df.select(F.input_file_name()).distinct().collect()
        }

    full = files_read(spark.read.parquet(path))
    probed = files_read(
        spark.read.parquet(path).filter(F.col("cell").isin([0, 1]))
    )
    assert probed and len(probed) < len(full)
    assert all("cell=0/" in f or "cell=1/" in f for f in probed)


def test_viterbi_segmentation_planted_vocab():
    """Viterbi picks the max-log-prob segmentation, prefers the longer
    final piece on ties, and falls back to UNK single chars."""
    import math

    from local_data_pipeline_spark.operators.ml import viterbi_segment_local

    vocab = {
        "a": math.log(0.1),
        "b": math.log(0.1),
        "ab": math.log(0.3),
        "abc": math.log(0.4),
        "c": math.log(0.1),
    }
    # 'abc' as one piece (0.4) beats ab+c (0.03) and a+b+c (0.001)
    assert viterbi_segment_local("abc", vocab) == ["abc"]
    # 'abab': ab+ab = 0.09 beats a+b+ab etc.
    assert viterbi_segment_local("abab", vocab) == ["ab", "ab"]
    # unknown char 'z' segments as UNK without failing
    assert viterbi_segment_local("azb", vocab) == ["a", "z", "b"]
    assert viterbi_segment_local("", vocab) == []
    # tie preference: with p(ab)=p(a)*p(b), the LONGER piece wins
    v2 = {"a": math.log(0.2), "b": math.log(0.2), "ab": math.log(0.04)}
    assert viterbi_segment_local("ab", v2) == ["ab"]


def test_unigram_encode_matches_local_viterbi(spark):
    """Distributed encode == per-word local Viterbi under the same
    trained vocabulary, and the vocabulary covers every character."""
    from local_data_pipeline_spark.operators.ml import (
        unigram_viterbi_encode,
        unigram_vocab,
        viterbi_segment_local,
    )

    d = load_table(spark, SF, "documents")
    vocab = unigram_vocab(d, vocab_size=64, max_piece_len=5)
    assert all(len(p) <= 5 for p in vocab)
    got = {
        r.doc_id: (r.n_words, r.n_pieces, list(r.pieces))
        for r in unigram_viterbi_encode(d.limit(30), vocab).collect()
    }
    rows = d.limit(30).select("doc_id", "text").collect()
    for r in rows:
        words = r.text.strip().lower().split()
        want: list[str] = []
        for w in words:
            want.extend(viterbi_segment_local(w, vocab))
        assert got[r.doc_id] == (len(words), len(want), want)
    # every emitted piece is in-vocab (full char coverage on this corpus)
    assert all(
        p in vocab for _, _, pieces in got.values() for p in pieces
    )


def test_hll_daily_to_monthly_tracks_exact_distinct(spark):
    """The day-sketch union estimate stays within HLL(lgK=14) error of
    the exact monthly distinct count (~1% rsd at lgK 14; bound at 5%):
    the query now computes both sides itself and emits the within-bound
    flag (round-8 oracle graduation) — pin that the flag is 1 everywhere
    and that the exact column matches an independent recompute."""
    from local_data_pipeline_spark.queries import QUERIES

    got = {
        (str(r.month), r.event_type): r
        for r in QUERIES["hll_daily_to_monthly_users"].fn(spark, SF).collect()
    }
    e = load_table(spark, SF, "events")
    exact = {
        (str(r.month), r.event_type): r.n
        for r in e.select(
            F.date_trunc("month", "ts").cast("date").alias("month"),
            "event_type",
            "user_id",
        )
        .groupBy("month", "event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(got) == set(exact)
    for k, r in got.items():
        assert r.union_ok == 1, (k, r)
        assert r.exact_monthly_users == exact[k], (k, r)


def test_ridge_fit_matches_local_reference(spark):
    """Distributed normal-equations ridge == single-node reference on
    the same features (and the fit is sane: n_chars grows with tokens)."""
    from local_data_pipeline_spark.operators.ml import ridge_fit, ridge_fit_local

    d = load_table(spark, SF, "documents")
    feats = d.select(
        F.size(F.split(F.trim(F.lower("text")), r"\s+")).cast("double").alias("nw"),
        F.length("text").cast("double").alias("nc"),
    ).withColumn("label", F.col("nc"))
    beta = ridge_fit(feats, ["nw"], "label", lam=1.0)

    rows = feats.select("nw", "label").collect()
    x = np.array([[r.nw] for r in rows])
    y = np.array([r.label for r in rows])
    want = ridge_fit_local(x, y, lam=1.0)
    assert np.allclose(beta, want, rtol=1e-8)
    assert beta[1] > 0  # more words -> more chars


def test_adc_matches_exact_when_codebook_is_lossless(spark):
    """With one code per distinct sub-vector (k >= distinct sub-vectors),
    quantization is lossless and ADC == exact L2 ranking exactly."""
    rows = [
        (1, [0.0, 0.0, 1.0, 1.0]),
        (2, [0.0, 0.0, 2.0, 2.0]),
        (3, [5.0, 5.0, 1.0, 1.0]),
        (4, [5.0, 5.0, 2.0, 2.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cb = pq_train(df, m=2, k=4, n_iters=3)
    codes = pq_encode(df, cb)
    enc = {r.vec_id: r.recon_mse for r in codes.collect()}
    assert all(v == 0.0 for v in enc.values()), enc  # lossless
    a = {
        (r.query_id, r.rnk): r.neighbor_id
        for r in adc_topk(df, codes, cb, k=3).collect()
    }
    e = {
        (r.query_id, r.rnk): r.neighbor_id
        for r in exact_l2_topk(df, df, k=3).collect()
    }
    assert a == e
