"""Round-7 additions: information metrics, survivorship dedup, sketch
accuracy — properties the DuckDB oracle can't express."""

from pyspark.sql import functions as F

from local_data_pipeline_spark.queries import QUERIES

SF = "/root/testdata/sf0.01"


def test_hll_error_within_advertised_rsd(spark):
    """approx_count_distinct must land within ~3x its advertised relative
    standard deviation of the exact count at both precisions (3 sigma —
    the bound a rollup owner would size alerting by), and the finer
    sketch must not be WORSE on aggregate."""
    rows = QUERIES["hll_distinct_error_eval"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.ok_rsd05 == 1, r
        assert r.ok_rsd01 == 1, r
    # finer-is-not-worse on aggregate: recompute the realized errors
    # directly (the query itself only hashes the within-bound flags)
    from pyspark.sql import functions as F
    from local_data_pipeline_spark.session import load_table

    ev = load_table(spark, SF, "events")
    errs = (
        ev.groupBy("event_type")
        .agg(
            F.count_distinct("user_id").cast("double").alias("exact"),
            F.approx_count_distinct("user_id", 0.05).alias("h05"),
            F.approx_count_distinct("user_id", 0.01).alias("h01"),
        )
        .select(
            (F.abs(F.col("h05") - F.col("exact")) / F.col("exact")).alias("e05"),
            (F.abs(F.col("h01") - F.col("exact")) / F.col("exact")).alias("e01"),
        )
        .collect()
    )
    mean05 = sum(r.e05 for r in errs) / len(errs)
    mean01 = sum(r.e01 for r in errs) / len(errs)
    assert mean01 <= mean05 + 1e-9


def test_kl_divergence_nonnegative_and_finite(spark):
    """Gibbs' inequality: KL(P_s || P_corpus) >= 0 for every source (up
    to the term-rounding epsilon), and finite — every source token is in
    the corpus by construction so no term divides by zero."""
    rows = QUERIES["kl_divergence_source_tokens"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.kl_nats is not None and r.kl_nats >= -1e-4, r


def test_entropy_bounds_and_dominant_share(spark):
    """0 <= H <= ln(n_langs); dominant share in (0, 1]; a single-language
    source would pin H = 0 and share = 1."""
    import math

    rows = QUERIES["entropy_source_lang_mix"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert -1e-9 <= r.lang_entropy_nats <= math.log(r.n_langs) + 1e-6, r
        assert 0 < r.dominant_share <= 1


def test_survivor_policy_keeps_longest_variant(spark):
    """Planted truncation variants: three docs sharing a 16-token head
    with different lengths — the survivor must be the longest, not the
    lowest doc_id, and the group flags policy_changed_pick."""
    import os
    import tempfile

    head = " ".join(f"w{i}" for i in range(16))
    rows = [
        (1, head + " tail", "s1", len(head) + 5),
        (2, head + " much longer tail text here", "s1", len(head) + 27),
        (3, head, "s2", len(head)),
        (4, "completely unrelated document text " * 3, "s1", 105),
    ]
    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(
            rows, "doc_id bigint, text string, source string, n_chars bigint"
        ).write.parquet(os.path.join(td, "documents.parquet"))
        out = QUERIES["dedup_survivor_quality"].fn(spark, td).collect()
    assert len(out) == 1
    g = out[0]
    assert g.n_dups == 3
    assert g.survivor_doc_id == 2  # longest, NOT min doc_id
    assert bool(g.policy_changed_pick) is True


def test_psi_zero_for_corpus_identical_source(spark):
    """A source whose length distribution IS the corpus distribution has
    PSI ~ 0; a shifted source scores strictly higher. Planted: two
    sources with identical bin histograms, one source concentrated in a
    different length band."""
    import os
    import tempfile

    rows = []
    did = 0
    # sources a and b: 50/50 mix of short (bin 0) and mid (bin 2) docs;
    # source c shares the SAME support but shifted to 90/10 — shared
    # support keeps the 1e-6 zero-bin clamp out of play, so the scores
    # are pure proportion-shift PSI (expected: a=b~0.073, c~0.44)
    for src in ("a", "b"):
        for _ in range(20):
            rows.append((did, "x " * 50, src, 100)); did += 1
            rows.append((did, "y " * 225, src, 450)); did += 1
    for _ in range(36):
        rows.append((did, "x " * 50, "c", 100)); did += 1
    for _ in range(4):
        rows.append((did, "y " * 225, "c", 450)); did += 1
    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(
            rows, "doc_id bigint, text string, source string, n_chars bigint"
        ).write.parquet(os.path.join(td, "documents.parquet"))
        got = {
            r.source: r.psi
            for r in QUERIES["psi_length_drift_sources"].fn(spark, td).collect()
        }
    assert got["a"] == got["b"]       # identical dists, identical score
    assert got["c"] > 0.2             # the shifted source crosses alert level
    assert got["a"] < 0.2             # in-distribution sources stay below it
    assert got["c"] > got["a"]


def test_pack_split_report_consistent_with_offsets(spark):
    """The split counts must equal a direct recomputation from the
    packing offsets: sum over docs of boundaries crossed, and every doc
    shorter than the window can split at most once per 2048 tokens."""
    from local_data_pipeline_spark.queries import QUERIES as Q

    rep = {
        r.source: r for r in Q["pack_boundary_split_report"].fn(spark, SF).collect()
    }
    packed = Q["pack_training_sequences"].fn(spark, SF).collect()
    docs = {
        r.doc_id: r for r in packed
    }
    # recompute from the oracle-checked packing offsets
    from collections import defaultdict
    import math

    src_of = {
        r.doc_id: r.source
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "source")
        .collect()
    }
    want = defaultdict(lambda: [0, 0, 0])  # n_docs, n_split, total
    for d in docs.values():
        ns = 0 if d.n_tokens == 0 else (d.start_offset % 2048 + d.n_tokens - 1) // 2048
        w = want[src_of[d.doc_id]]
        w[0] += 1
        w[1] += 1 if ns > 0 else 0
        w[2] += ns
    assert set(rep) == set(want)
    for s, r in rep.items():
        assert [r.n_docs, r.n_split_docs, r.total_splits] == want[s], s
        assert math.isclose(r.split_rate, round(want[s][1] / want[s][0], 6))
