"""Round-11 (driver round 5, session 11) operator tests: label
propagation communities, the snapshot-diff primitive, and the
rank-statistic ROC-AUC."""

import pytest
from pyspark.sql import functions as F

from local_data_pipeline_spark.operators.cdc import snapshot_diff
from local_data_pipeline_spark.operators.graph import label_propagation
from local_data_pipeline_spark.session import load_table

SF = "/root/testdata/sf0.001"


def _sym(spark, pairs):
    """Undirected edge list -> symmetric (src, dst) DataFrame."""
    rows = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    return spark.createDataFrame(rows, "src long, dst long")


def test_label_propagation_planted_cliques(spark):
    """Two disjoint cliques converge to one community each, labelled by
    the smallest member id (the deterministic tie-break)."""
    clique1 = [(1, 2), (1, 3), (2, 3)]
    clique2 = [(10, 11), (10, 12), (11, 12), (10, 13), (11, 13), (12, 13)]
    labels = label_propagation(_sym(spark, clique1 + clique2), iterations=4)
    got = {r.node: r.label for r in labels.collect()}
    assert set(got) == {1, 2, 3, 10, 11, 12, 13}
    # a fully connected clique seeded with own ids: after iter 1 every
    # node holds the min neighbor id, and the min id itself re-adopts
    # the community minimum by iter 2 — stable thereafter
    assert {got[1], got[2], got[3]} == {1}
    assert {got[n] for n in (10, 11, 12, 13)} == {10}


def test_label_propagation_deterministic_tiebreak(spark):
    """A node whose neighbors hold equally frequent labels adopts the
    SMALLEST label — pinned on a path graph where ties are everywhere."""
    # path 1-2-3: node 2 sees labels {1, 3} (tie) -> must pick 1
    labels = label_propagation(_sym(spark, [(1, 2), (2, 3)]), iterations=1)
    got = {r.node: r.label for r in labels.collect()}
    assert got[2] == 1
    # endpoints see only their single neighbor's label
    assert got[1] == 2 and got[3] == 2


def test_label_propagation_partition_insensitive(spark):
    """Same communities at 1 and 13 shuffle partitions (determinism at
    any parallelism is what makes the unrolled oracle possible)."""
    edges = _sym(spark, [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12)])
    ref = sorted(
        (r.node, r.label)
        for r in label_propagation(edges, iterations=3).collect()
    )
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "13")
        alt = sorted(
            (r.node, r.label)
            for r in label_propagation(edges, iterations=3).collect()
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert ref == alt


def test_snapshot_diff_classifies_and_lists_columns(spark):
    old = spark.createDataFrame(
        [(1, 10.0, "A"), (2, 20.0, "B"), (3, 30.0, "C"), (4, None, "D")],
        "k long, price double, status string",
    )
    new = spark.createDataFrame(
        [(2, 25.0, "B"), (3, 30.0, "X"), (4, None, "D"), (5, 50.0, "E")],
        "k long, price double, status string",
    )
    got = {
        r.k: (r.change_type, r.changed_cols)
        for r in snapshot_diff(old, new, "k", ["price", "status"]).collect()
    }
    assert got == {
        1: ("D", ""),
        2: ("C", "price"),
        3: ("C", "status"),
        5: ("A", ""),
    }  # key 4 unchanged (NULL == NULL null-safely) -> dropped in-plan


def test_snapshot_diff_null_transitions_are_changes(spark):
    """NULL -> value and value -> NULL are both real changes."""
    old = spark.createDataFrame([(1, None), (2, "x")], "k long, v string")
    new = spark.createDataFrame([(1, "y"), (2, None)], "k long, v string")
    got = {
        r.k: (r.change_type, r.changed_cols, r.old_v, r.new_v)
        for r in snapshot_diff(old, new, "k", ["v"]).collect()
    }
    assert got == {1: ("C", "v", None, "y"), 2: ("C", "v", "x", None)}


def _local_auc(pairs):
    """Tie-aware reference AUC from (score, y) pairs via average ranks."""
    pairs = sorted(pairs)
    n = len(pairs)
    ranks = {}
    i = 0
    while i < n:
        j = i
        while j < n and pairs[j][0] == pairs[i][0]:
            j += 1
        avg = (i + 1 + j) / 2.0  # average of ranks i+1 .. j
        for k in range(i, j):
            ranks[k] = avg
        i = j
    n_pos = sum(y for _, y in pairs)
    n_neg = n - n_pos
    r_pos = sum(ranks[k] for k, (_, y) in enumerate(pairs) if y)
    return (r_pos - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg)


def test_auc_matches_local_rank_reference(spark):
    """auc_micro == floor(1e6 * tie-aware Mann-Whitney AUC) per class,
    recomputed driver-side from the raw embeddings."""
    from local_data_pipeline_spark.queries import QUERIES

    got = {
        r.cls: (r.n, r.n_pos, r.auc_micro)
        for r in QUERIES["auc_one_vs_rest_embeddings"].fn(spark, SF).collect()
    }
    rows = load_table(spark, SF, "embeddings").collect()
    classes = sorted({r.label for r in rows})
    assert set(got) == set(classes)
    for c in classes:
        pairs = [
            (float(r.embedding[c]), 1 if r.label == c else 0) for r in rows
        ]
        n_pos = sum(y for _, y in pairs)
        want = int(_local_auc(pairs) * 1_000_000)  # floor: auc >= 0
        n, got_pos, auc = got[c]
        assert (n, got_pos) == (len(pairs), n_pos)
        assert abs(auc - want) <= 1, (c, auc, want)  # float vs int64 ulp


def test_auc_perfect_and_random_separation(spark):
    """Degenerate checks: a perfectly separating score gives 1.0, a
    constant score gives exactly 0.5 (all one tie group)."""
    perfect = [(float(i), 1 if i >= 50 else 0) for i in range(100)]
    assert _local_auc(perfect) == 1.0
    constant = [(0.0, i % 2) for i in range(100)]
    assert _local_auc(constant) == 0.5
