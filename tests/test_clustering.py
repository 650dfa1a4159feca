"""k-means + semantic dedup: determinism, objective descent, planted
structure recovery (operators/clustering.py)."""

import pytest
from pyspark.sql import functions as F

from local_data_pipeline_spark.operators import clustering as CL
from local_data_pipeline_spark.session import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF, "embeddings").cache()


def test_kmeans_deterministic_under_repartition(spark, emb):
    a = CL.kmeans_fit(emb, k=4, n_iters=3)
    b = CL.kmeans_fit(emb.repartition(7), k=4, n_iters=3)
    assert a == b  # exact equality: decimal sums make recompute order-free


def test_kmeans_inertia_non_increasing(spark, emb):
    vals = [
        CL.inertia(emb, CL.kmeans_fit(emb, k=4, n_iters=i)) for i in (1, 2, 4)
    ]
    assert vals[0] >= vals[1] >= vals[2]


def _blob(base, n, ids0):
    rows = []
    for i in range(n):
        v = [float(b) for b in base]
        v[i % len(v)] += 0.01 * (i + 1)
        rows.append((ids0 + i, v, 0))
    return rows


def test_kmeans_recovers_planted_blobs(spark):
    rows = (
        _blob([10.0, 0.0, 0.0, 0.0], 5, 0)
        + _blob([0.0, 10.0, 0.0, 0.0], 5, 100)
        + _blob([0.0, 0.0, 10.0, 0.0], 5, 200)
    )
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    cent = CL.kmeans_fit(df, k=3, n_iters=4)
    got = CL.kmeans_assign(df, cent).select("vec_id", "cluster").collect()
    groups = {}
    for r in got:
        groups.setdefault(r.vec_id // 100, set()).add(r.cluster)
    assert all(len(s) == 1 for s in groups.values())  # blob stays together
    assert len(set().union(*groups.values())) == 3  # blobs separated


def test_semantic_dedup_drops_planted_near_identical(spark):
    base = [1.0, 2.0, 3.0, 4.0]
    scaled = [x * 1.0001 for x in base]  # cosine == 1.0, different vector
    other = [4.0, -3.0, 2.0, -1.0]
    far = [-1.0, 5.0, -2.0, 0.5]
    df = spark.createDataFrame(
        [(1, base, 0), (2, scaled, 0), (3, other, 1), (4, far, 1)],
        "vec_id long, embedding array<float>, label int",
    )
    kept = sorted(
        r.vec_id
        for r in CL.semantic_dedup(df, k=2, n_iters=2, threshold=0.995).collect()
    )
    assert kept == [1, 3, 4]  # min-id survivor kept, others untouched


def test_semantic_dedup_transitive_chain(spark):
    # a~b and b~c near-identical: all three collapse to min id even if
    # a~c straddles the threshold
    a = [1.0, 0.0, 0.0, 0.0]
    b = [0.999, 0.001, 0.0, 0.0]
    c = [0.998, 0.002, 0.0, 0.0]
    far = [0.0, 0.0, 1.0, 1.0]
    df = spark.createDataFrame(
        [(10, a, 0), (11, b, 0), (12, c, 0), (13, far, 1)],
        "vec_id long, embedding array<float>, label int",
    )
    kept = sorted(
        r.vec_id
        for r in CL.semantic_dedup(df, k=1, n_iters=1, threshold=0.999).collect()
    )
    assert kept == [10, 13]
