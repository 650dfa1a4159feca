"""PageRank and HITS over an edge DataFrame — the iterative graph
operators beside connected-components label propagation
(operators/dedup.dedup_clusters).

Reference scope: the reference has no graph operators; this is §2.E
extension surface (graph centrality over co-occurrence graphs — e.g.
ranking parts by co-purchase centrality, or documents by citation).

Determinism: per-node contribution sums accumulate in exact DECIMAL
(order-insensitive at any parallelism — the same rule as
functions/numeric.dsum), so repeated runs and different partitionings
produce bit-identical ranks. The damping/dangling arithmetic is plain
double with identical expression shape every iteration.

Scale: each iteration is one join (ranks x edges, shuffled on the
edge source) plus one aggregate on the destination — the standard
Pregel-as-joins shape. Ranks are localCheckpoint'd (lazy) each
iteration to stop lineage growth; the dangling-mass term is a 1-row
aggregate broadcast-cross-joined IN-PLAN each iteration (no driver
collect — see the `F.broadcast(dangling)` crossJoin below)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Decimal shape for rank mass: ranks are probabilities (<= 1), so all
#: 25 digits serve the fraction; 18 fractional digits keeps round-off
#: far below float64 epsilon while staying exactly mergeable.
_RANK_DEC = "decimal(25,18)"


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iterations: int = 10,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Rank nodes of the directed graph ``edges`` (columns src, dst).

    Returns (node, rank) with ranks summing to 1. Nodes are the union
    of sources and destinations; dangling nodes (no out-edges)
    redistribute their mass uniformly, so total mass is conserved
    exactly (up to the documented decimal scale)."""
    spark = edges.sparkSession
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionAll(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    out_deg = e.groupBy("src").agg(F.count("*").alias("out_deg"))
    # edges annotated with the 1/out_deg share; checkpointed once — the
    # loop re-reads this relation every iteration.
    shares = (
        e.join(out_deg, "src")
        .select("src", "dst", (F.lit(1.0) / F.col("out_deg")).alias("share"))
        .localCheckpoint(eager=True)
    )
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    # the DANGLING NODE SET is loop-invariant (only its mass changes):
    # compute it once, broadcast it into each iteration's semi join.
    dangling_nodes = F.broadcast(
        nodes.join(
            out_deg.select(F.col("src").alias("node")), "node", "left_anti"
        ).localCheckpoint(eager=True)
    )
    for _ in range(iterations):
        # mass parked on dangling nodes: a 1-row aggregate that rides
        # into the iteration's job as a broadcast cross join — no
        # per-iteration driver collect.
        dang = (
            ranks.join(dangling_nodes, "node", "left_semi")
            .agg(
                F.coalesce(
                    F.sum(F.col("rank").cast(_RANK_DEC)).cast("double"), F.lit(0.0)
                ).alias("dmass")
            )
        )
        contribs = (
            ranks.join(shares, ranks["node"] == shares["src"])
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") * F.col("share")).cast(_RANK_DEC).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").cast("double").alias("inflow"))
        )
        ranks = nodes.join(contribs, "node", "left").crossJoin(
            F.broadcast(dang)
        ).select(
            "node",
            (
                F.lit((1.0 - damping) / n)
                + F.lit(damping) * F.col("dmass") / F.lit(float(n))
                + F.lit(damping) * F.coalesce(F.col("inflow"), F.lit(0.0))
            ).alias("rank"),
        )
        # cut lineage EVERY iteration (round-11 measurement): each rank
        # level is referenced twice downstream — by the next iteration's
        # contribution join AND by its dangling-mass 1-row aggregate —
        # so an un-checkpointed level is RE-EXECUTED once per reference
        # (lazy checkpoints only cache at the cut). Every-other-iteration
        # cuts measured 10.2-11.2 s vs every-iteration 8.5-9.2 s at
        # sf0.1 (identical results); at scale an uncached level is a
        # corpus-sized recompute, so one block-manager write per
        # iteration is the cheap side of the trade.
        ranks = ranks.localCheckpoint(eager=False)
    return ranks


def hits(
    edges: DataFrame,
    iterations: int = 4,
    src: str = "src",
    dst: str = "dst",
) -> "tuple[DataFrame, DataFrame]":
    """HITS hubs & authorities (Kleinberg, JACM 1999 — public paper) on
    the directed graph ``edges``; returns ``(hubs, auths)`` DataFrames of
    (node, score).

    Sum-normalized (scores sum to 1 per side) rather than the classic
    L2 norm: the normalizer is then an exact DECIMAL sum instead of a
    sqrt, which keeps every iteration's arithmetic bit-identical to a
    SQL oracle on any engine at any parallelism — the same determinism
    rule as :func:`pagerank`. Normalization direction (which side ranks
    first) is unchanged. Fixed ``iterations`` → known job count.

    Scale: per iteration, two join+agg passes (edges x scores shuffled
    on the join key) and two 1-row total aggregates broadcast IN-PLAN as
    cross joins (no driver collect anywhere); lineage is cut every
    iteration, exactly like pagerank."""
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    hub_nodes = e.select(F.col("src").alias("node")).distinct()
    n_hubs = hub_nodes.agg(F.count("*").alias("__n"))
    h = hub_nodes.crossJoin(F.broadcast(n_hubs)).select(
        "node", (F.lit(1.0) / F.col("__n")).alias("score")
    )
    a = None
    from ..functions.numeric import dsum

    for i in range(iterations):
        a_raw = (
            e.join(h.withColumnRenamed("node", "src"), "src")
            .groupBy("dst")
            .agg(dsum("score", 18).alias("s"))
        )
        a_tot = a_raw.agg(dsum("s", 18).alias("t"))
        a = a_raw.crossJoin(F.broadcast(a_tot)).select(
            F.col("dst").alias("node"), (F.col("s") / F.col("t")).alias("score")
        )
        h_raw = (
            e.join(a.withColumnRenamed("node", "dst"), "dst")
            .groupBy("src")
            .agg(dsum("score", 18).alias("s"))
        )
        h_tot = h_raw.agg(dsum("s", 18).alias("t"))
        h = h_raw.crossJoin(F.broadcast(h_tot)).select(
            F.col("src").alias("node"), (F.col("s") / F.col("t")).alias("score")
        )
        # cut lineage EVERY iteration (round-11): each score level feeds
        # both the next join AND its own sum-normalizer 1-row aggregate;
        # un-checkpointed levels re-execute once per reference. Measured
        # at sf0.1: every-other cuts 10.9-17.5 s vs every-iteration
        # 7.5-8.7 s, identical top-20 output.
        h = h.localCheckpoint(eager=False)
        a = a.localCheckpoint(eager=False)
    return h, a


def label_propagation(
    edges: DataFrame,
    iterations: int = 4,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007, the LPA
    community detector): every node seeds with its own id; each
    iteration every node adopts the MOST FREQUENT label among its
    in-neighbors, ties broken by the smallest label — which makes the
    whole recurrence deterministic, so the DuckDB twin can unroll the
    identical update into CTEs (the HITS-oracle pattern,
    queries._lpa_oracle_sql). ``edges`` must already contain both
    directions of each undirected edge; every node is assumed to have
    at least one in-edge (true for symmetrized edge sets).

    Scale: one shuffle join (labels x edges on the source) + one
    map-side-combinable (node, label) count + one per-node
    WindowGroupLimit argmax per iteration — Pregel-as-joins, same as
    pagerank/hits above. No driver collect anywhere; labels are
    localCheckpoint'd (lazy) each iteration to stop lineage growth.
    Returns (node, label) after ``iterations`` rounds."""
    from pyspark.sql.window import Window

    # checkpoint the edge relation ONCE (round-11): every iteration's
    # message join reads ``edges``, and an un-checkpointed edge plan —
    # for the co-purchase callers a per-basket-quadratic self-join —
    # re-executes inside EVERY iteration's checkpoint segment (the
    # round-11 LPA fix; see OPTIMIZATION_r11.md for the measured
    # before/after). pagerank/kcore already did this; LPA was the one
    # iterative operator that didn't.
    edges = edges.select(
        F.col(src).alias(src), F.col(dst).alias(dst)
    ).localCheckpoint(eager=True)
    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    labels = nodes.select("node", F.col("node").alias("label"))
    w = Window.partitionBy("node").orderBy(F.desc("c"), F.asc("label"))
    for _ in range(iterations):
        msgs = edges.join(
            labels.withColumnRenamed("node", src), src
        ).select(F.col(dst).alias("node"), "label")
        counts = msgs.groupBy("node", "label").agg(F.count("*").alias("c"))
        labels = (
            counts.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select("node", "label")
            .localCheckpoint(eager=False)
        )
    return labels


def kcore(
    edges: DataFrame,
    k: int = 3,
    rounds: int = 6,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """k-core peel (Seidman 1983; the degeneracy-ordering workhorse for
    community cores and graph sparsification): iteratively remove nodes
    with fewer than ``k`` neighbors among the still-alive set, a fixed
    ``rounds`` times, then report each survivor's degree WITHIN the
    surviving subgraph. ``edges`` must be SYMMETRIZED (both directions
    present) so per-src counts are full degrees.

    Fixed rounds → known job count and an exactly-unrollable SQL twin
    (the hits/label_propagation oracle pattern); peeling is monotone
    (the alive set only shrinks), so once a round removes nothing the
    remaining rounds are no-ops and the result IS the true k-core —
    pytest pins convergence-within-rounds on the query's graph, and a
    cascade test pins the multi-round chain collapse.

    Scale: each round is one join+agg shuffled on the node key; the
    alive set shrinks monotonically, so later rounds cost less;
    lineage is cut every round (iterative-operator contract)."""
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    alive = e.select(F.col("src").alias("node")).distinct()
    for r in range(rounds):
        deg = (
            e.join(alive.withColumnRenamed("node", "src"), "src")
            .join(alive.withColumnRenamed("node", "dst"), "dst")
            .groupBy("src")
            .agg(F.count("*").alias("degree"))
        )
        alive = deg.filter(F.col("degree") >= k).select(
            F.col("src").alias("node")
        )
        # cut EVERY round (round-11): the alive set is referenced twice
        # per round (src and dst semi-joins), so an uncached round
        # re-executes — measured 2.7-3.1 s vs 2.4-2.7 s at sf0.1.
        alive = alive.localCheckpoint(eager=False)
    return (
        e.join(alive.withColumnRenamed("node", "src"), "src")
        .join(alive.withColumnRenamed("node", "dst"), "dst")
        .groupBy(F.col("src").alias("node"))
        .agg(F.count("*").alias("degree"))
    )
