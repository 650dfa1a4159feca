"""PageRank over an edge DataFrame — the second iterative graph
operator beside connected-components label propagation
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
        # cut lineage every other iteration: each checkpoint is a job
        # boundary, and two iterations of join+agg lineage re-plan fine —
        # halves the per-iteration job count.
        if _ % 2 == 1:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks
