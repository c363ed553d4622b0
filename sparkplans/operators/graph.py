"""Iterative graph algorithms on DataFrames — PageRank via repeated
join + aggregate, the DataFrame-native form of the classic power
iteration (no GraphX dependency, works through Catalyst/AQE like any
other query).

Companion to `dedup.connected_components` (the other iterative
operator): both follow the same scale discipline — each iteration is
one keyed shuffle, and `localCheckpoint` cuts lineage every pass so
the plan (and recovery cost) stays O(1) in the iteration count
instead of growing a 10-deep join tree.  On a cluster the edges
DataFrame would be persisted/bucketed on `src` so every iteration's
join reuses the same partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iterations: int = 10,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """PageRank over a directed edge list; returns (node, rank).

    Semantics (matched exactly by the test's closed-form reference):
    r_{t+1}(v) = (1-d)/N + d * (sum_{u->v} r_t(u)/outdeg(u)
                                + dangling_mass_t / N)

    Duplicate edges are collapsed first; dangling nodes (no
    out-edges) spread their rank uniformly.  Each iteration: one
    broadcast of the constant-size dangling total + one dst-keyed
    aggregate.  Ranks sum within double tolerance, not bit-exactly —
    this is a fixed-point iteration, so verification is numeric
    (|r - r_ref| < 1e-9), never hash-equality.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n_total = nodes.count()
    if n_total == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    outdeg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    # edges annotated once; reused every iteration
    e_deg = e.join(outdeg, "src").localCheckpoint()

    ranks = nodes.withColumn("rank", F.lit(1.0 / n_total)).localCheckpoint()
    for _ in range(iterations):
        with_deg = ranks.join(outdeg, ranks.node == outdeg.src, "left")
        dangling = (
            with_deg.filter(F.col("outdeg").isNull())
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("m"))
            .collect()[0]["m"]
        )
        contribs = (
            e_deg.join(ranks, e_deg.src == ranks.node)
            .select("dst", (F.col("rank") / F.col("outdeg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
        )
        base = (1.0 - damping) / n_total + damping * dangling / n_total
        ranks = (
            nodes.join(contribs, nodes.node == contribs.dst, "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce(F.col("inflow"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks
