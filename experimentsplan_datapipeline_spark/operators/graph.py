"""Graph operators over edge DataFrames (beyond-reference extension).

The dedup module already runs one graph algorithm (pointer-jumping
connected components, operators/dedup.py::resolve_duplicate_clusters); this
module holds the general-purpose ones. Same design rules: iterative
algorithms UNROLL a fixed, deterministic number of rounds into one lazy
plan (no driver-side loop state, no RDD checkpoint dance), every round is
a join + map-side-combinable aggregation keyed on the destination node, and
nothing corpus-sized ever crosses a broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """PageRank with a FIXED iteration count, fully unrolled into one plan.

    Classic power iteration (Page et al. 1999): pr_{k+1}(v) = (1-d)/N +
    d * sum over in-neighbors u of pr_k(u)/outdeg(u). A fixed ``iterations``
    (instead of convergence polling) keeps the whole computation one lazy
    DataFrame — the oracle can replay it as unrolled SQL CTEs, and on a
    cluster there is no driver-side loop materializing intermediate state.

    Assumes every node has at least one outgoing edge (true for undirected
    graphs fed as both directions, like the co-purchase graph); dangling
    mass redistribution is deliberately out of scope for the fixed-round
    form. Returns (node, pagerank: double, unrounded).

    Scale shape per round: one shuffle join of edges with the k-th rank
    frame on src (both sides partitioned by the join key — on a real
    cluster, bucket edges by src once and every round reuses that layout),
    then one groupBy(dst) aggregation with map-side combine. Degrees and N
    are computed once. Rank frames are O(|V|); edges are never duplicated.
    """
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    nodes = e.select(F.col("src").alias("node")).distinct()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    n_frame = nodes.agg(F.count(F.lit(1)).cast("double").alias("n"))
    pr = nodes.crossJoin(F.broadcast(n_frame)).select(
        "node", (F.lit(1.0) / F.col("n")).alias("val")
    )
    contrib_base = e.join(deg, "src")
    for _ in range(iterations):
        pr = (
            contrib_base.join(pr, contrib_base["src"] == pr["node"])
            .groupBy("dst")
            .agg(F.sum(F.col("val") / F.col("d")).alias("mass"))
            .crossJoin(F.broadcast(n_frame))
            .select(
                F.col("dst").alias("node"),
                (
                    F.lit(1.0 - damping) / F.col("n")
                    + F.lit(damping) * F.col("mass")
                ).alias("val"),
            )
        )
    return pr.select("node", F.col("val").alias("pagerank"))
