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
    weight_col: str | None = None,
) -> DataFrame:
    """PageRank with a FIXED iteration count, fully unrolled into one plan.

    Classic power iteration (Page et al. 1999): pr_{k+1}(v) = (1-d)/N +
    d * (sum over in-neighbors u of pr_k(u) * w(u,v)/W(u) + S_k/N), where
    W(u) is u's total out-weight (out-degree when ``weight_col`` is None)
    and S_k is the DANGLING mass — the total rank sitting on nodes with no
    out-edges, redistributed uniformly so rank mass is conserved on any
    directed graph (sum of ranks stays 1.0 every round; see the
    mass-conservation test). A fixed ``iterations`` (instead of convergence
    polling) keeps the whole computation one lazy DataFrame — the oracle
    can replay it as unrolled SQL CTEs, and on a cluster there is no
    driver-side loop materializing intermediate state.

    Node universe is src ∪ dst: a node with only OUT-edges keeps its
    (1-d)/N + dangling term every round via the left join below (an inner
    join + groupBy(dst) alone would silently drop it after round 1 and leak
    its mass), and a node with only IN-edges counts toward N and feeds the
    dangling term. Returns (node, pagerank: double, unrounded) with one row
    per node.

    Scale shape per round: one shuffle join of the pinned edge frame with
    the k-th rank frame on src, one groupBy(dst) aggregation with map-side
    combine, one O(|V|) left join back onto the node universe, and one
    single-row broadcast (the dangling sum). Degrees/out-weights and N are
    computed once: ``contrib_base = edges ⋈ out-weight`` is
    localCheckpoint(eager=False)-pinned (the `_ranked_gid_sets` pattern,
    operators/dedup.py) so all unrolled rounds reuse ONE materialized
    layout instead of re-deriving the edges⋈deg shuffle per round; the
    node frame is pinned for the same reason. Rank frames are O(|V|);
    edges are never duplicated and never a broadcast build side.
    """
    cols = [F.col(src_col).alias("src"), F.col(dst_col).alias("dst")]
    if weight_col is not None:
        cols.append(F.col(weight_col).cast("double").alias("w"))
    e = edges.select(*cols)
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    if weight_col is None:
        out_w = e.groupBy("src").agg(F.count(F.lit(1)).cast("double").alias("d"))
        share = F.col("val") / F.col("d")
    else:
        out_w = e.groupBy("src").agg(F.sum("w").alias("d"))
        share = F.col("val") * F.col("w") / F.col("d")
    n_frame = nodes.agg(F.count(F.lit(1)).cast("double").alias("n"))
    # one materialization of edges ⋈ out-weight feeds every unrolled round
    contrib_base = e.join(out_w, "src").localCheckpoint(eager=False)
    out_srcs = out_w.select("src").localCheckpoint(eager=False)
    pr = nodes.crossJoin(F.broadcast(n_frame)).select(
        "node", (F.lit(1.0) / F.col("n")).alias("val")
    )
    for _ in range(iterations):
        mass = (
            contrib_base.join(pr, contrib_base["src"] == pr["node"])
            .groupBy("dst")
            .agg(F.sum(share).alias("mass"))
        )
        # rank parked on dangling nodes (no out-edges) this round; a single
        # row, broadcast back — never zero rows thanks to the coalesce
        dangling = pr.join(
            out_srcs, pr["node"] == out_srcs["src"], "left_anti"
        ).agg(F.coalesce(F.sum("val"), F.lit(0.0)).alias("s"))
        pr = (
            nodes.join(mass, nodes["node"] == mass["dst"], "left")
            .crossJoin(F.broadcast(n_frame))
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit(1.0 - damping) / F.col("n")
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("mass"), F.lit(0.0))
                        + F.col("s") / F.col("n")
                    )
                ).alias("val"),
            )
        )
    return pr.select("node", F.col("val").alias("pagerank"))
