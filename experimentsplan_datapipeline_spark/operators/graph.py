"""Graph operators over edge DataFrames (beyond-reference extension).

The dedup module already runs one graph algorithm (pointer-jumping
connected components, operators/dedup.py::resolve_duplicate_clusters); this
module holds the general-purpose ones. Same design rules: iterative
algorithms UNROLL a fixed, deterministic number of rounds into one lazy
plan (no driver-side loop state, no RDD checkpoint dance), every round is
a join + map-side-combinable aggregation keyed on the destination node, and
nothing corpus-sized ever crosses a broadcast. The convergence-mode variant
(``pagerank_until``) is the one deliberate exception: iterate-until-delta
is inherently a driver loop, so it drives the SAME round body with periodic
pinning instead of an unroll.

Pinning goes through ``operators/util.py::pin`` — ``local`` mode
(localCheckpoint, the local[*] default) or ``table`` mode (bucketed parquet
stage table, the cluster-durable option SCALE.md prescribes for the
heaviest frame in the job).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from experimentsplan_datapipeline_spark.operators.util import pin


def _prepare(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    weight_col: str | None,
):
    """Shared PageRank setup: normalized edge frame, pinned node universe
    (src ∪ dst), N as a single-row frame, the pinned ``edges ⋈ out-weight``
    contribution base every round re-reads, the pinned out-src set (for the
    dangling left-anti), and the per-edge share expression."""
    cols = [F.col(src_col).alias("src"), F.col(dst_col).alias("dst")]
    if weight_col is not None:
        cols.append(F.col(weight_col).cast("double").alias("w"))
    # r14: pin the normalized edge frame FIRST — the three setup pins
    # below (nodes, contrib_base, out_srcs) each re-executed the full
    # caller-side edge lineage otherwise (graph_pagerank's copurchase
    # self-join: ~4 s per re-run, 16 s of setup for a 7k-edge graph).
    # One materialization, every derived pin reads it back.
    e = pin(edges.select(*cols))
    nodes = pin(
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    if weight_col is None:
        out_w = e.groupBy("src").agg(F.count(F.lit(1)).cast("double").alias("d"))
        share = F.col("val") / F.col("d")
    else:
        out_w = e.groupBy("src").agg(F.sum("w").alias("d"))
        share = F.col("val") * F.col("w") / F.col("d")
    n_frame = nodes.agg(F.count(F.lit(1)).cast("double").alias("n"))
    # one materialization of edges ⋈ out-weight feeds every round; this is
    # the heaviest frame in the job — the one to pin mode='table' on a real
    # cluster (executor loss otherwise recomputes the full edge build)
    contrib_base = pin(e.join(out_w, "src"))
    out_srcs = pin(out_w.select("src"))
    return nodes, n_frame, contrib_base, out_srcs, share


def _mass_and_dangling(pr, contrib_base, out_srcs, share):
    """One power-iteration round's two aggregates: rank mass arriving at
    each dst (one shuffle join + map-side-combinable groupBy), and the
    single-row dangling sum (rank parked on nodes with no out-edges)."""
    mass = (
        contrib_base.join(pr, contrib_base["src"] == pr["node"])
        .groupBy("dst")
        .agg(F.sum(share).alias("mass"))
    )
    dangling = pr.join(
        out_srcs, pr["node"] == out_srcs["src"], "left_anti"
    ).agg(F.coalesce(F.sum("val"), F.lit(0.0)).alias("s"))
    return mass, dangling


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
    computed once via ``pin`` (``contrib_base = edges ⋈ out-weight``), so
    all unrolled rounds reuse ONE materialized layout instead of
    re-deriving the edges⋈deg shuffle per round. The rank frame itself is
    also pinned BETWEEN rounds: each round references pr_k twice (the mass
    join and the dangling aggregate), so an unpinned unroll holds
    2^iterations copies of the pr subtree — fine at the default 3 (exchange
    reuse dedupes them) but exponential analysis time for a caller passing
    iterations=20. The final round stays unpinned so the returned frame
    exposes the real round-body plan. Rank frames are O(|V|); edges are
    never duplicated and never a broadcast build side.
    """
    nodes, n_frame, contrib_base, out_srcs, share = _prepare(
        edges, src_col, dst_col, weight_col
    )
    pr = nodes.crossJoin(F.broadcast(n_frame)).select(
        "node", (F.lit(1.0) / F.col("n")).alias("val")
    )
    for k in range(iterations):
        # pin BETWEEN rounds (not after the last): round k+1 references
        # pr_k twice, so this caps plan depth at one round body while the
        # returned frame still exposes the real final-round plan shape
        if k > 0:
            pr = pin(pr)
        mass, dangling = _mass_and_dangling(pr, contrib_base, out_srcs, share)
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


def pagerank_until(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    tol: float = 1e-6,
    max_iter: int = 50,
    check_every: int = 1,
    damping: float = 0.85,
    weight_col: str | None = None,
) -> tuple[DataFrame, dict]:
    """PageRank iterated UNTIL the L∞ rank delta drops below ``tol`` (or
    ``max_iter`` rounds) — the convergence-mode companion to ``pagerank``.

    Same round body, driven by a driver loop: every round's rank frame is
    pinned (truncating lineage so the plan stays one-round deep no matter
    how many rounds run), and every ``check_every``-th round pays one extra
    O(|V|) self-join + max-aggregate to measure ``max |pr_k - pr_{k-1}|``.
    The delta action is what materializes the round, so convergence
    checking costs no additional pass over the edges. Unbounded iteration
    has no finite CTE unroll, so this variant is deliberately NOT in the
    SQL-oracle registry — determinism is pinned by pytest instead (fixed
    graph → identical ranks and iteration count across runs).

    Returns ``(ranks, info)`` where ranks is (node, pagerank) and info is
    ``{"iterations": rounds_run, "delta": last_measured_linf_delta}``.
    """
    nodes, n_frame, contrib_base, out_srcs, share = _prepare(
        edges, src_col, dst_col, weight_col
    )
    pr = pin(
        nodes.crossJoin(F.broadcast(n_frame)).select(
            "node", (F.lit(1.0) / F.col("n")).alias("val")
        )
    )
    delta = float("inf")
    rounds = 0
    for k in range(max_iter):
        mass, dangling = _mass_and_dangling(pr, contrib_base, out_srcs, share)
        new_pr = pin(
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
        rounds = k + 1
        if rounds % check_every == 0 or rounds == max_iter:
            prev = pr.select(F.col("node"), F.col("val").alias("prev"))
            row = (
                new_pr.join(prev, "node")
                .agg(F.max(F.abs(F.col("val") - F.col("prev"))).alias("d"))
                .first()
            )
            # empty graph -> empty rank frame -> null max: converged trivially
            delta = row["d"] if row["d"] is not None else 0.0
            pr = new_pr
            if delta < tol:
                break
        else:
            pr = new_pr
    return (
        pr.select("node", F.col("val").alias("pagerank")),
        {"iterations": rounds, "delta": delta},
    )


def pagerank_personalized(
    edges: DataFrame,
    restart_pred: Callable[[Column], Column],
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 3,
    damping: float = 0.85,
    weight_col: str | None = None,
) -> DataFrame:
    """Personalized (topic-sensitive) PageRank: teleport lands on a QUERY
    node set instead of uniformly (Haveliwala 2002). ``restart_pred`` maps
    the node column to a boolean — nodes where it holds form the restart
    set S, and the restart vector is r(v) = 1/|S| for v ∈ S else 0.
    Update: pr_{k+1}(v) = (1-d)·r(v) + d·(Σ in-mass + S_k·r(v)) — dangling
    mass also teleports BY the restart vector, so total rank stays 1.0 and
    never leaks onto non-restart nodes except through real edges.

    Expressing the restart set as a column predicate (not a collected id
    list) keeps the whole thing one lazy plan with no driver collect: |S|
    is a single-row broadcast aggregate, exactly like N in ``pagerank``.
    The predicate must select at least one node of the graph (an empty
    restart set has no defined teleport distribution — ranks come back
    null). Same fixed unroll + per-round pinning as ``pagerank``; the SQL
    oracle replays the ladder with the identical CASE arithmetic.
    """
    nodes, n_frame, contrib_base, out_srcs, share = _prepare(
        edges, src_col, dst_col, weight_col
    )
    nr_frame = nodes.agg(
        F.sum(restart_pred(F.col("node")).cast("double")).alias("nr")
    )
    r = (
        F.when(restart_pred(F.col("node")), F.lit(1.0) / F.col("nr"))
        .otherwise(F.lit(0.0))
    )
    pr = nodes.crossJoin(F.broadcast(nr_frame)).select("node", r.alias("val"))
    for k in range(iterations):
        if k > 0:
            pr = pin(pr)
        mass, dangling = _mass_and_dangling(pr, contrib_base, out_srcs, share)
        pr = (
            nodes.join(mass, nodes["node"] == mass["dst"], "left")
            .crossJoin(F.broadcast(nr_frame))
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit(1.0 - damping) * r
                    + F.lit(damping)
                    * (F.coalesce(F.col("mass"), F.lit(0.0)) + F.col("s") * r)
                ).alias("val"),
            )
        )
    return pr.select("node", F.col("val").alias("pagerank"))


def copurchase_pairs(
    items: DataFrame,
    group_col: str,
    item_col: str,
    n_blocks: int = 1,
) -> DataFrame:
    """Exact within-group item-pair generation (the co-occurrence /
    co-purchase edge build): for each group g, every unordered pair
    (a, b) with a < b of distinct items in g, one output row per
    OCCURRENCE (downstream groupBy(pa, pb) counts support).

    The naive form — ``items x items ON same group AND a < b`` — shuffles
    on the group key alone, so ONE mega-group with k items lands its whole
    k² pair expansion on one task (AQE skew-join can split a skewed
    partition's input rows, but every pair of this group still forms in
    tasks reading the same key's data — a 5 000-item basket is 12.5M pairs
    in one place). ``n_blocks=m`` spreads exactly that with the triangle
    (block-cell) scheme: each item gets a deterministic block id
    b = hash(item) mod m, and is fanned to the m cells
    ``(min(b, t), max(b, t)) for t in 0..m-1`` on BOTH join sides; the join
    key becomes (group, cell). A pair with blocks (bx, by) co-occurs in
    exactly the cells whose {i, j} ⊆ {bx, by} — the canonical-cell filter
    ``(least(bx,by), greatest(bx,by)) == (i, j)`` keeps it exactly once.
    Every cell is an independent shuffle key, so the mega-group's k² work
    spreads over m(m+1)/2 tasks at the cost of m-fold replication of the input
    rows — EXACT, no sampling, no cap.

    ``n_blocks=1`` degenerates to the plain self-join (one cell). Pick m
    so that (max basket size * 2/m)^2 pairs fit a task — m=8 turns a
    5 000-item basket into 36 cells of ~1.5M candidates each.
    """
    it = items.select(
        F.col(group_col).alias("g"), F.col(item_col).alias("item")
    ).distinct()
    if n_blocks <= 1:
        # r15 measured note (guide §1.1): pinning this join at
        # defaultParallelism via a user-numbered repartition on "g"
        # (AQE-exempt) DID run the pair-gen stage at 32 tasks instead of
        # the byte-coalesced 4 — but total stage CPU grew ~5x (per-task
        # shuffle-file and setup overhead on a 4 MB shuffle) and wall
        # time did not improve, so it was REVERTED; AQE's coalescing is
        # the right call here and at scale, where the stage is wide
        # because its input is.
        a, b = it.alias("a"), it.alias("b")
        return (
            a.join(
                b,
                (F.col("a.g") == F.col("b.g"))
                & (F.col("a.item") < F.col("b.item")),
            )
            .select(
                F.col("a.g").alias("g"),
                F.col("a.item").alias("pa"),
                F.col("b.item").alias("pb"),
            )
        )
    m = n_blocks
    fan = (
        it.withColumn("blk", F.pmod(F.xxhash64("item"), F.lit(m)))
        .withColumn("t", F.explode(F.sequence(F.lit(0), F.lit(m - 1))))
        .select(
            "g",
            "item",
            "blk",
            F.least("blk", "t").alias("i"),
            F.greatest("blk", "t").alias("j"),
        )
    )
    # EXPLICIT partitioning on the cell key, with a user-specified count:
    # the fan frame is tiny in BYTES (the k² blow-up happens inside the
    # join), so AQE's size-based coalescing would fold all cells back into
    # one task and silently undo the whole point of blocking. A
    # user-numbered repartition is exempt from AQE coalescing, and because
    # it hash-partitions on exactly the join's equi-keys, the sort-merge
    # join reuses it instead of adding its own exchange.
    n_part = max(
        items.sparkSession.sparkContext.defaultParallelism,
        m * (m + 1) // 2,
    )
    fan = fan.repartition(n_part, "g", "i", "j")
    a = fan.select(
        "g", F.col("item").alias("pa"), F.col("blk").alias("ba"), "i", "j"
    )
    b = fan.select(
        F.col("g").alias("g2"),
        F.col("item").alias("pb"),
        F.col("blk").alias("bb"),
        F.col("i").alias("i2"),
        F.col("j").alias("j2"),
    )
    pairs = a.join(
        b,
        (F.col("g") == F.col("g2"))
        & (F.col("i") == F.col("i2"))
        & (F.col("j") == F.col("j2"))
        & (F.col("pa") < F.col("pb"))
        # a same-block pair co-occurs in every cell touching its block —
        # the canonical-cell filter keeps each unordered pair exactly once
        & (F.least(F.col("ba"), F.col("bb")) == F.col("i"))
        & (F.greatest(F.col("ba"), F.col("bb")) == F.col("j")),
    )
    return pairs.select("g", "pa", "pb")


def triangle_count(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Exact per-node triangle counts via DEGREE-ORDERED ORIENTATION
    (Suri & Vassilvitskii, WWW'11; the GraphX/compact-forward formulation).

    Input edges are treated as UNDIRECTED (direction and duplicates are
    normalized away; self-loops dropped). Each undirected edge is oriented
    from its lower-(degree, id) endpoint to the higher one — after which
    every node's OUT-degree is O(sqrt(m)), so the wedge self-join below
    emits at most O(m^1.5) candidate wedges regardless of how skewed the
    raw degree distribution is. A star node with a million neighbors
    produces ZERO wedges from its own center (all its edges point INTO
    it), which is exactly the "curse of the last reducer" this
    orientation exists to kill — the naive neighbors-of-neighbors join
    would put that node's 10^12 wedges on one task.

    Shape: one distinct + degree aggregation, one orientation join
    (edges ⋈ degrees, twice, map-side-combinable), one wedge self-join of
    the oriented edges on their source (each wedge keyed by an ordered
    (hi1, hi2) pair), and one hash semi-join of wedges against the
    oriented edge set — every triangle matches exactly once, as the
    (lowest, middle, highest)-rank traversal. Nothing is broadcast,
    nothing collects; per-node counts come from one final explode-free
    union + groupBy. Returns (node, n_triangles) for nodes in >= 1
    triangle.
    """
    a, b = F.col(src_col), F.col(dst_col)
    und = (
        edges.select(
            F.least(a, b).alias("a"), F.greatest(a, b).alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionByName(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    da = deg.select(F.col("node").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("node").alias("b"), F.col("d").alias("db"))
    ranked = und.join(da, "a").join(db, "b")
    ra = F.struct(F.col("da").alias("d"), F.col("a").alias("n"))
    rb = F.struct(F.col("db").alias("d"), F.col("b").alias("n"))
    oriented = ranked.select(
        F.when(ra < rb, F.col("a")).otherwise(F.col("b")).alias("lo"),
        F.when(ra < rb, F.col("b")).otherwise(F.col("a")).alias("hi"),
        F.when(ra < rb, rb).otherwise(ra).alias("rhi"),
    )
    w1 = oriented.select(
        F.col("lo"), F.col("hi").alias("v"), F.col("rhi").alias("rv")
    )
    w2 = oriented.select(
        F.col("lo"), F.col("hi").alias("w"), F.col("rhi").alias("rw")
    )
    wedges = w1.join(w2, "lo").filter(F.col("rv") < F.col("rw"))
    closing = oriented.select(
        F.col("lo").alias("v"), F.col("hi").alias("w")
    )
    tri = wedges.join(closing, ["v", "w"]).select("lo", "v", "w")
    members = (
        tri.select(F.col("lo").alias("node"))
        .unionByName(tri.select(F.col("v").alias("node")))
        .unionByName(tri.select(F.col("w").alias("node")))
    )
    return members.groupBy("node").agg(
        F.count(F.lit(1)).alias("n_triangles")
    )


def label_propagation(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 2,
) -> DataFrame:
    """Deterministic synchronous label propagation (Raghavan et al. 2007)
    with a FIXED round count, unrolled like ``pagerank``.

    Every node starts labeled with its own id; each round, every node
    adopts the most frequent label among its IN-neighbors, ties broken by
    the smallest label — the deterministic variant of LPA's random
    tie-break, so repeated runs (and the SQL oracle's unrolled CTE ladder)
    agree exactly. Nodes with no in-edges keep their current label via the
    left join (same node-universe rule as pagerank).

    Per round: one shuffle join of the pinned edge frame with the O(|V|)
    label frame, one map-side-combinable groupBy(dst, label) count, one
    ``min_by(label, (-count, label))`` per-dst aggregation (a single
    combine-capable pass — no window sort; the negation sits on the
    always-numeric count so string node ids work under ANSI mode), and one
    O(|V|) left join back onto the node universe. Labels are node ids, so
    frame width never grows. Returns (node, label); nodes sharing a label after k rounds are
    within distance k of a common attractor — the cheap community signal
    next to exact connected components (resolve_duplicate_clusters).
    """
    e = pin(
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    )
    nodes = pin(
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    labels = nodes.select("node", F.col("node").alias("label"))
    for k in range(iterations):
        if k > 0:
            labels = pin(labels)
        counts = (
            e.join(labels, e["src"] == labels["node"])
            .groupBy("dst", "label")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        # min_by over (-count, label): largest count, then SMALLEST label.
        # The negation must hit the always-numeric count, never the label —
        # labels are node ids, and on string node ids a unary minus fails
        # analysis under Spark 4's default ANSI mode (and yields null with
        # ANSI off, making the tie-break nondeterministic).
        top = counts.groupBy("dst").agg(
            F.min_by(
                "label", F.struct((-F.col("c")).alias("nc"), F.col("label"))
            ).alias("new_label")
        )
        labels = (
            labels.join(top, labels["node"] == top["dst"], "left")
            .select(
                "node",
                F.coalesce(F.col("new_label"), F.col("label")).alias("label"),
            )
        )
    return labels


def _capped_edges(
    edges: DataFrame, s: int, seed: int, degree_cap: int
) -> DataFrame:
    """Per-(node, step) seeded hash-top-m out-edge sample (VERDICT r13
    item 5): rank each src's out-edges by the walker-INDEPENDENT
    portable hash md5(src|dst|s|cap|seed) (dst tie-break) and keep the
    first ``degree_cap``. Walker-independence is what makes the cap a
    shared pre-filter — every walker standing on a hub at step s draws
    from the SAME m-subset, so the frontier-join fanout is bounded by
    |frontier| * m instead of |frontier| * deg(hub) (the measured
    step-2 blowup: 1.5M walkers x ~30-degree part nodes -> 45M
    candidate rows per step on the 10x probe graph).

    The window partitions by src: over the walk loop's src-keyed edge
    cache this plans a per-partition sort with NO exchange, and the
    per-key sort group is bounded by the node's out-degree.
    """
    from pyspark.sql.window import Window

    g = F.md5(
        F.concat_ws(
            "|",
            F.col("src"),
            F.col("dst"),
            F.lit(str(s)),
            F.lit("cap"),
            F.lit(str(seed)),
        )
    )
    w = Window.partitionBy("src").orderBy("__g", "dst")
    return (
        edges.withColumn("__g", g)
        .withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= int(degree_cap))
        .drop("__g", "__r")
    )


def _walk_step(
    cur: DataFrame,
    edges: DataFrame,
    s: int,
    seed: int,
    walk_col: str,
    use_broadcast: bool,
    degree_cap: int | None = None,
) -> DataFrame:
    """One frontier expansion: (walk_id, __w, node) x out-edges ->
    (walk_id, __w, next, h). Broadcasts the frontier only when the
    caller determined it fits (``use_broadcast``) — above the threshold
    it is a plain hash join against src-keyed edges (bucket edges by
    src at 100 TB and the corpus side needs no exchange), because
    DeepWalk's real regime is walks-per-NODE: a corpus-sized frontier
    broadcast every step OOMs executors rather than degrading
    (VERDICT r11 item 2). The draw hash salts the walk seed with the
    per-seed walk index ``__w`` (seed + __w), so multiple walks from
    one seed diverge while walk 0 replays the single-walk contract
    bit-for-bit. ``degree_cap`` pre-filters the edge side to each
    node's per-step hash-top-m sample (``_capped_edges``)."""
    if degree_cap is not None:
        edges = _capped_edges(edges, s, seed, degree_cap)
    front = F.broadcast(cur) if use_broadcast else cur
    return front.join(edges, cur["node"] == edges["src"]).select(
        walk_col,
        "__w",
        F.col("dst").alias("next"),
        F.md5(
            F.concat_ws(
                "|",
                F.col("node"),
                F.col("dst"),
                F.lit(str(s)),
                (F.lit(seed) + F.col("__w")).cast("string"),
            )
        ).alias("h"),
    )


def random_walks(
    edges: DataFrame,
    seeds: DataFrame,
    n_steps: int = 3,
    seed: int = 7,
    id_col: str = "node",
    walk_col: str = "walk_id",
    walks_per_seed: int = 1,
    broadcast_threshold: int = 4_000_000,
    degree_cap: int | None = None,
) -> DataFrame:
    """Deterministic seeded random walks — the sampling primitive under
    DeepWalk/node2vec-style graph embeddings (Perozzi et al. 2014;
    public): each walker starts at a seed node and at step s moves to
    the out-neighbor minimizing the portable md5(cur|next|s|seed+w) — a
    per-node pseudo-uniform choice both engines replay exactly (md5
    order over neighbors is uniform; the min is the draw). ``w`` is the
    per-seed walk index: ``walks_per_seed`` > 1 (DeepWalk's gamma)
    fans every seed into walks ``node#0..node#gamma-1`` whose draws
    diverge via the salted seed; walk 0's path is bit-identical to the
    single-walk contract.

    Scale shape: the frontier is |seeds| x walks_per_seed rows —
    broadcast against the edge table each step only while that count is
    under ``broadcast_threshold``, else a plain hash join against
    src-keyed edges (bucket edges by src at 100 TB so the corpus side
    needs no exchange): walks-per-NODE frontiers are corpus-sized and
    must never be broadcast (VERDICT r11 item 2). The step-0 frontier
    is eagerly pinned BEFORE the threshold count, so the count never
    re-runs the seeds lineage (ADVICE r12) — it is one cheap job over
    the pinned frame, which steps 1..n reuse anyway. The per-walk
    choice is TWO map-side-combinable aggregations (min hash, then min
    neighbor at that hash), never a per-walk window. Walkers at a node
    with no out-edges drop out (the standard truncation). ``edges``
    must carry (src, dst); node ids are caller-namespaced strings when
    id spaces can collide (e.g. 'o:42' vs 'p:42' on a bipartite graph).

    Walk-id representation (VERDICT r12 item 7): internally each walker
    is keyed by ``xxhash64(node, w)`` — a LONG — so the per-step
    checkpointed frontiers carry 8-byte keys instead of the seed-node
    string + suffix (the per-node probe attributed its residual
    over-linear memory to 1.5M string walk-ids x 3 pinned frontiers).
    A collision guard (distinct-count over the pinned step-0 frontier,
    ~free) falls back to the string keys on the ~2^-64-probability hash
    collision — output is identical either way. The API edge still
    returns the string form ``node`` / ``node#w``; the part after the
    LAST '#' is the walk index (always bare digits), so the encoding is
    unambiguous even for node ids containing '#'.

    ``degree_cap`` (VERDICT r13 item 5 — the hub-fanout bound): when
    set, step s draws only from each node's hash-top-``degree_cap``
    out-edge sample (``_capped_edges``: rank by the walker-independent
    md5(src|dst|s|cap|seed), dst tie-break), so the candidate frame is
    bounded by |frontier| * degree_cap instead of |frontier| * deg —
    the per-node probe's residual 22.2x at both-axes-10x was exactly
    step-2 volume through ~200k high-degree hub nodes. BIAS CONTRACT:
    nodes with deg <= degree_cap are untouched (the sample is the full
    neighborhood — the draw stays pseudo-uniform over all neighbors);
    hub nodes draw pseudo-uniformly from a per-(node, step) seeded
    m-subset, i.e. neighborhood subsampling, standard DeepWalk/
    GraphSAGE practice for hubs — transition probabilities stay
    uniform WITHIN the sample but the sample re-rolls each step, so
    across steps every neighbor remains reachable. Pick m around the
    graph's 99th-percentile out-degree to bound only the hub tail.
    Default None = exact form (every out-edge a candidate).

    Returns (walk_col, step, node) including step 0 = the seed.
    Duplicate seed rows name the same walker — a walker is its
    (node, walk_index) identity and the draw is deterministic — so they
    produce exactly the unique-seed output, not multiplied rows
    (ADVICE r13; asserted list-wise, not set-wise, in
    tests/test_operators.py::test_random_walks_hashed_ids_edge_cases).
    """
    if walks_per_seed < 1:
        raise ValueError("walks_per_seed must be >= 1")
    if degree_cap is not None and degree_cap < 1:
        raise ValueError("degree_cap must be >= 1 (or None for exact)")
    base = seeds.select(F.col(id_col).cast("string").alias("node"))
    if walks_per_seed == 1:
        fan = base.select(F.lit(0).alias("__w"), "node")
        walk_str = F.col("node")
    else:
        fan = base.select(
            F.explode(
                F.array(*[F.lit(w) for w in range(walks_per_seed)])
            ).alias("__w"),
            "node",
        )
        walk_str = F.concat_ws("#", "node", F.col("__w").cast("string"))
    # pinned BEFORE the threshold count: the count job materializes the
    # checkpoint the walk loop reuses, instead of re-running the seeds
    # lineage for a throwaway count (ADVICE r12)
    start = fan.select(
        F.xxhash64("node", "__w").alias("__wid"),
        "__w",
        "node",
        walk_str.alias(walk_col),
    ).localCheckpoint(eager=True)
    n_walkers = start.count()
    if start.select("__wid").distinct().count() != n_walkers:
        # hash collision (or duplicate seed rows, which collided under
        # the string keys too): fall back to the string walk id — the
        # loop below is representation-agnostic. dropDuplicates: a
        # walker IS its (node, walk_index) identity, so duplicate seed
        # rows name the same deterministic walk — keep one walker, or
        # the mapping join would multiply every output row by the
        # duplicate count (ADVICE r13: step-0 rows quadrupled, later
        # steps doubled). Genuine hash collisions dedup nothing here:
        # the string keys they fall back to are distinct again.
        start = (
            start.withColumn("__wid", F.col(walk_col))
            .dropDuplicates(["__wid"])
            .localCheckpoint(eager=True)
        )
    mapping = start.select("__wid", walk_col)
    cur = start.select("__wid", "__w", "node")
    use_broadcast = n_walkers <= broadcast_threshold
    edges_j = edges
    persisted = None
    if not use_broadcast:
        # hash-join regime: co-locate edges by src ONCE. cache (not
        # localCheckpoint) because InMemoryRelation keeps the
        # outputPartitioning visible to the optimizer — every step then
        # shuffles only the frontier, where an unpinned edge frame
        # would re-scan + re-shuffle the full edge table per step
        # (measured: 332 s/step on the 12M-edge 10x probe graph) and a
        # checkpoint would erase the partitioning and re-exchange it.
        # On a real cluster, bucket edges by src at ingest instead.
        persisted = edges.repartition("src").persist()
        edges_j = persisted
    else:
        # broadcast regime (r14): the frontier broadcasts, but every
        # step still re-evaluated the caller's EDGE lineage from
        # scratch (scan + distinct + projections, once per step).
        # Persist the (src, dst) frame once — same rationale as the
        # hash regime minus the src co-location (no hash join to feed);
        # unpersisted with the same guard below.
        persisted = edges.persist()
        edges_j = persisted
    out = [cur.withColumn("step", F.lit(0))]
    for s in range(1, n_steps + 1):
        cand = _walk_step(
            cur, edges_j, s, seed, "__wid", use_broadcast,
            degree_cap=degree_cap,
        )
        # ONE map-side-combinable aggregation draws the step:
        # min(struct(h, next)) IS (min h, then min next at that h) —
        # lexicographic struct order — so the old min-h + join-back +
        # min-next shape (three shuffles of the candidate frame per
        # step) collapses to one (r12; the per-node 10x probe exposed
        # the difference at 1.5M walkers x 12M edges).
        # pin each frontier: step s+1 and the final union both re-read it,
        # and without truncation the union replays every earlier step's
        # joins per branch — O(steps^2) shuffles (the resolve_duplicate_
        # clusters lineage discipline; the frame is |walks| rows)
        cur = (
            cand.groupBy("__wid", "__w")  # __w rides along (1:1 walk_id)
            .agg(F.min(F.struct("h", "next")).alias("__hn"))
            .select("__wid", "__w", F.col("__hn.next").alias("node"))
        ).localCheckpoint(eager=True)
        out.append(cur.withColumn("step", F.lit(s)))
    if persisted is not None:
        # every frontier was eagerly checkpointed above — the returned
        # union never re-reads the edge cache
        persisted.unpersist()
    res = out[0]
    for df in out[1:]:
        res = res.unionByName(df)
    # API edge: map the long walk key back to the string form via the
    # pinned step-0 mapping — broadcast in the small regime (zero
    # shuffle), plain hash join in the per-node regime
    m = F.broadcast(mapping) if use_broadcast else mapping
    return res.join(m, "__wid").select(walk_col, "step", "node")


def walk_cooccurrence(
    walks: DataFrame,
    window: int = 2,
    walk_col: str = "walk_id",
) -> DataFrame:
    """(center, context) skip-gram pair counts over walk sequences — the
    consumable DeepWalk actually trains on (Perozzi et al. 2014 §4,
    public): every same-walk position pair within ``window`` steps
    (0 < |i - j| <= window), counted across all walks. ``random_walks``
    terminates at the sampling primitive; this is the export that turns
    its paths into skip-gram training pairs (VERDICT r11 item 7).

    Scale shape: ONE equi-join of the walk frame with itself on walk_id
    — per-key groups are bounded by the walk length (n_steps + 1 rows),
    so the join can never skew regardless of corpus size — then one
    map-side-combinable count by (center, context). No per-walk window
    function, no explode of materialized pair lists.

    Returns (center, context, n_pairs).
    """
    a = walks.select(
        F.col(walk_col).alias("__wid"),
        F.col("step").alias("__si"),
        F.col("node").alias("center"),
    )
    b = walks.select(
        F.col(walk_col).alias("__wid"),
        F.col("step").alias("__sj"),
        F.col("node").alias("context"),
    )
    return (
        a.join(b, "__wid")
        .filter(
            (F.col("__sj") != F.col("__si"))
            & (F.abs(F.col("__sj") - F.col("__si")) <= int(window))
        )
        .groupBy("center", "context")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )
