"""Unit tests for the operator library over small literal frames."""

from __future__ import annotations

from pyspark.sql import functions as F

from experimentsplan_datapipeline_spark.operators import aggregates as agg
from experimentsplan_datapipeline_spark.operators import filters as flt
from experimentsplan_datapipeline_spark.operators import joins as jn
from experimentsplan_datapipeline_spark.operators import sampling as smp
from experimentsplan_datapipeline_spark.operators import windows as win


def test_assemble_triplets(spark):
    files = spark.createDataFrame(
        [
            ("s1", "initial_image", "a.png"),
            ("s1", "cloth_image", "b.png"),
            ("s1", "try_on_image", "c.png"),
            ("s2", "initial_image", "d.png"),  # incomplete -> dropped
        ],
        ["stem", "itype", "path"],
    )
    out = jn.assemble_triplets(
        files, "stem", "itype", "path",
        ["initial_image", "cloth_image", "try_on_image"],
    ).collect()
    assert len(out) == 1
    assert out[0].stem == "s1"
    assert out[0].cloth_image == "b.png"


def test_having_count(spark):
    df = spark.createDataFrame([("a",), ("a",), ("b",)], ["k"])
    out = flt.having_count(df, ["k"], 2).collect()
    assert [(r.k, r.n) for r in out] == [("a", 2)]


def test_classify_default(spark):
    df = spark.createDataFrame(
        [("x/easy/1",), ("x/HARD/2",), ("x/unknown/3",)], ["p"]
    )
    out = flt.classify_by_substring(
        df, "p", [("/easy/", "easy"), ("/medium/", "medium"), ("/hard/", "hard")],
        default="easy", out_col="difficulty",
    )
    got = sorted((r.p, r.difficulty) for r in out.collect())
    assert got == [("x/HARD/2", "hard"), ("x/easy/1", "easy"), ("x/unknown/3", "easy")]


def test_ema_matches_loop(spark):
    vals = [1.0, 2.0, 3.0, 4.0]
    decay = 0.9
    df = spark.createDataFrame(
        [("k", i, v) for i, v in enumerate(vals)], ["key", "step", "v"]
    )
    out = agg.ema(df, ["key"], "step", "v", decay=decay).collect()[0]
    s = vals[0]
    for v in vals[1:]:
        s = (1 - decay) * v + decay * s
    assert abs(out.ema - s) < 1e-12


def test_stratified_exact_counts_and_determinism(spark):
    rows = [(i, "a" if i % 2 == 0 else "b") for i in range(100)]
    df = spark.createDataFrame(rows, ["id", "stratum"])
    s1 = smp.stratified_exact(df, "stratum", {"a": 10, "b": 5}, ["id"], seed=7)
    s2 = smp.stratified_exact(df, "stratum", {"a": 10, "b": 5}, ["id"], seed=7)
    got1 = sorted((r.id, r.stratum) for r in s1.collect())
    got2 = sorted((r.id, r.stratum) for r in s2.collect())
    assert got1 == got2  # deterministic
    from collections import Counter
    c = Counter(s for _, s in got1)
    assert c == {"a": 10, "b": 5}
    # different seed -> different selection (overwhelmingly likely)
    s3 = smp.stratified_exact(df, "stratum", {"a": 10, "b": 5}, ["id"], seed=8)
    got3 = sorted((r.id, r.stratum) for r in s3.collect())
    assert got1 != got3


def test_stratified_exact_duplicate_keys_deterministic(spark):
    """key_cols that do NOT uniquely identify rows: the full-row hash
    tiebreak must pin which duplicate is picked independent of the physical
    partitioning (without it the choice is partition-order dependent)."""
    rows = [(i % 10, f"payload_{i}", "a") for i in range(100)]
    df1 = spark.createDataFrame(rows, ["id", "payload", "stratum"]).repartition(2)
    df2 = spark.createDataFrame(rows[::-1], ["id", "payload", "stratum"]).repartition(
        17, "payload"
    )
    pick1 = sorted(
        (r.id, r.payload)
        for r in smp.stratified_exact(df1, "stratum", {"a": 5}, ["id"], seed=3).collect()
    )
    pick2 = sorted(
        (r.id, r.payload)
        for r in smp.stratified_exact(df2, "stratum", {"a": 5}, ["id"], seed=3).collect()
    )
    assert pick1 == pick2


def test_stratified_with_replacement_tops_up(spark):
    rows = [(i, "a") for i in range(3)]
    df = spark.createDataFrame(rows, ["id", "stratum"])
    out = smp.stratified_with_replacement(df, "stratum", {"a": 8}, ["id"], seed=1)
    got = [r.id for r in out.collect()]
    assert len(got) == 8
    assert set(got) == {0, 1, 2}  # every source row used at least once


def test_with_replacement_truncates_long_strata(spark):
    rows = [(i, "a") for i in range(10)]
    df = spark.createDataFrame(rows, ["id", "stratum"])
    out = smp.stratified_with_replacement(df, "stratum", {"a": 4}, ["id"], seed=1)
    assert out.count() == 4


def test_latest_by(spark):
    import datetime

    df = spark.createDataFrame(
        [
            ("m1", "old.pt", datetime.datetime(2024, 1, 1)),
            ("m1", "new.pt", datetime.datetime(2024, 2, 1)),
            ("m2", "only.pt", datetime.datetime(2024, 1, 5)),
        ],
        ["model", "key", "ts"],
    )
    out = {r.model: r.latest for r in win.latest_by(df, ["model"], "ts", "key").collect()}
    assert out == {"m1": "new.pt", "m2": "only.pt"}


def test_priority_fallback(spark):
    import datetime

    s3 = spark.createDataFrame(
        [("m1", "s3.pt", datetime.datetime(2024, 1, 1))], ["model", "key", "ts"]
    )
    local = spark.createDataFrame(
        [
            ("m1", "local.pt", datetime.datetime(2024, 6, 1)),
            ("m2", "local2.pt", datetime.datetime(2024, 1, 1)),
        ],
        ["model", "key", "ts"],
    )
    out = {
        r.model: r.key
        for r in win.priority_fallback([(s3, 1), (local, 2)], ["model"], "ts").collect()
    }
    # priority wins over recency: m1 resolves from s3 even though local is newer
    assert out == {"m1": "s3.pt", "m2": "local2.pt"}


def test_semi_anti(spark):
    left = spark.createDataFrame([(1,), (2,), (3,)], ["k"])
    right = spark.createDataFrame([(2,), (3,)], ["r"])
    semi = jn.semi_join(left, right, left["k"] == right["r"])
    anti = jn.anti_join(left, right, left["k"] == right["r"])
    assert sorted(r.k for r in semi.collect()) == [2, 3]
    assert [r.k for r in anti.collect()] == [1]


def test_prefix_join_normalized_equals_theta(spark):
    files = spark.createDataFrame(
        [("00042_cloth_front.png",), ("00099_cloth_back.png",)], ["fname"]
    )
    stems = spark.createDataFrame([("00042",), ("00077",)], ["stem"])
    from experimentsplan_datapipeline_spark.functions.strings import first_token

    norm = jn.normalize_prefix_join(
        files, stems, "fname", "stem", first_token("fname")
    )
    theta = jn.prefix_theta_join(files, stems, "fname", "stem")
    assert sorted(r.fname for r in norm.collect()) == sorted(
        r.fname for r in theta.collect()
    ) == ["00042_cloth_front.png"]


def test_asof_join_picks_latest_at_or_before(spark):
    import datetime as dt

    from experimentsplan_datapipeline_spark.operators.joins import asof_join

    T = lambda m: dt.datetime(2026, 1, 1, 0, m)
    left = spark.createDataFrame(
        [(1, 100, T(10)), (1, 101, T(30)), (2, 200, T(5))],
        ["uid", "eid", "ts"],
    )
    right = spark.createDataFrame(
        [(1, T(10), 1.0), (1, T(20), 2.0), (1, T(40), 9.0), (2, T(6), 5.0)],
        ["uid", "rts", "val"],
    )
    out = {
        r.eid: r.val
        for r in asof_join(left, right, "uid", "ts", "rts", ["val"]).collect()
    }
    # eid 100: exact tie at :10 matches (<=); eid 101: latest before :30 is
    # :20; eid 200: only right row is at :06 > :05 -> null
    assert out == {100: 1.0, 101: 2.0, 200: None}


def test_range_join_banded_matches_theta(spark):
    import datetime as dt

    from experimentsplan_datapipeline_spark.operators.joins import range_join_banded

    base = dt.datetime(2026, 1, 1)
    left = spark.createDataFrame(
        [(1, i, base + dt.timedelta(minutes=7 * i)) for i in range(10)],
        ["uid", "lid", "ts"],
    )
    right = spark.createDataFrame(
        [(1, 100 + j, base + dt.timedelta(minutes=3 * j)) for j in range(25)],
        ["uid", "rid", "rts"],
    )
    got = sorted(
        (r.lid, r.rid)
        for r in range_join_banded(left, right, "uid", "ts", "rts", 600).collect()
    )
    expected = sorted(
        (r.lid, r.rid)
        for r in left.join(right, "uid")
        .filter(
            (F.col("rts") >= F.col("ts"))
            & (F.col("rts") < F.col("ts") + F.expr("INTERVAL 600 SECONDS"))
        )
        .collect()
    )
    assert got == expected and len(got) > 0


def test_hash_rank_matches_single_window(spark):
    from pyspark.sql.window import Window

    df = spark.range(0, 500).select(
        F.col("id"), (F.col("id") % 3).cast("string").alias("grp")
    )
    for buckets in (1, 7, 32):
        got = {
            (r.grp, r.id): r.rk
            for r in smp.hash_rank(
                df, ["id"], partition_cols=["grp"], seed=7, buckets=buckets
            ).collect()
        }
        salted = F.concat_ws("|", F.col("id").cast("string"), F.lit("7"))
        w = Window.partitionBy("grp").orderBy(F.md5(salted), "id")
        want = {
            (r.grp, r.id): r.rk
            for r in df.withColumn("rk", F.row_number().over(w)).collect()
        }
        assert got == want


def test_hash_rank_no_partition(spark):
    df = spark.range(0, 100)
    ranks = sorted(
        r.rk for r in smp.hash_rank(df, ["id"], seed=1, buckets=8).collect()
    )
    assert ranks == list(range(1, 101))


def test_mixture_interleave_proportions(spark):
    a = spark.range(0, 700).select(F.col("id"))
    b = spark.range(1000, 1300).select(F.col("id"))
    out = smp.mixture_interleave(
        {"a": a, "b": b}, {"a": 0.7, "b": 0.3}, ["id"], seed=3
    ).collect()
    assert len(out) == 1000
    # every prefix of the pos-sorted stream holds sources ~in weight ratio
    ordered = sorted(out, key=lambda r: (r.pos, r.source))
    head = ordered[:100]
    n_a = sum(1 for r in head if r.source == "a")
    assert 60 <= n_a <= 80


def test_stratified_exact_two_phase_matches_single_window(spark):
    # >16 input partitions engages the bucketed pre-phase; the output must
    # be identical to the plain single-window form (few partitions).
    df = spark.range(0, 2000).select(
        F.col("id"), (F.col("id") % 3).cast("string").alias("grp")
    )
    targets = {"0": 50, "1": 10, "2": 700}
    wide = smp.stratified_exact(
        df.repartition(32), "grp", targets, ["id"], seed=5, mode="hash"
    )
    narrow = smp.stratified_exact(
        df.coalesce(1), "grp", targets, ["id"], seed=5, mode="hash"
    )
    got = sorted((r.grp, r.id) for r in wide.collect())
    want = sorted((r.grp, r.id) for r in narrow.collect())
    assert got == want
    from collections import Counter

    counts = Counter(g for g, _ in got)
    # stratum "2" holds 666 rows < target 700 -> all kept (reference's
    # short-stratum semantics without replacement)
    assert counts == {"0": 50, "1": 10, "2": 666}


def test_trailing_stats_halo_matches_global_window(spark):
    # buckets deliberately SHORTER than the frame (2-3 rows/day, N=5) so a
    # row's frame spans several buckets back — the chained-halo path
    import datetime as dt

    from pyspark.sql.window import Window

    rows = []
    ts = dt.datetime(2024, 1, 1)
    for i in range(40):
        # 2-3 events per day across 2 groups
        ts = ts + dt.timedelta(hours=9 + (i % 3) * 5)
        rows.append((i, "g" + str(i % 2), ts, float((i * 37) % 100)))
    df = spark.createDataFrame(rows, ["event_id", "grp", "ts", "value"])

    from experimentsplan_datapipeline_spark.operators.windows import (
        trailing_stats_halo,
    )

    got = {
        r["event_id"]: (r["__mu"], r["__sd"])
        for r in trailing_stats_halo(
            df, "grp", "ts", "event_id", "value", n_preceding=5, bucket="DAY"
        ).collect()
    }
    w = (
        Window.partitionBy("grp").orderBy("ts", "event_id").rowsBetween(-5, -1)
    )
    want = {
        r.event_id: (r.mu, r.sd)
        for r in df.select(
            "event_id",
            F.avg("value").over(w).alias("mu"),
            F.stddev("value").over(w).alias("sd"),
        ).collect()
    }
    assert set(got) == set(want)
    for k in want:
        for a, b in zip(got[k], want[k]):
            assert (a is None and b is None) or abs(a - b) < 1e-9


def test_bloom_semi_join_matches_exact_semi(spark):
    """Bloom prune must never change the semi-join answer (false positives
    are filtered by the trailing exact join; hashing keys as strings on
    both sides prevents type-split false negatives)."""
    from experimentsplan_datapipeline_spark.operators.joins import (
        bloom_semi_join,
        semi_join,
    )

    big = spark.range(0, 5000).selectExpr("id as k", "id * 2 as v")
    small = spark.range(0, 5000).selectExpr("cast(id * 7 as int) as sk").filter(
        "sk < 300"
    )
    got = sorted(
        r["k"] for r in bloom_semi_join(big, small, "k", "sk").collect()
    )
    want = sorted(
        r["k"]
        for r in semi_join(
            big.alias("l"), small.alias("r"),
            big["k"] == small["sk"],
        ).collect()
    )
    assert got == want and len(got) == 43  # multiples of 7 below 300


def test_bloom_semi_join_empty_build_side(spark):
    from experimentsplan_datapipeline_spark.operators.joins import bloom_semi_join

    big = spark.range(0, 100).selectExpr("id as k")
    small = spark.range(0, 100).selectExpr("id as sk").filter("sk < 0")
    assert bloom_semi_join(big, small, "k", "sk").count() == 0


def test_two_phase_topk_equals_single_window(spark):
    from pyspark.sql import functions as F

    from experimentsplan_datapipeline_spark.operators.windows import (
        top_k_per_key_two_phase,
        top_k_per_key,
    )

    df = spark.range(0, 3000).selectExpr(
        "cast(id % 3 as string) as key",
        "id as rid",
        "cast((id * 131) % 997 as double) as score",
    )
    order = [F.col("score").desc(), F.col("rid").asc()]
    got = sorted(
        (r["key"], r["rid"], r["rank"])
        for r in top_k_per_key_two_phase(
            df, ["key"], order, 7, bucket_cols=["rid"], n_buckets=8
        ).collect()
    )
    want_rows = top_k_per_key(df, ["key"], order, 7).collect()
    # recompute ranks for the single-window reference
    want = sorted(
        (r["key"], r["rid"], rank)
        for key in {r["key"] for r in want_rows}
        for rank, r in enumerate(
            sorted(
                (r for r in want_rows if r["key"] == key),
                key=lambda r: (-r["score"], r["rid"]),
            ),
            start=1,
        )
    )
    assert got == want


def test_bm25_topk_ranks_matching_docs(spark):
    from experimentsplan_datapipeline_spark.operators.text_analysis import bm25_topk

    docs = spark.createDataFrame(
        [
            (0, "spark shuffle join"),
            (1, "spark spark spark shuffle"),
            (2, "cat dog fish"),
            (3, "join join shuffle spark extra words here padding tokens"),
        ],
        ["doc_id", "text"],
    )
    queries = spark.createDataFrame(
        [("q1", "spark shuffle")], ["query_id", "query_text"]
    )
    rows = bm25_topk(docs, queries, "doc_id", "text", k=10).collect()
    ids = {r["doc_id"] for r in rows}
    assert ids == {0, 1, 3}  # doc 2 shares no term -> absent
    assert all(r["bm25"] > 0 for r in rows)
    ranks = sorted(r["rank"] for r in rows)
    assert ranks == [1, 2, 3]


def test_merge_upsert_semantics(spark):
    """Updates override by key, new keys insert, untouched base rows pass
    through — one max_by aggregation, no window."""
    from experimentsplan_datapipeline_spark.operators.joins import merge_upsert

    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], ["k", "s", "v"]
    )
    upd = spark.createDataFrame(
        [(2, "B", 99.0), (9, "new", 1.0)], ["k", "s", "v"]
    )
    got = {r["k"]: (r["s"], r["v"]) for r in merge_upsert(base, upd, ["k"]).collect()}
    assert got == {
        1: ("a", 10.0),
        2: ("B", 99.0),
        3: ("c", 30.0),
        9: ("new", 1.0),
    }


def test_expectation_report_single_pass(spark):
    from pyspark.sql import functions as F

    from experimentsplan_datapipeline_spark.operators.filters import (
        expectation_report,
    )

    df = spark.createDataFrame(
        [(1, 5.0), (2, -1.0), (3, None), (4, 2.0)], ["id", "v"]
    )
    out = {
        r.rule: (r.n_violations, r.passed)
        for r in expectation_report(
            df,
            {
                "v_positive": F.col("v").isNull() | (F.col("v") <= 0),
                "id_nonnull": F.col("id").isNull(),
            },
        ).collect()
    }
    assert out == {"v_positive": (2, False), "id_nonnull": (0, True)}


def test_pagerank_uniform_on_symmetric_graph(spark):
    """On a vertex-transitive graph (triangle, both directions) PageRank is
    exactly uniform at every iteration, and total mass stays 1."""
    from experimentsplan_datapipeline_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(a, b) for a in range(3) for b in range(3) if a != b], ["src", "dst"]
    )
    out = {r.node: r.pagerank for r in pagerank(edges, iterations=4).collect()}
    assert set(out) == {0, 1, 2}
    for v in out.values():
        assert abs(v - 1.0 / 3.0) < 1e-12
    assert abs(sum(out.values()) - 1.0) < 1e-9


def test_pagerank_favors_hub(spark):
    """A star (hub 0 connected to 1..4, undirected) concentrates rank on
    the hub; leaves tie exactly; mass is conserved."""
    from experimentsplan_datapipeline_spark.operators.graph import pagerank

    pairs = [(0, i) for i in range(1, 5)]
    edges = spark.createDataFrame(
        pairs + [(b, a) for a, b in pairs], ["src", "dst"]
    )
    out = {r.node: r.pagerank for r in pagerank(edges, iterations=3).collect()}
    assert out[0] > max(out[i] for i in range(1, 5))
    assert len({round(out[i], 12) for i in range(1, 5)}) == 1
    assert abs(sum(out.values()) - 1.0) < 1e-9


def test_pagerank_directed_sink_conserves_mass(spark):
    """Directed chain 0->1->2 where 2 is a SINK (no out-edges) and 0 has no
    in-edges: the sink's mass must redistribute (not leak), node 0 must stay
    in the output with its (1-d)/N + dangling share every round (the old
    inner-join form dropped it after round 1), and total mass stays 1."""
    from experimentsplan_datapipeline_spark.operators.graph import pagerank

    edges = spark.createDataFrame([(0, 1), (1, 2)], ["src", "dst"])
    for iters in (1, 2, 3, 5):
        out = {
            r.node: r.pagerank
            for r in pagerank(edges, iterations=iters).collect()
        }
        assert set(out) == {0, 1, 2}, f"node dropped at iterations={iters}"
        assert abs(sum(out.values()) - 1.0) < 1e-9, f"mass leak at {iters}"
    # hand-computed round 1 (d=0.85, N=3, pr0 = 1/3 each, dangling S=1/3):
    # every node gets base = 0.15/3 + 0.85*(1/3)/3; nodes 1,2 add 0.85*(1/3)
    base = 0.15 / 3 + 0.85 * (1.0 / 3.0) / 3
    out1 = {
        r.node: r.pagerank for r in pagerank(edges, iterations=1).collect()
    }
    assert abs(out1[0] - base) < 1e-12
    assert abs(out1[1] - (base + 0.85 / 3.0)) < 1e-12
    assert abs(out1[2] - (base + 0.85 / 3.0)) < 1e-12


def test_pagerank_weighted_follows_heavy_edge(spark):
    """Weighted variant: node 0 splits its vote 9:1 between 1 and 2; node 1
    must outrank node 2, uniform weights must equal the unweighted result,
    and mass is conserved."""
    from experimentsplan_datapipeline_spark.operators.graph import pagerank

    rows = [(0, 1, 9.0), (0, 2, 1.0), (1, 0, 1.0), (2, 0, 1.0)]
    edges = spark.createDataFrame(rows, ["src", "dst", "w"])
    out = {
        r.node: r.pagerank
        for r in pagerank(edges, iterations=3, weight_col="w").collect()
    }
    assert out[1] > out[2]
    assert abs(sum(out.values()) - 1.0) < 1e-9
    uni = spark.createDataFrame(
        [(s, d, 1.0) for s, d, _ in rows], ["src", "dst", "w"]
    )
    got_w = {
        r.node: r.pagerank
        for r in pagerank(uni, iterations=3, weight_col="w").collect()
    }
    got_u = {
        r.node: r.pagerank
        for r in pagerank(uni.drop("w"), iterations=3).collect()
    }
    for k in got_u:
        assert abs(got_w[k] - got_u[k]) < 1e-12


def test_pagerank_until_converges_and_matches_unrolled(spark):
    """Convergence mode: on the undirected star it must (a) report a delta
    below tol, (b) agree value-for-value with the fixed unroll at the same
    round count, and (c) be deterministic across runs (same iteration count
    AND bit-identical ranks — the rows-only contract for the variant with
    no finite CTE oracle)."""
    from experimentsplan_datapipeline_spark.operators.graph import (
        pagerank,
        pagerank_until,
    )

    pairs = [(0, i) for i in range(1, 5)]
    edges = spark.createDataFrame(
        pairs + [(b, a) for a, b in pairs], ["src", "dst"]
    )
    # damping 0.5: the star's L-inf delta decays like damping^k, so 0.85
    # would need ~115 rounds for 1e-8 — 0.5 converges in ~27
    ranks, info = pagerank_until(edges, tol=1e-8, max_iter=60, damping=0.5)
    got = {r.node: r.pagerank for r in ranks.collect()}
    assert info["delta"] < 1e-8
    assert 1 < info["iterations"] < 60
    assert abs(sum(got.values()) - 1.0) < 1e-9
    unrolled = {
        r.node: r.pagerank
        for r in pagerank(
            edges, iterations=info["iterations"], damping=0.5
        ).collect()
    }
    for k, v in unrolled.items():
        assert abs(got[k] - v) < 1e-12
    ranks2, info2 = pagerank_until(edges, tol=1e-8, max_iter=60, damping=0.5)
    got2 = {r.node: r.pagerank for r in ranks2.collect()}
    assert info2["iterations"] == info["iterations"]
    assert got2 == got
    # check_every > 1 trades delta checks for rounds but lands on the same
    # fixed point (a few extra rounds past convergence are a no-op drift)
    ranks3, info3 = pagerank_until(
        edges, tol=1e-8, max_iter=60, check_every=5, damping=0.5
    )
    got3 = {r.node: r.pagerank for r in ranks3.collect()}
    assert info3["iterations"] % 5 == 0
    for k, v in got.items():
        assert abs(got3[k] - v) < 1e-7


def test_pagerank_personalized_hand_computed_with_dangling(spark):
    """Personalized PR on the chain 0->1->2 (2 is a sink), restart set {0}:
    hand-computed 3-round ladder, including the round where the sink's
    dangling mass teleports back to the restart node (NOT uniformly)."""
    from experimentsplan_datapipeline_spark.operators.graph import (
        pagerank_personalized,
    )
    from pyspark.sql import functions as F

    edges = spark.createDataFrame([(0, 1), (1, 2)], ["src", "dst"])
    pred = lambda node: node == F.lit(0)  # noqa: E731
    # pr0 = (1,0,0); r = (1,0,0); d = 0.85
    # round1: mass=(.,1,0), S=pr0[2]=0  -> (0.15, 0.85, 0)
    # round2: mass=(.,0.15,0.85), S=0  -> (0.15, 0.1275, 0.7225)
    # round3: S=0.7225 teleports to 0  -> (0.764125, 0.1275, 0.108375)
    expected = {
        1: {0: 0.15, 1: 0.85, 2: 0.0},
        2: {0: 0.15, 1: 0.1275, 2: 0.7225},
        3: {0: 0.764125, 1: 0.1275, 2: 0.108375},
    }
    for iters, exp in expected.items():
        out = {
            r.node: r.pagerank
            for r in pagerank_personalized(
                edges, pred, iterations=iters
            ).collect()
        }
        assert abs(sum(out.values()) - 1.0) < 1e-9, f"mass leak at {iters}"
        for k, v in exp.items():
            assert abs(out[k] - v) < 1e-12, f"round {iters} node {k}"


def test_pagerank_personalized_concentrates_on_restart_set(spark):
    """On the 3-node complete graph (symmetric, no dangling), restarting at
    node 0 must rank it first; a restart set of ALL nodes must reproduce
    plain pagerank exactly (uniform teleport is the degenerate case)."""
    from experimentsplan_datapipeline_spark.operators.graph import (
        pagerank,
        pagerank_personalized,
    )
    from pyspark.sql import functions as F

    edges = spark.createDataFrame(
        [(a, b) for a in range(3) for b in range(3) if a != b], ["src", "dst"]
    )
    out = {
        r.node: r.pagerank
        for r in pagerank_personalized(
            edges, lambda n: n == F.lit(0), iterations=3
        ).collect()
    }
    assert out[0] > out[1] and out[0] > out[2]
    assert abs(out[1] - out[2]) < 1e-12
    assert abs(sum(out.values()) - 1.0) < 1e-9
    uni = {
        r.node: r.pagerank
        for r in pagerank_personalized(
            edges, lambda n: F.lit(True), iterations=3
        ).collect()
    }
    plain = {
        r.node: r.pagerank for r in pagerank(edges, iterations=3).collect()
    }
    for k, v in plain.items():
        assert abs(uni[k] - v) < 1e-12


def test_copurchase_pairs_blocked_matches_plain(spark):
    """The triangle-blocked pair generation is EXACT: for any n_blocks it
    must emit the identical pair multiset as the plain self-join, including
    a group larger than the block count, same-block pairs, duplicate input
    rows (distinct semantics), and single-item groups (no pairs)."""
    from experimentsplan_datapipeline_spark.operators.graph import (
        copurchase_pairs,
    )

    rows = (
        [(1, i) for i in range(11)]          # large group
        + [(2, 5), (2, 7), (2, 7)]           # dup input row
        + [(3, 42)]                          # singleton -> no pairs
        + [(4, i * 3) for i in range(5)]
    )
    items = spark.createDataFrame(rows, ["o", "p"])
    plain = sorted(
        (r.g, r.pa, r.pb)
        for r in copurchase_pairs(items, "o", "p", n_blocks=1).collect()
    )
    assert len(plain) == 55 + 1 + 0 + 10
    assert (3, 42, 42) not in plain
    for m in (2, 3, 4, 16):
        blocked = sorted(
            (r.g, r.pa, r.pb)
            for r in copurchase_pairs(items, "o", "p", n_blocks=m).collect()
        )
        assert blocked == plain, f"n_blocks={m} diverged"


def test_pin_table_mode_roundtrips_and_buckets(spark):
    """pin(mode='table') must return the same rows re-read from a durable
    parquet stage (plan shows a parquet/table scan, not ExistingRDD), and
    the bucketed variant must register a bucketed table the downstream
    join can use without an exchange on the bucket key."""
    import tempfile

    from pyspark.sql import functions as F

    from experimentsplan_datapipeline_spark.operators.util import pin

    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("k")
    )
    with tempfile.TemporaryDirectory() as tmp:
        spark.conf.set("spark.experimentsplan.pin.dir", tmp)
        try:
            pinned = pin(df, mode="table")
            assert sorted(r.id for r in pinned.collect()) == list(range(100))
            plan = pinned._jdf.queryExecution().executedPlan().toString()
            assert "ExistingRDD" not in plan
        finally:
            spark.conf.unset("spark.experimentsplan.pin.dir")
    bucketed = pin(df, mode="table", bucket_cols=["k"], n_buckets=4)
    assert bucketed.groupBy("k").count().count() == 7
    # grouping on the bucket key needs no shuffle: bucket layout already
    # satisfies the aggregation's required distribution
    agg_plan = (
        bucketed.groupBy("k")
        .agg(F.sum("id").alias("s"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in agg_plan
    # default mode stays localCheckpoint (lazy) — unchanged behavior
    local = pin(df)
    assert sorted(r.id for r in local.collect()) == list(range(100))


def test_pin_rejects_unknown_mode(spark):
    import pytest as _pytest

    from experimentsplan_datapipeline_spark.operators.util import pin

    with _pytest.raises(ValueError, match="unknown pin mode"):
        pin(spark.range(3), mode="cloud")


def test_pin_table_mode_end_to_end_operators(spark):
    """The cluster-grade pinning path is exercised through REAL operators,
    not just the helper: with spark.experimentsplan.pin.mode=table, the
    full PageRank ladder (contrib_base, node frame, inter-round rank
    frames) and the exact-Jaccard front end (_ranked_gid_sets) run their
    pins through durable parquet stage tables and must produce results
    identical to local-checkpoint mode."""
    import tempfile

    from experimentsplan_datapipeline_spark.operators.dedup import (
        jaccard_prefix_join,
    )
    from experimentsplan_datapipeline_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (0, 2), (3, 0)], ["src", "dst"]
    )
    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g"),
            (2, "a b c d e f h"),
            (3, "x y z w v u t"),
            (4, "a b c d e f g"),
        ],
        ["doc_id", "text"],
    )
    local_pr = sorted(
        (r.node, round(r.pagerank, 12))
        for r in pagerank(edges, iterations=3).collect()
    )
    local_jc = sorted(
        (r.id_a, r.id_b, round(r.jaccard, 6))
        for r in jaccard_prefix_join(docs, "text", "doc_id", 2, 0.5).collect()
    )
    with tempfile.TemporaryDirectory() as tmp:
        spark.conf.set("spark.experimentsplan.pin.mode", "table")
        spark.conf.set("spark.experimentsplan.pin.dir", tmp)
        try:
            table_pr = sorted(
                (r.node, round(r.pagerank, 12))
                for r in pagerank(edges, iterations=3).collect()
            )
            table_jc = sorted(
                (r.id_a, r.id_b, round(r.jaccard, 6))
                for r in jaccard_prefix_join(
                    docs, "text", "doc_id", 2, 0.5
                ).collect()
            )
        finally:
            spark.conf.unset("spark.experimentsplan.pin.mode")
            spark.conf.unset("spark.experimentsplan.pin.dir")
    assert table_pr == local_pr
    assert table_jc == local_jc


def test_purge_pins_reclaims_table_mode_state(spark):
    """pin(mode='table') is durable by design, but the state must not
    outlive the job: after a pagerank_until table-mode run (one stage
    table or parquet dir per round), purge_pins must leave NO _pins_*
    tables in the catalog and no pin dirs on disk — and purge only what
    THIS process created."""
    import os as _os
    import tempfile

    from experimentsplan_datapipeline_spark.operators.graph import (
        pagerank_until,
    )
    from experimentsplan_datapipeline_spark.operators.util import (
        pin,
        purge_pins,
    )

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (0, 2), (3, 0)], ["src", "dst"]
    )
    with tempfile.TemporaryDirectory() as tmp:
        spark.conf.set("spark.experimentsplan.pin.mode", "table")
        spark.conf.set("spark.experimentsplan.pin.dir", tmp)
        try:
            ranks, info = pagerank_until(
                edges, tol=1e-6, max_iter=20, damping=0.5
            )
            assert ranks.count() == 4 and info["iterations"] >= 2
            # the bucketed path too, so both kinds of state are present
            pin(spark.range(10), mode="table", bucket_cols=["id"])
            assert _os.listdir(tmp)  # parquet pin dirs exist pre-purge
            assert spark.sql(
                "SHOW TABLES LIKE '_pins_*'"
            ).count()  # stage tables exist pre-purge
            stats = purge_pins(spark)
        finally:
            spark.conf.unset("spark.experimentsplan.pin.mode")
            spark.conf.unset("spark.experimentsplan.pin.dir")
        assert stats["paths"] >= info["iterations"] and stats["tables"] >= 1
        assert spark.sql("SHOW TABLES LIKE '_pins_*'").count() == 0
        assert _os.listdir(tmp) == []  # every pin dir deleted
        # idempotent and scoped: nothing tracked -> nothing purged
        assert purge_pins(spark) == {"tables": 0, "paths": 0}


def test_triangle_count_hand_checked(spark):
    """K4 (mixed directions + duplicate edges) has 4 triangles, every node
    in 3; a star has none; a triangle with a pendant counts only the
    triangle's members; self-loops are ignored."""
    from experimentsplan_datapipeline_spark.operators.graph import (
        triangle_count,
    )

    k4 = [(a, b) for a in range(4) for b in range(4) if a != b]  # both dirs
    out = {
        r.node: r.n_triangles
        for r in triangle_count(spark.createDataFrame(k4, ["src", "dst"]))
        .collect()
    }
    assert out == {0: 3, 1: 3, 2: 3, 3: 3}

    star = [(0, i) for i in range(1, 6)] + [(3, 3)]  # + self-loop
    assert (
        triangle_count(spark.createDataFrame(star, ["src", "dst"])).count()
        == 0
    )

    pendant = [(0, 1), (1, 2), (2, 0), (0, 3), (1, 0)]  # dup reverse edge
    out_p = {
        r.node: r.n_triangles
        for r in triangle_count(
            spark.createDataFrame(pendant, ["src", "dst"])
        ).collect()
    }
    assert out_p == {0: 1, 1: 1, 2: 1}


def test_label_propagation_hand_checked(spark):
    """Two triangles bridged by one edge, deterministic min-label
    tie-breaks traced by hand for both rounds; plus: a node with no
    in-edges keeps its own label, and a rerun is bit-identical."""
    from experimentsplan_datapipeline_spark.operators.graph import (
        label_propagation,
    )

    und = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], ["src", "dst"]
    )
    # round 1 (all neighbor counts 1 -> min label): {0:1, 1:0, 2:0, 3:2,
    # 4:3, 5:3}; round 2: 0 sees {0,0}->0; 1 sees {1,0}->0; 2 sees
    # {1,0,2}->0; 3 sees {0,3,3}->3; 4 sees {2,3}->2; 5 sees {2,3}->2
    want = {0: 0, 1: 0, 2: 0, 3: 3, 4: 2, 5: 2}
    got = {
        r.node: r.label
        for r in label_propagation(edges, iterations=2).collect()
    }
    assert got == want
    again = {
        r.node: r.label
        for r in label_propagation(edges, iterations=2).collect()
    }
    assert again == got

    chain = spark.createDataFrame([(0, 1)], ["src", "dst"])
    out = {
        r.node: r.label
        for r in label_propagation(chain, iterations=3).collect()
    }
    assert out == {0: 0, 1: 0}  # source keeps its label; sink adopts it


def test_label_propagation_string_node_ids_ansi(spark):
    """LPA over STRING node ids (URLs/domains — the module's stated dedup
    use case) under the session's default ANSI mode: the tie-break must
    negate the count, never the label, so string labels analyze fine and
    ties resolve deterministically to the smallest label. Same two-triangle
    topology as the integer test, mapped to url-ish ids."""
    from experimentsplan_datapipeline_spark.operators.graph import (
        label_propagation,
    )

    name = {0: "a.com", 1: "b.com", 2: "c.com", 3: "d.com", 4: "e.com", 5: "f.com"}
    und = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    edges = spark.createDataFrame(
        [(name[a], name[b]) for a, b in und]
        + [(name[b], name[a]) for a, b in und],
        ["src", "dst"],
    )
    # identical trace to the integer test: lexicographic order of the
    # url ids matches the numeric order of 0..5
    want = {
        name[n]: name[l] for n, l in {0: 0, 1: 0, 2: 0, 3: 3, 4: 2, 5: 2}.items()
    }
    got = {
        r.node: r.label
        for r in label_propagation(edges, iterations=2).collect()
    }
    assert got == want
    again = {
        r.node: r.label
        for r in label_propagation(edges, iterations=2).collect()
    }
    assert again == got


def test_decontaminate_flags_overlap(spark):
    """The 5-gram overlap rule: a train doc sharing a 5-gram with the
    eval set is flagged with the distinct-overlap count; disjoint docs
    come back with n_overlap=0 (reporting before dropping — every train
    row survives)."""
    from experimentsplan_datapipeline_spark.operators.curation import (
        decontaminate,
    )

    eval_df = spark.createDataFrame(
        [(100, "a b c d e f")], ["doc_id", "text"]
    )
    train = spark.createDataFrame(
        [
            (1, "x b c d e f g"),  # shares exactly "b c d e f"
            (2, "q r s t u v w"),  # disjoint
            (3, "a b c d e f"),    # identical: shares both eval 5-grams
        ],
        ["doc_id", "text"],
    )
    out = {
        r.doc_id: (r.n_overlap, r.contaminated)
        for r in decontaminate(train, eval_df, "text", "doc_id", n=5).collect()
    }
    assert out[1] == (1, True)   # "b c d e f" only
    assert out[2] == (0, False)
    assert out[3] == (2, True)   # "a b c d e" and "b c d e f"
    assert len(out) == 3


def _dominated(r, rows):
    return any(
        s[1] <= r[1] and s[2] >= r[2] and (s[1] < r[1] or s[2] > r[2])
        for s in rows
    )


def test_pareto_frontier_hand_case(spark):
    rows = [
        (1, 1.0, 5),   # frontier: global min x
        (2, 1.0, 3),   # same x as 1, lower y -> dominated
        (3, 2.0, 7),   # frontier
        (4, 2.5, 7),   # same y as 3 at higher x -> dominated
        (5, 3.0, 9),   # frontier
        (6, 3.0, 9),   # duplicate frontier point: BOTH kept
        (7, 4.0, 9),   # dominated by 5/6
        (8, 5.0, None),  # null y excluded
        (9, None, 99),   # null x excluded
    ]
    df = spark.createDataFrame(
        rows, "id bigint, x double, y int"
    )
    got = sorted(
        r.id for r in win.pareto_frontier_2d(df, "x", "y").collect()
    )
    assert got == [1, 3, 5, 6]


def test_pareto_frontier_matches_brute_force_across_partitionings(spark):
    import random

    rng = random.Random(11)
    rows = [
        (i, float(rng.randint(0, 40)), rng.randint(0, 40))
        for i in range(300)
    ]
    want = sorted(r[0] for r in rows if not _dominated(r, rows))
    df = spark.createDataFrame(rows, "id bigint, x double, y int")
    # 64 range partitions on 300 rows forces frontier points to straddle
    # partition boundaries, driving the offsets path, and proves the
    # result is partitioning-invariant
    for p in (1, 7, 64):
        got = sorted(
            r.id
            for r in win.pareto_frontier_2d(
                df, "x", "y", partitions=p
            ).collect()
        )
        assert got == want


def test_heavy_hitters_exact_and_partition_invariant(spark):
    # 1000 rows: 'a' 400, 'b' 250, 'c' 150, 200 singletons.
    # k=4 -> threshold n/5 = 200: heavy = {a, b} (c misses at 150).
    rows = (
        [("a",)] * 400 + [("b",)] * 250 + [("c",)] * 150
        + [(f"z{i}",) for i in range(200)]
    )
    df = spark.createDataFrame(rows, ["v"])
    for parts in (1, 5, 32):
        got = {
            (r.item, r.cnt, r.n_total)
            for r in agg.heavy_hitters(
                df.repartition(parts), "v", k=4
            ).collect()
        }
        assert got == {("a", 400, 1000), ("b", 250, 1000)}


def test_heavy_hitters_superset_guarantee_adversarial(spark):
    # k=1, one majority item among heavy noise: MG with a single counter
    # is the Boyer-Moore majority vote — the majority element must
    # survive every partitioning of an adversarial interleaving.
    rows = [("maj",) if i % 2 == 0 else (f"n{i}",) for i in range(999)]
    df = spark.createDataFrame(rows, ["v"])
    for parts in (1, 7, 32):
        got = [
            (r.item, r.cnt)
            for r in agg.heavy_hitters(
                df.repartition(parts), "v", k=1
            ).collect()
        ]
        assert got == [("maj", 500)]


def test_heavy_hitters_null_key_is_a_real_key(spark):
    """NULL is the single true heavy hitter: it must be REPORTED (item is
    null), counted exactly, and included in n_total — pandas value_counts
    silently drops NaN, so a naive pass would both omit the heavy NULL
    and keep its rows inflating the threshold for everyone else."""
    rows = [(None,)] * 400 + [(f"z{i}",) for i in range(600)]
    df = spark.createDataFrame(rows, "v string")
    for parts in (1, 7, 32):
        got = {
            (r.item, r.cnt, r.n_total)
            for r in agg.heavy_hitters(
                df.repartition(parts), "v", k=2
            ).collect()
        }
        # threshold n/(k+1) = 1000/3: only NULL (400) clears it
        assert got == {(None, 400, 1000)}


def test_heavy_hitters_null_below_threshold_not_reported(spark):
    """Nulls that do NOT clear the threshold stay out of the result but
    still count toward n_total (the documented one-key convention)."""
    rows = [(None,)] * 50 + [("a",)] * 500 + [(f"z{i}",) for i in range(450)]
    df = spark.createDataFrame(rows, "v string")
    got = {
        (r.item, r.cnt, r.n_total)
        for r in agg.heavy_hitters(df.repartition(8), "v", k=3).collect()
    }
    # threshold 1000/4 = 250: only 'a'; n_total still counts null rows
    assert got == {("a", 500, 1000)}


def test_count_min_sketch_guarantees_and_partition_invariant(spark):
    """CMS point estimates: (a) never UNDER the true count (one-sided
    error), (b) exact when a key's cells happen to be collision-free,
    (c) identical sketch regardless of partitioning (cell-wise sums are
    order-free), (d) total mass per row == stream length."""
    rows = (
        [("a",)] * 300 + [("b",)] * 150
        + [(f"z{i}",) for i in range(550)]
    )
    df = spark.createDataFrame(rows, ["v"])
    exact = {"a": 300, "b": 150}
    baseline = None
    for parts in (1, 8, 32):
        sk = agg.count_min_sketch(
            df.repartition(parts), "v", depth=4, width=32, seed=11
        )
        cells = {(r.row_i, r.bucket): r.c for r in sk.collect()}
        if baseline is None:
            baseline = cells
        assert cells == baseline, f"partitioning changed the sketch p={parts}"
        for r in range(4):
            assert sum(c for (ri, _), c in cells.items() if ri == r) == 1000
        items = spark.createDataFrame([("a",), ("b",)], ["v"])
        est = {
            r.v: r.est
            for r in agg.cms_estimate(
                sk, items, "v", depth=4, width=32, seed=11
            ).collect()
        }
        for k, cnt in exact.items():
            assert est[k] >= cnt


def test_count_min_sketch_merges_by_cell_sum(spark):
    """Sketching two disjoint slices and summing cells == sketching the
    union — the mergeability a multi-shard 100 TB build relies on."""
    a = spark.createDataFrame([("x",)] * 60 + [("y",)] * 40, ["v"])
    b = spark.createDataFrame([("x",)] * 15 + [("w",)] * 25, ["v"])
    whole = agg.count_min_sketch(a.unionAll(b), "v", depth=3, width=16)
    merged = (
        agg.count_min_sketch(a, "v", depth=3, width=16)
        .unionAll(agg.count_min_sketch(b, "v", depth=3, width=16))
        .groupBy("row_i", "bucket")
        .agg(F.sum("c").alias("c"))
    )
    got_w = {(r.row_i, r.bucket): r.c for r in whole.collect()}
    got_m = {(r.row_i, r.bucket): r.c for r in merged.collect()}
    assert got_w == got_m


def test_sample_weighted_priority_replayable_and_partition_invariant(spark):
    import hashlib

    import math

    rows = [(i, float(1 + (i * 37) % 100)) for i in range(500)]

    def prio(i, w):
        h = int(hashlib.md5(f"{i}|7".encode()).hexdigest()[:8], 16)
        return math.log((h + 0.5) / 2**32) / w

    want = [
        i for i, w in sorted(rows, key=lambda r: (-prio(*r), r[0]))[:50]
    ]
    df = spark.createDataFrame(rows, ["id", "w"])
    for parts in (1, 32):
        got = [
            r.id
            for r in smp.sample_weighted_priority(
                df.repartition(parts), "w", ["id"], k=50
            ).collect()
        ]
        assert got == want  # exact replay of the python-side draw


def test_sample_weighted_priority_extreme_weights_no_saturation(spark):
    """The log-domain key ln(u)/w must keep ranking by u at BOTH weight
    extremes. The paper's literal u^(1/w) saturates to exactly 1.0 in
    double precision once w >= ~1e12 (every row ties, the 'sample'
    degenerates to an id-order head), and underflows to 0.0 at w ~ 1e-6
    for small u. With all weights equal the correct draw at any scale is
    the top-k by u — i.e. identical id sets across w in {1e-6, 1.0, 1e12}."""
    import hashlib as _h
    import math

    ids = list(range(300))

    def u(i):
        return (
            int(_h.md5(f"{i}|7".encode()).hexdigest()[:8], 16) + 0.5
        ) / 2**32

    want = sorted(sorted(ids, key=lambda i: (-u(i), i))[:40])
    picked = {}
    for w in (1e-6, 1.0, 1e12):
        df = spark.createDataFrame([(i, w) for i in ids], ["id", "w"])
        picked[w] = sorted(
            r.id
            for r in smp.sample_weighted_priority(
                df, "w", ["id"], k=40
            ).collect()
        )
        assert picked[w] == want, f"w={w} draw diverged from the u-order"
    # sanity: the saturating pow form would have returned ids 0..39 at 1e12
    assert picked[1e12] != sorted(ids)[:40] or want == sorted(ids)[:40]


def test_sample_weighted_priority_rejects_bad_weights(spark):
    import pytest as _pytest

    df = spark.createDataFrame([(1, 0.0)], ["id", "w"])
    with _pytest.raises(Exception, match="weights must be > 0"):
        smp.sample_weighted_priority(df, "w", ["id"], k=1).collect()


def test_merge_changelog_hand_checked(spark):
    """MERGE semantics traced by hand: keep, update (latest ts wins over
    an earlier change), delete, insert, and delete-of-absent-key no-op."""
    from experimentsplan_datapipeline_spark.operators.joins import (
        merge_changelog,
    )

    snap = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], ["k", "v"]
    )
    changes = spark.createDataFrame(
        [
            (2, "b1", "upsert", 1),
            (2, None, "delete", 2),   # latest for key 2: delete
            (3, "c1", "upsert", 1),
            (3, "c2", "upsert", 2),   # latest for key 3: c2
            (4, "d", "upsert", 1),    # insert
            (5, None, "delete", 1),   # delete of absent key: no-op
        ],
        ["k", "v", "op", "ts"],
    )
    got = sorted(
        (r.k, r.v)
        for r in merge_changelog(snap, changes, ["k"], "ts").collect()
    )
    assert got == [(1, "a"), (3, "c2"), (4, "d")]


def test_interval_overlap_join_hand_checked(spark):
    """Overlap pairs traced by hand, each emitted EXACTLY once even when
    the overlap spans many grid cells; touching endpoints count; disjoint
    intervals and cross-key pairs never appear."""
    from experimentsplan_datapipeline_spark.operators.joins import (
        interval_overlap_join,
    )

    rows = [
        ("u", 1, 0, 250),     # overlaps 2 (multi-cell with cell=100)
        ("u", 2, 100, 400),   # overlaps 1, 3(touching), 4
        ("u", 3, 400, 500),   # touches 2 at 400
        ("u", 4, 390, 395),   # inside 2
        ("u", 5, 600, 700),   # disjoint
        ("v", 6, 0, 1000),    # other key: no cross-key pairs
    ]
    df = spark.createDataFrame(rows, ["k", "iid", "s", "e"])
    out = interval_overlap_join(df, ["k"], "iid", "s", "e", cell=100).collect()
    got = sorted((r.k, r.id_a, r.id_b, r.overlap_len) for r in out)
    assert got == [
        ("u", 1, 2, 150),
        ("u", 2, 3, 0),    # touching endpoint counts, zero-length overlap
        ("u", 2, 4, 5),
    ]
    assert len(out) == len(set((r.k, r.id_a, r.id_b) for r in out))  # meet-once


def test_scd2_history_hand_checked(spark):
    """SCD-2 intervals traced by hand over the merge_changelog fixture:
    unchanged keys keep one open version; an update closes the snapshot
    version; a delete closes the prior interval and emits nothing;
    inserts open at their change ts; a delete of an absent key leaves no
    row at all."""
    from experimentsplan_datapipeline_spark.operators.joins import (
        scd2_history,
    )

    snap = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], ["k", "v"])
    changes = spark.createDataFrame(
        [
            (2, "b1", "upsert", 1),
            (2, None, "delete", 2),
            (3, "c1", "upsert", 1),
            (3, "c2", "upsert", 2),
            (4, "d", "upsert", 1),
            (5, None, "delete", 1),
        ],
        ["k", "v", "op", "ts"],
    )
    got = sorted(
        (r.k, r.v, r.valid_from, r.valid_to, r.is_current)
        for r in scd2_history(snap, changes, ["k"], "ts").collect()
    )
    assert got == [
        (1, "a", 0, None, True),
        (2, "b", 0, 1, False),
        (2, "b1", 1, 2, False),   # closed by the delete, no delete row
        (3, "c", 0, 1, False),
        (3, "c1", 1, 2, False),
        (3, "c2", 2, None, True),
        (4, "d", 1, None, True),
    ]


def test_merge_changelog_equal_ts_deterministic_and_validates(spark):
    """Equal-ts duplicate events resolve by the payload-struct tiebreak —
    identical output under any partitioning — and a changes frame missing
    a snapshot column raises up front."""
    import pytest as _pytest

    from experimentsplan_datapipeline_spark.operators.joins import (
        merge_changelog,
    )

    snap = spark.createDataFrame([(1, 10.0)], ["k", "v"])
    dup = spark.createDataFrame(
        [(1, 20.0, "upsert", 5), (1, 30.0, "upsert", 5)],
        ["k", "v", "op", "ts"],
    )
    outs = {
        tuple(sorted(
            tuple(r)
            for r in merge_changelog(
                snap, dup.repartition(p), ["k"], "ts"
            ).collect()
        ))
        for p in (1, 7, 32)
    }
    assert outs == {((1, 30.0),)}  # max payload struct wins every time
    bad = spark.createDataFrame([(1, "upsert", 1)], ["k", "op", "ts"])
    with _pytest.raises(ValueError, match="changes lack columns"):
        merge_changelog(snap, bad, ["k"], "ts")


def test_scd2_null_op_raises(spark):
    """Same fail-loud convention as merge_changelog: a NULL-op change
    event must raise, not silently drop the version row."""
    import pytest as _pytest

    from experimentsplan_datapipeline_spark.operators.joins import (
        scd2_history,
    )

    snap = spark.createDataFrame([(1, 10.0)], ["k", "v"])
    bad = spark.createDataFrame(
        [(1, 99.0, None, 5)], "k long, v double, op string, ts long"
    )
    with _pytest.raises(Exception, match="NULL op"):
        scd2_history(snap, bad, ["k"], "ts").collect()


def test_merge_changelog_null_op_raises(spark):
    """A latest change with a NULL op must FAIL LOUDLY, not act as a
    silent delete via three-valued `op != delete` (ADVICE r8); a NULL-op
    event superseded by a later valid one is harmless."""
    import pytest as _pytest

    from pyspark.sql.utils import AnalysisException

    from experimentsplan_datapipeline_spark.operators.joins import (
        merge_changelog,
    )

    snap = spark.createDataFrame([(1, 10.0), (2, 20.0)], ["k", "v"])
    schema = "k long, v double, op string, ts long"
    bad = spark.createDataFrame([(1, 99.0, None, 5)], schema)
    with _pytest.raises(Exception, match="NULL op") as ei:
        merge_changelog(snap, bad, ["k"], "ts").collect()
    assert not isinstance(ei.value, AnalysisException)
    # superseded NULL op: the ts=6 upsert wins the max_by, no raise
    fixed = spark.createDataFrame(
        [(1, 99.0, None, 5), (1, 42.0, "upsert", 6)], schema
    )
    out = {tuple(r) for r in merge_changelog(snap, fixed, ["k"], "ts").collect()}
    assert out == {(1, 42.0), (2, 20.0)}


def test_sorted_neighborhood_matches_window_definition(spark):
    """The block-cell equi-join must produce EXACTLY the rank-window
    pairs — including across block boundaries — for random data at
    several window widths; each pair exactly once."""
    import random

    from experimentsplan_datapipeline_spark.operators.dedup import (
        sorted_neighborhood_pairs,
    )

    rng = random.Random(11)
    rows = [(i, f"{rng.randint(0, 999):03d}x{i}") for i in range(120)]
    df = spark.createDataFrame(rows, ["rid", "name"])
    order = sorted(rows, key=lambda r: (r[1], r[0]))
    for w in (1, 3, 5):
        want = sorted(
            (min(order[i][0], order[j][0]),
             max(order[i][0], order[j][0]), j - i)
            for i in range(len(order))
            for j in range(i + 1, min(i + w + 1, len(order)))
        )
        got = sorted(
            tuple(r)
            for r in sorted_neighborhood_pairs(
                df, ["name"], "rid", w=w
            ).collect()
        )
        assert got == want, f"w={w}"


def test_random_walks_deterministic_path_and_sink_dropout(spark):
    """Walks follow the md5-min choice exactly (replayed here in
    Python), are invariant to edge partitioning, and a walker reaching
    a node with no out-edges drops out of later steps."""
    import hashlib

    from experimentsplan_datapipeline_spark.operators.graph import (
        random_walks,
    )

    edges = [
        ("a", "b"), ("a", "c"),
        ("b", "d"), ("b", "e"),
        ("c", "a"),
        # d, e are sinks
    ]
    e = spark.createDataFrame(edges, ["src", "dst"])
    seeds = spark.createDataFrame([("a",), ("d",)], ["node"])

    def choice(cur, nbrs, step):
        return min(
            nbrs,
            key=lambda n: (
                hashlib.md5(f"{cur}|{n}|{step}|7".encode()).hexdigest(),
                n,
            ),
        )

    adj = {}
    for s, d in edges:
        adj.setdefault(s, []).append(d)
    want = {("a", 0, "a"), ("d", 0, "d")}
    cur = "a"
    for step in (1, 2, 3):
        if cur not in adj:
            break
        cur = choice(cur, adj[cur], step)
        want.add(("a", step, cur))
    for parts in (1, 4):
        got = {
            (r.walk_id, r.step, r.node)
            for r in random_walks(
                e.repartition(parts), seeds, n_steps=3, seed=7
            ).collect()
        }
        assert got == want, f"parts={parts}"


def test_random_walks_multi_walk_and_size_guarded_frontier(spark):
    """walks_per_seed fans each seed into gamma walks: walk 0 replays
    the single-walk path bit-for-bit (salt = seed + 0), walk ids are
    node#w, and results are identical whether the frontier broadcasts
    or hash-joins (broadcast_threshold=0 forces the non-broadcast path
    — the draw is hash-determined, plan-independent)."""
    from experimentsplan_datapipeline_spark.operators.graph import (
        random_walks,
    )

    edges = [
        ("a", "b"), ("a", "c"),
        ("b", "d"), ("b", "e"),
        ("c", "a"), ("d", "a"), ("e", "a"),
    ]
    e = spark.createDataFrame(edges, ["src", "dst"])
    seeds = spark.createDataFrame([("a",)], ["node"])
    single = {
        (r.step, r.node)
        for r in random_walks(e, seeds, n_steps=3, seed=7).collect()
    }
    multi = random_walks(
        e, seeds, n_steps=3, seed=7, walks_per_seed=3
    ).collect()
    ids = {r.walk_id for r in multi}
    assert ids == {"a#0", "a#1", "a#2"}
    walk0 = {(r.step, r.node) for r in multi if r.walk_id == "a#0"}
    assert walk0 == single
    # every walk visits 4 steps (graph has no sinks)
    for wid in ids:
        assert len([r for r in multi if r.walk_id == wid]) == 4
    # non-broadcast path: identical output
    guarded = {
        (r.walk_id, r.step, r.node)
        for r in random_walks(
            e, seeds, n_steps=3, seed=7, walks_per_seed=3,
            broadcast_threshold=0,
        ).collect()
    }
    assert guarded == {(r.walk_id, r.step, r.node) for r in multi}


def test_random_walks_hashed_ids_edge_cases(spark):
    """The r13 long walk-key encoding must be invisible at the API edge:
    node ids containing '#' keep unambiguous string walk ids (the LAST
    '#'-segment is the walk index), and duplicate seed rows (which make
    the hashed keys non-distinct and trip the collision guard's string
    fallback) produce the same output set as unique seeds."""
    from experimentsplan_datapipeline_spark.operators.graph import (
        random_walks,
    )

    e = spark.createDataFrame(
        [("x#1", "y"), ("y", "x#1")], ["src", "dst"]
    )
    seeds = spark.createDataFrame([("x#1",)], ["node"])
    got = random_walks(
        e, seeds, n_steps=2, seed=7, walks_per_seed=2
    ).collect()
    assert {r.walk_id for r in got} == {"x#1#0", "x#1#1"}
    assert all(len([r for r in got if r.walk_id == w]) == 3
               for w in ("x#1#0", "x#1#1"))
    dup_seeds = spark.createDataFrame([("x#1",), ("x#1",)], ["node"])
    # sorted LISTS, not sets (ADVICE r13): the fallback path used to
    # multiply row MULTIPLICITY through the mapping join while leaving
    # the row set unchanged — a set compare masked it
    got_dup = sorted(
        (r.walk_id, r.step, r.node)
        for r in random_walks(
            e, dup_seeds, n_steps=2, seed=7, walks_per_seed=2
        ).collect()
    )
    assert got_dup == sorted((r.walk_id, r.step, r.node) for r in got)


def test_random_walks_degree_cap(spark):
    """The hub-fanout bound (VERDICT r13 item 5): degree_cap >= max
    out-degree reproduces the exact walk list-for-list; degree_cap=1
    forces each step onto the node's single hash-min edge (replayed
    here in pure Python md5); the capped edge sample itself keeps
    exactly min(deg, m) edges per (src, step) and differs between
    steps (the per-step re-roll that keeps every neighbor reachable);
    and on a src-partitioned edge frame the cap window adds NO extra
    exchange. degree_cap=0 raises."""
    import hashlib

    import pytest as _pytest

    from experimentsplan_datapipeline_spark.operators.graph import (
        _capped_edges,
        random_walks,
    )

    # hub 'a' with 5 out-neighbors; every neighbor points back to 'a'
    edges = [("a", f"n{i}") for i in range(5)] + [
        (f"n{i}", "a") for i in range(5)
    ]
    e = spark.createDataFrame(edges, ["src", "dst"])
    seeds = spark.createDataFrame([("a",)], ["node"])

    exact = sorted(
        (r.walk_id, r.step, r.node)
        for r in random_walks(e, seeds, n_steps=3, seed=7).collect()
    )
    wide = sorted(
        (r.walk_id, r.step, r.node)
        for r in random_walks(
            e, seeds, n_steps=3, seed=7, degree_cap=5
        ).collect()
    )
    assert wide == exact

    def g(src, dst, s):
        return hashlib.md5(f"{src}|{dst}|{s}|cap|7".encode()).hexdigest()

    got1 = {
        r.step: r.node
        for r in random_walks(
            e, seeds, n_steps=2, seed=7, degree_cap=1
        ).collect()
    }
    node = "a"
    for s in (1, 2):
        # cap=1 keeps only the (g, dst)-min edge; the draw over a
        # 1-edge candidate set IS that edge
        forced = min(
            (d for srcv, d in edges if srcv == node),
            key=lambda d: (g(node, d, s), d),
        )
        assert got1[s] == forced, (s, got1, forced)
        node = forced

    # exact Python replay of the per-(src, step) hash-top-m sample —
    # covers both the "hub capped to m / deg<=m untouched" shape and
    # the step-salted hash (the sample is a function of the step)
    for s in (1, 2):
        got = {
            (r.src, r.dst) for r in _capped_edges(e, s, 7, 2).collect()
        }
        expect = set()
        for src in {"a", *[f"n{i}" for i in range(5)]}:
            outs = [d for sv, d in edges if sv == src]
            keep = sorted(outs, key=lambda d: (g(src, d, s), d))[:2]
            expect |= {(src, d) for d in keep}
        assert got == expect, s

    ep = e.repartition("src")
    plan = (
        _capped_edges(ep, 1, 7, 2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1, plan  # only the repartition

    with _pytest.raises(ValueError, match="degree_cap"):
        random_walks(e, seeds, n_steps=1, seed=7, degree_cap=0)


def test_walk_step_plan_no_broadcast_when_guarded(spark):
    """The frontier expansion join must NOT plan a broadcast when the
    caller's size guard says the frontier is too big (VERDICT r11 item
    2: a walks-per-node frontier broadcast OOMs executors), and must
    broadcast when it fits."""
    from experimentsplan_datapipeline_spark.operators.graph import (
        _walk_step,
    )

    e = spark.createDataFrame([("a", "b"), ("b", "a")], ["src", "dst"])
    cur = spark.createDataFrame(
        [("a", 0, "a")], ["walk_id", "__w", "node"]
    )
    plan_nb = (
        _walk_step(cur, e, 1, 7, "walk_id", use_broadcast=False)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastExchange" not in plan_nb, plan_nb
    plan_b = (
        _walk_step(cur, e, 1, 7, "walk_id", use_broadcast=True)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastExchange" in plan_b, plan_b


def test_expr_cache_survives_session_restart():
    """VERDICT r14 item 8: the cached Column trees (minhash aggs, token
    splits, ngrams) wrap py4j references into the ACTIVE context's JVM
    state — a session stop/restart must miss the cache and rebuild, not
    hand the new session a stale handle. Runs in a subprocess so the
    suite's session fixture is untouched."""
    import subprocess
    import sys

    code = """
from experimentsplan_datapipeline_spark.session import get_session
from experimentsplan_datapipeline_spark.operators.dedup import minhash_signatures
from experimentsplan_datapipeline_spark.operators.util import expr_cache

calls = []

@expr_cache(maxsize=4)
def probe(x):
    calls.append(x)
    import pyspark.sql.functions as F
    return F.lit(x)

s1 = get_session(app_name="restart_rt")
s1.sparkContext.setLogLevel("ERROR")
df1 = s1.createDataFrame([(1, "a b c a b c")], ["id", "text"])
r1 = minhash_signatures(df1, "text", "id", num_hashes=8).collect()
probe(7); probe(7)
assert calls == [7], calls
s1.stop()
s2 = get_session(app_name="restart_rt2")
s2.sparkContext.setLogLevel("ERROR")
df2 = s2.createDataFrame([(1, "a b c a b c")], ["id", "text"])
r2 = minhash_signatures(df2, "text", "id", num_hashes=8).collect()
assert r1 == r2
probe(7)
assert calls == [7, 7], calls  # new context -> cache miss -> rebuilt
print("RESTART_OK")
"""
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=300,
    )
    assert "RESTART_OK" in out.stdout, (out.stdout, out.stderr[-2000:])
