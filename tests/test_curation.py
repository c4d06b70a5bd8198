"""Unit tests for operators/curation.py (leakage-free splits, mixture
repeat, length buckets, skew diagnostics, profiling)."""

from __future__ import annotations

from pyspark.sql import functions as F

from experimentsplan_datapipeline_spark.operators import curation as cur


def _events(spark, sf_dir):
    from experimentsplan_datapipeline_spark.plans.queries import t

    return t(spark, sf_dir, "events")


def _docs(spark, sf_dir):
    from experimentsplan_datapipeline_spark.plans.queries import t

    return t(spark, sf_dir, "documents")


class TestTrainHoldoutSplit:
    def test_groups_never_straddle_splits(self, spark, sf_dir):
        ev = _events(spark, sf_dir)
        out = cur.train_holdout_split(
            ev, ["user_id"], {"train": 0.8, "val": 0.1, "test": 0.1}
        )
        straddlers = (
            out.groupBy("user_id")
            .agg(F.count_distinct("split").alias("n"))
            .filter(F.col("n") > 1)
            .count()
        )
        assert straddlers == 0

    def test_deterministic_and_total(self, spark, sf_dir):
        ev = _events(spark, sf_dir)
        a = cur.train_holdout_split(ev, ["user_id"], {"train": 0.8, "test": 0.2})
        b = cur.train_holdout_split(ev, ["user_id"], {"train": 0.8, "test": 0.2})
        assert a.count() == ev.count()
        assert a.exceptAll(b).count() == 0
        assert set(
            r["split"] for r in a.select("split").distinct().collect()
        ) <= {"train", "test"}

    def test_seed_changes_assignment(self, spark, sf_dir):
        ev = _events(spark, sf_dir).select("user_id").distinct()
        a = cur.train_holdout_split(ev, ["user_id"], {"train": 0.5, "test": 0.5},
                                    seed=1)
        b = cur.train_holdout_split(ev, ["user_id"], {"train": 0.5, "test": 0.5},
                                    seed=2)
        diff = (
            a.join(b.withColumnRenamed("split", "split_b"), "user_id")
            .filter(F.col("split") != F.col("split_b"))
            .count()
        )
        assert diff > 0


class TestMixtureRepeat:
    def test_integer_repeats_exact(self, spark, sf_dir):
        docs = _docs(spark, sf_dir).select("doc_id", "source")
        out = cur.mixture_repeat(docs, "source", {"src0": 2.0}, ["doc_id"])
        n0 = docs.filter(F.col("source") == "src0").count()
        rest = docs.filter(F.col("source") != "src0").count()
        assert out.count() == 2 * n0 + rest

    def test_zero_repeat_drops_source(self, spark, sf_dir):
        docs = _docs(spark, sf_dir).select("doc_id", "source")
        out = cur.mixture_repeat(docs, "source", {"src0": 0.0}, ["doc_id"])
        assert out.filter(F.col("source") == "src0").count() == 0

    def test_fractional_repeat_bounded(self, spark, sf_dir):
        docs = _docs(spark, sf_dir).select("doc_id", "source")
        out = cur.mixture_repeat(docs, "source", {"src0": 1.5}, ["doc_id"])
        n0 = docs.filter(F.col("source") == "src0").count()
        got = out.filter(F.col("source") == "src0").count()
        # every row once, about half twice — exact value is hash-determined
        assert n0 <= got <= 2 * n0

    def test_copy_ordinal_present(self, spark, sf_dir):
        docs = _docs(spark, sf_dir).select("doc_id", "source")
        out = cur.mixture_repeat(docs, "source", {"src0": 3.0}, ["doc_id"])
        mx = out.filter(F.col("source") == "src0").agg(F.max("copy")).first()[0]
        assert mx == 3


class TestLengthBuckets:
    def test_buckets_partition_corpus(self, spark, sf_dir):
        from experimentsplan_datapipeline_spark.functions.text import token_count

        docs = _docs(spark, sf_dir)
        out = cur.length_buckets(docs, "doc_id", token_count("text"), 4).collect()
        assert len(out) == 4
        assert sum(r["n_docs"] for r in out) == docs.count()
        by_bucket = sorted(out, key=lambda r: r["bucket"])
        # equal-frequency: bucket boundaries are non-decreasing in length
        for lo, hi in zip(by_bucket, by_bucket[1:]):
            assert lo["max_tokens"] <= hi["min_tokens"]


class TestHeavyKeys:
    def test_topk_shares(self, spark, sf_dir):
        ev = _events(spark, sf_dir).select("user_id")
        out = cur.heavy_keys(ev, "user_id", top_k=5).collect()
        assert len(out) == 5
        ranks = sorted(r["rank"] for r in out)
        assert ranks == [1, 2, 3, 4, 5]
        cnts = [r["cnt"] for r in sorted(out, key=lambda r: r["rank"])]
        assert cnts == sorted(cnts, reverse=True)
        assert all(0 < r["share"] < 1 for r in out)


class TestProfileColumns:
    def test_profile_shape(self, spark, sf_dir):
        from experimentsplan_datapipeline_spark.plans.queries import t

        orders = t(spark, sf_dir, "orders")
        out = cur.profile_columns(
            orders, numeric_cols=["o_totalprice"], string_cols=["o_orderstatus"]
        ).collect()
        assert {r["col_name"] for r in out} == {"o_totalprice", "o_orderstatus"}
        for r in out:
            assert r["n_rows"] == orders.count()
            assert r["n_nulls"] == 0
            assert r["n_distinct"] > 0
            assert r["min_value"] <= r["max_value"]


def test_length_buckets_matches_plain_ntile(spark):
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from experimentsplan_datapipeline_spark.operators.curation import length_buckets

    # 203 rows % 8 buckets != 0 exercises the remainder rule; 32 partitions
    # exercises the distributed rank path
    rows = [(i, ((i * 31) % 57) + 1) for i in range(203)]
    df = spark.createDataFrame(rows, ["id", "n"]).repartition(32)
    got = {
        r.bucket: (r.n_docs, r.min_tokens, r.max_tokens)
        for r in length_buckets(df, "id", F.col("n"), n_buckets=8).collect()
    }
    w = Window.orderBy("n_tokens", "id")
    want_rows = (
        df.select("id", F.col("n").alias("n_tokens"))
        .withColumn("bucket", F.ntile(8).over(w))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_tokens").alias("mn"),
            F.max("n_tokens").alias("mx"),
        )
        .collect()
    )
    want = {r.bucket: (r.n_docs, r.mn, r.mx) for r in want_rows}
    assert got == want


def test_ordered_rank_is_sorted_permutation(spark):
    from experimentsplan_datapipeline_spark.operators.sampling import ordered_rank

    rows = [(i, (i * 17) % 23) for i in range(150)]
    df = spark.createDataFrame(rows, ["id", "v"]).repartition(32)
    out = ordered_rank(df, ["v", "id"], rank_col="rk").collect()
    assert sorted(r.rk for r in out) == list(range(1, 151))
    by_rank = sorted(out, key=lambda r: r.rk)
    assert [(r.v, r.id) for r in by_rank] == sorted((v, i) for i, v in rows)


def test_pack_chunks_hand_checked_single_shard(spark):
    """One shard, ctx=8, hand-traced stream: docs concatenate in id order
    and split at every 8-token boundary, spanning docs carrying the right
    (doc_off, bin_off, seg_len) on both sides of the cut."""
    rows = [(1, 5), (2, 3), (3, 4), (4, 9), (5, 2)]
    df = spark.createDataFrame(rows, ["doc_id", "n_tok"])
    got = sorted(
        tuple(r)[1:]  # drop shard (single shard)
        for r in cur.pack_chunks(
            df, "doc_id", "n_tok", ctx=8, n_shards=1
        ).collect()
    )
    # stream offsets: d1 [0,5) d2 [5,8) d3 [8,12) d4 [12,21) d5 [21,23)
    want = sorted([
        (0, 1, 0, 0, 5),
        (0, 2, 0, 5, 3),
        (1, 3, 0, 0, 4),
        (1, 4, 0, 4, 4),   # d4 head fills bin 1
        (2, 4, 4, 0, 5),   # d4 tail opens bin 2
        (2, 5, 0, 5, 2),
    ])
    assert got == want


def test_pack_chunks_properties(spark):
    """Packing invariants over hash shards: token conservation per doc,
    every non-final bin of every shard exactly full with contiguous
    offsets, partition invariance, zero-length docs dropped, negative
    lengths raise."""
    import collections

    import pytest as _pytest

    rows = [(i, (i * 13) % 50) for i in range(200)]  # some zeros
    df = spark.createDataFrame(rows, ["doc_id", "n_tok"])
    ctx, shards = 64, 4
    segs = [
        tuple(r)
        for r in cur.pack_chunks(
            df, "doc_id", "n_tok", ctx=ctx, n_shards=shards
        ).collect()
    ]
    # conservation: per-doc seg_len sums to its length; zero-len absent
    per_doc = collections.Counter()
    for shard, bin_id, doc_id, doc_off, bin_off, seg_len in segs:
        per_doc[doc_id] += seg_len
        assert 0 < seg_len <= ctx and 0 <= bin_off < ctx
    assert per_doc == {i: n for i, n in rows if n > 0}
    # bins: contiguous fill, all but each shard's last exactly full
    fill = collections.Counter()
    for shard, bin_id, _, _, _, seg_len in segs:
        fill[(shard, bin_id)] += seg_len
    for (shard, bin_id), tot in fill.items():
        last = max(b for s, b in fill if s == shard)
        assert tot == ctx or (bin_id == last and tot <= ctx)
    # partition invariance
    again = sorted(
        tuple(r)
        for r in cur.pack_chunks(
            df.repartition(32), "doc_id", "n_tok", ctx=ctx, n_shards=shards
        ).collect()
    )
    assert again == sorted(segs)
    bad = spark.createDataFrame([(1, -2)], ["doc_id", "n_tok"])
    with _pytest.raises(Exception, match="lengths must be >= 0"):
        cur.pack_chunks(bad, "doc_id", "n_tok", ctx=8).collect()


def test_pack_next_fit_hand_checked_single_shard(spark):
    """Next-fit trace at ctx=8: 5+3 seals bin 0 exactly; 4 opens bin 1;
    6 overflows (4+6>8) so bin 2; 2 fits after it."""
    rows = [(1, 5), (2, 3), (3, 4), (4, 6), (5, 2)]
    df = spark.createDataFrame(rows, ["doc_id", "n_tok"])
    got = sorted(
        (r.doc_id, r.bin_id, r.bin_off)
        for r in cur.pack_next_fit(
            df, "doc_id", "n_tok", ctx=8, n_shards=1
        ).collect()
    )
    assert got == [(1, 0, 0), (2, 0, 5), (3, 1, 0), (4, 2, 0), (5, 2, 6)]


def test_pack_next_fit_properties(spark):
    """Whole-doc packing invariants: every doc appears exactly once and
    intact, per-bin fill <= ctx, a bin break happens ONLY when the next
    doc would overflow (greedy next-fit), partition invariance, and
    oversize/negative lengths raise."""
    import collections

    import pytest as _pytest

    rows = [(i, 1 + (i * 13) % 60) for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "n_tok"])
    ctx, shards = 64, 4
    out = sorted(
        tuple(r)
        for r in cur.pack_next_fit(
            df, "doc_id", "n_tok", ctx=ctx, n_shards=shards
        ).collect()
    )
    assert sorted((d, n) for _, _, d, n, _ in out) == sorted(rows)
    fill = collections.Counter()
    by_shard = collections.defaultdict(list)
    for shard, bin_id, doc_id, n_tok, bin_off in out:
        fill[(shard, bin_id)] += n_tok
        by_shard[shard].append((doc_id, bin_id, n_tok, bin_off))
    assert all(v <= ctx for v in fill.values())
    for shard, docs in by_shard.items():
        docs.sort()  # id order == fold order
        b = off = 0
        for doc_id, bin_id, n_tok, bin_off in docs:
            if off + n_tok > ctx:
                b, off = b + 1, 0
            assert (bin_id, bin_off) == (b, off), (shard, doc_id)
            off += n_tok
    again = sorted(
        tuple(r)
        for r in cur.pack_next_fit(
            df.repartition(32), "doc_id", "n_tok", ctx=ctx, n_shards=shards
        ).collect()
    )
    assert again == out
    bad = spark.createDataFrame([(1, 100)], ["doc_id", "n_tok"])
    with _pytest.raises(Exception, match="lengths must be in"):
        cur.pack_next_fit(bad, "doc_id", "n_tok", ctx=64).collect()


def test_grouped_running_total_matches_window_definition(spark):
    """The range-partition + broadcast-offset prefix sum must equal the
    naive per-group window cumsum for every group — including groups
    spanning many range partitions (few groups, many partitions forces
    boundary crossings)."""
    import collections

    from experimentsplan_datapipeline_spark.operators.sampling import (
        grouped_running_total,
    )

    rows = [(i, f"g{i % 3}", 1 + (i * 7) % 10) for i in range(300)]
    df = spark.createDataFrame(rows, ["rid", "g", "v"])
    want = {}
    acc = collections.Counter()
    for rid, g, v in sorted(rows, key=lambda r: (r[1], r[0])):
        acc[g] += v
        want[rid] = acc[g]
    for parts in (2, 8, 32):
        got = {
            r.rid: r.cum
            for r in grouped_running_total(
                df.repartition(5), ["g"], ["rid"], "v", partitions=parts
            ).collect()
        }
        assert got == want, f"partitions={parts}"


def test_mixture_token_budget_hard_cap_and_overrides(spark):
    """Per-source kept token sums never exceed the budget, the FIRST
    excluded doc in hash order would have pushed past it (no
    under-filling), the src-level override applies, and the kept set is
    partition-invariant."""
    import hashlib

    rows = [
        (i, f"s{i % 3}", 10 + (i * 11) % 40) for i in range(120)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source", "n_tok"])
    budget, over = 300, {"s0": 100}
    kept = [
        tuple(r)
        for r in cur.mixture_token_budget(
            df, "source", "n_tok", ["doc_id"], budget, overrides=over
        ).collect()
    ]

    def h(i):
        return int(hashlib.md5(f"{i}|7".encode()).hexdigest()[:8], 16)

    by_src = {}
    for doc_id, src, n in rows:
        by_src.setdefault(src, []).append((h(doc_id), doc_id, n))
    want = []
    for src, docs in by_src.items():
        cap = over.get(src, budget)
        cum = 0
        for _, doc_id, n in sorted(docs):
            if cum + n > cap:
                break  # hash order: everything after is excluded too
            cum += n
            want.append((doc_id, src, n, cum))
    assert sorted(kept) == sorted(want)
    again = [
        tuple(r)
        for r in cur.mixture_token_budget(
            df.repartition(17), "source", "n_tok", ["doc_id"],
            budget, overrides=over,
        ).collect()
    ]
    assert sorted(again) == sorted(kept)
