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


def test_mixture_temperature_quotas_and_order(spark):
    """alpha=1 reproduces natural mass proportions, alpha=0 splits the
    total uniformly, quotas cap at the source row count, and the drawn
    rows are exactly the per-source hash-order prefix (partition-
    invariant)."""
    import hashlib

    # masses: s0 tiny (16 rows x 1), s1 heavy (16 x 99), s2 mid (4 x 25)
    rows = (
        [(i, "s0", 1) for i in range(16)]
        + [(100 + i, "s1", 99) for i in range(16)]
        + [(200 + i, "s2", 25) for i in range(4)]
    )
    df = spark.createDataFrame(rows, ["doc_id", "source", "mass"])

    def got(alpha, total, data=df):
        return {
            tuple(r)
            for r in cur.mixture_temperature(
                data, "source", "mass", ["doc_id"], total=total, alpha=alpha
            ).collect()
        }

    # alpha=0: every weight is 1 -> uniform thirds, capped at n_s
    uni = got(0.0, 30)
    quotas = {}
    for _, src, _m, _rk, q in uni:
        quotas[src] = q
    assert quotas == {"s0": 10, "s1": 10, "s2": 4}
    # alpha=1: natural proportions of mass (16, 1584, 100 -> sum 1700)
    nat = got(1.0, 170)
    qn = {src: q for _, src, _m, _rk, q in nat}
    assert qn == {"s0": 1, "s1": 16, "s2": 4}  # floor(170*m/1700), s2 capped at n=4
    # the draw is the hash-order prefix per source
    def order_key(i):
        return (hashlib.md5(f"{i}|7".encode()).hexdigest(), i)

    by_src = {}
    for i, src, _ in rows:
        by_src.setdefault(src, []).append(i)
    for src, ids in by_src.items():
        want = set(sorted(ids, key=order_key)[: quotas[src]])
        assert {d for d, s, *_ in uni if s == src} == want
    # partition-invariance
    assert got(0.0, 30, df.repartition(13)) == uni


def test_grouped_rank_ntile_formula_matches_window(spark):
    """The scale-shaped tertile (grouped_running_total rank + broadcast
    counts + floor((rk-1)*k/n)+1) assigns every row the same bucket as a
    plain ntile(k) window, including uneven group sizes."""
    from pyspark.sql import Window
    from experimentsplan_datapipeline_spark.operators.sampling import (
        grouped_running_total,
    )

    rows = []
    for g, size in (("a", 7), ("b", 5), ("c", 3), ("d", 1)):
        rows += [(g, i, ((i * 37) % 11) + (0.5 if g == "b" else 0.0))
                 for i in range(size)]
    df = spark.createDataFrame(rows, ["g", "rid", "v"])
    base = df.withColumn("__one", F.lit(1))
    ranked = grouped_running_total(
        base, ["g"], ["v", "rid"], "__one", out_col="rk"
    )
    counts = base.groupBy("g").agg(F.count(F.lit(1)).alias("__n"))
    mine = {
        (r.g, r.rid): r.bucket
        for r in ranked.join(F.broadcast(counts), "g")
        .select(
            "g", "rid",
            (F.floor((F.col("rk") - 1) * 3 / F.col("__n")) + 1)
            .cast("int").alias("bucket"),
        )
        .collect()
    }
    w = Window.partitionBy("g").orderBy("v", "rid")
    want = {
        (r.g, r.rid): r.bucket
        for r in df.withColumn("bucket", F.ntile(3).over(w)).collect()
    }
    assert mine == want


def test_c4_line_rules_hand_checked(spark):
    """Each C4 rule fires exactly as specified: short lines and
    unterminated lines drop; pages fail on <3 kept lines, lorem ipsum,
    or braces; clean_text is the kept lines re-joined."""
    from experimentsplan_datapipeline_spark.operators.text_analysis import (
        c4_line_rules,
    )

    l1 = "this line has exactly six words."
    l2 = "five words ending in question?"
    l3 = 'a quoted sentence of five words"'
    short = "too short."
    unterm = "this one has no terminal punctuation at all"
    docs = spark.createDataFrame(
        [
            (1, "\n".join([l1, l2, l3, short, unterm])),   # 3 kept -> keep
            (2, "\n".join([l1, l2, short])),               # 2 kept -> drop
            (3, "\n".join([l1, l2, l3, "lorem IPSUM dolor sit amet."])),
            (4, "\n".join([l1, l2, l3, "int f() { return 0; }."])),
        ],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r for r in c4_line_rules(docs, "doc_id", "text").collect()}
    assert (got[1].n_lines, got[1].n_kept, got[1].keep) == (5, 3, True)
    assert got[1].clean_text == "\n".join([l1, l2, l3])
    assert (got[2].n_kept, got[2].keep) == (2, False)
    assert got[3].has_lorem and not got[3].keep and got[3].n_kept == 4
    assert got[4].has_brace and not got[4].keep


def test_scaler_fit_transform_is_leakage_free(spark):
    """Stats come from the train rows ONLY: perturbing a test row's value
    changes its own z-score but nobody else's; a zero-variance feature
    standardizes to 0; train z-scores mean to ~0."""
    rows = [(i, "train" if i < 8 else "test", float(i), 5.0) for i in range(12)]
    df = spark.createDataFrame(rows, ["rid", "split", "x", "const"])
    out = {
        r.rid: (r.z_x, r.z_const)
        for r in cur.scaler_fit_transform(
            df, F.col("split") == "train", ["x", "const"]
        ).collect()
    }
    assert all(z == 0.0 for _, z in out.values())  # zero-variance feature
    # train mean of x = 3.5, sd_pop = sqrt(5.25); z for rid=0:
    mu, sd = 3.5, 5.25 ** 0.5
    assert abs(out[0][0] - round((0 - mu) / round(sd, 6), 6)) < 2e-6
    # perturb a TEST row: every other row's z is unchanged
    rows2 = [(i, s, (99.0 if i == 11 else x), c) for i, s, x, c in rows]
    out2 = {
        r.rid: (r.z_x, r.z_const)
        for r in cur.scaler_fit_transform(
            spark.createDataFrame(rows2, ["rid", "split", "x", "const"]),
            F.col("split") == "train",
            ["x", "const"],
        ).collect()
    }
    assert all(out2[i] == out[i] for i in range(11))
    assert out2[11] != out[11]


def test_quantize_embeddings_int8_roundtrip(spark):
    """q = round(127*x/max|x|), scale*q dequantizes within scale/2 per
    coordinate; zero vectors quantize to zeros with scale 0."""
    from experimentsplan_datapipeline_spark.operators.similarity import (
        quantize_embeddings_int8,
    )

    rows = [
        (1, [1.0, -0.5, 0.25, 0.0]),
        (2, [0.0, 0.0, 0.0, 0.0]),
        (3, [-2.0, 2.0, 1.0, -1.0]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "vec"])
    got = {
        r.vec_id: (r.scale, r.qvec)
        for r in quantize_embeddings_int8(df, "vec_id", "vec").collect()
    }
    assert got[1][1] == [127, -64, 32, 0]  # round(127*-0.5)= -63.5 -> -64
    assert got[2] == (0.0, [0, 0, 0, 0])
    assert got[3][1] == [-127, 127, 64, -64]
    for vid, vec in rows:
        scale, q = got[vid]
        for x, qi in zip(vec, q):
            assert abs(qi * scale - x) <= scale / 2 + 1e-6


def test_vocab_coverage_exact(spark):
    """Top-V vocab is the count-then-word tiebreak top; coverage is the
    exact in-vocab token fraction; empty docs are absent."""
    from experimentsplan_datapipeline_spark.operators.text_analysis import (
        vocab_coverage,
    )

    docs = spark.createDataFrame(
        [
            (1, "a a a b b c"),      # a:3 b:2 c:1
            (2, "b b b c d d"),      # b:3 c:1 d:2
            (3, "x y z"),            # all tail
            (4, "   "),              # no tokens -> absent
        ],
        ["doc_id", "text"],
    )
    # corpus counts: a:3 b:5 c:2 d:2 x:1 y:1 z:1 -> top2 = {b, a}
    got = {
        r.doc_id: (r.n_tok, r.n_in_vocab, r.coverage)
        for r in vocab_coverage(docs, "doc_id", "text", vocab_size=2).collect()
    }
    assert got == {
        1: (6, 5, round(5 / 6, 6)),
        2: (6, 3, 0.5),
        3: (3, 0, 0.0),
    }


def test_batch_padding_length_order_beats_arrival_order(spark):
    """batch_padding_report invariants on random lengths: efficiency in
    (0, 1], real_tokens equals the corpus token count in every variant,
    and the length-ordered form's OVERALL efficiency is never worse than
    arrival-order batching (the naive baseline)."""
    import random

    from pyspark.sql import functions as F

    from experimentsplan_datapipeline_spark.operators.curation import (
        batch_padding_report,
    )

    rng = random.Random(17)
    rows = [(i, rng.randrange(1, 400)) for i in range(500)]
    df = spark.createDataFrame(rows, ["doc_id", "n_tok"])
    total = sum(n for _, n in rows)

    def overall(order_by_length):
        rep = batch_padding_report(
            df, "doc_id", F.col("n_tok"), n_buckets=8, batch_size=16,
            order_by_length=order_by_length,
        ).collect()
        real = sum(r["real_tokens"] for r in rep)
        padded = sum(r["padded_slots"] for r in rep)
        assert real == total
        for r in rep:
            assert 0 < r["efficiency"] <= 1
        return real / padded

    assert overall(True) >= overall(False)


def test_batch_padding_matches_hand_computation(spark):
    """4 docs, batch_size 2, one bucket: batches ((1,2),(3,9)) padded to
    (2,2),(9,9) -> real 15, padded 22."""
    from pyspark.sql import functions as F

    from experimentsplan_datapipeline_spark.operators.curation import (
        batch_padding_report,
    )

    df = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 3), (4, 9)], ["doc_id", "n_tok"]
    )
    rep = batch_padding_report(
        df, "doc_id", F.col("n_tok"), n_buckets=1, batch_size=2
    ).collect()
    assert len(rep) == 1
    r = rep[0]
    assert (r["n_batches"], r["real_tokens"], r["padded_slots"]) == (2, 15, 22)
    assert r["efficiency"] == round(15 / 22, 6)


def test_quality_classifier_learns_separable_rule(spark):
    """On a linearly separable target (long vs short docs) the trained
    classifier must clearly beat the majority baseline, its weights must
    sit exactly on the 2^-30 grid (the cross-engine exactness contract),
    and scoring with the returned weights must reproduce the final
    training accuracy."""
    import random

    from pyspark.sql import functions as F

    from experimentsplan_datapipeline_spark.operators.curation import (
        quality_classifier_score,
        quality_classifier_train,
    )

    rng = random.Random(3)
    rows = []
    for i in range(200):
        n = rng.randint(5, 30) if i % 2 else rng.randint(60, 120)
        rows.append((i, " ".join(f"w{rng.randint(0, 400)}" for _ in range(n))))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    ws = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+"), lambda w: w != ""
    )
    label = F.size(ws) >= 45  # exactly the long/short construction
    trace, w = quality_classifier_train(df, "doc_id", "text", label, n_steps=32)
    tr = {r["step"]: r for r in trace.collect()}
    accs = [tr[t]["n_correct"] for t in sorted(tr)]
    assert accs[-1] >= 190, accs  # separable: near-perfect by step 32
    assert max(accs) > 110  # beats the 50% majority baseline decisively
    for j in range(5):
        v = tr[32][f"w{j}"]
        assert v == round(v * 2**30) / 2**30  # exact 2^-30 grid

    scored = quality_classifier_score(df, "doc_id", "text", w)
    labels = {r["doc_id"]: r["y"] for r in df.select(
        "doc_id", label.cast("int").alias("y")).collect()}
    agree = sum(
        int(r["keep_quality"]) == labels[r["doc_id"]]
        for r in scored.collect()
    )
    # scoring uses the POST-update final weights; the trace's last
    # n_correct was measured under the pre-update ones — allow the one
    # step of drift but demand the same separability
    assert agree >= 190, agree


def test_mixture_reweight_upweights_outlier_and_sums_to_one(spark):
    """The MW loop raises weight on the domain whose token distribution
    sits farthest from the mixture; weights stay a distribution (sum 1
    within grid tolerance) at every step; the trajectory is invariant
    to input partitioning."""
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta", "same1") for i in range(20)]
        + [(i + 100, "alpha beta gamma delta", "same2") for i in range(20)]
        + [(i + 200, "zeta zeta zeta eta", "outlier") for i in range(20)],
        ["doc_id", "text", "source"],
    )
    base = None
    for parts in (1, 8):
        trace = {
            (r.step, r.source): (r.weight_q30, r.loss_q50)
            for r in cur.mixture_reweight_mw(
                docs.repartition(parts), "source", "text", n_steps=6
            ).collect()
        }
        if base is None:
            base = trace
        assert trace == base, f"partitioning changed the trajectory p={parts}"
    n_steps = max(s for s, _ in base)
    for s in range(1, n_steps + 1):
        tot = sum(q for (st, _), (q, _) in base.items() if st == s)
        # each of the 3 weights is floor/round-snapped to the 2^-30 grid
        assert abs(tot - (1 << 30)) <= 3
    w_final = {
        src: q for (st, src), (q, _) in base.items() if st == n_steps
    }
    assert w_final["outlier"] > w_final["same1"]
    assert w_final["outlier"] > (1 << 30) // 3
    # the two identical domains must track each other exactly
    assert w_final["same1"] == w_final["same2"]


def test_temporal_split_embargo_boundaries_and_exclusion(spark):
    """Rows inside the embargo window get neither split; boundaries are
    exact integer-microsecond arithmetic (train < cut <= embargo <
    gap_end <= test)."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    # 0..100 minutes: span 100 min; cut = 60%, gap = 5% -> embargo [60, 65)
    rows = [(i, base + dt.timedelta(minutes=i)) for i in range(101)]
    df = spark.createDataFrame(rows, ["i", "ts"])
    got = {
        r.i: r.split
        for r in cur.temporal_split_embargo(
            df, "ts", train_frac_pct=60, embargo_pct=5
        ).collect()
    }
    assert got[59] == "train" and got[0] == "train"
    assert got[60] == "embargo" and got[64] == "embargo"
    assert got[65] == "test" and got[100] == "test"
    assert sorted(set(got.values())) == ["embargo", "test", "train"]


def test_qc_train_sql_steps_match_column_form(spark):
    """r14: quality_classifier_train's per-step aggregation became one
    parsed SQL string (plus an adaptive coalesce). The SQL arithmetic
    must be BIT-identical to the original Column construction — same
    left-associated adds, repr-round-tripped literals — so the whole
    trace (gridded weights + accuracy) matches exactly, step for step."""
    import math

    from pyspark.sql import functions as F

    from experimentsplan_datapipeline_spark.operators.curation import (
        _QC_LR,
        _QC_Q,
        _QC_WQ,
        _qc_features,
        quality_classifier_train,
    )

    docs = spark.createDataFrame(
        [
            (i, ("alpha beta gamma delta epsilon zeta " * (1 + i % 3))
             + ("spam " * (7 * (i % 2))))
            for i in range(40)
        ],
        ["doc_id", "text"],
    )
    ws = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+"), lambda w: w != ""
    )
    label = 2 * F.size(F.array_distinct(ws)) > F.size(ws)
    n_steps = 7
    trace, w_out = quality_classifier_train(
        docs, "doc_id", "text", label, n_steps=n_steps
    )
    got = [tuple(r) for r in trace.orderBy("step").collect()]

    # the pre-r14 Column-built loop, verbatim
    feats = (
        _qc_features(docs, "doc_id", "text")
        .join(docs.select(F.col("doc_id"), label.cast("int").alias("y")),
              "doc_id")
        .localCheckpoint(eager=True)
    )
    n = feats.count()
    pow2 = float(1 << max(n - 1, 1).bit_length())
    w = [0.0] * 5
    want = []
    for t in range(1, n_steps + 1):
        z = sum(
            (F.col(f"x{j}") * F.lit(w[j]) for j in range(1, 5)),
            F.lit(w[0]) * F.col("x0"),
        )
        p = F.greatest(F.least(z * 0.25 + 0.5, F.lit(1.0)), F.lit(0.0))
        g = F.floor((p - F.col("y")) * _QC_Q + 0.5) / _QC_Q
        agg = feats.select(
            *[F.sum(g * F.col(f"x{j}")).alias(f"g{j}") for j in range(5)],
            F.sum(
                F.when((p >= 0.5) == (F.col("y") == 1), 1).otherwise(0)
            ).alias("n_correct"),
        ).first()
        w = [
            math.floor(
                (w[j] - _QC_LR * float(agg[f"g{j}"]) / pow2) * _QC_WQ + 0.5
            ) / _QC_WQ
            for j in range(5)
        ]
        want.append(tuple([t] + w + [int(agg["n_correct"])]))
    assert got == want
    assert list(w_out) == list(want[-1][1:6])
