"""Sampling / set operators (SURVEY.md §2.6, U1-U7).

The reference's samplers take EXACT per-stratum counts (int(total*weight))
with a with-replacement fallback when a stratum is short
(train/common/dataset.py:180-227) — Spark's sampleBy is Bernoulli-approximate,
so the exact sampler is a library function built on a rank-within-stratum
window.

Determinism contract: the reference uses unseeded ``random`` (dataset.py:
213-222) which we deliberately do NOT replicate. Two ordering modes:
- 'hash'  — rank by md5(key || salt): fully deterministic, engine-independent
            (the DuckDB oracle reproduces it bit-for-bit).
- 'rand'  — rank by rand(seed): Spark-deterministic for a fixed seed and
            partitioning, for parity with seeded-RNG expectations.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def union_all(*dfs: DataFrame) -> DataFrame:
    """U1: ConcatDataset -> unionByName
    (train/train_stage_1_2/dataloader.py:100)."""
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df)
    return out


def _rank_col(key_cols: Sequence[str], mode: str, seed: int):
    if mode == "hash":
        salted = F.concat_ws("|", *[F.col(c).cast("string") for c in key_cols],
                             F.lit(str(seed)))
        return F.md5(salted)
    if mode == "rand":
        return F.rand(seed)
    raise ValueError(f"unknown sampling mode: {mode}")


def stratified_exact(
    df: DataFrame,
    stratum_col: str,
    targets: dict[str, int],
    key_cols: Sequence[str],
    seed: int = 42,
    mode: str = "hash",
) -> DataFrame:
    """U3: exact-count stratified sample without replacement.

    rank = row_number() over (partition by stratum order by rank_key), keep
    rank <= target. Exact counts, deterministic under 'hash' mode. When a
    stratum has fewer rows than its target, all of them are kept (the
    reference falls back to with-replacement top-up: use
    ``stratified_with_replacement`` for that semantics).

    Scale shape: a single stratum-partitioned window would funnel each
    stratum into ONE task — fatal when 100 TB splits over a handful of
    difficulty values. In 'hash' mode (deterministic rank expression) the
    selection runs as two-phase top-k: per-(stratum, salt-bucket) local
    ranks prune everything that cannot reach the global top-target
    (global top-k ⊆ union of per-bucket top-k), then the exact rank runs
    on <= buckets*target survivors per stratum. Both windows parallelize
    across buckets; output is identical to the single-window form.
    'rand' mode keeps the single window (rand() is not stable across
    re-evaluation in different stages, so it cannot be ranked twice).

    The pre-phase engages adaptively: when the input has few partitions
    (small/local data), one task per stratum already fits and the extra
    shuffle is pure overhead, so the single window runs directly — the
    output is identical either way, only the physical plan differs.
    """
    rk = _rank_col(key_cols, mode, seed)
    # key_cols may not uniquely identify rows; without a unique tiebreak the
    # picked row among key-duplicates would be partition-order dependent. A
    # full-row hash pins the choice independent of physical layout (rows that
    # tie on EVERY column are interchangeable, so a residual hash collision
    # cannot change the multiset of results).
    row_tiebreak = F.xxhash64(*[F.col(c) for c in df.columns])
    order_cols = [F.col(c) for c in key_cols] + [row_tiebreak]
    target_expr = None
    for stratum, n in targets.items():
        cond = F.col(stratum_col) == stratum
        target_expr = (
            F.when(cond, n) if target_expr is None else target_expr.when(cond, n)
        )
    target_expr = target_expr.otherwise(0)
    # r15 note (measured, guide §1.1): adding a redundant literal bound
    # ``__rk <= max(targets)`` DOES make the optimizer insert a map-side
    # WindowGroupLimit(Partial) that cuts the shuffle to <= max_target
    # rows per (stratum, input partition) — but it also moves the full
    # sort to the map side, and at sf0.1 that form measured ~25% SLOWER
    # (1.42 s vs 1.76 s A/B in one session), so it was reverted; the
    # at-scale shuffle-bytes story is already covered by the two-phase
    # pre-prune below.
    if mode == "hash" and df.rdd.getNumPartitions() > 16:
        buckets = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        )
        pre = df.withColumn(
            "__bkt", F.pmod(F.xxhash64(*order_cols), F.lit(buckets))
        )
        w1 = Window.partitionBy(stratum_col, "__bkt").orderBy(rk, *order_cols)
        pre = (
            pre.withColumn("__lrk", F.row_number().over(w1))
            .filter(F.col("__lrk") <= target_expr)
            .drop("__bkt", "__lrk")
        )
    else:
        pre = df
    w = Window.partitionBy(stratum_col).orderBy(rk, *order_cols)
    return (
        pre.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= target_expr)
        .drop("__rk")
    )


def stratified_with_replacement(
    df: DataFrame,
    stratum_col: str,
    targets: dict[str, int],
    key_cols: Sequence[str],
    seed: int = 42,
) -> DataFrame:
    """U3 fallback: exact counts WITH replacement when strata run short.

    Reference: random.choices when len(stratum) < target
    (train/common/dataset.py:205-216). Implementation: deterministic
    round-robin replication — rank rows within the stratum, then each row i
    appears ceil/floor times so the stratum totals exactly ``target``.
    Deterministic (hash-ranked), and scale-shaped: the in-stratum rank is
    ``hash_rank`` (range-bucketed, no single-task window — identical md5
    ordering to the rest of the sampler family) and stratum sizes come
    from a partial-aggregated groupBy broadcast back, never a whole-
    stratum count window.
    """
    target_expr = None
    for stratum, n in targets.items():
        cond = F.col(stratum_col) == stratum
        target_expr = (
            F.when(cond, n) if target_expr is None else target_expr.when(cond, n)
        )
    target_expr = target_expr.otherwise(0)
    counts = df.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("__n"))
    ranked = (
        hash_rank(
            df, key_cols, partition_cols=[stratum_col], seed=seed, rank_col="__rk"
        )
        .join(F.broadcast(counts), stratum_col)
        .withColumn("__target", target_expr)
    )
    # row i (1-based) replicates: base = target div n, +1 for the first
    # (target mod n) ranked rows; short strata replicate, long strata truncate.
    copies = (
        F.floor(F.col("__target") / F.col("__n"))
        + F.when(
            F.col("__rk") <= F.col("__target") % F.col("__n"), F.lit(1)
        ).otherwise(F.lit(0))
    ).cast("int")
    return (
        ranked.filter(copies > 0)
        .withColumn("__copy", F.explode(F.sequence(F.lit(1), copies)))
        .drop("__rk", "__n", "__target", "__copy")
    )


def weighted_union_sample(
    dfs: dict[str, DataFrame],
    weights: dict[str, float],
    num_samples: int,
    key_cols: Sequence[str],
    seed: int = 42,
    mode: str = "hash",
    source_col: str = "source",
) -> DataFrame:
    """U4: WeightedRandomSampler over a union of datasets.

    Reference: per-dataset weights {0.3,0.7} / {0.25,0.25,0.5}, num_samples=N
    (train/train_stage_1_2/dataloader.py:102-124). Each source contributes
    floor(N*w) rows, sampled exactly within the tagged union.
    """
    tagged = None
    for name, df in dfs.items():
        t = df.withColumn(source_col, F.lit(name))
        tagged = t if tagged is None else tagged.unionByName(t)
    targets = {name: int(num_samples * weights[name]) for name in dfs}
    return stratified_exact(tagged, source_col, targets, key_cols, seed, mode)


def hash_rank(
    df: DataFrame,
    key_cols: Sequence[str],
    partition_cols: Sequence[str] = (),
    seed: int = 42,
    rank_col: str = "rk",
    buckets: int | None = None,
) -> DataFrame:
    """Distributed dense ranking by md5 hash order, no single-task window.

    Every row gets its EXACT 1-based rank (within ``partition_cols``) under
    the engine-portable md5(key||seed) order — the primitive behind
    deterministic shuffles, proportional interleaves, and epoch orderings.

    Scale shape: a plain ``row_number() over (partition by p order by h)``
    serializes each partition group into one task. Instead the hash value
    range-buckets (bucket i = hash prefix in [i*2^32/B, (i+1)*2^32/B) —
    buckets are ORDERED spans of the hash domain), local ranks run per
    bucket in parallel, and per-bucket counts (B rows per group — tiny)
    prefix-sum into offsets that broadcast back: rank = offset + local
    rank. Identical output to the single window at any scale.
    """
    pcols = [F.col(c) for c in partition_cols]
    if buckets is None:
        buckets = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    salted = F.concat_ws(
        "|", *[F.col(c).cast("string") for c in key_cols], F.lit(str(seed))
    )
    hval = F.conv(F.substring(F.md5(salted), 1, 8), 16, 10).cast("long")
    order_cols = [F.md5(salted)] + [F.col(c) for c in key_cols]
    bucketed = df.withColumn(
        "__bkt", (hval * buckets / F.lit(2**32)).cast("int")
    )
    w_local = Window.partitionBy(*pcols, "__bkt").orderBy(*order_cols)
    local = bucketed.withColumn("__lrk", F.row_number().over(w_local))
    counts = (
        local.groupBy(*pcols, "__bkt").agg(F.count(F.lit(1)).alias("__n"))
    )
    w_off = (
        Window.partitionBy(*pcols)
        .orderBy("__bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.withColumn(
        "__off", F.coalesce(F.sum("__n").over(w_off), F.lit(0))
    ).drop("__n")
    joined = local.join(
        F.broadcast(offsets), [*partition_cols, "__bkt"], "left"
    )
    return (
        joined.withColumn(rank_col, (F.col("__off") + F.col("__lrk")).cast("long"))
        .drop("__bkt", "__lrk", "__off")
    )


def mixture_interleave(
    dfs: dict[str, DataFrame],
    weights: dict[str, float],
    key_cols: Sequence[str],
    seed: int = 42,
    source_col: str = "source",
    pos_col: str = "pos",
) -> DataFrame:
    """Deterministic proportional interleave of sources (epoch ordering).

    The reference's WeightedRandomSampler doesn't just pick counts — it
    produces an ORDER in which sources appear in weight proportion
    (train/train_stage_1_2/dataloader.py:102-124). Deterministic version:
    rank rows within each source by portable hash, then position
    pos = (rank-1)/weight; sorting the union by pos yields a stream where
    every weight-w source occupies ~w of any prefix. Positions are
    computed fully in parallel (hash_rank); materializing a total order is
    the consumer's choice (sortWithinPartitions after range partitioning
    by pos at scale — never a global single-task sort).
    """
    tagged = None
    for name, df in dfs.items():
        part = df.withColumn(source_col, F.lit(name))
        tagged = part if tagged is None else tagged.unionByName(part)
    ranked = hash_rank(
        tagged, key_cols, partition_cols=[source_col], seed=seed, rank_col="__srk"
    )
    weight_expr = None
    for name, w in weights.items():
        cond = F.col(source_col) == name
        weight_expr = (
            F.when(cond, float(w))
            if weight_expr is None
            else weight_expr.when(cond, float(w))
        )
    return ranked.withColumn(
        pos_col, F.round((F.col("__srk") - 1) / weight_expr, 6)
    ).drop("__srk")


def deterministic_shuffle(
    df: DataFrame, key_cols: Sequence[str], seed: int = 42
) -> DataFrame:
    """U5: global shuffle, seeded (random.shuffle, dataset.py:222).

    Row SET is unchanged — ordering is by xxhash64(keys, seed), which is
    deterministic per seed and cheaper than a cryptographic hash (the
    oracle compares the SET, so the rank hash needs determinism, not
    engine-independence — unlike the stratified sampler, which selects by
    rank and therefore ranks on md5). At scale prefer
    ``repartition(n, rand-key)`` over a global sort when only decorrelation
    (not a total order) is needed.
    """
    return df.orderBy(F.xxhash64(*[F.col(c) for c in key_cols], F.lit(seed)))


def curriculum_stage(
    df: DataFrame,
    stratum_col: str,
    stage: str,
    stage_targets: dict[str, dict[str, int]],
    key_cols: Sequence[str],
    seed: int = 42,
) -> DataFrame:
    """U7: one stage of a curriculum schedule (easy -> medium -> hard).

    Reference: 3 sequential jobs with per-stage difficulty mixes
    (train/bash_scripts/curriculum/train_catvton.sh:12-63,
    curriculum/README.md:19-61). A stage is just an exact stratified sample
    under that stage's target mix; orchestration (resume, LR) stays driver-side.
    """
    return stratified_exact(
        df, stratum_col, stage_targets[stage], key_cols, seed=seed, mode="hash"
    )


def curriculum_plan(
    df: DataFrame,
    stratum_col: str,
    stage_targets: dict[str, dict[str, int]],
    key_cols: Sequence[str],
    seed: int = 42,
) -> DataFrame:
    """U7 complete: every curriculum stage as one tagged plan.

    Each stage draws an exact stratified sample under its own difficulty
    mix; stage seeds derive from the base seed + stage ordinal so stages
    draw independent (but fully deterministic) samples. The union is lazy —
    a scheduler can consume stage by stage (the reference's 3 sequential
    jobs, curriculum/README.md:19-61) or materialize the whole curriculum
    in one pass.
    """
    outs = []
    for i, stage in enumerate(stage_targets):
        s = curriculum_stage(
            df, stratum_col, stage, stage_targets, key_cols, seed=seed + i
        )
        outs.append(s.withColumn("stage", F.lit(stage)))
    return union_all(*outs)


def ordered_rank(
    df: DataFrame,
    order_cols: Sequence[str],
    rank_col: str = "rk",
    partitions: int | None = None,
) -> DataFrame:
    """Exact global 1-based rank in ``order_cols`` order without a
    single-task window — the value-ordered complement of ``hash_rank``.

    Range-partition on the order keys (sampled boundaries balance skewed
    value distributions), local row_number per partition, per-partition
    counts prefix-summed into broadcast offsets: rank = offset + local.
    Exact wherever the boundaries land; both consumers of the ranged data
    share one exchange (Spark's default exchange reuse). Ties across a
    boundary get arbitrary relative ranks — pass a unique tiebreak column
    last, as with any deterministic ranking.
    """
    if partitions is None:
        partitions = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        )
    cols = [F.col(c) for c in order_cols]
    ranged = (
        df.repartitionByRange(partitions, *cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("__pid", F.spark_partition_id())
    )
    w_local = Window.partitionBy("__pid").orderBy(*cols)
    local = ranged.withColumn("__lrk", F.row_number().over(w_local))
    counts = local.groupBy("__pid").agg(F.count(F.lit(1)).alias("__n"))
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "__off", F.coalesce(F.sum("__n").over(w_off), F.lit(0))
    ).select("__pid", "__off")
    return (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn(rank_col, (F.col("__off") + F.col("__lrk")).cast("long"))
        .drop("__pid", "__lrk", "__off")
    )


def grouped_running_total(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[str],
    val_col: str,
    out_col: str = "cum",
    partitions: int | None = None,
) -> DataFrame:
    """Exact per-group running total in ``order_cols`` order WITHOUT a
    one-task-per-group window — ``ordered_rank``'s scheme generalized
    from ranks to prefix sums over a grouping.

    ``Window.partitionBy(group)`` funnels each group through ONE task; a
    100 TB mixture with a handful of sources would serialize almost the
    whole corpus. Instead: range-partition on (group, order) so each
    group occupies a RUN of partitions, local cumsum per (partition,
    group), then per-(partition, group) totals prefix-summed into
    broadcast offsets — cum = offset + local. The offsets frame is
    |partitions| x |groups touching a boundary| rows; the offset window
    runs over per-partition totals (tiny), never over rows. Ties across
    a partition boundary get arbitrary relative order — append a unique
    tiebreak to ``order_cols`` as with ``ordered_rank``.
    """
    if partitions is None:
        partitions = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        )
    gcols = [F.col(c) for c in group_cols]
    ocols = [F.col(c) for c in order_cols]
    ranged = (
        df.repartitionByRange(partitions, *gcols, *ocols)
        .sortWithinPartitions(*group_cols, *order_cols)
        .withColumn("__pid", F.spark_partition_id())
    )
    w_local = (
        Window.partitionBy("__pid", *group_cols)
        .orderBy(*ocols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ranged.withColumn(
        "__lc", F.sum(F.col(val_col)).over(w_local)
    )
    totals = local.groupBy("__pid", *group_cols).agg(
        F.sum(val_col).alias("__n")
    )
    w_off = (
        Window.partitionBy(*group_cols)
        .orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.withColumn(
        "__off", F.coalesce(F.sum("__n").over(w_off), F.lit(0))
    ).select("__pid", *group_cols, "__off")
    return (
        local.join(F.broadcast(offsets), ["__pid", *group_cols])
        .withColumn(out_col, F.col("__off") + F.col("__lc"))
        .drop("__pid", "__lc", "__off")
    )


def sample_weighted_priority(
    df: DataFrame,
    weight_col: str,
    id_cols: Sequence[str],
    k: int,
    seed: int = 7,
    key_out: str | None = None,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement via Efraimidis-Spirakis
    priority keys (IPL 2006): each row gets key = ln(u)/w with u a
    per-row uniform, and the k largest keys are exactly a weighted
    sample without replacement. One pass, no per-draw sequencing — the
    sequential "draw, remove, re-normalize" definition becomes a
    stateless top-k, which is the only shape that works on 100 TB.

    The key is the LOG-DOMAIN form of the paper's u^(1/w): ln is
    monotone, so ln(u^(1/w)) = ln(u)/w ranks identically — but the pow
    form saturates in double precision at extreme weights (w >= ~1e12
    pushes u^(1/w) to exactly 1.0 for every u, collapsing the draw into
    an id-order tie-break), while ln(u)/w keeps full relative precision
    at any weight scale.

    u derives from curation.portable_hash over ``id_cols`` + seed (md5,
    engine-portable, replayable) shifted off zero: (h + 0.5) / 2^32, so
    ln(u) is finite and the draw is auditable anywhere, unlike rand().
    The top-k itself is sort(desc).limit(k), which Spark compiles to
    TakeOrderedAndProject — per-partition partial top-k then a k-row
    merge on the driver side of the exchange; no global sort
    materializes. Weights must be strictly positive; null/<=0 weights
    raise rather than silently biasing the sample.
    """
    from experimentsplan_datapipeline_spark.operators.curation import (
        portable_hash,
    )

    u = (portable_hash(list(id_cols), seed) + F.lit(0.5)) / F.lit(
        float(2**32)
    )
    w = F.col(weight_col)
    guarded = F.when(
        w.isNull() | (w <= 0),
        F.raise_error(
            "sample_weighted_priority: weights must be > 0 and non-null"
        ),
    ).otherwise(F.log(u) / w)
    out = df.withColumn(key_out or "__prio", guarded)
    ordered = out.orderBy(
        F.desc(key_out or "__prio"), *[F.col(c) for c in id_cols]
    ).limit(k)
    return ordered if key_out else ordered.drop("__prio")
