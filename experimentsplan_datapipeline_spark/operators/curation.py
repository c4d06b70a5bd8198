"""Corpus-curation operators for training-data pipelines (north-star ops).

The reference's curriculum machinery samples and mixes datasets with
driver-side Python (train/common/dataset.py:180-227,
train/train_stage_1_2/dataloader.py:102-124); these are the scale-grade
companions a 100 TB corpus needs around that: leakage-free holdout splits,
per-source epoch weighting, length bucketing for packing efficiency, skew
diagnostics that feed the salted-join decision, and column profiling.

Determinism contract: every "random" choice derives from an md5-based
integer hash that DuckDB reproduces bit-for-bit
(Spark ``conv(substr(md5(x),1,8),16,10)`` == DuckDB
``('0x'||substr(md5(x),1,8))::BIGINT``), so the oracle can replay splits,
repeats, and bucket assignments exactly. No ``rand()`` anywhere — a re-run
on different partitioning yields identical output.

Scale shape: every operator here is a narrow projection plus at most one
hash-keyed shuffle; nothing widens rows or collects to the driver.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType
from pyspark.sql.window import Window

from experimentsplan_datapipeline_spark.operators.util import (
    lit_frame,
    spread_small_input,
)

#: modulus for hash fractions — 1/10000 granularity is finer than any
#: realistic split/repeat fraction while keeping thresholds exact integers.
HASH_MOD = 10_000


def portable_hash(cols: Sequence[Column | str], seed: int) -> Column:
    """Uniform integer in [0, 2^32) from md5, reproducible in ANSI SQL.

    Spark: ``conv(substr(md5(concat_ws('|', cols..., seed)), 1, 8), 16, 10)``.
    DuckDB twin: ``('0x' || substr(md5(a || '|' || ... || '|seed'), 1, 8))::BIGINT``.
    Engine-independent (unlike xxhash64/rand), so sampling decisions made
    with it are auditable and replayable anywhere.
    """
    parts = [F.col(c).cast("string") if isinstance(c, str) else c.cast("string")
             for c in cols]
    salted = F.concat_ws("|", *parts, F.lit(str(seed)))
    return F.conv(F.substring(F.md5(salted), 1, 8), 16, 10).cast("long")


def hash_fraction(cols: Sequence[Column | str], seed: int) -> Column:
    """Integer in [0, HASH_MOD) — compare against ``int(frac * HASH_MOD)``."""
    return F.pmod(portable_hash(cols, seed), F.lit(HASH_MOD))


def train_holdout_split(
    df: DataFrame,
    group_cols: Sequence[str],
    fractions: dict[str, float],
    seed: int = 42,
    split_col: str = "split",
) -> DataFrame:
    """Deterministic leakage-free train/val/test split.

    The split hashes the GROUP key (e.g. user_id, source domain), not the
    row, so every row of a group lands in the same split — cross-split
    leakage (the classic eval-contamination bug) is impossible by
    construction. Fractions are cumulative thresholds on the hash fraction;
    no shuffle at all — the assignment is a projection and composes with
    partition pruning when later materialized as ``PARTITIONED BY (split)``.
    """
    v = hash_fraction([F.col(c) for c in group_cols], seed)
    expr = None
    acc = 0.0
    names = list(fractions)
    for name in names[:-1]:
        acc += fractions[name]
        cond = v < int(round(acc * HASH_MOD))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    return df.withColumn(split_col, expr)


def mixture_repeat(
    df: DataFrame,
    source_col: str,
    repeats: dict[str, float],
    key_cols: Sequence[str],
    default_repeat: float = 1.0,
    seed: int = 42,
) -> DataFrame:
    """Per-source epoch weighting: repeat each row ``repeats[source]`` times.

    The fractional part is resolved per-row by hash fraction (a repeat of
    2.5 gives every row 2 copies and half the rows — chosen deterministically
    — a third), which preserves the exact corpus-level mixture without
    sampling noise. Narrow explode, no shuffle; output order carries a
    ``copy`` ordinal so downstream shuffling can decorrelate copies.
    """
    r_expr = None
    for src, r in repeats.items():
        cond = F.col(source_col) == src
        r_expr = F.when(cond, r) if r_expr is None else r_expr.when(cond, r)
    r_expr = (
        F.lit(float(default_repeat)) if r_expr is None
        else r_expr.otherwise(float(default_repeat))
    )
    frac_v = hash_fraction([F.col(c) for c in key_cols], seed)
    copies = (
        F.floor(r_expr).cast("long")
        + F.when(
            frac_v < ((r_expr - F.floor(r_expr)) * HASH_MOD).cast("long"), 1
        ).otherwise(0)
    )
    return (
        df.withColumn("__copies", copies)
        .filter(F.col("__copies") >= 1)
        .withColumn(
            "copy", F.explode(F.sequence(F.lit(1).cast("long"), F.col("__copies")))
        )
        .drop("__copies")
    )


def length_buckets(
    df: DataFrame,
    id_col: str,
    n_tokens_col: Column,
    n_buckets: int = 8,
) -> DataFrame:
    """Equal-frequency length buckets for packing-efficient batch assembly.

    Exact ntile semantics over (n_tokens, id) — the id tiebreak makes
    bucket membership deterministic — but computed WITHOUT the single-task
    global window behind ntile: ``ordered_rank`` range-partitions on the
    sort key, ranks locally, and offsets by broadcast per-partition counts;
    the bucket then derives from (rank, total) with ntile's first-buckets-
    get-the-remainder rule. Identical output to plain ntile at any scale
    (the oracle runs literal ntile SQL). For approximate needs, quantile
    cut-points applied as a projection skip the ranking entirely.
    Returns per-bucket stats: (bucket, n_docs, min/max/avg tokens).
    """
    from experimentsplan_datapipeline_spark.operators.sampling import ordered_rank

    sized = df.select(F.col(id_col), n_tokens_col.alias("n_tokens"))
    ranked = ordered_rank(sized, ["n_tokens", id_col], rank_col="__rk")
    total = sized.select(F.count(F.lit(1)).alias("__tot"))
    # ntile: first (tot % B) buckets hold ceil(tot/B) rows, the rest floor
    big = F.floor(F.col("__tot") / n_buckets) + 1
    small = F.floor(F.col("__tot") / n_buckets)
    extra = F.col("__tot") % n_buckets
    cut = extra * big
    bucket = F.when(
        F.col("__rk") <= cut, F.floor((F.col("__rk") - 1) / big)
    ).otherwise(
        extra + F.floor((F.col("__rk") - cut - 1) / F.greatest(small, F.lit(1)))
    ) + 1
    return (
        ranked.crossJoin(F.broadcast(total))
        .withColumn("bucket", bucket.cast("int"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_tokens").alias("min_tokens"),
            F.max("n_tokens").alias("max_tokens"),
            F.round(F.avg("n_tokens"), 6).alias("avg_tokens"),
        )
    )


def batch_padding_report(
    df: DataFrame,
    id_col: str,
    n_tokens_col: Column,
    n_buckets: int = 8,
    batch_size: int = 16,
    order_by_length: bool = True,
) -> DataFrame:
    """Padding-efficiency report for length-bucketed batch assembly — the
    metric that justifies ``length_buckets``: docs ordered by length and
    cut into ``batch_size``-doc micro-batches within each bucket, every
    batch padded to its own longest member (how sequence batching
    actually ships to the trainer). Emits per bucket: the batch count,
    real token count, padded slot count (sum over batches of
    batch_rows * batch_max), and efficiency = real/padded.

    ``order_by_length=False`` ranks by id instead — ARRIVAL-ORDER
    batching, the naive baseline the length ordering exists to beat
    (property-tested: the sorted form's overall efficiency is never
    worse). With length ordering, the bucket boundaries barely change
    batch composition (consecutive-rank cuts are near-optimal already);
    the bucketing's real job is distributability — each bucket's batch
    stream is an independent unit of work.

    Scale shape: ONE distributed rank (range partition + broadcast
    offsets, no global window) is shared by bucket assignment AND
    within-bucket batch ids — buckets are contiguous rank ranges, so the
    in-bucket position is pure arithmetic on the global rank (bucket
    start replayed from the same ntile remainder rule). Then two
    shrinking aggregations: (bucket, batch) -> bucket.
    """
    from experimentsplan_datapipeline_spark.operators.sampling import ordered_rank

    sized = df.select(F.col(id_col), n_tokens_col.alias("n_tokens"))
    order = ["n_tokens", id_col] if order_by_length else [id_col]
    ranked = ordered_rank(sized, order, rank_col="__rk")
    total = sized.select(F.count(F.lit(1)).alias("__tot"))
    big = F.floor(F.col("__tot") / n_buckets) + 1
    small = F.floor(F.col("__tot") / n_buckets)
    extra = F.col("__tot") % n_buckets
    cut = extra * big
    bucket = F.when(
        F.col("__rk") <= cut, F.floor((F.col("__rk") - 1) / big)
    ).otherwise(
        extra + F.floor((F.col("__rk") - cut - 1) / F.greatest(small, F.lit(1)))
    ) + 1
    # bucket k's first global rank, from the same remainder rule
    k0 = bucket - 1  # buckets before k
    start = F.when(
        k0 <= extra, k0 * big
    ).otherwise(cut + (k0 - extra) * small)
    batch_id = F.floor((F.col("__rk") - start - 1) / batch_size)
    per_batch = (
        ranked.crossJoin(F.broadcast(total))
        .select(
            bucket.cast("int").alias("bucket"),
            batch_id.cast("long").alias("batch_id"),
            "n_tokens",
        )
        .groupBy("bucket", "batch_id")
        .agg(
            F.count(F.lit(1)).alias("__cnt"),
            F.max("n_tokens").alias("__mx"),
            F.sum("n_tokens").alias("__real"),
        )
    )
    return (
        per_batch.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_batches"),
            F.sum("__real").alias("real_tokens"),
            F.sum(F.col("__cnt") * F.col("__mx")).alias("padded_slots"),
        )
        .withColumn(
            "efficiency",
            F.when(
                F.col("padded_slots") > 0,
                F.round(
                    F.col("real_tokens")
                    / F.col("padded_slots").cast("double"),
                    6,
                ),
            ).otherwise(F.lit(0.0)),  # all-empty bucket: nothing to pad
        )
    )


def pack_chunks(
    df: DataFrame,
    id_col: str,
    len_col: str,
    ctx: int,
    n_shards: int = 64,
    seed: int = 7,
) -> DataFrame:
    """GPT-style sequence packing: concatenate documents into per-shard
    token streams and split the stream into fixed ``ctx``-token context
    windows (bins), documents spanning bin boundaries — the packing used
    for dense LLM pretraining batches (concatenate-and-chunk; no padding,
    no doc-boundary alignment). Output is the segment map a loader needs:
    one row per (document, bin) overlap with
    (shard, bin_id, id, doc_off, bin_off, seg_len) —
    "seg_len tokens of doc starting at doc_off land in bin bin_id at
    offset bin_off".

    Distribution: documents hash into ``n_shards`` independent streams
    via the portable md5 hash (deterministic + oracle-replayable; at
    cluster scale set n_shards to a few x total cores), each shard packs
    independently under a single window cumsum ordered by ``id_col``
    (deterministic), and a doc's bin span explodes via sequence() — all
    JVM-side expressions, one hash shuffle + per-shard sort, nothing
    driver-side. Zero-length docs occupy no tokens and drop out;
    null/negative lengths raise rather than silently corrupting offsets.
    Every bin except each shard's last is exactly full — the packing
    -efficiency contract pinned by the pytest property test.
    """
    shard = F.pmod(portable_hash([id_col], seed), F.lit(n_shards))
    ln = F.col(len_col).cast("long")
    guarded = F.when(
        ln.isNull() | (ln < 0),
        F.raise_error("pack_chunks: lengths must be >= 0 and non-null"),
    ).otherwise(ln)
    base = df.select(
        F.col(id_col),
        guarded.alias("__len"),
        shard.alias("shard"),
    ).filter(F.col("__len") > 0)
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = base.select(
        id_col,
        "shard",
        "__len",
        F.sum("__len").over(w).alias("__cum"),
    ).withColumn("__st", F.col("__cum") - F.col("__len"))
    seg = cum.select(
        id_col,
        "shard",
        "__st",
        "__cum",
        F.explode(
            F.sequence(
                F.floor(F.col("__st") / ctx),
                F.floor((F.col("__cum") - 1) / ctx),
            )
        ).alias("bin_id"),
    )
    seg_start = F.greatest(F.col("__st"), F.col("bin_id") * ctx)
    seg_end = F.least(F.col("__cum"), (F.col("bin_id") + 1) * ctx)
    return seg.select(
        "shard",
        "bin_id",
        F.col(id_col),
        (seg_start - F.col("__st")).alias("doc_off"),
        (seg_start - F.col("bin_id") * ctx).alias("bin_off"),
        (seg_end - seg_start).alias("seg_len"),
    )


def pack_next_fit(
    df: DataFrame,
    id_col: str,
    len_col: str,
    ctx: int,
    n_shards: int = 64,
    seed: int = 7,
) -> DataFrame:
    """No-split sequence packing (next-fit bin packing): documents fill a
    ``ctx``-token bin in ``id_col`` order until the next one would
    overflow, which seals the bin and opens a new one — the packing used
    where documents must stay intact (SFT examples, contrastive pairs),
    next to ``pack_chunks``'s concatenate-and-chunk for dense
    pretraining. Returns (shard, bin_id, id, n_tok, bin_off).

    Bin state (current fill) is inherently SEQUENTIAL — no window/cumsum
    closed form exists because each bin break resets the accumulator at a
    data-dependent position. The Spark shape is therefore
    ``applyInPandas`` over independent hash shards: the portable-hash
    shard is the unit of parallelism (set n_shards to a few x total
    cores; each shard's fold is a tight numpy loop over one Arrow
    batch), and the SQL oracle replays the fold as a per-shard recursive
    CTE. Zero-length docs drop; null/negative lengths and docs longer
    than ``ctx`` raise (truncate or route oversize docs first — silently
    splitting them would contradict the operator's contract).
    """
    import numpy as np
    import pandas as pd

    shard = F.pmod(portable_hash([id_col], seed), F.lit(n_shards))
    ln = F.col(len_col).cast("long")
    guarded = F.when(
        ln.isNull() | (ln < 0) | (ln > ctx),
        F.raise_error(
            f"pack_next_fit: lengths must be in [0, ctx={ctx}] and non-null"
        ),
    ).otherwise(ln)
    base = df.select(
        F.col(id_col),
        guarded.alias("__len"),
        shard.alias("shard"),
    ).filter(F.col("__len") > 0)

    id_field = base.schema[id_col]
    out_schema = StructType(
        [
            StructField("shard", LongType()),
            StructField("bin_id", LongType()),
            id_field,
            StructField("n_tok", LongType()),
            StructField("bin_off", LongType()),
        ]
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort")
        lens = pdf["__len"].to_numpy(dtype=np.int64)
        bins = np.empty(len(lens), dtype=np.int64)
        offs = np.empty(len(lens), dtype=np.int64)
        b = 0
        fill = 0
        for i, n in enumerate(lens):
            if fill + n > ctx:
                b += 1
                fill = 0
            bins[i] = b
            offs[i] = fill
            fill += n
        return pd.DataFrame(
            {
                "shard": pdf["shard"].to_numpy(),
                "bin_id": bins,
                id_col: pdf[id_col].to_numpy(),
                "n_tok": lens,
                "bin_off": offs,
            }
        )

    return base.groupBy("shard").applyInPandas(fold, schema=out_schema)


def mixture_token_budget(
    df: DataFrame,
    source_col: str,
    len_col: str,
    id_cols: Sequence[str],
    budget: int,
    overrides: "dict[str, int] | None" = None,
    seed: int = 7,
) -> DataFrame:
    """Token-budget mixture sampling: per source, keep documents in a
    seeded pseudo-random order until the source's TOKEN budget is
    exhausted (every kept row has running total <= budget) — how
    pretraining mixtures are actually specified ("B tokens of web, B' of
    code"), where ``mixture_repeat``'s epoch weights specify document
    multiplicity instead. Deterministic: the order is the portable md5
    hash over ``id_cols`` (replayable by the SQL oracle, invariant to
    physical partitioning), so the kept set is a stable function of
    (data, seed, budgets).

    ``budget`` applies to every source; ``overrides`` remaps individual
    sources. A source whose first document alone exceeds its budget
    contributes nothing (the contract is a hard cap, not best-effort).

    Scale shape: one range shuffle + broadcast-offset prefix sums via
    ``grouped_running_total`` — NO per-source single-task window, so a
    3-source 100 TB corpus still uses every executor. Returns the input
    columns plus the running total ``cum``.
    """
    from experimentsplan_datapipeline_spark.operators.sampling import (
        grouped_running_total,
    )

    order = portable_hash(list(id_cols), seed)
    with_order = df.withColumn("__ord", order)
    cum = grouped_running_total(
        with_order,
        [source_col],
        ["__ord", *id_cols],
        len_col,
        out_col="cum",
    )
    b = F.lit(budget)
    for src, val in (overrides or {}).items():
        b = F.when(F.col(source_col) == src, F.lit(val)).otherwise(b)
    # restore the caller's column order (the offset join moved keys first)
    return cum.filter(F.col("cum") <= b).select(*df.columns, "cum")


def mixture_temperature(
    df: DataFrame,
    source_col: str,
    mass_col: str,
    id_cols: Sequence[str],
    total: int,
    alpha: float = 0.5,
    seed: int = 7,
) -> DataFrame:
    """Temperature-flattened mixture sampling (the mT5/XLM-R alpha trick,
    Xue et al. 2021 §3.1): per-source quotas proportional to
    (sum of ``mass_col``)^alpha, so alpha=1 reproduces natural
    proportions, alpha=0 samples sources uniformly, and 0<alpha<1
    upsamples the tail — then an exact without-replacement draw of each
    quota in seeded hash order.

    Deterministic and engine-replayable: quotas come from
    floor(round(total * w_s / sum w, 6)) — the round(6) absorbs the
    summation-order ulp so two engines folding sum(w) in different
    orders cannot floor across an integer boundary — capped at the
    source's row count; the per-source draw is ``hash_rank``'s portable
    md5 order.

    Scale shape: the mass/count aggregation is one partial-agg groupBy
    (S rows); quotas broadcast back; the draw is hash_rank's range
    shuffle + broadcast offsets — NO per-source single-task window.
    Returns the input columns plus ``rk`` (the draw rank) and ``quota``.
    """
    from experimentsplan_datapipeline_spark.operators.sampling import hash_rank

    stats = df.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.col(mass_col).cast("double")).alias("__mass"),
    )
    w = F.pow(F.col("__mass"), F.lit(float(alpha)))
    tot = stats.agg(F.sum(F.pow(F.col("__mass"), F.lit(float(alpha)))).alias("__tw"))
    quotas = stats.crossJoin(F.broadcast(tot)).select(
        source_col,
        F.least(
            F.col("__n"),
            F.floor(F.round(F.lit(int(total)) * w / F.col("__tw"), 6)),
        ).cast("int").alias("quota"),
    )
    ranked = hash_rank(
        df, list(id_cols), partition_cols=[source_col], seed=seed, rank_col="rk"
    )
    return (
        ranked.join(F.broadcast(quotas), source_col)
        .filter(F.col("rk") <= F.col("quota"))
        .select(*df.columns, "rk", "quota")
    )


def scaler_fit_transform(
    df: DataFrame,
    train_pred: Column,
    feature_cols: Sequence[str],
    round_to: int = 6,
) -> DataFrame:
    """Leakage-free standardization: mean/stddev_pop are fitted on the
    TRAIN rows only (``train_pred``) and applied to EVERY row — the
    fit-on-train/transform-everything contract a serving pipeline needs
    (fitting on all rows leaks test statistics into the features; the
    same-rows variant lives in ``normalize_by_group``). Zero-variance
    features standardize to 0.

    Scale shape: one partially-aggregated pass produces a single stats
    row (2 doubles per feature) that broadcasts into a literal-like
    cross join; the transform itself is pure codegen arithmetic. Stats
    are rounded to ``round_to`` BEFORE the z-score so engines that fold
    the train sum in different orders still standardize identically.
    Appends ``z_<col>`` per feature.
    """
    aggs = []
    for c in feature_cols:
        x = F.col(c).cast("double")
        aggs.append(F.round(F.avg(x), round_to).alias(f"__mu_{c}"))
        aggs.append(F.round(F.stddev_pop(x), round_to).alias(f"__sd_{c}"))
    stats = df.filter(train_pred).agg(*aggs)
    out = df.crossJoin(F.broadcast(stats))
    zcols = []
    for c in feature_cols:
        mu, sd = F.col(f"__mu_{c}"), F.col(f"__sd_{c}")
        z = F.when(sd == 0.0, F.lit(0.0)).otherwise(
            (F.col(c).cast("double") - mu) / sd
        )
        zcols.append(F.round(z, round_to).alias(f"z_{c}"))
    return out.select(*df.columns, *zcols)


def heavy_keys(
    df: DataFrame, key_col: str, top_k: int = 20
) -> DataFrame:
    """Skew diagnostic: heaviest join/partition keys with share of total.

    One partial-aggregated groupBy (map-side combine collapses each
    partition to its local key counts), the grand total as a single-row
    broadcast, and a TWO-PHASE top-k over the key table — the key table is
    small for low-cardinality keys but can be corpus-scale for
    high-cardinality ones (user ids, urls), where a global
    ``Window.orderBy`` rank would funnel every distinct key through one
    task. The output feeds the salting decision for ``join_salted``: keys
    above a share threshold get salt fan-out, the rest join plain.
    """
    from experimentsplan_datapipeline_spark.operators.windows import (
        top_k_per_key_two_phase,
    )

    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("__total"))
    shared = (
        counts.crossJoin(F.broadcast(total))
        .withColumn("share", F.round(F.col("cnt") / F.col("__total"), 6))
        .drop("__total")
        .withColumn("__g", F.lit(1))
    )
    return (
        top_k_per_key_two_phase(
            shared,
            key_cols=["__g"],
            order_by=[F.col("cnt").desc(), F.col(key_col).asc()],
            k=top_k,
            bucket_cols=[key_col],
        )
        .drop("__g")
    )


def profile_columns(
    df: DataFrame, numeric_cols: Sequence[str], string_cols: Sequence[str]
) -> DataFrame:
    """Long-format column profile: rows, nulls, distincts, min/max per column.

    One aggregation pass per profiled column unioned into a long table —
    Catalyst collapses the scans of a cached/parquet source, and each agg is
    partial. Numeric extremes render through DECIMAL(18,2) so the string
    form is engine-stable (doubles stringify differently across engines).
    """
    outs = []
    for c, is_num in [(c, True) for c in numeric_cols] + [
        (c, False) for c in string_cols
    ]:
        col = F.col(c)
        if is_num:
            mn = F.round(F.min(col), 2).cast("decimal(18,2)").cast("string")
            mx = F.round(F.max(col), 2).cast("decimal(18,2)").cast("string")
        else:
            mn, mx = F.min(col).cast("string"), F.max(col).cast("string")
        outs.append(
            df.agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.when(col.isNull(), 1).otherwise(0)).alias("n_nulls"),
                F.count_distinct(col).alias("n_distinct"),
                mn.alias("min_value"),
                mx.alias("max_value"),
            ).select(F.lit(c).alias("col_name"), "*")
        )
    result = outs[0]
    for o in outs[1:]:
        result = result.unionByName(o)
    return result


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str,
    id_col: str,
    eval_text_col: str | None = None,
    n: int = 5,
    min_hits: int = 1,
) -> DataFrame:
    """Benchmark DECONTAMINATION: flag training documents that share at
    least ``min_hits`` distinct word n-grams with an evaluation set — the
    GPT-3 appendix-C / PaLM 13-gram overlap rule (n is a parameter; the
    synthetic corpus uses shorter shingles). Returns every train row plus
    ``n_overlap`` (distinct shared n-grams) and ``contaminated``; dropping
    is a downstream ``filter(~contaminated)``, keeping removal counts
    observable — same reporting-before-dropping contract as
    dq_expectations and decode_ok.

    Scale shape: the eval side reduces to DISTINCT n-gram strings — for a
    real benchmark suite that is a few million short strings, which the
    planner broadcasts (or hash-joins if it ever isn't small); the train
    side explodes to distinct (doc, gram) pairs and semi-joins — one
    shuffle keyed on the gram, one map-side-combinable per-doc count, one
    O(|train|) left join. The train corpus itself never broadcasts and
    never self-joins, so the op is linear in corpus n-grams at any scale.
    """
    from experimentsplan_datapipeline_spark.functions.text import ngrams

    eg = (
        eval_df.select(
            F.explode(
                F.array_distinct(ngrams(eval_text_col or text_col, n))
            ).alias("g")
        )
        .distinct()
    )
    tg = train.select(
        F.col(id_col),
        F.explode(F.array_distinct(ngrams(text_col, n))).alias("g"),
    )
    hits = tg.join(eg, "g").groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_overlap")
    )
    return train.join(hits, id_col, "left").select(
        *[F.col(c) for c in train.columns],
        F.coalesce(F.col("n_overlap"), F.lit(0)).alias("n_overlap"),
        (F.coalesce(F.col("n_overlap"), F.lit(0)) >= min_hits).alias(
            "contaminated"
        ),
    )


# Trained model-based quality filtering (the FastText/CCNet-style
# discriminative classifier an LLM-data pipeline trains over cheap text
# statistics; LM perplexity and DSIR are the generative companions).
# Every arithmetic choice below exists to make the training loop
# EXACTLY replayable by the DuckDB oracle:
#   - features are capped INTEGER counts scaled by the dyadic 1/256
#     (engine-identical values with 8 fractional bits),
#   - the activation is the hard sigmoid clamp(0.25 z + 0.5, 0, 1) —
#     plain IEEE mul/add/clamp, no libm exp whose last ulp differs
#     across engines,
#   - per-row residuals snap to the 2^-20 grid before summation, so the
#     gradient sums are sums of exact dyadic rationals (order-free),
#   - the gradient MEAN divides by the next power of two >= n (exact)
#     and the learning rate is dyadic, and
#   - weights snap to the 2^-30 grid after each update, which keeps
#     every later product inside double's 53-bit mantissa (z = sum of
#     30-frac-bit weights x 8-frac-bit features stays exact).
_QC_LR = 4.0
_QC_Q = 2.0 ** 20
_QC_WQ = 2.0 ** 30
_QC_XS = 1.0 / 256.0


def _qc_features(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """The fixed 5-feature map: bias + four capped counts (words,
    distinct words, chars/16, longest word), each scaled by 1/256 — the
    cheap statistics a quality classifier actually uses."""
    ws = F.filter(
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+"),
        lambda w: w != "",
    )
    sc = F.lit(_QC_XS)
    return df.select(
        F.col(id_col),
        F.lit(1.0).alias("x0"),
        (F.least(F.size(ws), F.lit(255)) * sc).alias("x1"),
        (F.least(F.size(F.array_distinct(ws)), F.lit(255)) * sc).alias("x2"),
        (
            F.least(F.length(text_col) / 16, F.lit(255)).cast("int") * sc
        ).alias("x3"),
        # coalesce BEFORE least: an empty doc has no words, and both
        # engines must agree the feature is 0 (least() NULL handling is
        # not something to depend on cross-engine)
        (
            F.least(
                F.coalesce(
                    F.array_max(F.transform(ws, lambda w: F.length(w))),
                    F.lit(0),
                ),
                F.lit(255),
            )
            * sc
        ).alias("x4"),
    )


def quality_classifier_train(
    df: DataFrame,
    id_col: str,
    text_col: str,
    label: Column,
    n_steps: int = 32,
) -> tuple[DataFrame, list[float]]:
    """Train a hard-sigmoid logistic quality classifier by full-batch
    gradient descent — the iterate-until-N driver-loop shape
    (``pagerank_until``, ``bpe_train``): per step ONE map-side-combinable
    aggregation computes the five gradient sums plus the running
    accuracy (a bounded 1-row collect), and the weight update happens
    driver-side. The corpus is featurized once (localCheckpoint); every
    later step touches only the 6-column feature frame, so 100 TB is
    scanned exactly once regardless of step count.

    Returns ``(trace_df, weights)``: one row per step
    (step, w0..w4, n_correct — accuracy measured under the PRE-update
    weights, i.e. the model the step's gradients were computed from)
    and the final weight list for ``quality_classifier_score``.
    """
    import math

    spark = df.sparkSession
    feats = (
        _qc_features(df, id_col, text_col)
        .join(
            df.select(
                F.col(id_col), label.cast("int").alias("y")
            ),
            id_col,
        )
        .localCheckpoint(eager=True)
    )
    n = feats.count()
    # r14 loop-overhead trims (measured together: 32 steps 8.8 s ->
    # 3.0 s at sf0.1, trace bit-identical):
    # - coalesce to ceil(n / 2M) partitions (~100 MB each) so a step is
    #   ONE single-stage job instead of a partial+final AQE pair. Safe
    #   on the values: every summand is pre-gridded to 2^-20 (the
    #   operator's order-free exactness contract), so partition layout
    #   cannot change a gradient sum. Scale-adaptive, not a local[32]
    #   constant: a billion-row corpus keeps hundreds of partitions.
    # - each step's aggregation is ONE parsed SQL string over a temp
    #   view instead of ~25 py4j Column constructions; the SQL
    #   arithmetic is the same left-associated expression tree
    #   (repr(float) literals round-trip exactly, multiplication is
    #   IEEE-commutative), pinned bit-identical by
    #   test_qc_train_sql_steps_match_column_form.
    feats = feats.coalesce(max(1, -(-n // 2_000_000)))
    view = f"__qc_feats_{abs(id(feats))}"
    feats.createOrReplaceTempView(view)
    pow2 = float(1 << max(n - 1, 1).bit_length())
    w = [0.0] * 5
    rows = []
    try:  # the view must not outlive the loop even when a step raises
        for t in range(1, n_steps + 1):
            z = " + ".join(
                [f"({w[0]!r}D * x0)"]
                + [f"(x{j} * {w[j]!r}D)" for j in range(1, 5)]
            )
            p = f"greatest(least(({z}) * 0.25D + 0.5D, 1.0D), 0.0D)"
            g = (
                f"(floor(({p} - y) * {float(_QC_Q)!r}D + 0.5D)"
                f" / {float(_QC_Q)!r}D)"
            )
            sel = ", ".join(
                [f"sum({g} * x{j}) AS g{j}" for j in range(5)]
                + [
                    f"sum(CASE WHEN ({p} >= 0.5D) = (y = 1)"
                    " THEN 1 ELSE 0 END) AS n_correct"
                ]
            )
            agg = spark.sql(f"SELECT {sel} FROM {view}").first()
            w = [
                math.floor(
                    (w[j] - _QC_LR * float(agg[f"g{j}"]) / pow2) * _QC_WQ
                    + 0.5
                )
                / _QC_WQ
                for j in range(5)
            ]
            rows.append(tuple([t] + w + [int(agg["n_correct"])]))
    finally:
        spark.catalog.dropTempView(view)
    if not rows:
        # n_steps=0: 'SELECT * FROM VALUES' with no tuples is a
        # ParseException — return the empty trace with the same schema
        # the VALUES form produces (ADVICE r14)
        return (
            lit_frame(
                spark,
                [],
                "step int, w0 double, w1 double, w2 double, w3 double, "
                "w4 double, n_correct bigint",
            ),
            w,
        )
    # r14: build the trace as one parsed VALUES literal instead of
    # spark.createDataFrame(rows) — the python-rows path parallelizes a
    # pickled RDD whose noop/save stage spun up a Python worker per
    # task (measured 34 s of executor time for 32 rows). repr(float)
    # round-trips doubles exactly (see vectors.lit_double_array), and
    # the weights are 2^-30-gridded so their repr is short decimal text.
    vals = ",".join(
        "(" + ",".join(
            [str(r[0])] + [repr(float(x)) + "D" for x in r[1:6]]
            + [str(r[6]) + "L"]
        ) + ")"
        for r in rows
    )
    trace = spark.sql(
        "SELECT * FROM VALUES " + vals
        + " AS t(step, w0, w1, w2, w3, w4, n_correct)"
    )
    return trace, w


def temporal_split_embargo(
    df: DataFrame,
    ts_col: str,
    train_frac_pct: int = 60,
    embargo_pct: int = 5,
) -> DataFrame:
    """Temporal train/test split with an embargo gap — the time-series
    complement of the hash-keyed ``train_holdout_split``: train is
    everything before the cut, test everything after cut + gap, and the
    embargo window BETWEEN them is excluded entirely, so temporally
    correlated neighbors (near-duplicate articles, overlapping label
    windows) cannot straddle the boundary (the purged/embargoed split of
    Lopez de Prado 2018, public).

    Cut and gap derive from the observed time range in exact integer
    microsecond arithmetic (cut = mn + (mx - mn) * pct // 100), so the
    assignment is engine-reproducible with no float or interval math.
    One tiny min/max aggregation broadcasts back onto the scan; the
    split label itself is a pure projection — no shuffle.

    Returns the input plus a ``split`` column in
    {'train', 'embargo', 'test'} — consumers filter out 'embargo'.
    """
    us = F.unix_micros(F.col(ts_col))
    bounds = df.agg(
        F.min(us).alias("__mn"), F.max(us).alias("__mx")
    )
    out = df.crossJoin(F.broadcast(bounds))
    cut = F.col("__mn") + F.expr(
        f"div((__mx - __mn) * {int(train_frac_pct)}, 100)"
    )
    gap_end = cut + F.expr(
        f"div((__mx - __mn) * {int(embargo_pct)}, 100)"
    )
    return out.withColumn(
        "split",
        F.when(us < cut, "train")
        .when(us < gap_end, "embargo")
        .otherwise("test"),
    ).drop("__mn", "__mx")


# Dyadic grids for mixture_reweight_mw (same discipline as the quality
# classifier): probabilities on 2^-20, distribution gaps on 2^-25,
# weights on 2^-30, step size a power of two — every aggregate below
# sums EXACT dyadic rationals inside double's 53-bit mantissa (sums are
# order-free), and every other operation is a single correctly-rounded
# IEEE op followed by a floor-snap, so the trajectory is bit-identical
# across engines with no libm anywhere.
_MW_PQ = 1048576.0  # 2^20
_MW_DQ = 33554432.0  # 2^25
_MW_WQ = 1073741824.0  # 2^30
_MW_ETA = 8.0


def mixture_reweight_mw(
    df: DataFrame,
    source_col: str,
    text_col: str,
    n_steps: int = 12,
    top_v: int = 16,
) -> DataFrame:
    """Train domain mixture weights by multiplicative-weights updates —
    the trained-curation answer to "how much of each source should the
    pretraining mix contain" (DoReMi, Xie et al. 2023, learns domain
    weights from per-domain excess loss; Group DRO, Sagawa et al. 2020,
    upweights the worst-off group; both public algorithms; the update
    rule here is Hedge/MW, Freund & Schapire 1997, in its linearized
    ``w * (1 + eta * loss)`` form — no libm exp).

    Each domain's per-step loss is the squared L2 gap between its token
    distribution and the CURRENT weighted mixture distribution, so the
    update raises weight on underrepresented domains and the fixed point
    balances representation gaps — the shape of DoReMi's loop with the
    proxy-model excess loss replaced by a distribution gap the engine
    can compute exactly (in production, plug per-domain model losses
    into the same trajectory).

    Scale shape: ONE corpus scan builds the per-source distribution over
    the global top-``top_v`` tokens + '__other' (the same class collapse
    that bounds ``stream_token_drift``'s state); the dense matrix is
    |sources| x (top_v + 1) rows — collected once, bounded by
    construction — and every MW step is O(S * V) driver flops. 100 TB
    costs the scan, not the loop.

    Returns the full trajectory: (step, source, weight_q30, loss_q50)
    with weights/losses as EXACT integer grid points (weight = q30 /
    2^30; loss measured under the PREVIOUS step's weights, the ones the
    update consumed).
    """
    import math

    from experimentsplan_datapipeline_spark.operators.text_analysis import (
        _tokens,
    )

    spark = df.sparkSession
    toks = spread_small_input(df).select(
        F.col(source_col).alias("source"),
        F.explode(
            F.filter(_tokens(text_col), lambda x: x != "")
        ).alias("w"),
    )
    vocab = [
        r["w"]
        for r in toks.groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), "w")
        .limit(top_v)
        .collect()  # bounded: top_v rows
    ]
    classes = vocab + ["__other"]
    counted = (
        toks.select(
            "source",
            F.when(F.col("w").isin(vocab), F.col("w"))
            .otherwise(F.lit("__other"))
            .alias("tok"),
        )
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    stot = counted.groupBy("source").agg(F.sum("c").alias("n"))
    cls_df = lit_frame(spark, [(c,) for c in classes], "tok string")
    dense = (
        stot.crossJoin(F.broadcast(cls_df))
        .join(counted, ["source", "tok"], "left")
        .select(
            "source",
            "tok",
            (
                F.expr("div(coalesce(c, 0) * 1048576, n)") / F.lit(_MW_PQ)
            ).alias("p"),
        )
    )
    rows = dense.collect()  # bounded: |sources| * (top_v + 1) rows
    p = {(r["source"], r["tok"]): r["p"] for r in rows}
    sources = sorted({r["source"] for r in rows})
    n_src = len(sources)
    if n_src == 0:
        raise ValueError("mixture_reweight_mw: no sources found")
    # exact integer division (ADVICE r11): float true-division + floor
    # rounds UP across an integer once (1<<30)/n_src loses precision
    # (~3e7 sources), silently leaving the stated exact-dyadic grid
    w = {s: ((1 << 30) // n_src) / _MW_WQ for s in sources}
    out = []
    for t in range(1, n_steps + 1):
        q = {c: sum(w[s] * p[(s, c)] for s in sources) for c in classes}
        loss = {}
        for s in sources:
            acc = 0.0
            for c in classes:
                d = math.floor((p[(s, c)] - q[c]) * _MW_DQ) / _MW_DQ
                acc += d * d
            loss[s] = acc
        m = {
            s: math.floor(
                w[s] * (1 + _MW_ETA * loss[s]) * _MW_WQ + 0.5
            )
            / _MW_WQ
            for s in sources
        }
        mt = sum(m.values())
        w = {
            s: math.floor(m[s] / mt * _MW_WQ + 0.5) / _MW_WQ
            for s in sources
        }
        out.extend(
            (
                t,
                s,
                int(round(w[s] * _MW_WQ)),
                int(round(loss[s] * float(1 << 50))),
            )
            for s in sources
        )
    return lit_frame(
        spark, out, "step int, source string, weight_q30 long, loss_q50 long"
    )


def quality_classifier_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    weights: list[float],
) -> DataFrame:
    """Apply a trained quality classifier: (id, quality_p, keep_quality).
    Pure codegen expressions over the same fixed feature map — the
    bounded weight literals ride the plan like the BPE merge table."""
    feats = _qc_features(df, id_col, text_col)
    z = sum(
        (F.col(f"x{j}") * F.lit(float(weights[j])) for j in range(1, 5)),
        F.lit(float(weights[0])) * F.col("x0"),
    )
    p = F.greatest(F.least(z * 0.25 + 0.5, F.lit(1.0)), F.lit(0.0))
    return feats.select(
        F.col(id_col),
        F.round(p, 6).alias("quality_p"),
        (p >= 0.5).alias("keep_quality"),
    )
