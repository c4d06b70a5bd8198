"""Aggregation operators (SURVEY.md §2.4, A1-A10).

All built on Spark's partial-aggregation machinery (map-side combine before
the shuffle); stats use population stddev to match the reference's np.std
(ddof=0, train/common/metrics.py:459). file:line cites /root/reference.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def count_by(df: DataFrame, *keys: str) -> DataFrame:
    """A1: group count ('Found N images per difficulty',
    train/common/dataset.py:161-164)."""
    return df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))


def stats_pack(
    df: DataFrame, value_col: str, keys: Sequence[str] = (), prefix: str | None = None
) -> DataFrame:
    """A2: mean/std/min/max pack per group (train/common/metrics.py:453-462).

    np.std is population sigma (ddof=0) -> stddev_pop, NOT Spark's default
    sample stddev.
    """
    p = prefix or value_col
    v = F.col(value_col)
    aggs = [
        F.avg(v).alias(f"{p}_mean"),
        F.stddev_pop(v).alias(f"{p}_std"),
        F.min(v).alias(f"{p}_min"),
        F.max(v).alias(f"{p}_max"),
    ]
    if keys:
        return df.groupBy(*keys).agg(*aggs)
    return df.agg(*aggs)


def ratio_of_sums_mean(
    df: DataFrame,
    class_col: str,
    num_col: str,
    den_col: str,
    out_col: str = "mean_ratio",
) -> DataFrame:
    """A3 (mIoU shape): per-class sum(num)/sum(den), mean over classes with den>0.

    Reference: per-class intersection/union sums then mean over classes with
    union>0 (train/common/metrics.py:223-248). Two aggregations, both with
    map-side partials; the second input is tiny (one row per class).
    """
    per_class = (
        df.groupBy(class_col)
        .agg(F.sum(num_col).alias("__num"), F.sum(den_col).alias("__den"))
        .filter(F.col("__den") > 0)
    )
    return per_class.agg(F.avg(F.col("__num") / F.col("__den")).alias(out_col))


def frac_below(
    df: DataFrame, value_col: str, threshold: Column | float,
    keys: Sequence[str] = (), out_col: str = "frac",
) -> DataFrame:
    """A4 (PCK shape): fraction of values below a threshold
    (train/common/metrics.py:250-268)."""
    th = F.lit(threshold) if isinstance(threshold, (int, float)) else threshold
    agg = F.avg(
        F.when(F.col(value_col) < th, F.lit(1.0)).otherwise(F.lit(0.0))
    ).alias(out_col)
    if keys:
        return df.groupBy(*keys).agg(agg)
    return df.agg(agg)


def pct_of_total(df: DataFrame, key_col: str, limit: int | None = None) -> DataFrame:
    """A5: per-group percentage of total (train/common/examples.py:200-224).

    The reference limits to the first 1000 samples; pass ``limit`` after an
    explicit orderBy upstream if that semantics is wanted (an unordered limit
    is nondeterministic in a distributed engine).
    """
    if limit is not None:
        df = df.limit(limit)
    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("n"))
    # grand total as a single-row broadcast, NOT an empty-partition window:
    # the window form funnels every group through one task, which breaks at
    # high group cardinality; the broadcast form scales at any cardinality
    total = counts.agg(F.sum("n").alias("__total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .withColumn("pct", F.round(F.col("n") * 100.0 / F.col("__total"), 4))
        .drop("__total")
    )


def weighted_targets(
    counts: DataFrame, weights: DataFrame, stratum_col: str, weight_col: str,
    n_col: str = "n", total_col: str = "total",
) -> DataFrame:
    """A6: per-stratum target counts target = floor(total * weight)
    (train/common/dataset.py:190-195).

    ``weights`` is a tiny config relation -> broadcast; the grand total is a
    single-row cross join.
    """
    total = counts.agg(F.sum(n_col).alias(total_col))
    return (
        counts.crossJoin(F.broadcast(total))
        .join(F.broadcast(weights), stratum_col)
        .withColumn("target", F.floor(F.col(total_col) * F.col(weight_col)))
    )


def mse(df: DataFrame, a: str, b: str, out_col: str = "mse") -> DataFrame:
    """A7: mean squared error between two columns
    (train/train_stage_1/train.py:83)."""
    return df.agg(F.avg(F.pow(F.col(a) - F.col(b), 2)).alias(out_col))


def composed_losses(
    df: DataFrame, real_col: str, fake_col: str, l1_weight: float = 100.0
) -> DataFrame:
    """A8 (GAN loss shape): multi-output composed scalar aggregation.

    D: 0.5*(MSE(real,1)+MSE(fake,0)); G: MSE(fake,1) + w*L1(real,fake)
    (train/train_VTON_GAN/train.py:13-29,194-226; w train/train_VTON_GAN/config.py:37-40).
    One pass, partial-aggregated.
    """
    r, f = F.col(real_col), F.col(fake_col)
    return df.agg(
        (0.5 * (F.avg(F.pow(r - 1.0, 2)) + F.avg(F.pow(f, 2)))).alias("loss_d"),
        (F.avg(F.pow(f - 1.0, 2)) + l1_weight * F.avg(F.abs(r - f))).alias("loss_g"),
    )


def ema(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    value_col: str,
    decay: float = 0.9999,
    out_col: str = "ema",
) -> DataFrame:
    """A9: exponential moving average per key over an ordered stream (batch form).

    s_t = (1-d)*x_t + d*s_{t-1}, s_0 = x_0 (train/train_DIT/utils.py:19-25,
    decay train/train_DIT/config.py:54-55). Sequential state is not
    parallelizable within a key, so: collect the (order, value) pairs per key
    with a single shuffle, sort the array, and fold with the higher-order
    ``aggregate`` — all JVM-side, no Python. Returns one row per key with the
    final EMA. Keys must individually fit in memory (fine: per-run metric
    streams are small even when the table is huge). The streaming form is
    streaming/events.py::ema_stream.
    """
    pairs = F.array_sort(
        F.collect_list(F.struct(F.col(order_col).alias("o"), F.col(value_col).alias("v")))
    )
    folded = F.aggregate(
        pairs,
        F.struct(F.lit(True).alias("first"), F.lit(0.0).alias("s")),
        lambda acc, x: F.struct(
            F.lit(False).alias("first"),
            F.when(acc["first"], x["v"])
            .otherwise(F.lit(1.0 - decay) * x["v"] + F.lit(decay) * acc["s"])
            .alias("s"),
        ),
        lambda acc: acc["s"],
    )
    return df.groupBy(*key_cols).agg(folded.alias(out_col))


def covariance_pack(
    df: DataFrame, x_col: str, y_col: str, keys: Sequence[str] = ()
) -> DataFrame:
    """A10 (FID shape): per-group means + population covariance + correlation
    (train/train_stage_1/metrics.py:13-55 — described there, computed here)."""
    aggs = [
        F.avg(x_col).alias("x_mean"),
        F.avg(y_col).alias("y_mean"),
        F.covar_pop(x_col, y_col).alias("xy_covar"),
        F.corr(x_col, y_col).alias("xy_corr"),
    ]
    if keys:
        return df.groupBy(*keys).agg(*aggs)
    return df.agg(*aggs)


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    k: int = 200,
    out_key: str = "item",
    out_count: str = "cnt",
) -> DataFrame:
    """EXACT heavy hitters via a Misra-Gries sketch pass + k-bounded
    verify: all values of ``key_col`` whose exact count exceeds
    n/(k+1), with exact counts — without ever shuffling the full key
    space. The 100 TB frequent-items path: a plain
    groupBy(key).count() shuffles |distinct keys| rows (tokens of a
    corpus: billions); this shuffles at most k candidate keys plus the
    P*k-row summary merge.

    Pass 1 (one scan, no shuffle): each partition folds its Arrow
    batches into a Misra-Gries summary of k counters — per batch a
    vectorized value_counts merges into the running dict, then the
    summary is pruned back to k entries by subtracting the (k+1)-th
    largest count from all (the batch-level form of the MG decrement;
    Misra & Gries 1982). Summaries are MERGEABLE (Agarwal et al.,
    PODS'12): summing two summaries and re-pruning to k keeps the
    deviation bound |mg(x) - count(x)| <= n/(k+1) for the combined
    stream. The merge itself runs on a <= num_partitions * k row frame
    — broadcast-tiny — with the re-prune done as a rank + subtract.

    Pass 2 (k-bounded): the MG guarantee says every x with
    count(x) > n/(k+1) SURVIVES the sketch, so the candidate set is a
    superset of the heavy set; exact counts are computed only for
    candidates (broadcast hash semi-filter before the groupBy, so the
    agg's shuffle carries <= k distinct keys) and filtered against the
    exact threshold. Output is therefore deterministic and exact even
    though intermediate MG counters are partition-order dependent —
    order only moves WHICH extra sub-threshold candidates appear, and
    those die on the exact filter.

    NULL convention: null keys are ONE key, counted like any other and
    reported (as a null ``out_key``) when they clear the threshold.
    Internally nulls ride as a NUL-byte sentinel so they survive pandas
    ``value_counts`` (which silently drops NaN — dropping them while
    still counting their rows in ``n_total`` would both omit a heavy
    NULL and tighten the threshold for everything else) and match in
    the exact-count equi-join (null == null never matches). A genuine
    key equal to the sentinel would merge with nulls; real keys do not
    contain NUL bytes.

    Returns (out_key, out_count, n_total) rows, one per heavy value.
    """
    import pandas as pd

    sentinel = "\x00<null>"
    src = df.select(
        F.coalesce(F.col(key_col).cast("string"), F.lit(sentinel)).alias(
            "__k"
        )
    )

    def mg_partition(batches):
        counters: dict[str, int] = {}
        for pdf in batches:
            vc = pdf["__k"].value_counts()
            for v, c in vc.items():
                counters[v] = counters.get(v, 0) + int(c)
            if len(counters) > k:
                cut = sorted(counters.values(), reverse=True)[k]
                counters = {
                    v: c - cut for v, c in counters.items() if c > cut
                }
        if counters:
            yield pd.DataFrame(
                {
                    "__k": list(counters),
                    "__c": list(counters.values()),
                }
            )

    summaries = src.mapInPandas(mg_partition, schema="__k string, __c long")
    # candidates = the UNION of summary keys, NOT a re-pruned merge: each
    # partition prune already costs up to n_p/(k+1) deviation, and a
    # global (k+1)-th-largest cut would add up to n/(k+1) more — together
    # 2n/(k+1), enough to lose a just-above-threshold heavy item. The
    # unpruned union keeps the superset guarantee airtight at <= P*k keys
    # (1000 executors * k=200 -> 200k rows: broadcast-trivial).
    merged = summaries.select("__k").distinct()
    tot = src.agg(F.count(F.lit(1)).alias("n_total"))
    exact = (
        src.join(F.broadcast(merged), "__k")
        .groupBy("__k")
        .agg(F.count(F.lit(1)).alias(out_count))
        .crossJoin(F.broadcast(tot))
        .filter(F.col(out_count) * (k + 1) > F.col("n_total"))
    )
    return exact.select(
        F.when(F.col("__k") == sentinel, F.lit(None))
        .otherwise(F.col("__k"))
        .alias(out_key),
        out_count,
        "n_total",
    )


def _cms_bucket(key: F.Column, row_i: int, width: int, seed: int) -> F.Column:
    """Row ``row_i``'s count-min bucket for ``key``: the engine-portable
    md5 prefix (same idiom as ``hash_rank``) mod ``width`` — DuckDB replays
    it as ('0x' || substr(md5(k || '|cms<seed>.<i>'), 1, 8))::BIGINT % w."""
    salted = F.concat(key.cast("string"), F.lit(f"|cms{seed}.{row_i}"))
    return (
        F.conv(F.substring(F.md5(salted), 1, 8), 16, 10).cast("long")
        % F.lit(width)
    ).alias("bucket")


def count_min_sketch(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 64,
    seed: int = 11,
) -> DataFrame:
    """Mergeable count-min sketch (Cormode & Muthukrishnan 2005) over a
    key stream — the bounded-memory frequency summary for key spaces too
    large to count exactly (a 100 TB corpus's token vocabulary).

    One scan: each key instance contributes ``depth`` (row, bucket)
    cells; the groupBy's map-side combine collapses every partition to
    <= depth*width rows before the shuffle, so the exchange carries
    O(partitions * depth * width) rows REGARDLESS of corpus size or
    vocabulary — the property Misra-Gries (``heavy_hitters``) shares and
    a plain groupBy(key) lacks. Sketches over disjoint corpus slices
    merge by cell-wise addition (another groupBy.sum), which is how a
    1000-executor run folds per-shard sketches into one.

    Returns the non-zero cells as (row_i, bucket, c) — depth*width rows
    at most, broadcast-trivial for the estimate join.
    """
    cells = F.array(
        *[
            F.struct(
                F.lit(r).alias("row_i"),
                _cms_bucket(F.col(key_col), r, width, seed),
            )
            for r in range(depth)
        ]
    )
    return (
        df.select(F.explode(cells).alias("rb"))
        .select("rb.row_i", "rb.bucket")
        .groupBy("row_i", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_estimate(
    sketch: DataFrame,
    items: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 64,
    seed: int = 11,
    out_col: str = "est",
) -> DataFrame:
    """Point-query the count-min sketch for each row of ``items``:
    est(x) = min over rows i of cell(i, h_i(x)) — an upper bound on the
    true count (every occurrence of x incremented all of x's cells; other
    keys can only add). The sketch side broadcasts (<= depth*width rows);
    the items side is never shuffled beyond its own grouping.

    Keys the caller KNOWS are present need no missing-cell handling (their
    own count keeps every probed cell non-zero); a left join + coalesce(0)
    still guards the general case where a probed item never occurred.
    """
    probes = items.withColumn(
        "__rb",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row_i"),
                        _cms_bucket(F.col(key_col), r, width, seed),
                    )
                    for r in range(depth)
                ]
            )
        ),
    )
    joined = probes.join(
        F.broadcast(sketch),
        (F.col("__rb.row_i") == sketch["row_i"])
        & (F.col("__rb.bucket") == sketch["bucket"]),
        "left",
    )
    others = [c for c in items.columns]
    return joined.groupBy(*others).agg(
        F.min(F.coalesce(F.col("c"), F.lit(0))).alias(out_col)
    )
