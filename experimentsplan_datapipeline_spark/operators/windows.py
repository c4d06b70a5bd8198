"""Window / top-k / sort / limit operators (SURVEY.md §2.5, W1-W8).

Top-1-per-group uses max_by (single aggregation, map-side partials) where a
single winner is needed, and row_number windows where the full ranked row is
needed. At scale max_by beats the window: no sort, no per-partition
materialization. file:line cites /root/reference.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from experimentsplan_datapipeline_spark.functions.strings import extract_step


def latest_by(
    df: DataFrame, key_cols: Sequence[str], ts_col: str, payload_col: str,
    out_col: str = "latest",
) -> DataFrame:
    """W1: latest artifact per key = max_by(payload, ts).

    Reference: latest checkpoint by LastModified
    (train/common/checkpoint_utils.py:34-51).
    """
    return df.groupBy(*key_cols).agg(
        F.max_by(F.col(payload_col), F.col(ts_col)).alias(out_col),
        F.max(ts_col).alias(f"{ts_col}_max"),
    )


def latest_by_step(
    df: DataFrame, key_cols: Sequence[str], path_col: str,
    pattern: str = r"checkpoint-step-(\d+)", out_col: str = "latest",
) -> DataFrame:
    """W2: top-1 by regex-extracted step number
    (train/train_stage_1/utils.py:41-51)."""
    step = extract_step(path_col, pattern)
    return df.groupBy(*key_cols).agg(
        F.max_by(F.col(path_col), step).alias(out_col),
        F.max(step).alias("step"),
    )


def first_per_key(
    df: DataFrame, key_cols: Sequence[str], order_by: Sequence[Column]
) -> DataFrame:
    """W5: deterministic first row per key (cloth_files[0] after sort,
    train/common/metrics.py:312). Full-row winner -> row_number window."""
    w = Window.partitionBy(*key_cols).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def top_k_per_key(
    df: DataFrame, key_cols: Sequence[str], order_by: Sequence[Column], k: int
) -> DataFrame:
    """Ranked top-k per key. AQE + rank pushdown keep the per-partition sort
    bounded at k."""
    w = Window.partitionBy(*key_cols).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def top_k_per_key_two_phase(
    df: DataFrame,
    key_cols: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    bucket_cols: Sequence[str],
    n_buckets: int = 32,
) -> DataFrame:
    """Ranked top-k when there are FEW keys with HUGE groups (the shape a
    plain window can't survive: partitionBy(query_id) over a 100 TB corpus
    funnels each key through one task).

    Phase 1 ranks within (key, hash-bucket-of-row-identity) — n_buckets-way
    parallel per key — and keeps <= k rows per bucket. Phase 2 ranks the
    <= k*n_buckets survivors per key, which is driver-trivial. Any row in
    the true top-k is in the top-k of its own bucket, so the result is
    exactly the single-window answer; ``order_by`` must be deterministic
    (rounded value + tiebreak) for that equivalence to be engine-stable.
    """
    bucket = F.pmod(
        F.xxhash64(*[F.col(c) for c in bucket_cols]), F.lit(n_buckets)
    )
    w1 = Window.partitionBy(*[F.col(c) for c in key_cols], bucket).orderBy(
        *order_by
    )
    survivors = (
        df.withColumn("__rn", F.row_number().over(w1))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
    w2 = Window.partitionBy(*key_cols).orderBy(*order_by)
    return (
        survivors.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
    )


def priority_fallback(
    sources: Sequence[tuple[DataFrame, int]], key_cols: Sequence[str],
    ts_col: str, tiebreak: Sequence[Column] = (),
) -> DataFrame:
    """W6: resolve one row per key from prioritized sources (S3 latest else
    local latest else none, train/common/checkpoint_utils.py:86-113).

    Union the candidate sources with a priority literal, then pick
    row_number()=1 ordered by (priority asc, ts desc).
    """
    tagged = None
    for df, prio in sources:
        t = df.withColumn("__prio", F.lit(prio))
        tagged = t if tagged is None else tagged.unionByName(t)
    assert tagged is not None, "at least one source required"
    w = Window.partitionBy(*key_cols).orderBy(
        F.col("__prio").asc(), F.col(ts_col).desc(), *tiebreak
    )
    return (
        tagged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__prio")
    )


def ordered_limit(df: DataFrame, order_by: Sequence[Column], n: int) -> DataFrame:
    """W7: deterministic head-n (first-1000 sampling,
    train/common/examples.py:216). Spark turns orderBy+limit into a
    TakeOrderedAndProject — no global sort materialization."""
    return df.orderBy(*order_by).limit(n)


def trailing_stats_halo(
    df: DataFrame,
    group_col: str,
    ts_col: str,
    tiebreak_col: str,
    value_col: str,
    n_preceding: int = 20,
    bucket: str = "DAY",
) -> DataFrame:
    """Trailing-N-row mean/stddev per group WITHOUT a single-task-per-group
    window: rows bucket by time, each bucket's last N rows also ride along
    into the NEXT non-empty bucket as non-emitting "halo" rows, and the
    frame window runs per (group, bucket) — parallel across buckets, output
    identical to the global per-group window (every row's N preceding rows
    are either in its own bucket or in the halo; the successor lookup runs
    over the DISTINCT bucket table, so empty calendar gaps cannot strand a
    halo). Adds columns __mu/__sd (trailing stats over rows
    [-n_preceding, -1]).

    A short bucket cannot strand the frame: a row halos into EVERY later
    bucket whose start lies within N cumulative rows of it (bucket-pair gap
    table over per-bucket counts — tiny), so the frame is complete even when
    several consecutive buckets hold fewer than N rows together.

    The unbounded form of this trade-off is ``normalize_by_group`` (plain
    aggregate + broadcast join); this is the order-sensitive variant the
    reference's step-stream monitoring needs (train/train_stage_1/
    train.py:89-119 logs per-step metrics that dashboards z-score).
    """
    b = F.date_trunc(bucket, F.col(ts_col))
    base = df.withColumn("__b", b)
    # per-(group, bucket) row counts — tiny (groups x non-empty buckets)
    counts = base.groupBy(group_col, "__b").agg(F.count(F.lit(1)).alias("__c"))
    wb = (
        Window.partitionBy(group_col)
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = counts.withColumn("__cum", F.sum("__c").over(wb))
    # bucket pairs (i -> j, j later) whose inter-bucket gap < N: a row in
    # the tail of bucket i can appear in the frame of rows in bucket j iff
    # (rows after it in i) + (rows in buckets strictly between) < N
    ci = cum.select(
        F.col(group_col), F.col("__b").alias("__bi"), F.col("__cum").alias("__cum_i")
    )
    cj = cum.select(
        F.col(group_col), F.col("__b").alias("__bj"), F.col("__c").alias("__cj"),
        F.col("__cum").alias("__cum_j"),
    )
    pairs = ci.join(cj, group_col).filter(
        (F.col("__bj") > F.col("__bi"))
        & ((F.col("__cum_j") - F.col("__cj")) - F.col("__cum_i") < n_preceding)
    ).select(group_col, "__bi", "__bj",
             ((F.col("__cum_j") - F.col("__cj")) - F.col("__cum_i")).alias("__gap"))
    # tail rows of each bucket (only the last N can ever reach a later frame)
    wd = Window.partitionBy(group_col, "__b").orderBy(
        F.col(ts_col).desc(), F.col(tiebreak_col).desc()
    )
    tails = (
        base.withColumn("__rnd", F.row_number().over(wd))
        .filter(F.col("__rnd") <= n_preceding)
    )
    halo = (
        tails.withColumnRenamed("__b", "__bi")
        .join(F.broadcast(pairs), [group_col, "__bi"])
        .filter(F.col("__rnd") - 1 + F.col("__gap") < n_preceding)
        .withColumn("__b", F.col("__bj"))
        .drop("__bi", "__bj", "__gap", "__rnd")
        .withColumn("__emit", F.lit(False))
    )
    unioned = base.withColumn("__emit", F.lit(True)).unionByName(halo)
    wf = (
        Window.partitionBy(group_col, "__b")
        .orderBy(ts_col, tiebreak_col)
        .rowsBetween(-n_preceding, -1)
    )
    return (
        unioned.withColumn("__mu", F.avg(value_col).over(wf))
        .withColumn("__sd", F.stddev(value_col).over(wf))
        .filter(F.col("__emit"))
        .drop("__emit", "__b")
    )


def grouped_prefix_sum(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[str],
    val_col: str,
    out_col: str = "cumsum",
    partitions: int | None = None,
) -> DataFrame:
    """Running sum per group WITHOUT a one-task-per-group window.

    A plain ``sum() OVER (PARTITION BY group ORDER BY ...)`` funnels each
    group through a single task — fatal when groups are few and huge (an
    event_type over a 100 TB stream). Distributed form: range-partition on
    (group, order) so each group's rows are contiguous across ordered
    partitions, run the cumulative sum locally per (group, physical
    partition), then add per-(group, partition) offsets — the prefix sums
    of earlier partitions' totals, a table of at most
    |groups| x partitions rows that broadcasts.

    Identical result set to the single-window form up to floating-point
    association (offset + local vs strictly sequential adds) — equal when
    rounded, like every cross-engine float in this repo.
    """
    if partitions is None:
        partitions = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        )
    gcols = [F.col(c) for c in group_cols]
    ocols = [F.col(c) for c in order_cols]
    # localCheckpoint PINS one materialized partitioning: RangePartitioner
    # boundaries come from order-dependent reservoir sampling and
    # spark_partition_id is nondeterministic, and this frame feeds THREE
    # consumers (local cumsum, totals, final join) — recomputed
    # independently, a task retry could assign __pid differently per branch
    # and corrupt the running totals. Checkpoint cost is one
    # memory-and-disk materialization of the ranged frame.
    ranged = (
        df.repartitionByRange(partitions, *gcols, *ocols)
        .sortWithinPartitions(*group_cols, *order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    w_local = Window.partitionBy("__pid", *group_cols).orderBy(*ocols).rowsBetween(
        Window.unboundedPreceding, 0
    )
    local = ranged.withColumn("__lcum", F.sum(val_col).over(w_local))
    totals = local.groupBy("__pid", *group_cols).agg(
        F.sum(val_col).alias("__tot")
    )
    w_off = (
        Window.partitionBy(*group_cols)
        .orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.withColumn(
        "__off", F.coalesce(F.sum("__tot").over(w_off), F.lit(0.0))
    ).select("__pid", *group_cols, "__off")
    return (
        local.join(F.broadcast(offsets), ["__pid", *group_cols])
        .withColumn(out_col, F.col("__lcum") + F.col("__off"))
        .drop("__pid", "__lcum", "__off")
    )


def pareto_frontier_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    partitions: int | None = None,
) -> DataFrame:
    """EXACT 2-D pareto frontier (skyline): rows not dominated under
    (minimize ``x_col``, maximize ``y_col``). Row r is dominated iff some
    s has s.x <= r.x and s.y >= r.y with at least one strict — the
    classic "cheapest for its quality" cut (price/size, latency/recall,
    cost/coverage). Other orientations: negate the column(s) first.

    The naive definition is an all-pairs NOT EXISTS; the classic
    single-node algorithm is sort-by-x + running-max-of-y. Neither shape
    survives 100 TB directly (a global ORDER BY window funnels everything
    through one task), so this runs the running max in the same two-phase
    form as grouped_prefix_sum:

    1. collapse to one row per distinct x (only the max-y row per x can
       be on the frontier — same x, higher y dominates). One map-side
       combinable groupBy; everything after runs at |distinct x| scale.
    2. range-partition by x, per-partition EXCLUSIVE running max of y,
       plus a <= #partitions-row offsets table (max of earlier
       partitions) that broadcasts: x survives iff its y is strictly
       above the combined exclusive max (greatest() skips nulls, so the
       global minimum x — null exclusive max — always survives).
    3. join the frontier (x, y) pairs — output-sized, broadcast — back to
       the input so duplicate rows sharing a frontier point all survive
       (neither strictly beats the other; matches the NOT EXISTS
       definition).

    Rows with null x or y are excluded up front: SQL three-valued NOT
    EXISTS would vacuously keep them, which is never the analytic intent.

    The ranged frame is localCheckpoint-pinned for the same reason as
    grouped_prefix_sum: RangePartitioner sampling and spark_partition_id
    are nondeterministic, and the frame feeds both the local window and
    the totals — an inconsistent retry would corrupt the offsets.
    """
    if partitions is None:
        partitions = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        )
    clean = df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
    per_x = clean.groupBy(x_col).agg(F.max(y_col).alias("__ymax"))
    ranged = (
        per_x.repartitionByRange(partitions, F.col(x_col))
        .sortWithinPartitions(x_col)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    w_local = (
        Window.partitionBy("__pid")
        .orderBy(x_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = ranged.withColumn("__lmax", F.max("__ymax").over(w_local))
    w_off = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, -1
    )  # <= #partitions rows: the single-task window is a constant-size frame
    offsets = (
        local.groupBy("__pid")
        .agg(F.max("__ymax").alias("__pmax"))
        .withColumn("__off", F.max("__pmax").over(w_off))
        .select("__pid", "__off")
    )
    frontier = (
        local.join(F.broadcast(offsets), "__pid")
        .filter(
            F.greatest("__lmax", "__off").isNull()
            | (F.col("__ymax") > F.greatest("__lmax", "__off"))
        )
        # fresh aliases: frontier shares lineage with clean, and a join
        # condition naming the original columns would be ambiguous
        .select(F.col(x_col).alias("__fx"), F.col("__ymax").alias("__fy"))
    )
    return clean.join(
        F.broadcast(frontier),
        (F.col(x_col) == F.col("__fx")) & (F.col(y_col) == F.col("__fy")),
    ).select(*clean.columns)
