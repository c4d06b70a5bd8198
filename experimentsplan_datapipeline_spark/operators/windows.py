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
