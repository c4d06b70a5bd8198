"""Pivot / report operators (SURVEY.md §2.3 J8, §2.10).

Reference: merge per-benchmark metric dicts into {model: {benchmark: ...}}
(train/bash_scripts/metrics_all_benchmarks.sh:66-109) and the cross-model
comparison table (train/evaluate_all_models.py:106-116).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pivot_table(
    df: DataFrame,
    row_key: str,
    pivot_col: str,
    value_col: str,
    pivot_values: Sequence[str] | None = None,
    agg: str = "avg",
) -> DataFrame:
    """groupBy(row).pivot(col).agg(value) with an explicit value list.

    Passing ``pivot_values`` skips Spark's extra distinct-values collection
    job — at 100 TB that job is a full shuffle you don't want for a known
    enum. Output columns are named ``{pivot_value}``.
    """
    agg_fn = {"avg": F.avg, "sum": F.sum, "first": lambda c: F.first(c, True)}[agg]
    g = df.groupBy(row_key)
    p = g.pivot(pivot_col, list(pivot_values)) if pivot_values else g.pivot(pivot_col)
    return p.agg(agg_fn(F.col(value_col)))
