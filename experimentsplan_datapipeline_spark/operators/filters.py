"""Filter / projection operators (SURVEY.md §2.2, F1-F8).

Reference semantics re-expressed declaratively so Catalyst pushes them into
the scan (check .explain for PushedFilters). file:line cites /root/reference.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def filter_suffix(df: DataFrame, col: str, suffixes: Sequence[str]) -> DataFrame:
    """Keep rows whose ``col`` ends with any suffix.

    F1: extension predicate ``.png/.jpg/.jpeg`` (train/common/dataset.py:130)
    and checkpoint ``.pt|.pth`` filter (train/common/checkpoint_utils.py:37).
    Uses endswith disjunction (sargable) rather than a regex so the predicate
    can push into the parquet scan.
    """
    pred: Column | None = None
    for s in suffixes:
        p = F.col(col).endswith(s)
        pred = p if pred is None else (pred | p)
    return df.filter(pred)


def classify_by_substring(
    df: DataFrame,
    col: str,
    mapping: Sequence[tuple[str, str]],
    default: str,
    out_col: str = "class",
) -> DataFrame:
    """F2: CASE-classify rows by substring tests, with an explicit default.

    Reference: difficulty from path — '/easy/' -> easy, '/medium/' -> medium,
    '/hard/' -> hard, else default 'easy' with a warning
    (train/common/dataset.py:166-178). The silent default becomes an explicit
    ``otherwise``; callers who need the warning count can filter on it.
    """
    expr: Column | None = None
    src = F.lower(F.col(col))
    for needle, label in mapping:
        cond = src.contains(needle.lower())
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    expr = expr.otherwise(default) if expr is not None else F.lit(default)
    return df.withColumn(out_col, expr)


def having_count(
    df: DataFrame, key_cols: Sequence[str], required: int, count_col: str = "n"
) -> DataFrame:
    """F3: keep groups with exactly ``required`` members (completeness filter).

    Reference: keep stems having all 3 image types, drop+warn the rest
    (train/common/dataset.py:143-159). Expressed as groupBy/HAVING so the
    partial aggregation happens map-side before the shuffle.
    """
    return (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias(count_col))
        .filter(F.col(count_col) == required)
    )


def drop_incomplete(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """F4: drop rows with nulls in required columns.

    Reference: collate_fn filters None rows from failed loads
    (train/train_CATVTON/dataloader.py:121-128).
    """
    return df.na.drop(subset=list(cols))


def project_rename(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """F6: select+alias a subset of columns ({src: dst}).

    Reference: batch-key adapters, initial_image -> person_img etc.
    (train/train_CATVTON/train.py:147-148, train/DATALOADER_MAPPING.md:349-360).
    """
    return df.select(*[F.col(src).alias(dst) for src, dst in mapping.items()])


def coalesce_cols(df: DataFrame, out_col: str, *candidates: str) -> DataFrame:
    """F7: first-non-null key resolution across candidate columns.

    Reference: ``batch['person'] if present elif batch['initial_image']``
    (train/train_VTON_GAN/train.py:161-191).
    """
    return df.withColumn(out_col, F.coalesce(*[F.col(c) for c in candidates]))


def expectation_report(
    df: DataFrame, checks: dict[str, Column]
) -> DataFrame:
    """Declarative data-quality expectations: one output row per named rule
    with its violation count and pass verdict (the dbt-test / Delta
    CHECK-constraint shape; the engine's generalization of the reference's
    guard asserts, checkpoints/upload.py:16-18 and NaN guards
    train/train_stage_1/test.py:62-99).

    ``checks`` maps rule name -> violation predicate (true = row violates).
    All rules evaluate in ONE pass over the data: each predicate becomes a
    conditional count in a single global aggregate (map-side combinable, no
    per-rule scans), then unpivots to the (rule, n_violations, passed)
    report. At 100 TB the cost is one scan regardless of rule count.
    """
    aggs = [
        F.count(F.when(cond, 1)).alias(name) for name, cond in checks.items()
    ]
    wide = df.agg(*aggs)
    names = list(checks)
    stacked = wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("rule"),
                        F.col(name).alias("n_violations"),
                    )
                    for name in names
                ]
            )
        ).alias("r")
    )
    return stacked.select(
        "r.rule",
        "r.n_violations",
        (F.col("r.n_violations") == 0).alias("passed"),
    )
