"""Dense-vector scalar functions over array<float> embedding columns.

Built on higher-order functions (F.aggregate / F.zip_with) so the math runs
JVM-side inside whole-stage codegen — no Python boundary for the similarity
hot path. The Pandas-UDF variants (for very wide vectors where a BLAS dot
wins) live in operators/similarity.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot_product(a: Column | str, b: Column | str) -> Column:
    """sum_i a_i*b_i via zip_with + aggregate (JVM-side)."""
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(_c(a), F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """dot(a,b) / (|a||b|); 0.0 when either norm is zero (no NaN propagation)."""
    num = dot_product(a, b)
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom == 0.0, F.lit(0.0)).otherwise(num / denom)


def l2_distance(a: Column | str, b: Column | str) -> Column:
    """Euclidean distance ||a-b||_2 (JVM-side) — the reference's keypoint
    distance (train/common/metrics.py:262-266)."""
    return F.sqrt(
        F.aggregate(
            F.zip_with(_c(a), _c(b), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def ssim_global(a: Column | str, b: Column | str,
                c1: float = 6.5025, c2: float = 58.5225) -> Column:
    """Global (single-window) SSIM between two equal-length pixel arrays on
    the 0-255 scale — the closed-form P7 metric the reference computes per
    image pair (train/common/metrics.py:123-170); the windowed variant runs
    the same formula per crop. Population statistics, pure higher-order
    expressions (codegen, no Python boundary).

    EXPRESSION-MULTIPLICITY CAVEAT: this composes everything into ONE
    Column, so each aggregate() is textually duplicated wherever the
    formula reuses it (mx appears ~7 times) — and interpreted
    higher-order expressions get no common-subexpression elimination
    (the round-8 §4g finding). Fine for one-off scalars; on a hot path
    use ``ssim_global_staged``, which materializes each aggregate once
    through staged projections (tests/test_plans.py lints the registry
    for exactly this shape).
    """
    x, y = _c(a), _c(b)
    n = F.size(x).cast("double")
    sx = F.aggregate(x, F.lit(0.0), lambda acc, v: acc + v)
    sy = F.aggregate(y, F.lit(0.0), lambda acc, v: acc + v)
    sxx = F.aggregate(x, F.lit(0.0), lambda acc, v: acc + v * v)
    syy = F.aggregate(y, F.lit(0.0), lambda acc, v: acc + v * v)
    sxy = F.aggregate(
        F.zip_with(x, y, lambda u, v: u * v), F.lit(0.0), lambda acc, v: acc + v
    )
    mx, my = sx / n, sy / n
    vx = sxx / n - mx * mx
    vy = syy / n - my * my
    cov = sxy / n - mx * my
    return ((2 * mx * my + c1) * (2 * cov + c2)) / (
        (mx * mx + my * my + c1) * (vx + vy + c2)
    )


def ssim_global_staged(
    df, a: str, b: str, out_col: str = "ssim",
    c1: float = 6.5025, c2: float = 58.5225,
):
    """``ssim_global`` with each array aggregate computed EXACTLY ONCE:
    a staged projection materializes the five sums (sx, sy, sxx, syy,
    sxy) as scalar columns, then the SSIM formula runs over cheap double
    arithmetic. CollapseProject keeps the stages apart because the
    aggregates are non-cheap aliases referenced more than once — so the
    plan carries one copy of each, not one per formula mention (6x on
    the unstaged form). Identical math, identical results.

    Takes/returns a DataFrame (column names, not Columns): staging needs
    projection boundaries, which a single Column cannot express.
    """
    x, y = F.col(a), F.col(b)
    stats = df.withColumns({
        "__n": F.size(x).cast("double"),
        "__sx": F.aggregate(x, F.lit(0.0), lambda acc, v: acc + v),
        "__sy": F.aggregate(y, F.lit(0.0), lambda acc, v: acc + v),
        "__sxx": F.aggregate(x, F.lit(0.0), lambda acc, v: acc + v * v),
        "__syy": F.aggregate(y, F.lit(0.0), lambda acc, v: acc + v * v),
        "__sxy": F.aggregate(
            F.zip_with(x, y, lambda u, v: u * v),
            F.lit(0.0), lambda acc, v: acc + v,
        ),
    })
    n = F.col("__n")
    mx, my = F.col("__sx") / n, F.col("__sy") / n
    vx = F.col("__sxx") / n - mx * mx
    vy = F.col("__syy") / n - my * my
    cov = F.col("__sxy") / n - mx * my
    ssim = ((2 * mx * my + c1) * (2 * cov + c2)) / (
        (mx * mx + my * my + c1) * (vx + vy + c2)
    )
    return stats.withColumn(out_col, ssim).drop(
        "__n", "__sx", "__sy", "__sxx", "__syy", "__sxy",
    )
