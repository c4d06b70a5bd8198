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
