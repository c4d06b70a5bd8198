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
