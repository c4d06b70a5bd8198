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


def lit_double_array(values) -> Column:
    """array<double> literal built as ONE parsed SQL string.

    ``F.lit(list)`` converts every element through its own py4j call —
    ~1 ms each, so a 64-dim vector costs ~60 ms of DRIVER time and a
    16x64 codebook over 1 s, rebuilt per kmeans iteration / per plan.
    ``repr(float)`` emits shortest-round-trip text, so the parsed
    doubles are bit-identical to the Literal path (pinned by
    test_codebook_literal_text_roundtrip); non-finite values have no
    SQL literal form and raise here rather than parse wrong."""
    vals = [float(v) for v in values]
    if any(v != v or v in (float("inf"), float("-inf")) for v in vals):
        raise ValueError("lit_double_array: non-finite value")
    return F.expr("array(" + ",".join(repr(v) + "D" for v in vals) + ")")


def lit_int_array(values) -> Column:
    """array<int> literal as one parsed SQL string (see
    ``lit_double_array``)."""
    return F.expr(
        "array(" + ",".join(str(int(v)) for v in values) + ")"
    ).cast("array<int>")


def lit_cell_structs(
    pairs, id_name: str, vec_name: str
) -> Column:
    """array<struct<id_name:int, vec_name:array<double>>> literal (a
    codebook: (cell id, centroid vector) pairs) as one parsed SQL
    string — same py4j-chatter motivation and bit-identity contract as
    ``lit_double_array``."""
    body = ",".join(
        "named_struct('" + id_name + "'," + str(int(cid))
        + ",'" + vec_name + "',array("
        + ",".join(repr(float(x)) + "D" for x in cv) + "))"
        for cid, cv in pairs
    )
    return F.expr("array(" + body + ")")


def dot_product(a: Column | str, b: Column | str,
                dim: int | None = None) -> Column:
    """sum_i a_i*b_i (JVM-side).

    ``dim=None``: zip_with + aggregate — works for any runtime length, but
    materializes the product array per row before folding it.

    ``dim=k`` (the vector length is CONTRACTUAL at the call site — every
    similarity operator takes/knows ``dim``): an index fold
    ``aggregate(sequence(1, dim), 0.0, (acc, i) -> acc +
    element_at(a,i)*element_at(b,i))`` — float-op-for-float-op the SAME
    additions in the SAME order as the zip_with fold, so results are
    bit-identical, with no intermediate product array. Measured on 2M
    64-dim pairs: 0.88 s vs 7.6 s for a fully UNROLLED 64-term codegen
    expression — unrolling backfires because the generated method blows
    past HotSpot's huge-method bytecode limit and runs in the bytecode
    INTERPRETER (guide §1.1 first-principles vs. empirical: the "ideal"
    codegen plan lost to the measured one). Caveat: with ``dim`` set,
    arrays LONGER than dim are silently truncated (shorter ones yield
    NULL either way via out-of-range element_at) — only pass dim where
    the operator contract fixes the length.
    """
    if dim is None:
        return F.aggregate(
            F.zip_with(_c(a), _c(b), lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    a_, b_ = _c(a), _c(b)
    return F.aggregate(
        F.sequence(F.lit(1), F.lit(dim)),
        F.lit(0.0),
        lambda acc, i: acc + F.element_at(a_, i) * F.element_at(b_, i),
    )


def l2_norm(a: Column | str, dim: int | None = None) -> Column:
    """sqrt(sum_i a_i^2); ``dim`` switches to the index fold with the
    identical left-associated float order (see ``dot_product``)."""
    if dim is None:
        return F.sqrt(
            F.aggregate(_c(a), F.lit(0.0), lambda acc, v: acc + v * v)
        )
    a_ = _c(a)
    return F.sqrt(
        F.aggregate(
            F.sequence(F.lit(1), F.lit(dim)),
            F.lit(0.0),
            lambda acc, i: acc
            + F.element_at(a_, i) * F.element_at(a_, i),
        )
    )


def cosine_similarity(a: Column | str, b: Column | str,
                      dim: int | None = None) -> Column:
    """dot(a,b) / (|a||b|); 0.0 when either norm is zero (no NaN propagation).

    ``dim`` switches all three folds to the unrolled codegen form
    (bit-identical results; see ``dot_product``)."""
    num = dot_product(a, b, dim)
    denom = l2_norm(a, dim) * l2_norm(b, dim)
    return F.when(denom == 0.0, F.lit(0.0)).otherwise(num / denom)


def cosine_prenorm(num: Column, na: Column, nb: Column) -> Column:
    """Cosine from a precomputed dot and the two precomputed l2 norms —
    for pair loops where the norms are per-ROW values needlessly
    recomputed per PAIR by ``cosine_similarity`` (guide §2.3: do less
    work per pair). ``l2_norm(a)*l2_norm(b)`` evaluated per pair and
    ``na*nb`` from per-row columns are the same two doubles multiplied
    in the same order — bit-identical."""
    denom = na * nb
    return F.when(denom == 0.0, F.lit(0.0)).otherwise(num / denom)


def l2_distance(a: Column | str, b: Column | str,
                dim: int | None = None) -> Column:
    """Euclidean distance ||a-b||_2 (JVM-side) — the reference's keypoint
    distance (train/common/metrics.py:262-266). ``dim`` switches to the
    index fold with the identical float order (see ``dot_product``)."""
    if dim is None:
        return F.sqrt(
            F.aggregate(
                F.zip_with(_c(a), _c(b), lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
        )
    a_, b_ = _c(a), _c(b)

    def _step(acc: Column, i: Column) -> Column:
        d = F.element_at(a_, i) - F.element_at(b_, i)
        return acc + d * d

    return F.sqrt(F.aggregate(F.sequence(F.lit(1), F.lit(dim)),
                              F.lit(0.0), _step))


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
