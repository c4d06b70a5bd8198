"""Unit tests for the scalar function library (strings / text / vectors)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from experimentsplan_datapipeline_spark.functions import (
    basename,
    composite_key,
    cosine_similarity,
    doc_fingerprint,
    dot_product,
    extract_step,
    first_token,
    language_id,
    parse_s3_uri,
    stem_from_name,
    token_count,
)
from experimentsplan_datapipeline_spark.functions.strings import image_type_from_name
from experimentsplan_datapipeline_spark.functions.text import ngrams


def test_stem_extraction(spark):
    rows = [
        ("s3://b/d/easy/f/initial_image/00042_person.png", "00042", "initial_image"),
        ("s3://b/d/easy/f/cloth_image/00042_cloth_front.png", "00042", "cloth_image"),
        ("s3://b/d/easy/f/try_on_image/00042_vton.png", "00042", "try_on_image"),
        ("s3://b/d/readme.txt", "readme", None),
    ]
    df = spark.createDataFrame([(r[0],) for r in rows], ["path"])
    got = df.select(
        stem_from_name(basename("path")).alias("stem"),
        image_type_from_name(basename("path")).alias("itype"),
    ).collect()
    for (path, stem, itype), row in zip(rows, got):
        assert row.stem == stem, path
        assert row.itype == itype, path


def test_s3_uri_parse(spark):
    df = spark.createDataFrame([("s3://bkt/a/b/c.png",)], ["uri"])
    row = df.select(parse_s3_uri("uri").alias("p")).collect()[0]
    assert row.p.bucket == "bkt"
    assert row.p.key == "a/b/c.png"


def test_step_and_tokens(spark):
    df = spark.createDataFrame(
        [("checkpoints/m/checkpoint-step-12000.pt", "00123_x_y")], ["p", "n"]
    )
    row = df.select(
        extract_step("p").alias("step"), first_token("n").alias("tok")
    ).collect()[0]
    assert row.step == 12000
    assert row.tok == "00123"


def test_composite_key(spark):
    df = spark.createDataFrame([("p1", "g2")], ["a", "b"])
    assert df.select(composite_key("a", "b").alias("k")).collect()[0].k == "p1_g2"


def test_token_count_and_fingerprint(spark):
    df = spark.createDataFrame(
        [("the cat  sat",), ("",), ("   ",), ("one",)], ["text"]
    )
    got = [r.n for r in df.select(token_count("text").alias("n")).collect()]
    assert got == [3, 0, 0, 1]
    fps = df.select(doc_fingerprint("text").alias("f")).collect()
    assert fps[1].f == fps[2].f  # whitespace-normalized empties agree


def test_language_id(spark):
    df = spark.createDataFrame(
        [
            ("the cat and the dog of it",),
            ("der hund und die katze",),
            ("xyz qrs",),
        ],
        ["text"],
    )
    got = [r.lang for r in df.select(language_id("text").alias("lang")).collect()]
    assert got == ["en", "de", "und"]


def test_ngrams(spark):
    df = spark.createDataFrame([("a b c d",), ("a",)], ["text"])
    got = [r.g for r in df.select(ngrams("text", 3).alias("g")).collect()]
    assert got[0] == ["a b c", "b c d"]
    assert got[1] == []


def test_vector_math(spark):
    df = spark.createDataFrame([([1.0, 2.0], [2.0, 3.0])], ["a", "b"])
    row = df.select(
        dot_product("a", "b").alias("dot"),
        cosine_similarity("a", "b").alias("cos"),
    ).collect()[0]
    assert row.dot == 8.0
    expected = 8.0 / (math.sqrt(5) * math.sqrt(13))
    assert abs(row.cos - expected) < 1e-12

    zero = spark.createDataFrame([([0.0, 0.0], [1.0, 1.0])], ["a", "b"])
    assert zero.select(cosine_similarity("a", "b").alias("c")).collect()[0].c == 0.0


def test_vector_math_unrolled_bit_identical(spark):
    """The dim=k index-fold forms (r14 optimization; originally
    unrolled, re-measured and switched to sequence+element_at folds)
    must be BIT-IDENTICAL to the higher-order-function fold — same
    additions in the same left-associated order — on irregular random
    vectors, including zero vectors (the cosine 0-denominator guard)
    and negative components. Exact ==, not approx: any float deviation
    means the dim form changed the fold order."""
    import random

    from experimentsplan_datapipeline_spark.functions.vectors import (
        cosine_prenorm,
        l2_distance,
        l2_norm,
    )

    rng = random.Random(4242)
    dim = 17  # prime-ish, not a SIMD-friendly length
    rows = [
        (
            [rng.uniform(-5, 5) for _ in range(dim)],
            [rng.uniform(-5, 5) for _ in range(dim)],
        )
        for _ in range(50)
    ] + [([0.0] * dim, [1.0] * dim)]
    df = spark.createDataFrame(rows, ["a", "b"])
    out = df.select(
        (dot_product("a", "b") == dot_product("a", "b", dim)).alias("d_eq"),
        (l2_norm("a") == l2_norm("a", dim)).alias("n_eq"),
        (l2_distance("a", "b") == l2_distance("a", "b", dim)).alias("l_eq"),
        (
            cosine_similarity("a", "b")
            == cosine_similarity("a", "b", dim)
        ).alias("c_eq"),
        (
            cosine_similarity("a", "b")
            == cosine_prenorm(
                dot_product("a", "b", dim), l2_norm("a", dim), l2_norm("b", dim)
            )
        ).alias("p_eq"),
    ).collect()
    for r in out:
        assert r.d_eq and r.n_eq and r.l_eq and r.c_eq and r.p_eq


def test_ssim_identical_is_one(spark):
    from experimentsplan_datapipeline_spark.functions.vectors import ssim_global
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [([10.0, 50.0, 200.0, 30.0],)], ["x"]
    )
    out = df.select(F.round(ssim_global("x", "x"), 6).alias("s")).collect()[0]
    assert out.s == 1.0


def test_ssim_staged_matches_unstaged(spark):
    """ssim_global_staged is a plan-shape rewrite of ssim_global — the
    values must agree to double rounding on asymmetric random-ish pairs
    (including the degenerate constant array)."""
    import random

    from pyspark.sql import functions as F

    from experimentsplan_datapipeline_spark.functions.vectors import (
        ssim_global,
        ssim_global_staged,
    )

    rng = random.Random(9)
    rows = [
        (i, [float(rng.randrange(256)) for _ in range(32)],
         [float(rng.randrange(256)) for _ in range(32)])
        for i in range(20)
    ] + [(99, [7.0] * 32, [7.0] * 32)]
    df = spark.createDataFrame(rows, ["id", "x", "y"])
    unstaged = {
        r["id"]: r["s"]
        for r in df.select(
            "id", F.round(ssim_global("x", "y"), 9).alias("s")
        ).collect()
    }
    staged = {
        r["id"]: r["s"]
        for r in ssim_global_staged(df, "x", "y")
        .select("id", F.round("ssim", 9).alias("s"))
        .collect()
    }
    assert staged == unstaged


def test_l2_distance(spark):
    from experimentsplan_datapipeline_spark.functions.vectors import l2_distance
    from pyspark.sql import functions as F

    df = spark.createDataFrame([([0.0, 3.0], [4.0, 0.0])], ["a", "b"])
    out = df.select(F.round(l2_distance("a", "b"), 6).alias("d")).collect()[0]
    assert out.d == 5.0


def test_codebook_literal_text_roundtrip(spark):
    """lit_double_array / lit_int_array / lit_cell_structs build their
    literals from repr() text parsed JVM-side (the py4j-chatter fix,
    r14). repr is shortest-round-trip, so the parsed doubles must be
    BIT-identical to the F.lit element path — checked with exact ==
    on adversarial values (subnormal-ish, -0.0, scientific notation,
    17-significant-digit)."""
    import pytest
    from pyspark.sql import functions as F

    from experimentsplan_datapipeline_spark.functions.vectors import (
        lit_cell_structs,
        lit_double_array,
        lit_int_array,
    )

    vals = [
        1e-07, -0.0, 123456.654321, 3.0000000000000004,
        1.1754943508222875e-38, -2.225073858507e-308, 0.1 + 0.2,
    ]
    df = spark.range(1).select(
        (lit_double_array(vals) == F.array(*[F.lit(v) for v in vals])
         ).alias("d_eq"),
        (lit_int_array([3, -7, 2**31 - 1])
         == F.array(*[F.lit(v) for v in [3, -7, 2**31 - 1]])
         ).alias("i_eq"),
    )
    r = df.collect()[0]
    assert r.d_eq and r.i_eq
    pairs = [(4, vals), (9, list(reversed(vals)))]
    legacy = F.array(*[
        F.struct(
            F.lit(int(cid)).alias("cell"),
            F.array(*[F.lit(float(x)) for x in cv]).alias("cvec"),
        )
        for cid, cv in pairs
    ])
    r2 = spark.range(1).select(
        (lit_cell_structs(pairs, "cell", "cvec") == legacy).alias("eq")
    ).collect()[0]
    assert r2.eq
    with pytest.raises(ValueError):
        lit_double_array([1.0, float("nan")])


def test_assign_expr_matches_legacy_k_branch(spark):
    """_assign_expr / _assign_topn_expr were rewritten from a k-branch
    F.array(struct per centroid) to one zip_with over two codebook
    literals (r14). Same rounded distances, same (d, cid) tie-break —
    pinned by exact equality against the legacy construction on random
    vectors including exact-tie duplicates."""
    import random

    from pyspark.sql import functions as F

    from experimentsplan_datapipeline_spark.operators.similarity import (
        _assign_expr,
        _assign_topn_expr,
        _sq_dist,
    )

    rng = random.Random(77)
    dim = 7
    cents = [
        (cid, [round(rng.uniform(-2, 2), 6) for _ in range(dim)])
        for cid in (3, 11, 5, 8)
    ]
    # duplicate centroid under a different cid: an exact distance tie,
    # must break to the smaller cid in both constructions
    cents.append((1, list(cents[0][1])))
    rows = [([rng.uniform(-2, 2) for _ in range(dim)],) for _ in range(40)]
    rows += [(list(cents[2][1]),)]  # lands exactly on a centroid
    df = spark.createDataFrame(rows, ["v"])

    def legacy_scored(vec):
        return F.array(*[
            F.struct(
                F.round(_sq_dist(vec, F.lit([float(x) for x in c])), 6
                        ).alias("d"),
                F.lit(int(cid)).alias("cid"),
            )
            for cid, c in cents
        ])

    out = df.select(
        (_assign_expr(F.col("v"), cents)
         == F.array_min(legacy_scored(F.col("v")))["cid"]).alias("a_eq"),
        (_assign_topn_expr(F.col("v"), cents, 3)
         == F.transform(
             F.slice(F.array_sort(legacy_scored(F.col("v"))), 1, 3),
             lambda s: s["cid"],
         )).alias("t_eq"),
    ).collect()
    assert all(r.a_eq and r.t_eq for r in out)
