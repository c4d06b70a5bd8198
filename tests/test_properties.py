"""Property-based tests (hypothesis) for the engine's determinism contracts.

Spark round-trips are expensive, so each property runs a handful of
generated examples — the point is randomized coverage of the CONTRACT
(seed-determinism, order-insensitivity, brute-force equivalence), not volume.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SLOW = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 999), st.sampled_from(["a", "b", "c"])),
        min_size=5,
        max_size=40,
        unique_by=lambda r: r[0],
    ),
    seed=st.integers(0, 2**31 - 1),
)
@SLOW
def test_stratified_seed_determinism(spark, rows, seed):
    from experimentsplan_datapipeline_spark.operators.sampling import stratified_exact

    df = spark.createDataFrame(rows, ["id", "stratum"])
    targets = {"a": 3, "b": 2, "c": 4}
    take1 = sorted(
        r.id for r in stratified_exact(df, "stratum", targets, ["id"], seed=seed).collect()
    )
    take2 = sorted(
        r.id for r in stratified_exact(df, "stratum", targets, ["id"], seed=seed).collect()
    )
    assert take1 == take2  # same seed -> identical sample
    # per-stratum counts are exact: min(target, stratum size)
    from collections import Counter

    strata = Counter(s for _, s in rows)
    got = Counter(
        r.stratum
        for r in stratified_exact(df, "stratum", targets, ["id"], seed=seed).collect()
    )
    for k, target in targets.items():
        assert got.get(k, 0) == min(target, strata.get(k, 0))


@given(
    text=st.text(
        alphabet=st.characters(whitelist_categories=("Ll", "Zs")), max_size=300
    )
)
@SLOW
def test_quality_score_bounded(spark, text):
    from experimentsplan_datapipeline_spark.functions.text import quality_score, token_count

    row = spark.createDataFrame([(text,)], ["text"]).select(
        quality_score("text").alias("q"), token_count("text").alias("n")
    ).collect()[0]
    assert 0.0 <= row.q <= 1.0
    assert row.n >= 0


@given(
    lefts=st.lists(st.integers(0, 3600), min_size=1, max_size=15, unique=True),
    rights=st.lists(st.integers(0, 3600), min_size=1, max_size=15, unique=True),
)
@SLOW
def test_asof_join_matches_bruteforce(spark, lefts, rights):
    from experimentsplan_datapipeline_spark.operators.joins import asof_join

    base = dt.datetime(2026, 1, 1)
    ldf = spark.createDataFrame(
        [(1, i, base + dt.timedelta(seconds=s)) for i, s in enumerate(lefts)],
        ["uid", "lid", "ts"],
    )
    rdf = spark.createDataFrame(
        [(1, float(s), base + dt.timedelta(seconds=s)) for s in rights],
        ["uid", "val", "rts"],
    )
    got = {
        r.lid: r.val
        for r in asof_join(ldf, rdf, "uid", "ts", "rts", ["val"]).collect()
    }
    for i, s in enumerate(lefts):
        eligible = [x for x in rights if x <= s]
        expected = float(max(eligible)) if eligible else None
        assert got[i] == expected


@given(
    docs=st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=60), min_size=2, max_size=8
    )
)
@SLOW
def test_exact_dedup_idempotent_and_complete(spark, docs):
    from experimentsplan_datapipeline_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame(list(enumerate(docs)), ["doc_id", "text"])
    out = exact_dedup(df, "text", "doc_id").collect()
    # every duplicate set keeps exactly one representative; total dup_count
    # accounts for every input row
    assert sum(r.dup_count for r in out) == len(docs)
    assert len({r.fingerprint for r in out}) == len(out)
