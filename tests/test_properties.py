"""Property-based tests (hypothesis) for the engine's determinism contracts.

Spark round-trips are expensive, so each property runs a handful of
generated examples — the point is randomized coverage of the CONTRACT
(seed-determinism, order-insensitivity, brute-force equivalence), not volume.
"""

from __future__ import annotations

import datetime as dt

import pytest

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


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 9999), st.sampled_from(["x", "y"])),
        min_size=2,
        max_size=60,
        unique_by=lambda r: r[0],
    ),
    buckets=st.integers(1, 40),
)
@SLOW
def test_hash_rank_is_group_permutation(spark, rows, buckets):
    """hash_rank assigns each group's rows exactly the ranks 1..|group|,
    for ANY bucket count (bucketing must never skip or duplicate a rank)."""
    from collections import defaultdict

    from experimentsplan_datapipeline_spark.operators.sampling import hash_rank

    df = spark.createDataFrame(rows, ["id", "grp"])
    out = hash_rank(df, ["id"], partition_cols=["grp"], seed=11, buckets=buckets)
    by_grp = defaultdict(list)
    for r in out.collect():
        by_grp[r.grp].append(r.rk)
    want_sizes = defaultdict(int)
    for _, g in rows:
        want_sizes[g] += 1
    assert {g: sorted(v) for g, v in by_grp.items()} == {
        g: list(range(1, n + 1)) for g, n in want_sizes.items()
    }


@given(
    texts=st.lists(
        st.text(alphabet="ab c", min_size=0, max_size=30),
        min_size=1,
        max_size=15,
    ),
)
@SLOW
def test_token_entropy_bounds(spark, texts):
    """0 <= entropy <= ln(n_distinct); shares and ratios land in (0, 1]."""
    import math

    from experimentsplan_datapipeline_spark.operators.text_analysis import (
        token_entropy_profile,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["id", "txt"]
    )
    for r in token_entropy_profile(df, "id", "txt").collect():
        # entropy is rounded to 6 decimals in the operator (oracle-portable
        # hashing), so the bound check needs a half-ulp-of-rounding slack.
        assert -5e-7 <= r.entropy <= math.log(r.n_distinct) + 5e-7
        assert 0 < r.top_share <= 1.0
        assert 0 < r.distinct_ratio <= 1.0
        assert r.n_distinct <= r.n_tokens


@given(
    shape=st.tuples(
        st.integers(1, 12), st.integers(1, 12), st.sampled_from([1, 3, 4])
    ),
    seed=st.integers(0, 2**31 - 1),
)
@SLOW
def test_png_roundtrip_property(shape, seed):
    """encode->decode is identity for any 8-bit image shape/content."""
    import numpy as np

    from experimentsplan_datapipeline_spark.media.png import decode_png, encode_png

    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, size=shape, dtype=np.uint8)
    assert (decode_png(encode_png(arr)) == arr).all()


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 24), st.integers(0, 24)),
        min_size=0,
        max_size=30,
    ),
)
@SLOW
def test_resolve_clusters_matches_union_find(spark, edges):
    """Pointer-jumping cluster resolution equals a plain union-find on any
    random pair graph (self-loops tolerated)."""
    from experimentsplan_datapipeline_spark.operators.dedup import (
        resolve_duplicate_clusters,
    )

    n = 25
    docs = spark.createDataFrame([(i, f"d{i}") for i in range(n)], ["doc_id", "text"])
    pair_rows = [(a, b) for a, b in edges if a != b] or [(0, 0)]
    pairs = spark.createDataFrame(pair_rows, ["id_a", "id_b"])

    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pair_rows:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {i: find(i) for i in range(n)}

    got = {
        r.doc_id: r.rep_id
        for r in resolve_duplicate_clusters(docs, pairs, "doc_id").collect()
    }
    assert got == expected


@given(
    arrs=st.lists(
        st.lists(st.floats(-100, 100, width=32), min_size=1, max_size=20),
        min_size=1,
        max_size=4,
    ),
)
@SLOW
def test_npy_roundtrip_property(spark, tmp_path_factory, arrs):
    """Any float array written as .npy comes back with exact dtype, shape,
    and values through the distributed source."""
    import numpy as np

    from experimentsplan_datapipeline_spark.sources.tensors import npy_bytes, read_npy

    root = tmp_path_factory.mktemp("npy_prop")
    expect = {}
    for i, vals in enumerate(arrs):
        a = np.array(vals, dtype=np.float64)
        (root / f"t{i}.npy").write_bytes(npy_bytes(a))
        expect[f"t{i}.npy"] = a
    out = {r.path.split("/")[-1]: r for r in read_npy(spark, str(root)).collect()}
    assert set(out) == set(expect)
    for name, a in expect.items():
        assert out[name].shape == list(a.shape)
        assert out[name].values == a.reshape(-1).tolist()


@pytest.mark.parametrize("seed", [3, 17, 91])
def test_dedup_cascade_recovers_planted_clusters(spark, seed):
    """END-TO-END recall of the composed cascade: minhash -> LSH banding ->
    exact-Jaccard verify -> cluster resolution recovers every PLANTED
    cluster exactly. Each stage is unit-proven elsewhere; this is the
    composed guarantee a 100 TB user actually relies on.

    Planted shapes per seed:
    - a CHAIN of 40 docs where only ADJACENT members are near-dups
      (cumulative 1-token edits; diameter 39 > 32) — recovering it needs
      every adjacent pair caught by some band AND transitive closure to
      span the chain (pointer jumping's O(log d) rounds);
    - a STAR of 5 docs, all within 2 token edits pairwise (cross-band
      duplicates: different pairs land in different band buckets);
    - 30 random background docs that must stay singletons (the exact
      verify step guarantees zero false merges at threshold).
    """
    import random

    from experimentsplan_datapipeline_spark.operators.dedup import (
        minhash_lsh_dedup,
        resolve_duplicate_clusters,
    )

    rng = random.Random(seed)
    vocab = [f"w{i:04d}" for i in range(5000)]
    T = 100
    docs: list[tuple[int, str]] = []
    for i in range(30):  # background singletons
        docs.append((1000 + i, " ".join(rng.choice(vocab) for _ in range(T))))
    # chain: member k = member k-1 with token at position k replaced
    base = [rng.choice(vocab) for _ in range(T)]
    cur = list(base)
    chain_ids = []
    for k in range(40):
        cur = list(cur)
        old = cur[k]
        while cur[k] == old:
            cur[k] = rng.choice(vocab)
        docs.append((k, " ".join(cur)))
        chain_ids.append(k)
    # star: base2 plus 5 members each with a DIFFERENT single position edited
    base2 = [rng.choice(vocab) for _ in range(T)]
    star_ids = []
    for m in range(5):
        mem = list(base2)
        pos = 10 + 7 * m
        old = mem[pos]
        while mem[pos] == old:
            mem[pos] = rng.choice(vocab)
        docs.append((100 + m, " ".join(mem)))
        star_ids.append(100 + m)

    df = spark.createDataFrame(docs, ["id", "text"])
    pairs = minhash_lsh_dedup(
        df, "text", "id", num_hashes=32, bands=8, shingle_size=3, threshold=0.8
    )
    resolved = resolve_duplicate_clusters(df, pairs, "id", max_iter=10)
    rep = {r.id: r.rep_id for r in resolved.collect()}
    assert len(rep) == len(docs)
    # chain collapses to ONE cluster under its min id
    assert {rep[k] for k in chain_ids} == {0}
    # star collapses to ONE cluster under its min id
    assert {rep[s] for s in star_ids} == {100}
    # background: all singletons, no false merges anywhere
    for i in range(30):
        assert rep[1000 + i] == 1000 + i


@pytest.mark.parametrize("seed", [1, 7, 23])
def test_jaccard_prefix_join_matches_bruteforce(spark, seed):
    """The fused AllPairs/PPJoin implementation (asymmetric indexing
    prefix + positional filter + inline xxhash64-id verify + string
    re-verify) returns EXACTLY the all-pairs truth: same pair set, same
    jaccard values. Corpora are built adversarially — a small vocabulary
    (hot prefix tokens), documents mutated from shared bases at varying
    edit counts so pairs straddle the threshold, plus exact duplicates."""
    import random

    from experimentsplan_datapipeline_spark.operators.dedup import (
        jaccard_prefix_join,
        ngram_jaccard_pairs,
    )

    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(40)]  # small vocab -> hot shingles
    docs = []
    doc_id = 0
    for base_i in range(8):
        base = [rng.choice(vocab) for _ in range(rng.randint(12, 25))]
        for n_edits in (0, 0, 1, 2, 4, 8):  # two exact copies + near/far
            words = list(base)
            for _ in range(n_edits):
                pos = rng.randrange(len(words))
                words[pos] = rng.choice(vocab)
            docs.append((doc_id, " ".join(words)))
            doc_id += 1
    df = spark.createDataFrame(docs, ["doc_id", "text"])

    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in jaccard_prefix_join(df, "text", "doc_id", 2, 0.7).collect()
    }

    a = df.selectExpr("doc_id AS id_a")
    b = df.selectExpr("doc_id AS id_b")
    all_pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    want = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(
            df, all_pairs, "text", "doc_id", 2, 0.7
        ).collect()
    }
    assert got == want
    assert want, "fixture must plant at least one qualifying pair"


@pytest.mark.parametrize("seed", [3, 11])
def test_containment_join_matches_bruteforce(spark, seed):
    """The asymmetric containment join returns exactly the all-ordered-pairs
    truth — including container docs much larger than the contained one
    (the regime where Jaccard would score near zero)."""
    import random

    from experimentsplan_datapipeline_spark.operators.dedup import (
        containment_prefix_join,
    )

    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(50)]
    docs = []
    for doc_id in range(24):
        words = [rng.choice(vocab) for _ in range(rng.randint(8, 16))]
        docs.append((doc_id, " ".join(words)))
    # plant containers: doc 24+k wraps doc k's text in a long random shell
    for k in range(6):
        shell = [rng.choice(vocab) for _ in range(30)]
        docs.append((24 + k, " ".join(shell[:15]) + " " + docs[k][1] + " " + " ".join(shell[15:])))
    df = spark.createDataFrame(docs, ["doc_id", "text"])

    got = {
        (r.id_inner, r.id_outer): r.containment
        for r in containment_prefix_join(df, "text", "doc_id", 2, 0.7).collect()
    }

    from experimentsplan_datapipeline_spark.functions.text import ngrams

    sh = df.select(
        "doc_id", F.array_distinct(ngrams("text", 2)).alias("sh")
    )
    x, y = sh.alias("x"), sh.alias("y")
    brute = (
        x.crossJoin(y)
        .filter(F.col("x.doc_id") != F.col("y.doc_id"))
        .filter(F.size("x.sh") > 0)
        .select(
            F.col("x.doc_id").alias("id_inner"),
            F.col("y.doc_id").alias("id_outer"),
            F.round(
                F.size(F.array_intersect("x.sh", "y.sh")).cast("double")
                / F.size("x.sh"),
                6,
            ).alias("containment"),
        )
        .filter(F.col("containment") >= 0.7)
    )
    want = {(r.id_inner, r.id_outer): r.containment for r in brute.collect()}
    assert got == want
    # every planted (k, 24+k) inclusion must be found at containment ~1.0
    for k in range(6):
        assert (k, 24 + k) in got and got[(k, 24 + k)] >= 0.9


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)),
        min_size=1,
        max_size=30,
    ),
)
@SLOW
def test_triangle_count_matches_bruteforce(spark, edges):
    """triangle_count (degree-ordered orientation) equals the O(n^3)
    brute-force per-node triangle count on random directed multigraphs —
    duplicates, reversed edges, and self-loops included."""
    from experimentsplan_datapipeline_spark.operators.graph import (
        triangle_count,
    )

    und = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    adj: dict[int, set[int]] = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want: dict[int, int] = {}
    nodes = sorted(adj)
    for i, u in enumerate(nodes):
        for v in nodes[i + 1 :]:
            if v not in adj[u]:
                continue
            for w in nodes:
                if w > v and w in adj[u] and w in adj[v]:
                    for m in (u, v, w):
                        want[m] = want.get(m, 0) + 1
    got = {
        r.node: r.n_triangles
        for r in triangle_count(
            spark.createDataFrame(edges, ["src", "dst"])
        ).collect()
    }
    assert got == want


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 40)),
        min_size=1,
        max_size=60,
    ),
    m=st.sampled_from([2, 3, 5, 8]),
)
@SLOW
def test_copurchase_pairs_blocked_property(spark, rows, m):
    """For ANY group/item multiset and block count, the triangle-blocked
    pair generation emits exactly the plain self-join's pair set."""
    from experimentsplan_datapipeline_spark.operators.graph import (
        copurchase_pairs,
    )

    items = spark.createDataFrame(rows, ["g", "i"])
    plain = sorted(
        (r.g, r.pa, r.pb)
        for r in copurchase_pairs(items, "g", "i", n_blocks=1).collect()
    )
    blocked = sorted(
        (r.g, r.pa, r.pb)
        for r in copurchase_pairs(items, "g", "i", n_blocks=m).collect()
    )
    assert blocked == plain


@given(
    spans=st.lists(
        st.tuples(st.integers(0, 500), st.integers(0, 300)),
        min_size=2, max_size=25,
    ),
    cell=st.sampled_from([7, 50, 100]),
)
@SLOW
def test_interval_overlap_matches_bruteforce(spark, spans, cell):
    """Cell blocking + meet-once must reproduce the quadratic definition
    exactly — every overlapping pair once, with the right overlap length,
    at any cell width (including cells far smaller than the spans)."""
    from experimentsplan_datapipeline_spark.operators.joins import (
        interval_overlap_join,
    )

    rows = [("k", i, s, s + d) for i, (s, d) in enumerate(spans)]
    df = spark.createDataFrame(rows, ["k", "iid", "s", "e"])
    got = sorted(
        (r.id_a, r.id_b, r.overlap_len)
        for r in interval_overlap_join(
            df, ["k"], "iid", "s", "e", cell=cell
        ).collect()
    )
    want = []
    for _, a, sa, ea in rows:
        for _, b, sb, eb in rows:
            if a < b and sa <= eb and sb <= ea:
                want.append((a, b, min(ea, eb) - max(sa, sb)))
    assert got == sorted(want)


@given(
    docs=st.lists(
        st.lists(st.sampled_from(["x", "y", "z", "w"]), min_size=0, max_size=6),
        min_size=2, max_size=8,
    )
)
@SLOW
def test_dedup_lines_rewrite_idempotent(spark, docs):
    """Rewriting an already-rewritten corpus is the identity: after one
    pass every surviving line occurs exactly once corpus-wide, so a
    second pass keeps everything (n_kept == n_lines per doc)."""
    from experimentsplan_datapipeline_spark.operators.dedup import (
        dedup_lines_rewrite,
    )

    df = spark.createDataFrame(
        [(i, "\n".join(lines)) for i, lines in enumerate(docs)],
        ["doc_id", "text"],
    )
    once = dedup_lines_rewrite(df, "doc_id", "text").select(
        "doc_id", F.col("clean_text").alias("text")
    )
    twice = dedup_lines_rewrite(once, "doc_id", "text").collect()
    assert all(r.n_kept == r.n_lines for r in twice)
    # and the rewritten text survives a second pass byte-identically
    again = {r.doc_id: r.clean_text for r in twice}
    first = {r.doc_id: r.text for r in once.collect()}
    assert again == first


@given(
    masses=st.lists(st.integers(1, 10_000), min_size=2, max_size=6),
    alpha=st.sampled_from([0.0, 0.3, 0.5, 1.0]),
    total=st.integers(10, 400),
)
@SLOW
def test_mixture_temperature_quota_contract(spark, masses, alpha, total):
    """Quotas never exceed source row counts, their sum never exceeds
    ``total`` (floors only lose), and the drawn count per source equals
    its quota exactly."""
    from experimentsplan_datapipeline_spark.operators.curation import (
        mixture_temperature,
    )

    rows = []
    for si, m in enumerate(masses):
        # 3 rows per source, the per-row mass summing to the source mass
        rows += [(si * 10 + j, f"s{si}", m) for j in range(3)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "mass"])
    out = mixture_temperature(
        df, "source", "mass", ["doc_id"], total=total, alpha=alpha
    ).collect()
    per_src = {}
    quotas = {}
    for r in out:
        per_src[r.source] = per_src.get(r.source, 0) + 1
        quotas[r.source] = r.quota
    assert all(q <= 3 for q in quotas.values())
    assert sum(quotas.values()) <= total
    assert all(per_src[s] == quotas[s] for s in per_src)


@given(
    words=st.lists(
        st.text(alphabet="abcd", min_size=1, max_size=12),
        min_size=3,
        max_size=25,
    ),
    n_merges=st.integers(1, 30),
    data=st.data(),
)
@settings(max_examples=50, deadline=None)
def test_bpe_min_rank_loop_equals_sequential_application(
    words, n_merges, data
):
    """PURE-PYTHON property (no Spark): for any RANK-CONSISTENT merge
    table (anything trained by the bpe_train algorithm on any corpus),
    the production min-rank merge loop (_bpe_apply_word) produces the
    same symbol sequence as sequential rank-order application (the
    replace chain's definition) on any input word. This is the
    equivalence argument bpe_tokenize_ids's docstring makes, fuzzed."""
    from experimentsplan_datapipeline_spark.operators.text_analysis import (
        _bpe_apply_word,
    )

    # train with the reference trainer on the generated corpus
    counts: dict[str, int] = {}
    for w in words:
        counts[w] = counts.get(w, 0) + 1
    merges = []
    wstate = {tuple(w): c for w, c in counts.items()}
    for _ in range(n_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for syms, cnt in wstate.items():
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + cnt
        if not pair_counts:
            break
        best = min(pair_counts, key=lambda p: (-pair_counts[p], p))
        merges.append(best)
        l, r = best
        nxt: dict[tuple, int] = {}
        for syms, cnt in wstate.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nxt[tuple(out)] = nxt.get(tuple(out), 0) + cnt
        wstate = nxt

    ranks = {p: i for i, p in enumerate(merges)}
    # apply to a fresh word drawn independently of the corpus
    target = data.draw(st.text(alphabet="abcd", min_size=0, max_size=16))

    def sequential(word):
        syms = list(word)
        for l, r in merges:
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    assert _bpe_apply_word(target, merges, ranks) == sequential(target)


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["aa", "bb", "cc", "dd", "ee"]),
            min_size=6,
            max_size=25,
        ),
        min_size=2,
        max_size=5,
    ),
    data=st.data(),
)
@SLOW
def test_winnow_guarantee_fuzz(spark, docs, data):
    """Fuzzed winnowing guarantee (k=3, w=4): plant one shared
    (w + k - 1)-token run into two random documents — each must select
    at least one identical fingerprint; and every doc's selection set
    must equal a brute-force Python replay of min-of-window with the
    rightmost tie-break."""
    import hashlib

    from experimentsplan_datapipeline_spark.operators.text_analysis import (
        winnow_fingerprints,
    )

    k, w = 3, 4
    run = ["r1", "r2", "r3", "r4", "r5", "r6"]  # w + k - 1 tokens
    toks0 = list(docs[0])
    toks1 = list(docs[1])
    i0 = data.draw(st.integers(0, len(toks0)))
    i1 = data.draw(st.integers(0, len(toks1)))
    toks0[i0:i0] = run
    toks1[i1:i1] = run
    all_docs = [toks0, toks1] + [list(d) for d in docs[2:]]
    df = spark.createDataFrame(
        [(i, " ".join(d)) for i, d in enumerate(all_docs)],
        ["doc_id", "text"],
    )
    got = {}
    for r in winnow_fingerprints(df, "doc_id", "text", k=k, w=w).collect():
        got.setdefault(r.doc_id, set()).add((r.pos, r.fp))

    def brute(toks):
        grams = [
            (i + 1, hashlib.md5(" ".join(toks[i:i + k]).encode()).hexdigest())
            for i in range(len(toks) - k + 1)
        ]
        sel = set()
        for j in range(len(grams) - w + 1):
            win = grams[j:j + w]
            pos, h = min(win, key=lambda g: (g[1], -g[0]))
            sel.add((pos, h))
        return sel

    for i, d in enumerate(all_docs):
        assert got.get(i, set()) == brute(d), f"doc {i}"
    fps0 = {fp for _, fp in got[0]}
    fps1 = {fp for _, fp in got[1]}
    assert fps0 & fps1, "planted shared run must share a fingerprint"


@given(
    items=st.lists(
        st.sampled_from([f"k{i}" for i in range(12)]),
        min_size=10,
        max_size=120,
    ),
)
@SLOW
def test_cms_bounds_fuzz(spark, items):
    """Fuzzed CMS contract: for EVERY distinct key of a random multiset,
    est >= exact count and est - exact <= N (trivially) with the sketch
    total mass per row == stream length; estimates match a brute-force
    Python replay of the same md5 bucket family."""
    import hashlib
    from collections import Counter

    from experimentsplan_datapipeline_spark.operators.aggregates import (
        cms_estimate,
        count_min_sketch,
    )

    depth, width, seed = 3, 8, 11
    df = spark.createDataFrame([(x,) for x in items], ["v"])
    sk = count_min_sketch(df, "v", depth=depth, width=width, seed=seed)
    cells = {(r.row_i, r.bucket): r.c for r in sk.collect()}
    exact = Counter(items)

    def bucket(key, r):
        h = hashlib.md5(f"{key}|cms{seed}.{r}".encode()).hexdigest()[:8]
        return int(h, 16) % width

    # brute-force sketch replay
    want = Counter()
    for x in items:
        for r in range(depth):
            want[(r, bucket(x, r))] += 1
    assert cells == dict(want)
    qdf = spark.createDataFrame([(x,) for x in exact], ["v"])
    est = {
        r.v: r.est
        for r in cms_estimate(
            sk, qdf, "v", depth=depth, width=width, seed=seed
        ).collect()
    }
    for x, cnt in exact.items():
        assert est[x] >= cnt
        assert est[x] == min(
            want[(r, bucket(x, r))] for r in range(depth)
        )
