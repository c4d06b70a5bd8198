"""Unit tests for TF-IDF, embedding near-dup, and IVF ANN operators."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from experimentsplan_datapipeline_spark.operators.dedup import embedding_near_dup
from experimentsplan_datapipeline_spark.operators.similarity import (
    brute_force_topk,
    ivf_topk,
)
from experimentsplan_datapipeline_spark.operators.text_analysis import tfidf_top_terms


def test_tfidf_hand_computed(spark):
    docs = spark.createDataFrame(
        [(1, "apple banana apple"), (2, "banana cherry"), (3, "cherry cherry date")],
        ["doc_id", "text"],
    )
    out = {
        (r.doc_id, r.term): r.tfidf
        for r in tfidf_top_terms(docs, "doc_id", "text", k=5).collect()
    }
    # apple: tf=2 in doc 1, df=1 over 3 docs -> 2*ln(3)
    assert out[(1, "apple")] == round(2 * math.log(3.0), 6)
    # banana appears in 2 of 3 docs, tf=1 each
    assert out[(1, "banana")] == round(math.log(3.0 / 2.0), 6)
    # cherry in doc 3: tf=2, df=2
    assert out[(3, "cherry")] == round(2 * math.log(3.0 / 2.0), 6)


def test_tfidf_rank_deterministic(spark):
    docs = spark.createDataFrame([(1, "b a c a b c")], ["doc_id", "text"])
    # all terms tie on tfidf (tf=2, df=1) -> rank breaks by term ascending
    out = tfidf_top_terms(docs, "doc_id", "text", k=3).orderBy("rank").collect()
    assert [r.term for r in out] == ["a", "b", "c"]


def test_embedding_near_dup_exact(spark):
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [1.0, 0.01]),   # near-dup of 1
            (3, [0.0, 1.0]),    # orthogonal
        ],
        ["vec_id", "embedding"],
    )
    out = embedding_near_dup(emb, "vec_id", "embedding", threshold=0.95).collect()
    assert [(r.id_a, r.id_b) for r in out] == [(1, 2)]
    assert out[0].cosine > 0.999


def test_embedding_near_dup_lsh_finds_identicals(spark):
    # identical vectors always share every sign-pattern bucket
    emb = spark.createDataFrame(
        [(1, [0.5, -0.2, 0.8]), (2, [0.5, -0.2, 0.8]), (3, [-0.9, 0.1, -0.4])],
        ["vec_id", "embedding"],
    )
    out = embedding_near_dup(
        emb, "vec_id", "embedding", threshold=0.99, dim=3, n_planes=4
    ).collect()
    assert [(r.id_a, r.id_b) for r in out] == [(1, 2)]


def test_ivf_topk_full_probe_matches_bruteforce(spark):
    # with n_cells == corpus size and n_probe == n_cells, IVF degenerates to
    # exact search — results must equal brute force
    rows = [
        (i, [math.cos(i * 0.7), math.sin(i * 0.7), math.cos(i * 1.3)])
        for i in range(8)
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    queries = emb.filter(F.col("vec_id") < 2)
    exact = {
        (r.vec_id_q, r.rank): r.vec_id
        for r in brute_force_topk(emb, queries, "vec_id", "vec_id", "embedding", k=3).collect()
    }
    ivf = {
        (r.vec_id_q, r.rank): r.vec_id
        for r in ivf_topk(
            emb, queries, "vec_id", "vec_id", "embedding", k=3, n_cells=8, n_probe=8
        ).collect()
    }
    assert ivf == exact


def test_ivf_topk_respects_k(spark):
    rows = [(i, [float(i % 3), float((i * 2) % 5), 1.0]) for i in range(20)]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    queries = emb.filter(F.col("vec_id") == 0)
    out = ivf_topk(
        emb, queries, "vec_id", "vec_id", "embedding", k=4, n_cells=4, n_probe=2
    ).collect()
    assert len(out) <= 4
    assert all(r.rank <= 4 for r in out)


def test_resolve_duplicate_clusters(spark):
    from experimentsplan_datapipeline_spark.operators.dedup import (
        resolve_duplicate_clusters,
    )

    docs = spark.createDataFrame([(i, f"d{i}") for i in range(8)], ["doc_id", "text"])
    # chain 1-2-3 (diameter 2), pair 5-6, singletons 0,4,7
    pairs = spark.createDataFrame(
        [(2, 3), (1, 2), (5, 6)], ["id_a", "id_b"]
    )
    out = {
        r.doc_id: r.rep_id
        for r in resolve_duplicate_clusters(docs, pairs, "doc_id").collect()
    }
    assert out == {0: 0, 1: 1, 2: 1, 3: 1, 4: 4, 5: 5, 6: 5, 7: 7}


def test_resolve_clusters_long_chain_converges(spark):
    """Pointer-jumping regression: a diameter-15 chain must collapse to ONE
    representative within the default max_iter (plain one-hop min-label
    propagation would silently under-merge it)."""
    from experimentsplan_datapipeline_spark.operators.dedup import (
        resolve_duplicate_clusters,
    )

    n = 16
    docs = spark.createDataFrame([(i, f"d{i}") for i in range(n)], ["doc_id", "text"])
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], ["id_a", "id_b"]
    )
    out = {
        r.doc_id: r.rep_id
        for r in resolve_duplicate_clusters(docs, pairs, "doc_id").collect()
    }
    assert out == {i: 0 for i in range(n)}


def test_resolve_clusters_raises_when_not_converged(spark):
    from experimentsplan_datapipeline_spark.operators.dedup import (
        resolve_duplicate_clusters,
    )

    n = 8
    docs = spark.createDataFrame([(i, f"d{i}") for i in range(n)], ["doc_id", "text"])
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], ["id_a", "id_b"]
    )
    with pytest.raises(RuntimeError, match="not converged"):
        resolve_duplicate_clusters(docs, pairs, "doc_id", max_iter=1).collect()


def test_salted_join_matches_plain(spark):
    from experimentsplan_datapipeline_spark.operators.joins import salted_join

    left = spark.createDataFrame(
        [(i, i % 3, float(i)) for i in range(30)], ["rid", "k", "v"]
    )
    right = spark.createDataFrame([(0, "a"), (1, "b"), (2, "c")], ["k", "name"])
    plain = sorted(
        (r.rid, r.name) for r in left.join(right, "k").collect()
    )
    salted = sorted(
        (r.rid, r.name)
        for r in salted_join(left, right, "k", salt_from=["rid"], n_salts=4).collect()
    )
    assert salted == plain


def test_ann_recall_vs_bruteforce(spark):
    """LSH and IVF must recover a solid fraction of the exact top-10 on the
    driver's embedding table — guards against a silently-broken bucketing
    family (recall would crater to ~0)."""
    import os

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    path = os.path.join(sf, "embeddings.parquet")
    if not os.path.exists(path):
        import pytest

        pytest.skip("no embeddings testdata")
    from experimentsplan_datapipeline_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
        lsh_bucketed_topk,
    )

    emb = spark.read.parquet(path).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    queries = emb.filter(F.col("vec_id") < 10)
    exact = brute_force_topk(emb, queries, "vec_id", "vec_id", "embedding", k=10)
    truth = {}
    for r in exact.collect():
        truth.setdefault(r.vec_id_q, set()).add(r.vec_id)

    def recall(df):
        got = {}
        for r in df.collect():
            got.setdefault(r.vec_id_q, set()).add(r.vec_id)
        hits = sum(len(got.get(q, set()) & t) for q, t in truth.items())
        return hits / sum(len(t) for t in truth.values())

    lsh = lsh_bucketed_topk(
        emb, queries, "vec_id", "vec_id", dim=64, vec_col="embedding", k=10, n_planes=4
    )
    ivf = ivf_topk(
        emb, queries, "vec_id", "vec_id", "embedding", k=10, n_cells=8, n_probe=4
    )
    assert recall(lsh) >= 0.3, "LSH recall collapsed"
    assert recall(ivf) >= 0.3, "IVF recall collapsed"


def test_kmeans_lite_deterministic_and_usable(spark):
    import math

    from experimentsplan_datapipeline_spark.operators.similarity import (
        ivf_topk,
        kmeans_assign,
        kmeans_lite,
    )

    rows = [
        (i, [math.cos(i * 0.9), math.sin(i * 0.9), math.cos(i * 0.4)])
        for i in range(24)
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    c1 = kmeans_lite(emb, "vec_id", "embedding", k=3, iters=2)
    c2 = kmeans_lite(emb, "vec_id", "embedding", k=3, iters=2)
    assert c1 == c2  # fully deterministic training
    assigned = kmeans_assign(emb, "vec_id", "embedding", c1).collect()
    assert len(assigned) == 24
    assert {r.cluster for r in assigned} <= {cid for cid, _ in c1}
    # trained codebook slots into IVF search
    out = ivf_topk(
        emb, emb.filter(F.col("vec_id") < 2), "vec_id", "vec_id",
        "embedding", k=3, n_probe=2, centroids=c1,
    ).collect()
    assert len(out) > 0


def test_chunk_documents_overlap(spark):
    from experimentsplan_datapipeline_spark.operators.text_analysis import (
        chunk_documents,
    )

    text = " ".join(f"w{i}" for i in range(10))
    docs = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    out = {
        r.chunk_id: r.chunk_text.split()
        for r in chunk_documents(docs, "doc_id", "text", chunk_tokens=6, overlap=2).collect()
    }
    # stride 4: chunk 0 = w0..w5, chunk 1 = w4..w9
    assert out[0] == [f"w{i}" for i in range(6)]
    assert out[1] == [f"w{i}" for i in range(4, 10)]
    assert len(out) == 2
    # overlap region shared between consecutive chunks
    assert out[0][-2:] == out[1][:2]


def test_pack_sequences_budget(spark):
    from experimentsplan_datapipeline_spark.operators.text_analysis import (
        pack_sequences,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(["x"] * 10)) for i in range(10)], ["doc_id", "text"]
    )
    out = {r.doc_id: r.bin for r in pack_sequences(docs, "doc_id", "text", budget=25).collect()}
    # 10 tokens each: cumsum-before = 0,10,20,30,... -> bins 0,0,0,1,1,2,2,2,3,3
    assert out == {0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 2, 6: 2, 7: 2, 8: 3, 9: 3}


def test_redact_pii_and_counts(spark):
    from experimentsplan_datapipeline_spark.functions.text import pii_counts, redact_pii
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "mail a.b-c@x.co and +1-555-0100 ok"), (2, "clean text")],
        ["id", "txt"],
    )
    ne, np_ = pii_counts("txt")
    out = {
        r.id: (r.red, r.ne, r.np)
        for r in df.select(
            "id", redact_pii("txt").alias("red"), ne.alias("ne"), np_.alias("np")
        ).collect()
    }
    assert out[1] == ("mail <EMAIL> and <PHONE> ok", 1, 1)
    assert out[2] == ("clean text", 0, 0)


def test_token_entropy_profile_known_values(spark):
    import math

    from experimentsplan_datapipeline_spark.operators.text_analysis import (
        token_entropy_profile,
    )

    df = spark.createDataFrame(
        [(1, "a a b b"), (2, "x x x x"), (3, "")], ["id", "txt"]
    )
    rows = {r.id: r for r in token_entropy_profile(df, "id", "txt").collect()}
    assert rows[1].entropy == round(math.log(2), 6)  # uniform over 2 tokens
    assert rows[1].top_share == 0.5
    assert rows[2].entropy == 0.0  # single repeated token
    assert rows[2].distinct_ratio == 0.25
    assert 3 not in rows  # empty doc absent


def test_pack_sequences_distributed_matches_cumsum(spark):
    from experimentsplan_datapipeline_spark.operators.text_analysis import (
        pack_sequences,
    )

    rows = [(i, " ".join(["w"] * ((i * 13) % 40 + 1))) for i in range(300)]
    df = spark.createDataFrame(rows, ["id", "txt"]).repartition(32)
    got = {r.id: r.bin for r in pack_sequences(df, "id", "txt", budget=100).collect()}
    # reference: plain python cumsum in id order
    cum, want = 0, {}
    for i, txt in sorted(rows):
        want[i] = cum // 100
        cum += len(txt.split())
    assert got == want


def test_repetition_signals_hand_computed(spark):
    from experimentsplan_datapipeline_spark.operators.text_analysis import (
        repetition_signals,
    )

    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),          # 6 words, top 'the' 2/6
            (2, "go go go go"),                      # top 1.0, dup bigrams 2/3
            (3, "alpha"),                            # 1 word, no bigrams
        ],
        ["doc_id", "text"],
    )
    rows = {
        r["doc_id"]: r
        for r in repetition_signals(df, "doc_id", "text").collect()
    }
    assert rows[1]["n_words"] == 6
    assert abs(rows[1]["top_word_frac"] - 2 / 6) < 1e-6
    assert rows[1]["dup_bigram_frac"] == 0.0
    assert abs(rows[1]["mean_word_len"] - 17 / 6) < 1e-6
    assert rows[1]["keep"] is False  # mean word len 2.83 < Gopher's 3.0 floor
    assert rows[2]["top_word_frac"] == 1.0
    assert abs(rows[2]["dup_bigram_frac"] - 2 / 3) < 1e-6
    assert rows[2]["keep"] is False
    assert rows[3]["n_words"] == 1
    assert rows[3]["dup_bigram_frac"] == 0.0


def test_url_dedup_canonicalization(spark):
    from experimentsplan_datapipeline_spark.operators.dedup import url_dedup

    df = spark.createDataFrame(
        [
            (1, "https://example.com/a/b"),
            (2, "http://WWW.EXAMPLE.COM/a/b/"),
            (3, "https://example.com/a/b?utm=x"),
            (4, "https://example.com/a/b#frag"),
            (5, "https://other.com/c"),
        ],
        ["doc_id", "url"],
    )
    out = {r["canonical_url"]: r for r in url_dedup(df, "url", "doc_id").collect()}
    assert set(out) == {"example.com/a/b", "other.com/c"}
    assert out["example.com/a/b"]["keeper"] == 1
    assert out["example.com/a/b"]["n_docs"] == 4
    assert out["other.com/c"]["n_docs"] == 1


def test_jaccard_prefix_join_matches_bruteforce(spark):
    """Prefix filtering must lose nothing: same pairs as all-pairs verify."""
    from experimentsplan_datapipeline_spark.operators.dedup import (
        jaccard_prefix_join,
        ngram_jaccard_pairs,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (0, base),
        (1, base + " extra"),                      # near-dup of 0
        (2, "one two three four five six seven"),  # unrelated
        (3, base),                                 # exact dup of 0
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in jaccard_prefix_join(
            df, "text", "doc_id", shingle_size=3, threshold=0.5
        ).collect()
    }
    ids = df.select("doc_id")
    allpairs = (
        ids.alias("a")
        .join(ids.alias("b"), F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
    )
    want = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(
            df, allpairs, "text", "doc_id", shingle_size=3, threshold=0.5
        ).collect()
    }
    assert got == want
    assert (0, 3) in got and got[(0, 3)] == 1.0
    assert (0, 1) in got and 0.5 <= got[(0, 1)] < 1.0
    assert all(2 not in pair for pair in got)


def test_jaccard_prefix_join_exact_threshold_boundary(spark):
    """Float-ceil regression: 63-token sets sharing exactly 56 shingles have
    Jaccard 56/70 = 0.8 exactly. In double precision 2t/(1+t)*63 evaluates
    to 56.000000000000007, so a naive ceil() makes the probing prefix one
    too short — and the 7 unique tokens (df=1) sort FIRST in rarity order,
    so the too-short prefix holds no common token and the true pair was
    silently dropped before verify. The te = t - 1e-6 slack bounds must
    keep it."""
    from experimentsplan_datapipeline_spark.operators.dedup import (
        jaccard_prefix_join,
    )

    shared = [f"common{i:02d}" for i in range(56)]
    doc_a = " ".join(shared + [f"onlya{i}" for i in range(7)])
    doc_b = " ".join(shared + [f"onlyb{i}" for i in range(7)])
    df = spark.createDataFrame([(0, doc_a), (1, doc_b)], ["doc_id", "text"])
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in jaccard_prefix_join(
            df, "text", "doc_id", shingle_size=1, threshold=0.8
        ).collect()
    }
    assert got == {(0, 1): 0.8}


def test_containment_exact_threshold_boundary(spark):
    """Containment twin of the float-ceil regression: |x| = 5 sharing 4
    tokens with the container is containment 4/5 = 0.8 exactly, but
    double(0.8)*5 = 4.0000000000000002 -> naive ceil gives need = 5 and the
    true pair is dropped; the slack bound must keep it."""
    from experimentsplan_datapipeline_spark.operators.dedup import (
        containment_prefix_join,
    )

    inner = "aa bb cc dd ee"
    outer = "aa bb cc dd " + " ".join(f"pad{i}" for i in range(20))
    df = spark.createDataFrame([(0, inner), (1, outer)], ["doc_id", "text"])
    got = {
        (r.id_inner, r.id_outer): r.containment
        for r in containment_prefix_join(
            df, "text", "doc_id", shingle_size=1, threshold=0.8
        ).collect()
    }
    assert got[(0, 1)] == 0.8
    assert (1, 0) not in got  # directional: the container is not contained


def test_pq_encode_and_adc_ranking(spark):
    from experimentsplan_datapipeline_spark.operators.similarity import (
        pq_codebooks_from_corpus,
        pq_encode,
        pq_topk,
        pq_train,
    )

    # two tight clusters in 4-dim space, m=2 subspaces
    a = [1.0, 1.0, 0.0, 0.0]
    b = [0.0, 0.0, 1.0, 1.0]
    rows = [
        (0, a), (1, [x + 0.01 for x in a]), (2, [x + 0.02 for x in a]),
        (3, b), (4, [x + 0.01 for x in b]), (5, [x + 0.02 for x in b]),
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    books = pq_codebooks_from_corpus(emb, "vec_id", "embedding", 4, 2, 4)
    assert len(books) == 2 and all(len(cb) == 4 for cb in books)

    codes = {
        r.vec_id: list(r.codes)
        for r in pq_encode(emb, "vec_id", "embedding", books).collect()
    }
    assert all(len(c) == 2 for c in codes.values())
    # a query from cluster A must rank all A members above all B members
    out = pq_topk(
        emb, emb.filter(F.col("vec_id") == 0), "vec_id", "vec_id",
        "embedding", books, k=6,
    ).collect()
    ranked = [r.vec_id for r in sorted(out, key=lambda r: r.rank)]
    assert set(ranked[:3]) == {0, 1, 2}
    assert [r.adist for r in sorted(out, key=lambda r: r.rank)] == sorted(
        r.adist for r in out
    )

    # trained codebooks are deterministic and slot into the same search
    t1 = pq_train(emb, "vec_id", "embedding", 4, m=2, ksub=2, iters=2)
    t2 = pq_train(emb, "vec_id", "embedding", 4, m=2, ksub=2, iters=2)
    assert t1 == t2
    out_t = pq_topk(
        emb, emb.filter(F.col("vec_id") == 3), "vec_id", "vec_id",
        "embedding", t1, k=3,
    ).collect()
    assert set(r.vec_id for r in out_t) == {3, 4, 5}


def test_ivfpq_full_probe_matches_flat_pq(spark):
    """Probing ALL cells makes IVF-PQ rank exactly like flat PQ ADC."""
    import math

    from experimentsplan_datapipeline_spark.operators.similarity import (
        ivfpq_topk,
        pq_codebooks_from_corpus,
        pq_topk,
    )

    rows = [
        (i, [math.cos(i * 0.7), math.sin(i * 0.7),
             math.cos(i * 1.3), math.sin(i * 1.3)])
        for i in range(12)
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    books = pq_codebooks_from_corpus(emb, "vec_id", "embedding", 4, 2, 4)
    qs = emb.filter(F.col("vec_id") < 2)
    flat = {
        (r.vec_id_q, r.rank): r.vec_id
        for r in pq_topk(emb, qs, "vec_id", "vec_id", "embedding", books, k=5).collect()
    }
    ivfpq = {
        (r.vec_id_q, r.rank): r.vec_id
        for r in ivfpq_topk(
            emb, qs, "vec_id", "vec_id", "embedding", books,
            k=5, n_cells=6, n_probe=6,
        ).collect()
    }
    assert ivfpq == flat


def test_pq_index_arrow_matches_expression_path(spark):
    """The Arrow-vectorized index build must produce the exact codes, cells,
    and final rankings of the Catalyst expression form."""
    from experimentsplan_datapipeline_spark.operators.similarity import (
        ivfpq_topk,
        pq_codebooks_from_corpus,
        pq_topk,
    )

    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .withColumn("embedding", F.transform("embedding", lambda x: x.cast("double")))
        .filter(F.col("vec_id") < 400)
    )
    books = pq_codebooks_from_corpus(emb, "vec_id", "embedding", 64, 4, 8)
    queries = emb.filter(F.col("vec_id") < 3)

    def key(rows):
        return sorted((r.vec_id_q, r.vec_id, r.adist, r.rank) for r in rows)

    fast = key(pq_topk(emb, queries, "vec_id", "vec_id", "embedding", books,
                       k=5, arrow=True).collect())
    slow = key(pq_topk(emb, queries, "vec_id", "vec_id", "embedding", books,
                       k=5, arrow=False).collect())
    assert fast == slow and len(fast) == 15

    fast_i = key(ivfpq_topk(emb, queries, "vec_id", "vec_id", "embedding",
                            books, k=5, n_cells=8, n_probe=2,
                            arrow=True).collect())
    slow_i = key(ivfpq_topk(emb, queries, "vec_id", "vec_id", "embedding",
                            books, k=5, n_cells=8, n_probe=2,
                            arrow=False).collect())
    assert fast_i == slow_i and fast_i


def test_minhash_coeffs_well_distributed():
    """Affine family sanity: coefficients deterministic, in range, and free
    of the old (2i+1, 7i+3) linear ladder (adjacent a's differing by a
    constant would correlate the K min-estimates)."""
    from experimentsplan_datapipeline_spark.operators.dedup import (
        _MINHASH_PRIME,
        minhash_coeffs,
    )

    c1 = minhash_coeffs(32)
    assert c1 == minhash_coeffs(32)  # deterministic
    assert len({a for a, _ in c1}) == 32 and len({b for _, b in c1}) == 32
    assert all(1 <= a < _MINHASH_PRIME and 0 <= b < _MINHASH_PRIME for a, b in c1)
    gaps = {c1[i + 1][0] - c1[i][0] for i in range(len(c1) - 1)}
    assert len(gaps) > 1  # not an arithmetic progression


def test_minhash_lsh_finds_near_dups(spark):
    """Behavioral regression across the coefficient change: duplicate text
    pairs, dissimilar text stays unpaired."""
    from experimentsplan_datapipeline_spark.operators.dedup import minhash_lsh_dedup

    base = "the quick brown fox jumps over the lazy dog again and again today"
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base + " extra"),
            (3, "completely different words about spark query planning at scale"),
        ],
        ["doc_id", "text"],
    )
    pairs = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_dedup(
            docs, "text", "doc_id", num_hashes=32, bands=8, threshold=0.5
        ).collect()
    }
    assert (1, 2) in pairs
    assert all(3 not in p for p in pairs)


def test_minhash_incremental(spark):
    """The ingest gate flags batch docs duplicating the corpus, never
    corpus-internal pairs (docs 1 and 2 duplicate each other but are both
    corpus-side), and passes genuinely new text through."""
    from experimentsplan_datapipeline_spark.operators.dedup import (
        minhash_lsh_incremental,
    )

    base = "the quick brown fox jumps over the lazy dog again and again today"
    other = "completely different words about spark query planning at scale"
    corpus = spark.createDataFrame(
        [(1, base), (2, base), (3, other)], ["doc_id", "text"]
    )
    batch = spark.createDataFrame(
        [(10, base + " extra"), (11, "fresh novel content nobody wrote before now ok")],
        ["doc_id", "text"],
    )
    got = {
        (r.batch_id, r.corpus_id)
        for r in minhash_lsh_incremental(
            corpus, batch, "text", "doc_id", threshold=0.5
        ).collect()
    }
    assert (10, 1) in got and (10, 2) in got
    assert all(b != 11 for b, _ in got)      # novel doc passes
    assert all(b in (10, 11) for b, _ in got)  # only batch ids on the left


def test_dedup_lines_rewrite_hand_checked(spark):
    """First occurrence wins corpus-wide (smallest doc, then smallest
    position); later copies vanish from the rebuilt text; in-doc
    duplicates keep only their first; order of survivors is preserved;
    a fully-duplicated doc rewrites to ''."""
    from experimentsplan_datapipeline_spark.operators.dedup import (
        dedup_lines_rewrite,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha\nbeta\nalpha\ngamma"),  # in-doc dup of alpha
            (2, "beta\ndelta"),                 # beta already in doc 1
            (3, "alpha\nbeta"),                 # fully duplicated
            (4, ""),                            # no lines at all
        ],
        ["doc_id", "text"],
    )
    got = {
        r.doc_id: (r.n_lines, r.n_kept, r.clean_text)
        for r in dedup_lines_rewrite(docs, "doc_id", "text").collect()
    }
    assert got[1] == (4, 3, "alpha\nbeta\ngamma")
    assert got[2] == (2, 1, "delta")
    assert got[3] == (2, 0, "")
    assert got[4] == (0, 0, "")


def test_minhash_estimate_contract(spark):
    """Sketch contract: an exact duplicate pair must carry est = exact = 1.0
    (every minhash component agrees when shingle sets are identical) with
    abs_err 0 and ok=True; near-dup pairs must estimate within the stated
    error band; est is always a multiple of 1/K."""
    from experimentsplan_datapipeline_spark.operators.dedup import (
        minhash_estimate_pairs,
    )

    base = "the quick brown fox jumps over the lazy dog again and again today"
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base),  # exact duplicate of 1
            (3, base + " with a small extra tail"),
            (4, "completely different words about spark query planning at scale"),
        ],
        ["doc_id", "text"],
    )
    rows = {
        (r.id_a, r.id_b): r
        for r in minhash_estimate_pairs(
            docs, "text", "doc_id", num_hashes=32, bands=8
        ).collect()
    }
    dup = rows[(1, 2)]
    assert dup.est_jaccard == 1.0
    assert dup.exact_jaccard == 1.0
    assert dup.abs_err == 0.0 and dup.ok
    for r in rows.values():
        assert abs(r.est_jaccard * 32 - round(r.est_jaccard * 32)) < 1e-9
        assert r.ok == (r.abs_err <= 0.3)
        assert abs(abs(r.est_jaccard - r.exact_jaccard) - r.abs_err) < 1e-6


def test_semantic_dedup_pairs_cell_bounded(spark):
    """SemDeDup: near-identical vectors pair; cross-cell pairs never appear
    even when cosine clears the threshold."""
    from experimentsplan_datapipeline_spark.operators.dedup import (
        semantic_dedup_pairs,
    )

    rows = [
        (0, [1.0, 0.0, 0.0]),   # centroid A
        (1, [0.0, 1.0, 0.0]),   # centroid B
        (10, [0.99, 0.1, 0.0]),  # cell A
        (11, [0.98, 0.12, 0.0]), # cell A, near-dup of 10
        (20, [0.1, 0.99, 0.0]),  # cell B
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cents = [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0])]
    pairs = {
        (r.id_a, r.id_b): r.cell
        for r in semantic_dedup_pairs(
            emb, "vec_id", "embedding", cents, threshold=0.95
        ).collect()
    }
    assert (10, 11) in pairs and pairs[(10, 11)] == 0
    assert (0, 10) in pairs  # centroid row itself lands in its cell
    # 20 sits in cell B: no pair with the cell-A members despite any cosine
    assert all(not (a == 20 or b == 20) or (a, b) == (1, 20) for a, b in pairs)


def test_ivf_trained_deterministic_across_partitionings(spark):
    """kmeans_lite's rounded fixpoint must give identical centroids — and
    identical search results — regardless of input partitioning."""
    from experimentsplan_datapipeline_spark.operators.similarity import (
        ivf_topk,
        kmeans_lite,
    )

    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .withColumn("embedding", F.transform("embedding", lambda x: x.cast("double")))
        .filter(F.col("vec_id") < 300)
    )
    c1 = kmeans_lite(emb.repartition(2), "vec_id", "embedding", k=4, iters=2)
    c2 = kmeans_lite(emb.repartition(13), "vec_id", "embedding", k=4, iters=2)
    assert c1 == c2
    queries = emb.filter(F.col("vec_id") < 2)
    r1 = sorted(
        (r.vec_id_q, r.rank, r.vec_id)
        for r in ivf_topk(emb, queries, "vec_id", "vec_id", "embedding",
                          k=5, centroids=c1).collect()
    )
    r2 = sorted(
        (r.vec_id_q, r.rank, r.vec_id)
        for r in ivf_topk(emb.repartition(7), queries, "vec_id", "vec_id",
                          "embedding", k=5, centroids=c2).collect()
    )
    assert r1 == r2 and r1


def test_lm_perplexity_hand_computed(spark):
    import math

    from experimentsplan_datapipeline_spark.operators.text_analysis import (
        lm_perplexity,
    )

    # train half: "a b a" -> unigrams a:2 b:1 (T=3); bigrams (a,b):1 (b,a):1
    df = spark.createDataFrame(
        [(1, "a b a", True), (2, "a b c", False), (3, "c a", False),
         (4, "z", False)],
        ["id", "txt", "is_train"],
    )
    rows = {
        r.id: r
        for r in lm_perplexity(df, "id", "txt", F.col("is_train")).collect()
    }
    # doc 2: (a,b) seen -> 1/2; (b,c) OOV -> 0.4/3
    want2 = (-math.log(0.5) - math.log(0.4 / 3)) / 2
    assert rows[2].avg_nll == round(want2, 6)
    assert rows[2].ppl == round(math.exp(want2), 6)
    assert rows[2].n_trans == 2
    # doc 3: (c,a) unseen bigram, a in train -> backoff 0.4*2/3
    want3 = -math.log(0.4 * 2 / 3)
    assert rows[3].avg_nll == round(want3, 6)
    # doc 1 scores itself: (a,b) -> 1/2, (b,a) -> 1/1
    want1 = (-math.log(0.5) - math.log(1.0)) / 2
    assert rows[1].avg_nll == round(want1, 6)
    # doc 4 has no transitions -> absent
    assert 4 not in rows


def _lev(a, b):
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[len(b)]


def test_editdist_join_matches_brute_force(spark):
    import itertools
    import random

    from experimentsplan_datapipeline_spark.operators.dedup import (
        editdist_prefix_join,
    )

    rng = random.Random(7)
    alpha = "abcde"
    strs = ["".join(rng.choice(alpha) for _ in range(rng.randint(0, 12)))
            for _ in range(40)]
    for s in list(strs)[:20]:
        t = list(s)
        for _ in range(rng.randint(1, 2)):
            op, pos = rng.choice("ids"), rng.randint(0, max(len(t) - 1, 0))
            if op == "i":
                t.insert(pos, rng.choice(alpha))
            elif t and op == "d":
                del t[pos]
            elif t:
                t[pos] = rng.choice(alpha)
        strs.append("".join(t))
    rows = [(i, s) for i, s in enumerate(sorted(set(strs)))]
    want = sorted(
        (i, j, _lev(a, b))
        for (i, a), (j, b) in itertools.combinations(rows, 2)
        if _lev(a, b) <= 2
    )
    df = spark.createDataFrame(rows, ["sid", "s"])
    got = sorted(
        tuple(r)
        for r in editdist_prefix_join(df, "s", "sid", q=2, max_dist=2)
        .collect()
    )
    assert got == want and want  # non-vacuous: mutations guarantee pairs


def test_editdist_join_short_string_routes(spark):
    """Covers the gram-free paths: empty/1-char strings (no q-grams at
    q=2), both-short pairs that only the length-band route can find, and
    the regression where the band join's in-join id order lost pairs whose
    SHORTER string carries the LARGER id (bands only look upward in
    length, so orientation must happen after the join)."""
    from experimentsplan_datapipeline_spark.operators.dedup import (
        editdist_prefix_join,
    )

    rows = [
        (1, ""),        # no grams
        (2, "a"),       # no grams; lev("","a")=1
        (3, "ab"),      # 1 gram
        (4, "abcdef"),  # long side of a mixed pair
        (5, "abdef"),   # lev vs 4 = 1 (delete c)
        (7, "b"),       # larger id, SHORTER than id 3: band must look down
    ]
    df = spark.createDataFrame(rows, ["sid", "s"])
    got = sorted(
        tuple(r)
        for r in editdist_prefix_join(df, "s", "sid", q=2, max_dist=2)
        .collect()
    )
    want = sorted(
        (i, j, _lev(a, b))
        for (i, a) in rows for (j, b) in rows
        if i < j and _lev(a, b) <= 2
    )
    assert got == want
    assert (3, 7, 1) in got  # the orientation regression pair
    assert (4, 5, 1) in got  # mixed short/long via the gram route


def test_editdist_short_band_bounded_by_distinct_values(spark):
    """Adversarial duplicate-heavy corpus: the short-string band must
    generate candidates between DISTINCT VALUES, so 100 copies each of a
    few short strings yield exactly the same candidate value-pair count
    as one copy each — the old per-row band made n copies x m copies of
    two NON-matching values n*m dead candidates. End-to-end output must
    still contain every duplicate-row pair (dist 0) and cross-value
    matches."""
    import itertools

    from experimentsplan_datapipeline_spark.operators.dedup import (
        _short_band_value_pairs,
        editdist_prefix_join,
    )
    from pyspark.sql import functions as F

    vals = ["ab", "ac", "xy", "q", ""]
    dup_rows = [
        (i, vals[i % len(vals)]) for i in range(500)
    ]  # 100 copies each
    uniq_rows = list(enumerate(vals))

    def shorts_frame(rows):
        df = spark.createDataFrame(rows, ["sid", "s"])
        return df.select(
            "sid", F.col("s").alias("__s"), F.length("s").alias("len")
        )

    n_dup = _short_band_value_pairs(shorts_frame(dup_rows), 2).count()
    n_uniq = _short_band_value_pairs(shorts_frame(uniq_rows), 2).count()
    assert n_dup == n_uniq  # candidate generation blind to duplication

    df = spark.createDataFrame(dup_rows, ["sid", "s"])
    got = sorted(
        tuple(r)
        for r in editdist_prefix_join(df, "s", "sid", q=2, max_dist=2)
        .collect()
    )
    want = sorted(
        (i, j, _lev(a, b))
        for (i, a), (j, b) in itertools.combinations(dup_rows, 2)
        if _lev(a, b) <= 2
    )
    assert got == want and want


def test_duplicate_substring_spans_hand_case(spark):
    from experimentsplan_datapipeline_spark.operators.dedup import (
        duplicate_substring_spans,
    )

    # shared passage "p q r s" sits mid-doc in 1 and 2; doc 3 repeats
    # its own passage internally; doc 4 shares nothing
    rows = [
        (1, "a b p q r s c d"),
        (2, "x p q r s y z w"),
        (3, "m n o k m n o k m n o k"),
        (4, "u v t e f g h i"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = sorted(
        (r.doc_id, r.span_start, r.span_end, r.span_len)
        for r in duplicate_substring_spans(
            df, "text", "doc_id", window=4
        ).collect()
    )
    # doc1: windows at pos 3 ("p q r s") duplicated (also in doc 2)
    # doc2: window at pos 2 duplicated
    # doc3: "m n o k" appears 3x internally -> windows 1..9 all
    # duplicated (every 4-gram of the periodic string repeats) -> one
    # maximal span covering tokens 1..12
    assert got == [
        (1, 3, 6, 4),
        (2, 2, 5, 4),
        (3, 1, 12, 12),
    ]


def test_duplicate_substring_spans_merges_adjacent_windows(spark):
    from experimentsplan_datapipeline_spark.operators.dedup import (
        duplicate_substring_spans,
    )

    # two docs share a 6-token passage -> with window=4 the three
    # overlapping duplicated windows must merge into ONE maximal span
    rows = [
        (1, "a b c d e f g h"),
        (2, "z a b c d e f q"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = sorted(
        (r.doc_id, r.span_start, r.span_end)
        for r in duplicate_substring_spans(
            df, "text", "doc_id", window=4
        ).collect()
    )
    assert got == [(1, 1, 6), (2, 2, 7)]


def test_random_projection_preserves_distances(spark):
    """JL property check on deterministic data: projecting 64-d to 16-d
    keeps pairwise squared distances within a loose distortion band and
    centered near 1 on average — plus exact determinism across reruns
    and partitioning."""
    import math
    import random

    from experimentsplan_datapipeline_spark.operators.similarity import (
        random_projection,
    )

    rng = random.Random(5)
    rows = [
        (i, [rng.gauss(0.0, 1.0) for _ in range(64)]) for i in range(30)
    ]
    df = spark.createDataFrame(rows, ["vid", "vec"])
    proj = {
        r.vid: r.proj
        for r in random_projection(
            df, "vec", in_dim=64, out_dim=16
        ).collect()
    }
    orig = dict(rows)

    def d2(a, b):
        return sum((x - y) ** 2 for x, y in zip(a, b))

    ratios = []
    for i in range(30):
        for j in range(i + 1, 30):
            ratios.append(
                d2(proj[i], proj[j]) / d2(orig[i], orig[j])
            )
    assert all(0.2 < r < 4.0 for r in ratios), (min(ratios), max(ratios))
    mean = sum(ratios) / len(ratios)
    assert 0.75 < mean < 1.25, mean  # E[ratio] = 1 for Rademacher JL
    again = {
        r.vid: r.proj
        for r in random_projection(
            df.repartition(7), "vec", in_dim=64, out_dim=16
        ).collect()
    }
    assert again == proj
    # scaling sanity: projection is linear
    assert all(
        abs(v) < 1e3 and not math.isnan(v)
        for p in proj.values()
        for v in p
    )


def test_cdc_chunking_is_edit_stable(spark):
    """Content-defined chunking's selling point: one inserted token
    re-chunks only its own neighborhood — all chunks outside it keep
    their hashes — while fixed-window chunking shifts every chunk after
    the edit. Boundaries depend only on adjacent token pairs, so chunks
    not containing the edit are bitwise identical."""
    import random

    from experimentsplan_datapipeline_spark.operators.text_analysis import (
        chunk_content_defined,
        chunk_documents,
    )

    rng = random.Random(31)
    words = [f"w{rng.randrange(500)}" for _ in range(300)]
    edited = words[:7] + ["inserted"] + words[7:]
    df = spark.createDataFrame(
        [(1, " ".join(words)), (2, " ".join(edited))], ["doc_id", "text"]
    )

    cdc = chunk_content_defined(df, "doc_id", "text").collect()
    h1 = [r["chunk_hash"] for r in cdc if r["doc_id"] == 1]
    h2 = [r["chunk_hash"] for r in cdc if r["doc_id"] == 2]
    preserved = len(set(h1) & set(h2))
    # every chunk except the one containing the edit survives (the
    # insertion cannot merge/split neighbors: boundaries are pairwise)
    assert preserved >= len(h1) - 2, (preserved, len(h1))
    assert len(h1) >= 10  # divisor=16 over 300 tokens: real chunking

    fixed = chunk_documents(df, "doc_id", "text", chunk_tokens=16, overlap=0)
    fx = fixed.select(
        "doc_id", F.md5("chunk_text").alias("h")
    ).collect()
    f1 = {r["h"] for r in fx if r["doc_id"] == 1}
    f2 = {r["h"] for r in fx if r["doc_id"] == 2}
    # fixed windows: everything after the edit point shifts
    assert len(f1 & f2) <= 2, len(f1 & f2)


def test_centroid_drift_happy_path_and_ragged_guard(spark):
    """ADVICE r9: ragged / null-bearing vectors must raise, not silently
    misreport n and misalign dims; uniform vectors still work."""
    from experimentsplan_datapipeline_spark.operators.similarity import (
        embedding_centroid_drift,
    )

    ok = spark.createDataFrame(
        [("a", [1.0, 0.0]), ("a", [1.0, 2.0]), ("b", [0.0, 1.0])],
        ["sl", "vec"],
    )
    rows = {
        (r["slice_a"], r["slice_b"]): r
        for r in embedding_centroid_drift(ok, "vec", "sl").collect()
    }
    r = rows[("a", "b")]
    assert (r["n_a"], r["n_b"]) == (2, 1)
    # centroid_a = (1, 1), centroid_b = (0, 1) -> cos = 1/sqrt(2)
    assert abs(r["centroid_cosine"] - 1 / math.sqrt(2)) < 1e-6

    ragged = spark.createDataFrame(
        [("a", [1.0, 0.0]), ("a", [1.0]), ("b", [0.0, 1.0])],
        ["sl", "vec"],
    )
    with pytest.raises(Exception, match="ragged or null-bearing"):
        embedding_centroid_drift(ragged, "vec", "sl").collect()

    nullelem = spark.createDataFrame(
        [("a", [1.0, None]), ("a", [1.0, 2.0]), ("b", [0.0, 1.0])],
        ["sl", "vec"],
    )
    with pytest.raises(Exception, match="ragged or null-bearing"):
        embedding_centroid_drift(nullelem, "vec", "sl").collect()

    # uniform WITHIN each slice but dims disagree ACROSS slices: the
    # pair join must refuse to compare mixed dimensionalities
    mixed = spark.createDataFrame(
        [("a", [1.0, 0.0]), ("b", [0.0, 1.0, 3.0])], ["sl", "vec"]
    )
    with pytest.raises(Exception, match="disagree on embedding dim"):
        embedding_centroid_drift(mixed, "vec", "sl").collect()


def _py_bpe_train(texts, n_merges):
    """Pure-Python reference: Sennrich-style BPE with all-adjacent-position
    pair counts and greedy left-to-right merge application."""
    from collections import Counter

    wc = Counter()
    for t in texts:
        for w in t.strip().lower().split():
            if w:
                wc[w] += 1
    words = {w: [ch for ch in w] for w in wc}
    merges = []
    for _ in range(n_merges):
        pc = Counter()
        for w, syms in words.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += wc[w]
        if not pc:
            return merges, words, wc
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append((best[0], best[1], pc[best]))
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and (syms[i], syms[i + 1]) == best
                ):
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges, words, wc


def test_bpe_train_matches_python_reference(spark):
    from experimentsplan_datapipeline_spark.operators.text_analysis import (
        bpe_train,
        bpe_tokenize,
    )

    texts = [
        "low low low lower lowest newest newest widest",
        "the cat sat on the mat the cat ran",
        "banana bandana cabana banana banana",
        "low newest wide wide wider widest",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               ["doc_id", "text"])
    n = 10
    got_df, got_merges = bpe_train(df, "text", n)
    exp_merges, exp_words, wc = _py_bpe_train(texts, n)
    assert got_merges == [(l, r) for l, r, _ in exp_merges]
    rows = got_df.orderBy("merge_rank").collect()
    assert [
        (r["merge_rank"], r["lhs"], r["rhs"], r["pair_count"]) for r in rows
    ] == [(i, l, r, c) for i, (l, r, c) in enumerate(exp_merges)]

    # the vocabulary under the learned merges must match the reference's
    # final symbolization, symbol by symbol
    from collections import Counter

    from experimentsplan_datapipeline_spark.operators.text_analysis import (
        bpe_vocab,
    )

    exp_vocab = Counter()
    for w, syms in exp_words.items():
        for sym in syms:
            exp_vocab[sym] += wc[w]
    got_vocab = {
        r["symbol"]: r["token_count"]
        for r in bpe_vocab(df, "text", got_merges).collect()
    }
    assert got_vocab == dict(exp_vocab)

    # tokenize with the learned table must match the reference's final
    # symbolization lengths, word by word
    tok = {
        r["doc_id"]: (r["n_words"], r["n_tokens"])
        for r in bpe_tokenize(df, "doc_id", "text", got_merges).collect()
    }
    for i, t in enumerate(texts):
        words = [w for w in t.strip().lower().split() if w]
        exp_tokens = sum(len(exp_words[w]) for w in words)
        assert tok[i] == (len(words), exp_tokens), (i, tok[i])


def test_bpe_train_overlapping_pairs_greedy(spark):
    """'aaaa' with merge (a,a): counting sees 3 adjacent positions,
    application merges greedily to [aa, aa] — the delimiter encoding
    must not lose the second merge to a shared boundary."""
    from experimentsplan_datapipeline_spark.operators.text_analysis import (
        bpe_train,
        bpe_tokenize,
    )

    df = spark.createDataFrame([(0, "aaaa aaaa ab")], ["doc_id", "text"])
    got_df, merges = bpe_train(df, "text", 2)
    rows = {r["merge_rank"]: r for r in got_df.collect()}
    # (a,a) appears 3x in each 'aaaa' (2 words) = 6; (a,b) once
    assert (rows[0]["lhs"], rows[0]["rhs"], rows[0]["pair_count"]) == ("a", "a", 6)
    # after merging: each 'aaaa' -> [aa, aa], so (aa, aa) count 2
    assert (rows[1]["lhs"], rows[1]["rhs"]) == ("aa", "aa")
    tok = bpe_tokenize(df, "doc_id", "text", merges).first()
    # aaaa->[aaaa], aaaa->[aaaa], ab->[a,b] => 4 tokens
    assert (tok["n_words"], tok["n_tokens"]) == (3, 4)


def test_bpe_train_raises_when_exhausted(spark):
    from experimentsplan_datapipeline_spark.operators.text_analysis import (
        bpe_train,
    )

    df = spark.createDataFrame([(0, "ab ab")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="exhausted"):
        bpe_train(df, "text", 5)


def test_ann_persisted_index_matches_recompute_and_append_safety(spark):
    """The persisted IVF index must return exactly what ivf_topk
    recomputes; appends validate n_cells, freeze centroids, and are
    retry-safe (a double append cannot change the top-k)."""
    import random

    from experimentsplan_datapipeline_spark.operators.similarity import (
        ann_index_drop,
        ann_index_write,
        ann_query_indexed,
        ivf_topk,
    )

    rng = random.Random(11)
    vecs = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(60)
    ]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    base = emb.filter(F.col("vec_id") >= 10)
    batch = emb.filter(F.col("vec_id") < 10)
    try:
        ann_index_write(emb, "t_ann_idx", "embedding", "vec_id", n_cells=8)
        got = sorted(
            map(
                tuple,
                ann_query_indexed(
                    emb.filter(F.col("vec_id") < 4), "t_ann_idx",
                    "vec_id", "embedding", k=5, n_probe=2,
                ).collect(),
            )
        )
        exp = sorted(
            map(
                tuple,
                ivf_topk(
                    emb, emb.filter(F.col("vec_id") < 4),
                    "vec_id", "vec_id", "embedding",
                    k=5, n_cells=8, n_probe=2,
                ).collect(),
            )
        )
        assert got == exp and got

        # append path: frozen centroids, retry-safe duplicates
        ann_index_write(base, "t_ann_idx", "embedding", "vec_id", n_cells=8)
        ann_index_write(
            batch, "t_ann_idx", "embedding", "vec_id", n_cells=8,
            mode="append",
        )
        once = sorted(
            map(
                tuple,
                ann_query_indexed(
                    batch.filter(F.col("vec_id") < 3), "t_ann_idx",
                    "vec_id", "embedding", k=5, n_probe=2,
                ).collect(),
            )
        )
        # every appended query finds itself at cosine 1.0 rank 1
        r1 = {(q, i) for q, i, cos, rk in once if rk == 1}
        assert r1 == {(0, 0), (1, 1), (2, 2)}
        ann_index_write(  # the "crashed append retried" double-apply
            batch, "t_ann_idx", "embedding", "vec_id", n_cells=8,
            mode="append",
        )
        twice = sorted(
            map(
                tuple,
                ann_query_indexed(
                    batch.filter(F.col("vec_id") < 3), "t_ann_idx",
                    "vec_id", "embedding", k=5, n_probe=2,
                ).collect(),
            )
        )
        assert twice == once

        with pytest.raises(ValueError, match="n_cells"):
            ann_index_write(
                batch, "t_ann_idx", "embedding", "vec_id", n_cells=4,
                mode="append",
            )
        with pytest.raises(ValueError, match="not found"):
            ann_query_indexed(
                batch, "t_never_an_index", "vec_id", "embedding"
            )
    finally:
        ann_index_drop(spark, "t_ann_idx")


def test_bpe_artifact_roundtrip_and_validation(spark):
    from experimentsplan_datapipeline_spark.operators.text_analysis import (
        bpe_load,
        bpe_save,
        bpe_train,
    )

    df = spark.createDataFrame(
        [(0, "low low low lower lowest newest newest")], ["doc_id", "text"]
    )
    _, merges = bpe_train(df, "text", 4)
    try:
        bpe_save(spark, merges, "t_bpe_art")
        assert bpe_load(spark, "t_bpe_art") == merges

        with pytest.raises(ValueError, match="not found"):
            bpe_load(spark, "t_bpe_never")

        # a gap in merge ranks = partial/corrupt artifact -> loud
        spark.createDataFrame(
            [(0, "a", "b"), (2, "c", "d")],
            "merge_rank int, lhs string, rhs string",
        ).write.mode("overwrite").saveAsTable("t_bpe_bad")
        with pytest.raises(ValueError, match="non-contiguous"):
            bpe_load(spark, "t_bpe_bad")
    finally:
        spark.sql("DROP TABLE IF EXISTS t_bpe_art")
        spark.sql("DROP TABLE IF EXISTS t_bpe_art_staging")
        spark.sql("DROP TABLE IF EXISTS t_bpe_bad")


def test_bpe_drops_c0_control_words(spark):
    """ADVICE r10: words containing ANY C0 control character are dropped
    from BPE training and tokenization — the engine's raw (lhs, rhs)
    tie-break and the oracle's encoded-pair tie-break only provably
    coincide when every symbol character sorts above the 0x1f closing
    delimiter."""
    from experimentsplan_datapipeline_spark.operators.text_analysis import (
        _bpe_words,
        bpe_tokenize,
    )

    df = spark.createDataFrame(
        [(1, "ab ab a\x01b a\x1eb norm")], ["doc_id", "text"]
    )
    words = {
        r["enc"] for r in _bpe_words(df, "text").collect()
    }
    # only the clean words survive (encoded per-char)
    assert words == {"\x1ea\x1f\x1eb\x1f", "\x1en\x1f\x1eo\x1f\x1er\x1f\x1em\x1f"}
    out = bpe_tokenize(df, "doc_id", "text", [("a", "b")]).first()
    assert out["n_words"] == 3  # ab, ab, norm — control-char words dropped
    assert out["n_tokens"] == 2 + 4  # (ab)(ab) merged + n o r m


class TestBpeIdsApplyPath:
    """VERDICT r10 items 1+8: the Arrow min-rank apply path must agree
    with the replace-expression chain at TOKEN-ID level on trained
    tables, stay feasible at merge counts where the chain is not, and
    tokenize every word via the UTF-8 byte fallback."""

    @staticmethod
    def _chain_symbols(spark, df, merges):
        """Per-doc symbol sequence through the SAME replace chain
        bpe_tokenize inlines (the oracle-checked sequential rank-order
        semantics), extracted from the encoded string."""
        from experimentsplan_datapipeline_spark.operators.text_analysis import (
            _BPE_C,
            _BPE_DROP_RE,
            _BPE_O,
            _tokens,
        )

        o, c = _BPE_O, _BPE_C

        def enc_word(w):
            e = F.regexp_replace(w, "(.)", f"{o}$1{c}")
            for l, r in merges:
                e = F.replace(
                    e, F.lit(f"{o}{l}{c}{o}{r}{c}"), F.lit(f"{o}{l}{r}{c}")
                )
            return e

        ws = F.filter(
            _tokens("text"), lambda w: (w != "") & ~w.rlike(_BPE_DROP_RE)
        )
        enc_all = F.concat_ws("", F.transform(ws, enc_word))
        return {
            r["doc_id"]: r["syms"]
            for r in df.select(
                "doc_id",
                F.regexp_extract_all(
                    enc_all, F.lit(f"{o}(.*?){c}"), F.lit(1)
                ).alias("syms"),
            ).collect()
        }

    @staticmethod
    def _py_sequential_ids(text, merges, vocab):
        """Pure-Python SEQUENTIAL rank-order application (the chain's
        definition): per word, each merge in rank order replaces greedy
        left-to-right over the symbol list; then map through the id
        contract with byte fallback."""
        from experimentsplan_datapipeline_spark.operators.text_analysis import (
            _py_tokens,
        )

        ids = []
        for w in _py_tokens(text):
            syms = list(w)
            for l, r in merges:
                out, i = [], 0
                while i < len(syms):
                    if (
                        i < len(syms) - 1
                        and syms[i] == l
                        and syms[i + 1] == r
                    ):
                        out.append(l + r)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            for s in syms:
                tid = vocab.get(s)
                ids.extend([tid] if tid is not None else s.encode("utf-8"))
        return ids

    @staticmethod
    def _py_bpe_train(word_counts, n_merges):
        """Pure-Python twin of bpe_train (same pair count over distinct
        words, same (count desc, lhs, rhs) tie-break, same greedy
        replace) — instant at 1k+ merges, used where a 1k-iteration
        Spark driver loop would dominate the test suite."""
        words = {tuple(w): c for w, c in word_counts.items()}
        merges = []
        for _ in range(n_merges):
            counts = {}
            for syms, cnt in words.items():
                for a, b in zip(syms, syms[1:]):
                    counts[(a, b)] = counts.get((a, b), 0) + cnt
            if not counts:
                break
            best = min(counts, key=lambda p: (-counts[p], p))
            merges.append(best)
            l, r = best
            new_words = {}
            for syms, cnt in words.items():
                out, i = [], 0
                while i < len(syms):
                    if i < len(syms) - 1 and syms[i] == l and syms[i + 1] == r:
                        out.append(l + r)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                new_words[tuple(out)] = new_words.get(tuple(out), 0) + cnt
            words = new_words
        return merges

    def test_ids_equal_chain_on_trained_table(self, spark, sf_dir):
        """Id-level equality: Arrow min-rank path == the expression
        chain's symbol sequence mapped through bpe_id_map, on the
        Spark-trained table over real documents."""
        from experimentsplan_datapipeline_spark.operators.text_analysis import (
            bpe_alphabet,
            bpe_id_map,
            bpe_tokenize_ids,
            bpe_train,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        train = docs.filter(F.col("doc_id") < 30)
        _, merges = bpe_train(train, "text", 8)
        alphabet = bpe_alphabet(train, "text")
        vocab = bpe_id_map(merges, alphabet)
        app = docs.filter(
            (F.col("doc_id") >= 30) & (F.col("doc_id") < 60)
        ).select("doc_id", "text")
        chain_syms = self._chain_symbols(spark, app, merges)
        chain_ids = {
            d: [
                i
                for s in syms
                for i in (
                    [vocab[s]] if s in vocab else list(s.encode("utf-8"))
                )
            ]
            for d, syms in chain_syms.items()
        }
        got = {
            r["doc_id"]: list(r["token_ids"])
            for r in bpe_tokenize_ids(
                app, "doc_id", "text", merges, alphabet
            ).collect()
        }
        assert got == chain_ids

    def test_min_rank_loop_feasible_at_1k_merges(self, spark):
        """The chain is plan-size-infeasible at production merge counts;
        the Arrow path is not: train 1200 merges with the pure-Python
        twin on a synthetic corpus, apply via mapInPandas, and verify
        id-level equality with the SEQUENTIAL rank-order reference on
        held-out text."""
        import random

        from experimentsplan_datapipeline_spark.operators.text_analysis import (
            bpe_id_map,
            bpe_tokenize_ids,
        )

        rng = random.Random(11)
        alpha = list("abcdefgh")
        words = {
            "".join(rng.choice(alpha) for _ in range(rng.randint(8, 30))): rng.randint(1, 9)
            for _ in range(400)
        }
        merges = [
            (l, r) for l, r in self._py_bpe_train(words, 1200)
        ]
        assert len(merges) >= 1000  # the corpus really sustains 1k merges
        vocab = bpe_id_map(merges, sorted(alpha))
        held_out = [
            (i, " ".join(rng.choice(list(words)) for _ in range(12))
             + " zzz9 éxo")  # OOV word incl. a non-ASCII char
            for i in range(20)
        ]
        df = spark.createDataFrame(held_out, ["doc_id", "text"])
        got = {
            r["doc_id"]: list(r["token_ids"])
            for r in bpe_tokenize_ids(
                df, "doc_id", "text", merges, sorted(alpha)
            ).collect()
        }
        want = {
            i: self._py_sequential_ids(t, merges, vocab) for i, t in held_out
        }
        assert got == want

    def test_multibyte_oov_falls_back_to_utf8_bytes(self, spark):
        from experimentsplan_datapipeline_spark.operators.text_analysis import (
            bpe_tokenize_ids,
        )

        df = spark.createDataFrame([(1, "ab é 中")], ["doc_id", "text"])
        row = bpe_tokenize_ids(
            df, "doc_id", "text", [("a", "b")], ["a", "b"]
        ).first()
        want = [256 + 0 + 2]  # 'ab' merge output: 256 + |alpha| + rank 0
        want = [258] + list("é".encode("utf-8")) + list(
            "中".encode("utf-8")
        )
        assert list(row["token_ids"]) == want
        assert row["n_tokens"] == len(want)

    def test_alphabet_artifact_roundtrip(self, spark, sf_dir):
        from experimentsplan_datapipeline_spark.operators.text_analysis import (
            bpe_alphabet,
            bpe_load,
            bpe_load_alphabet,
            bpe_save,
            bpe_train,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        train = docs.filter(F.col("doc_id") < 20)
        _, merges = bpe_train(train, "text", 4)
        alphabet = bpe_alphabet(train, "text")
        try:
            bpe_save(spark, merges, "t_bpe_art", alphabet=alphabet)
            assert bpe_load(spark, "t_bpe_art") == merges
            assert bpe_load_alphabet(spark, "t_bpe_art") == alphabet
            # contiguity validation: corrupt one index and reload
            from experimentsplan_datapipeline_spark.operators.dedup import (
                _swap_in_table,
            )

            bad = [
                (i + (5 if i == 1 else 0), ch)
                for i, ch in enumerate(alphabet)
            ]
            _swap_in_table(
                spark,
                spark.createDataFrame(bad, "ord_idx int, ch string"),
                "t_bpe_art_alpha",
            )
            with pytest.raises(ValueError, match="non-contiguous"):
                bpe_load_alphabet(spark, "t_bpe_art")
        finally:
            for s in ("", "_alpha", "_staging", "_prev", "_alpha_staging",
                      "_alpha_prev"):
                spark.sql(f"DROP TABLE IF EXISTS t_bpe_art{s}")


def test_semantic_dedup_clustered_finds_planted_pairs(spark):
    """SemDeDup path: planted duplicate vectors must land in one cluster
    and surface as a (keep=smaller id, drop=larger id) pair at cosine
    1.0; far-apart vectors must not pair. Cluster-bounded search: a
    pair split across clusters is by construction invisible — the
    planted twins are identical, so they can never split."""
    import math

    from experimentsplan_datapipeline_spark.operators.similarity import (
        semantic_dedup_clustered,
    )

    base = [
        (i, [math.sin(i * 1.3 + d) for d in range(8)]) for i in range(20)
    ]
    planted = [(100, list(base[5][1])), (101, list(base[12][1]))]
    emb = spark.createDataFrame(
        base + planted, "vec_id long, embedding array<double>"
    )
    pairs = {
        (r["keep_id"], r["drop_id"]): r["cosine"]
        for r in semantic_dedup_clustered(
            emb, "vec_id", "embedding", k=4, iters=1, threshold=0.999
        ).collect()
    }
    assert pairs.get((5, 100)) == 1.0
    assert pairs.get((12, 101)) == 1.0
    # identical twins only — nothing else reaches 0.999
    assert set(pairs) == {(5, 100), (12, 101)}


def test_keyword_tag_overlap_boundaries_and_multitag(spark):
    """keyword_tag counts OVERLAPPING bigram occurrences, matches on
    token boundaries only (no substring hits), and a phrase listed
    under two tags counts toward both."""
    from experimentsplan_datapipeline_spark.operators.text_analysis import (
        keyword_tag,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b a b a"),          # "a b" overlaps twice
            (2, "fastest scanner"),    # substrings must NOT match
            (3, "Hash  JOIN and scan"),  # case/whitespace normalized
        ],
        ["doc_id", "text"],
    )
    tags = {
        "x": ["a b"],
        "j": ["hash join", "scan"],
        "k": ["scan"],
    }
    got = {
        (r.doc_id, r.tag): r.n_matches
        for r in keyword_tag(docs, "doc_id", "text", tags).collect()
    }
    assert got == {
        (1, "x"): 2,
        (3, "j"): 2,   # "hash join" + "scan"
        (3, "k"): 1,
    }


def test_keyword_tag_rejects_long_phrases(spark):
    from experimentsplan_datapipeline_spark.operators.text_analysis import (
        keyword_tag,
    )

    docs = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        keyword_tag(docs, "doc_id", "text", {"t": ["a b c"]})


def test_winnow_guaranteed_detection_and_density(spark):
    """The winnowing guarantee: two documents sharing a token run of
    length >= w + k - 1 (= 6 for k=3, w=4) select at least one identical
    fingerprint; selections never exceed one per window; and the
    rightmost-min tie-break picks the LAST position among equal hashes."""
    from experimentsplan_datapipeline_spark.operators.text_analysis import (
        winnow_fingerprints,
    )

    shared = "q w e r t y"  # 6 tokens = w + k - 1
    docs = spark.createDataFrame(
        [
            (1, f"a b c d {shared} f g"),
            (2, f"h i {shared} j k l m"),
            (3, "zz zz zz zz zz zz"),  # all grams identical -> ties
        ],
        ["doc_id", "text"],
    )
    fps = winnow_fingerprints(docs, "doc_id", "text", k=3, w=4).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r.doc_id, set()).add((r.pos, r.fp))
    h1 = {fp for _, fp in by_doc[1]}
    h2 = {fp for _, fp in by_doc[2]}
    assert h1 & h2, "shared 6-token run must share a fingerprint"
    # doc 3: 4 identical grams -> one window -> rightmost position wins
    assert by_doc[3] == {(4, next(fp for _, fp in by_doc[3]))}
    # density: one selection per window max, dedup can only shrink
    for doc_id, text in ((1, 12), (2, 13)):
        n_windows = (text - 2) - 3  # grams - (w - 1)
        assert len(by_doc[doc_id]) <= n_windows


def test_winnow_short_docs_emit_nothing(spark):
    from experimentsplan_datapipeline_spark.operators.text_analysis import (
        winnow_fingerprints,
    )

    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b c d e")],  # 2 toks < k; 3 grams < w
        ["doc_id", "text"],
    )
    assert winnow_fingerprints(docs, "doc_id", "text", k=3, w=4).count() == 0


def test_hard_negatives_excludes_near_dups_picks_closest(spark):
    """The mined negative is the most-similar neighbor BELOW the dup
    threshold: an exact duplicate (cosine 1.0) must never be chosen, and
    among eligible candidates the highest-cosine (min-id on ties) wins.
    n_planes=0-style all-bucket setup: one plane bucket is forced by
    using vectors in the same halfspace of every plane via dim=4 and a
    shared positive first coordinate."""
    import math

    from experimentsplan_datapipeline_spark.operators.similarity import (
        hard_negatives,
    )

    # vectors chosen so all land in the same hyperplane bucket with high
    # probability is NOT assumed — instead verify against a brute-force
    # recomputation restricted to same-bucket pairs.
    base = [
        (i, [math.cos(i * 0.8 + d) + 2.0 for d in range(8)])
        for i in range(12)
    ]
    twin = [(100, list(base[3][1]))]  # exact dup of id 3
    emb = spark.createDataFrame(
        base + twin, "vec_id long, embedding array<double>"
    )
    got = {
        r.vec_id: (r.neg_id, r.cosine)
        for r in hard_negatives(
            emb, "vec_id", "embedding", dim=8, n_planes=2,
            dup_threshold=0.999,
        ).collect()
    }
    # the exact twin pair (3, 100) must not appear as each other's negative
    if 3 in got:
        assert got[3][0] != 100 and got[3][1] < 0.999
    if 100 in got:
        assert got[100][0] != 3 and got[100][1] < 0.999
    # every reported cosine respects the exclusion bound
    for vid, (nid, c) in got.items():
        assert c < 0.999 and nid != vid


def test_contrastive_triplets_semihard_rule(spark):
    """Triplets obey FaceNet's semi-hard rule: pos is the top-1
    neighbor, neg the best candidate at least `margin` below it, so
    neg_cos < pos_cos - margin and neg != pos always; anchors whose
    bucket holds no such candidate emit nothing."""
    import math

    from experimentsplan_datapipeline_spark.operators.similarity import (
        contrastive_triplets,
    )

    base = [
        (i, [math.cos(i * 0.8 + d) + 2.0 for d in range(8)])
        for i in range(10)
    ]
    twin = [(100, list(base[2][1]))]  # exact dup of id 2 -> its positive
    emb = spark.createDataFrame(
        base + twin, "vec_id long, embedding array<double>"
    )
    rows = contrastive_triplets(
        emb, "vec_id", "embedding", dim=8, n_planes=2, margin=0.05
    ).collect()
    assert rows, "bucketed candidates must yield at least one triplet"
    by_id = {r.vec_id: r for r in rows}
    for r in rows:
        assert r.neg_cos < r.pos_cos - 0.05
        assert r.neg_id != r.pos_id
        assert r.vec_id not in (r.pos_id, r.neg_id)
    if 2 in by_id:
        assert by_id[2].pos_id == 100 and by_id[2].pos_cos == 1.0


def test_miners_cell_path_and_string_ids(spark):
    """The trained-cell candidate pass (VERDICT r11 item 1) and the
    string-id-safe tie-break (ADVICE r11): with hand-built cells and
    STRING ids, hard_negatives still returns non-NULL neighbors, and a
    genuine cosine tie breaks to the LEXICOGRAPHICALLY smaller id (the
    old max(struct(c, -id)) cast string ids to double -> NULL)."""
    from experimentsplan_datapipeline_spark.operators.similarity import (
        hard_negatives,
    )

    # b and c are identical vectors -> for anchor a they tie on cosine;
    # all three share cell 0 (single-cell codebook = all-pairs candidates)
    emb = spark.createDataFrame(
        [
            ("a", [1.0, 0.2, 0.0, 0.0]),
            ("b", [0.9, 0.1, 0.1, 0.0]),
            ("c", [0.9, 0.1, 0.1, 0.0]),
        ],
        "vec_id string, embedding array<double>",
    )
    cells = [(0, [0.0, 0.0, 0.0, 0.0])]
    got = {
        r.vec_id: (r.neg_id, r.cosine)
        for r in hard_negatives(
            emb, "vec_id", "embedding", dup_threshold=0.999, cells=cells
        ).collect()
    }
    assert got["a"][0] == "b", got  # tie (b, c) -> min id wins
    assert all(nid is not None for nid, _ in got.values())
    # b's top candidate is c (cosine 1.0) but that's a dup -> falls to a
    assert got["b"][0] == "a" and got["b"][1] < 0.999


def test_triplets_cell_path_semihard(spark):
    """contrastive_triplets under a trained codebook keeps the semi-hard
    invariants; candidates never cross cells (an anchor whose only
    neighbors sit in the other cell emits nothing)."""
    from experimentsplan_datapipeline_spark.operators.similarity import (
        contrastive_triplets,
        kmeans_lite,
    )

    # two tight clusters around +x and +y; ids 0..2 near +x, 10..12 near +y
    rows = [
        (0, [1.0, 0.00, 0.0, 0.0]),
        (1, [1.0, 0.05, 0.0, 0.0]),
        (2, [1.0, 0.40, 0.0, 0.0]),
        (10, [0.0, 1.00, 0.0, 0.0]),
        (11, [0.05, 1.0, 0.0, 0.0]),
        (12, [0.40, 1.0, 0.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cells = kmeans_lite(emb, "vec_id", "embedding", k=2, iters=2)
    out = contrastive_triplets(
        emb, "vec_id", "embedding", margin=0.01, cells=cells
    ).collect()
    assert out, "within-cluster candidates must yield triplets"
    xs = {0, 1, 2}
    for r in out:
        same = xs if r.vec_id in xs else {10, 11, 12}
        assert r.pos_id in same and r.neg_id in same  # never cross-cell
        assert r.neg_cos < r.pos_cos - 0.01
        assert r.vec_id not in (r.pos_id, r.neg_id)


def test_recall_contracts_bounds_and_perfect_case(spark):
    """cell_recall_at1 == 1.0 when every anchor's true top-1 shares its
    cell by construction; bucket_recall_at1 stays in [0, 1] and keys one
    row per plane count."""
    from experimentsplan_datapipeline_spark.operators.similarity import (
        bucket_recall_at1,
        cell_recall_at1,
        kmeans_lite,
    )

    rows = [
        (0, [1.0, 0.00, 0.0, 0.0]),
        (1, [1.0, 0.05, 0.0, 0.0]),
        (10, [0.0, 1.00, 0.0, 0.0]),
        (11, [0.05, 1.0, 0.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cells = kmeans_lite(emb, "vec_id", "embedding", k=2, iters=2)
    r = cell_recall_at1(emb, emb, "vec_id", "embedding", cells).collect()[0]
    assert r.n_anchors == 4 and r.recall_at_1 == 1.0 and r.k_cells == 2
    br = bucket_recall_at1(
        emb, emb, "vec_id", "embedding", dim=4, plane_counts=(1, 2)
    ).collect()
    assert sorted(x.n_planes for x in br) == [1, 2]
    for x in br:
        assert 0.0 <= x.recall_at_1 <= 1.0 and x.n_anchors == 4


def test_cell_recall_cost_curve_consistency(spark):
    """cell_recall_cost must agree point-for-point with cell_recall_at1
    on recall, report the EXACT candidate-pair count _miner_candidates
    emits at each n_probe, be monotone non-decreasing in recall along
    the ladder, and reach recall 1.0 / all-pairs cost at n_probe = k."""
    import math

    from experimentsplan_datapipeline_spark.operators import similarity as sim

    emb = spark.createDataFrame(
        [
            (i, [math.sin(i * 1.3 + d) + 0.2 * (i % 4) for d in range(6)])
            for i in range(40)
        ],
        "vec_id long, embedding array<double>",
    )
    cells = sim.kmeans_lite(emb, "vec_id", "embedding", k=4, iters=2)
    anchors = emb.filter(F.col("vec_id") < 15)
    curve = {
        r.n_probe: r
        for r in sim.cell_recall_cost(
            emb, anchors, "vec_id", "embedding", cells, n_probes=(1, 2, 4)
        ).collect()
    }
    assert sorted(curve) == [1, 2, 4]
    for p, row in curve.items():
        single = sim.cell_recall_at1(
            emb, anchors, "vec_id", "embedding", cells, n_probe=p
        ).collect()[0]
        assert row.recall_at_1 == single.recall_at_1, p
        assert row.n_anchors == single.n_anchors == 15
        n_cand = sim._miner_candidates(
            emb, "vec_id", "embedding", 6, 4, 42, cells, n_probe=p
        ).count()
        assert row.total_candidates == n_cand, p
    assert curve[1].recall_at_1 <= curve[2].recall_at_1 <= 1.0
    assert curve[4].recall_at_1 == 1.0  # probing every cell admits all
    assert curve[4].total_candidates == 40 * 39
    assert curve[1].total_candidates < curve[2].total_candidates


def test_miner_probe_default_resolution(spark):
    """VERDICT r13 item 1: the miners' DEFAULT n_probe resolves to the
    recall-clearing setting min(8, k//2) on the trained-cell path and
    1 on the hyperplane path; an explicit value always wins; and the
    resolved default actually mines MORE candidates than the old p=1
    default (the 0.285-recall setting is now opt-in, not silent)."""
    import math

    from experimentsplan_datapipeline_spark.operators import similarity as sim

    assert sim._resolve_miner_probe(None, None) == 1  # hyperplane path
    assert sim._resolve_miner_probe([(0, [0.0])], None) == 1  # k=1 -> 1
    assert sim._resolve_miner_probe([(i, [0.0]) for i in range(4)], None) == 2
    assert sim._resolve_miner_probe([(i, [0.0]) for i in range(16)], None) == 8
    assert sim._resolve_miner_probe([(i, [0.0]) for i in range(64)], None) == 8
    assert sim._resolve_miner_probe([(i, [0.0]) for i in range(16)], 1) == 1

    emb = spark.createDataFrame(
        [
            (i, [math.cos(i * 0.9 + d) + 0.15 * (i % 5) for d in range(6)])
            for i in range(30)
        ],
        "vec_id long, embedding array<double>",
    )
    cells = sim.kmeans_lite(emb, "vec_id", "embedding", k=6, iters=2)
    # default resolves to min(8, 6//2) = 3 probes -> same frame as
    # explicit n_probe=3 and strictly more candidates than the cheap tier
    default_hn = sorted(
        map(
            tuple,
            sim.hard_negatives(
                emb, "vec_id", "embedding", cells=cells
            ).collect(),
        )
    )
    explicit_hn = sorted(
        map(
            tuple,
            sim.hard_negatives(
                emb, "vec_id", "embedding", cells=cells, n_probe=3
            ).collect(),
        )
    )
    assert default_hn == explicit_hn and default_hn
    n_default = sim._miner_candidates(
        emb, "vec_id", "embedding", 6, 4, 42, cells, 3
    ).count()
    n_cheap = sim._miner_candidates(
        emb, "vec_id", "embedding", 6, 4, 42, cells, 1
    ).count()
    assert n_default > n_cheap


def test_assign_join_path_matches_expression_path(spark, monkeypatch):
    """The large-k broadcast-table assignment (_assign_join) must agree
    with the literal-expression path value-for-value — same rounded
    distances, same min-cid tie-break, same top-n probe order — for
    kmeans_lite training, kmeans_assign, the miners, and n_probe
    explodes. Forced via the threshold so the test runs on small k."""
    import math

    from experimentsplan_datapipeline_spark.operators import similarity as sim

    emb = spark.createDataFrame(
        [
            (i, [math.cos(i * 0.7 + d) + (0.1 * (i % 3)) for d in range(8)])
            for i in range(30)
        ],
        "vec_id long, embedding array<double>",
    )
    cents_expr = sim.kmeans_lite(emb, "vec_id", "embedding", k=5, iters=2)
    hn_expr = sorted(
        map(
            tuple,
            sim.hard_negatives(
                emb, "vec_id", "embedding", cells=cents_expr
            ).collect(),
        )
    )
    assign_expr = sorted(
        map(
            tuple,
            sim.kmeans_assign(emb, "vec_id", "embedding", cents_expr)
            .collect(),
        )
    )
    probe2_expr = sorted(
        map(
            tuple,
            sim._miner_candidates(
                emb, "vec_id", "embedding", 8, 0, 42, cents_expr, 2
            ).collect(),
        )
    )
    monkeypatch.setattr(sim, "_ASSIGN_EXPR_MAX_K", 0)
    cents_join = sim.kmeans_lite(emb, "vec_id", "embedding", k=5, iters=2)
    assert cents_join == cents_expr  # training fixpoint identical
    hn_join = sorted(
        map(
            tuple,
            sim.hard_negatives(
                emb, "vec_id", "embedding", cells=cents_join
            ).collect(),
        )
    )
    assign_join = sorted(
        map(
            tuple,
            sim.kmeans_assign(emb, "vec_id", "embedding", cents_join)
            .collect(),
        )
    )
    probe2_join = sorted(
        map(
            tuple,
            sim._miner_candidates(
                emb, "vec_id", "embedding", 8, 0, 42, cents_join, 2
            ).collect(),
        )
    )
    assert hn_join == hn_expr and hn_expr
    assert assign_join == assign_expr
    assert probe2_join == probe2_expr and probe2_expr
