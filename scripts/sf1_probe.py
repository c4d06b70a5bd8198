"""sf0.1 -> sf1 scaling probe for the five most expensive headline queries.

The 2x-of-baseline gate at sf0.1 can hide superlinear candidate growth
(LSH band buckets, prefix-filter candidates, IVF cell scans), so this
script measures the sf0.1 -> sf1 wall-clock exponent directly: it
synthesizes a 10x corpus from the sf0.1 parquet (id-shifted copies;
documents get per-copy word-SHUFFLED text so the copies are not a planted
10-way near-dup cluster that no real corpus has; embeddings get a small
per-copy deterministic perturbation so vectors are distinct), then times
each query at both scales on the same session. Near-linear scaling shows
as a ratio <= ~12x (10x data + shuffle overhead); results are recorded in
BASELINE.md.

Usage: python scripts/sf1_probe.py [out_dir=/tmp/spark_graft_sf1]
"""

from __future__ import annotations

import json
import os
import random
import sys
import time

import duckdb

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SRC = "/root/testdata/sf0.1"
COPIES = 10
HEAVY = [
    "bm25_topk",
    "dedup_minhash",
    "jaccard_prefix_join",
    "containment_prefix_join",
    "ann_ivfpq",
    "join_topk_per_key",
    # the co-purchase edge build (items self-join per order) is the only
    # O(n^2 / order-key) construction in the registry; lineitem copies keep
    # per-order basket sizes constant, so edges scale ~10x and the probe
    # measures the build + 3 unrolled rounds end-to-end
    "graph_pagerank",
    # round 6: triangle counting's wedge join is the registry's only
    # O(m^1.5) bound — the probe checks the orientation really keeps it
    # near-linear when the edge set grows 10x; LPA rides the same edge
    # build with two join+top1 rounds
    "graph_triangles",
    "graph_communities",
    # round 8: the two newest shuffle-heavy ops (VERDICT r7 item 5). The
    # standard corpus is their friendly case (shuffled copies kill
    # cross-copy 8-grams; token distribution stays fixed); the ADVERSARIAL
    # regimes each get a dedicated probe below — substring spans over a
    # highly-DUPLICATED corpus (every gram repeats, every position marked)
    # and heavy hitters over near-uniform high-cardinality keys (the MG
    # summaries churn constantly and the candidate superset is pure noise)
    "dedup_substring_spans",
    "heavy_hitters_sketch",
    # round 8 second batch: the changelog MERGE (full outer join on the
    # 10x orders snapshot), the token-budget mixture (range-partition
    # prefix sums over 10x documents), and the minhash sketch contract
    # (dedup_minhash's shape plus one extra signature join onto the
    # candidates). dedup_sorted_neighborhood's registered query scans
    # `part` (held constant by the builder), so SNM gets the dedicated
    # _snm_docs probe over the scaled documents table instead.
    "merge_changelog_orders",
    "curate_mixture_token_budget",
    "minhash_jaccard_contract",
    # round 8 third batch: the source-overlap shingle self-join (pairs per
    # gram bounded by S^2, so growth must track DISTINCT (source, gram)
    # rows), the CCNet tertiles (LM scoring joins + grouped rank), the
    # composed curation cascade, and the SCD-2 interval window (key-
    # partitioned lead() — cardinality grows 10x with the snapshot).
    "corpus_source_overlap",
    "curate_perplexity_buckets",
    "curate_corpus_v2",
    "merge_scd2_history",
]


def build_sf1(out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()

    def shuffled_text(text: str, c: int) -> str:
        words = text.split()
        random.Random((c << 20) ^ len(words)).shuffle(words)
        return " ".join(words)

    # documents: shift doc_id by copy*N; copy 0 keeps original text, later
    # copies shuffle word order (kills cross-copy shingle overlap)
    docs = con.execute(
        f"SELECT * FROM '{SRC}/documents.parquet' ORDER BY doc_id"
    ).fetch_df()
    n_docs = len(docs)
    frames = []
    for c in range(COPIES):
        d = docs.copy()
        d["doc_id"] = d["doc_id"] + c * n_docs
        if c:
            d["text"] = [shuffled_text(t, c) for t in d["text"]]
        frames.append(d)
    import pandas as pd

    big_docs = pd.concat(frames, ignore_index=True)
    con.register("big_docs", big_docs)
    con.execute(
        f"COPY big_docs TO '{out_dir}/documents.parquet' (FORMAT PARQUET)"
    )

    # embeddings: shift vec_id; perturb one coordinate per copy so vectors
    # are distinct but the distribution (cell occupancy) is preserved
    emb = con.execute(
        f"SELECT * FROM '{SRC}/embeddings.parquet' ORDER BY vec_id"
    ).fetch_df()
    n_emb = len(emb)
    eframes = []
    for c in range(COPIES):
        e = emb.copy()
        e["vec_id"] = e["vec_id"] + c * n_emb
        if c:
            e["embedding"] = [
                [float(x) + (0.001 * c if i == (c % len(v)) else 0.0)
                 for i, x in enumerate(v)]
                for v in e["embedding"]
            ]
        eframes.append(e)
    big_emb = pd.concat(eframes, ignore_index=True)
    con.register("big_emb", big_emb)
    con.execute(
        f"COPY (SELECT vec_id, embedding::FLOAT[] AS embedding, label "
        f"FROM big_emb) TO '{out_dir}/embeddings.parquet' (FORMAT PARQUET)"
    )

    # orders/lineitem: pure id shifts keep per-key group sizes constant
    n_ord = con.execute(
        f"SELECT max(o_orderkey) + 1 FROM '{SRC}/orders.parquet'"
    ).fetchone()[0]
    for tbl, key in [("orders", "o_orderkey"), ("lineitem", "l_orderkey")]:
        selects = " UNION ALL ".join(
            f"SELECT * REPLACE ({key} + {c * n_ord} AS {key}) "
            f"FROM '{SRC}/{tbl}.parquet'"
            for c in range(COPIES)
        )
        con.execute(
            f"COPY ({selects}) TO '{out_dir}/{tbl}.parquet' (FORMAT PARQUET)"
        )
    # small dims some query prologs may touch: symlink-copy as-is
    for tbl in ["region", "nation", "customer", "supplier", "part", "events"]:
        src = f"{SRC}/{tbl}.parquet"
        dst = f"{out_dir}/{tbl}.parquet"
        if os.path.exists(src) and not os.path.exists(dst):
            con.execute(
                f"COPY (SELECT * FROM '{src}') TO '{dst}' (FORMAT PARQUET)"
            )


def _jaccard_full_corpus(spark, sf_dir):
    """The registered jaccard_prefix_join query caps its corpus at 100 docs
    (its oracle twin is all-pairs), so the scaling probe runs the raw
    OPERATOR over the whole documents table instead — that is the shape
    whose candidate growth the probe exists to measure."""
    from experimentsplan_datapipeline_spark.operators.dedup import (
        jaccard_prefix_join,
    )
    from experimentsplan_datapipeline_spark.plans.queries import t

    return jaccard_prefix_join(
        t(spark, sf_dir, "documents"), "text", "doc_id",
        shingle_size=3, threshold=0.8,
    )


def _containment_full_corpus(spark, sf_dir):
    """Like _jaccard_full_corpus: the registered dedup_containment query is
    oracle-capped at 60 docs, so the probe runs the raw operator over the
    whole documents table — the container side indexes its FULL token
    list, the shape whose growth needs measuring."""
    from experimentsplan_datapipeline_spark.operators.dedup import (
        containment_prefix_join,
    )
    from experimentsplan_datapipeline_spark.plans.queries import t

    return containment_prefix_join(
        t(spark, sf_dir, "documents"), "text", "doc_id",
        shingle_size=3, threshold=0.8,
    )


def build_dup_corpus(out_dir: str, copies: int) -> None:
    """UNSHUFFLED id-shifted copies of the sf0.1 documents — the
    adversarial regime for substring-span dedup: every 8-gram occurs
    ``copies`` times, so EVERY position of EVERY doc is marked and the
    islands pass merges maximal all-doc spans. A 2-copy small vs 20-copy
    big pair holds the duplication STRUCTURE constant (all grams
    duplicated in both) while scaling rows 10x, so the ratio isolates
    scaling, not a friendliness change."""
    os.makedirs(out_dir, exist_ok=True)
    dst = os.path.join(out_dir, "documents.parquet")
    if os.path.exists(dst):
        return
    con = duckdb.connect()
    n = con.execute(
        f"SELECT max(doc_id) + 1 FROM '{SRC}/documents.parquet'"
    ).fetchone()[0]
    selects = " UNION ALL ".join(
        f"SELECT * REPLACE (doc_id + {c * n} AS doc_id) "
        f"FROM '{SRC}/documents.parquet'"
        for c in range(copies)
    )
    con.execute(f"COPY ({selects}) TO '{dst}' (FORMAT PARQUET)")


def _spans_op(spark, sf_dir):
    from experimentsplan_datapipeline_spark.operators.dedup import (
        duplicate_substring_spans,
    )
    from experimentsplan_datapipeline_spark.plans.queries import t

    return duplicate_substring_spans(
        t(spark, sf_dir, "documents"), "text", "doc_id", window=8
    )


def _heavy_hitters_uniform(spark, sf_dir):
    """Misra-Gries over o_orderkey: every key near-unique, so summaries
    evict constantly, the candidate union is P*k pure noise, and the
    exact pass must stay candidate-bounded — nothing is heavy, the
    result is empty, and the cost must scale with the SCAN, not the key
    cardinality."""
    from experimentsplan_datapipeline_spark.operators.aggregates import (
        heavy_hitters,
    )
    from experimentsplan_datapipeline_spark.plans.queries import t

    return heavy_hitters(
        t(spark, sf_dir, "orders").select("o_orderkey"), "o_orderkey", k=40
    )


def _snm_docs(spark, sf_dir):
    """Sorted-neighborhood blocking over the scaled documents table (the
    registered query's `part` input is held constant by the builder):
    global rank on the 48-char text prefix, rank-window w=3 candidates.
    SNM is O(n*w) by construction — the probe checks the distributed rank
    (range shuffle + broadcast offsets) and the block-cell equi-join stay
    linear when rows grow 10x."""
    from experimentsplan_datapipeline_spark.operators.dedup import (
        sorted_neighborhood_pairs,
    )
    from experimentsplan_datapipeline_spark.plans.queries import t
    from pyspark.sql import functions as F

    u = t(spark, sf_dir, "documents").select(
        "doc_id", F.substring("text", 1, 48).alias("pfx")
    )
    return sorted_neighborhood_pairs(u, ["pfx"], "doc_id", w=3)


def _ingest_incremental(spark, sf_dir):
    """The incremental MinHash ingest gate over a SCALE-PROPORTIONAL split
    (the registered query's doc_id<400 ranges are scale-fixed): corpus =
    90% of docs, batch = 10%. Friendly regime — sf1's shuffled copies
    keep cross-split near-dups rare, so candidates stay band-collision
    noise and the cost is the banding scan."""
    from experimentsplan_datapipeline_spark.operators.dedup import (
        minhash_lsh_incremental,
    )
    from experimentsplan_datapipeline_spark.plans.queries import t
    from pyspark.sql import functions as F

    docs = t(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    batch = docs.filter(F.col("doc_id") % 10 == 0)
    return minhash_lsh_incremental(
        corpus, batch, "text", "doc_id", threshold=0.5
    )


def _ingest_incremental_neardup(spark, sf_dir):
    """ADVERSARIAL regime (VERDICT r8 item 3): the batch is ~100%
    near-dups of the corpus (every batch doc = a corpus doc + one
    appended token), so every batch doc collides in most bands and the
    candidate set ~= the whole batch — the verify stage's semi-join
    prune must still keep the shingled set candidate-bounded."""
    from experimentsplan_datapipeline_spark.operators.dedup import (
        minhash_lsh_incremental,
    )
    from experimentsplan_datapipeline_spark.plans.queries import t
    from pyspark.sql import functions as F

    docs = t(spark, sf_dir, "documents")
    batch = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" xqzprobe")).alias("text"),
    )
    return minhash_lsh_incremental(
        docs, batch, "text", "doc_id", threshold=0.5
    )


def _ingest_funnel(spark, sf_dir):
    """pipeline_ingest_batch's funnel end-to-end over the scale-
    proportional %10 split: Gopher quality gate + exact fingerprint
    screen + MinHash near-dup screen, conjoined per-source."""
    from experimentsplan_datapipeline_spark.functions.text import (
        doc_fingerprint,
    )
    from experimentsplan_datapipeline_spark.operators.dedup import (
        minhash_lsh_incremental,
    )
    from experimentsplan_datapipeline_spark.operators.text_analysis import (
        repetition_signals,
    )
    from experimentsplan_datapipeline_spark.plans.queries import t
    from pyspark.sql import functions as F

    docs = t(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    batch = docs.filter(F.col("doc_id") % 10 == 0)
    sig = repetition_signals(batch, "doc_id", "text").select("doc_id", "keep")
    cf = corpus.select(doc_fingerprint("text").alias("fp")).distinct()
    bf = batch.select("doc_id", "source", doc_fingerprint("text").alias("fp"))
    exact = bf.join(cf.withColumn("__hit", F.lit(True)), "fp", "left").select(
        "doc_id", "source", F.coalesce("__hit", F.lit(False)).alias("exact_dup")
    )
    near_ids = (
        minhash_lsh_incremental(
            corpus, batch, "text", "doc_id", threshold=0.5
        )
        .select(F.col("batch_id").alias("doc_id"))
        .distinct()
        .withColumn("near_dup", F.lit(True))
    )
    flags = (
        exact.join(sig, "doc_id")
        .join(near_ids, "doc_id", "left")
        .withColumn("near_dup", F.coalesce("near_dup", F.lit(False)))
    )
    k = F.col("keep")
    return flags.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_batch"),
        F.sum(F.when(k, 1).otherwise(0)).alias("n_quality"),
        F.sum(F.when(k & ~F.col("exact_dup"), 1).otherwise(0)).alias("n_exact"),
        F.sum(
            F.when(k & ~F.col("exact_dup") & ~F.col("near_dup"), 1).otherwise(0)
        ).alias("n_accepted"),
    )


_SS_BUILT: set[str] = set()


def _ingest_steady_state(spark, sf_dir):
    """Steady-state ingest cost: BOTH persisted indexes are built once
    per corpus (on the warm call, untimed by _time_pair's second pass),
    so the timed pass measures only the per-batch work — batch hashing,
    Bloom bit-test + fp-table semi join, band join against the index,
    candidate-only verify. This is the number the H43/H48 design note
    claims is O(batch): it should be nearly FLAT across the 10x corpora
    (the batch also grows 10x here, so ~linear in batch, but the corpus
    hash cost must be absent)."""
    import hashlib as _h

    from experimentsplan_datapipeline_spark.operators.dedup import (
        exact_screen_incremental,
        fingerprint_index_write,
        minhash_index_read,
        minhash_index_read_text,
        minhash_index_write,
        minhash_lsh_incremental,
    )
    from experimentsplan_datapipeline_spark.plans.queries import t
    from pyspark.sql import functions as F

    tag = "ss_" + _h.md5(sf_dir.encode()).hexdigest()[:8]
    docs = t(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    batch = docs.filter(F.col("doc_id") % 10 == 0)
    if tag not in _SS_BUILT:
        minhash_index_write(
            corpus, f"mh_{tag}", "text", "doc_id", store_text=True
        )
        fingerprint_index_write(corpus, f"fp_{tag}", "text")
        _SS_BUILT.add(tag)
    exact = exact_screen_incremental(batch, "text", "doc_id", f"fp_{tag}")
    near = (
        minhash_lsh_incremental(
            # §4j mitigation (round 12): verify text comes from the
            # id-sorted index text table with a literal-IN pushdown —
            # no corpus-parquet scan remains anywhere in the per-batch
            # steady state
            minhash_index_read_text(spark, f"mh_{tag}"),
            batch, "text", "doc_id", threshold=0.5,
            corpus_bandkeys=minhash_index_read(spark, f"mh_{tag}"),
            corpus_text_pushdown=200_000,
        )
        .select(F.col("batch_id").alias("doc_id"))
        .distinct()
        .withColumn("near_dup", F.lit(True))
    )
    return (
        exact.join(near, "doc_id", "left")
        .withColumn("near_dup", F.coalesce("near_dup", F.lit(False)))
    )


def build_bounded_vocab_corpus(out_dir: str, src_dir: str, n_sources: int = 50,
                               vocab_size: int = 20, words: int = 80) -> None:
    """ADVERSARIAL regime for corpus_source_overlap (VERDICT r8 item 8):
    a FIXED tiny vocabulary (20 words -> only 8000 possible 3-grams) and
    many pseudo-sources, so EVERY gram ends up shared by EVERY source:
    distinct (source, gram) rows saturate at S*V3 (they cannot grow with
    the corpus) and the gram-key self-join emits its full V3*S(S-1)/2
    ~= 9.8M pair rows at BOTH scales — the join is constant-cost, the
    scan/shingle is the only thing that grows, so the measured ratio
    isolates the scan. Same text generator + vocab at both scales; only
    row count changes. (The bounded-vocab adversary that bit
    jaccard_prefix_join in r4 — per-DOC pair growth — cannot occur here:
    pairs are per (source, source), never per doc.)"""
    os.makedirs(out_dir, exist_ok=True)
    dst = os.path.join(out_dir, "documents.parquet")
    if os.path.exists(dst):
        return
    import hashlib

    import pandas as pd

    con = duckdb.connect()
    ids = con.execute(
        f"SELECT doc_id FROM '{src_dir}/documents.parquet' ORDER BY doc_id"
    ).fetch_df()["doc_id"].tolist()
    vocab = [f"w{v}" for v in range(vocab_size)]

    def text_for(doc_id: int) -> str:
        h = int.from_bytes(
            hashlib.md5(f"bv|{doc_id}".encode()).digest()[:8], "big"
        )
        out = []
        for i in range(words):
            h = (h * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            out.append(vocab[h % vocab_size])
        return " ".join(out)

    pdf = pd.DataFrame({
        "doc_id": ids,
        "source": [f"src{d % n_sources}" for d in ids],
        "text": [text_for(d) for d in ids],
    })
    con.register("bv_docs", pdf)
    con.execute(f"COPY bv_docs TO '{dst}' (FORMAT PARQUET)")


def build_megadoc_corpus(out_dir: str) -> None:
    """Round-10 adversary for content-defined chunking: the SAME total
    token stream as sf0.1's documents, concatenated into just 8 mega
    documents. chunk_content_defined's only window runs per doc — with
    8 docs the window stage degrades to 8 tasks, the worst shape the op
    can see. The probe's claim: the hazard is DOC-LENGTH-bounded (one
    task sorts one doc's tokens), not corpus-bounded, so the slowdown vs
    the natural corpus is the parallelism factor, not a blowup."""
    os.makedirs(out_dir, exist_ok=True)
    dst = os.path.join(out_dir, "documents.parquet")
    if os.path.exists(dst):
        return
    con = duckdb.connect()
    con.execute(
        f"COPY (SELECT doc_id % 8 AS doc_id, "
        f"string_agg(text, ' ' ORDER BY doc_id) AS text, "
        f"min(lang) AS lang, 'mega' AS source, "
        f"sum(n_chars) AS n_chars "
        f"FROM '{SRC}/documents.parquet' GROUP BY doc_id % 8) "
        f"TO '{dst}' (FORMAT PARQUET)"
    )


def _chunk_cdc(spark, sf_dir):
    from experimentsplan_datapipeline_spark.operators.text_analysis import (
        chunk_content_defined,
    )
    from experimentsplan_datapipeline_spark.plans.queries import t

    return chunk_content_defined(
        t(spark, sf_dir, "documents"), "doc_id", "text"
    )


def _batch_padding(spark, sf_dir):
    from experimentsplan_datapipeline_spark.operators import curation as cur
    from experimentsplan_datapipeline_spark.plans.queries import t
    from pyspark.sql import functions as F

    from experimentsplan_datapipeline_spark.functions.text import token_count

    docs = t(spark, sf_dir, "documents")
    return cur.batch_padding_report(
        docs, "doc_id", token_count("text"), n_buckets=8, batch_size=16
    )


def _bpe_train_probe(spark, sf_dir):
    """BPE training at scale: the corpus scan happens once (word
    counting); every iteration then works the DISTINCT-WORD table, which
    grows sublinearly (Heaps' law) under the 10x shuffled-copy corpus —
    the probe checks the per-iteration pair-count aggs really ride the
    word table, not the corpus."""
    from experimentsplan_datapipeline_spark.operators.text_analysis import (
        bpe_train,
    )
    from experimentsplan_datapipeline_spark.plans.queries import t

    mdf, _ = bpe_train(t(spark, sf_dir, "documents"), "text", 12)
    return mdf


def _qc_train_probe(spark, sf_dir):
    """Quality-classifier training at 10x corpus: the corpus term lives
    only in the one-time featurization + the per-step partial-aggregate
    scans of the 6-column pinned frame; the probe checks step cost is
    dominated by job overhead, not data (near-flat expected)."""
    from pyspark.sql import functions as F

    from experimentsplan_datapipeline_spark.operators.curation import (
        quality_classifier_train,
    )
    from experimentsplan_datapipeline_spark.plans.queries import t

    docs = t(spark, sf_dir, "documents")
    ws = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+"), lambda w: w != ""
    )
    trace, _ = quality_classifier_train(
        docs, "doc_id", "text",
        2 * F.size(F.array_distinct(ws)) > F.size(ws), n_steps=32,
    )
    return trace


def _cdc_dedup_probe(spark, sf_dir):
    from experimentsplan_datapipeline_spark.plans.queries import QUERIES

    return QUERIES["dedup_cdc_chunks"](spark, sf_dir)


_LIVE_FUNNEL_IDX: dict[str, bool] = {}


def _live_funnel_probe(spark, sf_dir):
    """The LIVE funnel path at scale: 4 micro-batch drains of a
    scale-proportional stream (10% of docs) against persisted indexes
    over the other 90%. Indexes build once per corpus (the first, WARM
    _time_pair call pays it; the timed call measures pure drain =
    per-epoch quality gate + Bloom/fp exact screen + indexed near-dup
    screen + decision/state writes). Fresh stream dirs + checkpoint per
    call so every drain processes all 4 files.

    r14 (VERDICT r13 item 4): the probe now runs the SAME verify shape
    as the registered stream_ingest_funnel — store_text=True index,
    corpus = the index's id-sorted text table, and the §4j literal-IN
    candidate pushdown — so the measured drain covers the r13 live
    pushdown path, not the pre-r13 corpus-scan verify (whose last
    flat-at-10x reading, §4i 1.04x, predated the pushdown)."""
    import tempfile

    from pyspark.sql import functions as F

    from experimentsplan_datapipeline_spark.operators.dedup import (
        fingerprint_index_write,
        minhash_index_read_text,
        minhash_index_write,
    )
    from experimentsplan_datapipeline_spark.plans.queries import t
    from experimentsplan_datapipeline_spark.streaming.events import (
        run_available_now,
    )
    from experimentsplan_datapipeline_spark.streaming.ingest import (
        read_gate_results,
        streaming_ingest_funnel,
    )

    tag = sf_dir.replace("/", "_").replace(".", "_")
    docs = t(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 10 != 0).select("doc_id", "text")
    live = docs.filter(F.col("doc_id") % 10 == 0).select("doc_id", "text")
    mh, fp = f"probe_lf_mh_{tag}", f"probe_lf_fp_{tag}"
    if not _LIVE_FUNNEL_IDX.get(sf_dir):
        minhash_index_write(
            corpus, mh, "text", "doc_id", store_text=True
        )
        fingerprint_index_write(corpus, fp, "text")
        _LIVE_FUNNEL_IDX[sf_dir] = True
    ctext = minhash_index_read_text(spark, mh)
    root = tempfile.mkdtemp(prefix="lf_probe_")
    staging = os.path.join(root, "staging")
    result_dir = os.path.join(root, "decisions")
    live.repartition(4, "doc_id").write.parquet(staging)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(staging)
    )
    writer = streaming_ingest_funnel(
        stream, ctext, mh, fp, result_dir, "text", "doc_id",
        threshold=0.5, corpus_text_pushdown=5000,
    ).option("checkpointLocation", os.path.join(root, "ckpt"))
    run_available_now(writer, timeout_sec=900.0)
    return read_gate_results(spark, result_dir)


def _pagerank_setup_share(spark, sf_dir) -> dict:
    """r15 (VERDICT r14 item 6): prove the r14 pagerank-setup fix at
    scale. The fix pinned the normalized edge frame FIRST so the three
    derived setup pins (nodes, contrib_base, out_srcs) re-read one
    materialization instead of each re-executing the co-purchase edge
    lineage (pre-fix: setup alone = ~4 edge-lineage executions). Probe:
    time the edge lineage materialized ONCE vs the full 3-round pagerank
    query on the same dir; full/edge_once stays a small constant when
    the fix holds (rounds are O(|V|+|E|) on the pinned frame), and would
    sit at >= ~4 if setup still re-executed the lineage per pin."""
    from pyspark.sql import functions as F

    from experimentsplan_datapipeline_spark.operators.graph import (
        copurchase_pairs,
    )
    from experimentsplan_datapipeline_spark.plans.queries import QUERIES, t

    def edges_df():
        items = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
        cop = (
            copurchase_pairs(items, "l_orderkey", "l_partkey", n_blocks=1)
            .groupBy("pa", "pb")
            .agg(F.count(F.lit(1)).alias("support"))
            .filter(F.col("support") >= 2)
            .select("pa", "pb")
        )
        return cop.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("pa").alias("src"), F.col("pb").alias("dst")
                    ),
                    F.struct(
                        F.col("pb").alias("src"), F.col("pa").alias("dst")
                    ),
                )
            ).alias("e")
        ).select("e.src", "e.dst")

    edges_df().count()  # warm
    t0 = time.monotonic()
    edges_df().localCheckpoint(eager=True)
    edge_once = time.monotonic() - t0
    QUERIES["graph_pagerank"](spark, sf_dir).count()  # warm
    t0 = time.monotonic()
    QUERIES["graph_pagerank"](spark, sf_dir).count()
    full = time.monotonic() - t0
    return {
        "edge_once_sec": round(edge_once, 3),
        "full_pagerank_sec": round(full, 3),
        "full_over_edge_once": round(full / edge_once, 2) if edge_once else None,
    }


def _live_gate_epochs(spark, sf_dir) -> dict:
    """r15 (VERDICT r14 item 6): per-epoch cost of the compacted growing
    gate must be FLAT in epoch count — the whole point of
    ingest_state_compact is that per-batch state reads are
    O(batch + epochs since last compaction), never O(all epochs). Probe:
    drain the SAME per-epoch batch size for 3 vs 9 epochs
    (auto_compact_every=3 in both), fresh state each run; a flat
    per-epoch cost shows as total ratio ~= 3 (plus the extra compaction
    folds), an O(epochs) state read as ratio >> 3."""
    import glob
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from experimentsplan_datapipeline_spark.operators.dedup import (
        minhash_index_write,
    )
    from experimentsplan_datapipeline_spark.plans.queries import t
    from experimentsplan_datapipeline_spark.streaming.events import (
        run_available_now,
    )
    from experimentsplan_datapipeline_spark.streaming.ingest import (
        ingest_state_drop,
        streaming_ingest_gate,
    )

    docs = t(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") < 300).select("doc_id", "text")
    live = docs.filter(F.col("doc_id") >= 300).select("doc_id", "text")
    idx = "probe_epochs_idx"
    minhash_index_write(
        corpus, idx, "text", "doc_id", num_hashes=32, bands=8,
        shingle_size=3, portable_seed=42, n_buckets=4,
    )
    per_epoch = 200

    def run(n_epochs: int) -> float:
        root = tempfile.mkdtemp(prefix=f"gate_epochs_{n_epochs}_")
        staging = os.path.join(root, "staging")
        os.makedirs(staging)
        state = f"probe_epochs_state_{n_epochs}"
        ingest_state_drop(spark, state)
        for k in range(n_epochs):
            batch = (
                live.orderBy("doc_id")
                .limit(per_epoch)
                .select(
                    (F.col("doc_id") + k * 1_000_000).alias("doc_id"),
                    "text",
                )
            )
            tmp = os.path.join(root, f"tmp_{k}")
            batch.coalesce(1).write.mode("overwrite").parquet(tmp)
            part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
            dst = os.path.join(staging, f"{k:04d}.parquet")
            shutil.move(part, dst)
            os.utime(dst, (1_700_000_000 + k * 100,) * 2)
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(staging)
        )
        writer = streaming_ingest_gate(
            stream, corpus, idx, os.path.join(root, "hits"), "text",
            "doc_id", num_hashes=32, bands=8, shingle_size=3,
            threshold=0.5, portable_seed=42, grow_state=True,
            accepted_dir=os.path.join(root, "accepted"),
            state_dir=os.path.join(root, "state"),
            compact_table=state, auto_compact_every=3,
        ).option("checkpointLocation", os.path.join(root, "ckpt"))
        t0 = time.monotonic()
        run_available_now(writer, timeout_sec=900.0)
        took = time.monotonic() - t0
        ingest_state_drop(spark, state)
        shutil.rmtree(root, ignore_errors=True)
        return took

    run(2)  # warm the code paths
    t3 = run(3)
    t9 = run(9)
    return {
        "epochs3_sec": round(t3, 3),
        "epochs9_sec": round(t9, 3),
        "ratio_vs_flat3x": round(t9 / t3 / 3.0, 2) if t3 else None,
    }


# ---------------------------------------------------------------- sf10 (r11)

def build_sf10(out_dir: str, copies: int = 100) -> None:
    """100x corpus — documents + embeddings ONLY — for the
    persisted-index steady-state probes (VERDICT r10 item 3: the 100 TB
    claim extrapolated from 10x until now). Same construction as
    build_sf1 (id shifts; later copies word-shuffle text / perturb one
    embedding coordinate, so copies are neither near-dups nor identical
    vectors), written copy-by-copy into a parquet DIRECTORY so 100
    copies never sit in memory at once."""
    import hashlib

    import pandas as pd

    docs_dir = os.path.join(out_dir, "documents.parquet")
    emb_dir = os.path.join(out_dir, "embeddings.parquet")
    if os.path.isdir(docs_dir) and os.path.isdir(emb_dir):
        return
    os.makedirs(docs_dir, exist_ok=True)
    os.makedirs(emb_dir, exist_ok=True)
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT * FROM '{SRC}/documents.parquet' ORDER BY doc_id"
    ).fetch_df()
    n_docs = len(docs)

    def shuffled_text(text: str, c: int) -> str:
        words = text.split()
        random.Random((c << 20) ^ len(words)).shuffle(words)
        return " ".join(words)

    for c in range(copies):
        d = docs.copy()
        d["doc_id"] = d["doc_id"] + c * n_docs
        if c:
            d["text"] = [shuffled_text(t, c) for t in d["text"]]
        con.register("sf10_docs", d)
        con.execute(
            f"COPY sf10_docs TO '{docs_dir}/part{c:03d}.parquet' "
            f"(FORMAT PARQUET)"
        )
    emb = con.execute(
        f"SELECT * FROM '{SRC}/embeddings.parquet' ORDER BY vec_id"
    ).fetch_df()
    n_emb = len(emb)
    for c in range(copies):
        e = emb.copy()
        e["vec_id"] = e["vec_id"] + c * n_emb
        if c:
            e["embedding"] = [
                [float(x) + (0.001 * (c % 7 + 1) if i == (c % len(v)) else 0.0)
                 for i, x in enumerate(v)]
                for v in e["embedding"]
            ]
        con.register("sf10_emb", e)
        con.execute(
            f"COPY (SELECT vec_id, embedding::FLOAT[] AS embedding, label "
            f"FROM sf10_emb) TO '{emb_dir}/part{c:03d}.parquet' "
            f"(FORMAT PARQUET)"
        )


def _fixed_batch(spark):
    """The FIXED per-batch workload every steady-state probe reuses: the
    sf0.1 %10==0 docs (~500). The corpus scales 1x/10x/100x around it,
    so the timed ratio isolates per-batch cost growth — the number the
    100 TB design argument says must stay near-flat."""
    from experimentsplan_datapipeline_spark.plans.queries import t
    from pyspark.sql import functions as F

    return t(spark, SRC, "documents").filter(F.col("doc_id") % 10 == 0)


def _probe_tag(sf_dir: str) -> str:
    import hashlib as _h

    return _h.md5(sf_dir.encode()).hexdigest()[:8]


def _steady_exact_fixed(spark, sf_dir):
    """Exact screen per-batch cost: Bloom bit-test prune (plan literal)
    + bucketed fp-table semi join. Index pre-built per corpus (warm
    pass); batch fixed."""
    from experimentsplan_datapipeline_spark.operators.dedup import (
        exact_screen_incremental,
        fingerprint_index_write,
    )
    from experimentsplan_datapipeline_spark.plans.queries import t
    from pyspark.sql import functions as F

    tag = "fx_" + _probe_tag(sf_dir)
    if tag not in _SS_BUILT:
        corpus = t(spark, sf_dir, "documents").filter(
            F.col("doc_id") % 10 != 0
        )
        fingerprint_index_write(corpus, f"fp_{tag}", "text")
        _SS_BUILT.add(tag)
    return exact_screen_incremental(
        _fixed_batch(spark), "text", "doc_id", f"fp_{tag}"
    )


def _steady_near_fixed(spark, sf_dir):
    """Band-key gate per-batch cost: batch hashing + band join against
    the persisted (bucketed) index + candidate-only verify. The verify
    stage's corpus-text read was the piece that betrayed the claim at
    100x (r11 measured +17%: the candidate semi join still SCANNED the
    corpus parquet) — r13 runs the shipped §4j mitigation (VERDICT r12
    item 2): the verify text comes from the id-sorted index text table
    (store_text=True) through the literal-IN row-group pushdown, so the
    per-batch read is candidate-bounded at any corpus size."""
    from experimentsplan_datapipeline_spark.operators.dedup import (
        minhash_index_read,
        minhash_index_read_text,
        minhash_index_write,
        minhash_lsh_incremental,
    )
    from experimentsplan_datapipeline_spark.plans.queries import t
    from pyspark.sql import functions as F

    tag = "nx_" + _probe_tag(sf_dir)
    if tag not in _SS_BUILT:
        corpus = t(spark, sf_dir, "documents").filter(
            F.col("doc_id") % 10 != 0
        )
        minhash_index_write(
            corpus, f"mh_{tag}", "text", "doc_id", store_text=True
        )
        _SS_BUILT.add(tag)
    return minhash_lsh_incremental(
        minhash_index_read_text(spark, f"mh_{tag}"),
        _fixed_batch(spark), "text", "doc_id", threshold=0.5,
        corpus_bandkeys=minhash_index_read(spark, f"mh_{tag}"),
        corpus_text_pushdown=200_000,
    )


def _ann_query_fixed(spark, sf_dir):
    """IVF query cost against a 1x/10x/100x index: 5 fixed queries rank
    the 16-cell codebook and probe 2 cells of the bucketed inverted
    lists. Growth here is the probed-cell row count (~corpus/16*2),
    so sub-linear-in-corpus but not flat — the mitigation at 100 TB is
    more cells (n_cells scales with corpus), recorded in BASELINE."""
    from experimentsplan_datapipeline_spark.operators.similarity import (
        ann_index_write,
        ann_query_indexed,
    )
    from experimentsplan_datapipeline_spark.plans.queries import t
    from pyspark.sql import functions as F

    tag = "ax_" + _probe_tag(sf_dir)
    emb = t(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )
    if tag not in _SS_BUILT:
        ann_index_write(emb, f"ann_{tag}", "embedding", "vec_id")
        _SS_BUILT.add(tag)
    queries = (
        t(spark, SRC, "embeddings")
        .withColumn(
            "embedding",
            F.transform("embedding", lambda x: x.cast("double")),
        )
        .filter(F.col("vec_id") < 5)
    )
    return ann_query_indexed(
        queries, f"ann_{tag}", "vec_id", "embedding", k=10, n_probe=2
    )


def _time_scales(fn, spark, dirs: dict) -> dict:
    out = {}
    for tag, d in dirs.items():
        fn(spark, d).count()  # warm: builds the index, JITs the plan
        t0 = time.monotonic()
        fn(spark, d).count()
        out[f"{tag}_sec"] = round(time.monotonic() - t0, 3)
    base = out.get("sf0.1_sec")
    for tag in dirs:
        if tag != "sf0.1" and base:
            out[f"ratio_{tag}"] = round(out[f"{tag}_sec"] / base, 2)
    return out


_BPE_IDS_STATE: dict = {}


def _bpe_ids_probe(spark, sf_dir):
    """The Arrow token-id apply path (r11) at 10x: the merge table +
    alphabet train ONCE on the sf0.1 corpus (cached — apply-time cost is
    the claim, matching a shipped tokenizer artifact), then every doc of
    the probed corpus tokenizes through the mapInPandas min-rank fold.
    Expected ~linear in corpus (it is a single pass over the text) with
    a small constant — the point is that the cost is per-TOKEN, not
    per-merge-table-size."""
    from experimentsplan_datapipeline_spark.operators.text_analysis import (
        bpe_alphabet,
        bpe_tokenize_ids,
        bpe_train,
    )
    from experimentsplan_datapipeline_spark.plans.queries import t
    from pyspark.sql import functions as F

    if not _BPE_IDS_STATE:
        train = t(spark, SRC, "documents").filter(F.col("doc_id") < 2000)
        _, merges = bpe_train(train, "text", 12)
        _BPE_IDS_STATE["merges"] = merges
        _BPE_IDS_STATE["alphabet"] = bpe_alphabet(train, "text")
    docs = t(spark, sf_dir, "documents")
    return bpe_tokenize_ids(
        docs, "doc_id", "text", _BPE_IDS_STATE["merges"],
        _BPE_IDS_STATE["alphabet"],
    ).select("doc_id", "n_tokens")


def _keyword_tag_probe(spark, sf_dir):
    """H66 at 10x: whole-corpus gram explode + broadcast phrase join —
    expected ~linear (the explode rides the scan; only matches shuffle)."""
    from experimentsplan_datapipeline_spark.operators.text_analysis import (
        keyword_tag,
    )
    from experimentsplan_datapipeline_spark.plans.queries import (
        _KEYWORD_TAGS,
        t,
    )

    return keyword_tag(
        t(spark, sf_dir, "documents"), "doc_id", "text", _KEYWORD_TAGS
    )


def _cms_probe(spark, sf_dir):
    """H65 at 10x: sketch build + top-20 recount + estimate join over the
    whole corpus — expected ~linear (three single-pass scans; the sketch
    exchange is bounded at partitions*d*w cells at ANY size)."""
    from experimentsplan_datapipeline_spark.plans.queries import QUERIES

    return QUERIES["cms_topk_contract"](spark, sf_dir)


def _mw_probe(spark, sf_dir):
    """H67 at 10x: the corpus-scan-once claim — 4 MW steps cost the
    distribution scan plus O(S*17) driver flops, so 10x corpus should be
    ~the scan ratio, independent of step count."""
    from experimentsplan_datapipeline_spark.operators.curation import (
        mixture_reweight_mw,
    )
    from experimentsplan_datapipeline_spark.plans.queries import t

    return mixture_reweight_mw(
        t(spark, sf_dir, "documents"), "source", "text", n_steps=4
    )


def _scene_cuts_probe(spark, sf_dir):
    """H68 at 10x over the WHOLE corpus (the registry query pins
    doc_id < 200 for the oracle; the probe must scale with rows) —
    expected ~linear: every clip decodes once inside its Arrow pass."""
    from pyspark.sql import functions as F

    from experimentsplan_datapipeline_spark.media.av import scene_cuts
    from experimentsplan_datapipeline_spark.plans.queries import t

    clips = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.encode("text", "UTF-8").alias("content"),
        (F.lit(8) + F.pmod(F.col("doc_id"), F.lit(9))).cast("int").alias(
            "n_frames"
        ),
    )
    return scene_cuts(clips, threshold=86.0)


def _er_docs(spark, sf_dir):
    """Entity-resolution cascade over the SCALED documents table (the
    registered pipeline_entity_resolution scans `part`, which the 10x
    builder holds constant — its flat ratio is vacuous): entity name =
    16-char text prefix + the doc id (names mostly unique with shared
    leading grams — the realistic master-data regime; a bare shuffled-
    text prefix makes EVERY q-gram corpus-frequent, the known
    adversarial input for any Ed-Join-family blocker, and measures
    pair blowup rather than scaling). Same Ed-Join blocking ->
    connected components -> survivorship chain as the registered
    query."""
    from experimentsplan_datapipeline_spark.operators.dedup import (
        editdist_prefix_join,
        resolve_duplicate_clusters,
    )
    from experimentsplan_datapipeline_spark.plans.queries import t
    from pyspark.sql import functions as F

    u = (
        t(spark, sf_dir, "documents")
        .select(
            F.concat_ws(
                " ", F.substring("text", 1, 16), F.col("doc_id")
            ).alias("name"),
            "doc_id",
            "n_chars",
        )
        .groupBy("name")
        .agg(
            F.min("doc_id").alias("pid"),
            F.min("n_chars").alias("price"),
        )
    )
    # q=4: Ed-Join's candidate growth is governed by gram-bucket
    # occupancy N/|gram vocab| — at q=2 the id digits give a ~100-value
    # vocab whose buckets grow linearly with N (candidates quadratic:
    # measured 29.8x wall at 10x); q=4 grams are selective enough that
    # buckets stay bounded. Raising q with the corpus is the standard
    # Ed-Join selectivity dial (soundness needs len >= q*d + q - 1 —
    # these names are ~22 chars, fine for d=2).
    pairs = editdist_prefix_join(u, "name", "pid", q=4, max_dist=2)
    clusters = resolve_duplicate_clusters(u, pairs, "pid")
    memb = clusters.join(u, "pid")
    agg1 = memb.groupBy("rep_id").agg(
        F.count(F.lit(1)).alias("n_members"), F.min("price").alias("mp")
    )
    return (
        memb.join(agg1, "rep_id")
        .filter(F.col("price") == F.col("mp"))
        .groupBy("rep_id", "n_members", "mp")
        .agg(F.min("pid").alias("canonical_pid"))
    )


def _scaled_events(spark, sf_dir, mult: int):
    """events is held constant by build_sf1 (a small dim for most
    queries), so probes that scale ON events build the 10x stream
    inline: id-shifted copies, identical ts range (the embargo cut is
    range-derived, so the split fractions stay comparable)."""
    from experimentsplan_datapipeline_spark.plans.queries import t as _t
    from pyspark.sql import functions as F

    ev = _t(spark, sf_dir, "events")
    if mult <= 1:
        return ev
    n = ev.agg(F.max("event_id")).first()[0] + 1
    out = ev
    for c in range(1, mult):
        out = out.unionByName(
            ev.withColumn("event_id", F.col("event_id") + F.lit(c * n))
        )
    return out


def _contrastive_export_probe(spark, sf_dir):
    """The pipeline_contrastive_export chain (round 12) with the event
    stream scaled 10x inline: temporal embargo split + per-user
    featurization scale with the scan (one pass, one groupBy); the
    miner runs on the fixed 150-user frame. Expected ~linear — the
    probe isolates the leak-gated scan term."""
    from experimentsplan_datapipeline_spark.operators import similarity as sim
    from experimentsplan_datapipeline_spark.operators.curation import (
        temporal_split_embargo,
    )
    from pyspark.sql import functions as F

    types = ["click", "error", "purchase", "signup", "view"]
    ev = _scaled_events(spark, sf_dir, 1 if sf_dir == SRC else 10)
    tr = temporal_split_embargo(ev, "ts", 60, 5).filter(
        F.col("split") == "train"
    )
    uv = (
        tr.groupBy("user_id")
        .agg(
            *[
                F.sum((F.col("event_type") == ty).cast("double")).alias(
                    f"c{i}"
                )
                for i, ty in enumerate(types)
            ]
        )
        .select(
            "user_id",
            F.array(*[F.col(f"c{i}") for i in range(len(types))]).alias(
                "v"
            ),
        )
        .localCheckpoint(eager=True)
    )
    cents = sim.kmeans_lite(uv, "user_id", "v", k=4, iters=2)
    return sim.contrastive_triplets(uv, "user_id", "v", margin=0.02,
                                    cells=cents)


def _miner_cells_probe(which: str):
    """Cell-based contrastive miner at 10x with the codebook scaled
    k ~ sqrt(N) (the 100 TB discipline: pairs ~ N^2/k = N^1.5 total,
    N per cell — sub-quadratic and embarrassingly parallel, vs the
    fixed-bucket join's N^2/64). Returns a probe fn."""
    def fn(spark, sf_dir):
        from experimentsplan_datapipeline_spark.operators import (
            similarity as sim,
        )
        from experimentsplan_datapipeline_spark.plans.queries import t as _t
        from pyspark.sql import functions as F

        emb = _t(spark, sf_dir, "embeddings").withColumn(
            "embedding",
            F.transform("embedding", lambda x: x.cast("double")),
        )
        n = emb.count()
        k = max(16, int(n ** 0.5))
        cents = sim.kmeans_lite(emb, "vec_id", "embedding", k=k, iters=2)
        if which == "hard_negatives":
            return sim.hard_negatives(
                emb, "vec_id", "embedding", dup_threshold=0.999,
                cells=cents,
            )
        return sim.contrastive_triplets(
            emb, "vec_id", "embedding", margin=0.05, cells=cents
        )
    return fn


def _miner_candidate_growth(spark, small_dir: str, big_dir: str) -> dict:
    """Candidate-PAIR growth of the miners' cell pass at 10x (VERDICT
    r11 item 1's 'sub-quadratic candidate growth' evidence, measured as
    counts, not wall-clock): with k ~ sqrt(N) the expected pair ratio
    at 10x data is ~10^1.5 ≈ 32 (N per cell, k cells), vs ~100 for the
    fixed-bucket join. Also reports the per-cell bound sum(|c|^2)."""
    from experimentsplan_datapipeline_spark.operators import similarity as sim
    from experimentsplan_datapipeline_spark.plans.queries import t as _t
    from pyspark.sql import functions as F

    out = {}
    for tag, d in (("sf0.1", small_dir), ("sf1", big_dir)):
        emb = _t(spark, d, "embeddings").withColumn(
            "embedding",
            F.transform("embedding", lambda x: x.cast("double")),
        )
        n = emb.count()
        k = max(16, int(n ** 0.5))
        cents = sim.kmeans_lite(emb, "vec_id", "embedding", k=k, iters=2)
        pairs = sim._miner_candidates(
            emb, "vec_id", "embedding", 64, 6, 42, cents
        ).count()
        out[f"{tag}_n"] = n
        out[f"{tag}_k"] = k
        out[f"{tag}_pairs"] = pairs
    out["pair_ratio"] = round(out["sf1_pairs"] / out["sf0.1_pairs"], 2)
    return out


def _walks_per_node_probe(spark, sf_dir):
    """random_walks in DeepWalk's actual regime — one walk per NODE
    (every order, ~15k at sf0.1 / ~150k at sf1), forced onto the
    size-guarded NON-broadcast path (broadcast_threshold=0): the
    frontier hash-joins src-keyed edges each step. Expected ~linear in
    |nodes| (frontier rows scale, per-step join + two aggregations)."""
    from experimentsplan_datapipeline_spark.operators.graph import (
        random_walks,
    )
    from experimentsplan_datapipeline_spark.plans.queries import t as _t
    from pyspark.sql import functions as F

    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).distinct()
    e1 = li.select(
        F.concat(F.lit("o:"), F.col("l_orderkey").cast("string")).alias("src"),
        F.concat(F.lit("p:"), F.col("l_partkey").cast("string")).alias("dst"),
    )
    e2 = li.select(
        F.concat(F.lit("p:"), F.col("l_partkey").cast("string")).alias("src"),
        F.concat(F.lit("o:"), F.col("l_orderkey").cast("string")).alias("dst"),
    )
    seeds = _t(spark, sf_dir, "orders").select(
        F.concat(F.lit("o:"), F.col("o_orderkey").cast("string")).alias(
            "node"
        )
    )
    return random_walks(
        e1.unionByName(e2), seeds, n_steps=3, seed=7,
        broadcast_threshold=0,
    )


def _walks_per_node_capped_probe(spark, sf_dir):
    """The per-node regime with the hub-fanout bound ON (VERDICT r13
    item 5, graph.py::_capped_edges): degree_cap=8 vs the part nodes'
    ~30 out-degree bounds the dominant step-2 candidate term at
    |frontier| * 8 instead of |frontier| * 30 (45M -> 12M rows at sf1).
    m=8 is deliberately below the part-degree mode so the bound visibly
    bites at BOTH scales; production picks m ~ p99 out-degree so only
    the hub tail is sampled. Same graph, seeds, and non-broadcast
    forcing as _walks_per_node_probe — the ratio comparison isolates
    the cap."""
    from experimentsplan_datapipeline_spark.operators.graph import (
        random_walks,
    )
    from experimentsplan_datapipeline_spark.plans.queries import t as _t
    from pyspark.sql import functions as F

    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).distinct()
    e1 = li.select(
        F.concat(F.lit("o:"), F.col("l_orderkey").cast("string")).alias("src"),
        F.concat(F.lit("p:"), F.col("l_partkey").cast("string")).alias("dst"),
    )
    e2 = li.select(
        F.concat(F.lit("p:"), F.col("l_partkey").cast("string")).alias("src"),
        F.concat(F.lit("o:"), F.col("l_orderkey").cast("string")).alias("dst"),
    )
    seeds = _t(spark, sf_dir, "orders").select(
        F.concat(F.lit("o:"), F.col("o_orderkey").cast("string")).alias(
            "node"
        )
    )
    return random_walks(
        e1.unionByName(e2), seeds, n_steps=3, seed=7,
        broadcast_threshold=0, degree_cap=8,
    )


def _time_pair(fn, spark, small_dir: str, big_dir: str) -> dict:
    times = {}
    for tag, d in (("sf0.1_sec", small_dir), ("sf1_sec", big_dir)):
        fn(spark, d).count()  # warm
        t0 = time.monotonic()
        fn(spark, d).count()
        times[tag] = round(time.monotonic() - t0, 3)
    times["ratio"] = (
        round(times["sf1_sec"] / times["sf0.1_sec"], 2)
        if times["sf0.1_sec"]
        else None
    )
    return times


def time_queries(sf_dir: str, spark, names: list[str] | None = None) -> dict[str, float]:
    from experimentsplan_datapipeline_spark.plans.queries import QUERIES

    overrides = {
        "jaccard_prefix_join": _jaccard_full_corpus,
        "containment_prefix_join": _containment_full_corpus,
    }
    out = {}
    for name in (names if names is not None else HEAVY):
        fn = overrides.get(name, QUERIES.get(name))
        fn(spark, sf_dir).count()  # warm (plan + code paths)
        t0 = time.monotonic()
        fn(spark, sf_dir).count()
        out[name] = round(time.monotonic() - t0, 3)
    return out


def main() -> None:
    """SF1_PROBE_ONLY=name1,name2 (substring match on result keys) limits
    the run — a new round's probes can be measured without re-timing the
    whole HEAVY suite."""
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1"
    only = [s for s in os.environ.get("SF1_PROBE_ONLY", "").split(",") if s]

    def wanted(key: str) -> bool:
        return not only or any(s in key for s in only)

    if not os.path.exists(os.path.join(out_dir, "documents.parquet")):
        print("building 10x corpus ...", file=sys.stderr)
        build_sf1(out_dir)
    from experimentsplan_datapipeline_spark.session import get_session

    spark = get_session()
    spark.sparkContext.setLogLevel("ERROR")
    result = {}
    heavy = [n for n in HEAVY if wanted(n)]
    if heavy:
        small = time_queries(SRC, spark, heavy)
        big = time_queries(out_dir, spark, heavy)
        result.update({
            name: {
                "sf0.1_sec": small[name],
                "sf1_sec": big[name],
                "ratio": round(big[name] / small[name], 2)
                if small[name] else None,
            }
            for name in heavy
        })
    # adversarial regimes (VERDICT r7 item 5): structure held constant,
    # rows scaled 10x
    if wanted("dedup_substring_spans@dup_corpus"):
        dup_small = os.path.join(out_dir, "adv_dup2")
        dup_big = os.path.join(out_dir, "adv_dup20")
        print("building duplicated corpora ...", file=sys.stderr)
        build_dup_corpus(dup_small, copies=2)
        build_dup_corpus(dup_big, copies=20)
        result["dedup_substring_spans@dup_corpus"] = _time_pair(
            _spans_op, spark, dup_small, dup_big
        )
    if wanted("heavy_hitters@uniform_keys"):
        result["heavy_hitters@uniform_keys"] = _time_pair(
            _heavy_hitters_uniform, spark, SRC, out_dir
        )
    if wanted("sorted_neighborhood@documents"):
        result["sorted_neighborhood@documents"] = _time_pair(
            _snm_docs, spark, SRC, out_dir
        )
    # round 9: the ingest-gate story end-to-end (VERDICT r8 item 3) + the
    # bounded-vocab source-overlap regime (item 8)
    if wanted("ingest_incremental@split"):
        result["ingest_incremental@split"] = _time_pair(
            _ingest_incremental, spark, SRC, out_dir
        )
    if wanted("ingest_incremental@neardup_batch"):
        result["ingest_incremental@neardup_batch"] = _time_pair(
            _ingest_incremental_neardup, spark, SRC, out_dir
        )
    if wanted("ingest_funnel@split"):
        result["ingest_funnel@split"] = _time_pair(
            _ingest_funnel, spark, SRC, out_dir
        )
    if wanted("ingest_steady_state@indexed"):
        result["ingest_steady_state@indexed"] = _time_pair(
            _ingest_steady_state, spark, SRC, out_dir
        )
    if wanted("source_overlap@bounded_vocab"):
        bv_small = os.path.join(out_dir, "adv_bv20_small")
        bv_big = os.path.join(out_dir, "adv_bv20_big")
        print("building bounded-vocab corpora ...", file=sys.stderr)
        build_bounded_vocab_corpus(bv_small, SRC)
        build_bounded_vocab_corpus(bv_big, out_dir)
        from experimentsplan_datapipeline_spark.plans.queries import QUERIES

        result["source_overlap@bounded_vocab"] = _time_pair(
            QUERIES["corpus_source_overlap"], spark, bv_small, bv_big
        )
    # round 10: the two window-tier ops (VERDICT r9 item 6)
    if wanted("chunk_cdc@sf1"):
        result["chunk_cdc@sf1"] = _time_pair(_chunk_cdc, spark, SRC, out_dir)
    if wanted("chunk_cdc@megadoc"):
        mega = os.path.join(out_dir, "adv_megadoc")
        print("building mega-doc corpus ...", file=sys.stderr)
        build_megadoc_corpus(mega)
        # NOT a size pair: same total tokens, 8 docs vs ~5k docs — the
        # ratio is the parallelism loss of the per-doc window, which must
        # stay a small constant (doc-length-bounded), not a blowup
        result["chunk_cdc@megadoc"] = _time_pair(
            _chunk_cdc, spark, SRC, mega
        )
    if wanted("batch_padding@sf1"):
        result["batch_padding@sf1"] = _time_pair(
            _batch_padding, spark, SRC, out_dir
        )
    if wanted("bpe_train@sf1"):
        result["bpe_train@sf1"] = _time_pair(
            _bpe_train_probe, spark, SRC, out_dir
        )
    if wanted("cdc_dedup@sf1"):
        result["cdc_dedup@sf1"] = _time_pair(
            _cdc_dedup_probe, spark, SRC, out_dir
        )
    if wanted("qc_train@sf1"):
        result["qc_train@sf1"] = _time_pair(
            _qc_train_probe, spark, SRC, out_dir
        )
    if wanted("live_funnel@sf1"):
        result["live_funnel@sf1"] = _time_pair(
            _live_funnel_probe, spark, SRC, out_dir
        )
    # round 11: the Arrow token-id apply path
    if wanted("bpe_ids@sf1"):
        result["bpe_ids@sf1"] = _time_pair(
            _bpe_ids_probe, spark, SRC, out_dir
        )
    # round 11: CMS / keyword tag / mixture weights / scene cuts
    if wanted("keyword_tag@sf1"):
        result["keyword_tag@sf1"] = _time_pair(
            _keyword_tag_probe, spark, SRC, out_dir
        )
    if wanted("cms_contract@sf1"):
        result["cms_contract@sf1"] = _time_pair(
            _cms_probe, spark, SRC, out_dir
        )
    if wanted("mixture_reweight@sf1"):
        result["mixture_reweight@sf1"] = _time_pair(
            _mw_probe, spark, SRC, out_dir
        )
    if wanted("scene_cuts@sf1"):
        result["scene_cuts@sf1"] = _time_pair(
            _scene_cuts_probe, spark, SRC, out_dir
        )
    # round 12: the r11 tail ops (VERDICT r11 item 4) + the cell-based
    # miners' candidate growth (item 1) + walks-per-node (item 2)
    from experimentsplan_datapipeline_spark.plans.queries import QUERIES

    if wanted("winnow@sf1"):
        result["winnow@sf1"] = _time_pair(
            QUERIES["text_winnow_fingerprints"], spark, SRC, out_dir
        )
    if wanted("entity_resolution@sf1"):
        result["entity_resolution@sf1"] = _time_pair(
            QUERIES["pipeline_entity_resolution"], spark, SRC, out_dir
        )
    if wanted("er_docs@sf1"):
        result["er_docs@sf1"] = _time_pair(_er_docs, spark, SRC, out_dir)
    if wanted("random_walks@sf1"):
        result["random_walks@sf1"] = _time_pair(
            QUERIES["graph_random_walks"], spark, SRC, out_dir
        )
    if wanted("random_walks@per_node"):
        result["random_walks@per_node"] = _time_pair(
            _walks_per_node_probe, spark, SRC, out_dir
        )
    if wanted("random_walks@per_node_capped"):
        result["random_walks@per_node_capped"] = _time_pair(
            _walks_per_node_capped_probe, spark, SRC, out_dir
        )
    if wanted("contrastive_export@sf1"):
        result["contrastive_export@sf1"] = _time_pair(
            _contrastive_export_probe, spark, SRC, out_dir
        )
    if wanted("hard_negatives_cells@sf1"):
        result["hard_negatives_cells@sf1"] = _time_pair(
            _miner_cells_probe("hard_negatives"), spark, SRC, out_dir
        )
    if wanted("contrastive_triplets_cells@sf1"):
        result["contrastive_triplets_cells@sf1"] = _time_pair(
            _miner_cells_probe("triplets"), spark, SRC, out_dir
        )
    if wanted("miner_candidates@growth"):
        result["miner_candidates@growth"] = _miner_candidate_growth(
            spark, SRC, out_dir
        )
    # round 15: the r14-rewrite scale proofs (VERDICT r14 item 6)
    if wanted("pagerank_setup@share"):
        result["pagerank_setup@share"] = {
            "sf0.1": _pagerank_setup_share(spark, SRC),
            "sf1": _pagerank_setup_share(spark, out_dir),
        }
    if wanted("live_gate@epochs"):
        result["live_gate@epochs"] = _live_gate_epochs(spark, SRC)
    # round 11: the 100x steady-state probes (VERDICT r10 item 3)
    sf10_dir = os.path.join(out_dir, "sf10")
    sf10_probes = [
        ("steady_exact@sf10", _steady_exact_fixed),
        ("steady_neardup@sf10", _steady_near_fixed),
        ("ann_index_query@sf10", _ann_query_fixed),
    ]
    if any(wanted(k) for k, _ in sf10_probes):
        print("building 100x corpus ...", file=sys.stderr)
        build_sf10(sf10_dir)
        dirs = {"sf0.1": SRC, "sf1": out_dir, "sf10": sf10_dir}
        for key, fn in sf10_probes:
            if wanted(key):
                result[key] = _time_scales(fn, spark, dirs)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
