"""Deduplication operators for LLM-scale corpora (north-star additions).

Four tiers, cheapest first. All shuffle on compact keys (hashes/bands), never
on document text; at 100 TB the only wide exchange is the band-bucket shuffle
whose keys are 16-byte hashes.

- exact_dedup          : md5(normalized text) groupBy — one shuffle on a hash.
- minhash_lsh_dedup    : shingles -> K minhashes -> B bands -> bucket join.
- simhash_dedup        : 64-bit simhash over token hashes; bucket by prefix.
- ngram_jaccard_pairs  : verification joiner — exact Jaccard on LSH candidates
                         only (never all-pairs).
"""

from __future__ import annotations


from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from experimentsplan_datapipeline_spark import bench_hooks
from experimentsplan_datapipeline_spark.functions.text import doc_fingerprint, ngrams
from experimentsplan_datapipeline_spark.operators.curation import portable_hash
from experimentsplan_datapipeline_spark.operators.util import (
    expr_cache as _fn_cache,
    lit_frame,
    pin,
    spread_small_input,
)


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact dedup on normalized content: keep the lowest id per fingerprint.

    min_by keeps one representative row per duplicate set in a single
    partial-aggregated pass; only (fingerprint, id) cross the shuffle.
    """
    fp = doc_fingerprint(text_col)
    return (
        df.withColumn("fingerprint", fp)
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias(id_col),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


_MINHASH_PRIME = 2147483647


def minhash_coeffs(num_hashes: int, seed: int = 0x5EED) -> list[tuple[int, int]]:
    """Deterministic pseudo-random affine coefficients for the minhash
    family: a_i in [1, p), b_i in [0, p), drawn from splitmix64 (public
    constants, Steele et al. 2014). Replaces the old (2i+1, 7i+3) ladder,
    whose near-linear relation across rows correlated the K min-estimates
    and cost recall. Both the Spark signatures and the DuckDB oracle call
    THIS function, so the two sides can never drift.

    h < p = 2^31-1 and a < p keep a*h + b under 2^62 — no long overflow
    under ANSI mode."""
    mask = (1 << 64) - 1

    def smix(x: int) -> tuple[int, int]:
        x = (x + 0x9E3779B97F4A7C15) & mask
        z = x
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & mask
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & mask
        return x, z ^ (z >> 31)

    out, state = [], seed
    for _ in range(num_hashes):
        state, r1 = smix(state)
        state, r2 = smix(state)
        out.append((r1 % (_MINHASH_PRIME - 1) + 1, r2 % _MINHASH_PRIME))
    return out


def minhash_signatures(
    df: DataFrame, text_col: str, id_col: str,
    num_hashes: int = 32, shingle_size: int = 3,
    portable_seed: int | None = None,
) -> DataFrame:
    """(id, mh_0..mh_{K-1}) signature table.

    Scale shape: explode shingles to (id, h) rows — ONE hash per shingle —
    then a single partial-aggregated groupBy computes all K minima via the
    affine family (a_i*h+b_i) mod p. Map-side combine means the shuffle
    carries one K-wide row per id per partition, not the shingles. The base
    hash is reduced into [0, p) first so the affine remix can't overflow a
    long (ANSI mode errors on overflow rather than wrapping).

    ``portable_seed``: when set, the base shingle hash is the md5-derived
    ``portable_hash`` (engine-reproducible — the DuckDB oracle replays the
    whole signature) instead of xxhash64 (fastest, JVM-specific). Same
    affine family either way.

    Docs with fewer than ``shingle_size`` tokens have no shingles and are
    absent from the output (nothing to band — equivalent to null signatures).
    """
    # distinct BEFORE exploding: duplicate shingles cannot change any of the
    # K minima, so hashing them is pure waste (word-salad text repeats
    # shingles heavily). Expression trees cached per parameter set —
    # immutable plan fragments rebuilt per micro-batch/bench rep cost
    # real py4j driver time (r14, see _minhash_aggs).
    exploded = spread_small_input(df).select(
        F.col(id_col),
        F.explode(F.array_distinct(ngrams(text_col, shingle_size))).alias("__sh"),
    ).select(F.col(id_col), _mh_base_hash(portable_seed))
    return exploded.groupBy(id_col).agg(*_minhash_aggs(num_hashes))


@_fn_cache(maxsize=32)
def _mh_base_hash(portable_seed: int | None):
    """``__h`` = base shingle hash reduced into [0, p) — cached Column
    (r14 py4j-chatter fix; values unchanged)."""
    if portable_seed is not None:
        base = portable_hash([F.col("__sh")], portable_seed)
    else:
        base = F.xxhash64("__sh")
    return F.pmod(base, F.lit(_MINHASH_PRIME)).alias("__h")


@_fn_cache(maxsize=32)
def _minhash_aggs(num_hashes: int) -> tuple:
    """The K min-of-affine-remix aggregate Columns — built once per K
    (r14): constructing K*5 Column objects through py4j cost ~0.5 s per
    call, paid per streaming micro-batch and per bench rep. Same
    expressions, same values."""
    p = F.lit(_MINHASH_PRIME)
    return tuple(
        F.min(F.pmod(F.col("__h") * F.lit(a) + F.lit(b), p)).alias(f"mh_{i}")
        for i, (a, b) in enumerate(minhash_coeffs(num_hashes))
    )


def minhash_lsh_candidates(
    sig: DataFrame, id_col: str, num_hashes: int = 32, bands: int = 8,
    portable_seed: int | None = None,
) -> DataFrame:
    """LSH banding: docs sharing any band bucket become candidate pairs.

    Signature -> B band keys (hash of rows-per-band minhashes) -> self-join on
    (band, key). Only hashes shuffle. Returns distinct (id_a, id_b) with
    id_a < id_b. ``portable_seed`` switches the band key to the
    md5-derived engine-reproducible hash (see ``minhash_signatures``).
    """
    exploded = (
        sig.na.drop(subset=["mh_0"])
        .select(
            F.col(id_col),
            F.explode(
                _band_structs(num_hashes, bands, portable_seed)
            ).alias("bk"),
        )
        .select(id_col, F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    )
    left = exploded.alias("l")
    right = exploded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.key") == F.col("r.key"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b")
        )
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame, candidates: DataFrame, text_col: str, id_col: str,
    shingle_size: int = 3, threshold: float = 0.8,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard on candidate pairs only (LSH verification step).

    Joins shingle SETS (arrays) onto the candidate pair list; never
    all-pairs. ``shingles`` lets a caller that already materialized the
    (id, sh) frame (jaccard_prefix_join checkpoints it for candidate
    generation) reuse it instead of re-scanning + re-shingling the corpus.
    """
    sh = shingles if shingles is not None else spread_small_input(df).select(
        F.col(id_col), F.array_distinct(ngrams(text_col, shingle_size)).alias("sh")
    )
    a = sh.alias("a")
    b = sh.alias("b")
    joined = (
        candidates.join(a, candidates["id_a"] == F.col(f"a.{id_col}"))
        .join(b, candidates["id_b"] == F.col(f"b.{id_col}"))
    )
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    union = F.size(F.array_union(F.col("a.sh"), F.col("b.sh")))
    jac = F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))
    return joined.select(
        "id_a", "id_b", F.round(jac, 6).alias("jaccard")
    ).filter(F.col("jaccard") >= threshold)


def minhash_lsh_dedup(
    df: DataFrame, text_col: str, id_col: str,
    num_hashes: int = 32, bands: int = 8, shingle_size: int = 3,
    threshold: float = 0.8, materialize_signatures: bool = True,
    portable_seed: int | None = None,
) -> DataFrame:
    """Full near-dup pipeline: signatures -> LSH candidates -> Jaccard verify.

    Returns verified near-duplicate pairs (id_a < id_b, jaccard >= threshold).
    Connected-component dedup (keep one per cluster) composes on top via
    ``resolve_duplicate_clusters``.

    The signature table feeds BOTH sides of the banding self-join; without
    materialization Spark recomputes the shingle-hash scan per side.
    ``materialize_signatures`` localCheckpoints it (K+1 longs per doc —
    tiny next to the corpus). At 100 TB write signatures to a parquet
    stage table instead: same idea, spill-safe and resumable.
    """
    sig = minhash_signatures(
        df, text_col, id_col, num_hashes, shingle_size, portable_seed=portable_seed
    )
    if materialize_signatures:
        sig = sig.localCheckpoint(eager=False)
    cand = minhash_lsh_candidates(
        sig, id_col, num_hashes, bands, portable_seed=portable_seed
    )
    return ngram_jaccard_pairs(df, cand, text_col, id_col, shingle_size, threshold)


def minhash_bandkeys(
    df: DataFrame, text_col: str, id_col: str,
    num_hashes: int = 32, bands: int = 8, shingle_size: int = 3,
    portable_seed: int | None = None,
) -> DataFrame:
    """(id, band, key) LSH band-key frame — the unit of persistable LSH
    state. ``minhash_lsh_incremental`` bands both sides with this;
    ``minhash_index_write`` persists the corpus side as a bucketed stage
    table so steady-state ingest never re-hashes the corpus."""
    sig = minhash_signatures(
        df, text_col, id_col, num_hashes, shingle_size,
        portable_seed=portable_seed,
    )
    return (
        sig.na.drop(subset=["mh_0"])
        .select(
            F.col(id_col),
            F.explode(
                _band_structs(num_hashes, bands, portable_seed)
            ).alias("bk"),
        )
        .select(id_col, F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    )


@_fn_cache(maxsize=32)
def _band_structs(num_hashes: int, bands: int, portable_seed: int | None):
    """array<struct<band, key>> banding expression over mh_* columns —
    cached per banding family (r14 py4j-chatter fix; values unchanged)."""
    rows_per_band = num_hashes // bands
    structs = []
    for b in range(bands):
        cols = [
            F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)
        ]
        key = (
            portable_hash(cols, portable_seed)
            if portable_seed is not None
            else F.xxhash64(*cols)
        )
        structs.append(F.struct(F.lit(b).alias("band"), key.alias("key")))
    return F.array(*structs)


def minhash_lsh_incremental(
    corpus: DataFrame, batch: DataFrame, text_col: str, id_col: str,
    num_hashes: int = 32, bands: int = 8, shingle_size: int = 3,
    threshold: float = 0.8, portable_seed: int | None = None,
    corpus_bandkeys: DataFrame | None = None,
    materialize_candidates: bool = True,
    corpus_text_pushdown: int = 0,
) -> DataFrame:
    """Incremental near-dup screen: which NEW documents near-duplicate the
    EXISTING corpus — the production ingest gate (`minhash_lsh_dedup` is
    the one-shot full-corpus pass; this is what every subsequent batch
    runs). Returns verified (batch_id, corpus_id, jaccard) pairs.

    Scale shape: band keys for both sides, then a band-key equi-join of
    batch x corpus — the batch side is small, so the join is
    broadcastable and the CORPUS IS NEVER SELF-JOINED. At steady state
    pass ``corpus_bandkeys`` (the bucketed stage table
    ``minhash_index_write`` maintains, read back via
    ``minhash_index_read``) and only the batch re-hashes — no corpus
    text scan reaches the banding side at all. Exact-Jaccard
    verification is CANDIDATE-ONLY on both sides: the candidate id sets
    are band-collision-bounded, so each side semi-joins down to its
    candidates BEFORE shingling — the corpus text scan on the verify
    path reads (and shingles) only candidate rows, with the id filter
    pushed to the scan by the broadcast semi join.

    ``corpus_text_pushdown`` (the §4j mitigation, VERDICT r11 item 3):
    a broadcast semi join prunes ROWS but still SCANS every corpus row
    group — the one verify-path term that grows with the corpus. With
    ``corpus_text_pushdown=N > 0``, the candidate corpus ids are
    collected to the driver (bounded: band-collision candidates of ONE
    batch; N is the cap) and re-embedded as a literal ``id IN (...)``
    filter, which reaches the parquet scan as a pushed predicate — on
    an id-sorted table (``minhash_index_write(store_text=True)`` +
    ``minhash_index_read_text``) row-group min/max stats skip all
    non-candidate groups, making the verify read candidate-bounded at
    ANY corpus size. If the candidate set exceeds N, falls back to the
    semi join (identical output either way — the same rows survive).
    NOTE: ``corpus_text_pushdown > 0`` makes this builder EAGER — the
    candidate-id collect runs one Spark job at frame-construction time
    (the candidate frame is pinned first, so the band join runs once,
    not once for the collect and again for the verify lineage).
    """
    bb = minhash_bandkeys(
        batch, text_col, id_col, num_hashes, bands, shingle_size,
        portable_seed=portable_seed,
    ).alias("b")
    cb = (
        corpus_bandkeys
        if corpus_bandkeys is not None
        else minhash_bandkeys(
            corpus, text_col, id_col, num_hashes, bands, shingle_size,
            portable_seed=portable_seed,
        )
    ).alias("c")
    cand = (
        bb.join(
            cb,
            (F.col("b.band") == F.col("c.band"))
            & (F.col("b.key") == F.col("c.key")),
        )
        .select(
            F.col(f"b.{id_col}").alias("batch_id"),
            F.col(f"c.{id_col}").alias("corpus_id"),
        )
        .distinct()
    )
    if materialize_candidates or corpus_text_pushdown > 0:
        # reused three times below (two semi-join prunes + the verify
        # join); materialize once instead of re-running the band join.
        # False keeps the full lineage visible (plan tests) — UNLESS the
        # pushdown path's eager c_ids collect is about to run the band
        # join anyway, in which case skipping the pin would run it twice
        # (once for the collect, again for the verify lineage). At
        # cluster scale swap for a parquet stage pin for durability.
        cand = cand.localCheckpoint(eager=False)
    b_ids = cand.select(F.col("batch_id").alias(id_col)).distinct()
    c_ids = cand.select(F.col("corpus_id").alias(id_col)).distinct()
    sh_b = spread_small_input(
        batch.join(F.broadcast(b_ids), id_col, "left_semi")
    ).select(
        F.col(id_col).alias("batch_id"),
        F.array_distinct(ngrams(text_col, shingle_size)).alias("__shb"),
    )
    corpus_cand = None
    if corpus_text_pushdown > 0:
        # bounded driver collect (cap = corpus_text_pushdown): one
        # batch's band-collision candidate ids, re-embedded as a plan
        # literal so the IN-filter pushes to the parquet scan and
        # row-group stats prune (see docstring)
        ids = [
            r[0] for r in c_ids.limit(corpus_text_pushdown + 1).collect()
        ]
        if len(ids) <= corpus_text_pushdown:
            corpus_cand = corpus.filter(F.col(id_col).isin(ids))
    if corpus_cand is None:
        corpus_cand = corpus.join(F.broadcast(c_ids), id_col, "left_semi")
    sh_c = spread_small_input(corpus_cand).select(
        F.col(id_col).alias("corpus_id"),
        F.array_distinct(ngrams(text_col, shingle_size)).alias("__shc"),
    )
    joined = cand.join(sh_b, "batch_id").join(sh_c, "corpus_id")
    inter = F.size(F.array_intersect(F.col("__shb"), F.col("__shc")))
    union = F.size(F.array_union(F.col("__shb"), F.col("__shc")))
    jac = F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))
    return joined.select(
        "batch_id", "corpus_id", F.round(jac, 6).alias("jaccard")
    ).filter(F.col("jaccard") >= threshold)


_UNSET = object()


def _read_pointer(spark, meta_name: str):
    """Current meta row of a generation-pointed index, or None.

    SELF-HEALING (ADVICE r10): ``_swap_in_table`` commits a pointer by
    renaming the live table aside to ``{meta}_prev`` and renaming the
    staging table in — a crash between those two renames leaves no
    ``meta_name`` but an intact ``_prev``. Treating that as "no pointer"
    would be a silent state loss (a compacted ingest gate would screen
    against empty grown state and admit near-dups forever), so the read
    restores ``_prev`` as the live pointer instead. A concurrent writer
    crashing in that window therefore never loses the OLD pointer; its
    own commit is simply not visible until it completes."""
    if not spark.catalog.tableExists(meta_name):
        prev = f"{meta_name}_prev"
        if not spark.catalog.tableExists(prev):
            return None
        _purge_stale_warehouse_dir(spark, meta_name)
        spark.sql(f"ALTER TABLE `{prev}` RENAME TO `{meta_name}`")
    return spark.table(meta_name).first()


def _drop_gen_tables(spark, base: str, keep_gen: int | None) -> None:
    """Best-effort GC of ``{base}_g<N>`` generation tables other than
    ``keep_gen`` (leaked by a crash between data write and pointer swap,
    or superseded by a successful overwrite). Never load-bearing: a
    leaked generation is unreferenced by the pointer, so correctness
    never depends on this running."""
    import re

    pat = re.compile(re.escape(base.lower()) + r"_g(\d+)(_staging)?")
    # SHOW TABLES LIKE: one catalog round trip for the matching names —
    # spark.catalog.listTables() fetched full metadata for EVERY table
    # in the session through a py4j iterator (a bench session
    # accumulates hundreds of stage tables; measured ~10 catalog jobs
    # per index write) (r14). The LIKE pattern is a quasi-regex and the
    # name is interpolated into SQL, so a base with anything outside
    # [A-Za-z0-9_] (regex metachars, quotes) takes the slow exact
    # listTables path instead (ADVICE r14).
    if re.fullmatch(r"[A-Za-z0-9_]+", base):
        rows = spark.sql(f"SHOW TABLES LIKE '{base.lower()}_g*'").collect()
    else:
        rows = [
            {"tableName": t.name} for t in spark.catalog.listTables()
        ]
    for row in rows:
        m = pat.fullmatch(row["tableName"])
        if m and (
            keep_gen is None or int(m.group(1)) != keep_gen or m.group(2)
        ):  # staging leftovers are pre-commit scratch: always collectable
            spark.sql(f"DROP TABLE IF EXISTS `{row['tableName']}`")


@bench_hooks.build_timed
def minhash_index_write(
    corpus: DataFrame, table_name: str, text_col: str, id_col: str,
    num_hashes: int = 32, bands: int = 8, shingle_size: int = 3,
    portable_seed: int | None = None, n_buckets: int = 16,
    mode: str = "overwrite", store_text: bool | None = None,
) -> None:
    """Persist the corpus LSH band keys as a BUCKETED stage table — the
    steady-state half of the incremental ingest gate. The corpus is
    hashed ONCE here; every later ``minhash_lsh_incremental(...,
    corpus_bandkeys=minhash_index_read(...))`` call bands only the batch
    and equi-joins it against this table, so per-batch cost is
    O(batch) hashing + one broadcastable join — no corpus text scan on
    the banding path (plan-asserted in tests/test_ingest.py).

    Layout (generation-pointer commit, ADVICE r9): band keys live in
    ``{table_name}_keys_g<gen>`` (bucketed on key — pays the shuffle at
    write time) and a one-row pointer table ``{table_name}_meta``
    records (num_hashes, bands, shingle_size, portable_seed, gen). An
    overwrite writes a FRESH generation's keys table and swaps the
    pointer last (staging-table rename), so every crash window leaves
    either the old consistent (meta, keys) pair, an unreferenced leaked
    generation (GC'd by the next write), or no meta at all — readers
    fail LOUDLY via ``minhash_index_read``. The persisted hash params
    close the silent-false-negative hazard of probing an index with
    mismatched banding parameters: reads validate against the meta row.

    ``mode='append'`` grows the CURRENT generation with a new batch's
    accepted docs (pass the accepted rows as ``corpus``) after
    validating the hash params match the persisted family — the
    persisted-state evolution mirroring the reference's versioned
    checkpoint 'latest' discovery (reference
    train/common/checkpoint_utils.py:34-51). A crashed append is safely
    RETRIED with the same batch: duplicate (id, band, key) rows are
    harmless (candidates are de-duplicated downstream), and a partial
    append is healed by the retry. For epoch-addressable exactly-once
    growth use the streaming gate + ``minhash_index_compact`` instead.

    ``store_text=True`` additionally persists the corpus (id, text) as
    ``{table_name}_text_g<gen>`` — bucketed AND sorted by id, so
    parquet row-group min/max stats on the id column are tight — the
    §4j verify-scan mitigation (VERDICT r11 item 3): the near-dup
    verify's only corpus-growing term was re-scanning the SOURCE corpus
    parquet to fetch candidate text; reading candidates back from this
    table via ``minhash_index_read_text`` + the literal id pushdown in
    ``minhash_lsh_incremental(corpus_text_pushdown=...)`` skips
    non-candidate row groups entirely, making the verify read
    candidate-bounded instead of corpus-bounded. An append with
    store_text appends the batch rows; a crashed-then-retried append
    leaves duplicate (id, text) rows in the table, which would multiply
    verify-join output pairs — ``minhash_index_read_text`` therefore
    dedups on id at read time (ADVICE r12), restoring one verify row
    per (batch_id, corpus_id) regardless of retries. That read-time
    dedup keeps an ARBITRARY winner per id, so appends MUST be
    id-disjoint with the index's existing rows apart from exact
    crash-retry replays (ADVICE r13): appending a different text under
    an existing id is an unsupported "update" that would make verify
    reads nondeterministic — rebuild with mode='overwrite' instead.

    ``store_text`` in append mode: the persisted meta flag decides
    whether text rows are appended; passing ``store_text`` explicitly
    on append RAISES if it disagrees with the flag (ADVICE r12 —
    appending store_text=True to a text-less index would otherwise
    silently write nothing and only fail later at read_text). Leave it
    ``None`` on append to follow the index.
    """
    from experimentsplan_datapipeline_spark.sources.sinks import write_bucketed

    spark = corpus.sparkSession
    meta_name = f"{table_name}_meta"
    params = (num_hashes, bands, shingle_size, portable_seed)
    meta = _read_pointer(spark, meta_name)
    bk = minhash_bandkeys(
        corpus, text_col, id_col, num_hashes, bands, shingle_size,
        portable_seed=portable_seed,
    )
    if mode == "append":
        if meta is None:
            raise ValueError(
                f"minhash_index_write: cannot append — meta table "
                f"{meta_name!r} not found (index missing, or predates the "
                f"generation-pointer format); rebuild with mode='overwrite'"
            )
        stored = (
            meta["num_hashes"], meta["bands"], meta["shingle_size"],
            meta["portable_seed"],
        )
        if stored != params:
            raise ValueError(
                f"minhash_index_write: index {table_name!r} was built with "
                f"(num_hashes, bands, shingle_size, portable_seed)={stored};"
                f" cannot append with {params} — mismatched banding params "
                f"would silently miss near-duplicates"
            )
        stored_text = bool(meta.asDict().get("store_text", False))
        if store_text is not None and bool(store_text) != stored_text:
            raise ValueError(
                f"minhash_index_write: index {table_name!r} was built with "
                f"store_text={stored_text} but append was called with "
                f"store_text={bool(store_text)} — the persisted flag decides"
                f" what an append writes, so the explicit argument would be "
                f"silently ignored; pass store_text=None (default) to follow"
                f" the index, or rebuild with mode='overwrite'"
            )
        write_bucketed(
            bk, f"{table_name}_keys_g{meta['gen']}", ["key"], n_buckets,
            mode="append",
        )
        if stored_text:
            write_bucketed(
                corpus.select(F.col(id_col), F.col(text_col)),
                f"{table_name}_text_g{meta['gen']}", [id_col], n_buckets,
                sort_cols=[id_col], mode="append",
            )
        return
    store_text = bool(store_text)  # None (follow-the-index sentinel) == False
    new_gen = (meta["gen"] + 1) if meta is not None else 0
    write_bucketed(
        bk, f"{table_name}_keys_g{new_gen}", ["key"], n_buckets,
        mode="overwrite",
    )
    if store_text:
        # sorted-by-id buckets => tight parquet row-group id stats, so
        # the verify stage's literal id pushdown skips non-candidate
        # row groups (the §4j mitigation); written BEFORE the pointer
        # swap, same crash story as the keys table
        write_bucketed(
            corpus.select(F.col(id_col), F.col(text_col)),
            f"{table_name}_text_g{new_gen}", [id_col], n_buckets,
            sort_cols=[id_col], mode="overwrite",
        )
    _swap_in_table(
        spark,
        lit_frame(
            spark,
            [params + (new_gen, store_text)],
            "num_hashes int, bands int, shingle_size int, "
            "portable_seed long, gen int, store_text boolean",
        ),
        meta_name,
    )
    _drop_gen_tables(spark, f"{table_name}_keys", new_gen)
    _drop_gen_tables(spark, f"{table_name}_text", new_gen)


def minhash_index_read(
    spark, table_name: str,
    num_hashes=_UNSET, bands=_UNSET, shingle_size=_UNSET,
    portable_seed=_UNSET,
) -> DataFrame:
    """Read back the band-key stage table ``minhash_index_write`` maintains
    (the (id, band, key) frame ``minhash_lsh_incremental`` accepts as
    ``corpus_bandkeys``), resolving the current generation through the
    pointer table. Pass the banding params the BATCH will be hashed with
    to validate them against the index's persisted family (ADVICE r9):
    a mismatch raises instead of silently missing every near-duplicate
    (different params → disjoint band keys → zero candidates)."""
    meta = _read_pointer(spark, f"{table_name}_meta")
    if meta is None:
        raise ValueError(
            f"minhash_index_read: meta table {table_name + '_meta'!r} not "
            f"found — build the index with minhash_index_write first "
            f"(indexes from before the generation-pointer format must be "
            f"rebuilt)"
        )
    for arg, key in (
        (num_hashes, "num_hashes"), (bands, "bands"),
        (shingle_size, "shingle_size"), (portable_seed, "portable_seed"),
    ):
        if arg is not _UNSET and arg != meta[key]:
            raise ValueError(
                f"minhash_index_read: index {table_name!r} was built with "
                f"{key}={meta[key]!r} but the batch would band with "
                f"{key}={arg!r} — mismatched banding params would silently "
                f"miss near-duplicates; rebuild the index or fix the caller"
            )
    return spark.table(f"{table_name}_keys_g{meta['gen']}")


def minhash_index_read_text(spark, table_name: str) -> DataFrame:
    """Read back the (id, text) corpus table ``minhash_index_write(...,
    store_text=True)`` maintains — bucketed + sorted by id, the §4j
    verify-scan mitigation's read side. Pass it as ``corpus`` to
    ``minhash_lsh_incremental`` (with ``corpus_text_pushdown``) so the
    candidate-text fetch never re-scans the source corpus parquet.
    Raises if the index has no text table (built without store_text).

    Dedups on the id column (the table's first column) at read time
    (ADVICE r12): a crashed-then-retried append leaves duplicate
    (id, text) rows, and a duplicate corpus row would MULTIPLY the
    verify join's output pairs (same jaccard, repeated row). The table
    is bucketed+sorted by id, so the dropDuplicates aggregates
    bucket-locally — no extra shuffle at scale.

    CONTRACT (ADVICE r13): appends must be id-disjoint with the rows
    already in the index, except for exact crash-retry replays (same
    id, same text). The per-id dedup keeps an ARBITRARY winner, so an
    append that writes a DIFFERENT text under an existing id would make
    the verify path nondeterministically read old or new text with no
    error — "update" is not an operation this index supports; rebuild
    with mode='overwrite' to re-text an id."""
    meta = _read_pointer(spark, f"{table_name}_meta")
    if meta is None:
        raise ValueError(
            f"minhash_index_read_text: meta table {table_name + '_meta'!r}"
            f" not found — build the index with minhash_index_write first"
        )
    if not bool(meta.asDict().get("store_text", False)):
        raise ValueError(
            f"minhash_index_read_text: index {table_name!r} was built "
            f"without store_text=True — rebuild with store_text to get "
            f"the bucket-local verify path"
        )
    t = spark.table(f"{table_name}_text_g{meta['gen']}")
    return t.dropDuplicates([t.columns[0]])


def minhash_index_drop(spark, table_name: str) -> None:
    """Drop a minhash band-key index: pointer FIRST (readers fail loudly
    the instant it's gone — no window reads a half-dropped index), then
    every generation's keys (and text, if stored) table."""
    spark.sql(f"DROP TABLE IF EXISTS `{table_name}_meta_prev`")
    spark.sql(f"DROP TABLE IF EXISTS `{table_name}_meta`")
    spark.sql(f"DROP TABLE IF EXISTS `{table_name}_meta_staging`")
    _drop_gen_tables(spark, f"{table_name}_keys", None)
    _drop_gen_tables(spark, f"{table_name}_text", None)


def fingerprint_index_drop(spark, table_name: str) -> None:
    """Drop a fingerprint index: pointer first, then all generations of
    the fp and bloom tables."""
    spark.sql(f"DROP TABLE IF EXISTS `{table_name}_meta_prev`")
    spark.sql(f"DROP TABLE IF EXISTS `{table_name}_meta`")
    spark.sql(f"DROP TABLE IF EXISTS `{table_name}_meta_staging`")
    for base in (f"{table_name}_fp", f"{table_name}_bloom"):
        _drop_gen_tables(spark, base, None)


@bench_hooks.build_timed
def fingerprint_index_write(
    corpus: DataFrame, table_name: str, text_col: str,
    n_buckets: int = 16, n_bits: int = 1 << 17, n_hashes: int = 5,
    mode: str = "overwrite",
) -> None:
    """Persist the EXACT-dup screen's steady state: the corpus's
    normalized-content fingerprints as a bucketed stage table (pays its
    shuffle once) plus the Bloom words of that fingerprint set
    (n_bits/64 longs — tiny). The exact-screen analogue of
    ``minhash_index_write``: the corpus is fingerprinted ONCE; every
    later batch runs ``exact_screen_incremental`` against the tables —
    no corpus text re-scan, no re-fingerprint.

    Layout (generation-pointer commit, ADVICE r9): fingerprints live in
    ``{table_name}_fp_g<gen>`` (bucketed on fp), the Bloom words in
    ``{table_name}_bloom_g<gen>``, and a one-row pointer table
    ``{table_name}_meta`` records (n_bits, n_hashes, gen). An overwrite
    — fresh OR over an existing index — writes BOTH data tables under a
    fresh generation and swaps the pointer last (staging-table rename),
    so no crash window can pair a new bloom with an old fp table (the
    silent-false-negative hazard of in-place rebuilds): every window
    leaves the old consistent (fp, bloom, meta) triple, an unreferenced
    leaked generation (GC'd by the next write), or no meta at all — the
    screen fails LOUDLY.

    ``mode='append'`` grows the CURRENT generation with a batch's
    accepted docs: the batch's bloom words bit_or-fold into the words
    table FIRST (the union of two blooms over one (n_bits, n_hashes)
    family IS the bloom of the union set; commit via staging swap),
    then the fingerprints append. A crash between the two leaves the
    bloom a SUPERSET of the fp table — false positives only, killed by
    the exact join — and a crashed append is safely RETRIED with the
    same batch: the bloom fold is idempotent and duplicate fp rows
    cannot change a semi-join. fp-without-bloom — the one state that
    silently misses duplicates forever — is unreachable in every mode.
    The persisted family means the screen can never probe with
    mismatched (n_bits, n_hashes). The corpus is fingerprinted once:
    the fp frame is checkpointed and feeds both writes.
    """
    from experimentsplan_datapipeline_spark.functions.text import doc_fingerprint
    from experimentsplan_datapipeline_spark.sources.sinks import write_bucketed

    spark = corpus.sparkSession
    meta_name = f"{table_name}_meta"
    meta = _read_pointer(spark, meta_name)
    fp = (
        corpus.select(doc_fingerprint(text_col).alias("fp"))
        .distinct()
        .localCheckpoint(eager=True)  # one fingerprint pass feeds both writes
    )
    positions = ", ".join(
        f"pmod(xxhash64(cast(fp as string), {i}), {n_bits}L)"
        for i in range(n_hashes)
    )
    words = (
        fp.selectExpr(f"explode(array({positions})) as p")
        .selectExpr("p div 64 as w", "shiftleft(1L, cast(p % 64 as int)) as m")
        .groupBy("w")
        .agg(F.expr("bit_or(m)").alias("m"))
    )
    if mode == "append":
        if meta is None:
            raise ValueError(
                f"fingerprint_index_write: cannot append — meta table "
                f"{meta_name!r} not found (index missing, or predates the "
                f"generation-pointer format); rebuild with mode='overwrite'"
            )
        if (meta["n_bits"], meta["n_hashes"]) != (n_bits, n_hashes):
            raise ValueError(
                f"fingerprint_index_write: index {table_name!r} was built "
                f"with (n_bits={meta['n_bits']}, n_hashes={meta['n_hashes']});"
                f" cannot append with ({n_bits}, {n_hashes})"
            )
        gen = meta["gen"]
        bloom_name = f"{table_name}_bloom_g{gen}"
        words = (
            spark.table(bloom_name).unionByName(words)
            .groupBy("w").agg(F.expr("bit_or(m)").alias("m"))
            .localCheckpoint(eager=True)  # materialize before the swap
        )
        _swap_in_table(spark, words, bloom_name)  # bloom-first: superset-safe
        write_bucketed(fp, f"{table_name}_fp_g{gen}", ["fp"], n_buckets,
                       mode="append")
        return
    new_gen = (meta["gen"] + 1) if meta is not None else 0
    write_bucketed(fp, f"{table_name}_fp_g{new_gen}", ["fp"], n_buckets,
                   mode="overwrite")
    write_bucketed(words, f"{table_name}_bloom_g{new_gen}", ["w"], 1,
                   mode="overwrite")
    _swap_in_table(
        spark,
        lit_frame(
            spark,
            [(n_bits, n_hashes, new_gen)],
            "n_bits long, n_hashes int, gen int",
        ),
        meta_name,
    )
    for base in (f"{table_name}_fp", f"{table_name}_bloom"):
        _drop_gen_tables(spark, base, new_gen)


def _purge_stale_warehouse_dir(spark, table_name: str) -> None:
    """Remove a warehouse dir left by a PREVIOUS session for a table the
    current in-memory catalog does not know — such a dir blocks both
    saveAsTable and RENAME TO (mirrors write_bucketed's guard)."""
    import os
    import shutil

    if spark.catalog.tableExists(table_name):
        return
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    loc = os.path.join(warehouse.removeprefix("file:"), table_name.lower())
    if os.path.isdir(loc):
        shutil.rmtree(loc)


def _swap_in_table(spark, df: DataFrame, table_name: str) -> None:
    """Commit ``df`` as ``table_name`` via staging-write + rename-aside —
    the overwrite-in-place saveAsTable deletes the old data before the
    new files commit, so a mid-commit crash could leave a PARTIAL table
    (for the bloom, partial = silent false negatives). And a plain
    DROP-then-RENAME commit (ADVICE r10) has a window where the table is
    simply GONE: for a compaction pointer whose folded epoch dirs were
    already deleted, readers would silently treat "no pointer" as
    "nothing compacted" and lose the compacted state forever. So the
    commit never drops before the replacement is in place:

      1. write ``{table}_staging`` (crash ⇒ old table intact);
      2. rename the live table aside to ``{table}_prev`` (crash here ⇒
         ``_read_pointer`` restores ``_prev`` as live — self-healing);
      3. rename staging in (crash after ⇒ new table live, stale
         ``_prev`` collected by the next commit);
      4. drop ``_prev``.

    Stale warehouse dirs from previous sessions are purged before every
    write/rename target, mirroring write_bucketed's cross-session guard.
    """
    from experimentsplan_datapipeline_spark.sources.sinks import write_bucketed

    staging = f"{table_name}_staging"
    prev = f"{table_name}_prev"
    if spark.catalog.tableExists(prev) and not spark.catalog.tableExists(
        table_name
    ):
        # a prior commit crashed between its two renames: _prev is the
        # last consistent value — restore it before superseding it, so
        # every crash window of THIS commit still has a live fallback
        _purge_stale_warehouse_dir(spark, table_name)
        spark.sql(f"ALTER TABLE `{prev}` RENAME TO `{table_name}`")
    write_bucketed(df, staging, [df.columns[0]], 1, mode="overwrite")
    spark.sql(f"DROP TABLE IF EXISTS `{prev}`")  # stale from a past commit
    _purge_stale_warehouse_dir(spark, prev)
    if spark.catalog.tableExists(table_name):
        spark.sql(f"ALTER TABLE `{table_name}` RENAME TO `{prev}`")
    else:
        _purge_stale_warehouse_dir(spark, table_name)
    spark.sql(f"ALTER TABLE `{staging}` RENAME TO `{table_name}`")
    spark.sql(f"DROP TABLE IF EXISTS `{prev}`")


def exact_screen_prepare(spark, table_name: str) -> dict:
    """Resolve the fingerprint index's pointer + Bloom words ONCE and
    return the opaque probe state ``exact_screen_apply`` screens batches
    with. Split out of ``exact_screen_incremental`` (r14, guide §4.5
    heavyweight-init-once applied to the driver side): the pointer read
    is a catalog round trip + a ``first()`` job and the Bloom words are
    a driver collect — per-CALL costs that a live stream screening many
    micro-batches against a STATIC index (never appended by the stream;
    see ``streaming_ingest_funnel``) should pay once per drain, not once
    per epoch. The state pins a specific generation, so callers that
    expect the index to move between calls must re-prepare."""
    meta = _read_pointer(spark, f"{table_name}_meta")
    if meta is None:
        raise ValueError(
            f"exact_screen_incremental: meta table {table_name + '_meta'!r} "
            f"not found — build the index with fingerprint_index_write first "
            f"(indexes from before the generation-pointer format must be "
            f"rebuilt)"
        )
    n_bits, n_hashes = int(meta["n_bits"]), int(meta["n_hashes"])
    gen = meta["gen"]
    n_words = n_bits // 64
    words = [0] * n_words
    for r in spark.table(f"{table_name}_bloom_g{gen}").collect():
        words[r["w"]] = r["m"]

    def _pos(i: int) -> str:
        return f"pmod(xxhash64(cast(fp as string), {i}), {n_bits}L)"

    checks = " AND ".join(
        f"(element_at(__bloom, cast({_pos(i)} div 64 as int) + 1)"
        f" & shiftleft(1L, cast({_pos(i)} % 64 as int))) != 0"
        for i in range(n_hashes)
    )
    return {
        "words": words,
        "checks": checks,
        "fp_table": f"{table_name}_fp_g{gen}",
    }


def exact_screen_apply(
    batch: DataFrame, text_col: str, id_col: str, state: dict,
) -> DataFrame:
    """Probe ``batch`` against a prepared exact-screen ``state`` (see
    ``exact_screen_prepare``). Identical output to
    ``exact_screen_incremental`` — this is its probe half."""
    from experimentsplan_datapipeline_spark.functions.text import doc_fingerprint

    spark = batch.sparkSession
    # one parsed literal, not F.lit(list) — see joins.bloom_semi_join
    # (r14: ~1.5 s of py4j element conversion per 2048-word bitset)
    bitset = F.expr(
        "array(" + ",".join(f"{w}L" for w in state["words"]) + ")"
    )
    fps = batch.select(
        F.col(id_col), doc_fingerprint(text_col).alias("fp")
    )
    candidates = (
        fps.withColumn("__bloom", bitset)
        .filter(F.expr(state["checks"]))
        .drop("__bloom")
    )
    hits = candidates.join(
        spark.table(state["fp_table"]), "fp", "left_semi"
    ).select(F.col(id_col), F.lit(True).alias("exact_dup"))
    return (
        fps.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("exact_dup", F.lit(False)).alias("exact_dup"),
        )
    )


def exact_screen_incremental(
    batch: DataFrame, text_col: str, id_col: str, table_name: str,
) -> DataFrame:
    """Which batch docs exact-duplicate the indexed corpus — the
    steady-state exact screen. The batch's fingerprints bit-test against
    the persisted Bloom words (a bounded driver collect of n_bits/64
    longs re-embedded as a plan literal — the whole-stage-codegen prune
    from ``bloom_semi_join``), and only the bloom-POSITIVE survivors
    (true hits + <1% false positives) semi-join the bucketed fingerprint
    table, whose bucketing means the corpus side needs no exchange.
    Returns every batch row as (id, exact_dup) — false positives are
    killed by the exact join, so the flag is exact. The Bloom family
    (n_bits, n_hashes) AND the current generation are read from the
    index's pointer table, so the probe can never hash with a
    mismatched family (silent false negatives) nor pair a bloom with a
    different generation's fp table. One-shot compose of
    ``exact_screen_prepare`` + ``exact_screen_apply``; steady-state
    streams prepare once per drain and apply per micro-batch.
    """
    return exact_screen_apply(
        batch, text_col, id_col,
        exact_screen_prepare(batch.sparkSession, table_name),
    )


def minhash_estimate_pairs(
    df: DataFrame, text_col: str, id_col: str,
    num_hashes: int = 32, bands: int = 8, shingle_size: int = 3,
    portable_seed: int | None = None, error_band: float = 0.3,
) -> DataFrame:
    """MinHash sketch CONTRACT: estimate vs exact Jaccard per candidate pair.

    For every LSH-candidate pair, emits the sketch's Jaccard estimate (the
    fraction of the K minhash components that agree — the unbiased Broder
    estimator), the exact shingle-set Jaccard, the absolute error, and an
    ``ok`` flag for |est - exact| <= ``error_band`` (0.3 ~ 3.4 sigma at
    K=32, sigma = sqrt(J(1-J)/K) <= 0.089). Same contract family as the
    HLL (`approx_distinct`) and percentile (`approx_percentile_contract`)
    checks: the sketch answers, a second exact pass bounds its error.

    Scale shape: identical to ``minhash_lsh_dedup`` (signatures
    materialized once, banded candidates, never all-pairs) plus one extra
    broadcast-or-shuffle join of the K-wide signature rows onto the
    candidate list — the estimate costs K integer equality checks per
    candidate, no re-hash of the corpus. ``est_jaccard`` is a dyadic
    rational (agree/K) so the double is exact on every engine.
    """
    sig = minhash_signatures(
        df, text_col, id_col, num_hashes, shingle_size, portable_seed=portable_seed
    ).localCheckpoint(eager=False)
    cand = minhash_lsh_candidates(
        sig, id_col, num_hashes, bands, portable_seed=portable_seed
    )
    exact = ngram_jaccard_pairs(
        df, cand, text_col, id_col, shingle_size, threshold=0.0
    )
    a = sig.alias("a")
    b = sig.alias("b")
    agree = None
    for i in range(num_hashes):
        term = F.when(
            F.col(f"a.mh_{i}") == F.col(f"b.mh_{i}"), F.lit(1)
        ).otherwise(F.lit(0))
        agree = term if agree is None else agree + term
    est = agree.cast("double") / F.lit(float(num_hashes))
    err = F.round(F.abs(est - F.col("jaccard")), 6)
    return (
        exact.join(a, exact["id_a"] == F.col(f"a.{id_col}"))
        .join(b, exact["id_b"] == F.col(f"b.{id_col}"))
        .select(
            "id_a",
            "id_b",
            F.round(est, 6).alias("est_jaccard"),
            F.col("jaccard").alias("exact_jaccard"),
            err.alias("abs_err"),
            (err <= F.lit(error_band)).alias("ok"),
        )
    )


def dedup_lines_rewrite(
    df: DataFrame, id_col: str, text_col: str, sep: str = "\n"
) -> DataFrame:
    """Corpus-wide line/paragraph dedup with text REWRITE (Dolma-style):
    every distinct line survives only at its FIRST occurrence (smallest
    (doc, position) lexicographically), all later copies are deleted, and
    each document is rebuilt from its surviving lines in original order —
    the boilerplate-stripping pass that removes repeated headers/footers
    from a web corpus rather than merely flagging them
    (``boilerplate_ngrams`` is the flag-only tier). Empty lines are
    dropped everywhere (they would otherwise all dedup to one survivor).

    Scale shape: explode to (line, doc, pos) rows, ONE combine-capable
    groupBy(line) picks the min (doc, pos) struct, one equi-join on the
    line keeps first occurrences, one groupBy(doc) re-assembles with an
    in-row sort. No corpus self-join; the heavy key (the line text)
    shuffles once. Returns (id, n_lines, n_kept, clean_text) for EVERY
    input document (fully-deduped docs get n_kept=0, clean_text='').

    ``sep`` is a LITERAL separator (it is re-escaped before the regex
    split and used verbatim in the rebuild join) — a metacharacter sep
    like '.' or '|' splits on the literal character, keeping the split
    and the rebuild consistent.
    """
    import re as _re

    sep_re = _re.escape(sep)
    lines = (
        df.select(
            F.col(id_col),
            F.posexplode(F.split(F.col(text_col), sep_re)).alias("pos", "ln"),
        )
        .filter(F.col("ln") != "")
    )
    firsts = lines.groupBy("ln").agg(
        F.min(F.struct(F.col(id_col).alias("d"), F.col("pos").alias("p"))).alias(
            "fst"
        )
    )
    kept = lines.join(firsts, "ln").filter(
        (F.col(id_col) == F.col("fst.d")) & (F.col("pos") == F.col("fst.p"))
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("pos"), F.col("ln")))
                ),
                lambda s: s["ln"],
            ),
            sep,
        ).alias("clean_text"),
    )
    n_lines = F.size(
        F.filter(F.split(F.col(text_col), sep_re), lambda x: x != "")
    )
    return (
        df.select(F.col(id_col), n_lines.alias("n_lines"))
        .join(rebuilt, id_col, "left")
        .select(
            F.col(id_col),
            "n_lines",
            F.coalesce(F.col("n_kept"), F.lit(0)).alias("n_kept"),
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
        )
    )


def simhash(
    text_col: Column | str, bits: int = 64, portable_seed: int | None = None
) -> Column:
    """SimHash over whitespace tokens, as a signed long (``bits`` <= 64).

    Per token: xxhash64; per bit: +1 if set else -1, summed over tokens; the
    sign of each bit-sum sets the output bit. Pure higher-order expressions.

    ``portable_seed``: when set, tokens hash with the md5-derived 32-bit
    ``portable_hash`` (engine-reproducible; requires ``bits`` <= 32) so the
    DuckDB oracle can replay the signature bit-for-bit.
    """
    t = F.col(text_col) if isinstance(text_col, str) else text_col
    toks = F.split(F.trim(F.lower(t)), r"\s+")
    if portable_seed is not None:
        if bits > 32:
            raise ValueError("portable simhash carries 32 hash bits at most")
        hashes = F.transform(toks, lambda x: portable_hash([x], portable_seed))
    else:
        hashes = F.transform(toks, lambda x: F.xxhash64(x))
    bit_exprs = []
    for i in range(bits):
        vote = F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc
            + F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )
        bit_exprs.append(
            F.when(vote > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
                F.lit(0).cast("long")
            )
        )
    out = bit_exprs[0]
    for be in bit_exprs[1:]:
        out = out.bitwiseOR(be)
    return out


def simhash_dedup(
    df: DataFrame, text_col: str, id_col: str, prefix_bits: int = 16,
    bits: int = 64, portable_seed: int | None = None,
) -> DataFrame:
    """Near-dup candidates by SimHash prefix bucket.

    Docs sharing the top ``prefix_bits`` of their simhash land in one bucket;
    returns (bucket, id_a, id_b, hamming) pairs for verification. Bucketing
    keeps the self-join banded instead of all-pairs.
    """
    sh = spread_small_input(df).select(
        F.col(id_col), simhash(text_col, bits, portable_seed).alias("sh")
    )
    bucketed = sh.withColumn("bucket", F.shiftright(F.col("sh"), bits - prefix_bits))
    a = bucketed.alias("a")
    b = bucketed.alias("b")
    xor = F.col("a.sh").bitwiseXOR(F.col("b.sh"))
    hamming = F.bit_count(xor)
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col("a.bucket").alias("bucket"),
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            hamming.alias("hamming"),
        )
    )


def embedding_near_dup(
    df: DataFrame,
    id_col: str,
    vec_col: str = "embedding",
    threshold: float = 0.95,
    dim: int | None = None,
    n_planes: int = 0,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine >= threshold).

    ``n_planes == 0``: exact all-pairs — only for bounded/sampled sets (the
    oracle-checked form). ``n_planes > 0``: random-hyperplane LSH buckets
    first (hash join on bucket id), exact cosine verified on same-bucket
    pairs only — the 100 TB path; near-dups at high thresholds land in the
    same sign-pattern bucket with high probability.

    The filter applies to the ROUNDED cosine so the pair set is reproducible
    across engines (float ulp noise at the threshold boundary must not flip
    membership).
    """
    from experimentsplan_datapipeline_spark.functions.vectors import cosine_similarity
    from experimentsplan_datapipeline_spark.operators.similarity import (
        _hyperplane_bucket,
        fixed_hyperplanes,
    )

    base = df.select(F.col(id_col), F.col(vec_col))
    if n_planes > 0:
        if dim is None:
            raise ValueError("dim is required when n_planes > 0")
        planes = fixed_hyperplanes(dim, n_planes, seed)
        base = base.withColumn("__bucket", _hyperplane_bucket(F.col(vec_col), planes))
        join_cond = (F.col(f"a.__bucket") == F.col(f"b.__bucket")) & (
            F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
        )
    else:
        join_cond = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    pairs = base.alias("a").join(base.alias("b"), join_cond)
    cos = F.round(
        cosine_similarity(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")), 6
    )
    return pairs.select(
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
        cos.alias("cosine"),
    ).filter(F.col("cosine") >= threshold)


def resolve_duplicate_clusters(
    df: DataFrame, pairs: DataFrame, id_col: str, max_iter: int = 10
) -> DataFrame:
    """Collapse near-dup PAIRS into clusters: every row gets a representative
    id = the minimum id reachable through the duplicate graph.

    Min-label propagation WITH pointer jumping: each round propagates the min
    over direct neighbors (one hash join + partial-aggregated min — shuffle
    keys are single longs, never text), then path-compresses rep <- rep(rep)
    (safe because rep(x) <= x is an invariant, so compression only tightens).
    Compression makes label distance double per round, so convergence is
    O(log diameter) — max_iter=10 covers chains of diameter ~2^10, not 10.
    If the loop exhausts without converging we RAISE rather than silently
    return an under-merged clustering. localCheckpoint truncates lineage each
    round so the plan stays linear instead of doubling per iteration.

    Returns (id_col, rep_id) for EVERY input row; singletons map to
    themselves. Downstream "keep one per cluster" = filter id == rep_id.
    """
    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    # materialize the edge list once — its lineage is the whole upstream
    # dedup pipeline, which must not re-execute on every propagation round
    bidir = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()
    labels = (
        bidir.select(F.col("src").alias("node"))
        .union(bidir.select(F.col("dst")))
        .distinct()
        .withColumn("rep", F.col("node"))
        .localCheckpoint()
    )
    converged = False
    for _ in range(max_iter):
        neigh = (
            bidir.join(labels, bidir["dst"] == labels["node"])
            .groupBy("src")
            .agg(F.min("rep").alias("nrep"))
        )
        prop = labels.join(neigh, labels["node"] == neigh["src"], "left").select(
            F.col("node"),
            F.least(
                F.col("rep"), F.coalesce(F.col("nrep"), F.col("rep"))
            ).alias("rep"),
        )
        # pointer jump: rep <- rep(rep). rep(x) <= x always, so this is a
        # monotone tightening; it doubles label reach per round (O(log d)).
        jump = prop.select(
            F.col("node").alias("jnode"), F.col("rep").alias("jrep")
        )
        new_labels = (
            prop.join(jump, prop["rep"] == jump["jnode"], "left")
            .select(
                prop["node"],
                F.coalesce(F.col("jrep"), prop["rep"]).alias("rep"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.join(
                labels.withColumnRenamed("rep", "old_rep"), "node"
            )
            .filter(F.col("rep") != F.col("old_rep"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"resolve_duplicate_clusters: not converged after {max_iter} "
            "pointer-jumping rounds (cluster diameter > ~2^"
            f"{max_iter}); raise max_iter"
        )
    return (
        df.select(F.col(id_col))
        .join(labels, df[id_col] == labels["node"], "left")
        .select(F.col(id_col), F.coalesce("rep", F.col(id_col)).alias("rep_id"))
    )


def semantic_dedup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: list[tuple[int, list[float]]],
    threshold: float = 0.85,
) -> DataFrame:
    """SemDeDup-style semantic near-dup pairs (Abbas et al. 2023,
    "SemDeDup: Data-efficient learning at web-scale through semantic
    deduplication"): embeddings bucket into coarse k-means cells, and the
    exact cosine verification runs ONLY within a cell.

    Scale shape: cell assignment is a broadcast-literal argmax projection
    (zero shuffle); candidates come from a self-equi-join on the cell id, so
    the quadratic cost is bounded by the largest cell, never corpus-wide —
    the property that makes SemDeDup run on web-scale corpora. Ties and
    float noise are pinned: assignment uses ROUNDED cosine with ties to the
    larger cell id (ivf_topk's convention); the pair filter compares the
    ROUNDED cosine so engines agree at the threshold boundary.

    Returns (id_a, id_b, cell, cosine) with id_a < id_b. Compose with
    resolve_duplicate_clusters + keep-min-id for the "keep one per semantic
    cluster" policy.
    """
    from experimentsplan_datapipeline_spark.functions.vectors import (
        cosine_similarity,
        lit_cell_structs,
    )

    # codebook as one parsed literal (py4j-chatter fix, see
    # vectors.lit_cell_structs); per-cell cosine via one transform
    # lambda — same math, same rounding, same (cos, cell) ordering
    cent_arr = F.transform(
        lit_cell_structs(centroids, "cell", "cvec"),
        lambda s: F.struct(
            F.round(
                cosine_similarity(F.col(vec_col), s["cvec"]), 6
            ).alias("cos"),
            s["cell"].alias("cell"),
        ),
    )
    assigned = df.select(
        F.col(id_col),
        F.col(vec_col),
        F.array_max(cent_arr)["cell"].alias("cell"),
    )
    a, b = assigned.alias("a"), assigned.alias("b")
    cos = F.round(
        cosine_similarity(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")), 6
    )
    return (
        a.join(
            b,
            (F.col("a.cell") == F.col("b.cell"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.cell").alias("cell"),
            cos.alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def contamination_check(
    corpus: DataFrame,
    probes: DataFrame,
    text_col: str,
    id_col: str,
    probe_id_col: str | None = None,
    shingle_size: int = 5,
    min_shared: int = 3,
) -> DataFrame:
    """Benchmark-contamination detection: corpus docs sharing >= min_shared
    distinct ``shingle_size``-grams with any probe (eval-set) document.

    Inverted-index shape: explode both sides to (id, gram), hash join on the
    gram, count distinct shared grams per (corpus, probe) pair. The corpus
    side shuffles hashed grams once; no all-pairs comparison ever happens.
    Returns (id, probe_id, shared_grams) for flagged pairs — the removal
    step is an anti-join of the corpus against these ids.
    """
    pid = probe_id_col or id_col
    c = spread_small_input(corpus).select(
        F.col(id_col),
        F.explode(
            F.array_distinct(ngrams(text_col, shingle_size))
        ).alias("__g"),
    )
    p = probes.select(
        F.col(pid).alias("probe_id"),
        F.explode(
            F.array_distinct(ngrams(text_col, shingle_size))
        ).alias("__g"),
    )
    return (
        c.join(p, "__g")
        .groupBy(id_col, "probe_id")
        .agg(F.count(F.lit(1)).alias("shared_grams"))
        .filter(F.col("shared_grams") >= min_shared)
    )


def canonicalize_url(url: Column | str) -> Column:
    """Canonical form of a crawl URL: lowercase, scheme dropped, leading
    ``www.`` dropped, query string / fragment dropped, trailing slash
    dropped. Pure JVM regexp chain — the normalization every URL-level
    dedup tier runs before hashing (the crawl-scale analogue of the
    reference's s3:// URI parse, train/common/dataset.py:255-269)."""
    c = F.lower(url if isinstance(url, Column) else F.col(url))
    c = F.regexp_replace(c, r"^https?://", "")
    c = F.regexp_replace(c, r"^www\.", "")
    c = F.regexp_replace(c, r"[?#].*$", "")
    return F.regexp_replace(c, r"/$", "")


def url_dedup(
    df: DataFrame, url_col: str, id_col: str
) -> DataFrame:
    """URL-level dedup: one row per canonical URL, keeping the smallest id
    (deterministic winner) and the duplicate count.

    One shuffle on the canonical-url key with map-side combine (min/count
    are partial-aggregable); at 100 TB this runs before any content hash —
    it needs only the metadata column, never the document bytes.
    """
    return (
        df.withColumn("canonical_url", canonicalize_url(url_col))
        .groupBy("canonical_url")
        .agg(
            F.min(id_col).alias("keeper"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )


def _ranked_gid_sets(
    df: DataFrame, text_col: str, id_col: str, shingle_size: int
) -> tuple[DataFrame, DataFrame]:
    """Shared front end of the exact set-join family (jaccard/containment):
    distinct shingle sets (pinned via operators/util.py::pin — they feed
    candidate generation AND the final verify; conf
    spark.experimentsplan.pin.mode=table swaps the executor-local
    checkpoint for a durable parquet stage, the cluster-grade option for
    the heaviest frame in the join), xxhash64 shingle ids, a global
    rarity order (ascending document frequency, gid tiebreak), and the
    per-document arrays sorted by that order.

    Returns (sets, sorted_sets): sets = (id, grams: array<string>);
    sorted_sets = (id, sg: array<struct<df,gid>> rarity-sorted, ids:
    array<bigint>). Includes the internal-collision guard: gid-space
    pruning is only sound for documents whose shingles hash injectively
    (see jaccard_prefix_join's collision-locality argument), so a document
    with |id set| < |gram set| raises instead of risking under-recall."""
    sets = pin(
        spread_small_input(df).select(
            F.col(id_col),
            F.array_distinct(ngrams(text_col, shingle_size)).alias("grams"),
        )
    )
    tok = sets.select(
        F.col(id_col),
        F.size("grams").alias("n_str"),
        F.explode(
            F.array_distinct(F.transform("grams", lambda g: F.xxhash64(g)))
        ).alias("gid"),
    )
    dfreq = tok.groupBy("gid").agg(F.count(F.lit(1)).alias("df"))
    ranked = tok.join(dfreq, "gid")
    sorted_sets = ranked.groupBy(id_col).agg(
        F.array_sort(F.collect_list(F.struct("df", "gid"))).alias("sg"),
        F.first("n_str").alias("n_str"),
    ).select(
        id_col,
        F.when(
            F.size("sg") < F.col("n_str"),
            F.raise_error(
                "exact set join: xxhash64 collision between two shingles "
                "of one document — gid-space pruning would under-recall; "
                "rerun with a different shingle_size or report this "
                "astronomically unlikely corpus"
            ),
        ).otherwise(F.col("sg")).alias("sg"),
        F.transform("sg", lambda s: s["gid"]).alias("ids"),
    )
    return sets, sorted_sets


def jaccard_prefix_join(
    df: DataFrame, text_col: str, id_col: str,
    shingle_size: int = 3, threshold: float = 0.8,
) -> DataFrame:
    """EXACT set-similarity self-join via prefix filtering (AllPairs/PPJoin,
    Bayardo et al., WWW'07): all pairs with shingle-set Jaccard >=
    ``threshold``, with 100% recall — unlike the MinHash/LSH path there are
    no probabilistic misses — and still never an all-pairs product.

    Tokens get a global rarity order (ascending document frequency); any
    pair at Jaccard >= t shares its lowest-ranked common token near the
    front of both sorted sets (pigeonhole), so the candidate join is an
    equi-join on prefix tokens, then exact verify. Three exact prunes keep
    the candidate count near-linear in corpus size (each provably loses no
    true pair — the sf0.1 -> sf1 probe in scripts/sf1_probe.py measures the
    resulting scaling exponent):

    - length filter: t*|a| <= |b| <= |a|/t;
    - asymmetric prefixes (PPJoin indexing prefix): pairs are oriented by
      (|s|, id) lex order; a true pair's overlap O >= ceil(2t/(1+t)*|x|)
      for the lex-SMALLER x, so x's first common token sits in its first
      |x| - ceil(2t/(1+t)*|x|) + 1 tokens (at t=0.8 about half the probing
      prefix), while the larger side y needs only O >= t*|y| and keeps the
      standard |y| - ceil(t*|y|) + 1 prefix;
    - positional filter (PPJoin): a common token at 0-based positions
      (pa, pb) bounds the overlap by 1 + min(|a|-pa-1, |b|-pb-1), which
      must reach alpha = ceil(t/(1+t)*(|a|+|b|)); the bound always holds
      at the FIRST common token of a true pair, so OR-ing it across
      matched tokens keeps 100% recall.

    Shuffle shape: the whole pipeline is ONE candidate join plus one vocab
    agg (map-side combinable, collapses to |vocab| rows) — verification is
    FUSED into the candidate join instead of re-joining the corpus twice:
    shingles are compressed to xxhash64 ids, every prefix row carries its
    set's full sorted id array (~8 bytes/shingle vs ~25 for strings), and
    the join computes the id-set Jaccard inline. Recall stays exact by a
    collision-locality argument: DEFLATING a pair's id-Jaccard (the only
    way to lose a true pair) requires two distinct COMMON shingles to
    collide — both then sit in BOTH documents, so both documents show an
    INTERNAL collision (|id set| < |gram set|, detectable per row for
    free). Between internally-collision-free documents only
    cross-collisions are possible, and those strictly inflate (+1
    intersection, -1 union), so every gid-space filter (prefix pigeonhole,
    length, positional, inline Jaccard) is sound. The operator therefore
    RAISES on any internal collision (per-row codegen check, expected
    never: P < |corpus|*|doc|^2/2^64) instead of silently under-recalling
    — same contract as the pointer-jumping convergence guard in
    resolve_duplicate_clusters. Surviving pairs (output-sized, tiny) take
    the final exact verify on true string shingles, which removes any
    inflation phantoms. Rarity ordering puts the least-common tokens in prefixes,
    so bucket sizes stay small exactly where a frequency-blind banding
    would explode. The shingle-set frame feeds the prefix stages AND the
    final verify, so it is localCheckpointed once (|corpus| rows of
    distinct shingles; at 100 TB write it to parquet instead, like the
    MinHash signature note).
    """
    sets, sorted_sets = _ranked_gid_sets(df, text_col, id_col, shingle_size)
    n = F.size("sg")
    # Recall slack for every PRUNING bound: the verify accepts
    # round(j, 6) >= t, i.e. true Jaccard down to t - 5e-7, and double
    # products like 0.888...*63 can land 1 ulp ABOVE the exact rational,
    # making ceil() one too high -> prefix one too short -> a true
    # at-threshold pair pruned before verify (63-token sets sharing exactly
    # 56 shingles at t=0.8 hit this). Deriving all prune bounds from
    # te = t - 1e-6 keeps them strictly looser than the verify under both
    # 6dp rounding and float noise (~1e-9 relative), so the candidate set
    # is a superset of the accept set; the unchanged exact string verify
    # removes the handful of extra candidates.
    te = max(threshold - 1e-6, 1e-9)
    te_lit = F.lit(te)
    plen_std = n - F.ceil(te_lit * n).cast("int") + 1
    plen_short = n - F.ceil(F.lit(2.0 * te / (1.0 + te)) * n).cast("int") + 1

    def prefix_frame(plen):
        return sorted_sets.select(
            F.col(id_col),
            n.alias("n"),
            F.col("ids"),
            F.posexplode(F.slice("sg", F.lit(1), plen)).alias("pos", "p"),
        ).select(id_col, "n", "ids", "pos", F.col("p.gid").alias("gid"))

    # Both prefix frames are corpus-sized and carry the id arrays; size
    # estimates after explode/localCheckpoint are unreliable, and a planner
    # that guesses broadcast here OOMs the driver at scale — pin sort-merge.
    a = prefix_frame(plen_short).hint("merge").alias("a")  # lex-smaller side
    b = prefix_frame(plen_std).hint("merge").alias("b")
    alpha = F.ceil(F.lit(te / (1.0 + te)) * (F.col("a.n") + F.col("b.n")))
    lex_lt = (F.col("a.n") < F.col("b.n")) | (
        (F.col("a.n") == F.col("b.n"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    )
    pos_ok = (
        1
        + F.least(
            F.col("a.n") - F.col("a.pos") - 1, F.col("b.n") - F.col("b.pos") - 1
        )
    ) >= alpha
    inter = F.size(F.array_intersect(F.col("a.ids"), F.col("b.ids")))
    id_jaccard_ok = (
        inter.cast("double") / (F.col("a.n") + F.col("b.n") - inter)
    ) >= te_lit
    cand = (
        a.join(
            b,
            (F.col("a.gid") == F.col("b.gid"))
            & lex_lt
            & (F.col("b.n") <= F.col("a.n") / te_lit)  # with lex order, b >= a
            & pos_ok
            & id_jaccard_ok,  # inline fused verify on the id arrays
        )
        .select(
            F.least(F.col(f"a.{id_col}"), F.col(f"b.{id_col}")).alias("id_a"),
            F.greatest(F.col(f"a.{id_col}"), F.col(f"b.{id_col}")).alias("id_b"),
        )
        .distinct()
    )
    return ngram_jaccard_pairs(
        df, cand, text_col, id_col, shingle_size, threshold,
        shingles=sets.select(F.col(id_col), F.col("grams").alias("sh")),
    )


def containment_prefix_join(
    df: DataFrame, text_col: str, id_col: str,
    shingle_size: int = 3, threshold: float = 0.7,
) -> DataFrame:
    """EXACT asymmetric containment self-join: all ordered pairs where
    shingle-set containment |Sx ∩ Sy| / |Sx| >= ``threshold`` — "document
    x is mostly inside document y". Jaccard misses these when |y| >> |x|
    (a page quoting a whole email scores near-zero Jaccard but 1.0
    containment), so this is the dedup pass for quoted/embedded/expanded
    content: boilerplate wrappers, mailing-list digests, page-plus-comments
    rehosts of an article.

    Same fused AllPairs machinery as jaccard_prefix_join (shared
    ``_ranked_gid_sets`` front end, collision guard included, so all
    gid-space pruning below is sound):

    - x probes with its |x| - ceil(t*|x|) + 1 rarest tokens: a qualifying
      pair has overlap O >= ceil(t*|x|), so by pigeonhole the FIRST common
      token (rarity order) sits in that prefix;
    - y cannot prune its index side at all — containment puts no lower
      bound on O relative to |y| — so y indexes its FULL sorted token list
      (the inherent asymmetry of containment joins);
    - length filter: |y| >= t*|x|; positional filter at the matched token:
      1 + min(|x|-px-1, |y|-py-1) >= ceil(t*|x|);
    - inline id-containment >= t, then the output-sized survivor set
      re-verifies on true string shingles.

    Output columns: id_inner (the contained x), id_outer (the container
    y), containment (rounded 6dp). Both directions of a pair can appear —
    containment is directional.
    """
    sets, sorted_sets = _ranked_gid_sets(df, text_col, id_col, shingle_size)
    n = F.size("sg")
    # same recall-slack derivation as jaccard_prefix_join: the verify
    # accepts round(c, 6) >= t, so every prune bound uses te = t - 1e-6 to
    # stay strictly looser under 6dp rounding and float-ceil noise
    te = max(threshold - 1e-6, 1e-9)
    te_lit = F.lit(te)
    plen_probe = n - F.ceil(te_lit * n).cast("int") + 1

    def frame(plen):
        return sorted_sets.select(
            F.col(id_col),
            n.alias("n"),
            F.col("ids"),
            F.posexplode(F.slice("sg", F.lit(1), plen)).alias("pos", "p"),
        ).select(id_col, "n", "ids", "pos", F.col("p.gid").alias("gid"))

    a = frame(plen_probe).hint("merge").alias("a")  # contained side: prefix
    b = frame(n).hint("merge").alias("b")  # container side: full index
    need = F.ceil(te_lit * F.col("a.n"))
    pos_ok = (
        1
        + F.least(
            F.col("a.n") - F.col("a.pos") - 1, F.col("b.n") - F.col("b.pos") - 1
        )
    ) >= need
    inter = F.size(F.array_intersect(F.col("a.ids"), F.col("b.ids")))
    cand = (
        a.join(
            b,
            (F.col("a.gid") == F.col("b.gid"))
            & (F.col(f"a.{id_col}") != F.col(f"b.{id_col}"))
            & (F.col("b.n") >= need)
            & pos_ok
            & (inter >= need),  # inline fused containment on id arrays
        )
        .select(
            F.col(f"a.{id_col}").alias("id_inner"),
            F.col(f"b.{id_col}").alias("id_outer"),
        )
        .distinct()
    )
    sh = sets.select(F.col(id_col), F.col("grams").alias("sh"))
    x, y = sh.alias("x"), sh.alias("y")
    joined = (
        cand.join(x, cand["id_inner"] == F.col(f"x.{id_col}"))
        .join(y, cand["id_outer"] == F.col(f"y.{id_col}"))
    )
    containment = F.size(
        F.array_intersect(F.col("x.sh"), F.col("y.sh"))
    ).cast("double") / F.size("x.sh")
    return joined.select(
        "id_inner",
        "id_outer",
        F.round(containment, 6).alias("containment"),
    ).filter(F.col("containment") >= threshold)


def _short_band_value_pairs(shorts: DataFrame, d: int) -> DataFrame:
    """Length-band candidate generation for ``editdist_prefix_join``'s
    gram-free short strings, at VALUE granularity: input is any frame with
    (__s, len) columns (duplicate rows fine — the first step is distinct),
    output is every unordered DISTINCT-value pair (v1 <= v2, self pairs
    included) within ``d`` of each other by length band AND verified
    levenshtein <= d. Work is quadratic only in distinct short values —
    never in corpus rows — which is what keeps a corpus with millions of
    copies of 'ok' from generating millions-squared dead candidates.

    Bands only cover partner lengths >= own length, so pair orientation
    comes AFTER the join (least/greatest on the value); distinct absorbs
    the double hit at equal lengths.
    """
    svals = shorts.select("__s", "len").distinct()
    va = svals.select(
        F.col("__s").alias("va"),
        F.explode(F.sequence(F.col("len"), F.col("len") + d)).alias("band"),
    )
    vb = svals.select(F.col("__s").alias("vb"), F.col("len").alias("blen"))
    return (
        va.join(vb, F.col("band") == F.col("blen"))
        .select(
            F.least("va", "vb").alias("v1"),
            F.greatest("va", "vb").alias("v2"),
        )
        .distinct()
        .filter(F.levenshtein("v1", "v2") <= d)
    )


def editdist_prefix_join(
    df: DataFrame, str_col: str, id_col: str,
    q: int = 2, max_dist: int = 2,
) -> DataFrame:
    """EXACT edit-distance similarity self-join (Ed-Join family, Xiao et
    al., VLDB'08): all unordered pairs with levenshtein <= ``max_dist``,
    100% recall, never an all-pairs product. The record-linkage /
    fuzzy-key-dedup primitive (near-identical product names, OCR'd titles,
    typo'd join keys) that a corpus pipeline runs where exact-key joins
    stop matching.

    Candidate generation is q-gram prefix filtering, sound by a set-based
    count bound: one edit operation rewrites at most ``q`` sliding windows,
    so it removes at most q DISTINCT gram values from a string's gram set;
    d edits remove at most q*d, hence ed(a,b) <= d implies
    |set(Ga) n set(Gb)| >= max(|Ga|,|Gb|) - q*d. Three consequences drive
    the plan (each loses no true pair):

    - prefix filter: with grams globally ordered rarest-first (ascending
      document frequency, gram tiebreak), a qualifying pair shares a gram
      within the first min(|G|, q*d+1) grams of both sides — so the
      candidate join is an equi-join on prefix grams, bucket sizes kept
      small by rarity ordering exactly where frequency-blind bucketing
      explodes;
    - length filter: abs(len_a - len_b) <= d rides in the join condition;
    - fused count filter: every prefix row carries its full sorted gram
      array (strings are short relative to documents, so this is cheaper
      than the re-join it avoids — same fusion argument as
      jaccard_prefix_join), and the join verifies
      |intersect| >= greatest(|Ga|,|Gb|) - q*d inline, killing almost all
      false candidates before they reach a shuffle. Grams join as raw
      q-char strings — no hashing, so no collision guard is needed.

    Strings too short for the bound to bite (fewer than q*d+1 grams, i.e.
    len <= q*d+q-1, including len < q which has no grams at all) pair
    through a LENGTH-BAND route instead, run between DISTINCT string
    VALUES: each distinct short value emits its candidate partner lengths
    len..len+d, the equi-join on (band = partner len) meets every other
    distinct short value within distance d in either direction, and
    levenshtein verifies at the VALUE level before the surviving value
    pairs re-expand to row ids through an id map. Within one length
    bucket the value join is all-pairs — inherent for gram-free strings,
    and bounded: the bucket holds only DISTINCT values shorter than
    q*d+q characters, a vocab-bounded set (alphabet^(q*d+q-1) worst
    case, tiny in practice) independent of corpus row count; duplicated
    rows cost only the final id-map expansion, which is proportional to
    TRUE OUTPUT pairs, never to failed candidates (n copies of value x
    against m copies of a non-matching value y is ONE dead candidate,
    not n*m). Mixed short/long pairs stay with the gram route: the
    longer side has |G| > q*d, so the pair must share
    >= |G_long| - q*d >= 1 grams, the short side indexes its FULL gram
    set, and the prefix lemma applies with the long side's standard
    q*d+1 prefix.

    Both routes' candidates are unioned, deduped, and verified with the
    JVM codegen ``levenshtein`` — the only place edit distance is actually
    computed; everything before it is filters on lengths and gram arrays.
    Output: (id_a, id_b, dist) with id_a < id_b, one row per within-
    threshold pair.
    """
    d = max_dist
    base = spread_small_input(df).select(
        F.col(id_col),
        F.col(str_col).alias("__s"),
        F.length(str_col).alias("len"),
    )
    ng = F.greatest(F.col("len") - q + 1, F.lit(0))
    grams = base.select(
        id_col, "len",
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), ng),
                lambda i: F.substring(F.col("__s"), i, F.lit(q)),
            )
        ).alias("gs"),
    )
    # rarity order: ascending doc frequency, gram tiebreak — a global
    # |gram-vocab|-row table, map-side combinable
    dfreq = grams.select(id_col, F.explode("gs").alias("g")).groupBy(
        "g"
    ).agg(F.count(F.lit(1)).alias("df"))
    ranked = (
        grams.select(id_col, "len", F.explode("gs").alias("g"))
        .join(dfreq, "g")
        .groupBy(id_col)
        .agg(
            F.first("len").alias("n_len"),
            F.array_sort(F.collect_list(F.struct("df", "g"))).alias("sg"),
        )
        .select(
            id_col,
            "n_len",
            F.transform("sg", lambda s: s["g"]).alias("gs"),
        )
    )
    nset = F.size("gs")
    plen = F.least(nset, F.lit(q * d + 1))
    pref = ranked.select(
        F.col(id_col),
        F.col("n_len"),
        F.col("gs"),
        F.explode(F.slice("gs", F.lit(1), plen)).alias("g"),
    )
    # prefix frames are corpus-sized after the explode and carry gram
    # arrays — size estimates lie, a guessed broadcast OOMs at scale
    a = pref.hint("merge").alias("a")
    b = pref.hint("merge").alias("b")
    count_need = F.greatest(
        F.size(F.col("a.gs")), F.size(F.col("b.gs"))
    ) - F.lit(q * d)
    inter = F.size(F.array_intersect(F.col("a.gs"), F.col("b.gs")))
    cand_gram = a.join(
        b,
        (F.col("a.g") == F.col("b.g"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        & (
            F.abs(F.col("a.n_len") - F.col("b.n_len")) <= d
        )
        & (inter >= count_need),  # fused count filter (vacuous when <= 0)
    ).select(
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
    )
    shorts = base.filter(F.col("len") <= q * d + q - 1)
    vpairs = _short_band_value_pairs(shorts, d)
    m1 = shorts.select(F.col(id_col).alias("__i1"), F.col("__s").alias("v1"))
    m2 = shorts.select(F.col(id_col).alias("__i2"), F.col("__s").alias("v2"))
    # re-expand surviving VALUE pairs to row-id pairs; self value pairs
    # (v1 == v2, i.e. duplicated rows, dist 0) expand with the id-order
    # filter so each unordered row pair appears once
    cand_short = (
        vpairs.join(m1, "v1")
        .join(m2, "v2")
        .filter(F.col("__i1") != F.col("__i2"))
        .select(
            F.least("__i1", "__i2").alias("id_a"),
            F.greatest("__i1", "__i2").alias("id_b"),
        )
    )
    cand = cand_gram.unionByName(cand_short).distinct()
    x = base.select(F.col(id_col).alias("id_a"), F.col("__s").alias("__sa"))
    y = base.select(F.col(id_col).alias("id_b"), F.col("__s").alias("__sb"))
    return (
        cand.join(x, "id_a")
        .join(y, "id_b")
        .select(
            "id_a",
            "id_b",
            F.levenshtein("__sa", "__sb").alias("dist"),
        )
        .filter(F.col("dist") <= d)
    )


def duplicate_substring_spans(
    df: DataFrame, text_col: str, id_col: str, window: int = 8
) -> DataFrame:
    """EXACT substring-level duplication detection (the corpus pass of
    Lee et al. 2022, "Deduplicating Training Data Makes Language Models
    Better"): every MAXIMAL token span of length >= ``window`` whose
    every ``window``-gram occurs more than once in the corpus (across
    docs or repeated within one). Chunk- and doc-level dedup miss these
    — a boilerplate paragraph pasted mid-document duplicates a SPAN, not
    a chunk boundary; this operator returns the spans so the caller can
    cut them (the paper's remove-one-copy policy) instead of dropping
    whole documents.

    Plan shape, all corpus-scale stages map-side combinable:

    1. rolling window-grams with their 1-based token position;
    2. occurrence counts grouped on xxhash64(gram) — an 8-byte shuffle
       key instead of the ~50-byte gram string. Exactness is preserved
       by the same contract as jaccard_prefix_join: the count agg also
       carries min(gram)/max(gram), and a bucket where they differ (two
       distinct grams colliding — the only way a count can lie) RAISES
       rather than silently marking a false duplicate
       (P < |windows|^2 / 2^64);
    3. duplicated positions = grams joined to the >1-count buckets;
    4. maximal spans via gaps-and-islands PER DOCUMENT (pos - row_number
       island key): the window partitions by doc_id, so parallelism is
       per-doc and no global sort exists.

    Output: (doc_id, span_start, span_end, span_len) in 1-based token
    positions, one row per maximal duplicated span.
    """
    toks = spread_small_input(df).select(
        F.col(id_col),
        F.filter(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+"),
            lambda x: x != "",
        ).alias("__w"),
    )
    n = F.size("__w")
    grams = toks.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.greatest(n - window + 1, F.lit(0))),
                lambda i: F.concat_ws(
                    " ", F.slice("__w", i, window)
                ),
            )
        ).alias("__p0", "__g"),
    ).select(
        id_col,
        (F.col("__p0") + 1).alias("pos"),
        F.xxhash64("__g").alias("__gid"),
        F.col("__g"),
    )
    counts = grams.groupBy("__gid").agg(
        F.count(F.lit(1)).alias("__cnt"),
        F.min("__g").alias("__glo"),
        F.max("__g").alias("__ghi"),
    )
    dup = counts.select(
        F.when(
            F.col("__glo") != F.col("__ghi"),
            F.raise_error(
                "duplicate_substring_spans: xxhash64 collision between "
                "two distinct window-grams — counts would mark a false "
                "duplicate; rerun with a different window or report this "
                "astronomically unlikely corpus"
            ),
        ).otherwise(F.col("__gid")).alias("__gid"),
        "__cnt",
    ).filter(F.col("__cnt") > 1)
    marked = grams.join(dup, "__gid").select(id_col, "pos")
    isl = marked.withColumn(
        "__grp",
        F.col("pos")
        - F.row_number().over(
            Window.partitionBy(id_col).orderBy("pos")
        ),
    )
    return isl.groupBy(id_col, "__grp").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") + window - 1).alias("span_end"),
        (F.max("pos") - F.min("pos") + window).alias("span_len"),
    ).drop("__grp")


def sorted_neighborhood_pairs(
    df: DataFrame,
    order_cols: "list[str]",
    id_col: str,
    w: int,
) -> DataFrame:
    """Sorted-neighborhood blocking (Hernandez & Stolfo, SIGMOD'95): all
    unordered record pairs within rank distance <= ``w`` of each other in
    the global ``order_cols`` sort — the classic record-linkage
    candidate generator where a domain sort key (name, address, title)
    puts likely duplicates near each other and the verifier only runs on
    the O(n*w) neighborhood instead of O(n^2) pairs. Complements the
    EXACT joins (jaccard/editdist prefix): SNM is a recall-by-sort-key
    heuristic, which is sometimes precisely what a curation pipeline
    wants (cheap, bounded candidates at any similarity).

    Scale shape: the global sort rank comes from ``ordered_rank`` (range
    partition + broadcast offsets — no single-task window), and the
    neighborhood join is an EQUI-join on block cells of width ``w``: the
    lower-rank side of any qualifying pair emits its own and the next
    block cell, the higher-rank side its own only, so each pair meets in
    exactly one cell (no post-dedup) and no row multiplies more than 2x.
    Returns (id_a, id_b, rank_dist) with id_a < id_b.

    Pass a unique tiebreak (``id_col`` is appended automatically) so
    ranks are deterministic; the oracle replays
    ``row_number() OVER (ORDER BY order_cols, id)`` exactly.
    """
    from experimentsplan_datapipeline_spark.operators.sampling import (
        ordered_rank,
    )

    ranked = ordered_rank(
        df.select(id_col, *order_cols),
        list(order_cols) + [id_col],
        rank_col="__rk",
    ).select(id_col, "__rk", F.floor((F.col("__rk") - 1) / w).alias("__blk"))
    lo = ranked.select(
        F.col(id_col).alias("__ida"),
        F.col("__rk").alias("__rka"),
        F.explode(
            F.array(F.col("__blk"), F.col("__blk") + 1)
        ).alias("__cell"),
    )
    hi = ranked.select(
        F.col(id_col).alias("__idb"),
        F.col("__rk").alias("__rkb"),
        F.col("__blk").alias("__cell"),
    )
    return (
        lo.join(hi, "__cell")
        .filter(
            (F.col("__rkb") > F.col("__rka"))
            & (F.col("__rkb") - F.col("__rka") <= w)
        )
        .select(
            F.least("__ida", "__idb").alias("id_a"),
            F.greatest("__ida", "__idb").alias("id_b"),
            (F.col("__rkb") - F.col("__rka")).alias("rank_dist"),
        )
    )
