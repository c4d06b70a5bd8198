"""Live streaming ingest: near-dup gate, full funnel, and state compaction
(SURVEY.md §2.9 + the H41/H42/H44/H50/H52/H55 ingest story).

The reference's streaming surface is periodic side-effects over a step
stream (train/train_stage_1/train.py:95-117: every N steps, act on the
accumulated state). The engine's equivalent for data ingest: a document
stream drains in micro-batches, and EVERY micro-batch runs against the
PERSISTED corpus state — ``streaming_ingest_gate`` is the MinHash
near-dup screen alone; ``streaming_ingest_funnel`` is the full
quality + exact + near-dup funnel, hash-matched to the one-shot batch
funnel. With ``grow_state=True`` each micro-batch's accepted documents
join the state before the next batch arrives (sequential semantics,
verified against hand-unrolled replays in tests/test_ingest.py), and
``ingest_state_compact`` — manual or via ``auto_compact_every`` —
folds committed epoch partitions into bucketed compact tables behind a
commit-watermark high-water mark so per-batch state reads never grow
O(all epochs).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from experimentsplan_datapipeline_spark.operators.dedup import (
    _drop_gen_tables,
    _read_pointer,
    minhash_bandkeys,
    minhash_index_read,
    minhash_lsh_incremental,
)


def _fs(spark, path: str):
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(hconf), p, jvm


def _list_epochs(spark, path: str) -> list[int]:
    """Epoch numbers present as ``epoch=N`` partition dirs under ``path``
    (Hadoop-FS listing, so local/hdfs/s3a alike). Reading committed
    epochs dir-by-dir — instead of one whole-dir scan — keeps a crashed
    epoch's zero-data-file leftover from poisoning schema inference and
    keeps the compactor's read set exactly the fold set."""
    fs, p, _ = _fs(spark, path)
    if not fs.exists(p):
        return []
    out = []
    for st in fs.listStatus(p):
        name = st.getPath().getName()
        if st.isDirectory() and name.startswith("epoch="):
            try:
                out.append(int(name.split("=", 1)[1]))
            except ValueError:
                pass
    return sorted(out)


def _epoch_dirs_schema(spark, base: str, epochs: list[int]):
    """Explicit schema for the compactor's epoch-dir reads, pinned from
    the first folded dir that actually contains a data file (ADVICE
    r10: schema INFERENCE over the fold set raises when a committed
    epoch wrote zero data files — an all-dup micro-batch writes an
    empty accepted partition — and would wedge every compaction
    attempt). Returns None when every folded dir is empty of data
    files; inference over a single non-empty dir is safe."""
    fs, _, jvm = _fs(spark, base)
    for e in epochs:
        p = jvm.org.apache.hadoop.fs.Path(os.path.join(base, f"epoch={e}"))
        if not fs.exists(p):
            continue
        for st in fs.listStatus(p):
            name = st.getPath().getName()
            if st.isFile() and not name.startswith(("_", ".")):
                return spark.read.parquet(p.toString()).schema
    return None


def last_committed_epoch(spark, checkpoint_dir: str) -> int:
    """Highest micro-batch id with a commit marker in the stream's
    checkpoint (``commits/<batchId>``) — the exactly-once watermark, and
    therefore the only safe ``upto_epoch`` for ``ingest_state_compact``:
    epochs at or below it can never replay; anything above it still can.
    Returns -1 when no batch has committed yet."""
    fs, _, jvm = _fs(spark, checkpoint_dir)
    commits = jvm.org.apache.hadoop.fs.Path(
        os.path.join(checkpoint_dir, "commits")
    )
    if not fs.exists(commits):
        return -1
    best = -1
    for st in fs.listStatus(commits):
        name = st.getPath().getName()
        if name.isdigit():
            best = max(best, int(name))
    return best


def ingest_state_compact(
    spark,
    compact_table: str,
    accepted_dir: str,
    state_dir: str,
    upto_epoch: int,
    n_buckets: int = 16,
    gc_old: bool = True,
    fp_state_dir: str | None = None,
) -> None:
    """Fold the live gate's committed epoch partitions into bucketed
    compact tables behind an epoch high-water mark (VERDICT r9 item 1).

    Without this, ``grow_state=True`` accumulates one parquet
    epoch-partition per micro-batch FOREVER: per-batch state reads grow
    O(epochs) in file listings and the band-key state is maximally
    fragmented row-scattered parquet instead of the bucketed layout the
    batch path enjoys. Compaction rewrites the grown state as two
    bucketed generation tables — ``{compact_table}_acc_g<gen>`` (the
    accepted (id, text) rows, bucketed on id) and
    ``{compact_table}_keys_g<gen>`` (their band keys, bucketed on key)
    — and a one-row pointer ``{compact_table}_meta`` (hwm, gen) swapped
    last, after which the gate reads "compact tables + epochs > hwm"
    and per-batch cost is O(batch + epochs since last compaction).

    ``upto_epoch`` MUST be at or below the stream's committed watermark
    (use ``last_committed_epoch(spark, checkpoint_dir)``): committed
    epochs can never replay, so folding them — and then DELETING their
    partition dirs — is replay-safe by construction; folding an
    uncommitted epoch would double-apply it when it replays (the gate
    raises loudly if it ever sees its own epoch at or below the hwm).

    Crash windows (same generation-pointer commit as the persisted
    dedup indexes): new-gen tables written first, pointer swapped via
    staging rename, folded epoch dirs deleted only AFTER the swap, old
    generations GC'd last. A crash anywhere leaves either the old
    consistent (pointer, tables, dirs) state or unreferenced leftovers
    the next compaction collects — never a double-read or a lost epoch.
    Each compaction rewrites the full compacted state (the standard
    log-compaction trade: schedule it every K epochs so the O(state)
    rewrite amortizes over K O(batch) reads; the reference's analogue
    is the versioned checkpoint 'latest' overwrite,
    train/common/checkpoint_utils.py:34-51).

    Run between drains (or from a maintenance job): the gate re-reads
    the pointer every micro-batch, but a concurrent GC can make an
    in-flight batch's lazy read fail loudly — the batch retries; pass
    ``gc_old=False`` to defer collection if that matters.
    """
    from experimentsplan_datapipeline_spark.sources.sinks import write_bucketed

    meta_name = f"{compact_table}_meta"
    ptr = _read_pointer(spark, meta_name)
    old_hwm = ptr["hwm"] if ptr is not None else -1
    if upto_epoch < old_hwm:
        raise ValueError(
            f"ingest_state_compact: upto_epoch={upto_epoch} is below the "
            f"existing high-water mark {old_hwm} — the compacted state "
            f"already covers those epochs"
        )
    acc_fold = [
        e for e in _list_epochs(spark, accepted_dir) if old_hwm < e <= upto_epoch
    ]
    key_fold = [
        e for e in _list_epochs(spark, state_dir) if old_hwm < e <= upto_epoch
    ]
    fp_fold = [
        e for e in _list_epochs(spark, fp_state_dir)
        if old_hwm < e <= upto_epoch
    ] if fp_state_dir is not None else []

    def _swap_pointer(gen: int) -> None:
        from experimentsplan_datapipeline_spark.operators.dedup import (
            _swap_in_table,
        )

        from experimentsplan_datapipeline_spark.operators.util import (
            lit_frame,
        )

        _swap_in_table(
            spark,
            lit_frame(spark, [(upto_epoch, gen)], "hwm long, gen int"),
            meta_name,
        )

    if not acc_fold and not key_fold and not fp_fold:
        if ptr is None:
            return  # nothing folded, nothing pointed at: stay absent
        cur_gen = ptr["gen"]
        if upto_epoch > old_hwm:
            _swap_pointer(cur_gen)  # hwm-only advance, same tables
    else:
        if acc_fold != key_fold or (
            fp_state_dir is not None and fp_fold != acc_fold
        ):
            # a committed epoch writes BOTH dirs (and prior compactions
            # delete from both): one-sided state below the watermark
            # means upto_epoch overshot it into a half-written epoch
            raise ValueError(
                f"ingest_state_compact: asymmetric epoch state "
                f"(accepted epochs {acc_fold}, band-key epochs {key_fold}) "
                f"— upto_epoch={upto_epoch} likely exceeds the stream's "
                f"committed watermark; use last_committed_epoch()"
            )
        new_gen = (ptr["gen"] + 1) if ptr is not None else 0
        # explicit schemas on every epoch-dir read (ADVICE r10): from
        # the previous generation's table when one exists, else pinned
        # from the first folded dir with a data file — never inferred
        # over the whole fold set, where one empty committed epoch
        # would make inference raise and wedge compaction forever
        if ptr is not None:
            acc_schema = spark.table(
                f"{compact_table}_acc_g{ptr['gen']}"
            ).schema
            key_schema = spark.table(
                f"{compact_table}_keys_g{ptr['gen']}"
            ).schema
        else:
            acc_schema = _epoch_dirs_schema(spark, accepted_dir, acc_fold)
            key_schema = _epoch_dirs_schema(spark, state_dir, key_fold)
            if acc_schema is None or key_schema is None:
                if acc_schema is not None or key_schema is not None:
                    raise ValueError(
                        "ingest_state_compact: one state family's folded "
                        "epochs are all empty while the other's are not — "
                        "a committed epoch writes symmetric (possibly "
                        "empty) state to both dirs; refusing to commit a "
                        "one-sided compact generation"
                    )
                # every folded epoch is empty and nothing is compacted
                # yet: there is no schema to write empty tables with and
                # nothing to point at — just clear the empty dirs below
                acc_fold_dirs, key_fold_dirs = acc_fold, key_fold
                for path, epochs in (
                    (accepted_dir, acc_fold_dirs),
                    (state_dir, key_fold_dirs),
                    (fp_state_dir, fp_fold),
                ):
                    if path is None:
                        continue
                    fs, _, jvm = _fs(spark, path)
                    for e in epochs:
                        fs.delete(
                            jvm.org.apache.hadoop.fs.Path(
                                os.path.join(path, f"epoch={e}")
                            ),
                            True,
                        )
                return
        acc_new = spark.read.schema(acc_schema).parquet(
            *[os.path.join(accepted_dir, f"epoch={e}") for e in acc_fold]
        ) if acc_fold else None
        if ptr is not None:
            old_acc = spark.table(f"{compact_table}_acc_g{ptr['gen']}")
            acc_new = (
                old_acc.unionByName(acc_new) if acc_new is not None else old_acc
            )
        keys_new = spark.read.schema(key_schema).parquet(
            *[os.path.join(state_dir, f"epoch={e}") for e in key_fold]
        ) if key_fold else None
        if ptr is not None:
            old_keys = spark.table(f"{compact_table}_keys_g{ptr['gen']}")
            keys_new = (
                old_keys.unionByName(keys_new)
                if keys_new is not None
                else old_keys
            )
        write_bucketed(
            acc_new, f"{compact_table}_acc_g{new_gen}",
            [acc_new.columns[0]], n_buckets, mode="overwrite",
        )
        write_bucketed(
            keys_new, f"{compact_table}_keys_g{new_gen}",
            ["key"], n_buckets, mode="overwrite",
        )
        # fingerprints (the funnel's third state family): fold when a
        # dir is given, else carry the previous generation's table
        # forward so a gate-only compaction never drops funnel state
        fp_new = spark.read.schema("fp string, epoch long").parquet(
            *[os.path.join(fp_state_dir, f"epoch={e}") for e in fp_fold]
        ).select("fp") if fp_fold else None
        if ptr is not None and spark.catalog.tableExists(
            f"{compact_table}_fp_g{ptr['gen']}"
        ):
            old_fp = spark.table(f"{compact_table}_fp_g{ptr['gen']}")
            fp_new = (
                old_fp.unionByName(fp_new) if fp_new is not None else old_fp
            )
        if fp_new is not None:
            write_bucketed(
                fp_new.distinct(), f"{compact_table}_fp_g{new_gen}",
                ["fp"], n_buckets, mode="overwrite",
            )
        _swap_pointer(new_gen)
        cur_gen = new_gen
    # the pointer now covers everything <= upto_epoch: folded dirs are
    # dead weight (committed => never replayed) — delete them so state
    # reads stop paying O(epochs) listings
    for path, epochs in (
        (accepted_dir, acc_fold),
        (state_dir, key_fold),
        (fp_state_dir, fp_fold),
    ):
        if path is None:
            continue
        fs, _, jvm = _fs(spark, path)
        for e in epochs:
            fs.delete(
                jvm.org.apache.hadoop.fs.Path(
                    os.path.join(path, f"epoch={e}")
                ),
                True,
            )
    if gc_old:
        for base in (
            f"{compact_table}_acc",
            f"{compact_table}_keys",
            f"{compact_table}_fp",
        ):
            _drop_gen_tables(spark, base, cur_gen)


def ingest_state_drop(spark, compact_table: str) -> None:
    """Drop a compacted gate/funnel state: pointer FIRST — its ``_prev``
    fallback before the live row, so the self-healing ``_read_pointer``
    can never resurrect a pointer to half-dropped tables — then every
    generation of all three state families."""
    spark.sql(f"DROP TABLE IF EXISTS `{compact_table}_meta_prev`")
    spark.sql(f"DROP TABLE IF EXISTS `{compact_table}_meta`")
    spark.sql(f"DROP TABLE IF EXISTS `{compact_table}_meta_staging`")
    for base in (
        f"{compact_table}_acc",
        f"{compact_table}_keys",
        f"{compact_table}_fp",
    ):
        _drop_gen_tables(spark, base, None)


def _dir_has_data(spark, path: str) -> bool:
    """True iff ``path`` exists AND contains at least one entry — a
    pre-created empty output dir (an mkdir'd mount point, an object-store
    prefix) must read as 'no state yet', not crash the first micro-batch
    with an unreadable-parquet error. Hadoop-FS, so local/hdfs/s3a alike."""
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(hconf)
    return bool(fs.exists(p)) and len(fs.listStatus(p)) > 0


def _grown_state(
    spark,
    corpus: DataFrame,
    idx: DataFrame,
    epoch_id: int,
    *,
    grow_state: bool,
    compact_table: str | None,
    accepted_dir: str | None,
    state_dir: str | None,
    fp_state_dir: str | None,
    id_col: str,
    text_col: str,
    caller: str,
):
    """The exactly-once state read both live screens share: resolve the
    compaction pointer, then assemble corpus text / band keys / (when
    ``fp_state_dir`` is given) fingerprints from compact tables (epochs
    <= hwm) plus epoch partitions in (hwm, epoch_id) — strictly BELOW
    the current epoch, so a crash-replayed epoch sees exactly the
    pre-epoch state even when its own partial writes survived (without
    the filter, a replay would self-match the batch against its own
    half-written state). The seed index table is never appended by the
    stream for the same reason: table appends are not
    epoch-addressable; epoch state reaches the bucketed form only
    through ``ingest_state_compact``'s commit-watermark-gated fold.

    EXPLICIT schemas on every dir read (epoch is the partition column):
    a crashed first epoch can leave a partition dir with only
    _temporary inside — zero data files, so schema INFERENCE would
    raise on every replay and wedge the stream permanently; with the
    schema the read is just empty and the replay heals it.

    Returns (corpus_now, idx, grown_fp, hwm). Raises if the replayed
    epoch sits at or below the hwm — the only way there is a compactor
    fold of an uncommitted epoch.

    A missing pointer is trustworthy (ADVICE r10): the commit protocol
    never has a window without a readable pointer — ``_swap_in_table``
    renames the live row aside before renaming staging in, and
    ``_read_pointer`` restores that ``_prev`` fallback — so pointer
    absent + orphan ``_acc_g*`` tables only means a compactor crashed
    BEFORE its first pointer commit, where the epoch dirs are still
    intact and hwm=-1 reads the exact same state the pointer would
    have covered.
    """
    hwm, compact_gen = -1, None
    if grow_state and compact_table is not None:
        ptr = _read_pointer(spark, f"{compact_table}_meta")
        if ptr is not None:
            hwm, compact_gen = ptr["hwm"], ptr["gen"]
            if epoch_id <= hwm:
                raise RuntimeError(
                    f"{caller}: replaying epoch {epoch_id} at or below "
                    f"the compaction high-water mark {hwm} — the "
                    f"compactor folded an uncommitted epoch (upto_epoch "
                    f"must come from last_committed_epoch)"
                )
    if not grow_state:
        return corpus, idx, None, hwm
    prior = (F.col("epoch") > F.lit(hwm)) & (F.col("epoch") < F.lit(epoch_id))
    acc_schema = corpus.select(id_col, text_col).schema.add("epoch", "long")
    key_schema = idx.select(id_col, "band", "key").schema.add("epoch", "long")
    corpus_now = corpus.select(id_col, text_col)
    grown_fp = None
    if compact_gen is not None:
        corpus_now = corpus_now.unionByName(
            spark.table(f"{compact_table}_acc_g{compact_gen}")
            .select(id_col, text_col)
        )
        idx = idx.unionByName(
            spark.table(f"{compact_table}_keys_g{compact_gen}")
            .select(id_col, "band", "key")
        )
        if fp_state_dir is not None:
            fp_tbl = f"{compact_table}_fp_g{compact_gen}"
            if spark.catalog.tableExists(fp_tbl):
                grown_fp = spark.table(fp_tbl).select("fp")
    if _dir_has_data(spark, accepted_dir):
        corpus_now = corpus_now.unionByName(
            spark.read.schema(acc_schema).parquet(accepted_dir)
            .filter(prior)
            .select(id_col, text_col)
        )
    if _dir_has_data(spark, state_dir):
        idx = idx.unionByName(
            spark.read.schema(key_schema).parquet(state_dir)
            .filter(prior)
            .select(id_col, "band", "key")
        )
    if fp_state_dir is not None and _dir_has_data(spark, fp_state_dir):
        fresh_fp = (
            spark.read.schema("fp string, epoch long").parquet(fp_state_dir)
            .filter(prior)
            .select("fp")
        )
        grown_fp = (
            fresh_fp if grown_fp is None else grown_fp.unionByName(fresh_fp)
        )
    return corpus_now, idx, grown_fp, hwm


def streaming_ingest_gate(
    batch_stream: DataFrame,
    corpus: DataFrame,
    index_table: str,
    result_dir: str,
    text_col: str,
    id_col: str,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_size: int = 3,
    threshold: float = 0.8,
    portable_seed: int | None = None,
    grow_state: bool = False,
    accepted_dir: str | None = None,
    state_dir: str | None = None,
    compact_table: str | None = None,
    auto_compact_every: int | None = None,
    compact_gc_old: bool = True,
    corpus_text_pushdown: int = 0,
):
    """Build the foreachBatch writer for the live ingest gate. Caller
    configures the trigger (``run_available_now`` for drains) and the
    checkpoint location.

    ``corpus_text_pushdown`` (r13 — the §4j mitigation on the LIVE
    path): pass N > 0 AND the index's id-sorted text table
    (``minhash_index_read_text``) as ``corpus`` to make every
    micro-batch's verify read candidate-bounded — the candidate ids
    re-embed as a literal IN filter that pushes through the
    static-corpus/grown-state union into both scans, so no verify-side
    corpus scan grows with the corpus (measured FLAT at 100x on the
    batch form, BASELINE.md §4j).

    Per micro-batch: band the batch against the persisted seed index
    (``index_table`` — written once by ``minhash_index_write``, never
    mutated by the stream) plus the stream's own accumulated band keys,
    verify candidate-only exact Jaccard, and write the verified
    (batch_id, corpus_id, jaccard) hits. The corpus text for
    verification is the static ``corpus`` plus — when ``grow_state`` —
    the accepted docs accumulated in ``accepted_dir``.

    ``grow_state=True`` (requires ``accepted_dir`` and ``state_dir``)
    evolves the state between micro-batches: the batch's accepted
    (non-hit) docs land as (id, text) rows in ``accepted_dir`` and as
    band keys in ``state_dir``. Pass ``compact_table`` to also read the
    compacted form of that state (``ingest_state_compact``): each batch
    then reads the bucketed compact tables plus only the epoch
    partitions ABOVE the compaction high-water mark, keeping per-batch
    state cost O(batch + epochs since last compaction) instead of
    O(all epochs) — run the compactor between drains every K epochs,
    or set ``auto_compact_every=K`` to have the gate do it itself: at
    the start of every K-th epoch N it folds epochs <= N-1, which are
    ALWAYS committed by the time batch N runs (Structured Streaming
    commits batch N-1 before triggering N, and a replayed N implies
    N-1 committed), so the auto fold can never touch a replayable
    epoch; a crash mid-fold replays epoch N and re-runs the
    (idempotent, generation-pointer-committed) compaction.

    Restart safety — EXACTLY-ONCE end to end, with plain parquet:

    - every output (hits, accepted text, accepted band keys) writes its
      own ``epoch=N`` partition dir with mode=overwrite, so a
      crash-replayed epoch overwrites itself instead of appending
      duplicates (epoch ids continue from the checkpoint; committed
      epochs are never reused);
    - every STATE READ filters ``hwm < epoch < N`` (hwm = the
      compaction high-water mark when ``compact_table`` is set, else
      -1), so a replayed epoch sees exactly the pre-epoch state even
      when its own partial writes survived the crash — without the
      filter, a replay would self-match the batch against its own
      half-written state, emit bogus self-pairs, and overwrite the
      accepted set as empty while the band keys lingered (text-less
      keys = silently missed dups forever). The seed index table is
      never appended by the stream for the same reason: table appends
      are not epoch-addressable, so they cannot be made
      replay-idempotent — epoch state reaches the bucketed form only
      through ``ingest_state_compact``'s commit-watermark-gated fold.
    """
    if grow_state and (accepted_dir is None or state_dir is None):
        raise ValueError("grow_state=True requires accepted_dir and state_dir")

    if auto_compact_every is not None and (
        not grow_state or compact_table is None
    ):
        raise ValueError(
            "auto_compact_every requires grow_state=True and compact_table"
        )

    # validated read (ADVICE r9): banding the batch with params that
    # differ from the persisted index's family would produce disjoint
    # band keys — zero candidates, every near-dup silently admitted.
    # Resolved ONCE at writer-build time (r14, guide §4.5 init-once on
    # the driver side): the seed index table is static for the stream's
    # whole lifetime (never appended by the stream — epoch state reaches
    # the bucketed form only through ingest_state_compact's separate
    # compact_table), so the per-epoch pointer read + param validation
    # (a catalog round trip and a first() job every micro-batch) carried
    # no information after the first epoch.
    seed_idx = minhash_index_read(
        batch_stream.sparkSession, index_table, num_hashes=num_hashes,
        bands=bands, shingle_size=shingle_size, portable_seed=portable_seed,
    )

    def gate(mb: DataFrame, epoch_id: int) -> None:
        spark = mb.sparkSession
        idx = seed_idx
        if (
            auto_compact_every is not None
            and epoch_id > 0
            and epoch_id % auto_compact_every == 0
        ):
            ingest_state_compact(
                spark, compact_table, accepted_dir, state_dir,
                epoch_id - 1, gc_old=compact_gc_old,
            )
        corpus_now, idx, _, _ = _grown_state(
            spark, corpus, idx, epoch_id, grow_state=grow_state,
            compact_table=compact_table, accepted_dir=accepted_dir,
            state_dir=state_dir, fp_state_dir=None, id_col=id_col,
            text_col=text_col, caller="streaming_ingest_gate",
        )
        hits = minhash_lsh_incremental(
            corpus_now, mb, text_col, id_col,
            num_hashes=num_hashes, bands=bands, shingle_size=shingle_size,
            threshold=threshold, portable_seed=portable_seed,
            corpus_bandkeys=idx,
            corpus_text_pushdown=corpus_text_pushdown,
        )
        hits_path = os.path.join(result_dir, f"epoch={epoch_id}")
        # the epoch write IS the single materialization: downstream
        # consumers read the committed partition back instead of a
        # localCheckpoint of the same rows (r15, guide §5 — one fewer
        # job per epoch, and no executor-pinned checkpoint blocks
        # accumulating unreferenced across epochs; replay semantics
        # unchanged: a replayed epoch overwrites, then reads its own
        # fresh overwrite)
        hits.write.mode("overwrite").parquet(hits_path)
        if grow_state:
            dup_ids = (
                spark.read.schema("batch_id long, corpus_id long, "
                                  "jaccard double")
                .parquet(hits_path)
                .select(F.col("batch_id").alias(id_col))
                .distinct()
            )
            accepted_path = os.path.join(accepted_dir, f"epoch={epoch_id}")
            mb.join(F.broadcast(dup_ids), id_col, "left_anti").select(
                id_col, text_col
            ).write.mode("overwrite").parquet(accepted_path)
            acc_back = spark.read.schema(
                mb.select(id_col, text_col).schema
            ).parquet(accepted_path)
            minhash_bandkeys(
                acc_back, text_col, id_col,
                num_hashes=num_hashes, bands=bands,
                shingle_size=shingle_size, portable_seed=portable_seed,
            ).write.mode("overwrite").parquet(
                os.path.join(state_dir, f"epoch={epoch_id}")
            )

    return batch_stream.writeStream.foreachBatch(gate).outputMode("append")


def read_gate_results(spark, result_dir: str) -> DataFrame:
    """Read back the gate's hit log across all epochs (the ``epoch=N``
    partition layout is the exactly-once mechanism, not data — dropped
    here; keep it when auditing which micro-batch flagged a pair)."""
    return spark.read.parquet(result_dir).drop("epoch")


def streaming_ingest_funnel(
    batch_stream: DataFrame,
    corpus: DataFrame,
    mh_index_table: str,
    fp_index_table: str,
    result_dir: str,
    text_col: str,
    id_col: str,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_size: int = 3,
    threshold: float = 0.8,
    portable_seed: int | None = None,
    grow_state: bool = False,
    accepted_dir: str | None = None,
    state_dir: str | None = None,
    fp_state_dir: str | None = None,
    compact_table: str | None = None,
    auto_compact_every: int | None = None,
    compact_gc_old: bool = True,
    corpus_text_pushdown: int = 0,
):
    """The FULL ingest funnel as a live stream — the streaming twin of
    ``pipeline_ingest_batch_indexed`` (H50): every micro-batch runs the
    Gopher-style quality gate (repetition_signals), the exact-dup screen
    against the persisted fingerprint/Bloom index (H48), and the
    near-dup screen against the persisted band-key index (H43), and
    writes a per-doc decision log (id, keep, exact_dup, near_dup,
    accepted) as its ``epoch=N`` partition. ``streaming_ingest_gate``
    is the near-dup-only form; this is what a production ingest stream
    actually runs — one pass, three screens, one decision.

    ``grow_state=True`` (requires ``accepted_dir``, ``state_dir`` AND
    ``fp_state_dir``) evolves ALL dedup state between micro-batches:
    accepted docs' text, band keys, and content fingerprints each land
    as epoch partitions, so later micro-batches reject both exact and
    near duplicates of earlier ACCEPTED stream docs. The grown exact
    screen semi-joins the batch fingerprints against the grown fp set
    directly (no bloom — table appends are not epoch-addressable, and
    the grown set is compact-table + a few epochs, so the semi-join is
    already cheap); the STATIC corpus side keeps its codegen Bloom
    bit-test. ``compact_table`` folds all three state families via
    ``ingest_state_compact(..., fp_state_dir=...)``;
    ``auto_compact_every=K`` self-compacts at the start of every K-th
    epoch (folding epochs <= N-1 — always committed; see
    ``streaming_ingest_gate``).

    Exactly-once: identical epoch-partition overwrite + (hwm, N)-bounded
    state reads as ``streaming_ingest_gate`` (see its docstring); the
    decision log replays clean because every screen reads only
    pre-epoch state. ``corpus_text_pushdown``: same §4j literal-IN
    verify pushdown as ``streaming_ingest_gate`` — pass the index's
    text table as ``corpus`` alongside it.
    """
    from experimentsplan_datapipeline_spark.functions.text import (
        doc_fingerprint,
    )
    from experimentsplan_datapipeline_spark.operators.text_analysis import (
        repetition_signals,
    )

    if grow_state and (
        accepted_dir is None or state_dir is None or fp_state_dir is None
    ):
        raise ValueError(
            "grow_state=True requires accepted_dir, state_dir and "
            "fp_state_dir"
        )
    if auto_compact_every is not None and (
        not grow_state or compact_table is None
    ):
        raise ValueError(
            "auto_compact_every requires grow_state=True and compact_table"
        )

    # both persisted seed indexes are static for the stream's lifetime
    # (the stream never appends them — grown state lives in epoch dirs /
    # compact_table), so resolve their pointers, validate the banding
    # family, and collect the Bloom words ONCE at writer-build time
    # instead of per micro-batch (r14, guide §4.5 init-once driver-side;
    # the per-epoch cost was 2 pointer reads + a Bloom-words collect =
    # three driver jobs per epoch carrying no new information)
    from experimentsplan_datapipeline_spark.operators.dedup import (
        exact_screen_apply,
        exact_screen_prepare,
    )

    seed_idx = minhash_index_read(
        batch_stream.sparkSession, mh_index_table, num_hashes=num_hashes,
        bands=bands, shingle_size=shingle_size, portable_seed=portable_seed,
    )
    fp_screen = exact_screen_prepare(
        batch_stream.sparkSession, fp_index_table
    )

    def gate(mb: DataFrame, epoch_id: int) -> None:
        spark = mb.sparkSession
        idx = seed_idx
        if (
            auto_compact_every is not None
            and epoch_id > 0
            and epoch_id % auto_compact_every == 0
        ):
            ingest_state_compact(
                spark, compact_table, accepted_dir, state_dir,
                epoch_id - 1, fp_state_dir=fp_state_dir,
                gc_old=compact_gc_old,
            )
        corpus_now, idx, grown_fp, _ = _grown_state(
            spark, corpus.select(id_col, text_col), idx, epoch_id,
            grow_state=grow_state, compact_table=compact_table,
            accepted_dir=accepted_dir, state_dir=state_dir,
            fp_state_dir=fp_state_dir, id_col=id_col, text_col=text_col,
            caller="streaming_ingest_funnel",
        )
        sig = repetition_signals(mb, id_col, text_col).select(id_col, "keep")
        exact = exact_screen_apply(mb, text_col, id_col, fp_screen)
        if grown_fp is not None:
            gex = (
                mb.select(
                    F.col(id_col), doc_fingerprint(text_col).alias("fp")
                )
                .join(grown_fp, "fp", "left_semi")
                .select(F.col(id_col), F.lit(True).alias("__gdup"))
            )
            exact = (
                exact.join(gex, id_col, "left")
                .select(
                    id_col,
                    (
                        F.col("exact_dup")
                        | F.coalesce("__gdup", F.lit(False))
                    ).alias("exact_dup"),
                )
            )
        near_ids = (
            minhash_lsh_incremental(
                corpus_now, mb, text_col, id_col,
                num_hashes=num_hashes, bands=bands,
                shingle_size=shingle_size, threshold=threshold,
                portable_seed=portable_seed, corpus_bandkeys=idx,
                corpus_text_pushdown=corpus_text_pushdown,
            )
            .select(F.col("batch_id").alias(id_col))
            .distinct()
            .withColumn("near_dup", F.lit(True))
        )
        decisions = (
            mb.select(id_col)
            .join(sig, id_col)
            .join(exact, id_col)
            .join(near_ids, id_col, "left")
            .select(
                id_col,
                "keep",
                "exact_dup",
                F.coalesce("near_dup", F.lit(False)).alias("near_dup"),
            )
            .withColumn(
                "accepted",
                F.col("keep") & ~F.col("exact_dup") & ~F.col("near_dup"),
            )
        )
        decisions_path = os.path.join(result_dir, f"epoch={epoch_id}")
        # the committed decision log IS the materialization the state
        # writes read back — no per-epoch localCheckpoint (r15, guide §5;
        # see streaming_ingest_gate): fewer jobs per epoch, no
        # unreferenced checkpoint blocks, identical replay semantics
        decisions.write.mode("overwrite").parquet(decisions_path)
        if grow_state:
            acc_ids = (
                spark.read.schema(decisions.schema)
                .parquet(decisions_path)
                .filter("accepted")
                .select(id_col)
            )
            accepted_path = os.path.join(accepted_dir, f"epoch={epoch_id}")
            mb.join(F.broadcast(acc_ids), id_col, "left_semi").select(
                id_col, text_col
            ).write.mode("overwrite").parquet(accepted_path)
            acc_back = spark.read.schema(
                mb.select(id_col, text_col).schema
            ).parquet(accepted_path)
            minhash_bandkeys(
                acc_back, text_col, id_col,
                num_hashes=num_hashes, bands=bands,
                shingle_size=shingle_size, portable_seed=portable_seed,
            ).write.mode("overwrite").parquet(
                os.path.join(state_dir, f"epoch={epoch_id}")
            )
            acc_back.select(
                doc_fingerprint(text_col).alias("fp")
            ).distinct().write.mode("overwrite").parquet(
                os.path.join(fp_state_dir, f"epoch={epoch_id}")
            )

    return batch_stream.writeStream.foreachBatch(gate).outputMode("append")


def ann_state_compact(
    spark,
    index_table: str,
    asg_dir: str,
    upto_epoch: int,
    n_buckets: int = 16,
    gc_old: bool = True,
) -> None:
    """Fold the live ANN ingest's committed epoch partitions into the
    persisted IVF index's cell-bucketed inverted lists (VERDICT r10
    item 4 — the streaming maintenance story the exact/near-dup indexes
    already have). A NEW generation ``{index_table}_asg_g<gen+1>`` is
    written as old lists + folded epochs (bucketed on cell — the fold
    pays the shuffle the per-batch path skips), the frozen centroid
    table is carried forward as ``_cells_g<gen+1>``, and the meta
    pointer commits last with the new (gen, hwm). Same replay-safety
    contract as ``ingest_state_compact``: ``upto_epoch`` must come from
    ``last_committed_epoch`` — committed epochs never replay, so
    folding THEN deleting their dirs is safe, and
    ``streaming_ann_ingest`` raises if a replayed epoch ever lands at
    or below the hwm. Crash anywhere leaves the old consistent index,
    an unreferenced leaked generation, or a healable pointer ``_prev``.
    """
    from experimentsplan_datapipeline_spark.operators.dedup import (
        _read_pointer,
        _swap_in_table,
    )
    from experimentsplan_datapipeline_spark.sources.sinks import write_bucketed

    meta_name = f"{index_table}_meta"
    ptr = _read_pointer(spark, meta_name)
    if ptr is None:
        raise ValueError(
            f"ann_state_compact: meta table {meta_name!r} not found — "
            f"build the index with ann_index_write first"
        )
    old_hwm = ptr["hwm"] if "hwm" in ptr.__fields__ else -1
    if upto_epoch < old_hwm:
        raise ValueError(
            f"ann_state_compact: upto_epoch={upto_epoch} is below the "
            f"existing high-water mark {old_hwm}"
        )
    fold = [
        e for e in _list_epochs(spark, asg_dir) if old_hwm < e <= upto_epoch
    ]
    gen = ptr["gen"]

    def _commit(new_gen: int) -> None:
        from experimentsplan_datapipeline_spark.operators.util import (
            lit_frame,
        )

        _swap_in_table(
            spark,
            lit_frame(
                spark,
                [(int(ptr["n_cells"]), new_gen, upto_epoch)],
                "n_cells int, gen int, hwm long",
            ),
            meta_name,
        )

    if not fold:
        if upto_epoch > old_hwm:
            _commit(gen)  # hwm-only advance, same tables
        return
    old_asg = spark.table(f"{index_table}_asg_g{gen}")
    asg_schema = old_asg.schema  # explicit: an empty epoch dir must not
    # wedge the fold on schema inference (ADVICE r10)
    folded = spark.read.schema(asg_schema).parquet(
        *[os.path.join(asg_dir, f"epoch={e}") for e in fold]
    )
    new_gen = gen + 1
    write_bucketed(
        old_asg.unionByName(folded), f"{index_table}_asg_g{new_gen}",
        ["cell"], n_buckets, mode="overwrite",
    )
    write_bucketed(
        spark.table(f"{index_table}_cells_g{gen}"),
        f"{index_table}_cells_g{new_gen}", ["cell"], 1, mode="overwrite",
    )
    _commit(new_gen)
    fs, _, jvm = _fs(spark, asg_dir)
    for e in fold:
        fs.delete(
            jvm.org.apache.hadoop.fs.Path(
                os.path.join(asg_dir, f"epoch={e}")
            ),
            True,
        )
    if gc_old:
        from experimentsplan_datapipeline_spark.operators.dedup import (
            _drop_gen_tables,
        )

        for base in (f"{index_table}_asg", f"{index_table}_cells"):
            _drop_gen_tables(spark, base, new_gen)


def streaming_ann_ingest(
    vec_stream,
    index_table: str,
    asg_dir: str,
    vec_col: str,
    id_col: str,
    auto_compact_every: int | None = None,
    compact_gc_old: bool = True,
):
    """Live IVF index maintenance (VERDICT r10 item 4): a vector stream
    drains in micro-batches, each batch assigns to the persisted
    index's FROZEN centroids (the production trade — cells drift
    slowly; rebuild via ann_index_write(mode='overwrite') when the
    drift monitor says so) and lands as an ``epoch=N`` partition of
    (id, cell, vec) rows under ``asg_dir``. Queries see the grown
    index via ``ann_query_indexed(..., live_dir=asg_dir)`` — compact
    generation + epochs above the hwm — and
    ``ann_state_compact`` (manual between drains, or
    ``auto_compact_every=K`` at the start of every K-th epoch, which
    only ever folds epochs <= N-1: always committed, see
    ``streaming_ingest_gate``) folds committed epochs into the
    cell-bucketed lists so per-query state never grows O(all epochs).

    Exactly-once: epoch partitions overwrite on replay; the only state
    read is the frozen centroid codebook, so a replayed epoch cannot
    self-match — and it raises loudly if it ever lands at or below the
    compaction hwm (the one way a compactor could have folded an
    uncommitted epoch)."""
    from experimentsplan_datapipeline_spark.operators.dedup import (
        _read_pointer,
    )
    from experimentsplan_datapipeline_spark.operators.similarity import (
        _assign_to_cells,
        _load_centroids,
    )

    # centroids are FROZEN per generation (the docstring's contract), so
    # the k-row driver collect repeats per epoch with the same answer —
    # cache by gen (r14, guide §4.5 init-once); a compaction that bumps
    # the gen reloads, everything else reuses
    cents_by_gen: dict = {}

    def gate(mb, epoch_id: int) -> None:
        spark = mb.sparkSession
        meta = _read_pointer(spark, f"{index_table}_meta")
        if meta is None:
            raise ValueError(
                f"streaming_ann_ingest: meta table "
                f"{index_table + '_meta'!r} not found — build the index "
                f"with ann_index_write first"
            )
        hwm = meta["hwm"] if "hwm" in meta.__fields__ else -1
        if epoch_id <= hwm:
            raise RuntimeError(
                f"streaming_ann_ingest: replaying epoch {epoch_id} at or "
                f"below the compaction high-water mark {hwm} — the "
                f"compactor folded an uncommitted epoch (upto_epoch must "
                f"come from last_committed_epoch)"
            )
        if (
            auto_compact_every is not None
            and epoch_id > 0
            and epoch_id % auto_compact_every == 0
        ):
            ann_state_compact(
                spark, index_table, asg_dir, epoch_id - 1,
                gc_old=compact_gc_old,
            )
            meta = _read_pointer(spark, f"{index_table}_meta")
        gen = meta["gen"]
        cents = cents_by_gen.get(gen)
        if cents is None:
            cents = _load_centroids(spark, index_table, gen)
            cents_by_gen[gen] = cents
        _assign_to_cells(mb, vec_col, id_col, cents).write.mode(
            "overwrite"
        ).parquet(os.path.join(asg_dir, f"epoch={epoch_id}"))

    return vec_stream.writeStream.foreachBatch(gate).outputMode("append")
