"""Live streaming ingest gate (SURVEY.md §2.9 + the H41/H42 ingest story).

The reference's streaming surface is periodic side-effects over a step
stream (train/train_stage_1/train.py:95-117: every N steps, act on the
accumulated state). The engine's equivalent for data ingest: a document
stream drains in micro-batches, and EVERY micro-batch runs the incremental
MinHash near-dup screen against the PERSISTED corpus LSH state
(operators/dedup.py::minhash_index_write) — the same gate
``pipeline_ingest_batch`` runs one-shot, now in its live form. With
``grow_state=True`` each micro-batch's accepted (non-duplicate) documents
are appended to the state before the next batch arrives, so later
micro-batches are screened against earlier ones — the sequential semantics
a real ingest pipeline needs, verified against a hand-unrolled batch
replay in tests/test_ingest.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from experimentsplan_datapipeline_spark.operators.dedup import (
    minhash_bandkeys,
    minhash_lsh_incremental,
)


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
):
    """Build the foreachBatch writer for the live ingest gate. Caller
    configures the trigger (``run_available_now`` for drains) and the
    checkpoint location.

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
    band keys in ``state_dir``.

    Restart safety — EXACTLY-ONCE end to end, with plain parquet:

    - every output (hits, accepted text, accepted band keys) writes its
      own ``epoch=N`` partition dir with mode=overwrite, so a
      crash-replayed epoch overwrites itself instead of appending
      duplicates (epoch ids continue from the checkpoint; committed
      epochs are never reused);
    - every STATE READ filters ``epoch < N``, so a replayed epoch sees
      exactly the pre-epoch state even when its own partial writes
      survived the crash — without the filter, a replay would
      self-match the batch against its own half-written state, emit
      bogus self-pairs, and overwrite the accepted set as empty while
      the band keys lingered (text-less keys = silently missed dups
      forever). The seed index table is never appended by the stream
      for the same reason: table appends are not epoch-addressable, so
      they cannot be made replay-idempotent.
    """
    if grow_state and (accepted_dir is None or state_dir is None):
        raise ValueError("grow_state=True requires accepted_dir and state_dir")

    def gate(mb: DataFrame, epoch_id: int) -> None:
        spark = mb.sparkSession
        prior = F.col("epoch") < F.lit(epoch_id)
        corpus_now = corpus
        idx = spark.table(index_table)
        # EXPLICIT schemas on both state reads (epoch is the partition
        # column): a crashed first epoch can leave a partition dir with
        # only _temporary inside — zero data files, so schema INFERENCE
        # would raise on every replay and wedge the stream permanently;
        # with the schema the read is just empty and the replay heals it
        acc_schema = corpus.select(id_col, text_col).schema.add(
            "epoch", "long"
        )
        key_schema = idx.select(id_col, "band", "key").schema.add(
            "epoch", "long"
        )
        if grow_state and _dir_has_data(spark, accepted_dir):
            grown = (
                spark.read.schema(acc_schema).parquet(accepted_dir)
                .filter(prior)
                .select(id_col, text_col)
            )
            corpus_now = corpus.select(id_col, text_col).unionByName(grown)
        if grow_state and _dir_has_data(spark, state_dir):
            grown_keys = (
                spark.read.schema(key_schema).parquet(state_dir)
                .filter(prior)
                .select(id_col, "band", "key")
            )
            idx = idx.unionByName(grown_keys)
        hits = minhash_lsh_incremental(
            corpus_now, mb, text_col, id_col,
            num_hashes=num_hashes, bands=bands, shingle_size=shingle_size,
            threshold=threshold, portable_seed=portable_seed,
            corpus_bandkeys=idx,
        ).localCheckpoint(eager=True)  # hit ids feed the accept filter below
        hits.write.mode("overwrite").parquet(
            os.path.join(result_dir, f"epoch={epoch_id}")
        )
        if grow_state:
            dup_ids = hits.select(
                F.col("batch_id").alias(id_col)
            ).distinct()
            accepted = mb.join(
                F.broadcast(dup_ids), id_col, "left_anti"
            ).localCheckpoint(eager=True)  # feeds both state writes once
            accepted.select(id_col, text_col).write.mode("overwrite").parquet(
                os.path.join(accepted_dir, f"epoch={epoch_id}")
            )
            minhash_bandkeys(
                accepted, text_col, id_col,
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
