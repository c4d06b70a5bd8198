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
    minhash_index_write,
    minhash_lsh_incremental,
)


def _dir_has_data(spark, path: str) -> bool:
    """Hadoop-FS existence probe (works for local, hdfs://, s3a://)."""
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(hconf)
    return bool(fs.exists(p))


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
):
    """Build the foreachBatch writer for the live ingest gate. Caller
    configures the trigger (``run_available_now`` for drains) and the
    checkpoint location.

    Per micro-batch: band the batch against the CURRENT persisted index
    (``spark.table(index_table)`` — re-read each epoch, so appended state
    is visible), verify candidate-only exact Jaccard, append the verified
    (batch_id, corpus_id, jaccard) hits to ``result_dir``. The corpus
    text for verification is the static ``corpus`` plus — when
    ``grow_state`` — the accepted docs accumulated in ``accepted_dir``.

    ``grow_state=True`` then appends the batch's accepted (non-hit) docs
    to BOTH halves of the state: their band keys into ``index_table``
    (bucketed append — only the new docs hash) and their (id, text) rows
    into ``accepted_dir`` (needed only for verify, read candidate-pruned).

    Restart safety — EXACTLY-ONCE for hits and accepted docs with plain
    parquet: each epoch writes its own ``epoch=N`` partition dir with
    mode=overwrite, so a replayed (crash-uncommitted) epoch overwrites
    itself instead of appending duplicates; epoch ids continue from the
    checkpoint across restarts, so committed epochs are never reused.
    The index-table append IS at-least-once (a replayed epoch re-appends
    its band keys), which is deliberately harmless: duplicate band-key
    rows only duplicate candidate pairs, and the candidate ``.distinct()``
    collapses them — results unchanged, a little wasted verify work on
    the one replayed epoch.
    """
    if grow_state and accepted_dir is None:
        raise ValueError("grow_state=True requires accepted_dir")

    def gate(mb: DataFrame, epoch_id: int) -> None:
        spark = mb.sparkSession
        corpus_now = corpus
        if grow_state and _dir_has_data(spark, accepted_dir):
            grown = spark.read.parquet(accepted_dir).select(id_col, text_col)
            corpus_now = corpus.select(id_col, text_col).unionByName(grown)
        idx = spark.table(index_table)
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
            accepted = mb.join(F.broadcast(dup_ids), id_col, "left_anti")
            accepted.select(id_col, text_col).write.mode("overwrite").parquet(
                os.path.join(accepted_dir, f"epoch={epoch_id}")
            )
            minhash_index_write(
                accepted, index_table, text_col, id_col,
                num_hashes=num_hashes, bands=bands,
                shingle_size=shingle_size, portable_seed=portable_seed,
                mode="append",
            )

    return batch_stream.writeStream.foreachBatch(gate).outputMode("append")


def read_gate_results(spark, result_dir: str) -> DataFrame:
    """Read back the gate's hit log across all epochs (the ``epoch=N``
    partition layout is the exactly-once mechanism, not data — dropped
    here; keep it when auditing which micro-batch flagged a pair)."""
    return spark.read.parquet(result_dir).drop("epoch")
