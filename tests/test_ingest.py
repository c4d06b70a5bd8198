"""Incremental MinHash ingest gate: candidate-only verify + persisted index.

Round-9 hardening of the ingest story (VERDICT r8 items 1-2): the verify
stage must shingle ONLY candidate rows (semi-join prune before the ngrams
projection), and the steady-state path must band batches against a
persisted corpus band-key table with NO corpus text scan on the banding
side.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from experimentsplan_datapipeline_spark.operators.dedup import (
    fingerprint_index_drop,
    minhash_bandkeys,
    minhash_index_drop,
    minhash_index_read,
    minhash_index_write,
    minhash_lsh_incremental,
)


def _docs(spark):
    base = [
        (i, f"alpha beta gamma delta epsilon zeta eta theta doc{i} "
            f"iota kappa lam mu nu xi omicron pi rho")
        for i in range(40)
    ]
    # near-dups of docs 3 and 7 (one word appended), plus novel docs
    batch = [
        (100, base[3][1] + " sigma"),
        (101, base[7][1] + " tau"),
        (102, "completely different words with no overlap whatsoever "
              "penguin walrus igloo aurora tundra glacier fjord"),
    ]
    corpus = spark.createDataFrame(base, ["doc_id", "text"])
    bdf = spark.createDataFrame(batch, ["doc_id", "text"])
    return corpus, bdf


class TestCandidateOnlyVerify:
    def test_pairs_found_and_thresholded(self, spark):
        corpus, batch = _docs(spark)
        got = minhash_lsh_incremental(
            corpus, batch, "text", "doc_id", threshold=0.5
        ).collect()
        hits = {(r["batch_id"], r["corpus_id"]) for r in got}
        assert (100, 3) in hits and (101, 7) in hits
        assert all(r["jaccard"] >= 0.5 for r in got)
        assert not any(b == 102 for b, _ in hits)

    def test_verify_shingles_sit_above_left_semi(self, spark):
        """The corpus-side (and batch-side) shingle projection must sit
        ABOVE a LeftSemi join in the optimized plan — the verify path
        reads text for candidate ids only (VERDICT r8 item 1). Plan text
        is pre-order (parent before child), so the projection's alias
        must appear before a LeftSemi below it."""
        corpus, batch = _docs(spark)
        out = minhash_lsh_incremental(
            corpus, batch, "text", "doc_id", threshold=0.5
        )
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        assert plan.count("LeftSemi") >= 2
        for alias in ("__shc", "__shb"):
            i = plan.index(alias)
            assert "LeftSemi" in plan[i:], (
                f"{alias} shingle projection has no LeftSemi prune below it"
            )

    def test_executed_plan_semi_joins_broadcast(self, spark):
        corpus, batch = _docs(spark)
        out = minhash_lsh_incremental(
            corpus, batch, "text", "doc_id", threshold=0.5
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("LeftSemi") >= 2
        assert "CartesianProduct" not in plan


class TestPersistedIndex:
    def test_index_path_matches_recompute(self, spark, tmp_path):
        """Steady state: band keys from the bucketed stage table must give
        byte-identical results to re-hashing the corpus."""
        corpus, batch = _docs(spark)
        minhash_index_write(corpus, "t_ingest_idx", "text", "doc_id")
        try:
            idx = minhash_index_read(spark, "t_ingest_idx")
            via_index = minhash_lsh_incremental(
                corpus, batch, "text", "doc_id", threshold=0.5,
                corpus_bandkeys=idx,
            )
            recompute = minhash_lsh_incremental(
                corpus, batch, "text", "doc_id", threshold=0.5
            )
            a = sorted(map(tuple, via_index.collect()))
            b = sorted(map(tuple, recompute.collect()))
            assert a == b and a
        finally:
            minhash_index_drop(spark, "t_ingest_idx")

    def test_index_path_bands_without_corpus_text_scan(self, spark, tmp_path):
        """The banding side of the steady-state plan must contain NO corpus
        text scan: corpus text appears only once, in the candidate-pruned
        verify projection (VERDICT r8 item 2). The corpus is a parquet
        table here so scans are attributable in the plan."""
        corpus, batch = _docs(spark)
        cpath = str(tmp_path / "corpus.parquet")
        corpus.write.parquet(cpath)
        corpus_pq = spark.read.parquet(cpath)
        minhash_index_write(corpus_pq, "t_ingest_idx2", "text", "doc_id")
        try:
            idx = minhash_index_read(spark, "t_ingest_idx2")
            out = minhash_lsh_incremental(
                corpus_pq, batch, "text", "doc_id", threshold=0.5,
                corpus_bandkeys=idx,
                # keep the full lineage visible: no candidate checkpoint,
                # so the banding subtree appears in the final plan
                materialize_candidates=False,
            )
            plan = out._jdf.queryExecution().executedPlan().toString()
            # the banding side reads the stage table, never corpus text
            assert "t_ingest_idx2" in plan
            # the corpus text scan is the only FileScan projecting a text
            # column (the index table scans [id, band, key]; plan Location
            # strings truncate long paths, so match the read columns)
            corpus_scans = [
                ln for ln in plan.splitlines()
                if "FileScan" in ln and "text#" in ln
            ]
            assert len(corpus_scans) == 1, (
                f"{len(corpus_scans)} corpus text scans; banding must read "
                f"only the index table"
            )
            # and results still match the recompute path end-to-end
            a = sorted(map(tuple, out.collect()))
            b = sorted(map(tuple, minhash_lsh_incremental(
                corpus_pq, batch, "text", "doc_id", threshold=0.5
            ).collect()))
            assert a == b and a
        finally:
            minhash_index_drop(spark, "t_ingest_idx2")

    def test_index_append_grows_state(self, spark):
        """mode='append' evolves the persisted state: after appending the
        accepted batch docs, a re-ingest of the same batch flags them as
        dups of themselves (jaccard 1.0)."""
        corpus, batch = _docs(spark)
        minhash_index_write(corpus, "t_ingest_idx3", "text", "doc_id")
        try:
            novel = batch.filter(F.col("doc_id") == 102)
            minhash_index_write(
                novel, "t_ingest_idx3", "text", "doc_id", mode="append"
            )
            idx = minhash_index_read(spark, "t_ingest_idx3")
            grown_corpus = corpus.unionByName(novel)
            hits = minhash_lsh_incremental(
                grown_corpus, novel, "text", "doc_id", threshold=0.5,
                corpus_bandkeys=idx,
            ).collect()
            assert {(r["batch_id"], r["corpus_id"]) for r in hits} == {(102, 102)}
            assert hits[0]["jaccard"] == 1.0
        finally:
            minhash_index_drop(spark, "t_ingest_idx3")


class TestStreamingGrowingState:
    def test_grow_state_catches_intra_stream_dups(self, spark, tmp_path):
        """Live gate with grow_state: micro-batch 2's near-dup of a doc
        ACCEPTED in micro-batch 1 must be flagged — only possible if the
        accepted doc's band keys were appended to the persisted index
        between batches. Verified against a hand-unrolled batch replay
        (the sequential semantics no SQL oracle can express)."""
        import glob
        import os
        import shutil

        from experimentsplan_datapipeline_spark.streaming.events import (
            run_available_now,
        )
        from experimentsplan_datapipeline_spark.streaming.ingest import (
            read_gate_results,
            streaming_ingest_gate,
        )

        corpus, _ = _docs(spark)
        doc_a = ("quantum flux capacitor meridian zephyr oscillates "
                 "through crystalline lattice structures beneath "
                 "aurora fields tonight")
        corpus3 = corpus.filter(F.col("doc_id") == 3).first()["text"]
        b1 = spark.createDataFrame(
            [(100, doc_a), (101, corpus3 + " sigma")], ["doc_id", "text"]
        )
        b2 = spark.createDataFrame(
            [(102, doc_a + " omega")], ["doc_id", "text"]
        )
        staging = tmp_path / "staging"
        staging.mkdir()
        for i, mb in enumerate([b1, b2]):
            tmp = str(tmp_path / f"stage_{i}")
            mb.coalesce(1).write.parquet(tmp)
            part = glob.glob(tmp + "/part-*.parquet")[0]
            dst = str(staging / f"{i:04d}.parquet")
            shutil.move(part, dst)
            os.utime(dst, (1_700_000_000 + i * 100,) * 2)

        minhash_index_write(
            corpus, "t_stream_grow_idx", "text", "doc_id", portable_seed=7
        )
        result_dir = str(tmp_path / "hits")
        accepted_dir = str(tmp_path / "accepted")
        state_dir = str(tmp_path / "state")
        spark.createDataFrame(
            [], "batch_id long, corpus_id long, jaccard double"
        ).write.parquet(result_dir + "/epoch=-1")
        try:
            stream = (
                spark.readStream.schema(b1.schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(str(staging))
            )
            writer = streaming_ingest_gate(
                stream, corpus, "t_stream_grow_idx", result_dir,
                "text", "doc_id", threshold=0.5, portable_seed=7,
                grow_state=True, accepted_dir=accepted_dir,
                state_dir=state_dir,
            ).option("checkpointLocation", str(tmp_path / "ckpt"))
            run_available_now(writer, timeout_sec=240.0)

            got = {
                (r["batch_id"], r["corpus_id"])
                for r in read_gate_results(spark, result_dir).collect()
            }
            # hand-unrolled replay: batch 1 vs corpus, then batch 2 vs
            # corpus + batch 1's accepted docs
            h1 = minhash_lsh_incremental(
                corpus, b1, "text", "doc_id", threshold=0.5,
                portable_seed=7,
            )
            acc1_ids = {r["batch_id"] for r in h1.collect()}
            grown = corpus.unionByName(
                b1.filter(~F.col("doc_id").isin(list(acc1_ids)))
            )
            h2 = minhash_lsh_incremental(
                grown, b2, "text", "doc_id", threshold=0.5,
                portable_seed=7,
            )
            replay = {
                (r["batch_id"], r["corpus_id"])
                for r in h1.collect() + h2.collect()
            }
            assert got == replay
            assert (101, 3) in got          # caught vs the static corpus
            assert (102, 100) in got        # caught vs GROWN state only
            assert not any(b == 100 for b, _ in got)  # novel doc accepted
            acc = {
                r["doc_id"]
                for r in spark.read.parquet(accepted_dir).collect()
            }
            assert acc == {100}  # 102 was a dup, only the novel doc kept
        finally:
            minhash_index_drop(spark, "t_stream_grow_idx")

    @pytest.mark.slow  # ~28 s: runs the grow-state gate TWICE (pushdown
    # vs plain) to assert identical output; the batch-level pushdown
    # equivalence stays default in TestTextIndexVerifyPushdown
    def test_grow_state_with_text_index_pushdown_matches_plain(
        self, spark, tmp_path
    ):
        """The r13 live-path §4j mitigation composed with grow_state:
        running the gate with the index's text table as ``corpus`` +
        corpus_text_pushdown must emit exactly the plain grown gate's
        hits — the literal-IN verify filter pushes through the
        static-text/grown-epochs union without changing semantics."""
        import glob
        import os
        import shutil

        from experimentsplan_datapipeline_spark.operators.dedup import (
            minhash_index_read_text,
        )
        from experimentsplan_datapipeline_spark.streaming.events import (
            run_available_now,
        )
        from experimentsplan_datapipeline_spark.streaming.ingest import (
            read_gate_results,
            streaming_ingest_gate,
        )

        corpus, _ = _docs(spark)
        doc_a = ("quantum flux capacitor meridian zephyr oscillates "
                 "through crystalline lattice structures beneath "
                 "aurora fields tonight")
        corpus3 = corpus.filter(F.col("doc_id") == 3).first()["text"]
        b1 = spark.createDataFrame(
            [(100, doc_a), (101, corpus3 + " sigma")], ["doc_id", "text"]
        )
        b2 = spark.createDataFrame(
            [(102, doc_a + " omega")], ["doc_id", "text"]
        )

        def run(idx_name, corpus_frame, pushdown, sub):
            staging = tmp_path / sub / "staging"
            staging.mkdir(parents=True)
            for i, mb in enumerate([b1, b2]):
                tmp = str(tmp_path / sub / f"stage_{i}")
                mb.coalesce(1).write.parquet(tmp)
                part = glob.glob(tmp + "/part-*.parquet")[0]
                dst = str(staging / f"{i:04d}.parquet")
                shutil.move(part, dst)
                os.utime(dst, (1_700_000_000 + i * 100,) * 2)
            result_dir = str(tmp_path / sub / "hits")
            spark.createDataFrame(
                [], "batch_id long, corpus_id long, jaccard double"
            ).write.parquet(result_dir + "/epoch=-1")
            stream = (
                spark.readStream.schema(b1.schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(str(staging))
            )
            writer = streaming_ingest_gate(
                stream, corpus_frame, idx_name, result_dir,
                "text", "doc_id", threshold=0.5, portable_seed=7,
                grow_state=True,
                accepted_dir=str(tmp_path / sub / "accepted"),
                state_dir=str(tmp_path / sub / "state"),
                corpus_text_pushdown=pushdown,
            ).option("checkpointLocation", str(tmp_path / sub / "ckpt"))
            run_available_now(writer, timeout_sec=240.0)
            return {
                tuple(r)
                for r in read_gate_results(spark, result_dir).collect()
            }

        minhash_index_write(
            corpus, "t_sgrow_plain", "text", "doc_id", portable_seed=7
        )
        minhash_index_write(
            corpus, "t_sgrow_text", "text", "doc_id", portable_seed=7,
            store_text=True,
        )
        try:
            plain = run("t_sgrow_plain", corpus, 0, "plain")
            pushed = run(
                "t_sgrow_text",
                minhash_index_read_text(spark, "t_sgrow_text"),
                1000,
                "pushed",
            )
            assert pushed == plain and plain
            assert any(b == 102 for b, _, _ in plain)  # the grown-state hit
        finally:
            minhash_index_drop(spark, "t_sgrow_plain")
            minhash_index_drop(spark, "t_sgrow_text")


class TestStreamGateResume:
    def test_checkpoint_resume_processes_only_new_files(self, spark, tmp_path):
        """T3-style recovery for the ingest gate: drain batch 1, stop,
        add batch 2, restart on the SAME checkpoint — the second drain
        must process only the new file (no duplicate hits for batch 1 in
        the at-least-once sink under clean stop/restart)."""
        import glob
        import os
        import shutil

        from experimentsplan_datapipeline_spark.streaming.events import (
            run_available_now,
        )
        from experimentsplan_datapipeline_spark.streaming.ingest import (
            read_gate_results,
            streaming_ingest_gate,
        )

        corpus, _ = _docs(spark)
        c3 = corpus.filter(F.col("doc_id") == 3).first()["text"]
        c7 = corpus.filter(F.col("doc_id") == 7).first()["text"]
        b1 = spark.createDataFrame([(200, c3 + " rho")], ["doc_id", "text"])
        b2 = spark.createDataFrame([(201, c7 + " phi")], ["doc_id", "text"])
        staging = tmp_path / "staging"
        staging.mkdir()

        def stage(mb, i):
            tmp = str(tmp_path / f"st_{i}")
            mb.coalesce(1).write.parquet(tmp)
            part = glob.glob(tmp + "/part-*.parquet")[0]
            dst = str(staging / f"{i:04d}.parquet")
            shutil.move(part, dst)
            os.utime(dst, (1_700_000_000 + i * 100,) * 2)

        minhash_index_write(
            corpus, "t_resume_idx", "text", "doc_id", portable_seed=7
        )
        result_dir = str(tmp_path / "hits")
        spark.createDataFrame(
            [], "batch_id long, corpus_id long, jaccard double"
        ).write.parquet(result_dir + "/epoch=-1")
        try:
            def drain():
                stream = (
                    spark.readStream.schema(b1.schema)
                    .option("maxFilesPerTrigger", 1)
                    .parquet(str(staging))
                )
                # 0.8: the one-token-append dup scores ~0.94 vs its
                # source but ~0.63 vs the fixture's other (near-identical)
                # corpus docs, so each batch doc hits exactly its source
                writer = streaming_ingest_gate(
                    stream, corpus, "t_resume_idx", result_dir,
                    "text", "doc_id", threshold=0.8, portable_seed=7,
                ).option("checkpointLocation", str(tmp_path / "ckpt"))
                run_available_now(writer, timeout_sec=240.0)

            stage(b1, 0)
            drain()
            first = [
                tuple(r) for r in read_gate_results(spark, result_dir).collect()
            ]
            assert {(b, c) for b, c, _ in first} == {(200, 3)}
            stage(b2, 1)
            drain()
            both = [
                tuple(r) for r in read_gate_results(spark, result_dir).collect()
            ]
            # exactly one row per hit: batch 1 was NOT reprocessed
            assert sorted((b, c) for b, c, _ in both) == [(200, 3), (201, 7)]
        finally:
            minhash_index_drop(spark, "t_resume_idx")


def test_bandkeys_shape(spark):
    corpus, _ = _docs(spark)
    bk = minhash_bandkeys(corpus, "text", "doc_id", num_hashes=16, bands=4)
    assert bk.columns == ["doc_id", "band", "key"]
    counts = bk.groupBy("doc_id").count().collect()
    assert all(r["count"] == 4 for r in counts)


class TestExactScreenIndex:
    def test_flags_match_naive_membership(self, spark):
        from experimentsplan_datapipeline_spark.functions.text import (
            doc_fingerprint,
        )
        from experimentsplan_datapipeline_spark.operators.dedup import (
            exact_screen_incremental,
            fingerprint_index_write,
        )

        corpus, _ = _docs(spark)
        batch = spark.createDataFrame(
            [
                (300, corpus.filter(F.col("doc_id") == 5).first()["text"]),
                (301, "  ALPHA  beta gamma delta epsilon zeta eta theta "
                      "doc9 iota kappa lam mu nu xi omicron pi rho "),
                (302, "novel text unseen anywhere zanzibar quokka"),
            ],
            ["doc_id", "text"],
        )
        fingerprint_index_write(corpus, "t_fp_idx", "text")
        try:
            got = {
                r["doc_id"]: r["exact_dup"]
                for r in exact_screen_incremental(
                    batch, "text", "doc_id", "t_fp_idx"
                ).collect()
            }
            # 300 = verbatim copy; 301 = whitespace/case variant of doc 9
            # (normalization must catch it); 302 = novel
            assert got == {300: True, 301: True, 302: False}
            cf = {
                r["fp"]
                for r in corpus.select(
                    doc_fingerprint("text").alias("fp")
                ).collect()
            }
            naive = {
                r["doc_id"]: r["fp"] in cf
                for r in batch.select(
                    "doc_id", doc_fingerprint("text").alias("fp")
                ).collect()
            }
            assert got == naive
        finally:
            fingerprint_index_drop(spark, "t_fp_idx")

    def test_append_folds_bloom_of_union(self, spark):
        """mode='append': the bit_or fold of old + new words IS the bloom
        of the union set — a re-screen of the appended doc must flag it,
        and a pre-existing doc must stay flagged."""
        from experimentsplan_datapipeline_spark.operators.dedup import (
            exact_screen_incremental,
            fingerprint_index_write,
        )

        corpus, _ = _docs(spark)
        novel = spark.createDataFrame(
            [(400, "entirely fresh content xylophone quartz")],
            ["doc_id", "text"],
        )
        fingerprint_index_write(corpus, "t_fp_grow", "text")
        try:
            fingerprint_index_write(
                novel, "t_fp_grow", "text", mode="append"
            )
            rescreen = spark.createDataFrame(
                [
                    (500, novel.first()["text"]),
                    (501, corpus.filter(F.col("doc_id") == 2).first()["text"]),
                    (502, "still nothing like this one anywhere"),
                ],
                ["doc_id", "text"],
            )
            got = {
                r["doc_id"]: r["exact_dup"]
                for r in exact_screen_incremental(
                    rescreen, "text", "doc_id", "t_fp_grow"
                ).collect()
            }
            assert got == {500: True, 501: True, 502: False}
        finally:
            fingerprint_index_drop(spark, "t_fp_grow")

    def test_plan_bit_test_prune_no_corpus_text_scan(self, spark, tmp_path):
        """Steady state: the screen's plan bit-tests the BATCH
        fingerprints (element_at on the literal words) and reads corpus
        state only from the stage tables — the corpus parquet's text is
        never scanned."""
        from experimentsplan_datapipeline_spark.operators.dedup import (
            exact_screen_incremental,
            fingerprint_index_write,
        )

        corpus, batch = _docs(spark)
        cpath = str(tmp_path / "fpcorpus.parquet")
        corpus.write.parquet(cpath)
        corpus_pq = spark.read.parquet(cpath)
        fingerprint_index_write(corpus_pq, "t_fp_plan", "text")
        try:
            out = exact_screen_incremental(
                batch, "text", "doc_id", "t_fp_plan"
            )
            plan = out._jdf.queryExecution().executedPlan().toString()
            assert "element_at" in plan  # bloom bit-test prune
            corpus_scans = [
                ln for ln in plan.splitlines()
                if "FileScan" in ln and "fpcorpus" in ln
            ]
            assert not corpus_scans, "corpus parquet must not be re-scanned"
            assert "t_fp_plan" in plan
        finally:
            fingerprint_index_drop(spark, "t_fp_plan")


class TestStreamGateCrashReplay:
    def test_replayed_epoch_ignores_its_own_partial_state(self, spark, tmp_path):
        """The reviewer scenario: epoch 0 half-commits (accepted text +
        band keys + bogus hits written) then the checkpoint never
        commits, so epoch 0 REPLAYS. The replay must read state with
        epoch < 0 (i.e. none of its own leftovers — otherwise the batch
        self-matches its own band keys and every accepted doc flips to a
        bogus self-dup) and overwrite all three epoch=0 partitions with
        the clean recomputation."""
        import glob
        import os
        import shutil

        from experimentsplan_datapipeline_spark.operators.dedup import (
            minhash_bandkeys,
        )
        from experimentsplan_datapipeline_spark.streaming.events import (
            run_available_now,
        )
        from experimentsplan_datapipeline_spark.streaming.ingest import (
            read_gate_results,
            streaming_ingest_gate,
        )

        corpus, _ = _docs(spark)
        doc_a = ("novel ingredients cardamom saffron turmeric paprika "
                 "coriander fennel anise clove nutmeg cinnamon bay")
        b1 = spark.createDataFrame([(600, doc_a)], ["doc_id", "text"])
        staging = tmp_path / "staging"
        staging.mkdir()
        tmp = str(tmp_path / "st0")
        b1.coalesce(1).write.parquet(tmp)
        shutil.move(
            glob.glob(tmp + "/part-*.parquet")[0],
            str(staging / "0000.parquet"),
        )

        minhash_index_write(
            corpus, "t_replay_idx", "text", "doc_id", portable_seed=7
        )
        result_dir = str(tmp_path / "hits")
        accepted_dir = str(tmp_path / "accepted")
        state_dir = str(tmp_path / "state")
        try:
            # plant epoch-0 leftovers AS IF a prior attempt half-committed:
            # doc 600 already "accepted" (text + band keys) and a bogus
            # self-pair hit — exactly what a crash after the state writes
            # leaves behind
            b1.write.parquet(os.path.join(accepted_dir, "epoch=0"))
            minhash_bandkeys(
                b1, "text", "doc_id", portable_seed=7
            ).write.parquet(os.path.join(state_dir, "epoch=0"))
            spark.createDataFrame(
                [(600, 600, 1.0)], "batch_id long, corpus_id long, jaccard double"
            ).write.parquet(os.path.join(result_dir, "epoch=0"))

            stream = (
                spark.readStream.schema(b1.schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(str(staging))
            )
            writer = streaming_ingest_gate(
                stream, corpus, "t_replay_idx", result_dir,
                "text", "doc_id", threshold=0.5, portable_seed=7,
                grow_state=True, accepted_dir=accepted_dir,
                state_dir=state_dir,
            ).option("checkpointLocation", str(tmp_path / "ckpt"))
            run_available_now(writer, timeout_sec=240.0)

            # the bogus self-pair is GONE (epoch 0 overwritten clean) and
            # the novel doc is accepted again, exactly once
            hits = read_gate_results(spark, result_dir).collect()
            assert hits == []
            acc = spark.read.parquet(accepted_dir).collect()
            assert {(r["doc_id"], r["epoch"]) for r in acc} == {(600, 0)}
            keys = spark.read.parquet(state_dir).groupBy("epoch").count().collect()
            assert [(r["epoch"], r["count"]) for r in keys] == [(0, 8)]
        finally:
            minhash_index_drop(spark, "t_replay_idx")


class TestGenerationPointerCommit:
    """ADVICE r9 items 1-2: persisted banding params + crash-consistent
    rebuilds for BOTH persisted indexes."""

    def test_minhash_read_validates_params(self, spark):
        corpus, _ = _docs(spark)
        minhash_index_write(
            corpus, "t_meta_idx", "text", "doc_id", num_hashes=32, bands=8,
            shingle_size=3, portable_seed=42,
        )
        try:
            ok = minhash_index_read(
                spark, "t_meta_idx", num_hashes=32, bands=8,
                shingle_size=3, portable_seed=42,
            )
            assert ok.columns == ["doc_id", "band", "key"]
            for bad in (
                dict(num_hashes=16),
                dict(bands=4),
                dict(shingle_size=5),
                dict(portable_seed=7),
                dict(portable_seed=None),
            ):
                with pytest.raises(ValueError, match="mismatched banding"):
                    minhash_index_read(spark, "t_meta_idx", **bad)
        finally:
            minhash_index_drop(spark, "t_meta_idx")

    def test_minhash_append_validates_params(self, spark):
        corpus, batch = _docs(spark)
        minhash_index_write(
            corpus, "t_meta_app", "text", "doc_id", portable_seed=42
        )
        try:
            with pytest.raises(ValueError, match="mismatched banding"):
                minhash_index_write(
                    batch, "t_meta_app", "text", "doc_id",
                    portable_seed=43, mode="append",
                )
            with pytest.raises(ValueError, match="cannot append"):
                minhash_index_write(
                    batch, "t_meta_missing", "text", "doc_id", mode="append"
                )
        finally:
            minhash_index_drop(spark, "t_meta_app")

    def test_minhash_read_requires_meta(self, spark):
        with pytest.raises(ValueError, match="not found"):
            minhash_index_read(spark, "t_never_built")

    def test_streaming_gate_rejects_mismatched_index(self, spark, tmp_path):
        """The live gate must raise, not silently admit every near-dup,
        when the persisted index was built with different banding params
        than the gate is configured with. Since r14 the static seed
        index is resolved once at writer-BUILD time (not per epoch), so
        the mismatch surfaces at the builder call — before the stream
        even starts."""
        from experimentsplan_datapipeline_spark.streaming.events import (
            run_available_now,
        )
        from experimentsplan_datapipeline_spark.streaming.ingest import (
            streaming_ingest_gate,
        )

        corpus, b1 = _docs(spark)
        staging = tmp_path / "staging"
        staging.mkdir()
        b1.coalesce(1).write.mode("overwrite").parquet(str(staging))
        minhash_index_write(
            corpus, "t_gate_mismatch", "text", "doc_id", portable_seed=7
        )
        try:
            stream = (
                spark.readStream.schema(b1.schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(str(staging))
            )
            with pytest.raises(Exception, match="mismatched banding"):
                writer = streaming_ingest_gate(
                    stream, corpus, "t_gate_mismatch",
                    str(tmp_path / "hits"), "text", "doc_id",
                    threshold=0.5, portable_seed=999,  # != index's 7
                ).option("checkpointLocation", str(tmp_path / "ckpt"))
                run_available_now(writer, timeout_sec=240.0)
        finally:
            minhash_index_drop(spark, "t_gate_mismatch")

    def test_fp_overwrite_crash_before_pointer_swap_keeps_old_state(
        self, spark, monkeypatch
    ):
        """The reviewer's crash window: rebuilding an EXISTING fp index
        dies after writing the new generation's data tables but before
        the pointer swap. The screen must keep answering from the OLD
        consistent (fp, bloom, meta) triple — never a new bloom paired
        with an old fp table."""
        from experimentsplan_datapipeline_spark.operators import dedup as dd
        from experimentsplan_datapipeline_spark.operators.dedup import (
            exact_screen_incremental,
            fingerprint_index_write,
        )

        corpus, _ = _docs(spark)
        extra = spark.createDataFrame(
            [(900, "rebuild-only content periwinkle obsidian")],
            ["doc_id", "text"],
        )
        fingerprint_index_write(corpus, "t_fp_crash", "text")
        probe = spark.createDataFrame(
            [
                (700, corpus.filter(F.col("doc_id") == 1).first()["text"]),
                (701, extra.first()["text"]),
            ],
            ["doc_id", "text"],
        )

        def boom(spark_, df, name):
            raise RuntimeError("injected crash before pointer swap")

        try:
            monkeypatch.setattr(dd, "_swap_in_table", boom)
            with pytest.raises(RuntimeError, match="injected crash"):
                # overwrite-over-existing with a DIFFERENT corpus + family
                fingerprint_index_write(
                    corpus.unionByName(extra), "t_fp_crash", "text",
                    n_bits=1 << 16, n_hashes=3, mode="overwrite",
                )
            monkeypatch.undo()
            got = {
                r["doc_id"]: r["exact_dup"]
                for r in exact_screen_incremental(
                    probe, "text", "doc_id", "t_fp_crash"
                ).collect()
            }
            # old generation still serves: corpus doc flagged, the
            # rebuild-only doc NOT (its fp lives only in the leaked,
            # unreferenced new generation)
            assert got == {700: True, 701: False}
            # and a retried rebuild completes + flips the answer
            fingerprint_index_write(
                corpus.unionByName(extra), "t_fp_crash", "text",
                n_bits=1 << 16, n_hashes=3, mode="overwrite",
            )
            got2 = {
                r["doc_id"]: r["exact_dup"]
                for r in exact_screen_incremental(
                    probe, "text", "doc_id", "t_fp_crash"
                ).collect()
            }
            assert got2 == {700: True, 701: True}
        finally:
            fingerprint_index_drop(spark, "t_fp_crash")

    def test_minhash_overwrite_crash_before_pointer_swap_keeps_old_state(
        self, spark, monkeypatch
    ):
        from experimentsplan_datapipeline_spark.operators import dedup as dd

        corpus, batch = _docs(spark)
        minhash_index_write(
            corpus, "t_mh_crash", "text", "doc_id", portable_seed=7
        )

        def boom(spark_, df, name):
            raise RuntimeError("injected crash before pointer swap")

        try:
            monkeypatch.setattr(dd, "_swap_in_table", boom)
            with pytest.raises(RuntimeError, match="injected crash"):
                minhash_index_write(
                    corpus, "t_mh_crash", "text", "doc_id",
                    num_hashes=16, bands=4, portable_seed=9,
                    mode="overwrite",
                )
            monkeypatch.undo()
            # pointer still names the OLD family and the OLD generation
            idx = minhash_index_read(
                spark, "t_mh_crash", num_hashes=32, bands=8,
                shingle_size=3, portable_seed=7,
            )
            hits = minhash_lsh_incremental(
                corpus, batch, "text", "doc_id", threshold=0.5,
                portable_seed=7, corpus_bandkeys=idx,
            ).collect()
            assert {(r["batch_id"], r["corpus_id"]) for r in hits} >= {
                (100, 3), (101, 7)
            }
        finally:
            minhash_index_drop(spark, "t_mh_crash")

    def test_generation_gc_drops_superseded_tables(self, spark):
        corpus, _ = _docs(spark)
        minhash_index_write(corpus, "t_gc_idx", "text", "doc_id")
        minhash_index_write(corpus, "t_gc_idx", "text", "doc_id")
        try:
            names = {t.name for t in spark.catalog.listTables()}
            assert "t_gc_idx_keys_g1" in names
            assert "t_gc_idx_keys_g0" not in names
        finally:
            minhash_index_drop(spark, "t_gc_idx")


class TestIngestStateCompaction:
    """VERDICT r9 item 1: the live gate's grown epoch state folds into
    bucketed compact tables behind an epoch high-water mark, folded
    epoch dirs are pruned, and replay stays exactly-once ACROSS the
    compaction boundary."""

    @staticmethod
    def _mk_batches(spark, corpus_rows, n):
        """One single-doc micro-batch per index, mixing: novel docs
        (accepted), near-dups of the PREVIOUS batch's accepted doc
        (caught only via grown state), and near-dups of corpus docs
        (caught via the seed index)."""
        import random

        rng = random.Random(17)
        vocab = [f"tok{j}" for j in range(4000)]
        batches, last_novel, first_novel = [], None, None
        for i in range(n):
            did = 1000 + i
            kind = i % 4
            if kind == 0 or last_novel is None:
                words = [f"novel{i}"] + rng.sample(vocab, 14)
                text = " ".join(words)
                last_novel = text
                first_novel = first_novel or text
            elif kind == 1:
                text = last_novel + f" extra{i}"
            elif kind == 3:
                # near-dup of batch 0's accepted doc: late instances
                # (i >= 10) can only be caught through state that
                # crossed a compaction boundary
                text = first_novel + f" tail{i}"
            else:  # kind == 2: near-dup of a corpus doc
                text = corpus_rows[i % len(corpus_rows)] + f" suffix{i}"
            batches.append(
                spark.createDataFrame([(did, text)], ["doc_id", "text"])
            )
        return batches

    @staticmethod
    def _stage_file(tmp_path, staging, mb, i):
        import glob
        import os
        import shutil

        tmp = str(tmp_path / f"mkstage_{i}")
        mb.coalesce(1).write.parquet(tmp)
        part = glob.glob(tmp + "/part-*.parquet")[0]
        dst = str(staging / f"{i:04d}.parquet")
        shutil.move(part, dst)
        os.utime(dst, (1_700_000_000 + i * 100,) * 2)

    @pytest.mark.slow  # ~3.5 min: the 22-epoch crash-replay depth; the
    # 3-epoch cross-compaction path stays default via the
    # stream_ingest_gate_compacted smoke + oracle and TestAutoCompaction's
    # shallow test below
    def test_compact_mid_stream_with_crash_replay(self, spark, tmp_path):
        import os

        from experimentsplan_datapipeline_spark.streaming.events import (
            run_available_now,
        )
        from experimentsplan_datapipeline_spark.streaming.ingest import (
            _list_epochs,
            ingest_state_compact,
            last_committed_epoch,
            read_gate_results,
            streaming_ingest_gate,
        )

        corpus, _ = _docs(spark)
        corpus_rows = [r["text"] for r in corpus.orderBy("doc_id").collect()]
        N = 22
        batches = self._mk_batches(spark, corpus_rows, N)
        staging = tmp_path / "staging"
        staging.mkdir()
        minhash_index_write(
            corpus, "t_compact_idx", "text", "doc_id", portable_seed=7
        )
        result_dir = str(tmp_path / "hits")
        accepted_dir = str(tmp_path / "accepted")
        state_dir = str(tmp_path / "state")
        ckpt = str(tmp_path / "ckpt")
        spark.createDataFrame(
            [], "batch_id long, corpus_id long, jaccard double"
        ).write.parquet(result_dir + "/epoch=-1")

        def drain():
            stream = (
                spark.readStream.schema(batches[0].schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(str(staging))
            )
            writer = streaming_ingest_gate(
                stream, corpus, "t_compact_idx", result_dir,
                "text", "doc_id", threshold=0.5, portable_seed=7,
                grow_state=True, accepted_dir=accepted_dir,
                state_dir=state_dir, compact_table="t_compact_state",
            ).option("checkpointLocation", ckpt)
            run_available_now(writer, timeout_sec=480.0)

        try:
            # phase 1: epochs 0-9, then compact at the committed watermark
            for i in range(10):
                self._stage_file(tmp_path, staging, batches[i], i)
            drain()
            hwm1 = last_committed_epoch(spark, ckpt)
            assert hwm1 == 9
            ingest_state_compact(
                spark, "t_compact_state", accepted_dir, state_dir, hwm1
            )
            # folded epoch dirs are PRUNED (state reads stop paying
            # O(epochs) listings) and the compact tables exist
            assert _list_epochs(spark, accepted_dir) == []
            assert _list_epochs(spark, state_dir) == []
            names = {t.name for t in spark.catalog.listTables()}
            assert {"t_compact_state_acc_g0", "t_compact_state_keys_g0",
                    "t_compact_state_meta"} <= names

            # phase 2: epochs 10-15 run against compact + fresh epochs,
            # then compact AGAIN (generation 1 folds gen 0 + new epochs)
            for i in range(10, 16):
                self._stage_file(tmp_path, staging, batches[i], i)
            drain()
            hwm2 = last_committed_epoch(spark, ckpt)
            assert hwm2 == 15
            ingest_state_compact(
                spark, "t_compact_state", accepted_dir, state_dir, hwm2
            )
            names = {t.name for t in spark.catalog.listTables()}
            assert "t_compact_state_acc_g1" in names
            assert "t_compact_state_acc_g0" not in names  # GC'd

            # phase 3: crash-replay ACROSS the compaction boundary —
            # plant epoch-16 leftovers as if a prior attempt
            # half-committed, then drain: epoch 16 must ignore its own
            # partial state (reads = compact hwm=15 + nothing between)
            self._stage_file(tmp_path, staging, batches[16], 16)
            batches[16].write.parquet(
                os.path.join(accepted_dir, "epoch=16")
            )
            minhash_bandkeys(
                batches[16], "text", "doc_id", portable_seed=7
            ).write.parquet(os.path.join(state_dir, "epoch=16"))
            spark.createDataFrame(
                [(1016, 1016, 1.0)],
                "batch_id long, corpus_id long, jaccard double",
            ).write.parquet(os.path.join(result_dir, "epoch=16"))
            drain()

            # phase 4: the rest, no further compaction
            for i in range(17, N):
                self._stage_file(tmp_path, staging, batches[i], i)
            drain()

            # hand-unrolled sequential replay is the truth
            expected_hits, exp_accepted = set(), set()
            state = corpus.select("doc_id", "text")
            for mb in batches:
                h = minhash_lsh_incremental(
                    state, mb, "text", "doc_id", threshold=0.5,
                    portable_seed=7,
                ).collect()
                expected_hits |= {
                    (r["batch_id"], r["corpus_id"], r["jaccard"]) for r in h
                }
                dup_ids = [r["batch_id"] for r in h]
                acc = mb.filter(~F.col("doc_id").isin(dup_ids or [-1]))
                exp_accepted |= {r["doc_id"] for r in acc.collect()}
                state = state.unionByName(
                    acc.select("doc_id", "text")
                ).localCheckpoint(eager=True)

            got_hits = {
                (r["batch_id"], r["corpus_id"], r["jaccard"])
                for r in read_gate_results(spark, result_dir).collect()
            }
            assert got_hits == expected_hits
            assert (1016, 1016, 1.0) not in got_hits  # bogus pair replaced
            # accepted state = compact table + post-compaction epochs
            ptr = spark.table("t_compact_state_meta").first()
            acc_state = {
                r["doc_id"]
                for r in spark.table(
                    f"t_compact_state_acc_g{ptr['gen']}"
                ).collect()
            } | {
                r["doc_id"]
                for r in spark.read.parquet(accepted_dir)
                .filter(F.col("epoch") > ptr["hwm"])
                .collect()
            }
            assert acc_state == exp_accepted
            # growth across the boundary really happened: at least one
            # hit's corpus_id is a batch doc accepted BEFORE the first
            # compaction, matched by a batch AFTER it
            grown_hits = {
                (b, c) for b, c, _ in got_hits if c >= 1000
            }
            assert any(c <= 1009 and b >= 1010 for b, c in grown_hits)
        finally:
            minhash_index_drop(spark, "t_compact_idx")
            spark.sql("DROP TABLE IF EXISTS t_compact_state_meta")
            spark.sql("DROP TABLE IF EXISTS t_compact_state_meta_staging")
            for g in range(4):
                spark.sql(f"DROP TABLE IF EXISTS t_compact_state_acc_g{g}")
                spark.sql(f"DROP TABLE IF EXISTS t_compact_state_keys_g{g}")

    def test_compact_guards(self, spark, tmp_path):
        """Compacting past the committed watermark (one-sided epoch
        state) raises; hwm regression raises; the gate raises loudly if
        a replayed epoch ever lands at or below the hwm."""
        import os

        from experimentsplan_datapipeline_spark.streaming.ingest import (
            ingest_state_compact,
        )

        acc = str(tmp_path / "acc")
        st = str(tmp_path / "st")
        df = spark.createDataFrame([(1, "x y z")], ["doc_id", "text"])
        df.write.parquet(os.path.join(acc, "epoch=0"))
        # band keys written for epoch 0 AND a half-written epoch 1
        # (accepted side missing) — folding epoch 1 must raise
        kdf = spark.createDataFrame(
            [(1, 0, 123)], "doc_id long, band int, key long"
        )
        kdf.write.parquet(os.path.join(st, "epoch=0"))
        kdf.write.parquet(os.path.join(st, "epoch=1"))
        with pytest.raises(ValueError, match="asymmetric"):
            ingest_state_compact(spark, "t_guard_state", acc, st, 1)
        try:
            ingest_state_compact(spark, "t_guard_state", acc, st, 0)
            with pytest.raises(ValueError, match="below the existing"):
                ingest_state_compact(spark, "t_guard_state", acc, st, -1)
        finally:
            spark.sql("DROP TABLE IF EXISTS t_guard_state_meta")
            spark.sql("DROP TABLE IF EXISTS t_guard_state_meta_staging")
            for g in range(3):
                spark.sql(f"DROP TABLE IF EXISTS t_guard_state_acc_g{g}")
                spark.sql(f"DROP TABLE IF EXISTS t_guard_state_keys_g{g}")


class TestStreamingFunnelGrowingState:
    @pytest.mark.slow  # ~1.4 min: full three-family funnel state fold vs
    # hand-unrolled replay; funnel grow-state replay semantics stay
    # default via TestFunnelCrashReplay
    def test_funnel_grow_state_with_compaction_matches_replay(
        self, spark, tmp_path
    ):
        """The live FULL funnel (quality + exact + near-dup) with all
        three state families growing, compacted mid-stream: decisions
        must match a hand-unrolled sequential replay, including an
        exact-dup and a near-dup of pre-compaction-ACCEPTED docs whose
        state survives only through the compact tables (their epoch
        dirs are deleted by the compactor)."""
        import glob
        import os
        import shutil

        from experimentsplan_datapipeline_spark.functions.text import (
            doc_fingerprint,
        )
        from experimentsplan_datapipeline_spark.operators.dedup import (
            fingerprint_index_drop,
            fingerprint_index_write,
        )
        from experimentsplan_datapipeline_spark.operators.text_analysis import (
            repetition_signals,
        )
        from experimentsplan_datapipeline_spark.streaming.events import (
            run_available_now,
        )
        from experimentsplan_datapipeline_spark.streaming.ingest import (
            _list_epochs,
            ingest_state_compact,
            ingest_state_drop,
            last_committed_epoch,
            read_gate_results,
            streaming_ingest_funnel,
        )

        corpus, _ = _docs(spark)
        doc_a = ("cardinal marble lantern velvet ember quartz meadow "
                 "harbor cedar juniper saffron willow")
        doc_b = ("orbit prism canyon tundra mosaic relic summit anchor "
                 "breeze garnet lagoon thistle")
        c2 = corpus.filter(F.col("doc_id") == 2).first()["text"]
        batches = [
            (700, doc_a),                         # novel -> accepted
            (701, "  " + doc_a.upper() + "  "),   # exact dup of 700 (grown fp)
            (702, doc_a + " omega"),              # near dup of 700 (grown keys)
            (703, "spam spam spam spam spam spam"),  # fails quality gate
            (704, c2),                            # exact dup of CORPUS doc
            # --- compaction happens here ---
            (705, doc_b),                         # novel -> accepted
            (706, doc_a + "  "),                  # exact dup of 700 via COMPACT fp
            (707, doc_b + " sigma"),              # near dup of 705 (fresh epoch)
        ]
        staging = tmp_path / "staging"
        staging.mkdir()

        def stage(i):
            mb = spark.createDataFrame([batches[i]], ["doc_id", "text"])
            tmp = str(tmp_path / f"fst_{i}")
            mb.coalesce(1).write.parquet(tmp)
            shutil.move(
                glob.glob(tmp + "/part-*.parquet")[0],
                str(staging / f"{i:04d}.parquet"),
            )
            os.utime(
                str(staging / f"{i:04d}.parquet"),
                (1_700_000_000 + i * 100,) * 2,
            )

        minhash_index_write(
            corpus, "t_fun_mh", "text", "doc_id", portable_seed=7
        )
        fingerprint_index_write(corpus, "t_fun_fp", "text")
        ingest_state_drop(spark, "t_fun_state")
        result_dir = str(tmp_path / "decisions")
        accepted_dir = str(tmp_path / "acc")
        state_dir = str(tmp_path / "keys")
        fp_state_dir = str(tmp_path / "fps")
        ckpt = str(tmp_path / "ckpt")

        def drain():
            stream = (
                spark.readStream.schema("doc_id long, text string")
                .option("maxFilesPerTrigger", 1)
                .parquet(str(staging))
            )
            writer = streaming_ingest_funnel(
                stream, corpus, "t_fun_mh", "t_fun_fp", result_dir,
                "text", "doc_id", threshold=0.5, portable_seed=7,
                grow_state=True, accepted_dir=accepted_dir,
                state_dir=state_dir, fp_state_dir=fp_state_dir,
                compact_table="t_fun_state",
            ).option("checkpointLocation", ckpt)
            run_available_now(writer, timeout_sec=480.0)

        try:
            for i in range(5):
                stage(i)
            drain()
            hwm = last_committed_epoch(spark, ckpt)
            assert hwm == 4
            ingest_state_compact(
                spark, "t_fun_state", accepted_dir, state_dir, hwm,
                fp_state_dir=fp_state_dir,
            )
            # all three state families folded AND their dirs pruned
            assert _list_epochs(spark, accepted_dir) == []
            assert _list_epochs(spark, state_dir) == []
            assert _list_epochs(spark, fp_state_dir) == []
            names = {t.name for t in spark.catalog.listTables()}
            assert "t_fun_state_fp_g0" in names
            for i in range(5, 8):
                stage(i)
            drain()

            got = {
                r["doc_id"]: (
                    r["keep"], r["exact_dup"], r["near_dup"], r["accepted"]
                )
                for r in read_gate_results(spark, result_dir).collect()
            }

            # hand-unrolled sequential replay with the same operators
            state = corpus.select("doc_id", "text")
            state_fps = {
                r["fp"]
                for r in corpus.select(
                    doc_fingerprint("text").alias("fp")
                ).collect()
            }
            exp = {}
            for did, text in batches:
                mb = spark.createDataFrame([(did, text)], ["doc_id", "text"])
                keep = repetition_signals(mb, "doc_id", "text").first()["keep"]
                fp = mb.select(doc_fingerprint("text").alias("fp")).first()["fp"]
                exact = fp in state_fps
                near = bool(
                    minhash_lsh_incremental(
                        state, mb, "text", "doc_id", threshold=0.5,
                        portable_seed=7,
                    ).count()
                )
                acc = keep and not exact and not near
                exp[did] = (keep, exact, near, acc)
                if acc:
                    state = state.unionByName(mb).localCheckpoint(eager=True)
                    state_fps.add(fp)
            assert got == exp
            # the decisive rows, spelled out
            assert exp[700] == (True, False, False, True)
            assert got[701][1] is True      # exact via grown state
            assert got[702][2] is True      # near via grown state
            assert got[703][0] is False     # quality gate
            assert got[704][1] is True      # exact via static index
            assert got[706][1] is True      # exact via COMPACT fp table
            assert got[707][2] is True      # near via fresh epoch state
        finally:
            minhash_index_drop(spark, "t_fun_mh")
            fingerprint_index_drop(spark, "t_fun_fp")
            ingest_state_drop(spark, "t_fun_state")


class TestAutoCompaction:
    def test_gate_auto_compacts_every_k_epochs(self, spark, tmp_path):
        """auto_compact_every=2: one drain of 6 single-file micro-batches
        crosses TWO in-stream folds (at the start of epochs 2 and 4) and
        must leave the epoch dirs pruned up to the last fold (hwm=3),
        and the hit log identical to the hand-unrolled replay —
        compaction is invisible to results. (r15: shrunk from 9 epochs /
        every-3 — same two-fold coverage, ~half the drain wall, so the
        driver's default verify window fits; the 22-epoch depth lives in
        the slow-marked test above.)"""
        import os

        from experimentsplan_datapipeline_spark.streaming.events import (
            run_available_now,
        )
        from experimentsplan_datapipeline_spark.streaming.ingest import (
            _list_epochs,
            ingest_state_drop,
            read_gate_results,
            streaming_ingest_gate,
        )

        corpus, _ = _docs(spark)
        corpus_rows = [r["text"] for r in corpus.orderBy("doc_id").collect()]
        batches = TestIngestStateCompaction._mk_batches(spark, corpus_rows, 6)
        staging = tmp_path / "staging"
        staging.mkdir()
        for i in range(6):
            TestIngestStateCompaction._stage_file(
                tmp_path, staging, batches[i], i
            )
        minhash_index_write(
            corpus, "t_auto_idx", "text", "doc_id", portable_seed=7
        )
        ingest_state_drop(spark, "t_auto_state")
        result_dir = str(tmp_path / "hits")
        accepted_dir = str(tmp_path / "acc")
        state_dir = str(tmp_path / "keys")
        spark.createDataFrame(
            [], "batch_id long, corpus_id long, jaccard double"
        ).write.parquet(result_dir + "/epoch=-1")
        try:
            stream = (
                spark.readStream.schema(batches[0].schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(str(staging))
            )
            writer = streaming_ingest_gate(
                stream, corpus, "t_auto_idx", result_dir, "text", "doc_id",
                threshold=0.5, portable_seed=7, grow_state=True,
                accepted_dir=accepted_dir, state_dir=state_dir,
                compact_table="t_auto_state", auto_compact_every=2,
            ).option("checkpointLocation", str(tmp_path / "ckpt"))
            run_available_now(writer, timeout_sec=480.0)

            ptr = spark.table("t_auto_state_meta").first()
            assert ptr["hwm"] == 3  # folded at the start of epoch 4
            # only post-fold epochs remain on disk
            assert _list_epochs(spark, accepted_dir) == [4, 5]
            assert _list_epochs(spark, state_dir) == [4, 5]

            # results identical to the hand-unrolled replay
            expected = set()
            state = corpus.select("doc_id", "text")
            for mb in batches:
                h = minhash_lsh_incremental(
                    state, mb, "text", "doc_id", threshold=0.5,
                    portable_seed=7,
                ).collect()
                expected |= {(r["batch_id"], r["corpus_id"]) for r in h}
                dup = [r["batch_id"] for r in h]
                acc = mb.filter(~F.col("doc_id").isin(dup or [-1]))
                state = state.unionByName(acc).localCheckpoint(eager=True)
            got = {
                (r["batch_id"], r["corpus_id"])
                for r in read_gate_results(spark, result_dir).collect()
            }
            assert got == expected and got
        finally:
            minhash_index_drop(spark, "t_auto_idx")
            ingest_state_drop(spark, "t_auto_state")

    def test_auto_compact_param_validation(self, spark):
        from experimentsplan_datapipeline_spark.streaming.ingest import (
            streaming_ingest_gate,
        )

        corpus, _ = _docs(spark)
        with pytest.raises(ValueError, match="auto_compact_every requires"):
            streaming_ingest_gate(
                corpus, corpus, "idx", "/tmp/x", "text", "doc_id",
                auto_compact_every=3,
            )


class TestFunnelCrashReplay:
    def test_replayed_funnel_epoch_ignores_its_own_partial_state(
        self, spark, tmp_path
    ):
        """Funnel twin of the gate's crash-replay test: epoch 0
        half-commits (decision log + all THREE state families written,
        checkpoint never commits), so epoch 0 replays. The replay must
        read state with hwm < epoch < 0 (none of its own leftovers —
        otherwise the batch exact- and near-matches ITSELF and every
        accepted doc flips to rejected) and overwrite all four epoch=0
        partitions with the clean recomputation."""
        import glob
        import os
        import shutil

        from experimentsplan_datapipeline_spark.functions.text import (
            doc_fingerprint,
        )
        from experimentsplan_datapipeline_spark.operators.dedup import (
            fingerprint_index_drop,
            fingerprint_index_write,
        )
        from experimentsplan_datapipeline_spark.streaming.events import (
            run_available_now,
        )
        from experimentsplan_datapipeline_spark.streaming.ingest import (
            read_gate_results,
            streaming_ingest_funnel,
        )

        corpus, _ = _docs(spark)
        doc_a = ("halcyon bramble sonnet gossamer ripple vertex nimbus "
                 "talon crescent ember stride lagoon")
        b1 = spark.createDataFrame([(800, doc_a)], ["doc_id", "text"])
        staging = tmp_path / "staging"
        staging.mkdir()
        tmp = str(tmp_path / "fst0")
        b1.coalesce(1).write.parquet(tmp)
        shutil.move(
            glob.glob(tmp + "/part-*.parquet")[0],
            str(staging / "0000.parquet"),
        )
        minhash_index_write(
            corpus, "t_freplay_mh", "text", "doc_id", portable_seed=7
        )
        fingerprint_index_write(corpus, "t_freplay_fp", "text")
        result_dir = str(tmp_path / "decisions")
        accepted_dir = str(tmp_path / "acc")
        state_dir = str(tmp_path / "keys")
        fp_state_dir = str(tmp_path / "fps")
        try:
            # plant epoch-0 leftovers AS IF a prior attempt half-committed
            b1.write.parquet(os.path.join(accepted_dir, "epoch=0"))
            minhash_bandkeys(
                b1, "text", "doc_id", portable_seed=7
            ).write.parquet(os.path.join(state_dir, "epoch=0"))
            b1.select(doc_fingerprint("text").alias("fp")).write.parquet(
                os.path.join(fp_state_dir, "epoch=0")
            )
            spark.createDataFrame(
                [(800, True, True, True, False)],
                "doc_id long, keep boolean, exact_dup boolean, "
                "near_dup boolean, accepted boolean",
            ).write.parquet(os.path.join(result_dir, "epoch=0"))

            stream = (
                spark.readStream.schema(b1.schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(str(staging))
            )
            writer = streaming_ingest_funnel(
                stream, corpus, "t_freplay_mh", "t_freplay_fp",
                result_dir, "text", "doc_id", threshold=0.5,
                portable_seed=7, grow_state=True,
                accepted_dir=accepted_dir, state_dir=state_dir,
                fp_state_dir=fp_state_dir,
            ).option("checkpointLocation", str(tmp_path / "ckpt"))
            run_available_now(writer, timeout_sec=240.0)

            # the bogus self-dup decision is GONE: the novel doc is
            # accepted, exactly once, and the state is clean
            rows = read_gate_results(spark, result_dir).collect()
            assert [
                (r["doc_id"], r["keep"], r["exact_dup"], r["near_dup"],
                 r["accepted"])
                for r in rows
            ] == [(800, True, False, False, True)]
            acc = spark.read.parquet(accepted_dir).collect()
            assert {(r["doc_id"], r["epoch"]) for r in acc} == {(800, 0)}
            fps = spark.read.parquet(fp_state_dir).collect()
            assert len(fps) == 1 and fps[0]["epoch"] == 0
        finally:
            minhash_index_drop(spark, "t_freplay_mh")
            fingerprint_index_drop(spark, "t_freplay_fp")


class TestPointerCrashWindows:
    """ADVICE r10: the pointer commit must never have a window where the
    meta table is simply gone — for a compaction pointer whose folded
    epoch dirs were already deleted, 'no pointer' silently reads as
    'nothing compacted' and the grown state is lost forever."""

    def test_crash_between_renames_self_heals(self, spark):
        from experimentsplan_datapipeline_spark.operators.dedup import (
            _read_pointer,
            _swap_in_table,
        )

        name = "t_heal_meta"
        try:
            _swap_in_table(
                spark,
                spark.createDataFrame([(9, 0)], "hwm long, gen int"),
                name,
            )
            # simulate a crash between rename-aside and rename-in: the
            # live table sits at _prev, nothing at the live name
            spark.sql(f"ALTER TABLE `{name}` RENAME TO `{name}_prev`")
            assert not spark.catalog.tableExists(name)
            ptr = _read_pointer(spark, name)
            assert ptr is not None and ptr["hwm"] == 9 and ptr["gen"] == 0
            # healed: the live name is restored, _prev is consumed
            assert spark.catalog.tableExists(name)
            assert not spark.catalog.tableExists(f"{name}_prev")
        finally:
            for suf in ("", "_prev", "_staging"):
                spark.sql(f"DROP TABLE IF EXISTS `{name}{suf}`")

    def test_swap_never_leaves_no_table(self, spark):
        """A second commit over an existing pointer keeps either the old
        or the new value readable at every step boundary: after the
        commit the new value is live and no leftovers remain."""
        from experimentsplan_datapipeline_spark.operators.dedup import (
            _read_pointer,
            _swap_in_table,
        )

        name = "t_swap2_meta"
        try:
            _swap_in_table(
                spark, spark.createDataFrame([(1,)], "v int"), name
            )
            _swap_in_table(
                spark, spark.createDataFrame([(2,)], "v int"), name
            )
            assert _read_pointer(spark, name)["v"] == 2
            assert not spark.catalog.tableExists(f"{name}_prev")
            assert not spark.catalog.tableExists(f"{name}_staging")
            # a stale _prev leftover (crash after rename-in, before the
            # final drop) is healed into the next commit cleanly
            spark.sql(f"ALTER TABLE `{name}` RENAME TO `{name}_prev`")
            _swap_in_table(
                spark, spark.createDataFrame([(3,)], "v int"), name
            )
            assert _read_pointer(spark, name)["v"] == 3
            assert not spark.catalog.tableExists(f"{name}_prev")
        finally:
            for suf in ("", "_prev", "_staging"):
                spark.sql(f"DROP TABLE IF EXISTS `{name}{suf}`")


class TestCompactorEmptyEpochs:
    """ADVICE r10: an all-dup micro-batch commits an epoch whose state
    partitions have zero data files — the compactor must read folded
    dirs with an explicit schema instead of wedging on inference."""

    def test_empty_epoch_dir_folds_clean(self, spark, tmp_path):
        import os

        from experimentsplan_datapipeline_spark.streaming.ingest import (
            ingest_state_compact,
        )

        acc = str(tmp_path / "acc")
        st = str(tmp_path / "st")
        df = spark.createDataFrame([(1, "x y z")], ["doc_id", "text"])
        kdf = spark.createDataFrame(
            [(1, 0, 123)], "doc_id long, band int, key long"
        )
        df.write.parquet(os.path.join(acc, "epoch=0"))
        kdf.write.parquet(os.path.join(st, "epoch=0"))
        # epoch 1 committed but EMPTY: only a _SUCCESS marker, no data
        for base in (acc, st):
            d = os.path.join(base, "epoch=1")
            os.makedirs(d)
            open(os.path.join(d, "_SUCCESS"), "w").close()
        try:
            ingest_state_compact(spark, "t_empty_state", acc, st, 1)
            ptr = spark.table("t_empty_state_meta").first()
            assert ptr["hwm"] == 1
            got = spark.table(f"t_empty_state_acc_g{ptr['gen']}").collect()
            assert [(r["doc_id"], r["text"]) for r in got] == [(1, "x y z")]
        finally:
            for suf in ("_meta", "_meta_prev", "_meta_staging"):
                spark.sql(f"DROP TABLE IF EXISTS t_empty_state{suf}")
            for g in range(3):
                spark.sql(f"DROP TABLE IF EXISTS t_empty_state_acc_g{g}")
                spark.sql(f"DROP TABLE IF EXISTS t_empty_state_keys_g{g}")

    def test_all_empty_first_fold_is_a_noop(self, spark, tmp_path):
        import os

        from experimentsplan_datapipeline_spark.streaming.ingest import (
            _list_epochs,
            ingest_state_compact,
        )

        acc = str(tmp_path / "acc")
        st = str(tmp_path / "st")
        for base in (acc, st):
            d = os.path.join(base, "epoch=0")
            os.makedirs(d)
            open(os.path.join(d, "_SUCCESS"), "w").close()
        ingest_state_compact(spark, "t_allempty_state", acc, st, 0)
        # nothing to point at: no pointer committed, empty dirs cleared
        assert not spark.catalog.tableExists("t_allempty_state_meta")
        assert _list_epochs(spark, acc) == []
        assert _list_epochs(spark, st) == []


class TestAnnStreamingIngest:
    """VERDICT r10 item 4: live IVF maintenance — epoch partitions,
    watermark-gated compaction into the cell-bucketed lists, and
    crash-replay across the compaction boundary."""

    @staticmethod
    def _vecs(spark):
        import math

        rows = [
            (i, [math.sin(i * 0.7 + d) for d in range(8)])
            for i in range(40)
        ]
        return spark.createDataFrame(rows, "vec_id long, vec array<double>")

    def test_live_ingest_with_compaction_and_crash_replay(
        self, spark, tmp_path
    ):
        import os

        from experimentsplan_datapipeline_spark.operators.similarity import (
            ann_index_drop,
            ann_index_write,
            ann_query_indexed,
        )
        from experimentsplan_datapipeline_spark.streaming.events import (
            run_available_now,
        )
        from experimentsplan_datapipeline_spark.streaming.ingest import (
            _list_epochs,
            streaming_ann_ingest,
        )

        vecs = self._vecs(spark)
        base = vecs.filter(F.col("vec_id") >= 8)
        new = vecs.filter(F.col("vec_id") < 8)
        staging = tmp_path / "staging"
        staging.mkdir()
        asg_dir = str(tmp_path / "asg")
        ckpt = str(tmp_path / "ckpt")
        try:
            ann_index_write(base, "t_sann_idx", "vec", "vec_id", n_cells=4)

            def stage(df, i):
                import glob
                import shutil

                tmp = str(tmp_path / f"st{i}")
                df.coalesce(1).write.parquet(tmp)
                part = glob.glob(tmp + "/part-*.parquet")[0]
                dst = str(staging / f"{i:04d}.parquet")
                shutil.move(part, dst)
                os.utime(dst, (1_700_000_000 + i * 100,) * 2)

            def drain():
                stream = (
                    spark.readStream.schema(new.schema)
                    .option("maxFilesPerTrigger", 1)
                    .parquet(str(staging))
                )
                writer = streaming_ann_ingest(
                    stream, "t_sann_idx", asg_dir, "vec", "vec_id",
                    auto_compact_every=2,
                ).option("checkpointLocation", ckpt)
                run_available_now(writer, timeout_sec=240.0)

            # epochs 0-1, then CRASH-REPLAY setup: plant a partial (and
            # WRONG) epoch-2 dir as if a prior attempt half-wrote it
            stage(new.filter(F.col("vec_id") % 4 == 0), 0)
            stage(new.filter(F.col("vec_id") % 4 == 1), 1)
            drain()
            spark.createDataFrame(
                [(999, 0, [0.0] * 8)], "vec_id long, cell int, vec array<double>"
            ).write.parquet(os.path.join(asg_dir, "epoch=2"))
            # epochs 2-3: epoch 2 triggers the auto-compaction (folds
            # 0-1) and then OVERWRITES its own partial leftovers
            stage(new.filter(F.col("vec_id") % 4 == 2), 2)
            stage(new.filter(F.col("vec_id") % 4 == 3), 3)
            drain()

            meta = spark.table("t_sann_idx_meta").first()
            assert meta["hwm"] == 1 and meta["gen"] == 1
            assert _list_epochs(spark, asg_dir) == [2, 3]  # 0-1 folded
            # the planted bogus row is gone (epoch 2 overwrote itself)
            live = spark.read.parquet(asg_dir)
            assert live.filter(F.col("vec_id") == 999).count() == 0

            # truth: batch append over the same frozen centroids
            ann_index_write(base, "t_sann_ref", "vec", "vec_id", n_cells=4)
            ann_index_write(
                new, "t_sann_ref", "vec", "vec_id", n_cells=4, mode="append"
            )
            q = vecs.filter(F.col("vec_id") < 5)
            got = {
                (r["vec_id_q"], r["vec_id"], r["cosine"], r["rank"])
                for r in ann_query_indexed(
                    q, "t_sann_idx", "vec_id", "vec", k=5, n_probe=2,
                    live_dir=asg_dir,
                ).collect()
            }
            want = {
                (r["vec_id_q"], r["vec_id"], r["cosine"], r["rank"])
                for r in ann_query_indexed(
                    q, "t_sann_ref", "vec_id", "vec", k=5, n_probe=2
                ).collect()
            }
            assert got == want and len(got) == 25
            # plan shape: the live union must not demote the probe join —
            # the batch side broadcasts onto the (bucketed + live) lists,
            # never a sort-merge or cartesian
            plan = (
                ann_query_indexed(
                    q, "t_sann_idx", "vec_id", "vec", k=5, n_probe=2,
                    live_dir=asg_dir,
                )
                ._jdf.queryExecution().executedPlan().toString()
            )
            assert "SortMergeJoin" not in plan
            assert "CartesianProduct" not in plan
            assert "BroadcastHashJoin" in plan
        finally:
            ann_index_drop(spark, "t_sann_idx")
            ann_index_drop(spark, "t_sann_ref")

    def test_compact_guards(self, spark, tmp_path):
        import os

        from experimentsplan_datapipeline_spark.operators.similarity import (
            ann_index_drop,
            ann_index_write,
        )
        from experimentsplan_datapipeline_spark.streaming.ingest import (
            ann_state_compact,
        )

        vecs = self._vecs(spark)
        asg_dir = str(tmp_path / "asg2")
        try:
            with pytest.raises(ValueError, match="not found"):
                ann_state_compact(spark, "t_sann_g", asg_dir, 0)
            ann_index_write(
                vecs.filter(F.col("vec_id") >= 8), "t_sann_g", "vec",
                "vec_id", n_cells=4,
            )
            spark.createDataFrame(
                [(0, 1, [0.5] * 8)], "vec_id long, cell int, vec array<double>"
            ).write.parquet(os.path.join(asg_dir, "epoch=0"))
            ann_state_compact(spark, "t_sann_g", asg_dir, 0)
            meta = spark.table("t_sann_g_meta").first()
            assert meta["hwm"] == 0 and meta["gen"] == 1
            # folded rows really reached the bucketed lists
            assert (
                spark.table("t_sann_g_asg_g1")
                .filter(F.col("vec_id") == 0).count() == 1
            )
            with pytest.raises(ValueError, match="below the existing"):
                ann_state_compact(spark, "t_sann_g", asg_dir, -1)
        finally:
            ann_index_drop(spark, "t_sann_g")


def test_compact_gc_old_false_defers_collection(spark, tmp_path):
    """ADVICE r10: gc_old=False must leave superseded generation tables
    on disk (an in-flight reader that resolved the old pointer keeps
    working; a maintenance window collects later) — and the next
    gc_old=True compaction collects them."""
    import os

    from experimentsplan_datapipeline_spark.streaming.ingest import (
        ingest_state_compact,
        ingest_state_drop,
    )

    acc = str(tmp_path / "acc")
    st = str(tmp_path / "st")
    kschema = "doc_id long, band int, key long"
    try:
        for e in range(3):
            spark.createDataFrame(
                [(10 + e, f"w{e} x y")], ["doc_id", "text"]
            ).write.parquet(os.path.join(acc, f"epoch={e}"))
            spark.createDataFrame(
                [(10 + e, 0, 100 + e)], kschema
            ).write.parquet(os.path.join(st, f"epoch={e}"))
        ingest_state_compact(spark, "t_gc_state", acc, st, 0)  # gen 0
        ingest_state_compact(
            spark, "t_gc_state", acc, st, 1, gc_old=False
        )  # gen 1, gen 0 kept
        names = {t.name for t in spark.catalog.listTables()}
        assert {"t_gc_state_acc_g0", "t_gc_state_acc_g1"} <= names
        ingest_state_compact(spark, "t_gc_state", acc, st, 2)  # gen 2, GC
        names = {t.name for t in spark.catalog.listTables()}
        assert "t_gc_state_acc_g2" in names
        assert "t_gc_state_acc_g0" not in names
        assert "t_gc_state_acc_g1" not in names
        # the folded rows all made it through the deferred-GC chain
        ptr = spark.table("t_gc_state_meta").first()
        got = {
            r["doc_id"]
            for r in spark.table(f"t_gc_state_acc_g{ptr['gen']}").collect()
        }
        assert got == {10, 11, 12}
    finally:
        ingest_state_drop(spark, "t_gc_state")


class TestTextIndexVerifyPushdown:
    def test_text_index_pushdown_matches_recompute(self, spark):
        """store_text=True + corpus_text_pushdown (the §4j verify-scan
        mitigation): verifying against the id-sorted text table with the
        literal IN pushdown gives byte-identical results to the plain
        recompute path, and the verify plan carries a pushed id filter
        on the text-table scan instead of a corpus-parquet scan."""
        corpus, batch = _docs(spark)
        minhash_index_write(
            corpus, "t_ingest_txt", "text", "doc_id", store_text=True
        )
        try:
            from experimentsplan_datapipeline_spark.operators.dedup import (
                minhash_index_read_text,
            )

            idx = minhash_index_read(spark, "t_ingest_txt")
            ctext = minhash_index_read_text(spark, "t_ingest_txt")
            via_pushdown = minhash_lsh_incremental(
                ctext, batch, "text", "doc_id", threshold=0.5,
                corpus_bandkeys=idx, corpus_text_pushdown=1000,
            )
            plan = (
                via_pushdown._jdf.queryExecution().executedPlan().toString()
            )
            assert "In(doc_id" in plan or "doc_id IN" in plan, plan
            recompute = minhash_lsh_incremental(
                corpus, batch, "text", "doc_id", threshold=0.5
            )
            a = sorted(map(tuple, via_pushdown.collect()))
            b = sorted(map(tuple, recompute.collect()))
            assert a == b and a
        finally:
            minhash_index_drop(spark, "t_ingest_txt")

    def test_pushdown_cap_falls_back_to_semi_join(self, spark):
        """Candidates above the cap: identical rows via the semi-join
        fallback (cap=1 guarantees overflow here)."""
        corpus, batch = _docs(spark)
        minhash_index_write(
            corpus, "t_ingest_txt2", "text", "doc_id", store_text=True
        )
        try:
            from experimentsplan_datapipeline_spark.operators.dedup import (
                minhash_index_read_text,
            )

            idx = minhash_index_read(spark, "t_ingest_txt2")
            ctext = minhash_index_read_text(spark, "t_ingest_txt2")
            capped = minhash_lsh_incremental(
                ctext, batch, "text", "doc_id", threshold=0.5,
                corpus_bandkeys=idx, corpus_text_pushdown=1,
            )
            recompute = minhash_lsh_incremental(
                corpus, batch, "text", "doc_id", threshold=0.5
            )
            assert sorted(map(tuple, capped.collect())) == sorted(
                map(tuple, recompute.collect())
            )
        finally:
            minhash_index_drop(spark, "t_ingest_txt2")

    def test_text_append_grows_and_plain_index_refuses_read_text(
        self, spark
    ):
        """Append mode grows the text table alongside the keys; an index
        built without store_text raises loudly on read_text."""
        import pytest as _pytest

        corpus, batch = _docs(spark)
        minhash_index_write(
            corpus, "t_ingest_txt3", "text", "doc_id", store_text=True
        )
        minhash_index_write(corpus, "t_ingest_plain", "text", "doc_id")
        try:
            from experimentsplan_datapipeline_spark.operators.dedup import (
                minhash_index_read_text,
            )

            n0 = minhash_index_read_text(spark, "t_ingest_txt3").count()
            minhash_index_write(
                batch, "t_ingest_txt3", "text", "doc_id", mode="append"
            )
            n1 = minhash_index_read_text(spark, "t_ingest_txt3").count()
            assert n1 == n0 + batch.count()
            with _pytest.raises(ValueError, match="store_text"):
                minhash_index_read_text(spark, "t_ingest_plain")
        finally:
            minhash_index_drop(spark, "t_ingest_txt3")
            minhash_index_drop(spark, "t_ingest_plain")

    def test_retried_append_does_not_multiply_verify_pairs(self, spark):
        """A crashed-then-retried append leaves duplicate (id, text) rows
        in the text table; read_text dedups on id (ADVICE r12), so the
        incremental verify emits exactly ONE row per (batch_id,
        corpus_id) pair — identical to the never-crashed run."""
        corpus, batch = _docs(spark)
        minhash_index_write(
            corpus, "t_ingest_txt4", "text", "doc_id", store_text=True
        )
        try:
            from experimentsplan_datapipeline_spark.operators.dedup import (
                minhash_index_read_text,
            )

            # grow the index with the batch, then RETRY the same append
            # (the documented crash-recovery move) — duplicate rows land
            minhash_index_write(
                batch, "t_ingest_txt4", "text", "doc_id", mode="append"
            )
            minhash_index_write(
                batch, "t_ingest_txt4", "text", "doc_id", mode="append"
            )
            # derive the live generation from the meta pointer (ADVICE
            # r13: a hard-coded _text_g0 silently reads the wrong table
            # if append-time generation handling ever changes)
            from experimentsplan_datapipeline_spark.operators.dedup import (
                _read_pointer,
            )

            gen = _read_pointer(spark, "t_ingest_txt4_meta")["gen"]
            raw = spark.table(f"t_ingest_txt4_text_g{gen}")
            assert raw.count() > raw.select("doc_id").distinct().count()
            ctext = minhash_index_read_text(spark, "t_ingest_txt4")
            assert (
                ctext.count() == ctext.select("doc_id").distinct().count()
            )
            idx = minhash_index_read(spark, "t_ingest_txt4")
            # batch 2 = fresh near-dups of corpus docs that now ALSO
            # exist (duplicated) in the text table via the batch append
            batch2 = spark.createDataFrame(
                [(200, batch.filter(F.col("doc_id") == 100)
                        .first()["text"] + " extra")],
                ["doc_id", "text"],
            )
            pairs = minhash_lsh_incremental(
                ctext, batch2, "text", "doc_id", threshold=0.5,
                corpus_bandkeys=idx, corpus_text_pushdown=1000,
            ).collect()
            keys = [(r["batch_id"], r["corpus_id"]) for r in pairs]
            assert len(keys) == len(set(keys)) and keys
        finally:
            minhash_index_drop(spark, "t_ingest_txt4")

    def test_append_with_mismatched_store_text_raises(self, spark):
        """Appending with an explicit store_text that disagrees with the
        persisted meta flag raises instead of silently ignoring the
        argument (ADVICE r12); store_text=None follows the index."""
        import pytest as _pytest

        corpus, batch = _docs(spark)
        minhash_index_write(corpus, "t_ingest_txt5", "text", "doc_id")
        try:
            with _pytest.raises(ValueError, match="store_text"):
                minhash_index_write(
                    batch, "t_ingest_txt5", "text", "doc_id",
                    mode="append", store_text=True,
                )
            # agreeing explicit flag and the None default both succeed
            minhash_index_write(
                batch, "t_ingest_txt5", "text", "doc_id",
                mode="append", store_text=False,
            )
            minhash_index_write(
                batch, "t_ingest_txt5", "text", "doc_id", mode="append"
            )
        finally:
            minhash_index_drop(spark, "t_ingest_txt5")
