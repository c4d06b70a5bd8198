"""Physical-plan regression tests: the scale properties BENCH depends on.

These assert the plan SHAPE, not timings — pushdown reaching the parquet
scan, small dimensions broadcasting, and no accidental extra shuffles. A
regression here is invisible at sf0.01 but fatal at 100 TB.
"""

from __future__ import annotations

import os

import pytest

from experimentsplan_datapipeline_spark.plans.queries import QUERIES

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


def _plan(spark, name: str) -> str:
    return QUERIES[name](spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()


def test_readme_query_count_matches_registry():
    """The README's 'N queries, ALL N value-checked' claim is derived from
    the registry, not hand-maintained — adding a query without updating
    the README fails here instead of drifting (VERDICT r7 item 10)."""
    import re

    from experimentsplan_datapipeline_spark.plans.queries import ORACLE

    readme = os.path.join(os.path.dirname(__file__), "..", "README.md")
    with open(readme) as f:
        m = re.search(r"(\d+) queries, (?:ALL )?(\d+) value-checked", f.read())
    assert m, "README query-count sentence missing"
    assert int(m.group(1)) == len(QUERIES), (m.group(1), len(QUERIES))
    assert int(m.group(2)) == len(ORACLE), (m.group(2), len(ORACLE))


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata not present")
class TestPlanShapes:
    def test_scan_pushdown_no_shuffle(self, spark):
        plan = _plan(spark, "scan_catalog")
        assert "PushedFilters: [" in plan
        assert "PushedFilters: []" not in plan
        assert "Exchange" not in plan  # pure scan+filter: zero shuffles

    def test_dim_join_broadcasts(self, spark):
        # customer is the small side of orders⋈customer — must broadcast,
        # never sort-merge (a sort-merge here shuffles the fact table)
        plan = _plan(spark, "join_pairs")
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan

    def test_flagship_broadcasts_dims(self, spark):
        plan = _plan(spark, "flagship_revenue")
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan

    def test_exact_dedup_single_shuffle(self, spark):
        # fingerprint groupBy: exactly one exchange (hash keys), with a
        # partial aggregate before it (map-side combine)
        plan = _plan(spark, "dedup_exact")
        assert plan.count("Exchange") == 1
        assert "HashAggregate" in plan

    def test_stats_pack_single_shuffle(self, spark):
        plan = _plan(spark, "agg_stats_pack")
        assert plan.count("Exchange") == 1

    def test_similarity_broadcasts_queries(self, spark):
        # the query set must broadcast; the corpus side must not shuffle
        plan = _plan(spark, "similarity_bruteforce")
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan

    def test_bucketed_join_zero_exchange(self, spark):
        # both sides bucketed on the join key: the sort-merge join AND the
        # downstream groupBy must run without any Exchange
        plan = _plan(spark, "join_bucketed")
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        assert plan.count("Bucketed: true") == 2


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata not present")
class TestNewOpPlanShapes:
    def test_url_domain_filter_broadcast_anti(self, spark):
        # blocklist must broadcast; an exchange-both-sides anti join would
        # shuffle the corpus for a 2-row blocklist
        plan = _plan(spark, "url_domain_filter")
        assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
        assert "SortMergeJoin" not in plan

    def test_text_entropy_two_shrinking_aggs(self, spark):
        # explode -> groupBy(doc,term) -> groupBy(doc): two hash exchanges
        # max, both after partial aggregation (the RoundRobin spread is
        # spread_small_input's local-test no-op, not a key shuffle)
        plan = _plan(spark, "text_entropy")
        assert plan.count("Exchange hashpartitioning") <= 2
        assert "partial_sum" in plan

    def test_pii_redact_rides_the_scan(self, spark):
        # pure regexp projection: zero shuffles
        plan = _plan(spark, "pii_redact")
        assert "Exchange" not in plan

    def test_tfidf_docfreq_broadcasts(self, spark):
        # document-frequency (|vocab| rows) broadcasts back onto tf; the
        # corpus-sized side must not sort-merge
        plan = _plan(spark, "tfidf_top_terms")
        assert "BroadcastHashJoin" in plan

    def test_mixture_interleave_offsets_broadcast(self, spark):
        # per-bucket offsets (B rows/group) broadcast back; corpus-sized
        # side never sort-merges against them
        plan = _plan(spark, "mixture_interleave")
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan


_EXPENSIVE_HOFS = (
    "array_distinct(", "array_sort(", "sort_array(", "aggregate(",
    "zip_with(", "array_union(", "array_intersect(",
)


def _repeated_expensive_exprs(plan: str, threshold: int = 3) -> dict[str, int]:
    """Identical expensive higher-order expressions appearing >= threshold
    times within one plan line (one projection). Interpreted HOF lambdas
    get NO common-subexpression elimination, so textual multiplicity is
    real per-row recompute — the round-8 §4g disease (array_distinct
    rebuilt 3x per row in the Gopher tier, aggregate(transform(...))
    rebuilt 6x in the unstaged SSIM). Expression ids (#123L) are stripped
    so the same expression at different plan positions compares equal."""
    import collections
    import re

    def balanced_end(s: str, open_paren: int) -> int:
        depth = 0
        for i in range(open_paren, len(s)):
            if s[i] == "(":
                depth += 1
            elif s[i] == ")":
                depth -= 1
                if depth == 0:
                    return i + 1
        return len(s)

    flagged: dict[str, int] = {}
    for line in plan.splitlines():
        counts: collections.Counter[str] = collections.Counter()
        for hof in _EXPENSIVE_HOFS:
            start = 0
            while True:
                j = line.find(hof, start)
                if j < 0:
                    break
                end = balanced_end(line, j + len(hof) - 1)
                counts[re.sub(r"#\d+L?", "", line[j:end])] += 1
                start = j + 1
        for expr, c in counts.items():
            if c >= threshold:
                flagged[expr] = max(c, flagged.get(expr, 0))
    return flagged


def test_expression_multiplicity_lint_catches_unstaged_shape(spark):
    """Negative fixture: the pre-fix shape (one Column reusing an
    aggregate in several formula positions — the unstaged ssim_global /
    pre-r8 Gopher tier) MUST be flagged by the lint."""
    from experimentsplan_datapipeline_spark.functions.vectors import ssim_global

    df = spark.createDataFrame([(1, [1.0, 2.0, 3.0])], ["id", "x"])
    bad = df.select(ssim_global("x", "x").alias("s"))
    plan = bad._jdf.queryExecution().optimizedPlan().toString()
    assert _repeated_expensive_exprs(plan), (
        "lint failed to flag the unstaged SSIM shape"
    )


@pytest.fixture(scope="module")
def registry_plans(spark):
    """(optimized, executed) plan strings for EVERY registered query,
    built ONCE per test module (r15, VERDICT r14 item 1): the two
    registry-wide lints below each rebuilt all 260 queries — including
    the eager index/drain bodies — costing ~2.5 min apiece; one shared
    build halves the suite's single largest block while keeping both
    lints over the full registry in the DEFAULT run."""
    plans = {}
    for name, fn in QUERIES.items():
        qe = fn(spark, SF_DIR)._jdf.queryExecution()
        plans[name] = (
            qe.optimizedPlan().toString(), qe.executedPlan().toString()
        )
    return plans


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata not present")
def test_no_query_repeats_expensive_expressions(registry_plans):
    """Registry-wide expression-multiplicity lint (VERDICT r8 item 6): no
    registered query's optimized plan may compute the SAME expensive
    higher-order expression 3+ times in one projection. The cascade's
    2.9x §4g win and the staged-SSIM rewrite were both this exact bug."""
    offenders = {}
    for name, (opt, _) in registry_plans.items():
        hits = _repeated_expensive_exprs(opt)
        if hits:
            offenders[name] = {e[:80]: c for e, c in hits.items()}
    assert not offenders, f"repeated expensive expressions: {offenders}"


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata not present")
class TestRound9PlanShapes:
    def test_centroid_drift_bounded_shuffle_broadcast_pairs(self, spark):
        """The (slice, dim) mean agg is the only corpus-scale work; the
        S-row centroid pair join must broadcast, and raw vectors join
        nothing (no sort-merge anywhere)."""
        plan = _plan(spark, "embedding_centroid_drift")
        assert "CartesianProduct" not in plan
        assert "SortMergeJoin" not in plan
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan

    def test_ssim_windowed_one_python_stage_no_key_shuffle(self, spark):
        """Decode is the single Python stage; window explode + slice +
        staged stats are pure per-row codegen — no hash exchange, no
        row-at-a-time UDF, no join."""
        plan = _plan(spark, "metric_ssim_windowed")
        assert plan.count("MapInPandas") == 1
        assert "Exchange hashpartitioning" not in plan
        assert "BatchEvalPython" not in plan
        assert "Join" not in plan

    def test_indexed_ingest_verify_candidate_only(self, spark):
        """The steady-state gate's final plan: the band join is pinned
        (Scan ExistingRDD — it ran once in the checkpoint's own job,
        reading the stage table; asserted against the unpinned lineage
        in tests/test_ingest.py). r12 (§4j mitigation): the CORPUS
        verify side reads the index's id-sorted TEXT table through a
        literal IN pushdown — no LeftSemi and no documents scan at all
        on that side — so at most ONE documents scan remains (the
        batch side, still a candidate-pruned LeftSemi)."""
        plan = _plan(spark, "dedup_incremental_indexed")
        assert "Scan ExistingRDD" in plan  # pinned candidates
        doc_scans = [
            ln for ln in plan.splitlines()
            if "FileScan" in ln and "documents" in ln
        ]
        assert len(doc_scans) <= 1, f"{len(doc_scans)} documents scans"
        assert plan.count("LeftSemi") >= 1  # batch-side candidate prune
        # the pushed literal id filter on the corpus text-table scan
        assert "In(doc_id" in plan or "doc_id IN" in plan, plan

    def test_cdc_chunking_one_window_bounded_exchanges(self, spark):
        """CDC chunking is one high-cardinality-keyed window pass (lag +
        boundary + cumsum share the (doc, pos) spec) plus one combine-
        capable groupBy — at most two hash exchanges, no join, no
        Python."""
        plan = _plan(spark, "chunk_content_defined")
        assert plan.count("Exchange hashpartitioning") <= 2
        assert "Window" in plan
        assert "Join" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    def test_infer_npz_single_python_chain(self, spark):
        """Decode + normalize + broadcast-scored inference fuse into
        Arrow mapInPandas stages over one scan — no shuffle at all."""
        plan = _plan(spark, "media_infer_npz")
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata not present")
def test_no_query_degrades_to_cartesian_product(registry_plans):
    """Registry-wide plan lint: no registered query may plan a non-broadcast
    CartesianProduct — the all-pairs shapes (ngram_jaccard, dedup_embedding)
    are bounded AND broadcastable, so even they must come out as broadcast
    nested-loop, never a shuffled cartesian."""
    for name, (_, plan) in registry_plans.items():
        assert "CartesianProduct" not in plan, f"{name} plans a CartesianProduct"


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata not present")
class TestRetrievalPlanShapes:
    def test_bloom_semi_prunes_before_shuffle(self, spark):
        """The bloom bit-test must reach the probe-side scan (DataFilters),
        and the trailing exact semi join must still be present."""
        plan = _plan(spark, "join_bloom_semi")
        scan_lines = [
            l for l in plan.splitlines()
            if "FileScan" in l and "lineitem" in l
        ]
        assert scan_lines and "element_at" in scan_lines[0]
        assert "LeftSemi" in plan

    def test_bm25_broadcasts_query_side(self, spark):
        """Query vocab, doc frequency, and corpus stats all broadcast; the
        only corpus-scale exchanges are the tf/doc-length aggregations."""
        plan = _plan(spark, "bm25_topk")
        assert plan.count("BroadcastExchange") >= 3
        assert "CartesianProduct" not in plan

    def test_bm25_no_doc_length_join(self, spark):
        """Doc length rides inside the tf aggregation (any_value per
        (doc, term) group), so no corpus-scale dl join exists: at most
        three documents scans (tf x2 + the no-explode stats projection)
        and no sort-merge join anywhere."""
        plan = _plan(spark, "bm25_topk")
        doc_scans = [
            l for l in plan.splitlines()
            if "FileScan" in l and "documents" in l
        ]
        assert len(doc_scans) <= 3, f"{len(doc_scans)} documents scans"
        assert "SortMergeJoin" not in plan

    def test_brute_force_topk_two_phase_ranking(self, spark):
        """similarity_bruteforce must rank via two windows (per-bucket
        partial + final over survivors) — a single Window.partitionBy(qid)
        over the full scored corpus is one task per query at scale."""
        plan = _plan(spark, "similarity_bruteforce")
        assert plan.count("RunningWindowFunction") + plan.count("Window") >= 2
        # phase-1 partition keys include the hash bucket, not just the qid
        assert "pmod" in plan or "xxhash64" in plan


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata not present")
class TestRound3PlanShapes:
    def test_gapfill_grid_no_cartesian_and_broadcast(self, spark):
        # the dense bucket grid joins the aggregated buckets with a hash
        # join on (type, bucket) — never a cartesian against the corpus
        plan = _plan(spark, "events_gapfill")
        assert "CartesianProduct" not in plan

    def test_retention_single_user_shuffle(self, spark):
        # cohort assignment and activity dedup both key on user_id; the
        # join of two user-keyed aggregates must not re-shuffle a third time
        plan = _plan(spark, "events_retention")
        assert plan.count("Exchange hashpartitioning") <= 4
        assert "CartesianProduct" not in plan

    def test_collocations_broadcast_totals(self, spark):
        # corpus totals are single-row broadcasts; the unigram joins are
        # hash joins, and the top-50 is TakeOrdered, not a global sort
        plan = _plan(spark, "text_collocations")
        assert "BroadcastExchange" in plan
        assert "TakeOrderedAndProject" in plan

    def test_rolling_dau_band_join_not_cartesian(self, spark):
        # the 7-day band join must plan as a range-condition join off the
        # day spine, never a shuffled cartesian
        plan = _plan(spark, "events_rolling_dau")
        assert "CartesianProduct" not in plan

    def test_basket_pairs_keyed_self_join(self, spark):
        # the pair generation must key on l_orderkey (bounded fanout) —
        # an unkeyed product of the items table would be corpus-quadratic
        plan = _plan(spark, "basket_part_pairs")
        assert "CartesianProduct" not in plan
        assert "TakeOrderedAndProject" in plan

    def test_cumsum_dist_offsets_broadcast(self, spark):
        plan = _plan(spark, "window_cumsum_dist")
        assert "BroadcastExchange" in plan  # per-partition offsets
        # the range partitioning is PINNED by an eager localCheckpoint (one
        # materialization feeds cumsum/totals/join — __pid must agree), so
        # the final plan reads the checkpointed RDD instead of replanning
        # the range exchange per consumer
        assert "Scan ExistingRDD" in plan
        assert "RangePartitioning" not in plan


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata not present")
class TestRound4PlanShapes:
    def test_ivfpq_query_luts_executor_side(self, spark):
        """The PQ query-side probe/LUT build must run in executors
        (mapInPandas over the queries scan), never as a driver collect
        materialized into a LocalTableScan — a bulk query batch would
        OOM the driver otherwise. Two MapInPandas: index + query LUTs."""
        plan = _plan(spark, "ann_ivfpq")
        assert plan.count("MapInPandas") >= 2
        assert "LocalTableScan" not in plan
        assert "Scan ExistingRDD" not in plan

    def test_pq_query_luts_executor_side(self, spark):
        plan = _plan(spark, "ann_pq")
        assert plan.count("MapInPandas") >= 2
        assert "LocalTableScan" not in plan
        assert "Scan ExistingRDD" not in plan


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata not present")
class TestRound4PlanShapesJoins:
    def test_jaccard_candidate_join_sort_merge(self, spark):
        # the two exploded corpus-sized prefix frames must SORT-MERGE —
        # a misestimated broadcast here OOMs the driver at scale
        plan = _plan(spark, "jaccard_prefix_join")
        assert "SortMergeJoin" in plan

    def test_containment_candidate_join_sort_merge(self, spark):
        plan = _plan(spark, "dedup_containment")
        assert "SortMergeJoin" in plan

    def test_dsir_ratio_table_broadcasts(self, spark):
        # the 64-row bucket-ratio table broadcasts onto the bigram stream;
        # the corpus side must never be a broadcast build
        plan = _plan(spark, "dsir_importance")
        assert "BroadcastExchange" in plan
        assert "CartesianProduct" not in plan

    def test_header_dims_peek_is_codegen(self, spark):
        # encoding runs in ONE python stage (mapInPandas); the header peek
        # itself is pure column expressions — no second python eval
        plan = _plan(spark, "media_header_dims")
        assert plan.count("MapInPandas") == 1
        assert "BatchEvalPython" not in plan  # no row-at-a-time UDF anywhere

    def test_pagerank_rounds_keep_partial_aggregation(self, spark):
        # each unrolled round must combine map-side before its dst shuffle,
        # and the only nested-loop joins are single-row N broadcasts
        plan = _plan(spark, "graph_pagerank")
        assert "HashAggregate" in plan
        assert "CartesianProduct" not in plan


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata not present")
class TestRound5PlanShapes:
    def test_pagerank_edge_frame_pinned(self, spark):
        """contrib_base (edges ⋈ out-degree) and the node frame are
        localCheckpoint-pinned, so every unrolled round reads ONE
        materialized layout: the final plan scans the checkpointed RDDs
        and the lineitem/co-purchase build appears NOWHERE in it — it runs
        exactly once, in the checkpoint's own job, instead of re-deriving
        the self-join + shuffle per round."""
        for name in ("graph_pagerank", "graph_pagerank_weighted"):
            plan = _plan(spark, name)
            assert "Scan ExistingRDD" in plan
            assert "lineitem" not in plan
            assert "CartesianProduct" not in plan

    def test_approx_distinct_single_aggregation_pass(self, spark):
        # exact + HLL++ estimate in one grouped aggregation over one scan —
        # the bound-check must not add a second pass over orders
        plan = _plan(spark, "approx_distinct")
        assert plan.count("Scan parquet") == 1


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata not present")
class TestRound6PlanShapes:
    def test_triangle_count_no_cartesian_no_window(self, spark):
        """The wedge join and closing join are equi-joins keyed by the
        oriented cell — no cartesian anywhere, and the per-node count is
        a plain aggregation (no window sort)."""
        plan = _plan(spark, "graph_triangles")
        assert "CartesianProduct" not in plan
        assert "Window" not in plan

    def test_communities_single_pass_top1_no_window(self, spark):
        """label_propagation's per-node top-1 is a max_by AGGREGATION
        (map-side combinable) — the plan must contain no Window operator,
        where the naive row_number-over-partition formulation (what the
        oracle uses) would sort every (node, label) group."""
        plan = _plan(spark, "graph_communities")
        assert "Window" not in plan
        assert "CartesianProduct" not in plan
        assert "max_by" in plan or "HashAggregate" in plan

    def test_personalized_pagerank_pinned_like_plain(self, spark):
        """Personalized PR reuses the pinned ladder: the co-purchase build
        runs once in the checkpoint's own job — no lineitem scan in the
        final plan — and the only nested-loop joins are single-row
        broadcasts (|S|, dangling)."""
        plan = _plan(spark, "graph_pagerank_personalized")
        assert "Scan ExistingRDD" in plan
        assert "lineitem" not in plan
        assert "CartesianProduct" not in plan

    def test_pack_chunks_single_shuffle(self, spark):
        """Sequence packing is ONE hash shuffle (the shard partitioning
        feeding the per-shard window cumsum) — the explode and bin
        arithmetic are pure codegen; no join, no second exchange, no
        cartesian."""
        plan = _plan(spark, "curate_pack_chunks")
        assert plan.count("Exchange") == 1
        assert plan.count("Window") == 1  # per-shard cumsum only
        assert "CartesianProduct" not in plan
        assert "Join" not in plan

    def test_random_projection_zero_shuffle(self, spark):
        """JL projection is a pure per-row expression over the scan — the
        literal sign matrix lives in the plan, so there must be NO
        exchange, no UDF eval node, and no join."""
        plan = _plan(spark, "ann_random_projection")
        assert "Exchange" not in plan
        assert "Join" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    def test_c4_rules_ride_the_scan(self, spark):
        """C4 cleaning is zero-shuffle map-side codegen: line synthesis +
        every rule are higher-order expressions, so no exchange, no join,
        no Python eval node."""
        plan = _plan(spark, "text_c4_rules")
        assert "Exchange" not in plan
        assert "Join" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    def test_quantize_int8_rides_the_scan(self, spark):
        """Per-vector int8 quantization reads only the row's own values —
        zero exchange, zero join, zero UDF."""
        plan = _plan(spark, "embedding_quantize_int8")
        assert "Exchange" not in plan
        assert "Join" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    def test_vocab_coverage_probe_is_broadcast(self, spark):
        """The top-V vocabulary must probe as a broadcast hash join (V is
        tiny by definition); the corpus side never sort-merges against
        its own vocabulary."""
        plan = _plan(spark, "text_vocab_coverage")
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan

    def test_scaler_stats_broadcast_not_cartesian(self, spark):
        """The 1-row fitted-stats frame joins as a broadcast nested loop
        (a true cross join of cardinality 1), never a materialized
        cartesian product or a shuffle."""
        plan = _plan(spark, "curate_scaler_fit_transform")
        assert "BroadcastNestedLoopJoin" in plan
        assert "CartesianProduct" not in plan
        assert "SortMergeJoin" not in plan

    def test_mixture_temperature_quota_broadcast(self, spark):
        """Per-source quotas broadcast back onto the ranked corpus; the
        draw itself must not introduce a sort-merge join."""
        plan = _plan(spark, "curate_mixture_temperature")
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan

    def test_lines_rewrite_no_cartesian_single_line_shuffle(self, spark):
        """Line dedup's heavy key (the line text) shuffles through ONE
        combine-capable aggregation + one equi-join; never a document-
        granularity self-join."""
        plan = _plan(spark, "dedup_lines_rewrite")
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_ngram_novelty_shrinking_aggs(self, spark):
        """Novelty is two shrinking aggregations + one gram-key equi-join —
        no cartesian, no window, no Python eval."""
        plan = _plan(spark, "text_ngram_novelty")
        assert "CartesianProduct" not in plan
        assert "Window" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    def test_scd2_window_partitions_on_key(self, spark):
        """The SCD-2 interval window must partition on o_orderkey (high
        cardinality — scales with the snapshot), and the plan needs no
        join at all."""
        plan = _plan(spark, "merge_scd2_history")
        assert "Window" in plan
        assert "o_orderkey" in plan
        assert "CartesianProduct" not in plan

    def test_association_rules_counts_broadcast(self, spark):
        """Item counts and the scalar basket count must broadcast onto the
        pair frame — the pair table is the only big frame and it never
        re-shuffles through a sort-merge join."""
        plan = _plan(spark, "basket_association_rules")
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan

    def test_jsd_drift_no_self_join(self, spark):
        """The drift monitor is counts + a token-key pivot + one scalar
        fold — the corpus never joins itself and no Python eval node
        appears."""
        plan = _plan(spark, "text_jsd_drift")
        assert "CartesianProduct" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    def test_ingest_pipeline_no_nested_loop(self, spark):
        """The ingest funnel conjoins independently-computed flags: every
        join is an equi-join (fingerprint, band key, doc_id) — no
        cartesian, no broadcast nested loop anywhere in the plan."""
        plan = _plan(spark, "pipeline_ingest_batch")
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_decontaminate_no_corpus_broadcast(self, spark):
        """The train corpus must never be a broadcast build side; the only
        join on the gram key is an equi-join, and the final attach is a
        left join keyed on doc_id."""
        plan = _plan(spark, "curate_decontaminate")
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata not present")
class TestRound11PlanShapes:
    def test_bpe_ids_single_arrow_stage_no_shuffle(self, spark):
        """The production tokenizer apply path is ONE Arrow mapInPandas
        over the documents scan plus a posexplode — no shuffle, no join,
        no row-at-a-time Python; the merge table rides the closure, not
        the plan."""
        plan = _plan(spark, "tokenizer_bpe_ids")
        assert plan.count("MapInPandas") == 1
        assert "Exchange hashpartitioning" not in plan
        assert "BatchEvalPython" not in plan
        assert "Join" not in plan

    def test_phash_whole_stage_codegen_survives(self, spark):
        """The staged two-pass DCT must stay inside whole-stage codegen
        (the flattened form compiled past the JVM 64 KB method limit and
        silently ran interpreted — r10's weak mark). With
        spark.sql.codegen.fallback=false in conftest, merely BUILDING
        this plan and collecting would raise on a codegen failure; the
        assertion documents the intent."""
        df = QUERIES["media_phash"](spark, SF_DIR)
        df.collect()  # executes under fallback=false: codegen failure raises
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        # in formatted explain the leading '*' marks operators running
        # inside WholeStageCodegen — the projection carrying the DCT
        # chains must have it
        assert "* Project" in plan
        assert "Exchange hashpartitioning" not in plan
