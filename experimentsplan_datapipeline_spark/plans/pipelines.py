"""End-to-end composed pipelines (SURVEY.md §3, E1-E3).

Each reference entry point re-expressed as ONE lazy DataFrame DAG — the
reference's eager driver-side construction (dataset.py:66-71) becomes plan
building; materialization happens only at the sink/action.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from experimentsplan_datapipeline_spark.operators.joins import assemble_triplets
from experimentsplan_datapipeline_spark.operators.pivots import pivot_table
from experimentsplan_datapipeline_spark.operators.sampling import (
    deterministic_shuffle,
    stratified_exact,
)
from experimentsplan_datapipeline_spark.sources.catalog import (
    IMAGE_GLOB,
    catalog_with_keys,
    scan_catalog,
)

TRIPLET_SLOTS = ["initial_image", "cloth_image", "try_on_image"]


def build_vton_dataset(
    spark: SparkSession,
    roots: list[str],
    targets: dict[str, int] | None = None,
    seed: int = 42,
) -> DataFrame:
    """E1: training-dataset construction (train/common/dataset.py:66-227).

    scan (extension pushdown) -> stem/type/difficulty extraction -> triplet
    group-pivot + completeness -> exact stratified sample -> seeded shuffle.
    One shuffle for the pivot, one for the sample window, one for the final
    orderBy; all string work stays in whole-stage codegen.
    """
    files = scan_catalog(spark, roots, glob=IMAGE_GLOB)
    keyed = catalog_with_keys(files)
    triplets = assemble_triplets(
        keyed.filter(F.col("image_type").isNotNull()),
        "stem", "image_type", "path", TRIPLET_SLOTS,
    )
    # difficulty rides along via a per-stem max (stems never span difficulties
    # in the reference layout; max() makes the unexpected case deterministic)
    difficulty = keyed.groupBy("stem").agg(F.max("difficulty").alias("difficulty"))
    ds = triplets.join(difficulty, "stem")
    if targets:
        ds = stratified_exact(ds, "difficulty", targets, ["stem"], seed=seed)
    return deterministic_shuffle(ds, ["stem"], seed=seed)


def evaluation_report(
    metrics: DataFrame,
    metric_cols: list[str],
    model_col: str = "model",
    bench_col: str = "benchmark",
) -> tuple[DataFrame, DataFrame]:
    """E2: evaluation analytics (train/common/metrics.py:391-479 +
    train/evaluate_all_models.py:96-122).

    Returns (stats, pivot): per-(model,benchmark) mean/std/min/max packs for
    every metric column in ONE aggregation pass, and the model x benchmark
    mean-of-first-metric comparison table.
    """
    aggs = []
    for m in metric_cols:
        aggs += [
            F.avg(m).alias(f"{m}_mean"),
            F.stddev_pop(m).alias(f"{m}_std"),
            F.min(m).alias(f"{m}_min"),
            F.max(m).alias(f"{m}_max"),
        ]
    stats = metrics.groupBy(model_col, bench_col).agg(*aggs)
    pivot = pivot_table(metrics, model_col, bench_col, metric_cols[0], agg="avg")
    return stats, pivot


def curate_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
    min_quality: float = 0.5,
) -> DataFrame:
    """North-star E2E: the training-data curation pass.

    score -> quality filter -> exact dedup (keep min-id representative) ->
    per-source acceptance stats. One scan of the corpus; the dedup groupBy
    shuffles 16-byte fingerprints, the final agg shuffles |sources| rows.
    Near-dup (minhash) and embedding stages chain between the filter and the
    report the same way — each consumes the survivors of the previous tier.
    """
    from experimentsplan_datapipeline_spark.functions.text import (
        doc_fingerprint,
        quality_score,
        token_count,
    )

    scored = docs.select(
        F.col(id_col),
        F.col(group_col),
        quality_score(text_col).alias("quality"),
        token_count(text_col).alias("n_tokens"),
        doc_fingerprint(text_col).alias("fp"),
    ).filter(F.col("quality") >= min_quality)
    reps = scored.groupBy("fp").agg(F.min(id_col).alias(id_col)).select(id_col)
    kept = scored.join(reps, [id_col])
    return (
        kept.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("quality"), 6).alias("avg_quality"),
            F.sum("n_tokens").alias("total_tokens"),
        )
    )
