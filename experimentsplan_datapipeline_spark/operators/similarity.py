"""Approximate-nearest-neighbor search over embedding columns (north-star).

Baseline: brute-force cosine top-k — a broadcast of the (small) query set
against a full scan of the corpus, JVM-side arithmetic, TakeOrdered per query.
Scale path: LSH random-hyperplane bucketing — corpus and queries hash to
sign-pattern buckets; only same-bucket pairs score. At 100 TB the bucket join
replaces the corpus×queries cross product with a hash join on bucket id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from experimentsplan_datapipeline_spark.functions.vectors import cosine_similarity


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    corpus_id: str,
    query_id: str,
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k per query via broadcast cross-score.

    The query set is broadcast (queries are few; the corpus is the 100 TB
    side). Returns (query_id, corpus_id, cosine, rank<=k).
    """
    q = F.broadcast(
        queries.select(
            F.col(query_id).alias("__qid"), F.col(vec_col).alias("__qvec")
        )
    )
    # rank on the ROUNDED score with an id tiebreak: float ulp noise must not
    # flip which rows make the top-k (keeps results engine-reproducible)
    scored = corpus.crossJoin(q).select(
        F.col("__qid").alias(query_id + "_q"),
        F.col(corpus_id),
        F.round(cosine_similarity(F.col(vec_col), F.col("__qvec")), 6).alias("cosine"),
    )
    w = Window.partitionBy(query_id + "_q").orderBy(
        F.col("cosine").desc(), F.col(corpus_id).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _hyperplane_bucket(vec, planes: list[list[float]]):
    """Sign-pattern bucket id from fixed random hyperplanes (deterministic)."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        arr = F.array(*[F.lit(float(x)) for x in plane])
        dot = F.aggregate(
            F.zip_with(vec, arr, lambda a, b: a * b), F.lit(0.0), lambda acc, v: acc + v
        )
        bucket = bucket.bitwiseOR(
            F.when(dot >= 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
                F.lit(0).cast("long")
            )
        )
    return bucket


def fixed_hyperplanes(dim: int, n_planes: int = 8, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (LCG — no numpy RNG state)."""
    planes = []
    state = seed
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            row.append(((state >> 33) / float(1 << 31)) - 1.0)
        planes.append(row)
    return planes


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    corpus_id: str,
    query_id: str,
    dim: int,
    vec_col: str = "embedding",
    k: int = 10,
    n_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """ANN top-k: score only same-hyperplane-bucket pairs.

    Recall < 1.0 by construction (bucket boundaries); n_planes trades bucket
    size against recall. The join is a hash join on a long — the scale path.
    """
    planes = fixed_hyperplanes(dim, n_planes, seed)
    c = corpus.withColumn("__bucket", _hyperplane_bucket(F.col(vec_col), planes))
    q = queries.select(
        F.col(query_id).alias("__qid"),
        F.col(vec_col).alias("__qvec"),
    ).withColumn("__bucket", _hyperplane_bucket(F.col("__qvec"), planes))
    scored = c.join(F.broadcast(q), "__bucket").select(
        F.col("__qid").alias(query_id + "_q"),
        F.col(corpus_id),
        F.round(cosine_similarity(F.col(vec_col), F.col("__qvec")), 6).alias("cosine"),
    )
    w = Window.partitionBy(query_id + "_q").orderBy(
        F.col("cosine").desc(), F.col(corpus_id).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    corpus_id: str,
    query_id: str,
    vec_col: str = "embedding",
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 2,
) -> DataFrame:
    """IVF-style ANN: coarse-quantize the corpus into Voronoi cells, probe
    only the ``n_probe`` nearest cells per query.

    Centroids are the ``n_cells`` lowest-id corpus vectors — a deterministic
    stand-in for a trained k-means codebook; at scale you train centroids
    once and broadcast them, and the search-side plan below is identical.
    The cell assignment is a per-row argmax over a broadcast literal array
    (whole-stage codegen, no shuffle); the probe is a hash join on the cell
    id, so nothing ever cross-joins the corpus side.
    """
    cents = (
        corpus.orderBy(corpus_id)
        .limit(n_cells)
        .select(F.col(corpus_id).alias("cell"), F.col(vec_col).alias("cvec"))
        .collect()
    )
    cent_arr = F.array(
        *[
            F.struct(
                F.lit(int(r["cell"])).alias("cell"),
                F.array(*[F.lit(float(x)) for x in r["cvec"]]).alias("cvec"),
            )
            for r in cents
        ]
    )

    def scored_cells(vec):
        # array<struct<cos, cell>>: struct ordering compares cos first, so
        # array_max / array_sort rank cells by similarity deterministically
        return F.transform(
            cent_arr,
            lambda c: F.struct(
                F.round(cosine_similarity(vec, c["cvec"]), 6).alias("cos"),
                c["cell"].alias("cell"),
            ),
        )

    c = corpus.withColumn(
        "__cell", F.array_max(scored_cells(F.col(vec_col)))["cell"]
    )
    q = queries.select(
        F.col(query_id).alias("__qid"), F.col(vec_col).alias("__qvec")
    ).withColumn(
        "__cell",
        F.explode(
            F.transform(
                F.slice(
                    F.reverse(F.array_sort(scored_cells(F.col("__qvec")))), 1, n_probe
                ),
                lambda s: s["cell"],
            )
        ),
    )
    scored = c.join(F.broadcast(q), "__cell").select(
        F.col("__qid").alias(query_id + "_q"),
        F.col(corpus_id),
        F.round(cosine_similarity(F.col(vec_col), F.col("__qvec")), 6).alias("cosine"),
    )
    w = Window.partitionBy(query_id + "_q").orderBy(
        F.col("cosine").desc(), F.col(corpus_id).asc()
    )
    return (
        scored.dropDuplicates([query_id + "_q", corpus_id])
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
