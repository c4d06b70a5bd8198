"""Object-store / filesystem catalog scans (SURVEY.md §2.1, S1-S7, S15).

The reference hand-rolls paginated boto3 listings (train/common/dataset.py:
83-164) and per-image GETs (dataset.py:271-281). Spark-first replacement: the
``binaryFile`` source — distributed listing + fetch, partition coalescing for
many small objects, pathGlobFilter pushdown of the extension predicate into
the listing itself. The same code path serves s3a:// at cluster scale and
file:// in tests.

At 100 TB: lay data out as ``difficulty=easy/gender=female/...`` so these
become partition columns and difficulty filters prune at the manifest level
instead of listing everything (SURVEY.md §4.2).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from experimentsplan_datapipeline_spark.functions.strings import (
    basename,
    image_type_from_name,
    stem_from_name,
)
from experimentsplan_datapipeline_spark.operators.filters import classify_by_substring

IMAGE_GLOB = "*.{png,jpg,jpeg,bmp}"


def scan_catalog(
    spark: SparkSession,
    paths: str | Sequence[str],
    glob: str | None = None,
    with_content: bool = False,
) -> DataFrame:
    """S1/S2/S15: recursive catalog scan -> (path, modificationTime, length[, content]).

    ``glob`` pushes the suffix predicate into the listing (the Spark
    equivalent of filtering keys during pagination, dataset.py:130).
    ``with_content=False`` keeps the scan listing-only (content column
    dropped -> Spark skips the GETs entirely).
    """
    if isinstance(paths, str):
        paths = [paths]
    reader = spark.read.format("binaryFile").option("recursiveFileLookup", "true")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(list(paths))
    if not with_content:
        df = df.drop("content")
    return df


def catalog_with_keys(files: DataFrame, path_col: str = "path") -> DataFrame:
    """Annotate a catalog with the reference's filename-convention keys:
    stem, image_type, difficulty (dataset.py:112-178)."""
    name = basename(path_col)
    out = files.withColumn("file_name", name).withColumn(
        "stem", stem_from_name(F.col("file_name"))
    ).withColumn("image_type", image_type_from_name(F.col("file_name")))
    return classify_by_substring(
        out, path_col,
        [("/easy/", "easy"), ("/medium/", "medium"), ("/hard/", "hard")],
        default="easy", out_col="difficulty",
    )


def read_pairs_file(spark: SparkSession, path: str) -> DataFrame:
    """S5: whitespace-delimited pairs file -> (person_id, garment_id).

    Reference: train_pairs.txt (train/train_CATVTON/dataloader.py:36-48).
    Blank/malformed lines are dropped explicitly (the reference silently
    substitutes dummy pairs on failure — we surface the drop as a filter).
    """
    raw = spark.read.text(path)
    parts = F.split(F.trim(F.col("value")), r"\s+")
    return (
        raw.filter(F.length(F.trim(F.col("value"))) > 0)
        .select(
            parts.getItem(0).alias("person_id"),
            parts.getItem(1).alias("garment_id"),
        )
        .filter(F.col("garment_id").isNotNull())
    )


def read_labels_file(spark: SparkSession, path: str) -> DataFrame:
    """S6: ``image_path class_id`` -> (image_path string, label long)
    (train/train_DIT/dataloader.py:31-48)."""
    raw = spark.read.text(path)
    parts = F.split(F.trim(F.col("value")), r"\s+")
    return raw.filter(F.length(F.trim(F.col("value"))) > 0).select(
        parts.getItem(0).alias("image_path"),
        parts.getItem(1).cast("long").alias("label"),
    )


def read_json_results(
    spark: SparkSession, glob_path: str,
    model_pattern: str = r"([^/]+)_metrics\.json$",
    bench_pattern: str = r"/([^/]+)/[^/]+$",
) -> DataFrame:
    """S9: glob-read ``*_metrics.json`` across benchmark dirs, recovering
    (model, benchmark) from the file path (metrics_all_benchmarks.sh:52-109).
    """
    df = spark.read.option("multiLine", "true").json(glob_path)
    fname = F.input_file_name()
    return df.withColumn(
        "model", F.regexp_extract(fname, model_pattern, 1)
    ).withColumn("benchmark", F.regexp_extract(fname, bench_pattern, 1))
