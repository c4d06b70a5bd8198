"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_small_input(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Re-spread a low-partition-count input before a row-multiplying stage.

    A small local parquet arrives as 1-2 partitions, which serializes the
    downstream explode/hash-heavy stage onto one core. At production scale
    the input already carries >= cores partitions and this is a no-op — no
    shuffle is ever added to a well-partitioned 100 TB scan.
    """
    spark = df.sparkSession
    target = min_parts or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
