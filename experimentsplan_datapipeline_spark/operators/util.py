"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


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


def zorder_key(x: Column | str, y: Column | str, bits: int = 8) -> Column:
    """Morton (Z-order) interleaved key over two integer dimensions.

    Bit i of ``x`` lands at position 2i, bit i of ``y`` at 2i+1, so rows
    close in BOTH dimensions get close keys. Sorting/range-partitioning a
    table by this key before writing gives every file a tight min/max
    envelope in both columns at once — the multi-dimensional file-skipping
    layout (Delta/Iceberg OPTIMIZE ZORDER does exactly this); a sort by
    either raw column alone clusters only that column. Pure integer
    bit-arithmetic, whole-stage codegen, no shuffle beyond the final sort.
    Inputs must already be reduced to ``bits`` bits (mask or quantile-rank
    first).
    """
    xc = F.col(x) if isinstance(x, str) else x
    yc = F.col(y) if isinstance(y, str) else y
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(xc.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(
                F.shiftright(yc.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i + 1
            )
        )
    return z
