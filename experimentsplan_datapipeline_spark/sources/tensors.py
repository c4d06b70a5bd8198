"""NumPy ``.npy`` tensor source (SURVEY.md §2 S7).

The reference loads pose/cloth tensors with ``np.load`` per sample
(train/train_OOTDiffusion/dataloader.py:75-83). Spark-first: the files are
listed and fetched distributed by the ``binaryFile`` source, and each
payload's npy header is parsed inside a mapInPandas pass — Arrow batches of
(path, dtype, shape, flat float64 values), never a driver-side loop.

Header parsing uses the public npy format (numpy.lib.format): magic
``\\x93NUMPY``, version, little-endian header length, then a Python-literal
dict ``{'descr', 'fortran_order', 'shape'}`` followed by raw data.
``allow_pickle=False`` — object arrays are rejected, so untrusted payloads
can't execute anything.
"""

from __future__ import annotations

import io
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

NPY_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("dtype", StringType()),
        StructField("shape", ArrayType(IntegerType())),
        StructField("values", ArrayType(DoubleType())),
    ]
)


def parse_npy(content: bytes) -> tuple[str, list[int], list[float]]:
    """One npy payload -> (dtype string, shape, flat float64 values)."""
    arr = np.load(io.BytesIO(bytes(content)), allow_pickle=False)
    return (
        str(arr.dtype),
        list(arr.shape),
        arr.astype(np.float64).reshape(-1).tolist(),
    )


def npy_bytes(arr: "np.ndarray") -> bytes:
    """Inverse helper (tests, sinks): array -> npy file bytes."""
    buf = io.BytesIO()
    np.save(buf, arr, allow_pickle=False)
    return buf.getvalue()


def decode_npy(files: DataFrame, content_col: str = "content") -> DataFrame:
    """binaryFile rows -> parsed tensor rows (path, dtype, shape, values)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf[content_col]):
                dtype, shape, values = parse_npy(content)
                rows.append(
                    {"path": path, "dtype": dtype, "shape": shape, "values": values}
                )
            yield pd.DataFrame(
                rows, columns=["path", "dtype", "shape", "values"]
            )

    return files.select("path", content_col).mapInPandas(run, schema=NPY_SCHEMA)


def read_npy(
    spark: SparkSession, root: str, recursive: bool = True
) -> DataFrame:
    """S7: scan ``root`` for ``*.npy`` and parse each into a tensor row.

    Listing+fetch is the distributed binaryFile source (predicate
    ``pathGlobFilter`` prunes at listing time, before any byte moves);
    parsing is Arrow-batched. At 100 TB the parallelism is one task per
    file-split group, same as any other scan.
    """
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.npy")
        .option("recursiveFileLookup", str(recursive).lower())
        .load(root)
    )
    return decode_npy(files)
