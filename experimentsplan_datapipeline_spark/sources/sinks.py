"""Sinks (SURVEY.md §2.1, S8, S10-S13).

The reference's artifact lifecycle: JSON metric documents (metrics.py:473-477),
checkpoint files written twice — a step-versioned copy plus a 'latest'
overwrite — with async S3 upload (train/train_CATVTON/utils.py:8-54,
train/common/s3_utils.py:20-40). Spark-first: partitioned writes are already
task-parallel and asynchronous wrt the driver; 'latest' is an overwrite of a
small summary location, never of the versioned history.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _fs_and_path(root: str):
    """Resolve a destination root to a (pyarrow FileSystem, path) pair.

    Executor-side tasks can't reach the JVM Hadoop FileSystem (Python
    workers have no py4j gateway), so the binary sinks use pyarrow.fs for
    the same scheme-agnostic abstraction: a bare path or file:// URI maps
    to LocalFileSystem, s3://bucket/prefix to S3FileSystem, hdfs:// to
    HadoopFileSystem — one writer code path for all of them (SCALE.md
    "Object-store recipe"). Note Spark READS use the s3a:// scheme; the
    pyarrow write side spells the same bucket s3://."""
    from pyarrow import fs as pafs

    if "://" in root:
        return pafs.FileSystem.from_uri(root)
    return pafs.LocalFileSystem(), os.path.abspath(root)


def write_json_results(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S8: JSON results sink. One file per partition; coalesce(1) only for
    tiny summary documents (a deliberate driver-side funnel, never for data).
    """
    df.coalesce(1).write.mode(mode).json(path)


def read_back_json(spark: SparkSession, path: str) -> DataFrame:
    """Round-trip reader for S8 outputs."""
    return spark.read.json(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """CSV results sink: header on, quote='"' with escape='"' — RFC-4180
    doubled-quote style (deliberately NOT Spark's default backslash
    escape) so embedded delimiters and quotes round-trip with any
    RFC-compliant reader, including read_back_csv. One file per
    partition — task-parallel like any columnar write; CSV is an
    interchange surface here (reports, spreadsheet handoff), parquet
    remains the data path.
    """
    df.write.mode(mode).option("header", "true").option("escape", '"').csv(path)


def read_back_csv(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """Round-trip reader for CSV outputs with an EXPLICIT schema string —
    never ``inferSchema`` at scale (inference is a full extra pass over
    the files, and a sampled guess besides). ``escape='"'`` matches the
    writer (RFC-4180 doubled-quote style).
    """
    return (
        spark.read.schema(schema)
        .option("header", "true")
        .option("escape", '"')
        .csv(path)
    )


def write_versioned_with_latest(
    df: DataFrame, root: str, version: int | str, version_col: str = "step"
) -> None:
    """S11: checkpoint-style sink — versioned dir + 'latest' overwrite.

    ``{root}/step={N}/`` accumulates history (append-only, partition-pruned
    reads); ``{root}/latest/`` is atomically replaced. The reference's
    background-upload thread becomes Spark's own task-parallel write; the
    dual local+S3 write becomes two .write calls if needed.
    """
    df.write.mode("overwrite").parquet(os.path.join(root, f"{version_col}={version}"))
    df.write.mode("overwrite").parquet(os.path.join(root, "latest"))


def discover_latest_version(
    spark: SparkSession, root: str, version_col: str = "step"
) -> int | None:
    """S11 read side: top-1-by-version discovery over the directory layout
    (the W2 regex-extract shape, but on partition names).

    Listing goes through the Hadoop FileSystem API, so ANY scheme the
    cluster can reach works — local paths, hdfs://, s3a:// — where a plain
    ``os.listdir`` would silently see nothing on object stores. Returns
    None only when the root genuinely doesn't exist."""
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(root)
    fs = path.getFileSystem(hconf)
    if not fs.exists(path):
        return None
    versions = []
    for status in fs.listStatus(path):
        name = status.getPath().getName()
        if name.startswith(f"{version_col}="):
            try:
                versions.append(int(name.split("=", 1)[1]))
            except ValueError:
                pass  # foreign dir like step=tmp: not a version
    return max(versions) if versions else None


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int = 16,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed (and optionally sorted) managed table.

    Pays the shuffle ONCE at write time; every later join or aggregation on
    the bucket key against a co-bucketed table runs with zero exchanges
    (asserted in tests/test_plans.py). At 100 TB this is the difference
    between re-shuffling the fact table per query and never shuffling it —
    bucket the big tables on their primary join key at ingest.
    """
    spark = df.sparkSession
    if not spark.catalog.tableExists(table_name):
        # the in-memory catalog is session-scoped but the warehouse dir is
        # not: a dir left by a previous session blocks saveAsTable
        warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
        loc = os.path.join(warehouse.removeprefix("file:"), table_name.lower())
        if os.path.isdir(loc):
            import shutil

            shutil.rmtree(loc)
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table_name)


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Partition-column layout: `.../col=value/` directories.

    The engine-side replacement for the reference's manual prefix selection
    (difficulty/gender prefixes chosen before scan,
    train/train_CATVTON/dataloader.py:150-172): equality filters on the
    partition columns prune whole directories at plan time
    (PartitionFilters in the scan), so a 100 TB catalog read touches only
    the selected slices.
    """
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def copy_tree(
    spark: SparkSession,
    src_root: str,
    dst_root: str,
    exclude_suffixes: tuple[str, ...] = (),
    path_glob: str | None = None,
) -> int:
    """S12/S13: bulk recursive tree copy with exclusion — the distributed
    form of the reference's directory upload-with-ignore and prefix download
    loops (paginated listings + per-object GET/PUT in a driver thread).

    Listing + fetch run as ONE distributed binaryFile scan: every executor
    copies its own partition's files, relative paths preserved under
    ``dst_root``. ``path_glob`` pushes an INCLUDE pattern into the listing
    itself (pruned before any byte moves); ``exclude_suffixes`` drops
    matches after listing (the upload-side ignore list). Returns the number
    of files copied. Local/NFS destinations write directly; an object-store
    destination takes the same plan with the per-partition writer swapped
    for the store's client.
    """
    reader = (
        spark.read.format("binaryFile").option("recursiveFileLookup", "true")
    )
    if path_glob:
        reader = reader.option("pathGlobFilter", path_glob)
    files = reader.load(src_root)
    for sfx in exclude_suffixes:
        files = files.filter(~F.col("path").endswith(sfx))
    # normalize the SOURCE root the same way the path column is normalized:
    # a file:/ or file:/// src_root strips to its local path, a non-local
    # scheme (s3a://...) keeps its full URI prefix — binaryFile reports
    # paths in the same spelling, so the anchored strip below matches
    src_norm = re.sub(r"^file:/{0,2}(?=/)", "", src_root)
    src_abs = src_norm.rstrip("/") if "://" in src_norm else os.path.abspath(src_norm)
    # both patterns ANCHORED: binaryFile may report file:/ or file:/// URI
    # forms, so normalize the scheme+slashes prefix first, then strip the
    # source root only at the string START — an un-anchored replace could
    # leave rel absolute (symlinked roots, non-local schemes) and
    # the join below would then silently discard dst_root
    rel = F.regexp_replace(
        F.regexp_replace("path", "^file:/{0,2}(?=/)", ""),
        "^" + re.escape(src_abs) + "/?",
        "",
    )
    to_copy = files.select(rel.alias("rel"), "content")

    def write_partition(rows) -> None:
        fs, root = _fs_and_path(dst_root)
        made: set[str] = set()
        for r in rows:
            if r["rel"].startswith("/") or ".." in r["rel"].split("/"):
                raise ValueError(f"path escapes destination: {r['rel']!r}")
            target = root.rstrip("/") + "/" + r["rel"]
            parent = target.rsplit("/", 1)[0]
            if parent not in made:
                fs.create_dir(parent, recursive=True)
                made.add(parent)
            with fs.open_output_stream(target) as f:
                f.write(bytes(r["content"]))

    fs0, root0 = _fs_and_path(dst_root)
    fs0.create_dir(root0, recursive=True)
    to_copy.foreachPartition(write_partition)
    return to_copy.count()


def write_binary_files(
    df: DataFrame, out_dir: str, name_col: str = "name", content_col: str = "content"
) -> None:
    """S10: per-row binary artifact sink — each row's content bytes land in
    ``{out_dir}/{name}`` (the reference saves generated PNGs named
    ``{stem}_result.png`` in a driver loop, train/train_CATVTON/
    inference.py:210-213; here every executor writes its own partition's
    files in parallel). Names must be bare filenames — separators are
    rejected so a crafted name cannot escape the sink directory. The writer
    goes through pyarrow.fs (_fs_and_path), so a file://, s3:// or hdfs://
    ``out_dir`` takes the identical partition layout.
    """
    fs0, root0 = _fs_and_path(out_dir)
    fs0.create_dir(root0, recursive=True)

    def write_partition(rows) -> None:
        fs, root = _fs_and_path(out_dir)
        for r in rows:
            name = r[name_col]
            if "/" in name or os.sep in name or name in (".", ".."):
                raise ValueError(f"not a bare filename: {name!r}")
            with fs.open_output_stream(root.rstrip("/") + "/" + name) as f:
                f.write(bytes(r[content_col]))

    df.select(name_col, content_col).foreachPartition(write_partition)


def compact_zorder(
    df: DataFrame,
    out_path: str,
    x_col,
    y_col,
    n_files: int = 8,
    bits: int = 8,
) -> None:
    """Compaction + multi-dimensional clustering sink: rewrite a dataset
    into ``n_files`` parquet files ordered by the Morton (Z-order) key of
    two integer dimensions (``operators/util.py::zorder_key``).

    Why it matters at 100 TB: a small-file-ridden or insert-ordered table
    answers a 2-D box predicate (user range x time range) by scanning
    almost every row group, because each file's min/max stats straddle the
    whole domain of at least one column. Range-partitioning + sorting by
    the interleaved key gives EVERY file a tight min/max envelope in BOTH
    columns at once — the parquet reader then prunes row groups on either
    predicate. This is the Delta/Iceberg `OPTIMIZE ZORDER BY` maintenance
    pass as a plain DataFrame write: one range shuffle (sampled
    boundaries, balanced output files) + an in-partition sort, no driver
    collect. ``x_col``/``y_col`` must already be reduced to ``bits`` bits
    (mask or bucketize first — zorder_key's contract); the temporary key
    column never reaches the files.
    """
    from experimentsplan_datapipeline_spark.operators.util import zorder_key

    keyed = df.withColumn("__z", zorder_key(x_col, y_col, bits))
    (
        keyed.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(out_path)
    )


def export_training_shards(
    df,
    path: str,
    id_col: str,
    text_col: str,
    seqs_per_shard: int = 1000,
    checksum_seed: int = 77,
):
    """Training-data EXPORT: the pipeline's last mile — write the curated
    corpus as deterministic fixed-size shards with a verifiable
    manifest, which is what a trainer's dataloader actually consumes
    (the reference reads its datasets as pre-sharded files chosen by
    prefix, train/train_CATVTON/dataloader.py:150-172; this is the
    engine-side producer of such a layout).

    Sharding is DETERMINISTIC and engine-replayable: docs rank by id
    through the distributed ``ordered_rank`` (range partition +
    broadcast offsets — no single-task window at any corpus size) and
    shard = (rank - 1) // seqs_per_shard, so shard membership is a pure
    function of the id set — re-running the export reproduces identical
    shards byte-for-byte content-wise. Files land as a
    ``shard=N/`` partition layout (partition pruning serves a trainer
    that wants shards K..K+m).

    Returns the MANIFEST DataFrame computed from the WRITTEN data (read
    back, not from the input plan): per shard — n_seqs, n_tokens, and an
    order-insensitive content checksum (sum of per-row portable md5
    hashes mod 1e9+7, exact in 64-bit on both engines) — so a checksum
    match proves the files on disk carry exactly the intended rows.
    """
    from experimentsplan_datapipeline_spark.functions.text import token_count
    from experimentsplan_datapipeline_spark.operators.curation import (
        portable_hash,
    )
    from experimentsplan_datapipeline_spark.operators.sampling import (
        ordered_rank,
    )

    spark = df.sparkSession
    ranked = ordered_rank(
        df.select(id_col, text_col), [id_col], rank_col="__rk"
    )
    sharded = ranked.select(
        id_col,
        text_col,
        ((F.col("__rk") - 1) / seqs_per_shard).cast("long").alias("shard"),
    )
    write_partitioned(sharded, path, ["shard"])
    back = spark.read.parquet(path)
    return (
        back.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_seqs"),
            F.sum(token_count(text_col)).alias("n_tokens"),
            F.sum(
                F.pmod(
                    portable_hash([id_col, text_col], checksum_seed),
                    F.lit(1_000_000_007),
                )
            ).alias("content_checksum"),
        )
    )
