"""SparkSession construction with scale-aware defaults.

The reference builds its "session" implicitly (boto3 clients created lazily
per worker, train/common/dataset.py:73-81). Here the session is explicit and
carries the engine-wide tuning:

- AQE on: runtime coalescing of shuffle partitions, skew-join splitting.
- Arrow on: every Pandas UDF / toPandas crosses the JVM<->Python boundary in
  columnar batches instead of pickled rows.
- shuffle.partitions sized to cores locally; on a real cluster this should be
  ~2-3x total executor cores (AQE coalesces the excess).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_session(
    app_name: str = "experimentsplan-datapipeline-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    Local test runs use ``local[$SPARK_GRAFT_CPUS]``; cluster deployments pass
    ``master=None`` and let spark-submit decide.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    # In local mode the driver JVM hosts every executor thread, and Spark's
    # default heap is 1g — 32 concurrent tasks in 1g means constant GC and
    # spurious OOMs on join builds. Size it like a worker node. (Takes
    # effect only at JVM launch; a getOrCreate() against a live session
    # keeps that session's heap.)
    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.driver.memory", driver_mem)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # coalesce to the advisory size rather than defending parallelism:
        # the Spark-documented production setting; locally it cuts tiny-task
        # scheduling overhead ~30% on sub-GB shuffles
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # parquet scans: prune + push down aggressively
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # deterministic timestamp behavior across engines
        .config("spark.sql.session.timeZone", "UTC")
        # many-small-files catalogs: pack up to 128MB per input partition
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # some events.parquet vintages carry TIMESTAMP(NANOS), readable only
        # as long under this conf; plans.queries._normalize_events_ts then
        # adapts to whatever dtype the file actually yields
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    if master is None:
        master = f"local[{cpus}]"
    builder = builder.master(master)
    n_shuffle = shuffle_partitions
    if n_shuffle is None:
        n_shuffle = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
    builder = builder.config("spark.sql.shuffle.partitions", str(n_shuffle))
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, "SparkSession"]:
    """Load every parquet table under ``sf_dir`` and register temp views.

    Returns {name: DataFrame}. Mirrors the driver's DuckDB view registration
    so ``spark.sql`` text and oracle SQL run against identical relations.
    """
    names = [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]
    # some events.parquet vintages carry TIMESTAMP(NANOS); the conf is
    # settable at runtime, so foreign (driver-built) sessions work too
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    out = {}
    for name in names:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            df = spark.read.parquet(path)
            if name == "events":
                from experimentsplan_datapipeline_spark.plans.queries import (
                    _normalize_events_ts,
                )

                df = _normalize_events_ts(df)
            df.createOrReplaceTempView(name)
            out[name] = df
    return out
