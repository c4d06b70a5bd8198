"""Streaming pipeline over a step-keyed event/metric stream (SURVEY.md §2.9).

Reference behaviors mapped (file:line into /root/reference):
- T1 step-keyed append log  (wandb.log(step=...), train/train_stage_1/train.py:91)
- T2 periodic N-step triggers (train.py:95-117; intervals train/train_CATVTON/config.py:18-21)
- T3 resume-from-checkpoint   (checkpointLocation recovery)
- T4 EMA over the step stream (train/train_DIT/utils.py:19-25)
- T5 async sink               (foreachBatch)
- T6 late-data handling       (watermark + drop, surfaced not silent)

All functions take/return (streaming) DataFrames, so the same logical plan
runs batch (tests, backfills) and streaming (incremental) — the Spark analogue
of the reference running the same metric code online and offline.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def windowed_metrics(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """T1+T2+T6: watermarked tumbling/sliding window aggregation.

    Watermark bounds state: rows later than ``watermark`` behind the max seen
    event time are dropped by the engine (the reference's drop-with-log,
    dataset.py:158-159, made a declarative property). Append output mode
    emits each window once, when the watermark passes its end.
    """
    wm = events.withWatermark(ts_col, watermark)
    w = (
        F.window(ts_col, window, slide)
        if slide
        else F.window(ts_col, window)
    )
    return wm.groupBy(F.col(key_col), w.alias("w")).agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(value_col).alias("avg_value"),
        F.max(value_col).alias("max_value"),
    )


def step_interval_windows(
    events: DataFrame, interval: int, step_col: str = "step",
    key_col: str = "run_id", value_col: str = "value",
) -> DataFrame:
    """T2 (step domain): every-N-steps periodic aggregation.

    The reference triggers side effects on ``step % N == 0``; relationally
    that is a tumbling window over the step axis: bucket = floor(step/N).
    Works identically on batch and streaming frames.
    """
    bucket = (F.floor(F.col(step_col) / interval) * interval).alias("step_bucket")
    return events.groupBy(F.col(key_col), bucket).agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(value_col).alias("avg_value"),
        F.max(step_col).alias("last_step"),
    )


_EMA_STATE_SCHEMA = StructType([StructField("s", DoubleType())])
_EMA_OUT_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("n_updates", LongType()),
        StructField("ema", DoubleType()),
    ]
)


def ema_stream(
    events: DataFrame,
    decay: float = 0.9999,
    key_col: str = "event_type",
    order_col: str | list[str] = "ts",
    value_col: str = "value",
) -> DataFrame:
    """T4: stateful EMA over a keyed stream via applyInPandasWithState.

    s <- (1-d)*x + d*s per arriving value (order within a micro-batch by
    ``order_col``); state is one double per key — O(keys) memory regardless
    of stream length. A key's rows can arrive split across several Arrow
    chunks, so the micro-batch is concatenated before the one sort — sorting
    chunks independently would interleave out of order. Batch twin:
    operators/aggregates.py::ema (the oracle-checked form).
    """
    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (s,) = state.get if state.exists else (None,)
        n = 0
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            batch = pd.concat(chunks).sort_values(order_cols)
            for x in batch[value_col]:
                s = float(x) if s is None else (1.0 - decay) * float(x) + decay * s
                n += 1
        state.update((s,))
        yield pd.DataFrame({"key": [key[0]], "n_updates": [n], "ema": [s]})

    return events.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=_EMA_OUT_SCHEMA,
        stateStructType=_EMA_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_stats_tws_stream(
    events: DataFrame, key_col: str = "event_type", value_col: str = "value"
) -> DataFrame:
    """T7: per-key running stats on the Spark 4 arbitrary-state API
    (``transformWithStateInPandas`` + ``StatefulProcessor`` /
    ``ValueState``) — the successor to ``applyInPandasWithState`` that
    ``ema_stream`` uses, demonstrated here so the engine exercises BOTH
    stateful surfaces. State per key: (n, total, mn, mx) — O(keys)
    regardless of stream length; each micro-batch folds its Arrow chunks
    into the state and emits the updated row. Batch twin: a plain
    groupBy aggregation (the oracle). n/min/max are exact; total is a
    float fold, so consumers round it (the registered query rounds to 2).
    """
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    state_schema = StructType(
        [
            StructField("n", LongType()),
            StructField("total", DoubleType()),
            StructField("mn", DoubleType()),
            StructField("mx", DoubleType()),
        ]
    )
    out_schema = StructType(
        [
            StructField("key", StringType()),
            StructField("n", LongType()),
            StructField("total", DoubleType()),
            StructField("mn", DoubleType()),
            StructField("mx", DoubleType()),
        ]
    )

    class RunningStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("stats", state_schema)

        def handleInputRows(self, key, rows, timerValues):
            n, total, mn, mx = (
                self._state.get() if self._state.exists() else (0, 0.0, None, None)
            )
            for pdf in rows:
                if not len(pdf):
                    continue
                v = pdf[value_col].astype(float)
                n += int(len(v))
                total += float(v.sum())
                bmn, bmx = float(v.min()), float(v.max())
                mn = bmn if mn is None else min(mn, bmn)
                mx = bmx if mx is None else max(mx, bmx)
            self._state.update((n, total, mn, mx))
            yield pd.DataFrame(
                {"key": [key[0]], "n": [n], "total": [total],
                 "mn": [mn], "mx": [mx]}
            )

        def close(self) -> None:
            pass

    return events.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=RunningStats(),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )


def _rename_latest(fs, h_tmp, h_latest) -> None:
    """The final rename of the snapshot swap — module-level so the
    crash-injection test can make it raise once, simulating a writer killed
    between delete(latest) and rename(tmp, latest)."""
    fs.rename(h_tmp, h_latest)


def _swap_latest(fs, h_tmp, h_latest) -> None:
    """Swap window of the atomic latest/ publish: delete the old snapshot,
    rename the complete tmp into place. Separated from write_batch so tests
    can inject a crash inside the window (the recovery is the _SUCCESS-probe
    promotion at the top of write_batch)."""
    if fs.exists(h_latest):
        fs.delete(h_latest, True)
    _rename_latest(fs, h_tmp, h_latest)


def checkpointed_metrics_sink(
    windowed: DataFrame,
    out_root: str,
    checkpoint_dir: str,
    query_name: str = "metrics_sink",
    key_cols: tuple[str, ...] = ("event_type", "window_start", "window_end"),
):
    """T3+T5: foreachBatch sink writing versioned batches + a 'latest'
    SNAPSHOT.

    Each micro-batch appends under ``batch={id}``; ``latest/`` is the full
    current state, maintained by merge-upserting the micro-batch into the
    previous snapshot (operators.joins.merge_upsert, last-write-wins on
    ``key_cols``). Update output mode emits only CHANGED keys per batch, so a
    plain overwrite of latest/ would leave readers a partial state — the
    upsert keeps it whole. The reference's dual checkpoint write
    (train/train_CATVTON/utils.py:39-40) with exactly-once bookkeeping from
    ``checkpointLocation`` (resume = T3: restarting with the same checkpoint
    dir skips completed batches).

    ``key_cols`` defaults to the windowed-metrics identity; keys absent from
    the batch schema are ignored so the same sink serves unwindowed keyed
    streams.
    """
    from experimentsplan_datapipeline_spark.operators.joins import merge_upsert

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        # watermark-advance batches are empty; they must not clobber 'latest'
        if batch_df.isEmpty():
            return
        flat = batch_df
        if "w" in batch_df.columns:
            flat = batch_df.withColumn("window_start", F.col("w.start")).withColumn(
                "window_end", F.col("w.end")
            ).drop("w")
        flat.write.mode("overwrite").parquet(os.path.join(out_root, f"batch={batch_id}"))
        latest_path = os.path.join(out_root, "latest")
        tmp_path = os.path.join(out_root, "latest.tmp")
        spark = flat.sparkSession
        keys = [c for c in key_cols if c in flat.columns]
        # foreachBatch runs driver-side, so the Hadoop FS existence probe is
        # available — a blind try/except here would also swallow REAL read
        # errors and silently publish a partial latest/
        jvm = spark.sparkContext._jvm
        hadoop_path = jvm.org.apache.hadoop.fs.Path
        h_latest, h_tmp = hadoop_path(latest_path), hadoop_path(tmp_path)
        fs = h_latest.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
        # crash recovery: a prior run may have died between delete(latest)
        # and rename(tmp, latest) — a COMPLETE tmp (has _SUCCESS) is the
        # accumulated state; promote it before merging, or the replayed
        # batch would publish only its own keys as the "full snapshot"
        if not fs.exists(h_latest) and fs.exists(
            hadoop_path(os.path.join(tmp_path, "_SUCCESS"))
        ):
            fs.rename(h_tmp, h_latest)
        snapshot = flat
        if fs.exists(h_latest):
            base = spark.read.parquet(latest_path)
            if keys and set(base.columns) == set(flat.columns):
                snapshot = merge_upsert(base, flat, keys)
        # atomic publish: write the merged snapshot BESIDE latest/ (so the
        # plan can still read latest's files), then swap via delete+rename.
        # At every instant latest/ is either the old complete snapshot or
        # the new one; a crash mid-tmp-write leaves latest/ untouched, and
        # a crash inside the swap window is healed by the promotion above.
        snapshot.write.mode("overwrite").parquet(tmp_path)
        _swap_latest(fs, h_tmp, h_latest)

    return (
        windowed.writeStream.foreachBatch(write_batch)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
    )


def run_available_now(writer, timeout_sec: float = 120.0) -> None:
    """Drain everything currently available, then stop (the batch-like
    trigger used in tests and backfills; W8's bounded-run analogue)."""
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination(timeout_sec)
    if q.isActive:
        q.stop()


def sessionized_metrics(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """T2 (session domain): gap-based session windows with bounded state.

    ``session_window`` merges events closer than ``gap`` into one window
    per key; the watermark lets the engine finalize (and drop state for)
    sessions once no in-gap extension can still arrive. Same logical plan
    runs batch — the oracle twin is the gaps-and-islands rewrite
    (plans/queries.py::events_session).
    """
    wm = events.withWatermark(ts_col, watermark)
    return wm.groupBy(
        F.col(key_col), F.session_window(ts_col, gap).alias("w")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg(value_col), 6).alias("avg_value"),
    )


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    within: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked stream-stream join: right events within ``(left.ts,
    left.ts + within]`` of a same-key left event (the funnel shape —
    view -> purchase within the attribution window — as a LIVE join).

    Both sides carry watermarks and the join condition bounds the time
    range in BOTH directions, so Spark can size the state store and evict
    rows once they can no longer match — without the range bound,
    stream-stream state grows forever. Batch twin:
    operators/joins.py::range_join_banded (events_funnel's oracle shape).
    """
    l = left.withWatermark(ts_col, watermark).alias("l")
    r = right.withWatermark(ts_col, watermark).alias("r")
    cond = (
        (F.col(f"l.{key_col}") == F.col(f"r.{key_col}"))
        & (F.col(f"r.{ts_col}") > F.col(f"l.{ts_col}"))
        & (F.col(f"r.{ts_col}") <= F.col(f"l.{ts_col}") + F.expr(f"INTERVAL {within}"))
    )
    return l.join(r, cond, "inner").select(
        F.col(f"l.{key_col}").alias(key_col),
        F.col(f"l.{ts_col}").alias("left_ts"),
        F.col(f"r.{ts_col}").alias("right_ts"),
        *[
            F.col(f"l.{c}").alias(f"left_{c}")
            for c in left.columns
            if c not in (key_col, ts_col)
        ],
        *[
            F.col(f"r.{c}").alias(f"right_{c}")
            for c in right.columns
            if c not in (key_col, ts_col)
        ],
    )


def streaming_dedup(
    events: DataFrame,
    id_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact-dedup at ingest: drop re-deliveries of the same key.

    ``dropDuplicatesWithinWatermark`` keeps per-key state only within the
    watermark horizon — bounded memory on an unbounded stream (a plain
    dropDuplicates on a stream grows state forever). The batch twin is
    ``operators/dedup.py::exact_dedup``; at 100 TB/day this is the first
    tier of the dedup cascade, running before anything lands.
    """
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        id_cols
    )
