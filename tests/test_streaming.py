"""Structured Streaming: windows + watermark, stateful EMA, checkpointed
sink with resume. Driven through a file stream (deterministic) with
availableNow triggers."""

from __future__ import annotations

import datetime
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from experimentsplan_datapipeline_spark.streaming.events import (
    checkpointed_metrics_sink,
    ema_stream,
    run_available_now,
    step_interval_windows,
    windowed_metrics,
)

SCHEMA = StructType(
    [
        StructField("ts", TimestampType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)


def _write_chunk(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(path)


def _ts(minute, second=0):
    return datetime.datetime(2024, 1, 1, 10, minute, second)


@pytest.fixture()
def stream_dir(spark, tmp_path):
    src = str(tmp_path / "src")
    _write_chunk(
        spark,
        src,
        [
            (_ts(0), "loss", 1.0),
            (_ts(1), "loss", 2.0),
            (_ts(5), "loss", 3.0),
            (_ts(6), "lr", 0.1),
        ],
    )
    return src


def test_windowed_metrics_stream(spark, stream_dir, tmp_path):
    stream = spark.readStream.schema(SCHEMA).parquet(stream_dir)
    windowed = windowed_metrics(stream, window="5 minutes", watermark="10 minutes")
    out_root = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    run_available_now(checkpointed_metrics_sink(windowed, out_root, ckpt))
    latest = spark.read.parquet(os.path.join(out_root, "latest"))
    got = {
        (r.event_type, r.window_start.minute): (r.n, r.avg_value)
        for r in latest.collect()
    }
    assert got[("loss", 0)] == (2, 1.5)
    assert got[("loss", 5)] == (1, 3.0)
    assert got[("lr", 5)] == (1, 0.1)


def test_checkpoint_resume_skips_processed(spark, stream_dir, tmp_path):
    """T3: restarting with the same checkpointLocation only processes NEW
    chunks; reprocessing would double-write batch dirs."""
    stream = spark.readStream.schema(SCHEMA).parquet(stream_dir)
    windowed = windowed_metrics(stream, window="5 minutes", watermark="10 minutes")
    out_root = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    run_available_now(checkpointed_metrics_sink(windowed, out_root, ckpt))
    n_batches_first = len([d for d in os.listdir(out_root) if d.startswith("batch=")])

    # new data arrives; resume from the same checkpoint
    _write_chunk(spark, stream_dir, [(_ts(11), "loss", 5.0)])
    stream2 = spark.readStream.schema(SCHEMA).parquet(stream_dir)
    windowed2 = windowed_metrics(stream2, window="5 minutes", watermark="10 minutes")
    run_available_now(checkpointed_metrics_sink(windowed2, out_root, ckpt))

    latest = spark.read.parquet(os.path.join(out_root, "latest"))
    rows = {(r.event_type, r.window_start.minute) for r in latest.collect()}
    assert ("loss", 10) in rows  # the new window arrived
    # latest/ is a SNAPSHOT: update-mode batches carry only changed keys, but
    # the merge-upsert must keep every previously published window visible
    assert ("loss", 0) in rows
    assert ("loss", 5) in rows
    assert ("lr", 5) in rows
    n_batches_second = len([d for d in os.listdir(out_root) if d.startswith("batch=")])
    assert n_batches_second > n_batches_first  # appended, not rewritten


def test_ema_stream_matches_batch(spark, stream_dir, tmp_path):
    """T4: streaming EMA equals the batch ordered-fold on the same data."""
    from experimentsplan_datapipeline_spark.operators.aggregates import ema as batch_ema

    stream = spark.readStream.schema(SCHEMA).parquet(stream_dir)
    out = ema_stream(stream, decay=0.9)
    q = (
        out.writeStream.format("memory")
        .queryName("ema_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_ema"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.key: r.ema
        for r in spark.sql(
            """select key, ema from (
                 select *, row_number() over (partition by key order by n_updates desc) rn
                 from ema_out) where rn = 1"""
        ).collect()
    }
    batch = spark.read.schema(SCHEMA).parquet(stream_dir)
    expected = {
        r.event_type: r.ema
        for r in batch_ema(batch, ["event_type"], "ts", "value", decay=0.9).collect()
    }
    for k, v in expected.items():
        assert abs(got[k] - v) < 1e-12, k


def test_step_interval_windows_batch_and_stream_agree(spark):
    rows = [("run1", s, 1.0 * s) for s in range(1, 21)]
    df = spark.createDataFrame(rows, ["run_id", "step", "value"])
    out = step_interval_windows(df, interval=5, step_col="step")
    got = {r.step_bucket: (r.n, r.last_step) for r in out.collect()}
    assert got[0] == (4, 4) and got[5] == (5, 9) and got[20] == (1, 20)


def test_streaming_dedup_drops_redeliveries(spark, tmp_path):
    import datetime as dt

    from experimentsplan_datapipeline_spark.streaming.events import (
        run_available_now,
        streaming_dedup,
    )

    base = dt.datetime(2026, 1, 1)
    rows = [
        (1, base, "click", 1.0),
        (1, base + dt.timedelta(minutes=1), "click", 1.0),  # re-delivery of id 1
        (2, base + dt.timedelta(minutes=2), "view", 2.0),
        (2, base + dt.timedelta(minutes=3), "view", 2.0),   # re-delivery of id 2
        (3, base + dt.timedelta(minutes=4), "click", 3.0),
    ]
    src = str(tmp_path / "src")
    spark.createDataFrame(
        rows, ["event_id", "ts", "event_type", "value"]
    ).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    deduped = streaming_dedup(stream, ["event_id"])
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_stream_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(r.event_id for r in spark.table("dedup_stream_out").collect())
    assert got == [1, 2, 3]


def test_sessionized_metrics_stream_matches_batch(spark, tmp_path):
    """Session windows computed on a live stream equal the batch run of the
    same plan (and the gaps-and-islands semantics)."""
    from experimentsplan_datapipeline_spark.streaming.events import (
        run_available_now,
        sessionized_metrics,
    )

    src = str(tmp_path / "src")
    rows = [
        (_ts(0), "loss", 1.0),
        (_ts(10), "loss", 2.0),   # within 30min gap -> same session
        (_ts(55), "loss", 3.0),   # 45min gap -> new session
        (_ts(5), "lr", 0.1),
    ]
    _write_chunk(spark, src, rows)
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    out = sessionized_metrics(stream, gap="30 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.event_type, r.w.start.minute): (r.n, r.avg_value)
        for r in spark.table("sess_out").collect()
    }
    batch = sessionized_metrics(
        spark.read.schema(SCHEMA).parquet(src), gap="30 minutes"
    )
    want = {
        (r.event_type, r.w.start.minute): (r.n, r.avg_value)
        for r in batch.collect()
    }
    assert got == want
    assert got[("loss", 0)] == (2, 1.5)
    assert got[("loss", 55)] == (1, 3.0)


def test_stream_stream_interval_join_live(spark, tmp_path):
    """Two live streams join on key + time band; result equals the batch
    join of the same frames."""
    from experimentsplan_datapipeline_spark.streaming.events import (
        stream_stream_interval_join,
    )
    from pyspark.sql.types import LongType

    schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("value", DoubleType()),
        ]
    )
    views = [
        (1, _ts(0), 0.0),
        (2, _ts(5), 0.0),
        (3, _ts(10), 0.0),
    ]
    buys = [
        (1, _ts(20), 9.0),   # within 1h of view -> match
        (2, _ts(4), 5.0),    # BEFORE the view -> no match
        (3, _ts(10), 7.0),   # equal ts -> excluded (strict >)
    ]
    vsrc, bsrc = str(tmp_path / "v"), str(tmp_path / "b")
    spark.createDataFrame(views, schema).write.parquet(vsrc)
    spark.createDataFrame(buys, schema).write.parquet(bsrc)

    vs = spark.readStream.schema(schema).parquet(vsrc)
    bs = spark.readStream.schema(schema).parquet(bsrc)
    joined = stream_stream_interval_join(vs, bs, "user_id", within="1 hour")
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_ssj"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r.user_id, r.right_value) for r in spark.table("ssj_out").collect()
    )
    assert got == [(1, 9.0)]

    batch = stream_stream_interval_join(
        spark.read.schema(schema).parquet(vsrc),
        spark.read.schema(schema).parquet(bsrc),
        "user_id",
        within="1 hour",
    )
    want = sorted((r.user_id, r.right_value) for r in batch.collect())
    assert got == want


def _latest_keys(spark, out_root):
    latest = spark.read.parquet(os.path.join(out_root, "latest"))
    return {(r.event_type, r.window_start.minute) for r in latest.collect()}


def test_snapshot_crash_between_delete_and_rename(
    spark, stream_dir, tmp_path, monkeypatch
):
    """Crash-injection for the atomic latest/ swap: kill the writer AFTER
    delete(latest) but BEFORE rename(tmp, latest) — the worst window, where
    latest/ is gone and only the complete tmp (with _SUCCESS) holds the
    accumulated state. On restart the _SUCCESS-probe promotion branch
    (streaming/events.py::write_batch) must restore it, then merge the
    replayed batch, so no previously published window is ever lost."""
    from experimentsplan_datapipeline_spark.streaming import events

    stream = spark.readStream.schema(SCHEMA).parquet(stream_dir)
    windowed = windowed_metrics(stream, window="5 minutes", watermark="10 minutes")
    out_root = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    run_available_now(checkpointed_metrics_sink(windowed, out_root, ckpt))
    assert {("loss", 0), ("loss", 5), ("lr", 5)} <= _latest_keys(spark, out_root)

    # new data arrives; the writer dies inside the swap window
    _write_chunk(spark, stream_dir, [(_ts(11), "loss", 5.0)])
    real_rename = events._rename_latest
    monkeypatch.setattr(
        events,
        "_rename_latest",
        lambda fs, t, l: (_ for _ in ()).throw(RuntimeError("injected crash")),
    )
    stream2 = spark.readStream.schema(SCHEMA).parquet(stream_dir)
    windowed2 = windowed_metrics(stream2, window="5 minutes", watermark="10 minutes")
    with pytest.raises(Exception):
        run_available_now(checkpointed_metrics_sink(windowed2, out_root, ckpt))
    # the crash window state: latest/ deleted, complete tmp left behind
    assert not os.path.exists(os.path.join(out_root, "latest"))
    assert os.path.exists(os.path.join(out_root, "latest.tmp", "_SUCCESS"))

    # restart: the replayed batch must first PROMOTE the tmp snapshot,
    # then merge itself — every old window plus the new one survives
    monkeypatch.setattr(events, "_rename_latest", real_rename)
    stream3 = spark.readStream.schema(SCHEMA).parquet(stream_dir)
    windowed3 = windowed_metrics(stream3, window="5 minutes", watermark="10 minutes")
    run_available_now(checkpointed_metrics_sink(windowed3, out_root, ckpt))
    got = _latest_keys(spark, out_root)
    assert {("loss", 0), ("loss", 5), ("lr", 5), ("loss", 10)} <= got


def test_snapshot_crash_before_delete_keeps_old_latest(
    spark, stream_dir, tmp_path, monkeypatch
):
    """Crash-injection, first window: the writer dies after writing the new
    tmp but BEFORE touching latest/ — latest must still be the old complete
    snapshot at every instant, and the restart must converge to the merged
    state without the promotion branch firing (latest still exists)."""
    from experimentsplan_datapipeline_spark.streaming import events

    stream = spark.readStream.schema(SCHEMA).parquet(stream_dir)
    windowed = windowed_metrics(stream, window="5 minutes", watermark="10 minutes")
    out_root = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    run_available_now(checkpointed_metrics_sink(windowed, out_root, ckpt))
    before = _latest_keys(spark, out_root)

    _write_chunk(spark, stream_dir, [(_ts(11), "loss", 5.0)])
    real_swap = events._swap_latest
    monkeypatch.setattr(
        events,
        "_swap_latest",
        lambda fs, t, l: (_ for _ in ()).throw(RuntimeError("injected crash")),
    )
    stream2 = spark.readStream.schema(SCHEMA).parquet(stream_dir)
    windowed2 = windowed_metrics(stream2, window="5 minutes", watermark="10 minutes")
    with pytest.raises(Exception):
        run_available_now(checkpointed_metrics_sink(windowed2, out_root, ckpt))
    # old latest untouched and still readable mid-crash
    assert _latest_keys(spark, out_root) == before

    monkeypatch.setattr(events, "_swap_latest", real_swap)
    stream3 = spark.readStream.schema(SCHEMA).parquet(stream_dir)
    windowed3 = windowed_metrics(stream3, window="5 minutes", watermark="10 minutes")
    run_available_now(checkpointed_metrics_sink(windowed3, out_root, ckpt))
    assert before | {("loss", 10)} <= _latest_keys(spark, out_root)


def test_running_stats_tws(spark, tmp_path):
    """T7: the Spark 4 arbitrary-state API (transformWithStateInPandas).
    Skips when protobuf (the API's state-server wire format) is absent —
    the operator itself is environment-bound in this sandbox, like LPIPS.
    When runnable: the drained update-mode result equals the batch
    groupBy twin exactly on n/min/max and within fp noise on total."""
    pytest.importorskip("google.protobuf")
    from experimentsplan_datapipeline_spark.streaming.events import (
        running_stats_tws_stream,
    )

    src = os.path.join(str(tmp_path), "ev")
    rows = [(k, float(v)) for k in ("a", "b") for v in range(1, 6)]
    spark.createDataFrame(rows, ["event_type", "value"]).write.parquet(src)
    stream = spark.readStream.schema("event_type string, value double").parquet(src)
    out = running_stats_tws_stream(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("tws_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    if q.isActive:
        q.stop()
    got = {r.key: (r.n, r.total, r.mn, r.mx)
           for r in spark.table("tws_test").collect()}
    assert got == {"a": (5, 15.0, 1.0, 5.0), "b": (5, 15.0, 1.0, 5.0)}
