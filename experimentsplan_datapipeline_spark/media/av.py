"""Audio/video binary-column operators (multimodal north star).

Same contract as images.py: media are opaque ``binary`` columns with typed
metadata; decode runs in ``mapInPandas`` over Arrow batches. Video frame
sampling is the UDTF shape — ONE input row fans out to k frame rows inside
the same Arrow pass (the reference's closest analogue is the per-sample
multi-asset fetch, train/common/dataset.py:286-317, re-expressed as a
columnar fan-out instead of per-row GETs).

No codec libraries exist in this container, so the decode is STUBBED with a
sha256-derived byte stream (clearly marked); the Spark-side plumbing —
schema, fan-out batching, partitioning — is real, and the stub derivation is
engine-portable: the DuckDB oracle replays every frame pixel and audio
sample via its own sha256().
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StructField,
    StructType,
)

try:  # real decoders when present (not in this container)
    import av  # noqa: F401

    HAS_PYAV = True
except ImportError:
    HAS_PYAV = False


def _fake_frame(content: bytes, frame_idx: int, size: int = 8) -> np.ndarray:
    """Deterministic stand-in for a decoded grayscale frame: pixel p is byte
    (p mod 32) of sha256(content || '|f' || frame_idx || '|' || p div 32).
    Engine-portable (DuckDB sha256 replays it). NOT a video decoder."""
    content = content if content else b""
    n = size * size
    px: list[int] = []
    for j in range((n + 31) // 32):
        px.extend(
            hashlib.sha256(content + f"|f{frame_idx}|{j}".encode()).digest()
        )
    return np.array(px[:n], dtype=np.int64)


def _fake_audio_chunk(content: bytes, chunk_id: int) -> np.ndarray:
    """Deterministic stand-in for one 32-sample audio chunk: the bytes of
    sha256(content || '|a' || chunk_id). Engine-portable. NOT a decoder."""
    content = content if content else b""
    digest = hashlib.sha256(content + f"|a{chunk_id}".encode()).digest()
    return np.frombuffer(digest, dtype=np.uint8).astype(np.int64)


def sample_frames(
    df: DataFrame,
    content_col: str = "content",
    n_frames_col: str = "n_frames",
    every_k: int = 4,
    size: int = 8,
) -> DataFrame:
    """Video frame sampling: keep every ``every_k``-th frame, emit one row
    per sampled frame with its mean intensity.

    The UDTF shape: mapInPandas fans ONE video row out to ceil(n/k) frame
    rows inside a single Arrow pass — the whole video is decoded once per
    row, never re-fetched per frame (at 100 TB the alternative, joining a
    frame-index table back onto the binary column, would shuffle the video
    bytes; this never moves them past the scan). Passthrough columns are
    preserved on every frame row.
    """
    pass_fields = [f for f in df.schema.fields if f.name != content_col]
    pass_names = [f.name for f in pass_fields]
    out_schema = StructType(
        pass_fields
        + [
            StructField("frame_idx", IntegerType()),
            StructField("mean_intensity", DoubleType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                content = r[content_col]
                for fi in range(0, int(r[n_frames_col]), every_k):
                    px = _fake_frame(content, fi, size)
                    row = {c: r[c] for c in pass_names}
                    row["frame_idx"] = fi
                    row["mean_intensity"] = float(np.mean(px))
                    rows.append(row)
            yield pd.DataFrame(rows, columns=pass_names + ["frame_idx", "mean_intensity"])

    return df.mapInPandas(run, schema=out_schema)


def audio_chunk_energy(
    df: DataFrame,
    content_col: str = "content",
    n_chunks: int = 4,
) -> DataFrame:
    """Chunked audio feature extraction: RMS energy per fixed-size window.

    Same fan-out pass as frame sampling (1 clip row -> n_chunks rows); the
    feature math (sqrt of mean squared amplitude) runs vectorized per Arrow
    batch. Real waveform decoders slot into the same UDF body.
    """
    pass_fields = [f for f in df.schema.fields if f.name != content_col]
    pass_names = [f.name for f in pass_fields]
    out_schema = StructType(
        pass_fields
        + [
            StructField("chunk_id", IntegerType()),
            StructField("rms", DoubleType()),
            StructField("zcr", DoubleType()),
            StructField("peak", IntegerType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                content = r[content_col]
                for ci in range(n_chunks):
                    samples = _fake_audio_chunk(content, ci).astype(np.float64)
                    row = {c: r[c] for c in pass_names}
                    row["chunk_id"] = ci
                    row["rms"] = float(np.sqrt(np.mean(samples * samples)))
                    # zero-crossing rate around the unsigned midpoint 128
                    # (>= 128 is "positive"), and peak deviation — the
                    # other two cheap silence/clipping detectors a real
                    # waveform decoder would feed identically
                    sign = samples >= 128.0
                    row["zcr"] = float(
                        np.mean(sign[1:] != sign[:-1])
                    )
                    row["peak"] = int(np.max(np.abs(samples - 128.0)))
                    rows.append(row)
            yield pd.DataFrame(
                rows,
                columns=pass_names + ["chunk_id", "rms", "zcr", "peak"],
            )

    return df.mapInPandas(run, schema=out_schema)


def scene_cuts(
    df: DataFrame,
    content_col: str = "content",
    n_frames_col: str = "n_frames",
    size: int = 8,
    threshold: float = 86.0,
) -> DataFrame:
    """Scene-change detection: mean absolute pixel difference between
    consecutive frames, flagged against a threshold — the shot-boundary
    pass a video curation pipeline runs before sampling one keyframe per
    scene (a frame-diff detector is the classic first-stage cut finder;
    real decoders slot into the same loop).

    Decode locality is the point at scale: ALL of a clip's frames decode
    inside ONE Arrow pass over the scan — frame i is diffed against the
    still-in-memory frame i-1, so the clip bytes are read once and never
    shuffled, vs a self-join of a frame table which would move decoded
    pixels (or worse, the binary column) through an exchange. Emits one
    row per frame transition: (passthrough..., frame_idx, l1_diff,
    is_cut), where l1_diff is an exact multiple of 1/size^2 (integer
    pixel sums), so the threshold comparison is engine-deterministic.
    """
    pass_fields = [f for f in df.schema.fields if f.name != content_col]
    pass_names = [f.name for f in pass_fields]
    out_schema = StructType(
        pass_fields
        + [
            StructField("frame_idx", IntegerType()),
            StructField("l1_diff", DoubleType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                content = r[content_col]
                prev = None
                for fi in range(int(r[n_frames_col])):
                    px = _fake_frame(content, fi, size)
                    if prev is not None:
                        row = {c: r[c] for c in pass_names}
                        row["frame_idx"] = fi
                        row["l1_diff"] = float(np.mean(np.abs(px - prev)))
                        rows.append(row)
                    prev = px
            yield pd.DataFrame(
                rows, columns=pass_names + ["frame_idx", "l1_diff"]
            )

    out = df.mapInPandas(run, schema=out_schema)
    import pyspark.sql.functions as F

    return out.withColumn("is_cut", F.col("l1_diff") > float(threshold))
