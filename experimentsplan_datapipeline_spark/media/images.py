"""Image/binary column operators (SURVEY.md §2.8, P1-P11) — Arrow-batched.

The reference decodes with PIL per row inside DataLoader workers
(train/common/dataset.py:271-281, train/train_stage_1/dataloader.py:44-49).
Spark-first: images are opaque ``binary`` columns with typed metadata;
decode/resize/normalize run as Pandas UDFs over ``mapInPandas`` — Arrow moves
whole columnar batches across the Python boundary (10-100x over row UDFs).

Decode itself is STUBBED here (PIL/torch are not in this container): when PIL
is importable the real decode runs; otherwise a clearly-marked deterministic
fake produces pixels from a content hash, so the Spark-side plumbing (schema,
batch shape, partitioning, seed-column determinism) is fully real and tested.

Determinism contract: "random" augmentations (flip/crop) take a SEED COLUMN,
never process-global RNG — the reference's unseeded random.* (dataset.py:
213-222) is deliberately not replicated (SURVEY.md §7 risk register).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

try:  # optional dependency — real decode when present
    from PIL import Image  # noqa: F401

    HAS_PIL = True
except ImportError:
    HAS_PIL = False

DECODED_SCHEMA = StructType(
    [
        StructField("height", IntegerType()),
        StructField("width", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("pixels", ArrayType(IntegerType())),
        # True iff a REAL codec produced the pixels. False means the
        # deterministic sha256 stub filled them in — either a synthetic
        # non-image fixture, or a corrupt payload (valid magic, broken
        # body) whose codec raised. Downstream pipelines FILTER on this
        # (drop-with-log, the reference's collate_fn_ignore_none
        # semantics, train/train_CATVTON/dataloader.py:121-128) instead
        # of silently training on pseudo-pixels.
        StructField("decode_ok", BooleanType()),
    ]
)


def _fake_decode(content: bytes, size: int = 8) -> tuple[int, int, int, list[int]]:
    """Deterministic stand-in for PIL decode: pixel i is byte (i mod 32) of
    sha256(content || str(i div 32)) — an engine-portable derivation (DuckDB
    replays it with its sha256()), so even the stubbed mapInPandas pipeline
    is oracle-checkable. NOT an image decoder — plumbing stub only."""
    content = content if content else b""
    n = size * size * 3
    px: list[int] = []
    for j in range((n + 31) // 32):
        px.extend(hashlib.sha256(content + str(j).encode()).digest())
    return size, size, 3, px[:n]


def _real_decode(content: bytes) -> tuple[int, int, int, list[int]]:
    """Decode actual image bytes. PIL when importable; else the vendored
    pure-Python codecs (media/png.py, media/bmp.py, media/jpeg.py) — so the
    REAL path runs in this container too, not just the sha256 stub."""
    if HAS_PIL:
        import io

        from PIL import Image

        img = Image.open(io.BytesIO(content)).convert("RGB")
        arr = np.asarray(img)
    else:
        from experimentsplan_datapipeline_spark.media.bmp import decode_bmp, is_bmp
        from experimentsplan_datapipeline_spark.media.jpeg import decode_jpeg, is_jpeg
        from experimentsplan_datapipeline_spark.media.png import decode_png

        if is_bmp(content):
            arr = decode_bmp(content)  # always (h, w, 3)
        elif is_jpeg(content):
            arr = decode_jpeg(content)  # always (h, w, 3)
        else:
            arr = decode_png(content)
            if arr.shape[2] == 1:  # grayscale -> RGB for a uniform contract
                arr = np.repeat(arr, 3, axis=2)
            elif arr.shape[2] == 4:  # drop alpha
                arr = arr[:, :, :3]
    h, w, c = arr.shape
    return h, w, c, arr.reshape(-1).astype(np.int64).tolist()


def decode_images(df: DataFrame, content_col: str = "content") -> DataFrame:
    """P1: binary -> decoded struct(height,width,channels,pixels) via
    mapInPandas (Arrow batches; per-batch vectorized loop).

    Per-row dispatch: PNG, BMP, and baseline/progressive-JPEG payloads
    (and anything PIL recognizes, when PIL is present) take the REAL
    decode; other payloads fall back to the deterministic sha256 stub so
    synthetic non-image fixtures stay oracle-replayable. The struct's
    ``decode_ok`` flag records which path ran: a corrupt payload (valid
    magic, broken body) gets stub pixels with ``decode_ok=false`` and the
    ROW SURVIVES — dropping is a downstream ``filter('image.decode_ok')``,
    mirroring the reference's drop-with-log collate
    (train/train_CATVTON/dataloader.py:121-128), so failure COUNTS stay
    observable instead of rows vanishing inside the decode operator."""
    from experimentsplan_datapipeline_spark.media.bmp import is_bmp
    from experimentsplan_datapipeline_spark.media.jpeg import is_jpeg
    from experimentsplan_datapipeline_spark.media.png import is_png

    out_schema = StructType(
        [f for f in df.schema.fields if f.name != content_col]
        + [StructField("image", DECODED_SCHEMA)]
    )
    other_cols = [f.name for f in df.schema.fields if f.name != content_col]

    def decode(content: bytes) -> tuple[bool, int, int, int, list[int]]:
        if content and (
            is_png(bytes(content))
            or is_bmp(bytes(content))
            or is_jpeg(bytes(content))
            or HAS_PIL
        ):
            try:
                return (True, *_real_decode(bytes(content)))
            except Exception:
                pass  # corrupt image -> deterministic stub, flagged below
        return (False, *_fake_decode(content))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            images = [decode(c) for c in pdf[content_col]]
            out = pdf[other_cols].copy()
            out["image"] = [
                {
                    "height": h,
                    "width": w,
                    "channels": c,
                    "pixels": px,
                    "decode_ok": ok,
                }
                for ok, h, w, c, px in images
            ]
            yield out

    return df.mapInPandas(run, schema=out_schema)


def normalize_pixels(
    df: DataFrame, image_col: str = "image", mean: float = 0.5, std: float = 0.5
) -> DataFrame:
    """P4: ToTensor+Normalize — pixel/255 -> (x-mean)/std, JVM-side via
    transform() on the array column (no Python boundary)."""
    px = F.col(f"{image_col}.pixels")
    normalized = F.transform(
        px, lambda v: ((v.cast("double") / 255.0) - mean) / std
    )
    return df.withColumn("pixels_norm", normalized)


def deterministic_flip(
    df: DataFrame, image_col: str = "image", seed_col: str = "seed", p: float = 0.5,
    portable_seed: int | None = None,
) -> DataFrame:
    """P3: seed-column horizontal flip decision (hash(seed) -> [0,1)).

    The flip *decision* is a pure expression; the pixel permutation itself
    would run in the same mapInPandas pass as decode at production scale.
    ``portable_seed`` swaps xxhash64 for the md5-derived engine-portable
    hash so the oracle can replay the decision.
    """
    if portable_seed is not None:
        from experimentsplan_datapipeline_spark.operators.curation import portable_hash

        h = portable_hash([F.col(seed_col)], portable_seed)
    else:
        h = F.xxhash64(F.col(seed_col))
    u = F.pmod(h, F.lit(1_000_000)) / 1_000_000.0
    return df.withColumn("flipped", u < p)


def tokenize_captions(
    df: DataFrame, caption_col: str, max_len: int = 77, vocab_size: int = 49408,
    portable_seed: int | None = None,
) -> DataFrame:
    """P9: caption -> fixed-length int id array (pad/truncate), hash-vocab.

    Reference pads/truncates to 77 CLIP tokens (train/train_stage_1/
    dataloader.py:79-86). Real tokenizers plug in as a pandas_udf; the
    hash-vocab version keeps the schema and padding semantics testable
    without the tokenizer dependency. JVM-side end to end.
    ``portable_seed`` switches the hash vocab to the md5-derived
    engine-reproducible hash so the DuckDB oracle can replay the ids.
    """
    from experimentsplan_datapipeline_spark.operators.curation import portable_hash

    toks = F.split(F.trim(F.col(caption_col)), r"\s+")
    if portable_seed is not None:
        hash_of = lambda s: portable_hash([s], portable_seed)  # noqa: E731
    else:
        hash_of = F.xxhash64
    ids = F.transform(
        F.slice(toks, 1, max_len), lambda s: F.pmod(hash_of(s), F.lit(vocab_size))
    )
    pad_len = F.greatest(F.lit(max_len) - F.size(ids), F.lit(0))
    padded = F.concat(
        ids, F.transform(F.sequence(F.lit(1), pad_len), lambda _: F.lit(0).cast("long"))
    )
    # sequence(1,0) is descending, guard empty pad
    padded = F.when(pad_len == 0, ids).otherwise(padded)
    return df.withColumn("token_ids", padded)


def batch_inference_stub(
    df: DataFrame, input_col: str = "pixels_norm", model_version: str = "stub-v0"
) -> DataFrame:
    """P10 shape: per-partition heavy-model inference via mapInPandas.

    The model would be loaded once per Python worker (module-level cache,
    the executor-side analogue of the reference's lazy per-worker client,
    dataset.py:73-81) and applied per Arrow batch. Stub computes a
    deterministic pseudo-score; raises nothing at plan time so pipelines
    compose. Real weights: broadcast + load in ``init`` exactly here.
    """
    out_schema = StructType(
        list(df.schema.fields) + [StructField("score", DoubleType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # model = _load_model_once()  # <- broadcast weights land here
        for pdf in batches:
            scores = [
                float(np.mean(x)) if len(x) else 0.0 for x in pdf[input_col]
            ]
            out = pdf.copy()
            out["score"] = scores
            yield out

    return df.mapInPandas(run, schema=out_schema)


def generative_denoise(
    df: DataFrame,
    image_col: str = "image",
    steps: int = 4,
    emit_trajectory: bool = False,
) -> DataFrame:
    """P10: generative-inference loop with a REAL iterative computation —
    K deterministic denoise steps of the heat-equation smoother
    x_{k+1} = clamped-3x3-neighborhood-mean(x_k) over the decoded image
    (float in [0,1]); the diffusion-style stand-in for a sampler loop
    whose framework weights don't exist in this container
    (cf. the reference's per-step denoise loop shape). All plumbing is
    the production shape: Arrow batches in, per-row numpy loop, and with
    ``emit_trajectory=True`` the UDTF fan-out — one output row per
    (input row, step) — that a real sampler's intermediate-latent
    debugging uses.

    Numeric contract: accumulation runs in a FIXED (dy, dx) order with
    sequential float64 adds, so a SQL twin chaining the same 9 terms per
    step reproduces results bit-for-bit before rounding.

    Output: input columns plus step (int) and x (array<double>, flattened
    h*w*c); final step only unless ``emit_trajectory``.
    """
    from pyspark.sql.types import LongType

    out_schema = StructType(
        [f for f in df.schema.fields if f.name != image_col]
        + [StructField("step", LongType()), StructField("x", ArrayType(DoubleType()))]
    )
    other = [f.name for f in df.schema.fields if f.name != image_col]

    def denoise_step(x: "np.ndarray") -> "np.ndarray":
        h, w, _ = x.shape
        p = np.pad(x, ((1, 1), (1, 1), (0, 0)), mode="edge")
        acc = np.zeros_like(x)
        for dy in (-1, 0, 1):  # fixed order — see numeric contract
            for dx in (-1, 0, 1):
                acc = acc + p[1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w]
        return acc / 9.0

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in range(len(pdf)):
                img = pdf[image_col].iloc[i]
                h, w, c = img["height"], img["width"], img["channels"]
                x = (
                    np.asarray(img["pixels"], dtype=np.float64).reshape(h, w, c)
                    / 255.0
                )
                for k in range(1, steps + 1):
                    x = denoise_step(x)
                    if emit_trajectory or k == steps:
                        rec = {name: pdf[name].iloc[i] for name in other}
                        rec["step"] = k
                        rec["x"] = x.reshape(-1).tolist()
                        rows.append(rec)
            yield pd.DataFrame(rows, columns=other + ["step", "x"])

    return df.mapInPandas(run, schema=out_schema)


def load_weights_npz(path: str, key: str | None = None) -> "np.ndarray":
    """Load real checkpoint weights from an ``.npy``/``.npz`` file for
    ``batch_inference_broadcast`` — the driver-side half of the P7/P8
    model-metric path (reference train/common/metrics.py:41-170 loads
    LPIPS/DeepLabV3 checkpoints per worker; here the tensor loads ONCE on
    the driver and ships via broadcast). A cluster user swaps a converted
    LPIPS/segmentation weight file in through this loader without
    touching the plan; in-sandbox tests exercise the same code path with
    a small real npz.

    ``key`` selects an array inside an .npz archive; omitted, the archive
    must hold exactly one array (ambiguity raises with the member list
    rather than guessing).
    """
    if path.endswith(".npy"):
        return np.load(path)
    with np.load(path) as z:
        names = list(z.files)
        if key is None:
            if len(names) != 1:
                raise ValueError(
                    f"load_weights_npz: {path!r} holds {names}; pass key="
                )
            key = names[0]
        if key not in names:
            raise KeyError(
                f"load_weights_npz: {key!r} not in {path!r} ({names})"
            )
        return z[key]


def batch_inference_broadcast(
    df: DataFrame,
    weights: "np.ndarray",
    input_col: str = "pixels_norm",
    model_version: str = "npfilter-v1",
) -> DataFrame:
    """P7/P8/P10: the broadcast-model-weights inference pattern, proven with
    a real NumPy weight matrix instead of framework weights.

    The weights ship to executors ONCE via ``SparkContext.broadcast`` (torrent
    protocol — not serialized into every task closure) and are materialized
    per Python worker on first use; each Arrow batch then runs a vectorized
    ``features @ W`` scoring pass. This is exactly where real checkpoint
    tensors plug in (reference loads per-worker models in
    train/common/metrics.py:41-170 and dataset.py:73-81); only the
    ``score()`` body changes.

    Rows whose feature vector length doesn't match the filter are scored by
    cyclic weight indexing (len-robust for variable-size inputs) — keeps the
    op total, deterministic, and oracle-free-testable by hash.
    """
    sc = df.sparkSession.sparkContext
    bw = sc.broadcast(np.asarray(weights, dtype=np.float64))
    out_schema = StructType(
        list(df.schema.fields)
        + [StructField("score", DoubleType()), StructField("model", StringType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from experimentsplan_datapipeline_spark.operators.similarity import (
            _np_round_half_up,
        )

        w = bw.value  # one deserialization per worker, reused across batches
        for pdf in batches:
            scores = []
            for x in pdf[input_col]:
                v = np.asarray(x, dtype=np.float64)
                if v.size == 0:
                    scores.append(0.0)
                    continue
                ww = w[np.arange(v.size) % w.size]
                # HALF_UP, not Python round()'s half-to-even: the repo-wide
                # cross-engine tie contract (F.round / DuckDB round are
                # ties-away-from-zero); an exact .5 at the 6th decimal must
                # not flip a score vs the oracle
                scores.append(float(_np_round_half_up(v @ ww)))
            out = pdf.copy()
            out["score"] = scores
            out["model"] = model_version
            yield out

    return df.mapInPandas(run, schema=out_schema)


def apply_mask(
    df: DataFrame, pixels_col: str = "pixels_norm", mask_col: str = "mask"
) -> DataFrame:
    """P6: region masking — elementwise pixel*mask via zip_with, JVM-side.

    The reference multiplies tensors for masked metrics
    (train/common/metrics.py:194-196,216-218); on array columns that is a
    pure codegen expression, no Python boundary.
    """
    masked = F.zip_with(
        F.col(pixels_col), F.col(mask_col), lambda p, m: p * m
    )
    return df.withColumn(f"{pixels_col}_masked", masked)


def resize_images(
    df: DataFrame, image_col: str = "image", out_h: int = 4, out_w: int = 4
) -> DataFrame:
    """P2/P5: nearest-neighbor resize of decoded pixel arrays, mapInPandas.

    Real resampling math (index grid over the source raster) applied per
    Arrow batch — works identically on stub-decoded and PIL-decoded pixels.
    The reference's LANCZOS/bilinear variants differ only in the sampling
    kernel inside this same UDF shape (train/train_stage_1/dataloader.py:45,
    train/train_OOTDiffusion/dataloader.py:106-113).
    """
    out_schema = StructType(
        list(df.schema.fields) + [StructField("resized", DECODED_SCHEMA)]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_rows = []
            for img in pdf[image_col]:
                h, w, c = img["height"], img["width"], img["channels"]
                px = np.asarray(img["pixels"], dtype=np.int64).reshape(h, w, c)
                ys = (np.arange(out_h) * h) // out_h
                xs = (np.arange(out_w) * w) // out_w
                res = px[ys][:, xs]
                out_rows.append(
                    {
                        "height": out_h,
                        "width": out_w,
                        "channels": c,
                        "pixels": res.reshape(-1).tolist(),
                        "decode_ok": bool(img.get("decode_ok", True)),
                    }
                )
            out = pdf.copy()
            out["resized"] = out_rows
            yield out

    return df.mapInPandas(run, schema=out_schema)


def crop_images(
    df: DataFrame,
    image_col: str = "image",
    out_h: int = 4,
    out_w: int = 4,
    seed_col: str | None = None,
) -> DataFrame:
    """P2: CenterCrop / seeded RandomCrop over decoded pixel arrays.

    ``seed_col=None`` -> center crop; otherwise the crop offset derives from
    xxhash64 of the seed column (deterministic per row, the engine's
    seed-column contract — reference's unseeded RandomCrop at
    train/train_DIT/dataloader.py:53-62 is deliberately not replicated).
    Offset computation is a JVM expression; the pixel slice runs in the
    same Arrow batch pass as decode/resize.
    """
    if seed_col is not None:
        hx = F.pmod(F.xxhash64(F.col(seed_col)), F.lit(1_000_000))
        oy = F.pmod(hx, F.greatest(F.col(f"{image_col}.height") - out_h + 1, F.lit(1)))
        ox = F.pmod(
            F.floor(hx / 7).cast("long"),
            F.greatest(F.col(f"{image_col}.width") - out_w + 1, F.lit(1)),
        )
    else:
        oy = F.greatest((F.col(f"{image_col}.height") - out_h) / 2, F.lit(0)).cast("int")
        ox = F.greatest((F.col(f"{image_col}.width") - out_w) / 2, F.lit(0)).cast("int")
    with_off = df.withColumn("__oy", oy.cast("int")).withColumn("__ox", ox.cast("int"))

    out_schema = StructType(
        list(with_off.schema.fields) + [StructField("cropped", DECODED_SCHEMA)]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            crops = []
            for img, y0, x0 in zip(pdf[image_col], pdf["__oy"], pdf["__ox"]):
                h, w, c = img["height"], img["width"], img["channels"]
                px = np.asarray(img["pixels"], dtype=np.int64).reshape(h, w, c)
                res = px[y0 : y0 + out_h, x0 : x0 + out_w]
                crops.append(
                    {
                        "height": res.shape[0],
                        "width": res.shape[1],
                        "channels": c,
                        "pixels": res.reshape(-1).tolist(),
                        "decode_ok": bool(img.get("decode_ok", True)),
                    }
                )
            out = pdf.copy()
            out["cropped"] = crops
            yield out

    return with_off.mapInPandas(run, schema=out_schema).drop("__oy", "__ox")


def encode_images(
    df: DataFrame,
    fmt_col: str = "fmt",
    height_col: str = "height",
    width_col: str = "width",
    fill_col: str = "fill",
) -> DataFrame:
    """Synthesize real encoded image payloads per row: (fmt, h, w, fill) ->
    ``content`` binary via the vendored pure-Python codecs (png/bmp/jpeg).

    Runs the ENCODERS executor-side under mapInPandas — the write-path twin
    of decode_images, used by tests and the header-probe query to create
    format-true binaries without any image library in the container."""
    from pyspark.sql.types import BinaryType

    from experimentsplan_datapipeline_spark.media.bmp import encode_bmp
    from experimentsplan_datapipeline_spark.media.jpeg import encode_jpeg
    from experimentsplan_datapipeline_spark.media.png import encode_png

    out_schema = StructType(
        list(df.schema.fields) + [StructField("content", BinaryType())]
    )
    encoders = {
        "png": encode_png,
        "bmp": encode_bmp,
        "jpeg": encode_jpeg,
        "jpg": encode_jpeg,
    }

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for fmt, h, w, fill in zip(
                pdf[fmt_col], pdf[height_col], pdf[width_col], pdf[fill_col]
            ):
                enc = encoders.get(str(fmt).lower())
                if enc is None:
                    raise ValueError(
                        f"unsupported fmt {fmt!r}; expected png/bmp/jpeg (or jpg)"
                    )
                arr = np.full((int(h), int(w), 3), int(fill) % 256, np.uint8)
                blobs.append(enc(arr))
            out = pdf.copy()
            out["content"] = blobs
            yield out

    return df.mapInPandas(run, schema=out_schema)


def image_ahash(
    decoded: DataFrame, image_col: str = "image"
) -> DataFrame:
    """Perceptual average-hash (aHash) over a decoded image: per-position
    luminance vs the image mean -> 64 bits, packed as two 32-bit halves
    (``ahash_lo`` bits 0-31, ``ahash_hi`` bits 32-63; two halves so the
    packing is a plain integer SUM — no sign-bit traps in any engine).

    All integer math: bit_i = (64 * s_i >= T) with s_i = R+G+B of position i
    and T = sum of all s_i — no float comparisons, so the hash is
    bit-reproducible across engines and architectures. Pure JVM expressions
    over the decoded struct (the mapInPandas decode is the only Python).
    Assumes the 8x8x3 decode layout (pixels length 192).
    """
    px = F.col(f"{image_col}.pixels")
    s = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda i: F.element_at(px, i * 3 + 1)
        + F.element_at(px, i * 3 + 2)
        + F.element_at(px, i * 3 + 3),
    )
    with_s = decoded.withColumn("__s", s).withColumn(
        "__t", F.aggregate("__s", F.lit(0), lambda a, x: a + x)
    )
    def half(lo_bit: int) -> F.Column:
        return F.aggregate(
            F.sequence(F.lit(0), F.lit(31)),
            F.lit(0).cast("long"),
            lambda acc, i: acc
            + F.when(
                F.element_at("__s", i + lo_bit + 1) * 64 >= F.col("__t"),
                F.pow(F.lit(2.0), i).cast("long"),
            ).otherwise(F.lit(0).cast("long")),
        )
    return (
        with_s.withColumn("ahash_lo", half(0))
        .withColumn("ahash_hi", half(32))
        .drop("__s", "__t")
    )


def dct_weights(n: int = 8) -> "list[list[float]]":
    """Orthonormal DCT-II coefficient table c[u][x] (the public JPEG/pHash
    basis): c[0][x] = sqrt(1/n), c[u][x] = sqrt(2/n)*cos((2x+1)u*pi/2n).
    Both the Spark plan and the SQL oracle inline THIS table's floats, so
    the two engines multiply the exact same literals."""
    import math

    return [
        [
            (math.sqrt(1.0 / n) if u == 0 else math.sqrt(2.0 / n))
            * math.cos((2 * x + 1) * u * math.pi / (2 * n))
            for x in range(n)
        ]
        for u in range(n)
    ]


def image_phash(
    decoded: DataFrame, image_col: str = "image", block: int = 4
) -> DataFrame:
    """Perceptual DCT hash (pHash): 8x8 luminance grid -> 2-D DCT-II ->
    top-left ``block``x``block`` low-frequency coefficients minus DC ->
    each bit is coeff > median(coeffs) -> packed long ``phash``. Catches
    brightness/contrast shifts aHash misses (the DCT discards the DC
    level; the median threshold discards gain).

    The 2-D DCT is STAGED as two 1-D passes (VERDICT r10 item 2): pass 1
    projects ``t[x*block+v] = sum_y c[v][y]*lum[x*n+y]`` (n*block chains
    of n terms), pass 2 builds each AC coefficient as
    ``sum_x c[u][x]*t[x*block+v]`` (block^2-1 chains of n terms) — ~376
    multiply-adds for block=4 instead of the 960 the flattened
    one-pass form inlined, whose generated ``processNext()`` exceeded
    the JVM's 64 KB method limit and silently fell back to interpreted
    evaluation (the failure class the codegen lint in
    tests/test_plans.py now catches session-wide via
    ``spark.sql.codegen.fallback=false``).

    Engine-reproducible by construction: both passes are fixed
    left-to-right multiply-add chains over literal ``dct_weights``
    floats replayed in the identical association order by the SQL
    oracle (IEEE doubles with the same op sequence are bit-identical),
    only the final coefficients round to 6, the AC count is odd so the
    median is an exact order statistic, and the pack is an integer sum.
    Zero shuffle, zero UDF beyond the decode.
    """
    n = 8
    px = F.col(f"{image_col}.pixels")
    lum = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda i: F.element_at(px, i * 3 + 1)
        + F.element_at(px, i * 3 + 2)
        + F.element_at(px, i * 3 + 3),
    )
    d = decoded.withColumn("__lum", lum)
    c = dct_weights(n)
    t_cols = []
    for x in range(n):
        for v in range(block):
            acc = None
            for y in range(n):
                term = (
                    F.element_at("__lum", x * n + y + 1)
                    * F.lit(float(c[v][y]))
                )
                acc = term if acc is None else acc + term
            t_cols.append(acc)
    d = d.withColumn("__t", F.array(*t_cols))
    coeffs = []
    for u in range(block):
        for v in range(block):
            if u == 0 and v == 0:
                continue
            acc = None
            for x in range(n):
                term = (
                    F.element_at("__t", x * block + v + 1)
                    * F.lit(float(c[u][x]))
                )
                acc = term if acc is None else acc + term
            coeffs.append(F.round(acc, 6))
    n_ac = len(coeffs)  # block^2 - 1, odd for even block
    d = d.withColumn("__c", F.array(*coeffs)).withColumn(
        "__med", F.element_at(F.array_sort("__c"), n_ac // 2 + 1)
    )
    phash = None
    for i in range(n_ac):
        bit = F.when(
            F.element_at("__c", i + 1) > F.col("__med"),
            F.lit(1 << i).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        phash = bit if phash is None else phash + bit
    return d.withColumn("phash", phash).drop("__lum", "__t", "__c", "__med")


def ahash_near_dup(
    hashed: DataFrame, id_col: str, max_hamming: int = 6
) -> DataFrame:
    """Image near-dup pairs by aHash hamming distance, LSH-banded.

    The 64 bits split into four 16-bit chunks; any pair within hamming
    ``max_hamming`` <= 3 per half shares at least one equal chunk
    (pigeonhole), so candidates come from an equi-join on (chunk_idx,
    chunk_val) — the corpus-scale shuffle is on 16-bit band keys, never an
    all-pairs product. Exact verification: bit_count(xor) over both halves.
    """
    chunks = F.array(
        *[
            F.struct(
                F.lit(c).alias("ci"),
                F.shiftright(F.col(h), sh).bitwiseAND(F.lit(0xFFFF)).alias("cv"),
            )
            for c, (h, sh) in enumerate(
                [("ahash_lo", 0), ("ahash_lo", 16), ("ahash_hi", 0), ("ahash_hi", 16)]
            )
        ]
    )
    banded = hashed.select(
        F.col(id_col), "ahash_lo", "ahash_hi", F.explode(chunks).alias("c")
    ).select(id_col, "ahash_lo", "ahash_hi", "c.ci", "c.cv")
    a, b = banded.alias("a"), banded.alias("b")
    ham = F.bit_count(
        F.col("a.ahash_lo").bitwiseXOR(F.col("b.ahash_lo"))
    ) + F.bit_count(F.col("a.ahash_hi").bitwiseXOR(F.col("b.ahash_hi")))
    return (
        a.join(
            b,
            (F.col("a.ci") == F.col("b.ci"))
            & (F.col("a.cv") == F.col("b.cv"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


# Cross-engine determinism grid for the LPIPS-shaped metric: after each
# feature normalization (the one step whose sqrt/divide produces
# non-dyadic doubles), features snap to the 2^-20 grid. Every OTHER value
# in the pipeline — conv sums of integer pixels with dyadic kernels,
# ReLU, squares, spatial sums — is then an EXACT dyadic rational well
# inside double's 53-bit mantissa, so summation order can never move a
# ulp and the DuckDB oracle replays the literal conv chains bit-for-bit.
_LPIPS_EPS = 2.0 ** -20
_LPIPS_Q = 2.0 ** 20


def lpips_shape_distance(
    df: DataFrame,
    conv1: "np.ndarray",
    conv2: "np.ndarray",
    layer_weights: "np.ndarray",
    x_col: str = "px_x",
    y_col: str = "px_y",
    size: int = 8,
    out_col: str = "lpips_shape",
) -> DataFrame:
    """P7 LPIPS-SHAPED perceptual distance: the exact dataflow LPIPS runs
    (Zhang et al. 2018, public) with converted weights — two images feed
    a SHARED multi-layer conv feature extractor, per-layer features are
    channel-unit-normalized, the squared feature difference is spatially
    averaged, and layer distances combine under learned layer weights.
    Reference twin: train/common/metrics.py:123-170 (LPIPS over a
    per-worker torch backbone). Torch cannot exist in this sandbox, so
    the backbone here is two 2x2/stride-2 conv layers with ReLU whose
    weights load from a REAL .npz checkpoint (load_weights_npz) and ship
    via torrent broadcast — a cluster user swaps converted AlexNet/VGG
    slices in through the same loader + the same Arrow batch loop
    without touching the plan.

    Kernels and layer weights must be dyadic rationals and features snap
    to the 2^-20 grid after each normalization (see _LPIPS_EPS note) —
    that is what lets the DuckDB oracle replay the conv chains exactly.

    Expects ``x_col``/``y_col`` as flat (size*size*3) pixel int arrays
    (row-major, channel-last — decode_images layout). Appends
    ``out_col``.
    """
    sc = df.sparkSession.sparkContext
    k1 = np.asarray(conv1, dtype=np.float64)
    k2 = np.asarray(conv2, dtype=np.float64)
    lw = np.asarray(layer_weights, dtype=np.float64)
    if k1.shape != (2, 2) or k2.shape != (2, 2) or lw.shape != (2,):
        raise ValueError(
            f"lpips_shape_distance: expected 2x2 conv kernels and 2 layer "
            f"weights, got {k1.shape}, {k2.shape}, {lw.shape}"
        )
    bw = sc.broadcast((k1, k2, lw))
    out_schema = StructType(
        list(df.schema.fields) + [StructField(out_col, DoubleType())]
    )

    def _conv_relu(a: "np.ndarray", k: "np.ndarray") -> "np.ndarray":
        f = (
            k[0, 0] * a[0::2, 0::2, :]
            + k[0, 1] * a[0::2, 1::2, :]
            + k[1, 0] * a[1::2, 0::2, :]
            + k[1, 1] * a[1::2, 1::2, :]
        )
        return np.maximum(f, 0.0)

    def _unit_quant(f: "np.ndarray") -> "np.ndarray":
        ssq = (f * f).sum(axis=2, keepdims=True) + _LPIPS_EPS
        return np.floor(f / np.sqrt(ssq) * _LPIPS_Q + 0.5) / _LPIPS_Q

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        w1, w2, lws = bw.value
        for pdf in batches:
            out = []
            for x, y in zip(pdf[x_col], pdf[y_col]):
                ax = np.asarray(x, dtype=np.float64).reshape(size, size, 3)
                ay = np.asarray(y, dtype=np.float64).reshape(size, size, 3)
                qx1 = _unit_quant(_conv_relu(ax, w1))
                qy1 = _unit_quant(_conv_relu(ay, w1))
                d1 = float(((qx1 - qy1) ** 2).sum()) / (qx1.shape[0] ** 2)
                qx2 = _unit_quant(_conv_relu(qx1, w2))
                qy2 = _unit_quant(_conv_relu(qy1, w2))
                d2 = float(((qx2 - qy2) ** 2).sum()) / (qx2.shape[0] ** 2)
                out.append(lws[0] * d1 + lws[1] * d2)
            res = pdf.copy()
            res[out_col] = out
            yield res

    return df.mapInPandas(run, schema=out_schema)
