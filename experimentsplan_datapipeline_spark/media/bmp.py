"""Minimal pure-Python BMP codec (Windows BITMAPINFOHEADER, public spec).

Extends the real-decode family (media/png.py) so the reference's full scan
extension filter (train/common/dataset.py:130 accepts png/jpg/jpeg/bmp) has
a second REAL format in this container: 24-bit BI_RGB and 8-bit paletted
BMPs decode to actual pixels; the sha256 stub stays only for payloads that
aren't images at all.

Decoder: file header ('BM', pixel-data offset) + BITMAPINFOHEADER (width,
signed height for bottom-up/top-down, bpp, BI_RGB only), optional palette,
4-byte-aligned rows, BGR -> RGB. Encoder: 24-bit BI_RGB for tests/sinks.
"""

from __future__ import annotations

import struct

import numpy as np


def is_bmp(content: bytes) -> bool:
    return bool(content) and len(content) >= 2 and content[:2] == b"BM"


def decode_bmp(content: bytes) -> np.ndarray:
    """BMP bytes -> uint8 array of shape (h, w, 3) RGB."""
    if not is_bmp(content):
        raise ValueError("not a BMP: bad signature")
    if len(content) < 54:
        raise ValueError("BMP truncated before headers")
    (data_off,) = struct.unpack_from("<I", content, 10)
    (hdr_size,) = struct.unpack_from("<I", content, 14)
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size} (need >= 40)")
    width, height = struct.unpack_from("<ii", content, 18)
    planes, bpp = struct.unpack_from("<HH", content, 26)
    (compression,) = struct.unpack_from("<I", content, 30)
    (clr_used,) = struct.unpack_from("<I", content, 46)
    if planes != 1 or compression != 0 or bpp not in (8, 24):
        raise ValueError(
            f"unsupported BMP (planes={planes}, bpp={bpp}, "
            f"compression={compression}); this codec handles uncompressed "
            "BI_RGB 8-bit paletted and 24-bit"
        )
    top_down = height < 0
    height = abs(height)
    if width <= 0 or height <= 0:
        raise ValueError("BMP has non-positive dimensions")
    palette = None
    if bpp == 8:
        n_colors = clr_used or 256
        pal_off = 14 + hdr_size
        pal = np.frombuffer(
            content, dtype=np.uint8, count=n_colors * 4, offset=pal_off
        ).reshape(n_colors, 4)
        palette = pal[:, [2, 1, 0]]  # BGRA entries -> RGB
    row_bytes = width * (bpp // 8)
    stride = (row_bytes + 3) & ~3  # rows pad to 4-byte boundaries
    need = data_off + stride * height
    if len(content) < need:
        raise ValueError("BMP pixel data truncated")
    rows = np.frombuffer(
        content, dtype=np.uint8, count=stride * height, offset=data_off
    ).reshape(height, stride)[:, :row_bytes]
    if not top_down:
        rows = rows[::-1]
    if bpp == 24:
        return rows.reshape(height, width, 3)[:, :, ::-1].copy()  # BGR -> RGB
    return palette[rows.reshape(height, width)].copy()


def encode_bmp(arr: np.ndarray) -> bytes:
    """uint8 array (h, w) or (h, w, 3) -> 24-bit BI_RGB BMP bytes."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = np.repeat(a[:, :, None], 3, axis=2)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"encode_bmp wants (h, w[, 3]), got {a.shape}")
    h, w, _ = a.shape
    row_bytes = w * 3
    stride = (row_bytes + 3) & ~3
    body = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        body += a[y, :, ::-1].tobytes()  # RGB -> BGR
        body += b"\x00" * (stride - row_bytes)
    data_off = 14 + 40
    file_size = data_off + len(body)
    file_hdr = b"BM" + struct.pack("<IHHI", file_size, 0, 0, data_off)
    info_hdr = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return file_hdr + info_hdr + bytes(body)
