"""Minimal pure-Python baseline JPEG codec (ITU-T T.81, public spec).

Completes the real-decode family (media/png.py, media/bmp.py) so every
extension the reference's scan filter accepts (train/common/dataset.py:130:
png/jpg/jpeg/bmp) has a REAL decode path in this container; the sha256 stub
in media/images.py remains only for payloads that are not images at all.

Decoder: baseline DCT (SOF0/SOF1), Huffman entropy coding, 8-bit samples,
grayscale or YCbCr with any h/v sampling factors up to 2 (4:4:4, 4:2:2,
4:2:0), restart markers, byte stuffing. Progressive (SOF2) and arithmetic
coding are rejected with a clear error. Encoder: quality-scaled Annex K
quantization tables, the T.81 Annex K typical Huffman tables, 4:4:4 or
4:2:0, used by tests and the image sink — the decoder itself reads the
tables from the stream, so it handles foreign JPEGs too.

IDCT/FDCT use the orthonormal 8x8 DCT-II basis matrix M (numpy matmul per
block): FDCT S = M @ s @ M.T, IDCT s = M.T @ S @ M — exactly the T.81
definitions with the 1/2*C(u) factors folded into M.
"""

from __future__ import annotations

import struct

import numpy as np

# --- constants (all from the public T.81 spec / JFIF) -----------------------

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Annex K base quantization tables (quality 50), natural (row-major) order.
QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# Annex K "typical" Huffman tables: (bits[1..16], values).
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II basis: M[u, x] = C(u)/2 * cos((2x+1)u*pi/16)."""
    u = np.arange(8).reshape(8, 1)
    x = np.arange(8).reshape(1, 8)
    m = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16)
    m[0, :] *= 1.0 / np.sqrt(2.0)
    return m


_M = _dct_matrix()


def is_jpeg(content: bytes) -> bool:
    return bool(content) and len(content) >= 3 and content[:3] == b"\xff\xd8\xff"


# --- Huffman ----------------------------------------------------------------


def _canonical_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """T.81 Annex C canonical code assignment: value -> (code, length)."""
    if sum(bits) != len(values):
        raise ValueError("Huffman spec mismatch: sum(bits) != len(values)")
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _decode_table(bits: list[int], values: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, for bit-at-a-time decoding."""
    return {
        (length, code): sym
        for sym, (code, length) in _canonical_codes(bits, values).items()
    }


class _MarkerFound(Exception):
    def __init__(self, marker: int):
        self.marker = marker


class _BitReader:
    """MSB-first bit reader over entropy-coded data with FF00 byte
    unstuffing; a bare FF-marker ends the current scan segment."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1
            else:
                self.pos -= 1  # leave the marker in place for the caller
                raise _MarkerFound(nxt)
        self.acc = (self.acc << 8) | b
        self.n += 8

    def read_bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def read_bits(self, count: int) -> int:
        v = 0
        for _ in range(count):
            v = (v << 1) | self.read_bit()
        return v

    def align(self) -> None:
        self.acc = 0
        self.n = 0

    def expect_rst(self) -> None:
        """Consume an RSTn marker at a byte boundary (restart intervals)."""
        self.align()
        if self.data[self.pos] != 0xFF or not (0xD0 <= self.data[self.pos + 1] <= 0xD7):
            raise ValueError("expected RSTn restart marker")
        self.pos += 2

    def decode_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in JPEG scan")

    def receive_extend(self, s: int) -> int:
        if s == 0:
            return 0
        v = self.read_bits(s)
        if v < (1 << (s - 1)):  # T.81 EXTEND: negative branch
            v -= (1 << s) - 1
        return v


# --- decoder ----------------------------------------------------------------


def decode_jpeg(content: bytes) -> np.ndarray:
    """Baseline JPEG bytes -> uint8 array of shape (h, w, 3) RGB."""
    if not is_jpeg(content):
        raise ValueError("not a JPEG: bad SOI signature")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    restart_interval = 0
    frame = None  # (precision, h, w, comps) comps: [(cid, hs, vs, tq)]
    planes: dict[int, np.ndarray] = {}
    pos = 2
    n = len(content)
    while pos < n:
        if content[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        while pos < n and content[pos] == 0xFF:  # skip fill bytes
            pos += 1
        marker = content[pos]
        pos += 1
        if marker == 0xD9:  # EOI
            break
        if 0xD0 <= marker <= 0xD7:  # stray RSTn outside a scan
            continue
        (seg_len,) = struct.unpack_from(">H", content, pos)
        seg = content[pos + 2 : pos + seg_len]
        if marker == 0xDB:  # DQT
            off = 0
            while off < len(seg):
                pq, tq_id = seg[off] >> 4, seg[off] & 0x0F
                off += 1
                if pq:
                    vals = np.frombuffer(seg, dtype=">u2", count=64, offset=off)
                    off += 128
                else:
                    vals = np.frombuffer(seg, dtype=np.uint8, count=64, offset=off)
                    off += 64
                table = np.zeros(64, dtype=np.int64)
                table[ZIGZAG] = vals.astype(np.int64)  # de-zigzag to natural
                qt[tq_id] = table
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(seg):
                tc, th = seg[off] >> 4, seg[off] & 0x0F
                off += 1
                bits = list(seg[off : off + 16])
                off += 16
                count = sum(bits)
                values = list(seg[off : off + count])
                off += count
                huff[(tc, th)] = _decode_table(bits, values)
        elif marker in (0xC0, 0xC1):  # SOF0 baseline / SOF1 ext sequential
            precision, height, width, ncomp = struct.unpack_from(">BHHB", seg, 0)
            if precision != 8:
                raise ValueError(f"unsupported JPEG precision {precision}")
            comps = []
            for i in range(ncomp):
                cid, hv, tq_id = struct.unpack_from(">BBB", seg, 6 + 3 * i)
                comps.append((cid, hv >> 4, hv & 0x0F, tq_id))
            frame = (precision, height, width, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG frame type SOF{marker - 0xC0} "
                "(this codec decodes baseline/extended-sequential Huffman only)"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan_tables = {}
            for i in range(ns):
                cs, tdta = seg[1 + 2 * i], seg[2 + 2 * i]
                scan_tables[cs] = (tdta >> 4, tdta & 0x0F)
            pos_scan = pos + seg_len
            planes, pos = _decode_scan(
                content, pos_scan, frame, scan_tables, qt, huff, restart_interval
            )
            continue  # pos already advanced past the scan
        # APPn / COM / others: skip
        pos += seg_len
    if frame is None or not planes:
        raise ValueError("JPEG had no decodable scan")
    return _assemble_rgb(frame, planes)


def _decode_scan(data, pos, frame, scan_tables, qt, huff, restart_interval):
    _, height, width, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    planes = {
        cid: np.zeros((mcus_y * vs * 8, mcus_x * hs * 8), dtype=np.float64)
        for cid, hs, vs, _ in comps
    }
    reader = _BitReader(data, pos)
    pred = {cid: 0 for cid, *_ in comps}
    mcu_index = 0
    try:
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                    reader.expect_rst()
                    pred = {cid: 0 for cid in pred}
                for cid, hs, vs, tq_id in comps:
                    dc_t, ac_t = scan_tables[cid]
                    quant = qt[tq_id]
                    for by in range(vs):
                        for bx in range(hs):
                            block, pred[cid] = _decode_block(
                                reader, huff[(0, dc_t)], huff[(1, ac_t)],
                                quant, pred[cid],
                            )
                            y0 = (my * vs + by) * 8
                            x0 = (mx * hs + bx) * 8
                            planes[cid][y0 : y0 + 8, x0 : x0 + 8] = block
                mcu_index += 1
    except _MarkerFound:
        pass  # truncated scan: keep what decoded
    # skip to the next marker after the entropy-coded data
    pos = reader.pos
    while pos + 1 < len(data) and not (
        data[pos] == 0xFF and data[pos + 1] != 0x00 and not (0xD0 <= data[pos + 1] <= 0xD7)
    ):
        pos += 1
    return planes, pos


def _decode_block(reader, dc_table, ac_table, quant, pred):
    coefs = np.zeros(64, dtype=np.float64)
    s = reader.decode_symbol(dc_table)
    pred = pred + reader.receive_extend(s)
    coefs[0] = pred * quant[0]
    k = 1
    while k < 64:
        rs = reader.decode_symbol(ac_table)
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += run
        if k > 63:
            raise ValueError("JPEG AC run overflows block")
        coefs[ZIGZAG[k]] = reader.receive_extend(size) * quant[ZIGZAG[k]]
        k += 1
    block = _M.T @ coefs.reshape(8, 8) @ _M + 128.0
    return block, pred


def _assemble_rgb(frame, planes):
    _, height, width, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    full = []
    for cid, hs, vs, _ in comps:
        p = planes[cid]
        if hs != hmax or vs != vmax:  # nearest-neighbor chroma upsample
            p = np.repeat(np.repeat(p, vmax // vs, axis=0), hmax // hs, axis=1)
        full.append(p[:height, :width])
    if len(full) == 1:
        y = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return np.repeat(y[:, :, None], 3, axis=2)
    if len(full) != 3:
        raise ValueError(f"unsupported JPEG component count {len(full)}")
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# --- encoder ----------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self) -> None:
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)  # pad with 1s


def _quality_table(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _encode_block(writer, block, quant, dc_codes, ac_codes, pred):
    coefs = _M @ (block - 128.0) @ _M.T
    q = np.round(coefs.reshape(-1) / quant).astype(np.int64)
    zz = q[ZIGZAG]
    diff = int(zz[0]) - pred
    s = _category(diff)
    code, length = dc_codes[s]
    writer.write(code, length)
    if s:
        writer.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            writer.write(code, length)
            run -= 16
        s = _category(v)
        code, length = ac_codes[(run << 4) | s]
        writer.write(code, length)
        writer.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[0x00]  # EOB
        writer.write(code, length)
    return int(zz[0])


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 85,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """uint8 (h, w) grayscale or (h, w, 3) RGB -> baseline JFIF JPEG bytes.

    ``subsample=True`` writes 4:2:0 chroma (the common camera layout) so the
    decoder's upsampling path is exercised; default is 4:4:4.
    ``restart_interval`` emits a DRI segment plus RSTn markers every N MCUs
    (the error-resilience layout real camera JPEGs use).
    """
    a = np.asarray(arr, dtype=np.float64)
    gray = a.ndim == 2
    if not gray and (a.ndim != 3 or a.shape[2] != 3):
        raise ValueError(f"encode_jpeg wants (h, w) or (h, w, 3), got {a.shape}")
    h, w = a.shape[:2]
    ql = _quality_table(QUANT_LUMA, quality)
    qc = _quality_table(QUANT_CHROMA, quality)
    dc_l = _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)

    if gray:
        y_plane, cb, cr = a, None, None
        comps = [(1, 1, 1, 0)]
    else:
        r, g, b = a[:, :, 0], a[:, :, 1], a[:, :, 2]
        y_plane = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            cb = _subsample2(cb)
            cr = _subsample2(cr)
            comps = [(1, 2, 2, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
        else:
            comps = [(1, 1, 1, 0), (2, 1, 1, 1), (3, 1, 1, 1)]

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    padded = {
        1: _pad_to(y_plane, mcus_y * vmax * 8, mcus_x * hmax * 8),
    }
    if cb is not None:
        for cid, plane in ((2, cb), (3, cr)):
            hs, vs = comps[cid - 1][1], comps[cid - 1][2]
            padded[cid] = _pad_to(plane, mcus_y * vs * 8, mcus_x * hs * 8)

    writer = _BitWriter()
    pred = {cid: 0 for cid, *_ in comps}
    mcu_index = 0
    rst_index = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                writer.flush()
                writer.out += bytes([0xFF, 0xD0 + (rst_index % 8)])
                rst_index += 1
                pred = {cid: 0 for cid in pred}
            mcu_index += 1
            for cid, hs, vs, tq_id in comps:
                quant = (ql if tq_id == 0 else qc).astype(np.float64)
                dc_codes = dc_l if tq_id == 0 else dc_c
                ac_codes = ac_l if tq_id == 0 else ac_c
                for by in range(vs):
                    for bx in range(hs):
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        block = padded[cid][y0 : y0 + 8, x0 : x0 + 8]
                        pred[cid] = _encode_block(
                            writer, block, quant, dc_codes, ac_codes, pred[cid]
                        )
    writer.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + struct.pack(
        ">HHBB", 1, 1, 0, 0
    )  # APP0: aspect-ratio density 1:1, no thumbnail
    for tq_id, table in ((0, ql),) + (((1, qc),) if not gray else ()):
        zz = table[ZIGZAG].astype(np.uint8).tobytes()
        out += b"\xff\xdb" + struct.pack(">HB", 67, tq_id) + zz
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    ncomp = len(comps)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for cid, hs, vs, tq_id in comps:
        out += struct.pack(">BBB", cid, (hs << 4) | vs, tq_id)
    tables = [(0, 0, DC_LUMA_BITS, DC_LUMA_VALS), (1, 0, AC_LUMA_BITS, AC_LUMA_VALS)]
    if not gray:
        tables += [
            (0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS),
            (1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS),
        ]
    for tc, th, bits, vals in tables:
        out += b"\xff\xc4" + struct.pack(">HB", 3 + 16 + len(vals), (tc << 4) | th)
        out += bytes(bits) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for cid, _, _, tq_id in comps:
        td = 0 if tq_id == 0 else 1
        out += struct.pack(">BB", cid, (td << 4) | td)
    out += struct.pack(">BBB", 0, 63, 0)  # Ss, Se, Ah/Al
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _subsample2(plane: np.ndarray) -> np.ndarray:
    """2x2 box-average chroma subsampling (pads odd edges by replication)."""
    h, w = plane.shape
    if h % 2:
        plane = np.vstack([plane, plane[-1:]])
    if w % 2:
        plane = np.hstack([plane, plane[:, -1:]])
    return (
        plane[0::2, 0::2] + plane[1::2, 0::2] + plane[0::2, 1::2] + plane[1::2, 1::2]
    ) / 4.0


def _pad_to(plane: np.ndarray, ph: int, pw: int) -> np.ndarray:
    """Edge-replicate pad to MCU-aligned dimensions (T.81 recommended)."""
    h, w = plane.shape
    return np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
