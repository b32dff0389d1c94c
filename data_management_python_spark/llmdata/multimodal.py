"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The Spark-side plumbing is real — binary columns, schema, Arrow-batched
``mapInPandas`` with bounded batch sizes.  IMAGE decode/encode is real
too, with no media library: pure-Python codecs for uncompressed BMP and
8-bit RGB/RGBA PNG (stdlib zlib; full filter set on decode), with PIL
used instead when importable.  AUDIO decode is real for PCM WAV (the
stdlib ``wave`` module): feature extraction pools RMS energy over real
samples and ``sample_frames`` slices true time windows re-encoded as
standalone WAV clips.  Compressed audio and video decode is stubbed
(torchaudio/PyAV are not in this container) — swap ``_decode_stub`` for
a real decoder without touching the distribution strategy.

Scale notes: media blobs ride in parquet binary columns; per-batch
processing via mapInPandas keeps peak executor memory at
(arrow batch size x mean blob size); feature extraction emits fixed-size
vectors so downstream ops are columnar again.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("modality", StringType(), False),  # image|audio|video
        StructField("content", BinaryType(), True),
        StructField("mime_type", StringType(), True),
        StructField("meta_json", StringType(), True),  # typed metadata as JSON
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("modality", StringType(), False),
        StructField("byte_len", LongType(), True),
        StructField("content_sha256", StringType(), True),
        StructField("feature", ArrayType(DoubleType()), True),
    ]
)


def _run_with_bounded_arrow_batches(
    plan: DataFrame, batch_rows: int, eager: bool
) -> DataFrame:
    """Apply the ``spark.sql.execution.arrow.maxRecordsPerBatch``
    bound for a blob-processing plan.

    Eager (the batch default): save the conf, set it, materialize the
    plan as a localCheckpoint, restore in a finally — same contract as
    transfer_tree (sources/transfer.py).  The bound only matters while
    the Arrow job actually runs, and a lazily-returned frame cannot
    guarantee it (the conf could be overwritten before the first
    action).  The materialized output is bounded-size for every caller
    here (fixed-dim vectors, resized thumbnails, frame slices).

    Lazy (``eager=False``, and ALWAYS for streaming frames — a
    streaming Dataset cannot be checkpointed or materialized here):
    set the conf and return the plan untouched.  The bound then
    applies only as long as the session conf survives until the
    action/stream runs — best-effort, and deliberately NOT restored,
    since there is no job boundary to restore after.  Callers that
    need incremental evaluation (``.limit`` probes, direct streaming
    into a sink) choose this and own the conf.
    """
    spark = plan.sparkSession
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    if plan.isStreaming or not eager:
        spark.conf.set(key, str(batch_rows))
        return plan
    prev = spark.conf.get(key, "10000")
    spark.conf.set(key, str(batch_rows))
    try:
        return plan.localCheckpoint(eager=True)
    finally:
        spark.conf.set(key, prev)


def attach_binary_metadata(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Columnar (no-UDF) metadata over a binary column: byte length +
    sha256 — the cheap pass that runs before any decode fan-out."""
    c = F.col(content_col)
    return df.withColumn("byte_len", F.octet_length(c).cast("bigint")).withColumn(
        "content_sha256", F.sha2(c, 256)
    )


def _decode_stub(blob: bytes | None, modality: str, dim: int) -> list[float]:
    """Deterministic fake feature vector for blobs no decoder handles
    (synthetic stand-ins, unsupported codecs, compressed audio/video
    without torchaudio/PyAV).  Real decode paths exist above it:
    pure-Python BMP/PNG pixels and PCM-WAV samples always, any
    PIL-supported image format when PIL is importable — see
    :func:`_decode_features`.
    """
    if blob is None:
        return [0.0] * dim
    h = 2166136261
    for b in blob[:256]:
        h = ((h ^ b) * 16777619) & 0xFFFFFFFF
    return [((h >> (i % 24)) & 0xFF) / 255.0 for i in range(dim)]


def _decode_bmp_pixels(blob: bytes) -> list[tuple[int, int, int]] | None:
    """REAL pixel decode for uncompressed 24/32-bit BI_RGB BMPs from
    raw bytes — no media library.  Returns scan-order (top-to-bottom,
    left-to-right) RGB tuples, honoring bottom-up row order and 4-byte
    row padding; None for anything it can't handle (compressed,
    paletted, truncated)."""
    whp = _decode_bmp_wh_pixels(blob)
    return None if whp is None else whp[2]


def _decode_bmp_wh_pixels(
    blob: bytes,
) -> tuple[int, int, list[tuple[int, int, int]]] | None:
    """(width, height, scan-order RGB pixels) for uncompressed BMPs;
    None when unparseable (see :func:`_decode_bmp_pixels`)."""
    if len(blob) < 54 or blob[:2] != b"BM":
        return None
    data_off = int.from_bytes(blob[10:14], "little")
    width = int.from_bytes(blob[18:22], "little", signed=True)
    height = int.from_bytes(blob[22:26], "little", signed=True)
    bpp = int.from_bytes(blob[28:30], "little")
    compression = int.from_bytes(blob[30:34], "little")
    if compression != 0 or bpp not in (24, 32) or width <= 0 or height == 0:
        return None
    top_down = height < 0
    height = abs(height)
    if width * height > _MAX_IMAGE_PIXELS:
        # BMP lacked the declared-size guard the PNG/JPEG paths have;
        # a 192 MB valid blob would otherwise make a ~4.5 GB tuple list
        return None
    bytes_pp = bpp // 8
    row_stride = (width * bytes_pp + 3) & ~3
    if data_off + row_stride * height > len(blob):
        return None
    rows = range(height) if top_down else range(height - 1, -1, -1)
    px: list[tuple[int, int, int]] = []
    for r in rows:
        base = data_off + r * row_stride
        for c in range(width):
            i = base + c * bytes_pp
            # BMP stores BGR(A)
            px.append((blob[i + 2], blob[i + 1], blob[i]))
    return width, height, px


def _encode_bmp24(
    width: int, height: int, pixels_rgb: list[tuple[int, int, int]]
) -> bytes:
    """Minimal uncompressed 24-bit bottom-up BMP from scan-order RGB —
    the encode twin of :func:`_decode_bmp_wh_pixels`, so resized
    images stay decodable by this module (and by everything else;
    it's a spec-conformant BI_RGB file)."""
    row_raw = width * 3
    stride = (row_raw + 3) & ~3
    data_off = 54
    size = data_off + stride * height
    hdr = (
        b"BM" + size.to_bytes(4, "little") + b"\x00\x00\x00\x00"
        + data_off.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + width.to_bytes(4, "little", signed=True)
        + height.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little") + (stride * height).to_bytes(4, "little")
        + b"\x00" * 16
    )
    body = bytearray()
    for r in range(height - 1, -1, -1):  # bottom-up storage
        for c in range(width):
            rr, gg, bb = pixels_rgb[r * width + c]
            body += bytes((bb, gg, rr))
        body += b"\x00" * (stride - row_raw)
    return hdr + bytes(body)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"

#: refuse to decode images whose headers declare more pixels than this.
#: Corpus blobs are untrusted, and the threat is a worker stall/OOM:
#: these pure-Python decoders materialize list[tuple[int,int,int]]
#: (~70-80 bytes/pixel), so the cap bounds DECODED WORKING SET, not
#: raw bytes — 16 MP ≈ ~1.2 GB of tuples, the most one mapInPandas
#: worker should ever spend on a single adversarial-but-valid blob.
#: A real deployment swaps these codecs for a native media library and
#: can raise the cap; the Spark-side plumbing is unchanged.
_MAX_IMAGE_PIXELS = 16_000_000

#: tighter cap for the pure-Python JPEG path: Huffman + per-block IDCT
#: in Python runs ~100x slower than the PNG filter passes, so a valid
#: image under the general cap could still stall a worker for hours.
#: 4 MP keeps worst-case single-blob decode in the minutes, not hours.
_MAX_JPEG_PIXELS = 4_000_000


def _png_paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _decode_png_wh_pixels(
    blob: bytes,
) -> tuple[int, int, list[tuple[int, int, int]]] | None:
    """(width, height, scan-order RGB pixels) for 8-bit RGB/RGBA
    non-interlaced PNGs — pure Python + stdlib zlib, no media library.
    Implements the full filter set (None/Sub/Up/Average/Paeth), so
    files from any conformant encoder decode, not just this module's
    filter-0 output.  Alpha is dropped.  None for anything else
    (paletted, 16-bit, interlaced, truncated, bad CRC lengths)."""
    import zlib  # noqa: PLC0415

    if len(blob) < 8 + 25 or blob[:8] != _PNG_SIG:
        return None
    pos = 8
    width = height = bpp = 0
    idat = bytearray()
    try:
        while pos + 8 <= len(blob):
            clen = int.from_bytes(blob[pos : pos + 4], "big")
            ctype = blob[pos + 4 : pos + 8]
            data = blob[pos + 8 : pos + 8 + clen]
            if len(data) != clen:
                return None
            if ctype == b"IHDR":
                if clen != 13:
                    return None
                width = int.from_bytes(data[0:4], "big")
                height = int.from_bytes(data[4:8], "big")
                bit_depth, color_type = data[8], data[9]
                interlace = data[12]
                if bit_depth != 8 or interlace != 0 or color_type not in (2, 6):
                    return None
                if width * height > _MAX_IMAGE_PIXELS:
                    # adversarial blob claiming absurd dims: refuse
                    # before allocating anything near that size (the
                    # image twin of the WAV zero-rate guard below)
                    return None
                bpp = 3 if color_type == 2 else 4
            elif ctype == b"IDAT":
                idat += data
            elif ctype == b"IEND":
                break
            pos += 12 + clen  # len + type + data + crc
        if not width or not height or not idat:
            return None
        # bound the inflate by the size the parsed IHDR says the image
        # needs: a decompression-bomb IDAT (tiny blob, huge inflate)
        # stops at expected+1 bytes instead of OOMing the mapInPandas
        # worker — the length check below then rejects it as oversized
        stride = width * bpp
        expected = (stride + 1) * height
        d = zlib.decompressobj()
        raw = d.decompress(bytes(idat), expected + 1)
    except (zlib.error, ValueError):
        return None
    if len(raw) != expected:
        # oversized (a bomb hit the max_length cap at expected+1) or
        # truncated — either way, not the image the IHDR declared
        return None
    px: list[tuple[int, int, int]] = []
    prior = bytearray(stride)
    for r in range(height):
        base = r * (stride + 1)
        filt = raw[base]
        line = bytearray(raw[base + 1 : base + 1 + stride])
        if filt == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif filt == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prior[i]) & 0xFF
        elif filt == 3:  # Average
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((left + prior[i]) >> 1)) & 0xFF
        elif filt == 4:  # Paeth
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                ul = prior[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + _png_paeth(left, prior[i], ul)) & 0xFF
        elif filt != 0:
            return None
        for c in range(width):
            i = c * bpp
            px.append((line[i], line[i + 1], line[i + 2]))
        prior = line
    return width, height, px


def _encode_png24(
    width: int, height: int, pixels_rgb: list[tuple[int, int, int]]
) -> bytes:
    """Minimal spec-conformant 8-bit RGB non-interlaced PNG (filter 0
    rows, one zlib IDAT) from scan-order RGB — the encode twin of
    :func:`_decode_png_wh_pixels`."""
    import struct  # noqa: PLC0415
    import zlib  # noqa: PLC0415

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    raw = bytearray()
    for r in range(height):
        raw.append(0)  # filter: None
        for c in range(width):
            raw += bytes(pixels_rgb[r * width + c])
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + chunk(b"IEND", b"")
    )


# -- baseline JPEG decode (pure Python, ITU T.81 Annex F) -------------------

#: zigzag scan order -> natural (row*8+col) index, per T.81 Figure A.6
_JPEG_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

#: separable 8-point IDCT basis: _IDCT_COS[x][u] = C(u)/2 * cos((2x+1)u*pi/16)
_IDCT_COS = [
    [
        (0.3535533905932738 if u == 0 else 0.5)
        * __import__("math").cos((2 * x + 1) * u * 3.141592653589793 / 16)
        for u in range(8)
    ]
    for x in range(8)
]


def _jpeg_huff_table(bits: list[int], vals: bytes) -> dict[tuple[int, int], int]:
    """Canonical Huffman decode map {(code_length, code): symbol} from a
    DHT segment's BITS/HUFFVAL lists (T.81 Annex C code assignment)."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _JpegBitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    byte-unstuffing; stops at any real marker (restart handling is the
    caller's job via :meth:`sync_restart`)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self._d = data
        self._pos = pos
        self._bits = 0
        self._acc = 0

    def read_bit(self) -> int:
        if self._bits == 0:
            d, p = self._d, self._pos
            if p >= len(d):
                raise EOFError
            byte = d[p]
            p += 1
            if byte == 0xFF:
                if p < len(d) and d[p] == 0x00:
                    p += 1  # stuffed 0xFF data byte
                else:
                    raise EOFError  # a real marker: scan data ended
            self._pos = p
            self._acc = byte
            self._bits = 8
        self._bits -= 1
        return (self._acc >> self._bits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_huff(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")

    def sync_restart(self, n: int) -> bool:
        """Skip to just past the RSTn marker expected next; returns
        False when the stream does not hold one where it should."""
        self._bits = 0  # discard pad bits to the byte boundary
        d, p = self._d, self._pos
        while p + 1 < len(d) and d[p] == 0xFF and d[p + 1] == 0xFF:
            p += 1  # fill bytes
        if p + 1 < len(d) and d[p] == 0xFF and d[p + 1] == 0xD0 + (n & 7):
            self._pos = p + 2
            return True
        return False


def _jpeg_extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map a t-bit magnitude to its signed value."""
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


def _jpeg_idct_block(coef: list[float]) -> list[int]:
    """8x8 2-D IDCT (two separable 8-point passes over the precomputed
    cosine basis) + level shift; returns 64 clamped samples."""
    tmp = [0.0] * 64
    for r in range(8):
        base = r * 8
        row = coef[base : base + 8]
        for x in range(8):
            cx = _IDCT_COS[x]
            tmp[base + x] = (
                cx[0] * row[0] + cx[1] * row[1] + cx[2] * row[2]
                + cx[3] * row[3] + cx[4] * row[4] + cx[5] * row[5]
                + cx[6] * row[6] + cx[7] * row[7]
            )
    out = [0] * 64
    for c in range(8):
        col = tmp[c::8]
        for y in range(8):
            cy = _IDCT_COS[y]
            v = (
                cy[0] * col[0] + cy[1] * col[1] + cy[2] * col[2]
                + cy[3] * col[3] + cy[4] * col[4] + cy[5] * col[5]
                + cy[6] * col[6] + cy[7] * col[7]
            )
            s = int(v + 128.5) if v >= -128.5 else 0
            out[y * 8 + c] = 255 if s > 255 else (0 if s < 0 else s)
    return out


def _decode_jpeg_wh_pixels(
    blob: bytes,
) -> tuple[int, int, list[tuple[int, int, int]]] | None:
    """(width, height, scan-order RGB pixels) for BASELINE and extended
    sequential JPEGs (SOF0/SOF1, 8-bit, 1 or 3 components, any
    sampling factors, restart intervals) — pure Python, no media
    library; the lossy twin of :func:`_decode_png_wh_pixels` and the
    web's dominant image format (round-7 verdict item).  Huffman
    entropy decode + dequant + 8x8 IDCT per T.81 Annex F; chroma
    upsampled nearest-neighbor; JFIF YCbCr -> RGB.  None for
    progressive (SOF2), arithmetic, hierarchical, 12-bit, CMYK, or
    malformed input.  Slow path by design — PIL takes precedence in
    :func:`_decode_image_pixels` when importable."""
    if blob[:3] != b"\xff\xd8\xff":
        return None
    try:
        qt: dict[int, list[int]] = {}
        huff: dict[tuple[int, int], dict] = {}
        frame = None
        restart_interval = 0
        i = 2
        scan = None
        while i + 1 < len(blob):
            if blob[i] != 0xFF:
                return None
            while i < len(blob) and blob[i] == 0xFF:
                i += 1
            if i >= len(blob):
                return None
            marker = blob[i]
            i += 1
            if marker == 0xD9:  # EOI before SOS
                return None
            if marker == 0x01 or 0xD0 <= marker <= 0xD7:
                continue
            if i + 2 > len(blob):
                return None
            seg_len = int.from_bytes(blob[i : i + 2], "big")
            seg = blob[i + 2 : i + seg_len]
            if len(seg) != seg_len - 2:
                return None
            i += seg_len
            if marker == 0xDB:  # DQT
                p = 0
                while p < len(seg):
                    pq, tq = seg[p] >> 4, seg[p] & 0xF
                    p += 1
                    if pq == 0:
                        qt[tq] = list(seg[p : p + 64])
                        p += 64
                    elif pq == 1:
                        qt[tq] = [
                            int.from_bytes(seg[p + 2 * k : p + 2 * k + 2], "big")
                            for k in range(64)
                        ]
                        p += 128
                    else:
                        return None
            elif marker in (0xC0, 0xC1):  # SOF0 / SOF1
                precision = seg[0]
                if precision != 8:
                    return None
                h = int.from_bytes(seg[1:3], "big")
                w = int.from_bytes(seg[3:5], "big")
                nc = seg[5]
                if nc not in (1, 3) or not w or not h:
                    return None
                if w * h > _MAX_JPEG_PIXELS:
                    return None
                comps = []
                for c in range(nc):
                    cid = seg[6 + 3 * c]
                    hv = seg[7 + 3 * c]
                    comps.append(
                        (cid, hv >> 4, hv & 0xF, seg[8 + 3 * c])
                    )
                frame = (w, h, comps)
            elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                            0xCB, 0xCD, 0xCE, 0xCF):
                return None  # progressive/arithmetic/lossless/hierarchical
            elif marker == 0xC4:  # DHT
                p = 0
                while p + 17 <= len(seg):
                    tc, th = seg[p] >> 4, seg[p] & 0xF
                    bits = list(seg[p + 1 : p + 17])
                    n = sum(bits)
                    vals = seg[p + 17 : p + 17 + n]
                    if len(vals) != n:
                        return None
                    huff[(tc, th)] = _jpeg_huff_table(bits, vals)
                    p += 17 + n
            elif marker == 0xDD:  # DRI
                restart_interval = int.from_bytes(seg[0:2], "big")
            elif marker == 0xDA:  # SOS
                ns = seg[0]
                scan = [
                    (seg[1 + 2 * c], seg[2 + 2 * c] >> 4, seg[2 + 2 * c] & 0xF)
                    for c in range(ns)
                ]
                break
        if frame is None or scan is None:
            return None
        w, h, comps = frame
        if len(scan) != len(comps):
            return None  # multi-scan (non-interleaved color) baseline
        if len(comps) == 1:
            # a single-component scan is NON-INTERLEAVED per T.81: one
            # data unit per MCU in raster order over ceil(w/8) x
            # ceil(h/8) blocks — the declared sampling factors only
            # mean something relative to other components, so decoding
            # hs*vs blocks per MCU (the interleaved rule) would garble
            # a grayscale file that legally declares e.g. 2x2.
            # Normalizing the factors to 1x1 makes the interleaved
            # loop below degenerate to exactly the raster walk.
            cid0, _, _, qid0 = comps[0]
            comps = [(cid0, 1, 1, qid0)]
        tables_of = {cid: (dc, ac) for cid, dc, ac in scan}
        # data units inside an interleaved MCU follow the SCAN header's
        # component order, which may legally differ from SOF order —
        # iterating SOF order would silently swap planes.  Duplicate
        # component ids (malformed) must REFUSE: a last-wins map would
        # leave one plane never written and another decoded twice with
        # doubly-advanced DC predictors — garbage pixels instead of
        # the decoder's None-on-malformed contract.
        cid_to_idx = {c[0]: i for i, c in enumerate(comps)}
        if len(cid_to_idx) != len(comps):
            return None
        scan_cids = [cid for cid, _, _ in scan]
        if len(set(scan_cids)) != len(scan_cids) or any(
            cid not in cid_to_idx for cid in scan_cids
        ):
            return None
        scan_order = [cid_to_idx[cid] for cid, _, _ in scan]
        hmax = max(c[1] for c in comps)
        vmax = max(c[2] for c in comps)
        if not hmax or not vmax:
            return None
        mcus_x = -(-w // (8 * hmax))
        mcus_y = -(-h // (8 * vmax))
        planes = []
        for cid, hs, vs, qid in comps:
            if qid not in qt or tables_of.get(cid) is None:
                return None
            pw, ph = mcus_x * hs * 8, mcus_y * vs * 8
            planes.append(bytearray(pw * ph))
        reader = _JpegBitReader(blob, i)
        pred = [0] * len(comps)
        rst = 0
        mcu = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if restart_interval and mcu and mcu % restart_interval == 0:
                    if not reader.sync_restart(rst):
                        return None
                    rst = (rst + 1) & 7
                    pred = [0] * len(comps)
                mcu += 1
                for ci in scan_order:
                    cid, hs, vs, qid = comps[ci]
                    dc_t = huff.get((0, tables_of[cid][0]))
                    ac_t = huff.get((1, tables_of[cid][1]))
                    if dc_t is None or ac_t is None:
                        return None
                    q = qt[qid]
                    pw = mcus_x * hs * 8
                    for by in range(vs):
                        for bx in range(hs):
                            coef = [0.0] * 64
                            t = reader.decode_huff(dc_t)
                            diff = _jpeg_extend(reader.read_bits(t), t)
                            pred[ci] += diff
                            coef[0] = pred[ci] * q[0]
                            k = 1
                            while k < 64:
                                rs = reader.decode_huff(ac_t)
                                r, s = rs >> 4, rs & 0xF
                                if s == 0:
                                    if r == 15:
                                        k += 16  # ZRL
                                        continue
                                    break  # EOB
                                k += r
                                if k > 63:
                                    return None
                                coef[_JPEG_ZIGZAG[k]] = (
                                    _jpeg_extend(reader.read_bits(s), s)
                                    * q[k]
                                )
                                k += 1
                            block = _jpeg_idct_block(coef)
                            x0 = (mx * hs + bx) * 8
                            y0 = (my * vs + by) * 8
                            plane = planes[ci]
                            for r8 in range(8):
                                row = (y0 + r8) * pw + x0
                                plane[row : row + 8] = bytes(
                                    block[r8 * 8 : r8 * 8 + 8]
                                )
        px: list[tuple[int, int, int]] = []
        if len(comps) == 1:
            pw = mcus_x * comps[0][1] * 8
            plane = planes[0]
            for y in range(h):
                base = y * pw
                for x in range(w):
                    g = plane[base + x]
                    px.append((g, g, g))
            return w, h, px
        (_, yh, yv, _), (_, bh, bv, _), (_, rh, rv, _) = comps
        pys, pcb, pcr = planes
        wy, wb, wr = mcus_x * yh * 8, mcus_x * bh * 8, mcus_x * rh * 8
        for y in range(h):
            ry = (y * yv // vmax) * wy
            rb = (y * bv // vmax) * wb
            rr = (y * rv // vmax) * wr
            for x in range(w):
                Y = pys[ry + (x * yh // hmax)]
                cb = pcb[rb + (x * bh // hmax)] - 128
                cr = pcr[rr + (x * rh // hmax)] - 128
                r = int(Y + 1.402 * cr + 0.5)
                g = int(Y - 0.344136 * cb - 0.714136 * cr + 0.5)
                b = int(Y + 1.772 * cb + 0.5)
                px.append(
                    (
                        255 if r > 255 else (0 if r < 0 else r),
                        255 if g > 255 else (0 if g < 0 else g),
                        255 if b > 255 else (0 if b < 0 else b),
                    )
                )
        return w, h, px
    except (EOFError, ValueError, IndexError):
        return None


def _resize_nearest(
    px: list[tuple[int, int, int]],
    w: int,
    h: int,
    out_w: int,
    out_h: int,
) -> list[tuple[int, int, int]]:
    """Nearest-neighbor resample (floor sampling, the deterministic
    classic) — identical output whichever decoder produced the
    pixels."""
    out = []
    for oy in range(out_h):
        sy = min(h - 1, oy * h // out_h)
        row = sy * w
        for ox in range(out_w):
            sx = min(w - 1, ox * w // out_w)
            out.append(px[row + sx])
    return out


def _decode_image_pixels(
    blob: bytes,
) -> tuple[int, int, list[tuple[int, int, int]]] | None:
    """(w, h, RGB pixels) via PIL when importable (any format it
    supports), else the pure-Python JPEG/PNG/BMP parsers; None if
    undecodable."""
    pil = _try_pil()
    if pil is not None:
        try:
            import io  # noqa: PLC0415

            img = pil.open(io.BytesIO(blob)).convert("RGB")
            w, h = img.size
            return w, h, list(img.getdata())
        except Exception:  # noqa: BLE001 - fall through to pure paths
            pass
    if blob[:8] == _PNG_SIG:
        return _decode_png_wh_pixels(blob)
    if blob[:3] == b"\xff\xd8\xff":
        return _decode_jpeg_wh_pixels(blob)
    return _decode_bmp_wh_pixels(blob)


def resize_images(
    df: DataFrame,
    out_w: int = 64,
    out_h: int = 64,
    content_col: str = "content",
    id_col: str = "media_id",
    batch_rows: int = 64,
    eager: bool = True,
    out_format: str = "bmp",
) -> DataFrame:
    """REAL image resize over the binary column: decode (PIL or the
    pure-Python PNG/BMP paths), nearest-neighbor resample to
    ``out_w x out_h``, re-encode as uncompressed BMP (default) or PNG
    (``out_format="png"`` — zlib-compressed, ~3-5x smaller for typical
    content, the right sharding trade when the shards travel) — the
    normalize-resolution pass a vision-training pipeline runs before
    sharding.  Undecodable blobs pass through with ``resized=false``
    and their original bytes, so the operator never drops rows.

    Arrow-batched ``mapInPandas``; blobs never leave the executor,
    and output size is bounded (out_w x out_h x 3 + header per row)
    regardless of input resolution.

    ``eager=False`` (and any streaming input) returns the plan lazily
    with the Arrow ``maxRecordsPerBatch`` session conf set and
    deliberately NOT restored — there is no job boundary to restore
    after, so the CALLER owns the conf from then on (see
    :func:`_run_with_bounded_arrow_batches`).
    """
    if out_format not in ("bmp", "png"):
        raise ValueError(f"out_format must be bmp or png, got {out_format!r}")
    encode, out_mime = (
        (_encode_bmp24, "image/bmp")
        if out_format == "bmp"
        else (_encode_png24, "image/png")
    )
    schema = (
        f"{id_col} long, content binary, mime_type string, "
        "width int, height int, resized boolean"
    )

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs, mimes, ws, hs, flags = [], [], [], [], [], []
            for _, row in pdf.iterrows():
                blob = row[content_col]
                ids.append(row[id_col])
                whp = (
                    _decode_image_pixels(bytes(blob))
                    if blob is not None
                    else None
                )
                if whp is None:
                    blobs.append(blob)
                    mimes.append(None)
                    ws.append(None)
                    hs.append(None)
                    flags.append(False)
                else:
                    w, h, px = whp
                    small = _resize_nearest(px, w, h, out_w, out_h)
                    blobs.append(encode(out_w, out_h, small))
                    mimes.append(out_mime)
                    ws.append(out_w)
                    hs.append(out_h)
                    flags.append(True)
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "content": blobs,
                    "mime_type": mimes,
                    "width": pd.array(ws, dtype="Int32"),
                    "height": pd.array(hs, dtype="Int32"),
                    "resized": flags,
                }
            )

    return _run_with_bounded_arrow_batches(
        df.mapInPandas(process, schema=schema), batch_rows, eager
    )


def _try_pil():
    try:  # noqa: SIM105
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None


def _pool_pixel_features(
    px: list[tuple[int, int, int]], dim: int
) -> list[float]:
    """Decoder-agnostic pooling: mean luminance over ``dim`` equal
    scan-order chunks, in [0, 1].  The SAME function consumes PIL and
    pure-BMP pixel lists, so a BMP's feature vector is identical
    whichever decoder produced the pixels."""
    n = len(px)
    if n == 0:
        return [0.0] * dim
    out = []
    for i in range(dim):
        lo = i * n // dim
        hi = max(lo + 1, (i + 1) * n // dim)
        s = 0.0
        for r, g, b in px[lo:hi]:
            s += 0.299 * r + 0.587 * g + 0.114 * b
        out.append(round(s / ((hi - lo) * 255.0), 6))
    return out


def _decode_wav_samples(
    blob: bytes,
) -> tuple[int, int, list[float]] | None:
    """(sample_rate, n_channels, mono-mixed samples in [-1, 1]) for
    PCM WAV — the stdlib ``wave`` module, no media library.  Supports
    8/16/32-bit integer PCM; None for anything it can't parse
    (compressed WAV, float PCM, truncated, non-RIFF)."""
    import io  # noqa: PLC0415
    import struct  # noqa: PLC0415
    import wave  # noqa: PLC0415

    if len(blob) < 44 or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        return None
    try:
        with wave.open(io.BytesIO(bytes(blob))) as w:
            nch = w.getnchannels()
            width = w.getsampwidth()
            rate = w.getframerate()
            frames = w.readframes(w.getnframes())
    except (wave.Error, EOFError, struct.error):
        return None
    if rate <= 0 or nch <= 0:
        # the stdlib parser accepts a fmt chunk declaring rate 0; a
        # downstream ts = pos/rate would then ZeroDivision inside
        # mapInPandas and fail the whole job on one adversarial blob
        return None
    if width == 1:  # 8-bit PCM is UNSIGNED
        ints = [b - 128 for b in frames]
        scale = 128.0
    elif width == 2:
        ints = list(
            struct.unpack(f"<{len(frames) // 2}h", frames)
        )
        scale = 32768.0
    elif width == 4:
        ints = list(
            struct.unpack(f"<{len(frames) // 4}i", frames)
        )
        scale = 2147483648.0
    else:
        return None
    if nch > 1:  # mono-mix interleaved channels
        ints = [
            sum(ints[i : i + nch]) / nch
            for i in range(0, len(ints) - nch + 1, nch)
        ]
    return rate, nch, [s / scale for s in ints]


def _encode_wav16(
    rate: int, samples: list[float], n_channels: int = 1
) -> bytes:
    """Minimal 16-bit PCM WAV from mono samples in [-1, 1] — the
    encode twin of :func:`_decode_wav_samples` (channels duplicated
    when n_channels > 1)."""
    import io  # noqa: PLC0415
    import struct  # noqa: PLC0415
    import wave  # noqa: PLC0415

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        ints = [
            max(-32768, min(32767, int(round(s * 32767.0))))
            for s in samples
        ]
        frames = b"".join(
            struct.pack("<h", v) * n_channels for v in ints
        )
        w.writeframes(frames)
    return buf.getvalue()


def _pool_audio_features(samples: list[float], dim: int) -> list[float]:
    """Decoder-agnostic audio pooling: RMS energy over ``dim`` equal
    time chunks, in [0, 1] — the audio analog of
    :func:`_pool_pixel_features` (same chunking arithmetic, so the
    feature layout is uniform across modalities)."""
    n = len(samples)
    if n == 0:
        return [0.0] * dim
    out = []
    for i in range(dim):
        lo = i * n // dim
        hi = max(lo + 1, (i + 1) * n // dim)
        s = 0.0
        for v in samples[lo:hi]:
            s += v * v
        out.append(round((s / (hi - lo)) ** 0.5, 6))
    return out


def _decode_features(blob: bytes | None, modality: str, dim: int) -> list[float]:
    """Feature vector for one blob: REAL decode where a decoder exists
    (images: PIL for any format it supports, pure-Python JPEG/PNG/BMP
    otherwise; audio: stdlib PCM WAV), deterministic stub otherwise
    (compressed audio/video need torchaudio/PyAV, absent in this
    environment)."""
    if blob is None:
        return [0.0] * dim
    if modality == "image":
        whp = _decode_image_pixels(bytes(blob))
        if whp is not None:
            return _pool_pixel_features(whp[2], dim)
    if modality == "audio":
        dec = _decode_wav_samples(bytes(blob))
        if dec is not None:
            return _pool_audio_features(dec[2], dim)
    return _decode_stub(blob, modality, dim)


def extract_features(
    media: DataFrame, dim: int = 8, batch_rows: int = 64, eager: bool = True
) -> DataFrame:
    """Arrow-batched feature extraction over binary media columns.

    ``mapInPandas`` so each Python worker sees bounded pandas batches;
    the output is a fixed-width vector column ready for the similarity
    operators (llmdata.similarity).

    ``eager=False`` (and any streaming input) returns the plan lazily
    with the Arrow ``maxRecordsPerBatch`` session conf set and
    deliberately NOT restored — no job boundary to restore after; the
    caller owns the conf (see :func:`_run_with_bounded_arrow_batches`).
    """
    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib  # local import: runs on executors

        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "byte_len": [
                        len(b) if b is not None else 0 for b in pdf["content"]
                    ],
                    "content_sha256": [
                        hashlib.sha256(b).hexdigest() if b is not None else None
                        for b in pdf["content"]
                    ],
                    "feature": [
                        _decode_features(b, m, dim)
                        for b, m in zip(pdf["content"], pdf["modality"])
                    ],
                }
            )
            yield out

    return _run_with_bounded_arrow_batches(
        media.mapInPandas(process, schema=FEATURE_SCHEMA), batch_rows, eager
    )


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter used in tests/benchmarks: treat document text bytes as an
    opaque blob so the media plumbing is exercised on real testdata."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("modality"),
        F.encode("text", "UTF-8").alias("content"),
        F.lit("application/octet-stream").alias("mime_type"),
        F.to_json(F.struct(F.col("n_chars"), F.col("lang"))).alias("meta_json"),
    )


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", LongType(), False),
        StructField("frame_ts_ms", LongType(), True),
        StructField("frame_bytes", BinaryType(), True),
        StructField("frame_sha256", StringType(), True),
    ]
)


def _frame_slices_stub(
    blob: bytes | None, n_frames: int, duration_ms: int
) -> list[tuple[int, int, bytes]]:
    """Deterministic fake frame sampler: slices the blob into
    ``n_frames`` even byte windows with evenly spaced fake timestamps.
    A real implementation seeks the container (ffmpeg/PyAV) and decodes
    the frame nearest each timestamp; the Spark-side contract — one
    input row fans out to n_frames rows, bounded bytes each — is
    exactly the same.
    """
    if not blob:
        return []
    step = max(1, len(blob) // n_frames)
    out = []
    for i in range(n_frames):
        lo = i * step
        if lo >= len(blob):
            break
        ts = (duration_ms * i) // max(1, n_frames)
        out.append((i, ts, blob[lo : lo + step]))
    return out


def _frame_slices(
    blob: bytes | None, n_frames: int, duration_ms: int
) -> list[tuple[int, int, bytes]]:
    """Frame/clip sampler with REAL audio and VIDEO paths: a PCM WAV
    blob is decoded (stdlib), sliced into ``n_frames`` even TIME
    windows with true sample-rate-derived timestamps, each re-encoded
    as a standalone 16-bit WAV clip; a GIF clip (round-8: the real
    pure-Python codec) is decoded, ``n_frames`` frames sampled evenly
    across the timeline, each COMPOSED frame re-encoded as a
    standalone BMP still with its true delay-accumulated timestamp.
    Anything else (mp4 etc., compressed audio) falls to the
    byte-window stub — same output contract either way."""
    if blob:
        if bytes(blob[:6]) in (b"GIF87a", b"GIF89a"):
            dec = _decode_gif_frames(bytes(blob))
            if dec is not None:
                w, h, frames = dec
                ts_ms, acc = [], 0
                for delay_cs, _arr in frames:
                    ts_ms.append(acc)
                    acc += max(1, delay_cs) * 10
                k = min(n_frames, len(frames))
                picks = sorted(
                    {(i * len(frames)) // k for i in range(k)}
                )
                out = []
                for j, fi in enumerate(picks):
                    arr = frames[fi][1]
                    px = [
                        tuple(int(v) for v in p)
                        for p in arr.reshape(-1, 3)
                    ]
                    out.append(
                        (j, ts_ms[fi], _encode_bmp24(w, h, px))
                    )
                return out
        dec = _decode_wav_samples(bytes(blob))
        if dec is not None:
            rate, _, samples = dec
            n = len(samples)
            if n == 0:
                return []
            step = max(1, n // n_frames)
            out = []
            for i in range(n_frames):
                lo = i * step
                if lo >= n:
                    break
                out.append(
                    (
                        i,
                        int(lo * 1000 / rate),
                        _encode_wav16(rate, samples[lo : lo + step]),
                    )
                )
            return out
    return _frame_slices_stub(blob, n_frames, duration_ms)


def sample_frames(
    media: DataFrame,
    n_frames: int = 4,
    duration_ms: int = 10_000,
    batch_rows: int = 16,
    eager: bool = True,
) -> DataFrame:
    """Video frame sampling as a mapInPandas fan-out: each media row
    yields up to ``n_frames`` frame rows (frame index, timestamp,
    frame bytes, sha256).

    Scale shape: the fan-out happens INSIDE the Arrow batch (one input
    row -> n rows in the emitted frame), so there is no explode of
    multi-megabyte blobs through a shuffle — frames leave the worker
    already sliced, and ``batch_rows`` bounds peak memory at
    (batch_rows x blob size).  PCM WAV blobs take a REAL path — decoded
    with the stdlib, sliced into even time windows with sample-rate
    timestamps, each re-encoded as a standalone WAV clip
    (:func:`_frame_slices`); other containers use the byte-window stub
    — swap in a real ffmpeg/PyAV seek without touching the
    distribution strategy.

    ``eager=False`` (and any streaming input) returns the plan lazily
    with the Arrow ``maxRecordsPerBatch`` session conf set and
    deliberately NOT restored — no job boundary to restore after; the
    caller owns the conf (see :func:`_run_with_bounded_arrow_batches`).
    """
    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib  # local import: runs on executors

        for pdf in batches:
            ids, idxs, tss, frames, shas = [], [], [], [], []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                for i, ts, fb in _frame_slices(
                    blob, n_frames, duration_ms
                ):
                    ids.append(mid)
                    idxs.append(i)
                    tss.append(ts)
                    frames.append(fb)
                    shas.append(hashlib.sha256(fb).hexdigest())
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "frame_idx": idxs,
                    "frame_ts_ms": tss,
                    "frame_bytes": frames,
                    "frame_sha256": shas,
                }
            )

    return _run_with_bounded_arrow_batches(
        media.mapInPandas(process, schema=FRAME_SCHEMA), batch_rows, eager
    )


SHARD_MANIFEST_SCHEMA = StructType(
    [
        StructField("shard_path", StringType(), False),
        StructField("n_members", LongType(), False),
        StructField("n_bytes", LongType(), False),
    ]
)

_MIME_EXT = {
    "image/jpeg": "jpg",
    "image/png": "png",
    "image/bmp": "bmp",  # resize_images re-encodes to BMP
    "audio/wav": "wav",
    "video/mp4": "mp4",
    "application/octet-stream": "bin",
}


def write_media_shards(
    media: DataFrame,
    out_dir: str,
    n_shards: int = 8,
    prefix: str = "shard",
) -> DataFrame:
    """WebDataset-style tar sharding: pack (media_id, content) rows
    into ``n_shards`` tar files, one per partition, members named
    ``{media_id}.{ext}`` with a sibling ``{media_id}.json`` metadata
    member — the standard loader-friendly layout for training on media
    blobs (sequential tar reads, no per-sample object-store requests).

    Executors write their own shard (stdlib tarfile, no media libs
    needed) and emit one manifest row each; the returned manifest
    DataFrame is the action that drives the write.  ``out_dir`` must
    be visible to the executors — local disk in local mode, a shared
    filesystem / object-store mount on a cluster.
    """
    import json as _json
    import os as _os

    def write_shard(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        import io
        import tarfile
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        path = _os.path.join(out_dir, f"{prefix}-{pid:05d}.tar")
        n = 0
        with tarfile.open(path, "w") as tar:
            for pdf in batches:
                for _, row in pdf.iterrows():
                    blob = row["content"]
                    if blob is None:
                        continue
                    ext = _MIME_EXT.get(row.get("mime_type"), "bin")
                    name = f"{row['media_id']}.{ext}"
                    info = tarfile.TarInfo(name)
                    info.size = len(blob)
                    tar.addfile(info, io.BytesIO(bytes(blob)))
                    meta = _json.dumps(
                        {
                            "media_id": int(row["media_id"]),
                            "modality": row.get("modality"),
                            # exact mime recorded so the reader can
                            # recover types outside _MIME_EXT (which
                            # all file under the 'bin' extension)
                            "mime_type": row.get("mime_type"),
                            "meta": row.get("meta_json"),
                        }
                    ).encode()
                    minfo = tarfile.TarInfo(f"{row['media_id']}.json")
                    minfo.size = len(meta)
                    tar.addfile(minfo, io.BytesIO(meta))
                    n += 1
        yield pd.DataFrame(
            {
                "shard_path": [path],
                "n_members": [n],
                "n_bytes": [_os.path.getsize(path)],
            }
        )

    _os.makedirs(out_dir, exist_ok=True)
    return media.repartition(n_shards).mapInPandas(
        write_shard, schema=SHARD_MANIFEST_SCHEMA
    )


_EXT_MIME = {v: k for k, v in _MIME_EXT.items()}


def read_media_shards(
    spark,
    shard_glob: str,
) -> DataFrame:
    """Read WebDataset-style tar shards back into (media_id, modality,
    content, mime_type, meta_json) rows — the inverse of
    :func:`write_media_shards`, closing the shard round-trip.

    Plan shape: ``binaryFile`` scan of the tar files (one row per
    shard, Spark handles listing/distribution/locality) into a
    ``mapInPandas`` that untars IN MEMORY and pairs each media member
    with its sibling ``{id}.json`` metadata member.  One shard is one
    task — the same sequential-read granularity training loaders use;
    shard size, not row count, bounds executor memory (size shards at
    write time, the knob ``n_shards`` exists for).
    """
    import json as _json

    schema = (
        "media_id long, modality string, content binary, "
        "mime_type string, meta_json string"
    )

    def untar(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import tarfile

        for pdf in batches:
            for _, row in pdf.iterrows():
                blobs: dict[int, bytes] = {}
                mimes: dict[int, str] = {}
                metas: dict[int, dict] = {}
                with tarfile.open(
                    fileobj=io.BytesIO(bytes(row["content"])), mode="r"
                ) as tar:
                    for m in tar.getmembers():
                        if not m.isfile():
                            continue  # dir / PAX / link entries
                        base = m.name.rsplit("/", 1)[-1]
                        stem, _, ext = base.rpartition(".")
                        if not stem.isdigit():
                            continue  # foreign member naming: skip, not crash
                        mid = int(stem)
                        f = tar.extractfile(m)
                        if f is None:
                            continue
                        data = f.read()
                        if ext == "json":
                            metas[mid] = _json.loads(data)
                        else:
                            blobs[mid] = data
                            mimes[mid] = _EXT_MIME.get(
                                ext, "application/octet-stream"
                            )
                ids = sorted(blobs)
                yield pd.DataFrame(
                    {
                        "media_id": ids,
                        "modality": [
                            metas.get(i, {}).get("modality") for i in ids
                        ],
                        "content": [blobs[i] for i in ids],
                        # sidecar mime (exact, survives non-_MIME_EXT
                        # types) wins over the extension-derived guess
                        "mime_type": [
                            metas.get(i, {}).get("mime_type") or mimes[i]
                            for i in ids
                        ],
                        "meta_json": [
                            metas.get(i, {}).get("meta") for i in ids
                        ],
                    }
                )

    shards = spark.read.format("binaryFile").load(shard_glob).select("content")
    return shards.mapInPandas(untar, schema=schema)


def _sniff_image(b: bytes | None) -> tuple[str | None, int | None, int | None]:
    """(format, width, height) from raw image bytes — REAL header
    parsing, no media libraries: PNG IHDR, JPEG SOF segment walk,
    GIF screen descriptor, BMP info header.  Anything else sniffs as
    'unknown' (including this repo's synthetic stand-in blobs)."""
    if not b:
        return (None, None, None)
    if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24:
        return (
            "png",
            int.from_bytes(b[16:20], "big"),
            int.from_bytes(b[20:24], "big"),
        )
    if b[:3] == b"\xff\xd8\xff":
        # walk segments to the first start-of-frame (any SOFn except
        # DHT/DAC/RST markers), where the 2-byte height/width live
        sof = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
               0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}
        i = 2
        while i < len(b) and b[i] == 0xFF:
            # spec-legal: any run of 0xFF fill bytes may pad a marker
            j = i
            while j < len(b) and b[j] == 0xFF:
                j += 1
            if j >= len(b):
                break
            marker = b[j]
            if marker in sof:
                if j + 8 <= len(b):
                    return (
                        "jpeg",
                        int.from_bytes(b[j + 6:j + 8], "big"),
                        int.from_bytes(b[j + 4:j + 6], "big"),
                    )
                break
            if marker == 0xD9 or marker == 0xDA:
                break  # EOI / start of entropy-coded scan: no SOF seen
            if marker == 0x01 or 0xD0 <= marker <= 0xD8:
                i = j + 1  # standalone marker: no length field follows
                continue
            if j + 3 > len(b):
                break
            i = j + 1 + int.from_bytes(b[j + 1:j + 3], "big")
        return ("jpeg", None, None)
    if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
        return (
            "gif",
            int.from_bytes(b[6:8], "little"),
            int.from_bytes(b[8:10], "little"),
        )
    if b[:2] == b"BM" and len(b) >= 26:
        return (
            "bmp",
            int.from_bytes(b[18:22], "little", signed=True),
            abs(int.from_bytes(b[22:26], "little", signed=True)),
        )
    return ("unknown", None, None)


def parse_image_headers(
    df: DataFrame, content_col: str = "content"
) -> DataFrame:
    """Attach (img_format, width, height) parsed from the binary
    column's file headers — the resolution-gating pass an image
    curation pipeline runs BEFORE paying for any decode: headers live
    in the first bytes, so the UDF touches O(segments) per blob, and
    the downstream filter (drop sub-256px images, route by format)
    becomes a plain column predicate.

    Unlike the stubbed pixel decode, this is a complete, real
    implementation: PNG/JPEG/GIF/BMP dimensions from the bytes alone.
    Arrow-batched pandas_udf; blobs never leave the executor.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("struct<img_format:string, width:int, height:int>")
    def _parse(content: pd.Series) -> pd.DataFrame:
        out = [_sniff_image(b) for b in content]
        return pd.DataFrame(
            {
                "img_format": [f for f, _, _ in out],
                "width": [w for _, w, _ in out],
                "height": [h for _, _, h in out],
            }
        )

    return (
        df.withColumn("__hdr", _parse(F.col(content_col)))
        .withColumn("img_format", F.col("__hdr.img_format"))
        .withColumn("width", F.col("__hdr.width"))
        .withColumn("height", F.col("__hdr.height"))
        .drop("__hdr")
    )


# ---------------------------------------------------------------------------
# Perceptual image near-dup (round-8): dHash + banded Hamming join
# ---------------------------------------------------------------------------


def _bmp_np_pixels(blob: bytes):
    """numpy fast path for the hot decode loop: (h, w, 3) uint8 RGB
    array for uncompressed 24/32-bit BI_RGB BMPs, byte-for-byte the
    same pixels as :func:`_decode_bmp_wh_pixels` (pinned by test) at
    ~100x the speed — per-pixel Python tuples are the difference
    between one slow task and a scan.  None when unparseable or over
    the pixel cap (same refusals as the pure path)."""
    import numpy as np  # noqa: PLC0415

    if len(blob) < 54 or blob[:2] != b"BM":
        return None
    data_off = int.from_bytes(blob[10:14], "little")
    width = int.from_bytes(blob[18:22], "little", signed=True)
    height = int.from_bytes(blob[22:26], "little", signed=True)
    bpp = int.from_bytes(blob[28:30], "little")
    compression = int.from_bytes(blob[30:34], "little")
    if compression != 0 or bpp not in (24, 32) or width <= 0 or height == 0:
        return None
    top_down = height < 0
    height = abs(height)
    if width * height > _MAX_IMAGE_PIXELS:
        return None
    bytes_pp = bpp // 8
    stride = (width * bytes_pp + 3) & ~3
    if data_off + stride * height > len(blob):
        return None
    rows = np.frombuffer(
        blob, np.uint8, count=stride * height, offset=data_off
    ).reshape(height, stride)
    px = rows[:, : width * bytes_pp].reshape(height, width, bytes_pp)
    px = px[:, :, 2::-1]  # BGR(A) -> RGB
    if not top_down:
        px = px[::-1]
    return px


def _dhash_bits(
    w: int, h: int, px, grid_w: int = 9, grid_h: int = 8
) -> int:
    """64-bit difference hash of decoded RGB pixels (tuple list or
    (h, w, 3) array): integer-luminance box-average downsample to a
    ``grid_w x grid_h`` grid, then one bit per horizontal gradient
    (cell < right neighbor).  All-integer math (no float rounding), so
    the hash is bit-identical across decoders and platforms.  Box
    averaging (not nearest sampling) makes the hash invariant under
    integer upscales and lossless re-encodes, and stable (small
    Hamming drift) under pixel noise and mild resamples — the dup
    classes a crawl corpus actually contains."""
    import numpy as np  # noqa: PLC0415

    arr = np.asarray(px, dtype=np.int64).reshape(h, w, 3)
    lum = (299 * arr[:, :, 0] + 587 * arr[:, :, 1] + 114 * arr[:, :, 2]) // 1000
    xs = [ox * w // grid_w for ox in range(grid_w + 1)]
    ys = [oy * h // grid_h for oy in range(grid_h + 1)]
    g = [
        [
            int(
                lum[ys[oy]:max(ys[oy + 1], ys[oy] + 1),
                    xs[ox]:max(xs[ox + 1], xs[ox] + 1)].sum()
                // (
                    (max(ys[oy + 1], ys[oy] + 1) - ys[oy])
                    * (max(xs[ox + 1], xs[ox] + 1) - xs[ox])
                )
            )
            for ox in range(grid_w)
        ]
        for oy in range(grid_h)
    ]
    v = 0
    for oy in range(grid_h):
        for ox in range(grid_w - 1):
            v = (v << 1) | (1 if g[oy][ox] < g[oy][ox + 1] else 0)
    return v - (1 << 64) if v >= (1 << 63) else v  # signed long


def image_dhash(
    df: DataFrame,
    id_col: str = "media_id",
    content_col: str = "content",
    batch_rows: int = 256,
    eager: bool = True,
) -> DataFrame:
    """Per-image perceptual hash column: (id, dhash long, decodable).

    Map-only Arrow-batched ``mapInPandas`` — the blob never leaves the
    executor and the output is 16 bytes/row, so at 100 TB of images
    this pass is one embarrassingly-parallel scan whose output (the
    hash table) is tiny enough to band-join against itself.
    Undecodable blobs yield ``decodable=false`` with a NULL hash
    instead of dropping rows."""
    schema = f"{id_col} long, dhash long, decodable boolean"

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hs, ok = [], [], []
            for rid, blob in zip(pdf[id_col], pdf[content_col]):
                ids.append(rid)
                if blob is None:
                    hs.append(None)
                    ok.append(False)
                    continue
                blob = bytes(blob)
                npx = _bmp_np_pixels(blob)  # hot path: vectorized BMP
                if npx is not None:
                    h, w = npx.shape[:2]
                    hs.append(_dhash_bits(w, h, npx))
                    ok.append(True)
                    continue
                whp = _decode_image_pixels(blob)
                if whp is None:
                    hs.append(None)
                    ok.append(False)
                else:
                    hs.append(_dhash_bits(*whp))
                    ok.append(True)
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "dhash": pd.array(hs, dtype="Int64"),
                    "decodable": ok,
                }
            )

    return _run_with_bounded_arrow_batches(
        df.mapInPandas(process, schema=schema), batch_rows, eager
    )


def hash_near_dup_pairs(
    hashes: DataFrame,
    id_col: str = "media_id",
    hash_col: str = "dhash",
    n_bands: int = 8,
    max_hamming: int = 7,
    hash_cols: list[str] | None = None,
) -> DataFrame:
    """Near-dup pairs among 64-bit-word perceptual hashes: banded
    bucket join + exact Hamming verify — one join operator serving
    image dHash (one word), the 128-bit audio fingerprint
    (``hash_cols=["afp0", "afp1"]``), and any future wider hash; same
    shape as the SimHash text path (dedup.py).

    The hash (64 bits per word) splits into ``n_bands`` equal bands
    spread evenly across the words; candidate pairs share at least one
    exact band (a bucket join keyed by (band index, band value) —
    never all-pairs), then the EXACT Hamming distance (summed over
    words) filters to ``<= max_hamming``.  With
    ``max_hamming < n_bands`` the pigeonhole principle makes recall
    EXACT, not probabilistic: fewer differing bits than bands cannot
    touch every band, so every true pair shares an untouched band and
    is guaranteed a candidate.  Precision is exact by construction
    (every candidate is verified).  All JVM-side: shiftrightunsigned
    banding, xor + bit_count verify — no Python in the join path.

    Scale: candidate volume is corpus^2 x (n_bands / 2^band_bits) —
    BAND WIDTH is the selectivity lever.  Wider bands (fewer per word,
    e.g. n_bands=4 on one word = 16-bit buckets) cut candidates ~2^8x
    but cap the exact-recall threshold at n_bands-1; a wider hash
    (more words) buys both margins at once.  Measured trade in
    SCALE.md.  Output: (id_1, id_2, hamming)."""
    cols = list(hash_cols) if hash_cols is not None else [hash_col]
    if n_bands % len(cols) != 0 or 64 % (n_bands // len(cols)) != 0:
        raise ValueError(
            f"n_bands={n_bands} must spread evenly over {len(cols)} "
            "hash words into bands dividing 64 bits"
        )
    per_word = n_bands // len(cols)
    band_bits = 64 // per_word
    h = hashes
    for c in cols:
        h = h.filter(F.col(c).isNotNull())
    h = h.select(F.col(id_col), *[F.col(c) for c in cols])
    # band w*per_word+j = bits [j*band_bits, ...) of word w
    band_val = " ".join(
        f"WHEN band DIV {per_word} = {w} THEN "
        f"shiftrightunsigned({c}, (band % {per_word}) * {band_bits}) "
        f"& {(1 << band_bits) - 1}"
        for w, c in enumerate(cols)
    )
    bands = h.select(
        id_col,
        *cols,
        F.explode(F.sequence(F.lit(0), F.lit(n_bands - 1))).alias("band"),
    ).withColumn("band_val", F.expr(f"CASE {band_val} END"))
    a = bands.select(
        F.col(id_col).alias("id_1"),
        *[F.col(c).alias(f"a_{c}") for c in cols],
        "band",
        "band_val",
    )
    b = bands.select(
        F.col(id_col).alias("id_2"),
        *[F.col(c).alias(f"b_{c}") for c in cols],
        "band",
        "band_val",
    )
    # verify BEFORE the dedup shuffle: the xor+bit_count Hamming check
    # is a map-side row filter on the join output, and random band
    # collisions outnumber true pairs by orders of magnitude — so the
    # distinct exchange carries only verified pairs (3 narrow columns)
    # instead of every candidate with both hash words (r12, guide
    # §2.3).  Same result set: hamming is a function of the pair (one
    # hash per id), so filter-then-distinct ≡ distinct-then-filter.
    ham = " + ".join(f"bit_count(a_{c} ^ b_{c})" for c in cols)
    return (
        a.join(b, on=["band", "band_val"])
        .filter(F.col("id_1") < F.col("id_2"))
        .select(
            "id_1",
            "id_2",
            F.expr(ham).cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_1", "id_2"])
    )


def _encode_bmp24_np(arr) -> bytes:
    """uint8 (h, w, 3) RGB -> BMP, byte-identical to
    :func:`_encode_bmp24` (pinned by test), without the per-pixel
    Python loop."""
    import numpy as np  # noqa: PLC0415

    hh, ww = arr.shape[:2]
    stride = (ww * 3 + 3) & ~3
    body = np.zeros((hh, stride), dtype=np.uint8)
    body[:, : ww * 3] = arr[::-1, :, ::-1].reshape(hh, ww * 3)
    size = 54 + stride * hh
    hdr = (
        b"BM" + size.to_bytes(4, "little") + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little") + (40).to_bytes(4, "little")
        + ww.to_bytes(4, "little", signed=True)
        + hh.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + (stride * hh).to_bytes(4, "little")
        + b"\x00" * 16
    )
    return hdr + body.tobytes()


def synthetic_image_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    plant_every: int = 25,
    width: int = 18,
    height: int = 16,
    noise_amp: int = 1,
    batch_rows: int = 256,
) -> DataFrame:
    """Deterministic image corpus over a document table, with PLANTED
    near-duplicate twins — the fixture generator for the perceptual
    dedup path (this container ships no real image corpus; the hash,
    banding, and join plumbing are the real operators).

    Every row gets one ``width x height`` BMP whose pixels derive from
    ``numpy.random.RandomState(doc_id)`` (the legacy generator, whose
    bit-stream is frozen by numpy's compatibility guarantee — the
    corpus is identical on every platform, forever).  Every
    ``plant_every``-th positive id also emits a TWIN under
    ``media_id = -doc_id`` in one of three dup classes, cycling by
    ``(doc_id / plant_every) % 3``:

      0: lossless PNG re-encode (same pixels; Hamming 0)
      1: 2x nearest-neighbor upscale re-encoded as BMP (box averaging
         makes the dHash exactly invariant; Hamming 0)
      2: per-pixel noise in [-noise_amp, +noise_amp] (Hamming small
         but nonzero — the genuinely NEAR class)

    Ground truth is thus pure id arithmetic — an oracle needs no image
    math: the true pair set is exactly {(-d, d) : d % plant_every = 0,
    d > 0}.  Map-only Arrow-batched generation; the id frame is
    repartitioned to the session's parallelism first (a small source
    table often arrives as ONE file split, and per-pixel work in a
    single Python worker is the difference between a scan and a
    stall — the same reason the real decode ops document their batch
    shape)."""
    import numpy as np  # noqa: PLC0415

    np_bmp = _encode_bmp24_np
    schema = "media_id long, content binary, mime_type string, kind string"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs, mimes, kinds = [], [], [], []
            for d in pdf[id_col]:
                d = int(d)
                arr = np.random.RandomState(d).randint(
                    0, 256, size=(height, width, 3)
                ).astype(np.uint8)
                ids.append(d)
                blobs.append(np_bmp(arr))
                mimes.append("image/bmp")
                kinds.append("original")
                if d > 0 and d % plant_every == 0:
                    px = [
                        tuple(int(v) for v in p)
                        for p in arr.reshape(-1, 3)
                    ]
                    kind = (d // plant_every) % 3
                    if kind == 0:
                        twin = _encode_png24(width, height, px)
                        mime, kname = "image/png", "reencode"
                    elif kind == 1:
                        big = _resize_nearest(
                            px, width, height, 2 * width, 2 * height
                        )
                        twin = _encode_bmp24(2 * width, 2 * height, big)
                        mime, kname = "image/bmp", "upscale"
                    else:
                        noise = np.random.RandomState(d + 999_983).randint(
                            -noise_amp, noise_amp + 1, size=arr.shape
                        )
                        noisy = np.clip(
                            arr.astype(np.int64) + noise, 0, 255
                        ).astype(np.uint8)
                        twin = np_bmp(noisy)
                        mime, kname = "image/bmp", "noise"
                    ids.append(-d)
                    blobs.append(twin)
                    mimes.append(mime)
                    kinds.append(kname)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "content": blobs,
                    "mime_type": mimes,
                    "kind": kinds,
                }
            )

    width_parts = max(2, docs.sparkSession.sparkContext.defaultParallelism)
    return _run_with_bounded_arrow_batches(
        docs.select(id_col)
        .repartition(width_parts)
        .mapInPandas(gen, schema=schema),
        batch_rows,
        eager=True,
    )


# ---------------------------------------------------------------------------
# Perceptual AUDIO near-dup (round-8): Haitsma-Kalker-style fingerprint
# ---------------------------------------------------------------------------


def _wav16_np_samples(blob: bytes):
    """numpy fast path for the hot audio decode loop: (rate, float64
    mono samples) for 16-bit PCM WAV, numerically identical to
    :func:`_decode_wav_samples` (pinned by test) without the
    per-sample Python float churn.  None for anything else (the pure
    path handles 8/32-bit)."""
    import io  # noqa: PLC0415
    import struct  # noqa: PLC0415
    import wave  # noqa: PLC0415

    import numpy as np  # noqa: PLC0415

    if len(blob) < 44 or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        return None
    try:
        with wave.open(io.BytesIO(bytes(blob))) as w:
            nch = w.getnchannels()
            width = w.getsampwidth()
            rate = w.getframerate()
            frames = w.readframes(w.getnframes())
    except (wave.Error, EOFError, struct.error):
        return None
    if rate <= 0 or nch <= 0 or width != 2:
        return None
    x = np.frombuffer(frames, dtype="<i2").astype(np.float64)
    if nch > 1:
        n = (len(x) // nch) * nch
        x = x[:n].reshape(-1, nch).sum(axis=1) / nch
    return rate, x / 32768.0


def _encode_wav16_np(rate: int, x) -> bytes:
    """numpy fast path for 16-bit mono WAV encode, byte-identical to
    :func:`_encode_wav16` (pinned by test): same IEEE double multiply
    and half-even rounding, without the per-sample struct.pack loop."""
    import io  # noqa: PLC0415
    import wave  # noqa: PLC0415

    import numpy as np  # noqa: PLC0415

    ints = np.clip(
        np.round(np.asarray(x, dtype=np.float64) * 32767.0),
        -32768,
        32767,
    ).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(ints.tobytes())
    return buf.getvalue()


def _afp_words(
    rate: int, samples, n_words: int = 2, bands: int = 9
) -> list[int] | None:
    """128-bit (default) audio fingerprint (simplified Haitsma &
    Kalker 2002 "robust audio fingerprinting"): the signal splits into
    ``8*n_words + 1`` time windows x ``bands`` spectral bands (numpy
    rFFT magnitudes, log energy), and each bit is the sign of the
    TIME-AND-BAND double difference
    (E[t][b] - E[t][b+1]) - (E[t-1][b] - E[t-1][b+1]).  The double
    difference cancels any constant log-energy offset, so the hash is
    exactly invariant under amplitude scaling (gain adds a constant to
    every log energy) and stable (small Hamming drift) under
    requantization and low-level noise — the dup classes an audio
    crawl actually contains.

    WIDTH IS THE SEPARATION LEVER: at 64 bits the dup-drift tail and
    the random-pair near tail of fingerprints from spectrally similar
    clips OVERLAP once the corpus is tens of thousands of clips
    (measured: dup max 9 vs cross-pair min 8 at 4k clips); at 128 bits
    the gap is 14 vs 27 and widens with corpus margin (SCALE.md).
    Returns ``n_words`` signed 64-bit ints for LongType columns,
    joined by :func:`hash_near_dup_pairs` with ``hash_cols``."""
    import numpy as np  # noqa: PLC0415

    frames = 8 * n_words + 1
    x = np.asarray(samples, dtype=np.float64)
    n = (len(x) // frames) * frames
    if n < frames * 8:
        return None
    seg = x[:n].reshape(frames, n // frames)
    mag = np.abs(np.fft.rfft(seg, axis=1))  # (frames, n//frames//2+1)
    nb = mag.shape[1]
    edges = [1 + (b * (nb - 1)) // bands for b in range(bands + 1)]
    e = np.empty((frames, bands))
    for b in range(bands):
        lo, hi = edges[b], max(edges[b + 1], edges[b] + 1)
        e[:, b] = np.log(np.sum(mag[:, lo:hi] ** 2, axis=1) + 1e-12)
    d = e[:, :-1] - e[:, 1:]          # band differences per frame
    dd = (d[1:, :] - d[:-1, :]).reshape(-1)  # 64 * n_words bits
    words = []
    for w in range(n_words):
        v = 0
        for bit in dd[w * 64:(w + 1) * 64]:
            v = (v << 1) | (1 if bit > 0 else 0)
        words.append(v - (1 << 64) if v >= (1 << 63) else v)
    return words


def audio_fingerprint(
    df: DataFrame,
    id_col: str = "media_id",
    content_col: str = "content",
    batch_rows: int = 256,
    eager: bool = True,
) -> DataFrame:
    """Per-clip perceptual hash columns: (id, afp0, afp1, decodable) —
    the audio member of the dedup family, the exact shape of
    :func:`image_dhash` (map-only Arrow batches, blobs never leave the
    executor, 24-byte rows out), feeding the SAME banded Hamming join
    (:func:`hash_near_dup_pairs` with ``hash_cols=["afp0", "afp1"]``).
    128 bits as two longs — 64 bits cannot separate dup drift from the
    random near tail at corpus scale (see :func:`_afp_words`).
    Undecodable blobs yield decodable=false with NULL hashes."""
    schema = f"{id_col} long, afp0 long, afp1 long, decodable boolean"

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, h0, h1, ok = [], [], [], []
            for rid, blob in zip(pdf[id_col], pdf[content_col]):
                ids.append(rid)
                fp = None
                if blob is not None:
                    blob = bytes(blob)
                    fast = _wav16_np_samples(blob)  # hot path
                    if fast is not None:
                        fp = _afp_words(fast[0], fast[1])
                    else:
                        dec = _decode_wav_samples(blob)
                        if dec is not None:
                            rate, _nch, samples = dec
                            fp = _afp_words(rate, samples)
                h0.append(None if fp is None else fp[0])
                h1.append(None if fp is None else fp[1])
                ok.append(fp is not None)
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "afp0": pd.array(h0, dtype="Int64"),
                    "afp1": pd.array(h1, dtype="Int64"),
                    "decodable": ok,
                }
            )

    return _run_with_bounded_arrow_batches(
        df.mapInPandas(process, schema=schema), batch_rows, eager
    )


def synthetic_audio_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    plant_every: int = 25,
    rate: int = 8000,
    n_samples: int = 4096,
    batch_rows: int = 256,
) -> DataFrame:
    """Deterministic PCM-WAV corpus over a document table with PLANTED
    near-duplicate twins — the audio sibling of
    :func:`synthetic_image_corpus`, same ground-truth-by-id-arithmetic
    contract: true pairs are exactly {(-d, d) : d % plant_every = 0,
    d > 0}.

    Every row gets a 16-bit mono clip of five sinusoids with
    ``RandomState(doc_id)``-drawn frequencies/phases/amplitudes plus
    low noise.  Twin classes cycle by ``(d / plant_every) % 3``:

      0: amplitude-scaled 0.4x (fingerprint exactly invariant — the
         double difference cancels the gain)
      1: requantized to 8-bit levels, re-encoded (quantization noise;
         small Hamming)
      2: added low-level noise (small Hamming)
    """
    import numpy as np  # noqa: PLC0415

    schema = "media_id long, content binary, mime_type string, kind string"

    t_axis = np.arange(n_samples) / rate

    def synth(d: int):
        # per-clip RandomState draws stay SEQUENTIAL and identical to
        # the original scalar loop (uniform f, uniform amp, uniform
        # phase, per sinusoid) — the corpus is pinned forever — but
        # the waveform itself assembles as one vectorized (5, n) sin
        rs = np.random.RandomState(d)
        x = np.zeros(n_samples)
        for _ in range(5):
            f = rs.uniform(80, 3200)
            x += rs.uniform(0.1, 0.5) * np.sin(
                2 * np.pi * f * t_axis + rs.uniform(0, 2 * np.pi)
            )
        x += rs.normal(0, 0.01, n_samples)
        peak = np.max(np.abs(x))
        return (0.8 / peak) * x if peak > 0 else x

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs, mimes, kinds = [], [], [], []
            for d in pdf[id_col]:
                d = int(d)
                x = synth(d)
                ids.append(d)
                blobs.append(_encode_wav16_np(rate, x))
                mimes.append("audio/wav")
                kinds.append("original")
                if d > 0 and d % plant_every == 0:
                    kind = (d // plant_every) % 3
                    if kind == 0:
                        y, kname = 0.4 * x, "gain"
                    elif kind == 1:
                        y = np.round(x * 127) / 127
                        kname = "requantize"
                    else:
                        # low relative to the clip's own 0.01 noise
                        # floor: the planted "noise" class must stay
                        # NEAR (<= the banded-join threshold) for
                        # every clip, not just on average
                        y = x + np.random.RandomState(
                            d + 424_243
                        ).normal(0, 0.001, n_samples)
                        kname = "noise"
                    ids.append(-d)
                    blobs.append(_encode_wav16_np(rate, np.clip(y, -1, 1)))
                    mimes.append("audio/wav")
                    kinds.append(kname)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "content": blobs,
                    "mime_type": mimes,
                    "kind": kinds,
                }
            )

    width_parts = max(2, docs.sparkSession.sparkContext.defaultParallelism)
    return _run_with_bounded_arrow_batches(
        docs.select(id_col)
        .repartition(width_parts)
        .mapInPandas(gen, schema=schema),
        batch_rows,
        eager=True,
    )


def synthetic_image_delta(
    docs: DataFrame,
    id_col: str = "doc_id",
    every: int = 25,
    width: int = 18,
    height: int = 16,
    batch_rows: int = 256,
) -> DataFrame:
    """The DELTA batch for incremental perceptual dedup over the
    :func:`synthetic_image_corpus` base: for document id ``d`` (> 0),

      d % every == 0: a NEAR twin of base image d (same three dup
                      classes as the corpus generator)
      d % every == 7: an EXACT re-upload of base image d (byte-wise
                      re-encode of the same pixels)
      d % every == 13: a BRAND-NEW image (unrelated seed) — the true
                      negative the probe must not match

    All under ``media_id = -d``, so ground truth stays id arithmetic:
    delta->base dup pairs are exactly {(-d, d) : d % every IN (0, 7),
    d > 0}."""
    import numpy as np  # noqa: PLC0415

    schema = "media_id long, content binary, mime_type string, kind string"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs, mimes, kinds = [], [], [], []
            for d in pdf[id_col]:
                d = int(d)
                if d <= 0 or d % every not in (0, 7, 13):
                    continue
                arr = np.random.RandomState(d).randint(
                    0, 256, size=(height, width, 3)
                ).astype(np.uint8)
                if d % every == 0:
                    kind = (d // every) % 3
                    if kind == 0:
                        px = [
                            tuple(int(v) for v in p)
                            for p in arr.reshape(-1, 3)
                        ]
                        blob = _encode_png24(width, height, px)
                        mime, kname = "image/png", "reencode"
                    elif kind == 1:
                        px = [
                            tuple(int(v) for v in p)
                            for p in arr.reshape(-1, 3)
                        ]
                        big = _resize_nearest(
                            px, width, height, 2 * width, 2 * height
                        )
                        blob = _encode_bmp24(2 * width, 2 * height, big)
                        mime, kname = "image/bmp", "upscale"
                    else:
                        noise = np.random.RandomState(
                            d + 999_983
                        ).randint(-1, 2, size=arr.shape)
                        blob = _encode_bmp24_np(
                            np.clip(
                                arr.astype(np.int64) + noise, 0, 255
                            ).astype(np.uint8)
                        )
                        mime, kname = "image/bmp", "noise"
                elif d % every == 7:
                    blob = _encode_bmp24_np(arr)  # exact re-upload
                    mime, kname = "image/bmp", "reupload"
                else:
                    fresh = np.random.RandomState(d + 77_777).randint(
                        0, 256, size=(height, width, 3)
                    ).astype(np.uint8)
                    blob = _encode_bmp24_np(fresh)
                    mime, kname = "image/bmp", "new"
                ids.append(-d)
                blobs.append(blob)
                mimes.append(mime)
                kinds.append(kname)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "content": blobs,
                    "mime_type": mimes,
                    "kind": kinds,
                }
            )

    width_parts = max(2, docs.sparkSession.sparkContext.defaultParallelism)
    return _run_with_bounded_arrow_batches(
        docs.select(id_col)
        .repartition(width_parts)
        .mapInPandas(gen, schema=schema),
        batch_rows,
        eager=True,
    )


def hash_band_table(
    hashes: DataFrame,
    id_col: str = "media_id",
    hash_cols: list[str] | None = None,
    hash_col: str = "dhash",
    n_bands: int = 4,
    out_id: str = "base_id",
) -> DataFrame:
    """(id, band, band_val, <hash words>) band table for a perceptual
    hash corpus — the asset a standing-corpus multimodal dedup
    MATERIALIZES once (write it with
    ``sources.sinks.write_bucketed_table`` keyed by (band, band_val),
    or hold it in ``operators.session_cache`` for a session) and
    probes with every new batch.  Map-only; carrying the hash words
    alongside the bands means the probe join verifies Hamming without
    re-reading (or re-decoding!) the base media."""
    cols = list(hash_cols) if hash_cols is not None else [hash_col]
    if n_bands % len(cols) != 0 or 64 % (n_bands // len(cols)) != 0:
        raise ValueError("n_bands must spread evenly over hash words")
    per_word = n_bands // len(cols)
    band_bits = 64 // per_word
    h = hashes
    for c in cols:
        h = h.filter(F.col(c).isNotNull())
    band_val = " ".join(
        f"WHEN band DIV {per_word} = {w} THEN "
        f"shiftrightunsigned({c}, (band % {per_word}) * {band_bits}) "
        f"& {(1 << band_bits) - 1}"
        for w, c in enumerate(cols)
    )
    return (
        h.select(
            F.col(id_col).alias(out_id),
            *[F.col(c) for c in cols],
            F.explode(
                F.sequence(F.lit(0), F.lit(n_bands - 1))
            ).alias("band"),
        )
        .withColumn("band_val", F.expr(f"CASE {band_val} END"))
        .select(out_id, "band", "band_val", *cols)
    )


def incremental_hash_neardup(
    delta_hashes: DataFrame,
    base_bands: DataFrame,
    id_col: str = "media_id",
    hash_cols: list[str] | None = None,
    hash_col: str = "dhash",
    n_bands: int = 4,
    max_hamming: int = 3,
    base_id: str = "base_id",
) -> DataFrame:
    """Which DELTA media near-duplicate an existing BASE item — the
    incremental form a production multimodal dedup actually runs
    (today's crawl against the standing corpus), probing a
    MATERIALIZED band table (:func:`hash_band_table`) so the per-batch
    cost is O(delta + matching bucket volume): the base media is never
    re-decoded, never re-hashed, never re-banded.  Same pigeonhole
    recall bound as :func:`hash_near_dup_pairs` (``max_hamming <
    n_bands`` => exact).  Output: (delta_id, base_id, hamming); pairs
    WITHIN delta are not reported (run the self-join path for those).
    """
    cols = list(hash_cols) if hash_cols is not None else [hash_col]
    d_bands = hash_band_table(
        delta_hashes, id_col, cols, hash_col, n_bands, out_id="delta_id"
    )
    for c in cols:
        d_bands = d_bands.withColumnRenamed(c, f"d_{c}")
    b = base_bands
    for c in cols:
        b = b.withColumnRenamed(c, f"b_{c}")
    ham = " + ".join(f"bit_count(d_{c} ^ b_{c})" for c in cols)
    return (
        d_bands.join(b, on=["band", "band_val"])
        .select(
            "delta_id",
            base_id,
            *[f"d_{c}" for c in cols],
            *[f"b_{c}" for c in cols],
        )
        .dropDuplicates(["delta_id", base_id])
        .select(
            "delta_id",
            base_id,
            F.expr(ham).cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# Video (round-8): REAL pure-Python GIF87a/89a codec + clip near-dup
# ---------------------------------------------------------------------------
#
# The container a web crawl actually serves short clips in that needs
# no media library: GIF.  Decode implements the full spec surface a
# conformant encoder can emit — LZW with dynamic code sizes and clear
# codes, global/local color tables, interlacing, frame disposal
# methods 0-3, transparency — with the same untrusted-input bounds as
# the image codecs (pixel cap, frame cap, output-bounded LZW so a
# decompression bomb stops at the declared frame size).  The encoder
# writes spec-conformant GIF89a (other decoders read it; pinned by
# roundtrip + hand-built fixture tests).

_GIF_MAX_FRAMES = 64


def _lzw_decode(
    data: bytes, min_code_size: int, expected_len: int
) -> bytearray | None:
    """GIF-variant LZW: LSB-first variable-width codes (min+1 .. 12
    bits), clear/EOI codes, output BOUNDED at ``expected_len`` (the
    frame's declared pixel count) so a crafted stream cannot inflate
    past the header's promise."""
    if not 2 <= min_code_size <= 11:
        return None
    clear = 1 << min_code_size
    eoi = clear + 1
    base = [bytes([i]) for i in range(clear)] + [None, None]
    table = list(base)
    code_size = min_code_size + 1
    out = bytearray()
    prev: int | None = None
    acc = nbits = 0
    pos = 0
    n = len(data)
    while len(out) < expected_len:
        while nbits < code_size:
            if pos >= n:
                return out[:expected_len]  # ended; caller checks length
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            table = list(base)
            code_size = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= clear:
                return None
            out += table[code]
            prev = code
            continue
        if code < len(table) and table[code] is not None:
            entry = table[code]
        elif code == len(table):
            entry = table[prev] + table[prev][:1]
        else:
            return None
        out += entry
        if len(table) < 4096:
            table.append(table[prev] + entry[:1])
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = code
    # the final appended entry can overshoot by its own length;
    # truncate so the output NEVER exceeds the declared frame size
    return out[:expected_len]


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """GIF-variant LZW encode — the exact mirror of
    :func:`_lzw_decode`'s code-size growth (size bumps when the table
    reaches 2^size), emitting a clear code at table overflow."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, size: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    code_size = min_code_size + 1
    emit(clear, code_size)
    cur = b""
    for ch in indices:
        nxt = cur + bytes([ch])
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur], code_size)
        if next_code < 4096:
            table[nxt] = next_code
            next_code += 1
            # the decoder's table lags the encoder's by one entry (its
            # first post-clear code appends nothing), so its length
            # reaches 2^size — and the NEXT code widens — exactly when
            # next_code passes 2^size + 1
            if next_code == (1 << code_size) + 1 and code_size < 12:
                code_size += 1
        else:
            emit(clear, code_size)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            code_size = min_code_size + 1
        cur = bytes([ch])
    if cur:
        emit(table[cur], code_size)
    emit(eoi, code_size)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _decode_gif_frames(
    blob: bytes, max_frames: int = _GIF_MAX_FRAMES
):
    """(width, height, [(delay_cs, frame)]) for GIF87a/89a — REAL
    pure-Python decode, no media library: LZW (dynamic code sizes,
    clear codes), global/local color tables, interlacing, disposal
    methods 0-3 (none/keep/restore-background/restore-previous),
    transparency.  Frames are the COMPOSED canvas states (what a
    player shows), as uint8 (h, w, 3) numpy arrays.  None for
    anything unparseable or over the pixel cap; decoding stops at
    ``max_frames`` (bounded work on untrusted blobs — the LZW output
    is additionally capped at each frame's declared size)."""
    import numpy as np  # noqa: PLC0415

    if len(blob) < 13 or blob[:6] not in (b"GIF87a", b"GIF89a"):
        return None

    def le16(i: int) -> int:
        return int.from_bytes(blob[i:i + 2], "little")

    w, h = le16(6), le16(8)
    if w <= 0 or h <= 0 or w * h > _MAX_IMAGE_PIXELS:
        return None
    flags = blob[10]
    bg_index = blob[11]
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        if pos + 3 * n > len(blob):
            return None
        gct = np.frombuffer(
            blob, np.uint8, count=3 * n, offset=pos
        ).reshape(n, 3).copy()
        pos += 3 * n
    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    if gct is not None and bg_index < len(gct):
        canvas[:, :] = gct[bg_index]
    bg_rgb = canvas[0, 0].copy()
    frames: list[tuple[int, object]] = []
    disposal, delay_cs, transparent = 0, 0, None
    try:
        while pos < len(blob):
            b0 = blob[pos]
            if b0 == 0x3B:  # trailer
                break
            if b0 == 0x21:  # extension
                if pos + 2 > len(blob):
                    return None
                label = blob[pos + 1]
                pos += 2
                if label == 0xF9 and blob[pos] == 4:
                    gflags = blob[pos + 1]
                    delay_cs = le16(pos + 2)
                    transparent = (
                        blob[pos + 4] if gflags & 1 else None
                    )
                    disposal = (gflags >> 2) & 7
                # skip sub-blocks (incl. the GCE's own)
                while True:
                    if pos >= len(blob):
                        return None
                    sz = blob[pos]
                    pos += 1
                    if sz == 0:
                        break
                    pos += sz
                continue
            if b0 != 0x2C:  # not an image descriptor
                return None
            left, top = le16(pos + 1), le16(pos + 3)
            fw, fh = le16(pos + 5), le16(pos + 7)
            fflags = blob[pos + 9]
            pos += 10
            if fw <= 0 or fh <= 0 or left + fw > w or top + fh > h:
                return None
            palette = gct
            if fflags & 0x80:
                n = 2 << (fflags & 7)
                if pos + 3 * n > len(blob):
                    return None
                palette = np.frombuffer(
                    blob, np.uint8, count=3 * n, offset=pos
                ).reshape(n, 3).copy()
                pos += 3 * n
            if palette is None:
                return None
            interlaced = bool(fflags & 0x40)
            min_code = blob[pos]
            pos += 1
            chunks = []
            while True:
                if pos >= len(blob):
                    return None
                sz = blob[pos]
                pos += 1
                if sz == 0:
                    break
                chunks.append(blob[pos:pos + sz])
                pos += sz
            idx = _lzw_decode(b"".join(chunks), min_code, fw * fh)
            if idx is None or len(idx) < fw * fh:
                return None
            arr = np.frombuffer(
                bytes(idx[: fw * fh]), np.uint8
            ).reshape(fh, fw)
            if interlaced:
                de = np.empty_like(arr)
                rows = (
                    list(range(0, fh, 8))
                    + list(range(4, fh, 8))
                    + list(range(2, fh, 4))
                    + list(range(1, fh, 2))
                )
                de[rows, :] = arr
                arr = de
            if int(arr.max()) >= len(palette):
                return None
            prev = canvas.copy() if disposal == 3 else None
            region = canvas[top:top + fh, left:left + fw]
            if transparent is not None:
                mask = arr != transparent
                region[mask] = palette[arr[mask]]
            else:
                region[:, :] = palette[arr]
            frames.append((delay_cs, canvas.copy()))
            if disposal == 2:
                canvas[top:top + fh, left:left + fw] = bg_rgb
            elif disposal == 3 and prev is not None:
                canvas = prev
            disposal, delay_cs, transparent = 0, 0, None
            if len(frames) >= max_frames:
                break
    except IndexError:
        return None
    if not frames:
        return None
    return w, h, frames


def _encode_gif(
    w: int,
    h: int,
    palette,
    index_frames: list[bytes],
    delay_cs: int = 10,
) -> bytes:
    """Spec-conformant GIF89a from full-size palette-index frames —
    the encode twin of :func:`_decode_gif_frames` (and readable by any
    conformant player): one global color table (padded to a power of
    two), a graphic-control extension per frame (disposal 1 =
    leave-in-place), LZW-compressed image data in 255-byte
    sub-blocks."""
    import numpy as np  # noqa: PLC0415

    pal = np.asarray(palette, dtype=np.uint8).reshape(-1, 3)
    size_pow = 1
    while (2 << size_pow) < len(pal):
        size_pow += 1
    n_colors = 2 << size_pow
    padded = np.zeros((n_colors, 3), dtype=np.uint8)
    padded[: len(pal)] = pal
    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out.append(0x80 | (size_pow << 4) | size_pow)  # GCT flag + sizes
    out += b"\x00\x00"  # bg index, aspect
    out += padded.tobytes()
    min_code = max(2, size_pow + 1)
    for idx in index_frames:
        out += b"\x21\xf9\x04"  # GCE, block size 4
        out.append(0x04)  # disposal 1, no transparency
        out += int(delay_cs).to_bytes(2, "little")
        out += b"\x00\x00"  # transparent idx, terminator
        out += b"\x2c" + b"\x00\x00\x00\x00"  # descriptor at (0,0)
        out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
        out.append(0)  # no local table, not interlaced
        out.append(min_code)
        data = _lzw_encode(bytes(idx), min_code)
        for i in range(0, len(data), 255):
            chunk = data[i:i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)  # block terminator
    out.append(0x3B)
    return bytes(out)


def video_frame_hashes(
    df: DataFrame,
    id_col: str = "media_id",
    content_col: str = "content",
    batch_rows: int = 64,
    eager: bool = True,
) -> DataFrame:
    """Per-frame perceptual hashes for GIF clips: one row per decoded
    frame — (id, frame_idx, dhash, n_frames).  Map-only Arrow batches;
    the fan-out happens inside the batch (same shape as
    :func:`sample_frames`), so multi-frame blobs never ride a shuffle.
    Undecodable blobs yield a single row with NULL dhash and
    n_frames=0.  The frame hash is the SAME box-average dHash the
    still-image path uses — a clip is a sequence in the identical hash
    space, which is what lets near-dup compose below."""
    schema = (
        f"{id_col} long, frame_idx int, dhash long, n_frames int"
    )

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, hs, ns = [], [], [], []
            for rid, blob in zip(pdf[id_col], pdf[content_col]):
                dec = (
                    _decode_gif_frames(bytes(blob))
                    if blob is not None
                    else None
                )
                if dec is None:
                    ids.append(rid)
                    idxs.append(0)
                    hs.append(None)
                    ns.append(0)
                    continue
                w, h, frames = dec
                for k, (_delay, arr) in enumerate(frames):
                    ids.append(rid)
                    idxs.append(k)
                    hs.append(_dhash_bits(w, h, arr))
                    ns.append(len(frames))
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "frame_idx": pd.array(idxs, dtype="Int32"),
                    "dhash": pd.array(hs, dtype="Int64"),
                    "n_frames": pd.array(ns, dtype="Int32"),
                }
            )

    return _run_with_bounded_arrow_batches(
        df.mapInPandas(process, schema=schema), batch_rows, eager
    )


def video_near_dup_pairs(
    frame_hashes: DataFrame,
    id_col: str = "media_id",
    n_bands: int = 4,
    max_hamming: int = 3,
    min_match_frac: float = 0.6,
    band_tuple: int | None = None,
    auto_tuple_at: int = 100_000,
) -> DataFrame:
    """Clip-level near-dup over per-frame hashes: candidate clips
    share at least one exact (frame index, hash band) bucket — the
    banded join keyed by frame POSITION as well as band, so a 100M-
    clip corpus never compares clips that agree nowhere — then the
    exact verify counts aligned frames within ``max_hamming`` and
    keeps pairs matching at least ``min_match_frac`` of the SHORTER
    clip (so a truncated re-post still pairs with its source, the
    temporal analog of prefix containment).  Per-frame recall is
    pigeonhole-exact for ``max_hamming < n_bands``; a clip pair
    needing m matched frames therefore cannot be missed if any of its
    matching frames band-collides — i.e. recall at clip level is
    exact whenever at least one aligned frame pair is within
    threshold, which min_match_frac > 0 requires anyway.  All
    JVM-side.  Output: (id_1, id_2, n_matched, match_frac).

    BAND-TUPLE mode (round-9): a FIXED 16-bit band space saturates as
    the corpus grows — measured at the 100x stress corpus, random
    bucket collisions took raw candidates from 2.0M (52k clips) to
    200M (520k clips), 98x pairs for 10x clips, with NO hot-key skew
    (top bucket 283): uniform occupancy growth, the N^2/2^band_bits
    term emerging.  The generalized pigeonhole fixes it without
    losing exactness: split the hash into 8 blocks of 8 bits and key
    candidates by every 4-block COMBINATION (C(8,4) = 70 keys of 32
    bits).  With <= max_hamming differing bits, at most max_hamming
    blocks are dirty, so >= 4 clean blocks exist and their
    combination collides — recall stays EXACT for
    max_hamming <= 8 - 4 = 4.  Random collisions drop
    2^32/2^16 / (70/4) ~ 3700x per pair at 17.5x more (linear) band
    rows — the right trade once the quadratic term dominates.  Both
    modes verify exactly, so the OUTPUT IS IDENTICAL either way; the
    mode is therefore auto-picked by corpus size (``auto_tuple_at``
    clips, override with ``band_tuple`` = 1 or 4) without affecting
    any oracle."""
    if band_tuple not in (None, 1, 4):
        raise ValueError(f"band_tuple must be 1 or 4, got {band_tuple}")
    if band_tuple == 4 and max_hamming > 4:
        raise ValueError(
            "band_tuple=4 over 8x8-bit blocks is pigeonhole-exact "
            f"only for max_hamming <= 4, got {max_hamming}"
        )
    fh = frame_hashes.filter(F.col("dhash").isNotNull())
    t = band_tuple
    if t is None:
        if max_hamming > 4:
            t = 1  # tuple mode cannot guarantee recall: stay classic
        else:
            n_clips = fh.select(id_col).distinct().count()
            t = 4 if n_clips >= auto_tuple_at else 1
    if t == 1:
        per_word = n_bands
        band_bits = 64 // per_word
        bands = fh.select(
            id_col,
            "frame_idx",
            "dhash",
            F.explode(
                F.sequence(F.lit(0), F.lit(n_bands - 1))
            ).alias("band"),
        ).withColumn(
            "band_val",
            F.expr(
                f"shiftrightunsigned(dhash, band * {band_bits}) "
                f"& {(1 << band_bits) - 1}"
            ),
        )
    else:
        import itertools  # noqa: PLC0415

        # 8 blocks of 8 bits; key = concatenated values of each
        # 4-block combination (70 x 32-bit keys, exact recall by the
        # generalized pigeonhole — see docstring)
        blocks = [
            F.expr(f"shiftrightunsigned(dhash, {8 * j}) & 255")
            for j in range(8)
        ]
        combos = F.array(
            *[
                F.struct(
                    F.lit(ci).alias("band"),
                    sum(
                        blocks[bj] * F.lit(1 << (8 * pos))
                        for pos, bj in enumerate(combo)
                    )
                    .cast("long")
                    .alias("band_val"),
                )
                for ci, combo in enumerate(
                    itertools.combinations(range(8), 4)
                )
            ]
        )
        bands = fh.select(
            id_col,
            "frame_idx",
            F.explode(combos).alias("__c"),
        ).select(
            id_col,
            "frame_idx",
            F.col("__c.band").alias("band"),
            F.col("__c.band_val").alias("band_val"),
        )
    a = bands.select(
        F.col(id_col).alias("id_1"), "frame_idx", "band", "band_val"
    )
    b = bands.select(
        F.col(id_col).alias("id_2"), "frame_idx", "band", "band_val"
    )
    cand = (
        # the band frames are O(corpus): never a broadcast candidate,
        # whatever the size estimate says (AQE broadcast of the 70x
        # tuple-band explode collected >1 GiB to the driver at the
        # 100x stress corpus, and a shuffle-hash build OOMed) — pin
        # the sort-merge join, the only strategy that spills
        a.join(b.hint("merge"), on=["frame_idx", "band", "band_val"])
        .filter(F.col("id_1") < F.col("id_2"))
        .select("id_1", "id_2")
        .dropDuplicates(["id_1", "id_2"])
    )
    f1 = fh.select(
        F.col(id_col).alias("id_1"),
        F.col("frame_idx").alias("fi"),
        F.col("dhash").alias("h1"),
        F.col("n_frames").alias("n1"),
    )
    f2 = fh.select(
        F.col(id_col).alias("id_2"),
        F.col("frame_idx").alias("fi"),
        F.col("dhash").alias("h2"),
        F.col("n_frames").alias("n2"),
    )
    verified = (
        cand.join(f1, "id_1")
        .join(f2, ["id_2", "fi"])
        .groupBy("id_1", "id_2")
        .agg(
            F.sum(
                F.when(
                    F.bit_count(F.expr("h1 ^ h2")) <= max_hamming, 1
                ).otherwise(0)
            ).alias("n_matched"),
            F.first("n1").alias("n1"),
            F.first("n2").alias("n2"),
        )
    )
    return verified.select(
        "id_1",
        "id_2",
        F.col("n_matched").cast("int").alias("n_matched"),
        F.round(
            F.col("n_matched") / F.least("n1", "n2"), 6
        ).alias("match_frac"),
    ).filter(F.col("match_frac") >= min_match_frac)


def synthetic_video_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    plant_every: int = 25,
    width: int = 18,
    height: int = 16,
    n_frames: int = 6,
    batch_rows: int = 128,
) -> DataFrame:
    """Deterministic GIF corpus over a document table with PLANTED
    near-duplicate twins — the video sibling of the image/audio
    generators, same ground-truth-by-id-arithmetic contract: true
    pairs are exactly {(-d, d) : d % plant_every = 0, d > 0}.

    Every row gets an ``n_frames``-frame GIF (256-color random
    palette, random index frames, all drawn from RandomState(doc_id)).
    Twin classes cycle by ``(d / plant_every) % 3``:

      0: re-encode under a PERMUTED palette with remapped indices —
         byte-different file, pixel-identical frames (Hamming 0/frame)
      1: palette colors shifted +-1 — every frame near, not equal
      2: last frame dropped — a truncated re-post; matches on the
         shared prefix (match_frac = 1.0 of the shorter clip)
    """
    import numpy as np  # noqa: PLC0415

    schema = "media_id long, content binary, mime_type string, kind string"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs, mimes, kinds = [], [], [], []
            for d in pdf[id_col]:
                d = int(d)
                rs = np.random.RandomState(d)
                pal = rs.randint(0, 256, (256, 3)).astype(np.uint8)
                frames = [
                    bytes(
                        rs.randint(0, 256, width * height).astype(
                            np.uint8
                        )
                    )
                    for _ in range(n_frames)
                ]
                ids.append(d)
                blobs.append(_encode_gif(width, height, pal, frames))
                mimes.append("image/gif")
                kinds.append("original")
                if d > 0 and d % plant_every == 0:
                    kind = (d // plant_every) % 3
                    if kind == 0:
                        perm = np.random.RandomState(
                            d + 31_337
                        ).permutation(256).astype(np.uint8)
                        inv = np.empty(256, dtype=np.uint8)
                        inv[perm] = np.arange(256, dtype=np.uint8)
                        pal2 = pal[perm]
                        fr2 = [
                            bytes(
                                inv[np.frombuffer(f, np.uint8)]
                            )
                            for f in frames
                        ]
                        twin = _encode_gif(width, height, pal2, fr2)
                        kname = "reencode"
                    elif kind == 1:
                        shift = np.random.RandomState(
                            d + 71_993
                        ).randint(-1, 2, pal.shape)
                        pal2 = np.clip(
                            pal.astype(np.int64) + shift, 0, 255
                        ).astype(np.uint8)
                        twin = _encode_gif(width, height, pal2, frames)
                        kname = "palette_noise"
                    else:
                        twin = _encode_gif(
                            width, height, pal, frames[:-1]
                        )
                        kname = "frame_drop"
                    ids.append(-d)
                    blobs.append(twin)
                    mimes.append("image/gif")
                    kinds.append(kname)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "content": blobs,
                    "mime_type": mimes,
                    "kind": kinds,
                }
            )

    width_parts = max(2, docs.sparkSession.sparkContext.defaultParallelism)
    return _run_with_bounded_arrow_batches(
        docs.select(id_col)
        .repartition(width_parts)
        .mapInPandas(gen, schema=schema),
        batch_rows,
        eager=True,
    )
