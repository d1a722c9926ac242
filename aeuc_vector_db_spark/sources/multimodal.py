"""Multimodal columns (E5): binary payloads with typed metadata.

Images/audio/video are opaque BINARY columns plus a MAP<STRING,STRING>
metadata bag; heavy per-item work (decode, resize, feature-extract,
frame-sample) runs in Arrow-batched `mapInPandas` so bytes stay in
columnar batches and the work scales with partitions, never the driver.

Decode kernels (all pure stdlib — the formats are public specs):
- PNG: REAL — signature + IHDR parse, full IDAT inflate + scanline
  unfilter (filter types 0-4) for per-channel pixel statistics.
- BMP: REAL — 24-bit BITMAPINFOHEADER, bottom-up and top-down row
  orders, 4-byte row padding.
- GIF: REAL — full LZW (dictionary growth, code-width bumps, clear
  codes, the KwKwK case), global/local palettes, extensions skipped,
  first frame of animations; interlace rejected honestly.
- WAV: REAL — RIFF chunk walk for fmt/data (channels, sample rate, bit
  depth, duration) and PCM16 sample decode via NumPy.
- Transforms: REAL — nearest-neighbor resize (decode → NumPy resample →
  PNG re-encode) and windowed audio RMS/peak framing.
- JPEG: REAL — baseline sequential DCT decoder (sources/jpeg.py, pure
  Python + NumPy from the public T.81 spec): Huffman entropy decode,
  dequantize, IDCT, chroma upsampling for any sampling factors, restart
  markers; progressive/arithmetic/12-bit rejected honestly. A minimal
  4:4:4 encoder exists for tests/corpus builders.
- TIFF: REAL since round 5 — baseline 8-bit strips, both byte orders,
  none/PackBits compression.
- Video: MJPEG-in-AVI is REAL since round 5 — RIFF container walk +
  per-frame baseline JPEG decode (true pixel stats, true frame bytes in
  `sample_frames`). MP4/ISO-BMFF gets a REAL container probe
  (dims/duration → decode_status='meta'); compressed codecs
  (H.264/VP9/…) stay STUBBED — they need ffmpeg, absent here.
- WebP: lossless (VP8L) is REAL since round 5 — full bitstream decode
  (prefix codes, color cache, LZ77 with 2D distance planes, meta
  prefix codes, all four transforms) in sources/webp.py. Lossy VP8
  key frames are REAL since round 8 — bool coder, token trees,
  inverse DCT/WHT, intra prediction in sources/vp8.py (see its
  table-fidelity note: the machinery is complete and pinned; the
  three empirical default-probability tables are placeholders, so
  external libwebp-encoded files need a data-only table swap). The
  stub class is now VIDEO-ONLY (compressed codecs + VP8 inter
  frames): those raise a clearly-marked NotImplementedError (strict)
  or emit a deterministic fake derived from the payload bytes. The
  Spark-side plumbing — schemas, batch iteration shape,
  partition-parallelism, binaryFile source, metadata propagation —
  is identical for real and stubbed kernels.

Scale notes: `binaryFile` splits at file granularity — fine for many
small/medium objects; huge objects should be sharded upstream. Column
pruning matters doubly here: project `content` ONLY in the mapInPandas
stage, never in joins/filters (the bytes would ride through every
shuffle).
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: modality-tagged binary record: the engine's multimodal row shape
MULTIMODAL_SCHEMA = T.StructType(
    [
        T.StructField("blob_id", T.StringType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("blob_id", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)

FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("blob_id", T.StringType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_ts_ms", T.LongType(), False),
        T.StructField("frame_bytes", T.BinaryType(), True),
    ]
)


def read_binary_dir(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """binaryFile source → MULTIMODAL_SCHEMA rows (modality from extension).

    The source provides (path, modificationTime, length, content); we
    derive blob_id from the path and keep length/mtime as typed meta.
    """
    raw = spark.read.format("binaryFile").option("pathGlobFilter", glob).load(path)
    # Scan fan-out cap (optimization round 16): binaryFile charges each
    # file spark.sql.files.openCostInBytes when packing splits, so a
    # small session maxPartitionBytes (8 MB locally since round 16)
    # fans a small-blob corpus into ~2 files per task — and each task
    # of the downstream mapInPandas decode kernels then pays the
    # per-execution Python-runner handshake, which dominates the decode
    # (measured 2.1 → 5.6 s on multimodal_transform_stats at sf0.1).
    # coalesce to the core count: no shuffle, a no-op when the scan
    # already has ≤ cores partitions, and at cluster scale one decode
    # lane per core is the right kernel granularity anyway.
    raw = raw.coalesce(spark.sparkContext.defaultParallelism)
    ext = F.lower(F.element_at(F.split(F.col("path"), "\\."), -1))
    modality = (
        F.when(
            ext.isin(
                "png", "jpg", "jpeg", "bmp", "gif", "tif", "tiff", "webp", "qoi"
            ),
            "image",
        )
        .when(ext.isin("wav", "mp3", "flac", "ogg"), "audio")
        .when(ext.isin("mp4", "avi", "mkv", "webm"), "video")
        .otherwise("binary")
    )
    return raw.select(
        F.regexp_extract(F.col("path"), r"([^/]+)$", 1).alias("blob_id"),
        modality.alias("modality"),
        F.col("content"),
        F.create_map(
            F.lit("source_path"), F.col("path"),
            F.lit("length"), F.col("length").cast("string"),
            F.lit("modified"), F.col("modificationTime").cast("string"),
        ).alias("meta"),
    )


# ---------------------------------------------------------------------------
# Real pure-stdlib codecs (public formats: PNG spec, RIFF/WAVE spec)
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
#: PNG color type → samples per pixel (spec §11.2.2)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def png_encode(pixels: bytes, width: int, height: int, color_type: int = 2) -> bytes:
    """Minimal valid PNG writer (8-bit depth): used by tests and corpus
    builders to produce REAL files the decoder below round-trips.

    `pixels` is raw scanline data, row-major, `channels` bytes per pixel,
    len == width*height*channels."""
    channels = _PNG_CHANNELS[color_type]
    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer does not match width*height*channels")

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    stride = width * channels
    raw = b"".join(
        b"\x00" + pixels[y * stride : (y + 1) * stride] for y in range(height)
    )  # filter type 0 per scanline
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _png_unfilter_wavefront(
    x_px: "np.ndarray", fts: "np.ndarray"
) -> "np.ndarray":
    """Exact PNG unfilter for rows containing Average/Paeth, vectorized
    over ANTI-DIAGONALS (round 14, VERDICT r13 #7 — the winnowing/QOI
    playbook: same arithmetic, batch the inner loop), and BATCHED over
    same-shape images (trailing batch axis — an Arrow kernel decodes
    whole column batches, so amortizing the H+W-1 numpy dispatches over
    B images divides the per-image fixed cost by B).

    The dependency stencil of every PNG filter is (left, up, up-left):
    byte (y, x) needs at most out[y, x-1], out[y-1, x], out[y-1, x-1].
    On the anti-diagonal d = y + x, all three live on diagonals d-1 and
    d-2 — so every byte on a diagonal computes simultaneously, the
    classic wavefront. Skewing the buffer (row y shifted right by y
    pixels) turns each diagonal into a contiguous SLAB S[D] of shape
    (rows, B, bpp), so the scan is H+W-1 numpy steps over dense views
    instead of B·H·W·bpp Python iterations (~5× single-image on the
    all-Paeth 128×96 worst case; another ~2× amortized at B=8). One
    zero top row and two zero left columns make the spec's out-of-frame
    zeros fall out of the layout instead of needing masks. All
    arithmetic in int16 (max intermediate 510), byte-exact vs the
    scalar recurrence — pinned per-filter vectors in
    tests/test_multimodal.py.

    `x_px`: (B, H, W, bpp) uint8 filtered bytes; `fts`: (B, H) filter
    types. Returns (B, H, W*bpp) uint8 reconstructed pixels."""
    n_batch, height, width, bpp = x_px.shape
    n_diag = width + height - 1
    S = np.zeros((n_diag + 2, height + 1, n_batch, bpp), dtype=np.int16)
    R = np.zeros_like(S)
    xt = x_px.transpose(1, 2, 0, 3)  # (H, W, B, bpp)
    for y in range(height):
        R[y + 2 : y + 2 + width, y + 1] = xt[y]  # uint8→int16 widening
    m_max = min(height, width)
    t1 = np.empty((m_max, n_batch, bpp), dtype=np.int16)
    t2 = np.empty_like(t1)
    t3 = np.empty_like(t1)
    t4 = np.empty_like(t1)
    t5 = np.empty_like(t1)
    m1 = np.empty((m_max, n_batch, bpp), dtype=bool)
    m2 = np.empty_like(m1)
    ft_i = fts.T.astype(np.int64)  # (H, B)
    uniform = int(ft_i.min()) == int(ft_i.max())
    uft = int(ft_i[0, 0]) if uniform else -1
    _sub, _add, _abs = np.subtract, np.add, np.abs
    _le, _min, _cpt = np.less_equal, np.minimum, np.copyto
    for d in range(n_diag):
        y0 = max(0, d - width + 1)
        y1 = min(height - 1, d)
        m = y1 - y0 + 1
        D = d + 2
        cur = slice(y0 + 1, y1 + 2)   # buffer rows of the cells written
        up = slice(y0, y1 + 1)        # same cells, one image-row up
        slab1 = S[D - 1]
        a = slab1[cur]
        dst = S[D][cur]
        if uft == 4 or not uniform:
            b = slab1[up]
            c = S[D - 2][up]
            pa, pb, pc = t1[:m], t2[:m], t3[:m]
            w1, w2, pred = m1[:m], m2[:m], t4[:m]
            _sub(b, c, out=pa)            # b - c
            _sub(a, c, out=pb)            # a - c
            _add(pa, pb, out=pc)
            _abs(pc, out=pc)              # |a + b - 2c|
            _abs(pa, out=pa)
            _abs(pb, out=pb)
            _min(pb, pc, out=t5[:m])
            _le(pa, t5[:m], out=w1)       # pick a
            _le(pb, pc, out=w2)           # else pick b over c
            _cpt(pred, c)
            _cpt(pred, b, where=w2)
            _cpt(pred, a, where=w1)
            if not uniform:
                ft = ft_i[y0 : y1 + 1, :, None]
                _cpt(pred, 0, where=(ft == 0))
                _cpt(pred, a, where=(ft == 1))
                _cpt(pred, b, where=(ft == 2))
                avg = _add(a, b, out=t1[:m])
                avg >>= 1
                _cpt(pred, avg, where=(ft == 3))
        elif uft == 3:
            b = slab1[up]
            pred = _add(a, b, out=t4[:m])
            pred >>= 1
        elif uft == 2:
            pred = slab1[up]
        elif uft == 1:
            pred = a
        else:
            pred = None
        if pred is None:
            dst[:] = R[D][cur]
        else:
            _add(R[D][cur], pred, out=dst)
            dst &= 0xFF
    out_t = np.empty((height, width, n_batch, bpp), dtype=np.uint8)
    for y in range(height):
        out_t[y] = S[y + 2 : y + 2 + width, y + 1]
    return np.ascontiguousarray(out_t.transpose(2, 0, 1, 3)).reshape(
        n_batch, height, width * bpp
    )


def png_decode(payload: bytes) -> tuple[int, int, int, bytes]:
    """Pure-stdlib PNG decode: (width, height, channels, raw pixel bytes).

    Parses the signature + IHDR, inflates the IDAT stream, and reverses
    scanline filters 0-4 (None/Sub/Up/Average/Paeth). 8-bit depth,
    non-interlaced only — raises ValueError otherwise (honest about the
    subset; the feature-extraction contract needs dims + pixel stats,
    not full spec coverage)."""
    width, height, channels, rows, fts = _png_parse(payload)
    return width, height, channels, _png_reconstruct(
        width, height, channels, rows, fts
    )


def _png_parse(payload: bytes):
    """Signature + IHDR parse and bounded IDAT inflate → (width, height,
    channels, rows, fts): `rows` the (H, stride+1) uint8 filtered frame,
    `fts` its filter-type column."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    pos, width, height, channels, bit_depth, interlace = 8, 0, 0, 0, 0, 0
    idat = b""
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if bit_depth != 8:
                raise ValueError(f"unsupported PNG bit depth {bit_depth} (8 only)")
            if interlace != 0:
                raise ValueError("interlaced PNG unsupported")
            if color_type not in _PNG_CHANNELS:
                raise ValueError(f"bad PNG color type {color_type}")
            channels = _PNG_CHANNELS[color_type]
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
        pos += 12 + length  # length + tag + data + crc
    # height==0 must be rejected HERE: expected would be 0, and
    # zlib's decompress(data, max_length=0) means UNLIMITED — the
    # decompression-bomb bound below would silently not apply
    if not width or not height or not idat:
        raise ValueError("truncated PNG: missing IHDR or IDAT")
    if width * height > 1 << 26:  # 64M pixels — far beyond any training blob
        raise ValueError(f"PNG dimensions implausible: {width}x{height}")
    stride = width * channels
    expected = (stride + 1) * height
    # bounded inflate: a decompression-bomb IDAT must produce an error row,
    # not an executor OOM — cap output at the size IHDR promises
    d = zlib.decompressobj()
    raw = d.decompress(idat, expected)
    if len(raw) != expected or d.decompress(b"", 1):
        raise ValueError("PNG pixel data length mismatch")
    # Unfiltering, vectorized along whichever axis the dependency allows:
    # None is a copy, Up is one whole-row uint8 add (wrapping ≡ mod 256),
    # Sub is a per-byte-lane running sum — np.cumsum over the pixel axis.
    # Average and Paeth depend on the just-reconstructed left neighbor,
    # so row-wise vectorization is impossible — those images go through
    # the anti-diagonal wavefront (_png_unfilter_wavefront).
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    fts = rows[:, 0]
    if (fts > 4).any():
        raise ValueError(f"bad PNG filter type {int(fts[fts > 4][0])}")
    return width, height, channels, rows, fts


def _png_reconstruct(
    width: int, height: int, channels: int, rows, fts
) -> bytes:
    """Reverse the scanline filters of one parsed frame → pixel bytes."""
    if not fts.any():
        # every row unfiltered (what simple writers, ours included, emit):
        # the pixel data is the frame minus the filter-byte column
        return np.ascontiguousarray(rows[:, 1:]).tobytes()
    bpp = channels  # bytes per pixel at depth 8
    stride = width * bpp
    # Native unfilter lane (optimization round 16, VERDICT r15 #7 —
    # the jpeg entropy lane's sibling): the scanline recurrences are
    # pure byte arithmetic, O(stride) memory, all five filters — the C
    # twin replaces both the wavefront (and its ~16× int16 skew-buffer
    # footprint) and the per-byte Python fallback when available.
    # Byte-exact by spec arithmetic (pinned per filter class in
    # tests/test_optimization_r16.py); RuntimeError = lane unavailable
    # → the r14/r15 Python paths below are unchanged.
    try:
        from aeuc_vector_db_spark.sources import codec_native as _CN

        if _CN.available():
            return _CN.png_unfilter(rows, height, stride, bpp)
    except RuntimeError:
        pass
    if (fts >= 3).any():
        # any Average/Paeth row: the whole image goes through the
        # anti-diagonal wavefront (handles all five filters uniformly —
        # a mixed image can't split by row, later rows depend on
        # earlier ones through `prev`) — UNLESS its skew buffers would
        # be outsized (the wavefront trades ~16× pixel volume of int16
        # for dispatch amortization; a healthy 8192×8192 RGBA passes
        # the 64M-pixel guard but would need ~2.1 GB). Oversized images
        # take the kept scalar per-row unfilter instead of risking a
        # MemoryError being misclassified as a decode error.
        if _png_wavefront_bytes(width, height, bpp, 1) <= _PNG_BATCH_BUDGET_BYTES:
            x_px = rows[:, 1:].reshape(1, height, width, bpp)
            return _png_unfilter_wavefront(x_px, fts.reshape(1, height))[0].tobytes()
        return _png_unfilter_rows(rows, fts, width, height, bpp)
    # only None/Sub/Up remain: whole-row vectorized reconstruction
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        ft = fts[y]
        line = rows[y, 1:]
        if ft == 0:
            cur = line.copy()
        elif ft == 1:  # Sub: per-lane prefix sum mod 256
            cur = (
                np.cumsum(line.reshape(-1, bpp), axis=0, dtype=np.uint32) & 0xFF
            ).astype(np.uint8).reshape(stride)
        else:  # Up: wrapping uint8 add of the previous row
            cur = line + prev
        out[y] = cur
        prev = cur
    return out.tobytes()


#: soft cap on the batched wavefront's WHOLE footprint — groups chunk
#: to stay under it, and a single decode over it takes the scalar path
_PNG_BATCH_BUDGET_BYTES = 256 << 20


def _png_wavefront_bytes(w: int, h: int, c: int, batch: int) -> int:
    """Estimated peak extra bytes for a `batch`-image wavefront call:
    the S + R skew buffers (int16, (W+H+2)·(H+1)·bpp each) PLUS the
    input np.stack copy, the out_t staging buffer, and the final
    ascontiguousarray copy (~3× raw pixel volume, uint8) — the terms
    the round-14 budget under-counted by ~50% (ADVICE r14)."""
    return batch * ((w + h + 2) * (h + 1) * c * 2 * 2 + 3 * h * w * c)


def _png_unfilter_rows(rows, fts, width: int, height: int, bpp: int) -> bytes:
    """Scalar per-row unfilter for all five PNG filters — the memory-
    bounded fallback behind the wavefront gate (O(stride) extra bytes,
    byte-exact vs the wavefront; pinned against it in
    tests/test_multimodal.py). Average/Paeth rows pay the per-byte
    Python recurrence; this path only runs for images whose wavefront
    skew buffers would exceed the batch budget."""
    stride = width * bpp
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        ft = int(fts[y])
        line = rows[y, 1:]
        if ft == 0:
            cur = line.copy()
        elif ft == 1:  # Sub: per-lane prefix sum mod 256
            cur = (
                np.cumsum(line.reshape(-1, bpp), axis=0, dtype=np.uint32) & 0xFF
            ).astype(np.uint8).reshape(stride)
        elif ft == 2:  # Up: wrapping uint8 add of the previous row
            cur = line + prev
        else:  # Average/Paeth: sequential left-neighbor dependency
            cur = np.empty(stride, dtype=np.uint8)
            li = line.tolist()
            pv = prev.tolist()
            cl = [0] * stride
            if ft == 3:
                for i in range(stride):
                    a = cl[i - bpp] if i >= bpp else 0
                    cl[i] = (li[i] + ((a + pv[i]) >> 1)) & 0xFF
            else:
                for i in range(stride):
                    a = cl[i - bpp] if i >= bpp else 0
                    b = pv[i]
                    c = pv[i - bpp] if i >= bpp else 0
                    p = a + b - c
                    pa = p - a if p >= a else a - p
                    pb = p - b if p >= b else b - p
                    pc = p - c if p >= c else c - p
                    pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    cl[i] = (li[i] + pr) & 0xFF
            cur[:] = cl
        out[y] = cur
        prev = cur
    return out.tobytes()


def png_decode_batch(payloads, on_error: str = "raise") -> list:
    """Decode many PNGs, amortizing the wavefront's fixed numpy-dispatch
    cost across same-shape images (round 14): Average/Paeth images that
    share (width, height, channels) run ONE batched anti-diagonal scan
    (trailing batch axis — H+W-1 numpy steps total, not per image),
    which is the Arrow-kernel shape: a mapInPandas batch hands the
    decoder hundreds of payloads at once, and training corpora are
    dominated by a few canonical resolutions. Images without
    Average/Paeth rows take their whole-row vectorized paths (already
    dispatch-light). Groups chunk so the skew buffers stay under
    _PNG_BATCH_BUDGET_BYTES.

    Returns results in input order, each `(w, h, channels, pixels)` —
    byte-identical to `png_decode` per item (pinned in
    tests/test_multimodal.py). `on_error="raise"` (default) propagates
    the first bad payload's error like the single decode;
    `on_error="capture"` stores the exception INSTANCE at that item's
    position instead, the quarantine-kernel contract."""
    if on_error not in ("raise", "capture"):
        raise ValueError(f"bad on_error {on_error!r}")
    results: list = [None] * len(payloads)
    # With the native unfilter lane (round 16), _png_reconstruct is the
    # fast path for EVERY filter mix — the wavefront's batch
    # amortization only pays when the C lane is unavailable.
    try:
        from aeuc_vector_db_spark.sources import codec_native as _CN

        _native = _CN.available()
    except Exception:  # noqa: BLE001 — the lane must never break batch
        _native = False
    groups: dict = {}
    for i, p in enumerate(payloads):
        try:
            w, h, c, rows, fts = _png_parse(bytes(p))
            if (fts >= 3).any() and not _native:
                groups.setdefault((w, h, c), []).append((i, rows, fts))
            else:
                results[i] = (w, h, c, _png_reconstruct(w, h, c, rows, fts))
        except Exception as exc:  # noqa: BLE001 — quarantine contract
            if on_error == "raise":
                raise
            results[i] = exc
    for (w, h, c), items in groups.items():
        per_img = _png_wavefront_bytes(w, h, c, 1)
        chunk = max(1, min(len(items), _PNG_BATCH_BUDGET_BYTES // max(1, per_img)))
        for j in range(0, len(items), chunk):
            part = items[j : j + chunk]
            try:
                x = np.stack([r[:, 1:].reshape(h, w, c) for _, r, _ in part])
                f = np.stack([ft for _, _, ft in part])
                pix = _png_unfilter_wavefront(x, f)
            except Exception:  # noqa: BLE001 — group-stage quarantine
                # a grouped-stage failure (e.g. MemoryError on the
                # skew buffers when chunking floors at 1 image) must
                # quarantine like a parse-stage one, not fail the whole
                # Arrow batch (ADVICE r14): retry each item singly
                # through the gated single-image path and capture (or
                # raise) per item.
                for (i, r, ft) in part:
                    try:
                        results[i] = (w, h, c, _png_reconstruct(w, h, c, r, ft))
                    except Exception as exc:  # noqa: BLE001
                        if on_error == "raise":
                            raise
                        results[i] = exc
                continue
            for (i, _, _), img in zip(part, pix):
                results[i] = (w, h, c, img.tobytes())
    return results


def bmp_encode(pixels: bytes, width: int, height: int) -> bytes:
    """Minimal valid 24-bit uncompressed BMP writer (BITMAPINFOHEADER).

    `pixels` is row-major RGB top-down, len == width*height*3; rows are
    stored bottom-up and 4-byte padded per the public BMP layout."""
    if len(pixels) != width * height * 3:
        raise ValueError("pixel buffer does not match width*height*3")
    pad = (-(width * 3)) % 4
    rows = []
    for y in range(height - 1, -1, -1):  # bottom-up
        row = pixels[y * width * 3 : (y + 1) * width * 3]
        # RGB → BGR per pixel
        bgr = bytearray()
        for x in range(width):
            r, g, b = row[x * 3 : x * 3 + 3]
            bgr += bytes((b, g, r))
        rows.append(bytes(bgr) + b"\x00" * pad)
    data = b"".join(rows)
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(data),
                       2835, 2835, 0, 0)
    off = 14 + 40
    header = b"BM" + struct.pack("<IHHI", off + len(data), 0, 0, off)
    return header + info + data


def bmp_decode(payload: bytes) -> tuple[int, int, int, bytes]:
    """Pure-stdlib BMP decode: (width, height, 3, RGB top-down bytes).

    24-bit uncompressed BITMAPINFOHEADER only (the overwhelmingly common
    layout) — raises ValueError otherwise. Handles bottom-up (positive
    height) and top-down (negative height) row orders and 4-byte row
    padding."""
    if payload[:2] != b"BM" or len(payload) < 54:
        raise ValueError("not a BMP: bad signature or truncated header")
    (off,) = struct.unpack("<I", payload[10:14])
    hdr_size, width, height_raw = struct.unpack("<Iii", payload[14:26])
    planes, bpp, compression = struct.unpack("<HHI", payload[26:34])
    if hdr_size < 40 or planes != 1:
        raise ValueError("unsupported BMP header")
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP: bpp={bpp} compression={compression}")
    top_down = height_raw < 0
    height = -height_raw if top_down else height_raw
    if not width or not height or width < 0:
        raise ValueError("bad BMP dimensions")
    if width * height > 1 << 26:
        raise ValueError(f"BMP dimensions implausible: {width}x{height}")
    stride = width * 3 + ((-(width * 3)) % 4)
    if len(payload) < off + stride * height:
        raise ValueError("truncated BMP pixel data")
    out = bytearray()
    ys = range(height) if top_down else range(height - 1, -1, -1)
    for y in ys:
        row = payload[off + y * stride : off + y * stride + width * 3]
        rgb = bytearray()
        for x in range(width):
            b, g, r = row[x * 3 : x * 3 + 3]
            rgb += bytes((r, g, b))
        out += rgb
    return width, height, 3, bytes(out)


def _packbits_decode(data: bytes) -> bytes:
    """PackBits run-length decode (TIFF spec §9 / Macintosh PackBits).
    Truncated runs raise (quarantine semantics, never silent pixels)."""
    out = bytearray()
    i = 0
    n_data = len(data)
    while i < n_data:
        n = data[i]
        i += 1
        if n < 128:  # literal run of n+1 bytes
            if n_data - i < n + 1:
                raise ValueError("truncated PackBits literal run")
            out += data[i : i + n + 1]
            i += n + 1
        elif n > 128:  # replicate next byte 257-n times
            if i >= n_data:
                raise ValueError("truncated PackBits replicate run")
            out += bytes([data[i]]) * (257 - n)
            i += 1
        # n == 128: no-op per spec
    return bytes(out)


def tiff_encode(pixels: bytes, width: int, height: int, channels: int = 3) -> bytes:
    """Minimal valid baseline TIFF writer (little-endian, 8-bit, chunky,
    uncompressed, single strip) — built from the public TIFF 6.0 spec;
    used by tests and corpus builders to produce REAL files the decoder
    below round-trips. `pixels`: row-major RGB (channels=3) or
    grayscale (channels=1)."""
    if channels not in (1, 3):
        raise ValueError("tiff_encode: channels must be 1 or 3")
    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer does not match width*height*channels")

    def entry(tag: int, typ: int, cnt: int, val: bytes) -> bytes:
        return struct.pack("<HHI", tag, typ, cnt) + val

    def short(v: int) -> bytes:
        return struct.pack("<HH", v, 0)

    def long_(v: int) -> bytes:
        return struct.pack("<I", v)

    pix_off = 8
    extra_off = pix_off + len(pixels)  # bits-per-sample array for RGB
    extra = struct.pack("<3H", 8, 8, 8) if channels == 3 else b""
    ifd_off = extra_off + len(extra)
    entries = [
        entry(256, 4, 1, long_(width)),                    # ImageWidth
        entry(257, 4, 1, long_(height)),                   # ImageLength
        entry(258, 3, channels,                            # BitsPerSample
              short(8) if channels == 1 else long_(extra_off)),
        entry(259, 3, 1, short(1)),                        # Compression: none
        entry(262, 3, 1, short(1 if channels == 1 else 2)),  # Photometric
        entry(273, 4, 1, long_(pix_off)),                  # StripOffsets
        entry(277, 3, 1, short(channels)),                 # SamplesPerPixel
        entry(278, 4, 1, long_(height)),                   # RowsPerStrip
        entry(279, 4, 1, long_(len(pixels))),              # StripByteCounts
    ]
    ifd = struct.pack("<H", len(entries)) + b"".join(entries) + struct.pack("<I", 0)
    return b"II*\x00" + struct.pack("<I", ifd_off) + pixels + extra + ifd


def tiff_decode(payload: bytes) -> tuple[int, int, int, bytes]:
    """Pure-stdlib baseline TIFF decode: (width, height, channels, raw
    top-down pixel bytes). Honest subset (TIFF 6.0 baseline): classic
    TIFF in either byte order, 8-bit samples, chunky planar layout,
    grayscale (PhotometricInterpretation 0/1 — WhiteIsZero inverted to
    the BlackIsZero convention) or RGB(A), strip-organized, compression
    none (1) or PackBits (32773). Tiles, palettes, LZW/JPEG compression,
    16-bit, planar=2 raise ValueError (quarantine, never wrong pixels)."""
    import numpy as np

    if payload[:4] == b"II*\x00":
        endian = "<"
    elif payload[:4] == b"MM\x00*":
        endian = ">"
    else:
        raise ValueError("not a TIFF: bad header")
    (ifd_off,) = struct.unpack(endian + "I", payload[4:8])
    if ifd_off + 2 > len(payload):
        raise ValueError("truncated TIFF: IFD offset past EOF")
    (n_entries,) = struct.unpack(endian + "H", payload[ifd_off : ifd_off + 2])
    _SIZES = {1: "B", 3: "H", 4: "I"}
    tags: dict[int, list[int]] = {}
    for i in range(n_entries):
        e = payload[ifd_off + 2 + 12 * i : ifd_off + 14 + 12 * i]
        if len(e) < 12:
            raise ValueError("truncated TIFF IFD")
        tag, typ, cnt = struct.unpack(endian + "HHI", e[:8])
        fmt = _SIZES.get(typ)
        if fmt is None:
            continue  # RATIONAL etc. — nothing required reads them
        total = struct.calcsize(fmt) * cnt
        if total <= 4:
            buf = e[8 : 8 + total]  # inline, left-justified in both orders
        else:
            (off,) = struct.unpack(endian + "I", e[8:12])
            buf = payload[off : off + total]
            if len(buf) < total:
                raise ValueError("truncated TIFF value area")
        tags[tag] = list(struct.unpack(f"{endian}{cnt}{fmt}", buf))

    def one(tag: int, default=None):
        v = tags.get(tag)
        return v[0] if v else default

    width, height = one(256), one(257)
    spp = one(277, 1)
    bits = tags.get(258, [8] * spp)
    comp = one(259, 1)
    photo = one(262, 1)
    planar = one(284, 1)
    offsets, counts = tags.get(273), tags.get(279)
    if not width or not height or not offsets:
        raise ValueError("truncated TIFF: missing ImageWidth/Length/StripOffsets")
    if width * height > 1 << 26:
        raise ValueError(f"TIFF dimensions implausible: {width}x{height}")
    if 322 in tags or 323 in tags or 324 in tags:
        raise ValueError("tiled TIFF unsupported")
    if 320 in tags or photo == 3:
        raise ValueError("palette TIFF unsupported")
    if any(b != 8 for b in bits) or planar != 1:
        raise ValueError("unsupported TIFF: 8-bit chunky samples only")
    if comp not in (1, 32773):
        raise ValueError(f"unsupported TIFF compression {comp} (none/PackBits only)")
    if photo not in (0, 1, 2):
        raise ValueError(f"unsupported TIFF photometric {photo}")
    if spp not in (1, 3, 4):
        raise ValueError(f"unsupported TIFF samples-per-pixel {spp}")
    if counts is None:
        if comp != 1:
            raise ValueError("compressed TIFF without StripByteCounts")
        rps = one(278, height)
        counts = [
            min(rps, height - i * rps) * width * spp for i in range(len(offsets))
        ]
    data = bytearray()
    for off, cnt in zip(offsets, counts):
        chunk = payload[off : off + cnt]
        if len(chunk) != cnt:
            raise ValueError("truncated TIFF strip")
        data += _packbits_decode(chunk) if comp == 32773 else chunk
    expected = width * height * spp
    if len(data) < expected:
        raise ValueError("TIFF pixel data length mismatch")
    out = bytes(data[:expected])
    if photo == 0:  # WhiteIsZero → invert to the BlackIsZero convention
        out = (255 - np.frombuffer(out, dtype=np.uint8)).tobytes()
    return width, height, spp, out


_QOI_SIG = b"qoif"
_QOI_END = b"\x00" * 7 + b"\x01"


def _qoi_hash(r: int, g: int, b: int, a: int) -> int:
    return (r * 3 + g * 5 + b * 7 + a * 11) % 64


def qoi_encode(pixels: bytes, width: int, height: int) -> bytes:
    """Minimal valid QOI writer (RGB, 3 channels; qoiformat.org spec —
    public 1-page format): used by tests and corpus builders to
    produce REAL files the decoder below round-trips losslessly. Emits
    every op class the data allows (RUN for repeats, INDEX for
    previously-seen pixels, DIFF/LUMA for small deltas, RGB
    otherwise), so a corpus built from hash-stream pixels exercises
    the whole op space."""
    if len(pixels) != width * height * 3:
        raise ValueError("pixel buffer does not match width*height*3")
    out = bytearray()
    out += _QOI_SIG
    out += struct.pack(">IIBB", width, height, 3, 0)
    index = [(0, 0, 0, 0)] * 64
    pr, pg, pb, pa = 0, 0, 0, 255
    run = 0
    for i in range(0, len(pixels), 3):
        r, g, b, a = pixels[i], pixels[i + 1], pixels[i + 2], 255
        if (r, g, b, a) == (pr, pg, pb, pa):
            run += 1
            if run == 62:
                out.append(0xC0 | (run - 1))
                run = 0
        else:
            if run:
                out.append(0xC0 | (run - 1))
                run = 0
            h = _qoi_hash(r, g, b, a)
            if index[h] == (r, g, b, a):
                out.append(h)  # QOI_OP_INDEX
            else:
                index[h] = (r, g, b, a)
                dr = (r - pr + 128) % 256 - 128
                dg = (g - pg + 128) % 256 - 128
                db = (b - pb + 128) % 256 - 128
                dr_dg, db_dg = dr - dg, db - dg
                if -2 <= dr <= 1 and -2 <= dg <= 1 and -2 <= db <= 1:
                    out.append(0x40 | ((dr + 2) << 4) | ((dg + 2) << 2) | (db + 2))
                elif -32 <= dg <= 31 and -8 <= dr_dg <= 7 and -8 <= db_dg <= 7:
                    out.append(0x80 | (dg + 32))
                    out.append(((dr_dg + 8) << 4) | (db_dg + 8))
                else:
                    out += bytes((0xFE, r, g, b))  # QOI_OP_RGB
        pr, pg, pb, pa = r, g, b, a
    if run:
        out.append(0xC0 | (run - 1))
    out += _QOI_END
    return bytes(out)


def qoi_decode(payload: bytes) -> tuple[int, int, int, bytes]:
    """Pure-stdlib QOI decode → (width, height, channels, raw RGB
    bytes). Full op coverage per the spec (INDEX / DIFF / LUMA / RUN /
    RGB / RGBA — an RGBA stream decodes with alpha tracked for the
    running index and dropped from the 3-channel output, matching the
    header-declared channel handling of the other image codecs here).
    Raises ValueError on bad magic / truncation / pixel-count
    mismatch — dirty blobs become decode_status='error' rows upstream,
    never task crashes."""
    if payload[:4] != _QOI_SIG or len(payload) < 14 + len(_QOI_END):
        raise ValueError("not a QOI stream")
    width, height, channels, _cs = struct.unpack(">IIBB", payload[4:14])
    if channels not in (3, 4):
        raise ValueError(f"bad QOI channel count {channels}")
    n_px = width * height
    out = bytearray()
    index = [(0, 0, 0, 0)] * 64
    r, g, b, a = 0, 0, 0, 255
    pos = 14
    end = len(payload) - len(_QOI_END)
    if payload[end:] != _QOI_END:
        raise ValueError("missing QOI end marker")
    px = 0
    while px < n_px:
        if pos >= end:
            raise ValueError("truncated QOI stream")
        op = payload[pos]
        pos += 1
        if op == 0xFE:  # RGB
            r, g, b = payload[pos], payload[pos + 1], payload[pos + 2]
            pos += 3
        elif op == 0xFF:  # RGBA
            r, g, b, a = (
                payload[pos], payload[pos + 1], payload[pos + 2], payload[pos + 3]
            )
            pos += 4
        elif op >> 6 == 0:  # INDEX
            r, g, b, a = index[op]
        elif op >> 6 == 1:  # DIFF
            r = (r + ((op >> 4) & 3) - 2) % 256
            g = (g + ((op >> 2) & 3) - 2) % 256
            b = (b + (op & 3) - 2) % 256
        elif op >> 6 == 2:  # LUMA
            dg = (op & 0x3F) - 32
            nxt = payload[pos]
            pos += 1
            r = (r + dg + ((nxt >> 4) & 0xF) - 8) % 256
            g = (g + dg) % 256
            b = (b + dg + (nxt & 0xF) - 8) % 256
        else:  # RUN
            run = (op & 0x3F) + 1
            if px + run > n_px:
                raise ValueError("QOI run overflows pixel count")
            out += bytes((r, g, b)) * run
            px += run
            # The reference qoi.c decoder writes index[hash(px)] = px
            # after EVERY chunk, RUN included. Usually a no-op (the pixel
            # was indexed when produced), but not when the run repeats the
            # implicit (0,0,0,255) start pixel that was never explicitly
            # produced — a spec-literal encoder may then emit an INDEX op
            # for that slot. Keep the slot in sync before continuing.
            index[_qoi_hash(r, g, b, a)] = (r, g, b, a)
            continue
        index[_qoi_hash(r, g, b, a)] = (r, g, b, a)
        out += bytes((r, g, b))
        px += 1
    if px != n_px:
        raise ValueError("QOI pixel count mismatch")
    return width, height, 3, bytes(out)


def wav_encode(samples: "list[int]", sample_rate: int = 8000, channels: int = 1) -> bytes:
    """Minimal valid PCM16 RIFF/WAVE writer (canonical 44-byte header)."""
    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate,
                      sample_rate * channels * 2, channels * 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def wav_decode(payload: bytes) -> tuple[int, int, int, float, bytes]:
    """RIFF chunk walk: (channels, sample_rate, bits, duration_ms, pcm).

    PCM (format 1) only — raises ValueError on compressed codecs."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV: bad RIFF/WAVE header")
    pos = 12
    channels = rate = bits = 0
    pcm = b""
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (length,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        data = payload[pos + 8 : pos + 8 + length]
        if tag == b"fmt ":
            audio_format, channels, rate, _br, _ba, bits = struct.unpack("<HHIIHH", data[:16])
            if audio_format != 1:
                raise ValueError(f"unsupported WAV format {audio_format} (PCM only)")
        elif tag == b"data":
            pcm = data
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if not channels or not pcm:
        raise ValueError("truncated WAV: missing fmt or data chunk")
    # corrupt fmt values must raise ValueError (quarantine-able), never
    # divide by zero downstream
    if rate == 0 or bits not in (8, 16, 24, 32):
        raise ValueError(f"corrupt WAV fmt: rate={rate} bits={bits}")
    n_frames = len(pcm) // (channels * bits // 8)
    return channels, rate, bits, n_frames * 1000.0 / rate, pcm


def _fake_dims(payload: bytes) -> tuple[int, int, int]:
    """Deterministic fake (width, height, channels) from the payload hash."""
    h = hashlib.sha256(payload or b"").digest()
    return 16 + h[0] % 240, 16 + h[1] % 240, 1 + h[2] % 4


def decode_image_features_stub(
    blobs: DataFrame, feature_dim: int = 8, strict: bool = False
) -> DataFrame:
    """Image decode + feature extraction over mapInPandas (Arrow batches).

    STUB: real decoding needs an image library not present in this
    container. strict=True raises the clearly-marked NotImplementedError;
    strict=False emits deterministic fakes (dims + features from the
    payload sha256) so the distributed plumbing is fully exercisable.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "image decode stub: install an image library (e.g. Pillow) "
                    "and replace decode_image_features_stub's kernel"
                )
            rows = []
            for blob_id, content in zip(pdf["blob_id"], pdf["content"]):
                payload = bytes(content) if content is not None else b""
                w, h, c = _fake_dims(payload)
                digest = hashlib.sha256(payload).digest()
                feats = [float(digest[i % 32]) / 255.0 for i in range(feature_dim)]
                rows.append((blob_id, w, h, c, feats))
            yield pd.DataFrame(
                rows, columns=["blob_id", "width", "height", "channels", "features"]
            )

    return blobs.select("blob_id", "content").mapInPandas(decode, IMAGE_FEATURES_SCHEMA)


MULTIMODAL_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("blob_id", T.StringType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("decode_status", T.StringType(), False),  # real|stub|error
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("duration_ms", T.DoubleType(), True),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)


# ---------------------------------------------------------------------------
# Image decode dispatch — THE NATIVE-CODEC SWAP SEAM
# ---------------------------------------------------------------------------
# Every image-decoding kernel (decode_features, resize_images) goes
# through `decode_image`, which resolves the container format with
# `sniff_image_format` and dispatches through this registry. The
# contract per decoder:
#
#     fn(payload: bytes) -> (width, height, channels, pixel_bytes)
#       pixel_bytes = row-major top-down, `channels` interleaved uint8
#     raises ValueError        -> corrupt payload (kernels emit an
#                                 'error' quarantine row)
#     raises NotImplementedError -> healthy container, declared-stub
#                                 codec (kernels emit a 'stub' row)
#
# A deployment with native codecs (libjpeg-turbo / Pillow / libwebp)
# swaps ONE entry — `register_image_decoder("jpeg", fast_jpeg)` at
# executor startup — and every kernel, schema, and quarantine behavior
# is unchanged: the seam is this function boundary, already
# Arrow-batched on both sides. The pure-Python decoders below are the
# sandbox reference implementations (and the correctness oracles for a
# native swap-in: same bytes in, same pixels out).

_IMAGE_SIGS: "list[tuple[str, Callable[[bytes], bool]]]" = [
    ("png", lambda p: p[:8] == _PNG_SIG),
    ("bmp", lambda p: p[:2] == b"BM"),
    ("gif", lambda p: p[:6] in (b"GIF87a", b"GIF89a")),
    ("jpeg", lambda p: p[:3] == b"\xff\xd8\xff"),
    ("tiff", lambda p: p[:4] in (b"II*\x00", b"MM\x00*")),
    ("webp", lambda p: p[:4] == b"RIFF" and p[8:12] == b"WEBP"),
    ("qoi", lambda p: p[:4] == _QOI_SIG),
]

_IMAGE_DECODERS: dict = {}


def _builtin_image_decoders() -> dict:
    from aeuc_vector_db_spark.sources.jpeg import jpeg_decode
    from aeuc_vector_db_spark.sources.webp import webp_decode

    return {
        "png": png_decode,
        "bmp": bmp_decode,
        "gif": gif_decode,
        "jpeg": jpeg_decode,
        "tiff": tiff_decode,
        "webp": webp_decode,
        "qoi": qoi_decode,
    }


def sniff_image_format(payload: bytes) -> "str | None":
    """Container format tag from magic bytes, or None if no registered
    image format matches."""
    for fmt, match in _IMAGE_SIGS:
        if match(payload):
            return fmt
    return None


def register_image_decoder(fmt: str, fn) -> None:
    """Swap in a decoder (e.g. a native codec) for one format tag. Call
    once per executor process — module state is per-worker, exactly
    where a native library handle lives."""
    if fmt not in {f for f, _ in _IMAGE_SIGS}:
        raise ValueError(f"unknown image format tag {fmt!r}")
    _IMAGE_DECODERS[fmt] = fn


def unregister_image_decoder(fmt: str) -> None:
    """Remove a swapped-in decoder; the next decode_image for `fmt`
    lazily falls back to the pure-Python builtin (the verified
    reference implementation)."""
    _IMAGE_DECODERS.pop(fmt, None)


def _snapshot_image_decoders(fmts) -> dict:
    """Current registry entries for `fmts` (None = not registered).
    Module-level ON PURPOSE: a nested kernel function is cloudpickled
    BY VALUE, and cloudpickle captures any module global it references
    (like _IMAGE_DECODERS) as a stale COPY in the worker — so kernels
    must only ever touch the registry through these by-reference
    module functions, never through the global name directly."""
    return {f: _IMAGE_DECODERS.get(f) for f in fmts}


def _restore_image_decoders(prev: dict) -> None:
    """Invert a snapshot taken by _snapshot_image_decoders."""
    for f, old in prev.items():
        if old is None:
            _IMAGE_DECODERS.pop(f, None)
        else:
            _IMAGE_DECODERS[f] = old


def _png_batch_eligible() -> bool:
    """True when the effective PNG decoder is the builtin — the batched
    wavefront pre-pass must stand aside for a registered native codec
    (seam contract: overrides route per item through decode_image).
    Module-level for the same cloudpickle reason as
    _snapshot_image_decoders."""
    dec = _IMAGE_DECODERS.get("png")
    return dec is None or dec is png_decode


def _png_batch_prepass(modalities, contents) -> dict:
    """Batch-decode the builtin-PNG image rows of one Arrow batch:
    {row_position: (w, h, c, pixels) | Exception}. Same-shape
    Average/Paeth images share one wavefront scan (png_decode_batch);
    captured exceptions re-raise inside decode_one so the error-row
    taxonomy is identical to the per-item path."""
    idxs: list[int] = []
    payloads: list[bytes] = []
    for j, (m, c) in enumerate(zip(modalities, contents)):
        p = bytes(c) if c is not None else b""
        if m == "image" and p[:8] == _PNG_SIG:
            idxs.append(j)
            payloads.append(p)
    if not idxs:
        return {}
    return dict(zip(idxs, png_decode_batch(payloads, on_error="capture")))


def _jpeg_batch_eligible() -> bool:
    """True when the effective JPEG decoder is the builtin — the
    lockstep batch pre-pass must stand aside for a registered native
    codec, exactly like `_png_batch_eligible`."""
    from aeuc_vector_db_spark.sources.jpeg import jpeg_decode

    dec = _IMAGE_DECODERS.get("jpeg")
    return dec is None or dec is jpeg_decode


def _jpeg_batch_prepass(modalities, contents) -> dict:
    """Batch-decode the builtin-JPEG image rows of one Arrow batch via
    the lockstep lane kernel (round 15): {row_position: (w, h, c,
    pixels) | Exception}. Restart-interval segments × images form the
    lane axis (`jpeg_decode_batch`); captured exceptions re-raise
    inside decode_one so the error-row taxonomy is identical to the
    per-item path (lane anomalies already replay the scalar decoder
    inside the batch kernel)."""
    from aeuc_vector_db_spark.sources.jpeg import jpeg_decode_batch

    idxs: list[int] = []
    payloads: list[bytes] = []
    for j, (m, c) in enumerate(zip(modalities, contents)):
        p = bytes(c) if c is not None else b""
        if m == "image" and p[:3] == b"\xff\xd8\xff":
            idxs.append(j)
            payloads.append(p)
    if not idxs:
        return {}
    return dict(zip(idxs, jpeg_decode_batch(payloads, on_error="capture")))


def decode_image(payload: bytes) -> tuple[int, int, int, bytes]:
    """Decode any registered image container: (w, h, channels, pixels).
    ValueError on corrupt/unrecognized bytes; NotImplementedError rides
    through from declared-stub codecs (lossy WebP)."""
    fmt = sniff_image_format(payload)
    if fmt is None:
        raise ValueError("unsupported image container")
    dec = _IMAGE_DECODERS.get(fmt)
    if dec is None:
        _IMAGE_DECODERS.update(
            {k: v for k, v in _builtin_image_decoders().items()
             if k not in _IMAGE_DECODERS}
        )
        dec = _IMAGE_DECODERS[fmt]
    return dec(payload)


def decode_features(
    blobs: DataFrame,
    feature_dim: int = 8,
    decoder_overrides: "dict | None" = None,
) -> DataFrame:
    """Unified multimodal feature extraction over mapInPandas.

    Real kernels where the format is decodable with the standard library
    (PNG via png_decode, WAV via wav_decode — `decode_status='real'`,
    features are true pixel/amplitude statistics); declared stub for
    video/unknown formats (`decode_status='stub'`, sha256-derived fake).
    Corrupt payloads land as `decode_status='error'` rows instead of
    failing the job — the quarantine philosophy of streaming/ingest.py
    applied to decode.

    One input row → one output row; modality rides through the kernel so
    no join is needed afterwards. Bytes stay inside the Arrow batches.

    `decoder_overrides` ({fmt: decoder_fn}) exercises the native-codec
    swap seam THROUGH the DataFrame API: the overrides are registered
    inside the kernel — per Python worker, where a native library
    handle lives — and restored when the kernel's batches are drained,
    so worker reuse never leaks a swap into later queries. Decoder
    functions must be picklable (module-level). A cluster deployment
    would instead call register_image_decoder at executor startup; the
    contract either way is decode_image's: bytes → (w, h, channels,
    row-major interleaved uint8), ValueError = quarantine,
    NotImplementedError = declared stub.
    """
    import numpy as np

    overrides = dict(decoder_overrides or {})
    for f in overrides:
        if f not in {t for t, _ in _IMAGE_SIGS}:
            raise ValueError(f"unknown image format tag {f!r}")

    def _known_unsupported(modality: str, payload: bytes) -> bool:
        """Healthy container of a format this stdlib-only kernel can't
        decode (needs Pillow/ffmpeg) — stub territory, not corruption."""
        if modality == "image":
            return payload[:4] == b"RIFF" and payload[8:12] == b"WEBP"
        if modality == "audio":
            return (
                payload[:3] == b"ID3"                # MP3 w/ ID3 tag
                or payload[:2] in (b"\xff\xfb", b"\xff\xf3", b"\xff\xf2")  # MP3 sync
                or payload[:4] in (b"fLaC", b"OggS")
            )
        return modality not in ("image", "audio")    # video/unknown → stub

    def decode_one(blob_id: str, modality: str, content, pre=None) -> tuple:
        payload = bytes(content) if content is not None else b""
        try:
            if modality == "image" and sniff_image_format(payload) is not None:
                try:
                    if pre is not None:
                        # batched-wavefront pre-pass result (or its
                        # captured exception — re-raise so the error
                        # taxonomy matches the per-item path exactly)
                        if isinstance(pre, Exception):
                            raise pre
                        w, h, c, pix = pre
                    else:
                        w, h, c, pix = decode_image(payload)
                except NotImplementedError:
                    # healthy container, declared-stub codec (VP8 inter
                    # frame — the video class; lossy key frames decode
                    # for real since round 8)
                    w, h, c = _fake_dims(payload)
                    digest = hashlib.sha256(payload).digest()
                    feats = [
                        float(digest[i % 32]) / 255.0 for i in range(feature_dim)
                    ]
                    return (
                        blob_id, modality, "stub", w, h, c, None, None, feats,
                    )
                arr = np.frombuffer(pix, dtype=np.uint8).reshape(-1, c)
                # per-channel mean/std interleaved, padded to feature_dim
                feats = []
                for ch in range(c):
                    col = arr[:, ch].astype(np.float64)
                    feats += [float(col.mean()) / 255.0, float(col.std()) / 255.0]
                feats = (feats + [0.0] * feature_dim)[:feature_dim]
                return (blob_id, modality, "real", w, h, c, None, None, feats)
            if modality == "audio" and payload[:4] == b"RIFF":
                c, rate, bits, dur_ms, pcm = wav_decode(payload)
                if bits == 16:
                    samp = np.frombuffer(
                        pcm[: len(pcm) // 2 * 2], dtype="<i2"
                    ).astype(np.float64) / 32768.0
                else:
                    samp = np.frombuffer(pcm, dtype=np.uint8).astype(np.float64) / 255.0
                feats = [
                    float(samp.mean()) if len(samp) else 0.0,
                    float(np.sqrt((samp**2).mean())) if len(samp) else 0.0,
                    float(samp.min()) if len(samp) else 0.0,
                    float(samp.max()) if len(samp) else 0.0,
                ]
                feats = (feats + [0.0] * feature_dim)[:feature_dim]
                return (blob_id, modality, "real", None, None, c, rate, dur_ms, feats)
            if (
                modality == "video"
                and payload[:4] == b"RIFF"
                and payload[8:12] == b"AVI "
            ):
                w, h, uspf, handler, frames = avi_probe(payload)
                dur_ms = len(frames) * uspf / 1000.0
                if handler.upper() == "MJPG" and frames:
                    # REAL decode: up to 3 evenly spaced frames through
                    # the decoder SEAM (decode_image) — a registered
                    # native JPEG codec accelerates MJPEG video too
                    idxs = sorted({0, len(frames) // 2, len(frames) - 1})
                    planes = []
                    for i in idxs:
                        _, _, fc, pix = decode_image(frames[i])
                        planes.append(
                            np.frombuffer(pix, dtype=np.uint8).reshape(-1, fc)
                        )
                    arr = np.concatenate(planes)
                    feats = []
                    for ch in range(arr.shape[1]):
                        col = arr[:, ch].astype(np.float64)
                        feats += [float(col.mean()) / 255.0, float(col.std()) / 255.0]
                    feats = (feats + [0.0] * feature_dim)[:feature_dim]
                    return (
                        blob_id, modality, "real", w, h, int(arr.shape[1]),
                        None, dur_ms, feats,
                    )
                # healthy AVI, non-MJPG codec: container metadata is real,
                # sample data needs ffmpeg → 'meta' (same tier as MP4)
                digest = hashlib.sha256(payload).digest()
                feats = [float(digest[i % 32]) / 255.0 for i in range(feature_dim)]
                return (blob_id, modality, "meta", w, h, None, None, dur_ms, feats)
            if modality == "video" and len(payload) >= 12 and payload[4:8] == b"ftyp":
                # 'meta': container structure parsed for REAL (ISO-BMFF box
                # walk → dims + duration); sample data needs ffmpeg, so
                # features stay payload-hash fakes — between 'real' and
                # 'stub', and monitoring can tell the three apart.
                w, h, dur_ms = mp4_probe(payload)
                digest = hashlib.sha256(payload).digest()
                feats = [float(digest[i % 32]) / 255.0 for i in range(feature_dim)]
                return (blob_id, modality, "meta", w, h, None, None, dur_ms, feats)
            # 'stub' = healthy container of a format needing external libs
            # (MP3/video/...); 'error' = bytes no codec recognizes or
            # a recognized container whose contents fail to parse.
            # Conflating healthy-but-unsupported with corrupt would let
            # error-rate monitoring drown in false positives.
            if not _known_unsupported(modality, payload):
                raise ValueError("unrecognized container bytes for modality")
            w, h, c = _fake_dims(payload)
            digest = hashlib.sha256(payload).digest()
            feats = [float(digest[i % 32]) / 255.0 for i in range(feature_dim)]
            return (blob_id, modality, "stub", w, h, c, None, None, feats)
        except (ValueError, zlib.error, struct.error, MemoryError, IndexError,
                KeyError):
            # IndexError/KeyError: malformed container walks off a table or
            # segment — same quarantine semantics as a parse error
            return (blob_id, modality, "error", None, None, None, None, None, None)

    cols = [f.name for f in MULTIMODAL_FEATURES_SCHEMA.fields]

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per-worker decoder swap, scoped to THIS kernel's lifetime:
        # snapshot → register overrides → restore in finally (reused
        # Python workers must not carry the swap into later queries).
        # Registry access ONLY via module-level functions — this nested
        # function is cloudpickled by value and would otherwise capture
        # _IMAGE_DECODERS as a stale driver-side COPY, silently writing
        # the restore into the wrong dict (see _snapshot_image_decoders)
        prev = _snapshot_image_decoders(overrides)
        for f, fn in overrides.items():
            register_image_decoder(f, fn)
        try:
            for pdf in batches:
                # batched PNG wavefront over the whole Arrow batch when
                # the effective decoder is the builtin (a registered
                # native codec keeps per-item routing through the seam)
                pre = (
                    _png_batch_prepass(pdf["modality"], pdf["content"])
                    if _png_batch_eligible() else {}
                )
                if _jpeg_batch_eligible():
                    pre.update(
                        _jpeg_batch_prepass(pdf["modality"], pdf["content"])
                    )
                rows = [
                    decode_one(b, m, c, pre.get(j))
                    for j, (b, m, c) in enumerate(zip(
                        pdf["blob_id"], pdf["modality"], pdf["content"]
                    ))
                ]
                yield pd.DataFrame(rows, columns=cols)
        finally:
            _restore_image_decoders(prev)

    return blobs.select("blob_id", "modality", "content").mapInPandas(
        decode, MULTIMODAL_FEATURES_SCHEMA
    )


def sample_frames_stub(
    blobs: DataFrame, every_ms: int = 1000, max_frames: int = 4, strict: bool = False
) -> DataFrame:
    """Video frame sampling over mapInPandas — 1 input row → N frame rows.

    STUB kernel (no ffmpeg in container): emits max_frames deterministic
    pseudo-frames per blob, frame bytes = sha256(payload ‖ idx). The
    expansion shape (flat-map via mapInPandas) is the real contract.
    """

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "frame sampling stub: install ffmpeg bindings and replace "
                    "sample_frames_stub's kernel"
                )
            rows = []
            for blob_id, content in zip(pdf["blob_id"], pdf["content"]):
                payload = bytes(content) if content is not None else b""
                for i in range(max_frames):
                    rows.append(
                        (
                            blob_id,
                            i,
                            i * every_ms,
                            hashlib.sha256(payload + bytes([i])).digest(),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["blob_id", "frame_idx", "frame_ts_ms", "frame_bytes"]
            )

    return blobs.select("blob_id", "content").mapInPandas(sample, FRAME_SAMPLE_SCHEMA)


RESIZED_IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("blob_id", T.StringType(), False),
        T.StructField("decode_status", T.StringType(), False),  # real|error
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("content", T.BinaryType(), True),  # re-encoded PNG
    ]
)


def resize_nearest(pix: bytes, w: int, h: int, c: int, out_w: int, out_h: int) -> bytes:
    """Nearest-neighbor resize of a raw pixel buffer (NumPy gather —
    index math only, no external image library)."""
    import numpy as np

    arr = np.frombuffer(pix, dtype=np.uint8).reshape(h, w, c)
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return arr[ys][:, xs].tobytes()


def resize_images(blobs: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """REAL image resize pipeline: decode (PNG/BMP, pure stdlib) →
    nearest-neighbor resample (NumPy) → re-encode as PNG. One row in,
    one row out; corrupt/unsupported payloads become decode_status=
    'error' rows (quarantine philosophy), so one bad blob never kills
    the batch. Bytes stay inside Arrow batches end-to-end.

    This is the standard training-data normalization step (uniform
    resolution before feature extraction/packing); the kernel is real
    for the stdlib-decodable formats and exercises the exact mapInPandas
    shape a Pillow/ffmpeg kernel would use for the rest.
    """

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows = []
        for pdf in batches:
            for blob_id, content in zip(pdf["blob_id"], pdf["content"]):
                payload = bytes(content) if content is not None else b""
                try:
                    try:
                        w, h, c, pix = decode_image(payload)
                    except NotImplementedError as exc:
                        # a resize NEEDS pixels: a declared-stub codec
                        # (lossy VP8) is an error row here, not a stub row
                        raise ValueError(str(exc)) from exc
                    small = resize_nearest(pix, w, h, c, out_w, out_h)
                    # grayscale/alpha channel counts re-encode via the
                    # matching PNG color type
                    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
                    png = png_encode(small, out_w, out_h, color_type)
                    rows.append((blob_id, "real", out_w, out_h, png))
                except (ValueError, zlib.error, struct.error, MemoryError,
                        KeyError, IndexError):
                    rows.append((blob_id, "error", None, None, None))
            yield pd.DataFrame(
                rows, columns=["blob_id", "decode_status", "width", "height", "content"]
            )
            rows = []

    return blobs.select("blob_id", "content").mapInPandas(work, RESIZED_IMAGE_SCHEMA)


AUDIO_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("blob_id", T.StringType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_ts_ms", T.DoubleType(), False),
        T.StructField("rms", T.DoubleType(), True),
        T.StructField("peak", T.DoubleType(), True),
    ]
)


def audio_frame_features(blobs: DataFrame, window_ms: int = 250) -> DataFrame:
    """REAL audio framing: WAV (PCM16) → fixed windows → per-window RMS
    and peak amplitude. 1 input row → N frame rows (the flat-map shape
    video frame sampling uses, with a real kernel). The trailing partial
    window is kept (its RMS is over the samples present). Corrupt
    payloads yield no frames — pair with decode_features for the error
    accounting."""
    import numpy as np

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows = []
        for pdf in batches:
            for blob_id, content in zip(pdf["blob_id"], pdf["content"]):
                payload = bytes(content) if content is not None else b""
                try:
                    channels, rate, bits, _dur, pcm = wav_decode(payload)
                    if bits != 16:
                        raise ValueError("PCM16 only for framing")
                except (ValueError, struct.error):
                    continue
                samp = np.frombuffer(pcm[: len(pcm) // 2 * 2], dtype="<i2")
                samp = samp.astype(np.float64) / 32768.0
                if channels > 1:  # mono mixdown for the energy envelope
                    n = len(samp) // channels * channels
                    samp = samp[:n].reshape(-1, channels).mean(axis=1)
                win = max(1, rate * window_ms // 1000)
                for i in range(0, max(len(samp), 1), win):
                    chunk = samp[i : i + win]
                    if not len(chunk):
                        break
                    rows.append(
                        (
                            blob_id,
                            i // win,
                            i * 1000.0 / rate,
                            float(np.sqrt((chunk**2).mean())),
                            float(np.abs(chunk).max()),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["blob_id", "frame_idx", "frame_ts_ms", "rms", "peak"]
            )
            rows = []

    return blobs.select("blob_id", "content").mapInPandas(work, AUDIO_FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# GIF codec (public GIF87a/89a spec; LZW is fully specified there)
# ---------------------------------------------------------------------------

def gif_encode(indices: bytes, width: int, height: int, palette: "list[tuple[int,int,int]]") -> bytes:
    """Minimal valid GIF89a writer for tests/corpus builders: one frame,
    global palette, non-interlaced. Uses the classic clear-code-early
    LZW stream (emit CLEAR before the dictionary would grow), which every
    conforming decoder — including gif_decode below — must accept."""
    if len(indices) != width * height:
        raise ValueError("index buffer does not match width*height")
    if not palette or len(palette) > 256:
        raise ValueError("palette must have 1..256 entries")
    bits = max(2, (len(palette) - 1).bit_length())
    pal_n = 1 << bits
    pal = b"".join(bytes(c) for c in palette) + b"\x00\x00\x00" * (pal_n - len(palette))
    header = b"GIF89a" + struct.pack("<HH", width, height) + bytes(
        [0x80 | (bits - 1), 0, 0]
    ) + pal
    img_desc = b"\x2c" + struct.pack("<HHHH", 0, 0, width, height) + b"\x00"
    clear, end = 1 << bits, (1 << bits) + 1
    out_bits: list[int] = []
    code_size = bits + 1

    def emit(code: int) -> None:
        for i in range(code_size):
            out_bits.append((code >> i) & 1)

    emit(clear)
    budget = clear - 2  # codes before the next width growth
    for i, idx in enumerate(indices):
        if budget == 0:
            emit(clear)
            budget = clear - 2
        emit(idx)
        budget -= 1
    emit(end)
    data = bytearray()
    for i in range(0, len(out_bits), 8):
        byte = 0
        for j, b in enumerate(out_bits[i : i + 8]):
            byte |= b << j
        data.append(byte)
    blocks = b"".join(
        bytes([min(255, len(data) - i)]) + bytes(data[i : i + 255])
        for i in range(0, len(data), 255)
    )
    return header + img_desc + bytes([bits]) + blocks + b"\x00" + b"\x3b"


def gif_decode(payload: bytes) -> tuple[int, int, int, bytes]:
    """Pure-stdlib GIF decode: (width, height, 3, RGB bytes of the FIRST
    frame). Full LZW (dictionary growth, code-width bumps, clear codes);
    non-interlaced, global-or-local palette; extensions skipped.
    Animated GIFs yield their first frame (the standard thumbnail/feature
    semantic); interlaced frames raise ValueError (honest subset)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF: bad signature")
    if len(payload) < 13:
        raise ValueError("truncated GIF header")
    sw, sh = struct.unpack("<HH", payload[6:10])
    packed = payload[10]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = payload[pos : pos + 3 * n]
        if len(gct) < 3 * n:
            raise ValueError("truncated GIF global color table")
        pos += 3 * n

    def skip_subblocks(p: int) -> int:
        while p < len(payload):
            ln = payload[p]
            p += 1
            if ln == 0:
                return p
            p += ln
        raise ValueError("truncated GIF sub-blocks")

    while pos < len(payload):
        b = payload[pos]
        if b == 0x21:  # extension
            pos = skip_subblocks(pos + 2)
        elif b == 0x2C:  # image descriptor
            if pos + 10 > len(payload):
                raise ValueError("truncated GIF image descriptor")
            _l, _t, w, h = struct.unpack("<HHHH", payload[pos + 1 : pos + 9])
            ipacked = payload[pos + 9]
            pos += 10
            if ipacked & 0x40:
                raise ValueError("interlaced GIF unsupported")
            pal = gct
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                pal = payload[pos : pos + 3 * n]
                if len(pal) < 3 * n:
                    raise ValueError("truncated GIF local color table")
                pos += 3 * n
            if pal is None:
                raise ValueError("GIF frame has no color table")
            if not w or not h or w * h > 1 << 26:
                raise ValueError(f"bad GIF dimensions {w}x{h}")
            min_code = payload[pos]
            pos += 1
            data = bytearray()
            while pos < len(payload):
                ln = payload[pos]
                pos += 1
                if ln == 0:
                    break
                data += payload[pos : pos + ln]
                pos += ln
            indices = _lzw_decode(bytes(data), min_code, w * h)
            n_colors = len(pal) // 3
            rgb = bytearray()
            for idx in indices:
                if idx >= n_colors:
                    raise ValueError("GIF pixel index out of palette range")
                rgb += pal[idx * 3 : idx * 3 + 3]
            return w, h, 3, bytes(rgb)
        elif b == 0x3B:
            break
        else:
            raise ValueError(f"bad GIF block marker 0x{b:02x}")
    raise ValueError("GIF contains no image frame")


def _lzw_decode(data: bytes, min_code: int, max_pixels: int) -> bytes:
    """GIF-flavor LZW: LSB-first bit packing, CLEAR/END codes, dictionary
    capped at 4096. Bounded by max_pixels — a crafted stream cannot
    expand past the dimensions the descriptor promised."""
    if not (2 <= min_code <= 11):
        raise ValueError(f"bad LZW min code size {min_code}")
    clear, end = 1 << min_code, (1 << min_code) + 1
    out = bytearray()
    table: list[bytes] = []

    def reset() -> None:
        table.clear()
        table.extend(bytes([i]) for i in range(1 << min_code))
        table.extend((b"", b""))  # clear + end placeholders

    reset()
    code_size = min_code + 1
    acc = nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= code_size:
            code = acc & ((1 << code_size) - 1)
            acc >>= code_size
            nbits -= code_size
            if code == clear:
                reset()
                code_size = min_code + 1
                prev = None
                continue
            if code == end:
                return bytes(out[:max_pixels])
            if prev is None:
                if code >= len(table):
                    raise ValueError("bad first LZW code")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
            elif code == len(table):
                entry = prev + prev[:1]  # the KwKwK case
            else:
                raise ValueError("LZW code beyond dictionary")
            out += entry
            if len(out) >= max_pixels:
                return bytes(out[:max_pixels])
            if prev is not None and len(table) < 4096:
                table.append(prev + entry[:1])
                if len(table) == (1 << code_size) and code_size < 12:
                    code_size += 1
            prev = entry
    raise ValueError("truncated LZW stream (no END code)")


# ---------------------------------------------------------------------------
# MP4 (ISO-BMFF) metadata probe — container structure is public spec;
# frame DECODE still needs ffmpeg and stays stubbed, but duration and
# track dimensions come from real box parsing.
# ---------------------------------------------------------------------------

def mp4_minimal(width: int, height: int, duration_ms: int, timescale: int = 1000) -> bytes:
    """Minimal valid ISO-BMFF skeleton (ftyp + moov[mvhd + trak[tkhd]] +
    mdat) for tests/corpus builders — enough structure for any
    conforming box walker to report duration and dimensions."""

    def box(tag: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", len(payload) + 8) + tag + payload

    dur = duration_ms * timescale // 1000
    mvhd = box(
        b"mvhd",
        b"\x00\x00\x00\x00"  # version 0 + flags
        + struct.pack(">II", 0, 0)  # ctime, mtime
        + struct.pack(">II", timescale, dur)
        + struct.pack(">I", 0x00010000)  # rate 1.0
        + struct.pack(">H", 0x0100)      # volume 1.0
        + b"\x00" * 10
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", 2),  # next track id
    )
    tkhd = box(
        b"tkhd",
        b"\x00\x00\x00\x07"
        + struct.pack(">II", 0, 0)
        + struct.pack(">I", 1)  # track id
        + b"\x00" * 4
        + struct.pack(">I", dur)
        + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0)  # layer/group/volume/reserved
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", width << 16, height << 16),  # 16.16 fixed
    )
    moov = box(b"moov", mvhd + box(b"trak", tkhd))
    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2mp41")
    return ftyp + moov + box(b"mdat", b"\x00" * 8)


def mp4_probe(payload: bytes) -> tuple[int | None, int | None, float]:
    """Walk ISO-BMFF boxes: (width, height, duration_ms) from the first
    video-sized tkhd and the mvhd. Raises ValueError on non-BMFF bytes
    or truncated boxes. Handles 64-bit largesize and version-1 headers.
    Pure metadata — no sample/codec data is touched."""
    if len(payload) < 12 or payload[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF container (no ftyp)")

    def walk(data: bytes, start: int, end: int):
        pos = start
        while pos + 8 <= end:
            (size,) = struct.unpack(">I", data[pos : pos + 4])
            tag = data[pos + 4 : pos + 8]
            hdr = 8
            if size == 1:
                if pos + 16 > end:
                    raise ValueError("truncated largesize box")
                (size,) = struct.unpack(">Q", data[pos + 8 : pos + 16])
                hdr = 16
            elif size == 0:
                size = end - pos
            if size < hdr or pos + size > end:
                raise ValueError(f"bad box size for {tag!r}")
            yield tag, pos + hdr, pos + size
            pos += size

    duration_ms = 0.0
    width = height = None
    for tag, s, e in walk(payload, 0, len(payload)):
        if tag != b"moov":
            continue
        for t2, s2, e2 in walk(payload, s, e):
            if t2 == b"mvhd":
                ver = payload[s2]
                if ver == 1:
                    ts, dur = struct.unpack(">IQ", payload[s2 + 20 : s2 + 32])
                else:
                    ts, dur = struct.unpack(">II", payload[s2 + 12 : s2 + 20])
                if ts:
                    duration_ms = dur * 1000.0 / ts
            elif t2 == b"trak":
                for t3, s3, e3 in walk(payload, s2, e2):
                    if t3 != b"tkhd" or width is not None:
                        continue
                    ver = payload[s3]
                    off = s3 + (32 if ver == 0 else 44)  # … through reserved
                    off += 2 + 2 + 2 + 2 + 36            # layer…matrix
                    w_fp, h_fp = struct.unpack(">II", payload[off : off + 8])
                    if w_fp and h_fp:
                        width, height = w_fp >> 16, h_fp >> 16
    return width, height, duration_ms


# -- AVI / MJPEG video ---------------------------------------------------
#
# Motion-JPEG inside an AVI RIFF container is the one mainstream video
# format a pure-stdlib engine can decode for REAL: the container is a
# flat chunk walk and every frame is a baseline JPEG, which
# sources/jpeg.py already decodes. This upgrades the video modality from
# 'stub'/'meta' to 'real' for MJPG AVIs — true pixel statistics and true
# frame bytes — while other codecs (H.264/VP9/…) stay honestly declared
# stubs (they need ffmpeg). Reference analog: the reference has no
# multimodal surface at all (charter extension E5).


def avi_mjpeg_encode(
    frames: "list[bytes]", width: int, height: int, fps: int = 10
) -> bytes:
    """Minimal valid AVI (RIFF) wrapping pre-encoded JPEG frames as an
    MJPG 'vids' stream — for tests and corpus builders. Little-endian
    throughout; every chunk padded to even length per RIFF."""
    if not frames or fps <= 0:
        raise ValueError("avi_mjpeg_encode: need >=1 frame and fps > 0")

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return tag + struct.pack("<I", len(payload)) + payload + (
            b"\x00" if len(payload) & 1 else b""
        )

    def lst(ltype: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", ltype + payload)

    uspf = 1_000_000 // fps
    max_size = max(len(f) for f in frames)
    avih = struct.pack(
        "<14I",
        uspf, max_size * fps, 0, 0x10,      # usec/frame, bytes/s, pad, HASINDEX-less flags
        len(frames), 0, 1, max_size,         # total frames, initial, streams, bufsize
        width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vidsMJPG"
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, len(frames), max_size, 0, 0)
        + struct.pack("<4H", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00dc", f) for f in frames))
    return chunk(b"RIFF", b"AVI " + hdrl + movi)


def avi_probe(payload: bytes) -> tuple[int, int, float, str, "list[bytes]"]:
    """Walk an AVI RIFF container: returns (width, height,
    usec_per_frame, video fourcc handler, frame chunks). Frame bytes are
    returned as stored ('00dc'/'00db' stream-0 chunks, including inside
    'rec ' groups) — decoding them is the caller's choice. Raises
    ValueError on non-AVI bytes or truncated chunks."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI RIFF container")
    (riff_size,) = struct.unpack("<I", payload[4:8])
    end = min(len(payload), 8 + riff_size)

    def chunks(lo: int, hi: int):
        pos = lo
        while pos + 8 <= hi:
            tag = payload[pos : pos + 4]
            (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
            if pos + 8 + size > hi:
                raise ValueError(f"truncated AVI chunk {tag!r}")
            yield tag, pos + 8, pos + 8 + size
            pos += 8 + size + (size & 1)

    width = height = None
    uspf = 0.0
    handler = ""
    frames: list[bytes] = []

    def collect_movi(lo: int, hi: int) -> None:
        for tag, s, e in chunks(lo, hi):
            if tag == b"LIST" and payload[s : s + 4] == b"rec ":
                collect_movi(s + 4, e)
            elif tag[:2] == b"00" and tag[2:4] in (b"dc", b"db"):
                frames.append(payload[s:e])

    for tag, s, e in chunks(12, end):
        if tag != b"LIST":
            continue
        ltype = payload[s : s + 4]
        if ltype == b"hdrl":
            for t2, s2, e2 in chunks(s + 4, e):
                if t2 == b"avih" and e2 - s2 >= 40:
                    vals = struct.unpack("<10I", payload[s2 : s2 + 40])
                    uspf, width, height = float(vals[0]), vals[8], vals[9]
                elif t2 == b"LIST" and payload[s2 : s2 + 4] == b"strl":
                    for t3, s3, e3 in chunks(s2 + 4, e2):
                        if (
                            t3 == b"strh"
                            and payload[s3 : s3 + 4] == b"vids"
                            and not handler
                        ):
                            handler = (
                                payload[s3 + 4 : s3 + 8]
                                .decode("ascii", "replace")
                                .strip("\x00 ")
                            )
        elif ltype == b"movi":
            collect_movi(s + 4, e)
    if width is None:
        raise ValueError("AVI container has no avih header")
    return width, height, uspf, handler, frames


def sample_frames(
    blobs: DataFrame, every_ms: int = 1000, max_frames: int = 4
) -> DataFrame:
    """Video frame sampling, 1 input row → ≤max_frames frame rows.

    REAL for MJPEG-in-AVI payloads: emits the actual stored JPEG frame
    bytes at the frame nearest each target timestamp (k·every_ms), with
    the true timestamp from the container's usec-per-frame — real bytes
    start with the JPEG SOI marker. Other containers/codecs fall back to
    the declared stub rows (sha256-derived fakes, frame k at k·every_ms)
    so the flat-map expansion shape is uniform for downstream consumers;
    corrupt AVI payloads also fall back rather than failing the job
    (decode-quarantine philosophy)."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for blob_id, content in zip(pdf["blob_id"], pdf["content"]):
                payload = bytes(content) if content is not None else b""
                emitted = False
                if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
                    try:
                        _, _, uspf, handler, frames = avi_probe(payload)
                        if handler.upper() == "MJPG" and frames and uspf > 0:
                            for k in range(max_frames):
                                idx = round(k * every_ms * 1000.0 / uspf)
                                if idx >= len(frames):
                                    break
                                rows.append(
                                    (blob_id, k, int(idx * uspf) // 1000, frames[idx])
                                )
                            emitted = True
                    except (ValueError, struct.error):
                        pass
                if not emitted:
                    for i in range(max_frames):
                        rows.append(
                            (
                                blob_id,
                                i,
                                i * every_ms,
                                hashlib.sha256(payload + bytes([i])).digest(),
                            )
                        )
            yield pd.DataFrame(
                rows, columns=["blob_id", "frame_idx", "frame_ts_ms", "frame_bytes"]
            )

    return blobs.select("blob_id", "content").mapInPandas(sample, FRAME_SAMPLE_SCHEMA)
