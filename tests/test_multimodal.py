"""Real multimodal decode kernels (E5): pure-stdlib PNG/WAV codecs with
pinned known-file values, plus the unified decode_features kernel over
the binaryFile source (real / stub / error row taxonomy)."""

import struct
import zlib

import pytest

from aeuc_vector_db_spark.sources import multimodal as MM


# ---------------------------------------------------------------------------
# PNG codec (pure python, no Spark)
# ---------------------------------------------------------------------------

def test_png_roundtrip_rgb():
    # 2x2 RGB, known pixels
    pixels = bytes([255, 0, 0,  0, 255, 0,
                    0, 0, 255,  10, 20, 30])
    payload = MM.png_encode(pixels, 2, 2, color_type=2)
    assert payload[:8] == b"\x89PNG\r\n\x1a\n"
    w, h, c, out = MM.png_decode(payload)
    assert (w, h, c) == (2, 2, 3)
    assert out == pixels


def test_png_roundtrip_grayscale():
    pixels = bytes(range(16))
    payload = MM.png_encode(pixels, 4, 4, color_type=0)
    w, h, c, out = MM.png_decode(payload)
    assert (w, h, c) == (4, 4, 1)
    assert out == pixels


def _png_with_filters(width, height, channels, filtered_rows, color_type):
    """Hand-build a PNG whose scanlines use explicit filter types."""
    raw = b"".join(bytes([ft]) + bytes(row) for ft, row in filtered_rows)
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def test_png_unfilter_sub_up_average_paeth():
    # grayscale 4x5, one scanline per filter type; expected pixels derived
    # by applying the spec's reconstruction functions by hand
    rows = [
        (0, [10, 20, 30, 40]),           # None → 10 20 30 40
        (1, [5, 5, 5, 5]),               # Sub  → 5 10 15 20
        (2, [1, 1, 1, 1]),               # Up   → 6 11 16 21
        (3, [4, 4, 4, 4]),               # Average: left/up halves
        (4, [2, 2, 2, 2]),               # Paeth
    ]
    payload = _png_with_filters(4, 5, 1, rows, color_type=0)
    w, h, c, out = MM.png_decode(payload)
    assert (w, h, c) == (4, 5, 1)
    got = list(out)
    assert got[0:4] == [10, 20, 30, 40]
    assert got[4:8] == [5, 10, 15, 20]
    assert got[8:12] == [6, 11, 16, 21]
    # Average row: x=4+floor((left+up)/2); left(0)=0,up=6 → 7; then
    # left=7,up=11 → 13; left=13,up=16 → 18; left=18,up=21 → 23
    assert got[12:16] == [7, 13, 18, 23]
    # Paeth row: predictor of (left, up, upleft)
    # x0: a=0,b=7,c=0 → p=7 pa=7 pb=0 → pred=b=7 → 9
    # x1: a=9,b=13,c=7 → p=15 pa=6 pb=2 pc=8 → pred=13 → 15
    # x2: a=15,b=18,c=13 → p=20 pa=5 pb=2 pc=7 → pred=18 → 20
    # x3: a=20,b=23,c=18 → p=25 pa=5 pb=2 pc=7 → pred=23 → 25
    assert got[16:20] == [9, 15, 20, 25]


def test_png_decode_batch_matches_single():
    """png_decode_batch (round 14): byte-identical to png_decode per
    item across mixed shapes, channel counts, and filter mixes; shared
    (w, h, c) Average/Paeth images ride one batched wavefront. Error
    contract: on_error='raise' propagates like the single decode,
    on_error='capture' stores the exception instance in place."""
    import numpy as np

    rng = np.random.default_rng(5)
    blobs = []
    for h, w, c in [(5, 4, 1), (5, 4, 1), (6, 3, 3), (5, 4, 1), (2, 2, 4)]:
        rows = [
            (int(rng.integers(0, 5)),
             [int(v) for v in rng.integers(0, 256, w * c)])
            for _ in range(h)
        ]
        ct = {1: 0, 3: 2, 4: 6}[c]
        blobs.append(_png_with_filters(w, h, c, rows, color_type=ct))
    singles = [MM.png_decode(b) for b in blobs]
    assert MM.png_decode_batch(blobs) == singles
    # error contract
    mixed = blobs[:1] + [b"junk"] + blobs[1:2]
    with pytest.raises(ValueError):
        MM.png_decode_batch(mixed)
    out = MM.png_decode_batch(mixed, on_error="capture")
    assert out[0] == singles[0] and out[2] == singles[1]
    assert isinstance(out[1], ValueError)
    # empty batch is a no-op
    assert MM.png_decode_batch([]) == []


def test_png_rejects_garbage():
    with pytest.raises(ValueError):
        MM.png_decode(b"not a png at all")
    # valid signature, truncated body
    with pytest.raises(ValueError):
        MM.png_decode(b"\x89PNG\r\n\x1a\n" + b"\x00" * 8)


# ---------------------------------------------------------------------------
# WAV codec
# ---------------------------------------------------------------------------

def test_wav_roundtrip_pinned():
    samples = [0, 1000, -1000, 32767, -32768, 5, -5, 0]
    payload = MM.wav_encode(samples, sample_rate=8000)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    channels, rate, bits, dur_ms, pcm = MM.wav_decode(payload)
    assert (channels, rate, bits) == (1, 8000, 16)
    assert dur_ms == pytest.approx(1.0)  # 8 frames @ 8 kHz = 1 ms
    assert list(struct.unpack("<8h", pcm)) == samples


def test_wav_rejects_non_pcm():
    payload = bytearray(MM.wav_encode([0, 0], sample_rate=8000))
    payload[20] = 2  # audio_format: PCM→ADPCM
    with pytest.raises(ValueError):
        MM.wav_decode(bytes(payload))


# ---------------------------------------------------------------------------
# Unified decode kernel over the binaryFile source
# ---------------------------------------------------------------------------

def test_wav_rejects_zero_rate_and_bad_bits():
    # corrupt fmt values must raise ValueError (quarantine-able), not
    # divide by zero downstream
    payload = bytearray(MM.wav_encode([0, 0], sample_rate=8000))
    z = bytes(payload[:24]) + b"\x00\x00\x00\x00" + bytes(payload[28:])  # rate=0
    with pytest.raises(ValueError):
        MM.wav_decode(z)
    b0 = bytearray(MM.wav_encode([0, 0], sample_rate=8000))
    b0[34] = 0  # bits_per_sample = 0
    with pytest.raises(ValueError):
        MM.wav_decode(bytes(b0))


def test_png_decompression_bomb_bounded():
    # IDAT inflating beyond what IHDR promises must be a ValueError, not
    # an unbounded allocation
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)  # 2x2 gray → 12 bytes raw

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    bomb = zlib.compress(b"\x00" * 10_000_000)  # inflates far past 12 bytes
    payload = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
               + chunk(b"IDAT", bomb) + chunk(b"IEND", b""))
    with pytest.raises(ValueError):
        MM.png_decode(payload)


def test_decode_features_unsupported_vs_corrupt(spark, tmp_path):
    # healthy WebP carrying a VP8 INTER frame named .png → stub (inter
    # frames need reference buffers — the video stub class), NOT error
    # (lossless VP8L decodes for real since round 5, lossy VP8 key
    # frames since round 8; a WEBP container with no image chunk at
    # all is corrupt → error)
    (tmp_path / "ok_webp.png").write_bytes(
        b"RIFF" + struct.pack("<I", 22) + b"WEBP"
        + b"VP8 " + struct.pack("<I", 10) + b"\x01" + b"\x00" * 9
    )
    (tmp_path / "empty_webp.png").write_bytes(
        b"RIFF" + struct.pack("<I", 24) + b"WEBP" + b"\x00" * 20
    )
    # truncated TIFF (real codec since round 5) → error, job survives
    (tmp_path / "trunc.tif").write_bytes(b"II*\x00" + b"\x00" * 32)
    # truncated JPEG (real codec now) → error, job survives
    (tmp_path / "trunc.jpg").write_bytes(b"\xff\xd8\xff\xe0" + b"\x00" * 32)
    # unrecognizable bytes under an image extension → error
    (tmp_path / "junk.png").write_bytes(b"\x00\x01\x02\x03" * 8)
    # TRUE PNG signature + garbage body: routes through the round-14
    # batched-wavefront pre-pass (capture → re-raise inside decode_one),
    # and must land on the same error row as the per-item path
    (tmp_path / "sig_junk.png").write_bytes(
        b"\x89PNG\r\n\x1a\n" + b"\x00\x01\x02\x03" * 8
    )
    # healthy all-Paeth PNG in the SAME batch: the pre-pass must decode
    # it for real while quarantining its corrupt neighbor
    (tmp_path / "ok_paeth.png").write_bytes(
        _png_with_filters(4, 2, 1, [(4, [7, 7, 7, 7]), (4, [1, 1, 1, 1])],
                          color_type=0)
    )
    # corrupt WAV fmt (rate=0) → error row, job survives
    wav = bytearray(MM.wav_encode([0, 0], sample_rate=8000))
    wav[24:28] = b"\x00\x00\x00\x00"
    (tmp_path / "bad.wav").write_bytes(bytes(wav))
    blobs = MM.read_binary_dir(spark, str(tmp_path))
    rows = {r["blob_id"]: r for r in MM.decode_features(blobs, feature_dim=4).collect()}
    assert rows["ok_webp.png"]["decode_status"] == "stub"
    assert rows["empty_webp.png"]["decode_status"] == "error"
    assert rows["trunc.tif"]["decode_status"] == "error"
    assert rows["trunc.jpg"]["decode_status"] == "error"
    assert rows["junk.png"]["decode_status"] == "error"
    assert rows["sig_junk.png"]["decode_status"] == "error"
    assert rows["ok_paeth.png"]["decode_status"] == "real"
    assert (rows["ok_paeth.png"]["width"], rows["ok_paeth.png"]["height"]) == (4, 2)
    assert rows["bad.wav"]["decode_status"] == "error"


def test_decode_features_real_stub_error(spark, tmp_path):
    # real PNG: constant gray 100 → mean=100/255, std=0
    (tmp_path / "a.png").write_bytes(MM.png_encode(bytes([100] * 9), 3, 3, color_type=0))
    # real WAV
    (tmp_path / "b.wav").write_bytes(MM.wav_encode([0, 16384, -16384, 0], sample_rate=4000))
    # fake mp4 → declared stub
    (tmp_path / "c.mp4").write_bytes(b"\x00" * 64)
    # corrupt "png" → error row, job must not fail
    (tmp_path / "d.png").write_bytes(b"\x89PNG\r\n\x1a\n" + b"junk")

    blobs = MM.read_binary_dir(spark, str(tmp_path))
    rows = {r["blob_id"]: r for r in MM.decode_features(blobs, feature_dim=4).collect()}
    assert len(rows) == 4

    png = rows["a.png"]
    assert png["decode_status"] == "real"
    assert (png["width"], png["height"], png["channels"]) == (3, 3, 1)
    assert png["features"][0] == pytest.approx(100 / 255, abs=1e-6)
    assert png["features"][1] == pytest.approx(0.0, abs=1e-6)

    wav = rows["b.wav"]
    assert wav["decode_status"] == "real"
    assert (wav["channels"], wav["sample_rate"]) == (1, 4000)
    assert wav["duration_ms"] == pytest.approx(1.0)  # 4 frames @ 4 kHz
    assert wav["features"][0] == pytest.approx(0.0, abs=1e-6)  # symmetric samples

    assert rows["c.mp4"]["decode_status"] == "stub"
    assert rows["d.png"]["decode_status"] == "error"
    assert rows["d.png"]["width"] is None


def test_png_zero_height_rejected_before_inflate():
    # height=0 would make the bomb bound max_length=0, which zlib treats
    # as UNLIMITED — must be rejected before any inflate happens
    ihdr = struct.pack(">IIBBBBB", 2, 0, 8, 0, 0, 0, 0)

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    bomb = zlib.compress(b"\x00" * 10_000_000)
    payload = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
               + chunk(b"IDAT", bomb) + chunk(b"IEND", b""))
    with pytest.raises(ValueError):
        MM.png_decode(payload)


def test_decode_kernels_raise_only_quarantinable_exceptions():
    """decode_features catches exactly (ValueError, zlib.error,
    struct.error, MemoryError); any OTHER exception type escaping the
    parsers would crash the executor task instead of producing an
    error row. Seeded mutation fuzz over valid files pins the contract."""
    import random

    rng = random.Random(1)
    png = MM.png_encode(bytes(range(48)) * 4, 8, 8, color_type=2)
    wav = MM.wav_encode([rng.randrange(-32768, 32767) for _ in range(64)], 8000)
    caught = (ValueError, zlib.error, struct.error, MemoryError)
    for trial in range(1000):
        b = bytearray(png if trial % 2 == 0 else wav)
        for _ in range(rng.randrange(1, 6)):
            op = rng.random()
            if op < 0.4 and len(b) > 1:
                b[rng.randrange(len(b))] = rng.randrange(256)
            elif op < 0.75 and len(b) > 10:
                start = rng.randrange(len(b) - 8)
                del b[start:start + rng.randrange(1, 8)]
            else:
                pos = rng.randrange(len(b))
                b[pos:pos] = bytes(
                    rng.randrange(256) for _ in range(rng.randrange(1, 16))
                )
        if trial % 5 == 0:  # hard truncation — the riskiest input class
            b = b[: rng.randrange(1, len(b))]
        fn = MM.png_decode if trial % 2 == 0 else MM.wav_decode
        try:
            fn(bytes(b))
        except caught:
            pass  # quarantinable — becomes an error row


def test_bmp_roundtrip_pinned():
    """encode→decode returns the exact RGB buffer for both row orders
    the spec allows (bottom-up storage, top-down logical output)."""
    # 2x2: red, green / blue, white — with width 2 the stride needs
    # 2 bytes of padding per row, exercising the pad math
    pix = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255])
    payload = MM.bmp_encode(pix, 2, 2)
    w, h, c, out = MM.bmp_decode(payload)
    assert (w, h, c) == (2, 2, 3)
    assert out == pix


def test_bmp_rejects_unsupported():
    with pytest.raises(ValueError):
        MM.bmp_decode(b"BM" + b"\x00" * 60)  # zero dims
    with pytest.raises(ValueError):
        MM.bmp_decode(b"PNG nope")
    # 8-bit palette BMPs are honestly unsupported, not misparsed
    hdr = b"BM" + struct.pack("<IHHI", 100, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 8, 0, 16, 0, 0, 0, 0)
    with pytest.raises(ValueError, match="bpp"):
        MM.bmp_decode(hdr + info + b"\x00" * 46)


def test_decode_features_bmp_is_real(spark, tmp_path):
    pix = bytes([10, 20, 30] * 4)
    (tmp_path / "img.bmp").write_bytes(MM.bmp_encode(pix, 2, 2))
    blobs = MM.read_binary_dir(spark, str(tmp_path))
    row = MM.decode_features(blobs).collect()[0]
    assert row["decode_status"] == "real"
    assert (row["width"], row["height"], row["channels"]) == (2, 2, 3)
    # channel means are exact: all pixels identical
    assert abs(row["features"][0] - 10 / 255.0) < 1e-6


def test_resize_nearest_known_values():
    # 2x2 grayscale → 4x4: each source pixel becomes a 2x2 block
    pix = bytes([0, 100, 200, 255])
    out = MM.resize_nearest(pix, 2, 2, 1, 4, 4)
    assert list(out) == [
        0, 0, 100, 100,
        0, 0, 100, 100,
        200, 200, 255, 255,
        200, 200, 255, 255,
    ]


def test_resize_images_pipeline_real_and_error(spark, tmp_path):
    """PNG and BMP inputs resize for real (decode→resample→re-encode PNG
    round-trips); garbage becomes an error row, not a dead job."""
    pix_png = bytes(range(48))  # 4x4 RGB
    (tmp_path / "a.png").write_bytes(MM.png_encode(pix_png, 4, 4, color_type=2))
    (tmp_path / "b.bmp").write_bytes(MM.bmp_encode(bytes([7, 8, 9] * 16), 4, 4))
    (tmp_path / "c.png").write_bytes(b"\x89PNG garbage")
    blobs = MM.read_binary_dir(spark, str(tmp_path))
    out = {r["blob_id"]: r for r in MM.resize_images(blobs, 2, 2).collect()}
    assert out["c.png"]["decode_status"] == "error"
    for name in ("a.png", "b.bmp"):
        r = out[name]
        assert r["decode_status"] == "real" and (r["width"], r["height"]) == (2, 2)
        w, h, c, small = MM.png_decode(bytes(r["content"]))
        assert (w, h) == (2, 2)
    # nearest-neighbor on the uniform BMP keeps the uniform color
    _, _, _, small_b = MM.png_decode(bytes(out["b.bmp"]["content"]))
    assert set(small_b[i : i + 3] for i in range(0, len(small_b), 3)) == {bytes([7, 8, 9])}


def test_audio_frame_features_hand_computed(spark, tmp_path):
    """1 s of PCM16 at 8 kHz framed at 250 ms: 4 windows; constant
    half-scale amplitude ⇒ rms == peak == 0.5 in every window."""
    amp = 16384  # 0.5 in [-1, 1]
    samples = [amp] * 8000
    (tmp_path / "t.wav").write_bytes(MM.wav_encode(samples, sample_rate=8000))
    blobs = MM.read_binary_dir(spark, str(tmp_path))
    rows = sorted(
        MM.audio_frame_features(blobs, window_ms=250).collect(),
        key=lambda r: r["frame_idx"],
    )
    assert len(rows) == 4
    for i, r in enumerate(rows):
        assert r["frame_idx"] == i
        assert abs(r["frame_ts_ms"] - i * 250.0) < 1e-9
        assert abs(r["rms"] - 0.5) < 1e-4
        assert abs(r["peak"] - 0.5) < 1e-4


def test_audio_frame_features_partial_window_and_corrupt(spark, tmp_path):
    (tmp_path / "t.wav").write_bytes(MM.wav_encode([0] * 2500, sample_rate=8000))
    (tmp_path / "bad.wav").write_bytes(b"RIFFjunk")
    blobs = MM.read_binary_dir(spark, str(tmp_path))
    rows = MM.audio_frame_features(blobs, window_ms=250).collect()
    # 2500 samples @ 2000/window → 2 windows (trailing 500-sample partial)
    assert sorted(r["frame_idx"] for r in rows) == [0, 1]
    assert all(r["blob_id"] == "t.wav" for r in rows)  # corrupt: zero frames


def _pack_lzw(codes, code_sizes):
    """LSB-first bit packing for hand-built LZW streams."""
    bits = []
    for code, size in zip(codes, code_sizes):
        bits += [(code >> i) & 1 for i in range(size)]
    out = bytearray()
    for i in range(0, len(bits), 8):
        byte = 0
        for j, b in enumerate(bits[i : i + 8]):
            byte |= b << j
        out.append(byte)
    return bytes(out)


def test_gif_roundtrip_pinned():
    pal = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (10, 20, 30)]
    idx = bytes([0, 1, 2, 3, 3, 2, 1, 0] * 2)
    payload = MM.gif_encode(idx, 4, 4, pal)
    w, h, c, rgb = MM.gif_decode(payload)
    assert (w, h, c) == (4, 4, 3)
    assert rgb == b"".join(bytes(pal[i]) for i in idx)


def test_gif_lzw_dictionary_growth_and_kwkwk():
    """The decoder must handle streams our clear-early encoder never
    produces: dictionary entries being referenced, and the KwKwK case
    (code == next table slot)."""
    clear, end = 4, 5
    # [clear, 0, 1, 6, end]: code 6 references the entry (0,1) built two
    # steps earlier → output 0 1 0 1
    data = _pack_lzw([clear, 0, 1, 6, end], [3, 3, 3, 3, 3])
    assert MM._lzw_decode(data, 2, 16) == bytes([0, 1, 0, 1])
    # [clear, 1, 6, end]: 6 == len(table) → KwKwK → output 1 1 1
    data = _pack_lzw([clear, 1, 6, end], [3, 3, 3, 3])
    assert MM._lzw_decode(data, 2, 16) == bytes([1, 1, 1])


def test_gif_rejects_bad_inputs():
    with pytest.raises(ValueError):
        MM.gif_decode(b"GIF89a")  # truncated
    with pytest.raises(ValueError):
        MM.gif_decode(b"JPEG nope")
    # out-of-palette pixel index must not crash into the palette bytes
    pal = [(1, 2, 3)]
    good = MM.gif_encode(bytes([0, 0, 0, 0]), 2, 2, pal)
    # bump the min-code byte's first literal via a crafted stream: easier
    # to assert the bounded-decode contract directly
    assert MM._lzw_decode(
        _pack_lzw([4, 0, 0, 0, 0, 0, 0, 5], [3] * 8), 2, 3
    ) == bytes([0, 0, 0])  # max_pixels bound enforced
    assert MM.gif_decode(good)[3] == bytes([1, 2, 3]) * 4


def test_decode_features_and_resize_gif_real(spark, tmp_path):
    pal = [(9, 9, 9), (200, 100, 50)]
    (tmp_path / "g.gif").write_bytes(
        MM.gif_encode(bytes([0, 1, 1, 0] * 4), 4, 4, pal)
    )
    blobs = MM.read_binary_dir(spark, str(tmp_path))
    feat = MM.decode_features(blobs).collect()[0]
    assert feat["decode_status"] == "real"
    assert (feat["width"], feat["height"], feat["channels"]) == (4, 4, 3)
    resized = MM.resize_images(blobs, 2, 2).collect()[0]
    assert resized["decode_status"] == "real"
    w, h, c, rgb = MM.png_decode(bytes(resized["content"]))
    assert (w, h, c) == (2, 2, 3)


def test_tiff_roundtrip_exact():
    """Uncompressed baseline TIFF is lossless — encode→decode must be
    byte-identical for RGB and grayscale."""
    import numpy as np

    rng = np.random.default_rng(11)
    rgb = rng.integers(0, 255, (9, 7, 3)).astype(np.uint8)
    w, h, c, out = MM.tiff_decode(MM.tiff_encode(rgb.tobytes(), 7, 9, 3))
    assert (w, h, c) == (7, 9, 3) and out == rgb.tobytes()
    gray = rng.integers(0, 255, (5, 6, 1)).astype(np.uint8)
    w, h, c, out = MM.tiff_decode(MM.tiff_encode(gray.tobytes(), 6, 5, 1))
    assert (w, h, c) == (6, 5, 1) and out == gray.tobytes()


def test_tiff_big_endian_and_packbits():
    """A hand-built MM (big-endian), PackBits-compressed, WhiteIsZero
    file decodes to the inverted run — every non-default code path in
    one fixture."""
    width, height = 4, 2
    # pixel rows (WhiteIsZero): 0xFF run then literals
    raw = bytes([0xFF] * 4 + [0x00, 0x10, 0x20, 0x30])
    # PackBits: replicate 0xFF ×4 (code 257-4=253), literal 4 bytes (code 3)
    packed = bytes([253, 0xFF, 3, 0x00, 0x10, 0x20, 0x30])

    def entry(tag, typ, cnt, val4):
        return struct.pack(">HHI", tag, typ, cnt) + val4

    def short(v):
        return struct.pack(">HH", v, 0)

    def long_(v):
        return struct.pack(">I", v)

    pix_off = 8
    ifd_off = pix_off + len(packed)
    entries = [
        entry(256, 4, 1, long_(width)),
        entry(257, 4, 1, long_(height)),
        entry(258, 3, 1, short(8)),
        entry(259, 3, 1, short(32773)),  # PackBits
        entry(262, 3, 1, short(0)),      # WhiteIsZero
        entry(273, 4, 1, long_(pix_off)),
        entry(277, 3, 1, short(1)),
        entry(278, 4, 1, long_(height)),
        entry(279, 4, 1, long_(len(packed))),
    ]
    ifd = struct.pack(">H", len(entries)) + b"".join(entries) + struct.pack(">I", 0)
    payload = b"MM\x00*" + struct.pack(">I", ifd_off) + packed + ifd
    w, h, c, out = MM.tiff_decode(payload)
    assert (w, h, c) == (4, 2, 1)
    assert out == bytes(255 - b for b in raw)  # WhiteIsZero inverted


def test_tiff_rejects_unsupported():
    import numpy as np

    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (4, 4, 3)).astype(np.uint8)
    good = MM.tiff_encode(img.tobytes(), 4, 4, 3)
    with pytest.raises(ValueError, match="not a TIFF"):
        MM.tiff_decode(b"not a tiff at all")
    # LZW compression (5) must be rejected, not misparsed: patch the
    # Compression entry's inline SHORT value (tag 259 at entry index 3)
    ifd_off = struct.unpack("<I", good[4:8])[0]
    e_off = ifd_off + 2 + 12 * 3
    assert struct.unpack("<H", good[e_off : e_off + 2])[0] == 259
    bad = bytearray(good)
    bad[e_off + 8 : e_off + 10] = struct.pack("<H", 5)
    with pytest.raises(ValueError, match="compression"):
        MM.tiff_decode(bytes(bad))
    # truncated strip
    with pytest.raises(ValueError):
        MM.tiff_decode(good[:20])


def test_decode_features_tiff_real(spark, tmp_path):
    import numpy as np

    img = np.full((8, 8, 3), [40, 200, 120], dtype=np.uint8)
    (tmp_path / "t.tiff").write_bytes(MM.tiff_encode(img.tobytes(), 8, 8, 3))
    blobs = MM.read_binary_dir(spark, str(tmp_path))
    feat = MM.decode_features(blobs).collect()[0]
    assert feat["decode_status"] == "real"
    assert (feat["width"], feat["height"], feat["channels"]) == (8, 8, 3)
    assert abs(feat["features"][0] - 40 / 255.0) < 1e-6  # exact mean R
    resized = MM.resize_images(blobs, 4, 4).collect()[0]
    assert resized["decode_status"] == "real"
    w, h, c, pix = MM.png_decode(bytes(resized["content"]))
    assert (w, h, c) == (4, 4, 3)
    assert pix == bytes([40, 200, 120] * 16)  # flat image survives resize


def test_jpeg_roundtrip_bounded_error():
    """Lossy codec: round-trip error must stay within the quantization
    budget — near-exact for flat color, single digits for gradients."""
    import numpy as np

    from aeuc_vector_db_spark.sources.jpeg import jpeg_decode, jpeg_encode

    flat = np.full((8, 8, 3), [120, 64, 200], dtype=np.uint8)
    w, h, c, out = jpeg_decode(jpeg_encode(flat.tobytes(), 8, 8, 3))
    assert (w, h, c) == (8, 8, 3)
    assert np.abs(
        np.frombuffer(out, np.uint8).reshape(8, 8, 3).astype(int) - flat.astype(int)
    ).max() <= 2

    xx, yy = np.meshgrid(np.arange(16), np.arange(16))
    grad = np.stack(
        [(xx * 17).astype(np.uint8), (yy * 17).astype(np.uint8),
         ((xx + yy) * 8).astype(np.uint8)], axis=-1)
    w, h, c, out = jpeg_decode(jpeg_encode(grad.tobytes(), 16, 16, 3))
    err = np.abs(
        np.frombuffer(out, np.uint8).reshape(16, 16, 3).astype(int) - grad.astype(int)
    )
    assert err.max() <= 12  # Q50 quantization budget on a smooth ramp

    gray = (xx * 16 + yy).astype(np.uint8)
    w, h, c, out = jpeg_decode(jpeg_encode(gray.tobytes(), 16, 16, 1))
    assert (w, h, c) == (16, 16, 1)
    assert np.abs(
        np.frombuffer(out, np.uint8).reshape(16, 16).astype(int) - gray.astype(int)
    ).max() <= 6


def test_jpeg_odd_dimensions_edge_padding():
    import numpy as np

    from aeuc_vector_db_spark.sources.jpeg import jpeg_decode, jpeg_encode

    rng = np.random.default_rng(7)
    img = rng.integers(0, 255, (13, 11, 3)).astype(np.uint8)
    w, h, c, out = jpeg_decode(jpeg_encode(img.tobytes(), 11, 13, 3))
    assert (w, h, c) == (11, 13, 3) and len(out) == 11 * 13 * 3


def test_jpeg_rejects_unsupported():
    from aeuc_vector_db_spark.sources.jpeg import jpeg_decode

    with pytest.raises(ValueError):
        jpeg_decode(b"not a jpeg")
    # progressive marker (SOF2) must be rejected, not misparsed
    prog = b"\xff\xd8" + b"\xff\xc2" + struct.pack(">H", 8) + b"\x08\x00\x08\x00\x08\x01"
    with pytest.raises(ValueError, match="progressive"):
        jpeg_decode(prog)


def test_jpeg_multi_scan_rejected_not_silently_wrong():
    """A 3-component SOF whose first SOS covers only 1 component is a
    legal non-interleaved baseline file; decoding just that scan would
    yield zero chroma reported as 'real' pixels. Must raise instead."""
    import numpy as np

    from aeuc_vector_db_spark.sources.jpeg import jpeg_decode, jpeg_encode

    img = np.full((8, 8, 3), [10, 200, 60], dtype=np.uint8)
    good = jpeg_encode(img.tobytes(), 8, 8, 3)
    sos_at = good.find(b"\xff\xda")
    assert sos_at > 0
    # rewrite the SOS header: 1 component (Y only) instead of 3
    one_comp_sos = b"\xff\xda" + struct.pack(">H", 8) + bytes([1, 1, 0x00, 0, 63, 0])
    seglen = struct.unpack(">H", good[sos_at + 2 : sos_at + 4])[0]
    tampered = good[:sos_at] + one_comp_sos + good[sos_at + 2 + seglen :]
    with pytest.raises(ValueError, match="multi-scan"):
        jpeg_decode(tampered)


def test_jpeg_fill_bytes_before_marker():
    """T.81 B.1.1.2 allows any number of 0xFF fill bytes before a marker;
    they must not be misparsed as the marker byte itself."""
    import numpy as np

    from aeuc_vector_db_spark.sources.jpeg import jpeg_decode, jpeg_encode

    img = np.full((8, 8, 3), [120, 50, 220], dtype=np.uint8)
    good = jpeg_encode(img.tobytes(), 8, 8, 3)
    sof_at = good.find(b"\xff\xc0")
    assert sof_at > 0
    padded = good[:sof_at] + b"\xff\xff\xff" + good[sof_at:]
    w, h, c, out = jpeg_decode(padded)
    assert (w, h, c) == (8, 8, 3)
    assert out == jpeg_decode(good)[3]


def test_decode_features_and_resize_jpeg_real(spark, tmp_path):
    import numpy as np

    from aeuc_vector_db_spark.sources.jpeg import jpeg_encode

    img = np.full((8, 8, 3), [200, 30, 90], dtype=np.uint8)
    (tmp_path / "p.jpg").write_bytes(jpeg_encode(img.tobytes(), 8, 8, 3))
    blobs = MM.read_binary_dir(spark, str(tmp_path))
    feat = MM.decode_features(blobs).collect()[0]
    assert feat["decode_status"] == "real"
    assert (feat["width"], feat["height"], feat["channels"]) == (8, 8, 3)
    assert abs(feat["features"][0] - 200 / 255.0) < 0.02  # mean R ≈ flat value
    resized = MM.resize_images(blobs, 4, 4).collect()[0]
    assert resized["decode_status"] == "real"
    w, h, c, rgb = MM.png_decode(bytes(resized["content"]))
    assert (w, h, c) == (4, 4, 3)


def test_mp4_probe_roundtrip_and_versions():
    p = MM.mp4_minimal(640, 360, 4750)
    assert MM.mp4_probe(p) == (640, 360, 4750.0)
    with pytest.raises(ValueError):
        MM.mp4_probe(b"\x00\x00\x00\x08mdat")  # no ftyp
    with pytest.raises(ValueError):
        MM.mp4_probe(MM.mp4_minimal(64, 64, 100)[:40] + b"\xff\xff\xff\xff" * 4)


def test_decode_features_mp4_meta_status(spark, tmp_path):
    (tmp_path / "v.mp4").write_bytes(MM.mp4_minimal(320, 240, 2000))
    (tmp_path / "junk.mp4").write_bytes(b"\x00" * 40)  # no ftyp → stub
    blobs = MM.read_binary_dir(spark, str(tmp_path))
    rows = {r["blob_id"]: r for r in MM.decode_features(blobs).collect()}
    v = rows["v.mp4"]
    assert v["decode_status"] == "meta"
    assert (v["width"], v["height"]) == (320, 240)
    assert abs(v["duration_ms"] - 2000.0) < 1e-9
    assert rows["junk.mp4"]["decode_status"] == "stub"


def test_avi_mjpeg_roundtrip_probe():
    import numpy as np

    from aeuc_vector_db_spark.sources.jpeg import jpeg_decode, jpeg_encode

    frames = [
        jpeg_encode(bytes([v, 255 - v, 60]) * (16 * 16), 16, 16, 3)
        for v in (30, 128, 220)
    ]
    avi = MM.avi_mjpeg_encode(frames, 16, 16, fps=5)
    w, h, uspf, handler, out = MM.avi_probe(avi)
    assert (w, h, uspf, handler) == (16, 16, 200000.0, "MJPG")
    assert [bytes(f) for f in out] == frames  # stored chunks byte-identical
    # frames decode to the encoded colors (lossy, so wide-ish tolerance)
    for f, v in zip(out, (30, 128, 220)):
        fw, fh, fc, pix = jpeg_decode(f)
        arr = np.frombuffer(pix, np.uint8).reshape(-1, 3)
        assert (fw, fh, fc) == (16, 16, 3)
        assert abs(arr[:, 0].mean() - v) < 10


def test_avi_probe_rejects_bad_inputs():
    with pytest.raises(ValueError):
        MM.avi_probe(b"RIFF\x04\x00\x00\x00WAVE")  # RIFF but not AVI
    avi = MM.avi_mjpeg_encode([b"\xff\xd8\xff\xe0data"], 8, 8, fps=1)
    with pytest.raises(ValueError):
        MM.avi_probe(avi[:40])  # truncated chunk walk
    with pytest.raises(ValueError):
        MM.avi_mjpeg_encode([], 8, 8, fps=1)  # no frames


def test_decode_features_avi_mjpeg_real(spark, tmp_path):
    from aeuc_vector_db_spark.sources.jpeg import jpeg_encode

    frames = [
        jpeg_encode(bytes([200, 30, 90]) * (8 * 8), 8, 8, 3) for _ in range(4)
    ]
    (tmp_path / "clip.avi").write_bytes(MM.avi_mjpeg_encode(frames, 8, 8, fps=2))
    # non-MJPG AVI: healthy container, unsupported codec → 'meta'
    other = MM.avi_mjpeg_encode(frames, 8, 8, fps=2).replace(b"MJPG", b"XVID")
    (tmp_path / "other.avi").write_bytes(other)
    blobs = MM.read_binary_dir(spark, str(tmp_path))
    rows = {r["blob_id"]: r for r in MM.decode_features(blobs).collect()}
    clip = rows["clip.avi"]
    assert clip["decode_status"] == "real"
    assert (clip["width"], clip["height"], clip["channels"]) == (8, 8, 3)
    assert abs(clip["duration_ms"] - 4 * 500.0) < 1e-9
    assert abs(clip["features"][0] - 200 / 255.0) < 0.05  # true mean R
    assert rows["other.avi"]["decode_status"] == "meta"
    assert rows["other.avi"]["width"] == 8


def test_sample_frames_real_mjpeg_and_stub_fallback(spark):
    from aeuc_vector_db_spark.sources.jpeg import jpeg_encode

    frames = [
        jpeg_encode(bytes([v] * 3) * (8 * 8), 8, 8, 3)
        for v in (10, 60, 110, 160, 210)
    ]
    avi = MM.avi_mjpeg_encode(frames, 8, 8, fps=10)  # frame every 100 ms
    df = spark.createDataFrame(
        [("clip", "video", bytearray(avi), None),
         ("junk", "video", bytearray(b"not-a-container"), None)],
        MM.MULTIMODAL_SCHEMA,
    )
    out = MM.sample_frames(df, every_ms=200, max_frames=4).collect()
    clip = sorted((r for r in out if r["blob_id"] == "clip"),
                  key=lambda r: r["frame_idx"])
    # 5 frames at 100 ms spacing sampled every 200 ms → frames 0, 2, 4
    assert [r["frame_ts_ms"] for r in clip] == [0, 200, 400]
    assert [bytes(r["frame_bytes"]) for r in clip] == [frames[0], frames[2], frames[4]]
    junk = [r for r in out if r["blob_id"] == "junk"]
    assert len(junk) == 4  # stub fallback keeps the expansion shape
    assert all(len(bytes(r["frame_bytes"])) == 32 for r in junk)  # sha256 fakes


def test_decode_features_webp_lossless_and_lossy_real_inter_stub(spark, tmp_path):
    import struct

    from aeuc_vector_db_spark.sources.webp import webp_encode, webp_encode_lossy

    pix = bytes([120, 40, 220]) * (6 * 4)
    (tmp_path / "l.webp").write_bytes(webp_encode(pix, 6, 4, 3))
    # flat-color lossy key frame at the finest quantizer: per-channel
    # mean survives the codec to ~1/255 accuracy
    (tmp_path / "y.webp").write_bytes(
        webp_encode_lossy(bytes([120, 40, 220]) * (16 * 16), 16, 16, q_index=0)
    )
    inter = (
        b"RIFF" + struct.pack("<I", 22) + b"WEBP"
        + b"VP8 " + struct.pack("<I", 10) + b"\x01" + b"\x00" * 9
    )
    (tmp_path / "i.webp").write_bytes(inter)
    (tmp_path / "bad.webp").write_bytes(
        b"RIFF" + struct.pack("<I", 8) + b"WEBP\xff\xff\xff\xff"
    )
    blobs = MM.read_binary_dir(spark, str(tmp_path))
    rows = {r["blob_id"]: r for r in MM.decode_features(blobs).collect()}
    lossless = rows["l.webp"]
    assert lossless["decode_status"] == "real"
    assert (lossless["width"], lossless["height"], lossless["channels"]) == (6, 4, 4)
    assert abs(lossless["features"][0] - 120 / 255.0) < 1e-6  # exact mean R
    assert abs(lossless["features"][6] - 1.0) < 1e-6          # opaque alpha mean
    lossy = rows["y.webp"]
    assert lossy["decode_status"] == "real"                  # round 8
    assert (lossy["width"], lossy["height"], lossy["channels"]) == (16, 16, 3)
    assert abs(lossy["features"][0] - 120 / 255.0) < 3 / 255.0
    assert abs(lossy["features"][2] - 40 / 255.0) < 3 / 255.0
    assert abs(lossy["features"][4] - 220 / 255.0) < 3 / 255.0
    assert rows["i.webp"]["decode_status"] == "stub"   # inter frame: video class
    assert rows["bad.webp"]["decode_status"] == "error"  # corrupt container


def test_decode_features_external_lossy_webp_is_stub_not_real(spark, tmp_path):
    """Round 9 (ADVICE r8 high): an UNMARKED lossy WebP — the byte shape
    every external encoder produces — must land as decode_status='stub'
    through the full Spark kernel, never as 'real' with silently wrong
    pixels (the placeholder probability tables desync without raising)."""
    from tests.test_webp import _strip_marker
    from aeuc_vector_db_spark.sources.webp import webp_encode_lossy

    marked = webp_encode_lossy(bytes([120, 40, 220]) * (16 * 16), 16, 16,
                               q_index=0)
    (tmp_path / "engine.webp").write_bytes(marked)
    (tmp_path / "external.webp").write_bytes(_strip_marker(marked))
    blobs = MM.read_binary_dir(spark, str(tmp_path))
    rows = {r["blob_id"]: r for r in MM.decode_features(blobs).collect()}
    assert rows["engine.webp"]["decode_status"] == "real"
    assert rows["external.webp"]["decode_status"] == "stub"


def test_native_codec_swap_seam():
    """The decode dispatch boundary (sources/multimodal.py
    decode_image): a registered decoder replaces the pure-Python one
    for exactly its format tag, everything else is untouched, and an
    unknown tag is rejected loudly. This is the one-function swap a
    native-codec deployment performs at executor startup."""
    import pytest

    from aeuc_vector_db_spark.sources import multimodal as MM2

    png = MM2.png_encode(b"\x01\x02\x03" * 4, 2, 2)
    bmp = MM2.bmp_encode(b"\x09\x08\x07" * 4, 2, 2)
    assert MM2.sniff_image_format(png) == "png"
    assert MM2.sniff_image_format(bmp) == "bmp"
    assert MM2.sniff_image_format(b"garbage") is None
    baseline = MM2.decode_image(png)
    calls = []

    def fake_png(payload):
        calls.append(len(payload))
        return 1, 1, 3, b"\x2a\x2b\x2c"

    try:
        MM2.register_image_decoder("png", fake_png)
        assert MM2.decode_image(png) == (1, 1, 3, b"\x2a\x2b\x2c")
        assert calls == [len(png)]
        # other formats still route to their builtin decoders
        assert MM2.decode_image(bmp) == (2, 2, 3, b"\x09\x08\x07" * 4)
    finally:
        MM2.register_image_decoder("png", MM2.png_decode)
    assert MM2.decode_image(png) == baseline
    with pytest.raises(ValueError, match="unknown image format tag"):
        MM2.register_image_decoder("jxl", fake_png)
    with pytest.raises(ValueError, match="unsupported image container"):
        MM2.decode_image(b"not an image")


# --- native-codec swap seam (register_image_decoder) -----------------------
# The "native" decoders below are synthetic stand-ins (pure NumPy/bytes)
# proving the DISPATCH contract: a deployment with libjpeg-turbo/Pillow
# registers its codec the same way and every kernel/schema/quarantine
# behavior is unchanged.


# NB: the fakes are defined INSIDE each test — Spark workers can't
# import the tests module by name, but nested functions ride the UDF
# closure (cloudpickle serializes them by value), which is also how a
# user would pass a wrapper around their native handle.


def _fake_native_png(payload: bytes):
    """Synthetic 'native' PNG decoder: ignores content, returns a fixed
    2x1 RGB image — pixel values distinguishable from any real decode."""
    return 2, 1, 3, bytes([10, 20, 30, 40, 50, 60])


def test_decoder_swap_dispatch_and_fallback():
    """Driver-side contract: register → decode_image dispatches to the
    swap; unregister → the pure-Python builtin returns (same bytes in,
    same pixels out as before the swap)."""
    png = MM.png_encode(bytes([100] * 9), 3, 3, color_type=0)
    baseline = MM.decode_image(png)
    assert baseline[:3] == (3, 3, 1)
    try:
        MM.register_image_decoder("png", _fake_native_png)
        assert MM.decode_image(png) == (2, 1, 3, bytes([10, 20, 30, 40, 50, 60]))
    finally:
        MM.unregister_image_decoder("png")
    assert MM.decode_image(png) == baseline
    with pytest.raises(ValueError, match="unknown image format"):
        MM.register_image_decoder("svg", _fake_native_png)


def test_decoder_overrides_through_dataframe_api(spark, tmp_path):
    """The seam exercised THROUGH decode_features: overrides dispatch in
    the Python workers, quarantine semantics are preserved (ValueError →
    'error' row, NotImplementedError → 'stub' row), and the builtin
    path is restored afterwards even with worker reuse."""
    (tmp_path / "a.png").write_bytes(MM.png_encode(bytes([100] * 9), 3, 3, color_type=0))
    (tmp_path / "b.png").write_bytes(MM.png_encode(bytes([200] * 4), 2, 2, color_type=0))
    blobs = MM.read_binary_dir(spark, str(tmp_path))

    def fake_native_png(payload: bytes):
        return 2, 1, 3, bytes([10, 20, 30, 40, 50, 60])

    def raising_value_error(payload: bytes):
        raise ValueError("native codec says corrupt")

    def raising_not_impl(payload: bytes):
        raise NotImplementedError("native codec declares stub")

    # dispatch: the fake's fixed 2x1 RGB pixels, not the real 3x3 gray
    rows = {
        r["blob_id"]: r
        for r in MM.decode_features(
            blobs, feature_dim=4, decoder_overrides={"png": fake_native_png}
        ).collect()
    }
    for r in rows.values():
        assert r["decode_status"] == "real"
        assert (r["width"], r["height"], r["channels"]) == (2, 1, 3)
        assert r["features"][0] == pytest.approx(25 / 255, abs=1e-6)  # mean(10,40)

    # quarantine parity: a native codec that raises ValueError lands in
    # the SAME error-row path as a corrupt payload…
    rows = {
        r["blob_id"]: r
        for r in MM.decode_features(
            blobs, feature_dim=4, decoder_overrides={"png": raising_value_error}
        ).collect()
    }
    assert all(r["decode_status"] == "error" for r in rows.values())
    # …and NotImplementedError lands in the declared-stub path
    rows = {
        r["blob_id"]: r
        for r in MM.decode_features(
            blobs, feature_dim=4, decoder_overrides={"png": raising_not_impl}
        ).collect()
    }
    assert all(r["decode_status"] == "stub" for r in rows.values())

    # restore: the SAME session (reused workers) decodes for real again
    rows = {
        r["blob_id"]: r for r in MM.decode_features(blobs, feature_dim=4).collect()
    }
    assert rows["a.png"]["decode_status"] == "real"
    assert (rows["a.png"]["width"], rows["a.png"]["channels"]) == (3, 1)
    assert rows["a.png"]["features"][0] == pytest.approx(100 / 255, abs=1e-6)

    with pytest.raises(ValueError, match="unknown image format"):
        MM.decode_features(blobs, decoder_overrides={"svg": _fake_native_png})


def test_decoder_override_accelerates_mjpeg_video(spark, tmp_path):
    """The seam covers MJPEG-AVI frame decode too (frames route through
    decode_image): a registered JPEG override changes the video's pixel
    stats, proving a native JPEG codec would accelerate video decode."""
    from aeuc_vector_db_spark.sources.jpeg import jpeg_encode

    frames = [jpeg_encode(bytes([128] * (8 * 8 * 3)), 8, 8, 3)] * 3
    (tmp_path / "clip.avi").write_bytes(MM.avi_mjpeg_encode(frames, 8, 8, fps=4))
    blobs = MM.read_binary_dir(spark, str(tmp_path))

    def _fake_native_jpeg(payload: bytes):
        return 8, 8, 3, bytes([10, 20, 30] * 64)

    base = MM.decode_features(blobs, feature_dim=4).collect()[0]
    assert base["decode_status"] == "real"
    got = MM.decode_features(
        blobs, feature_dim=4, decoder_overrides={"jpeg": _fake_native_jpeg}
    ).collect()[0]
    assert got["decode_status"] == "real"
    assert got["features"][0] == pytest.approx(10 / 255, abs=1e-6)
    assert got["features"][0] != pytest.approx(base["features"][0], abs=1e-4)


def test_native_codec_query_paths_identical(spark):
    """The declared swap-seam query: builtin and native halves must be
    bit-identical (the delegating wrappers prove dispatch without
    changing pixels)."""
    from aeuc_vector_db_spark.queries.multimodal_q import (
        _multimodal_native_codec_stats,
    )

    rows = _multimodal_native_codec_stats(spark, "/root/testdata/sf0.001").collect()
    assert rows
    b = {(r["modality"], r["decode_status"]): (r["n_blobs"], r["avg_width"], r["avg_f0"])
         for r in rows if r["path"] == "builtin"}
    n = {(r["modality"], r["decode_status"]): (r["n_blobs"], r["avg_width"], r["avg_f0"])
         for r in rows if r["path"] == "native"}
    assert b and b == n
    assert ("image", "real") in b


def test_codec_canary_healthy_and_fires_on_corruption(spark):
    """multimodal_codec_canary (round 11): healthy output is EXACTLY
    one ('checks_ran', 2) row — which, by the query's own construction,
    proves the deliberately mis-registered PNG decoder produced diff
    rows (otherwise a 'canary_diff_missing' row would appear) and the
    healthy native wrappers produced none. Also pins that the canary
    decoder really corrupts pixels while preserving dims."""
    from aeuc_vector_db_spark.queries.multimodal_q import (
        _canary_bad_png,
        _multimodal_codec_canary,
    )
    from aeuc_vector_db_spark.sources.multimodal import png_decode, png_encode

    rows = _multimodal_codec_canary(spark, "/root/testdata/sf0.001").collect()
    assert [(r["check"], r["v"]) for r in rows] == [("checks_ran", 2)]

    pix = bytes(range(48))  # 4x4 RGB
    blob = png_encode(pix, 4, 4)
    w, h, c, raw = png_decode(blob)
    bw, bh, bc, braw = _canary_bad_png(blob)
    assert (w, h, c) == (bw, bh, bc)
    assert braw != raw and len(braw) == len(raw)
    assert braw[0] == (raw[0] + 101) % 256


# --- QOI (round 12) ----------------------------------------------------------


def _hash_pixels(seed: bytes, n: int) -> bytes:
    import hashlib

    buf = bytearray()
    cur = hashlib.sha256(seed).digest()
    while len(buf) < n:
        buf += cur
        cur = hashlib.sha256(cur).digest()
    return bytes(buf[:n])


def test_qoi_roundtrip_hash_stream():
    """Encode→decode lossless over hash-stream pixels (exercises
    RGB/DIFF/LUMA/INDEX ops) and over run-heavy pixels (RUN/INDEX);
    runs must actually compress."""
    px = _hash_pixels(b"qoi-test", 16 * 16 * 3)
    enc = MM.qoi_encode(px, 16, 16)
    assert MM.qoi_decode(enc) == (16, 16, 3, px)
    px2 = bytes([10, 20, 30] * 160 + [200, 0, 0] * 40)
    enc2 = MM.qoi_encode(px2, 20, 10)
    assert MM.qoi_decode(enc2)[3] == px2
    assert len(enc2) < len(px2) // 3


def test_qoi_handcrafted_vector_and_rgba_ops():
    """Byte-level spec pin: RGB op + RUN op decode to known pixels; an
    RGBA-op stream (alpha tracked for the index, dropped from the
    3-channel output) decodes too."""
    hand = (
        b"qoif" + struct.pack(">IIBB", 3, 1, 3, 0)
        + bytes((0xFE, 5, 6, 7)) + bytes((0xC0 | 1,)) + b"\x00" * 7 + b"\x01"
    )
    assert MM.qoi_decode(hand) == (3, 1, 3, bytes((5, 6, 7) * 3))
    rgba = (
        b"qoif" + struct.pack(">IIBB", 2, 1, 4, 0)
        + bytes((0xFF, 9, 8, 7, 128)) + bytes((0xC0 | 0,)) + b"\x00" * 7 + b"\x01"
    )
    assert MM.qoi_decode(rgba) == (2, 1, 3, bytes((9, 8, 7) * 2))


def test_qoi_run_updates_running_index():
    """Reference qoi.c writes index[hash(px)] = px after EVERY chunk,
    RUN included. The one case where that write is not a no-op: a RUN of
    the implicit (0,0,0,255) start pixel, which was never produced by a
    chunk. An INDEX op must then yield alpha=255 (not the stale all-zero
    slot), and that alpha feeds later hash slots — making the divergence
    visible in the RGB output two chunks later."""
    # hash(0,0,0,255) = (255*11) % 64 = 53; hash(7,7,7,255) = 30
    hand = (
        b"qoif" + struct.pack(">IIBB", 6, 1, 3, 0)
        + bytes((0xC0 | 0,))            # RUN(1): implicit start pixel
        + bytes((0xFE, 200, 100, 50))   # RGB
        + bytes((53,))                  # INDEX → (0,0,0,255) per reference
        + bytes((0xFE, 7, 7, 7))        # RGB → indexed at hash(...,a=255)=30
        + bytes((0xFE, 99, 98, 97))     # RGB (move off the pixel)
        + bytes((30,))                  # INDEX → (7,7,7) iff alpha tracked
        + b"\x00" * 7 + b"\x01"
    )
    expect = bytes((0, 0, 0, 200, 100, 50, 0, 0, 0, 7, 7, 7, 99, 98, 97, 7, 7, 7))
    assert MM.qoi_decode(hand) == (6, 1, 3, expect)


def test_qoi_dispatch_and_rejects():
    px = _hash_pixels(b"d", 5 * 5 * 3)
    enc = MM.qoi_encode(px, 5, 5)
    assert MM.sniff_image_format(enc) == "qoi"
    assert MM.decode_image(enc) == (5, 5, 3, px)
    for bad in (b"nope", enc[:20], enc[:-1]):
        with pytest.raises(ValueError):
            MM.qoi_decode(bad)
    # run overflowing the declared pixel count must raise, not OOM
    overflow = (
        b"qoif" + struct.pack(">IIBB", 2, 1, 3, 0)
        + bytes((0xFE, 1, 2, 3)) + bytes((0xC0 | 40,)) + b"\x00" * 7 + b"\x01"
    )
    with pytest.raises(ValueError):
        MM.qoi_decode(overflow)


# ---------------------------------------------------------------------------
# round 15: lockstep batch JPEG decode (restart segments × images as lanes)
# ---------------------------------------------------------------------------

def _jpeg_blob(seed=0, shape=(96, 128, 3), ri=0):
    import numpy as np

    from aeuc_vector_db_spark.sources.jpeg import jpeg_encode

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 255, shape).astype(np.uint8)
    h, w = shape[0], shape[1]
    c = shape[2] if len(shape) == 3 else 1
    return jpeg_encode(img.tobytes(), w, h, c, restart_interval=ri)


def test_jpeg_encode_restart_interval_roundtrip():
    """DRI streams decode to the SAME pixels as the no-DRI stream of
    the same image (restarts change entropy segmentation, not values),
    and restart_interval=0 keeps encoder output byte-identical."""
    import numpy as np

    from aeuc_vector_db_spark.sources.jpeg import jpeg_decode, jpeg_encode

    rng = np.random.default_rng(7)
    img = rng.integers(0, 255, (41, 53, 3)).astype(np.uint8)
    base = jpeg_encode(img.tobytes(), 53, 41, 3)
    assert base == jpeg_encode(img.tobytes(), 53, 41, 3, restart_interval=0)
    ref = jpeg_decode(base)
    for ri in (1, 2, 3, 5, 100):
        blob = jpeg_encode(img.tobytes(), 53, 41, 3, restart_interval=ri)
        assert b"\xff\xdd" in blob
        assert jpeg_decode(blob) == ref
    with pytest.raises(ValueError, match="restart_interval"):
        jpeg_encode(img.tobytes(), 53, 41, 3, restart_interval=-1)


def test_jpeg_decode_batch_matches_scalar():
    """Lockstep batch decode is byte-identical to the scalar decoder
    per item across restart intervals, grayscale, odd dims, and
    no-restart single-lane streams."""
    from aeuc_vector_db_spark.sources.jpeg import jpeg_decode, jpeg_decode_batch

    blobs = [
        _jpeg_blob(0, (96, 128, 3), 0),
        _jpeg_blob(1, (96, 128, 3), 1),
        _jpeg_blob(2, (96, 128, 3), 2),
        _jpeg_blob(3, (96, 128, 3), 7),
        _jpeg_blob(4, (32, 32, 1), 3),
        _jpeg_blob(5, (41, 53, 3), 5),
        _jpeg_blob(6, (8, 8, 3), 0),
    ]
    got = jpeg_decode_batch(blobs)
    for i, b in enumerate(blobs):
        assert got[i] == jpeg_decode(b), f"item {i}"


def test_jpeg_decode_batch_subsampled_parity():
    """4:2:0 (two-lane) parity: the lockstep block-pattern machinery
    (4 Y blocks + Cb + Cr per MCU) must agree with the scalar decoder
    on a hand-built subsampled stream — the encoder only writes 4:4:4,
    so the stream is assembled here from the module's own primitives."""
    import struct

    import numpy as np

    from aeuc_vector_db_spark.sources import jpeg as J

    rng = np.random.default_rng(11)
    ph, pw = 16, 32  # 1x2 MCUs at 4:2:0
    y_plane = rng.integers(0, 255, (ph, pw)).astype(np.float64)
    cb_plane = rng.integers(0, 255, (ph // 2, pw // 2)).astype(np.float64)
    cr_plane = rng.integers(0, 255, (ph // 2, pw // 2)).astype(np.float64)

    out = bytearray(b"\xff\xd8")
    for tq, q in ((0, J.QUANT_LUM), (1, J.QUANT_CHROM)):
        zz = q.astype(int).flatten()[J.ZIGZAG]
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + bytes(
            int(x) for x in zz
        )
    sof = bytes([8]) + struct.pack(">HH", ph, pw) + bytes([3])
    sof += bytes([1, 0x22, 0])  # Y: h=v=2
    sof += bytes([2, 0x11, 1])
    sof += bytes([3, 0x11, 1])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += J._dht_segment(0x00, J.DC_LUM_BITS, J.DC_LUM_VALS)
    out += J._dht_segment(0x10, J.AC_LUM_BITS, J.AC_LUM_VALS)
    out += J._dht_segment(0x01, J.DC_CHROM_BITS, J.DC_CHROM_VALS)
    out += J._dht_segment(0x11, J.AC_CHROM_BITS, J.AC_CHROM_VALS)
    out += b"\xff\xdd" + struct.pack(">HH", 4, 1)  # DRI: restart every MCU
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    dc_lum = J._canonical_codes(J.DC_LUM_BITS, J.DC_LUM_VALS)
    ac_lum = J._canonical_codes(J.AC_LUM_BITS, J.AC_LUM_VALS)
    dc_chrom = J._canonical_codes(J.DC_CHROM_BITS, J.DC_CHROM_VALS)
    ac_chrom = J._canonical_codes(J.AC_CHROM_BITS, J.AC_CHROM_VALS)
    w = J._BitWriter()
    preds = [0, 0, 0]
    for mx in range(2):
        if mx:
            w.flush()
            w.out += bytes([0xFF, 0xD0])
            preds = [0, 0, 0]
        for by in range(2):  # 4 Y blocks, raster order within MCU
            for bx in range(2):
                blk = y_plane[by * 8 : by * 8 + 8,
                              mx * 16 + bx * 8 : mx * 16 + bx * 8 + 8]
                preds[0] = J._encode_block(
                    w, blk, J.QUANT_LUM, dc_lum, ac_lum, preds[0]
                )
        for ci, plane in ((1, cb_plane), (2, cr_plane)):
            blk = plane[0:8, mx * 8 : mx * 8 + 8]
            preds[ci] = J._encode_block(
                w, blk, J.QUANT_CHROM, dc_chrom, ac_chrom, preds[ci]
            )
    w.flush()
    out += w.out + b"\xff\xd9"
    blob = bytes(out)

    scalar = J.jpeg_decode(blob)
    [batch] = J.jpeg_decode_batch([blob])
    assert scalar == batch
    assert scalar[0] == pw and scalar[1] == ph and scalar[2] == 3


def test_jpeg_decode_batch_error_quarantine_parity():
    """Bad payloads quarantine with EXACTLY the scalar decoder's error
    type and message (lane anomalies replay through the scalar path);
    on_error='raise' propagates the first bad item in input order."""
    from aeuc_vector_db_spark.sources.jpeg import jpeg_decode, jpeg_decode_batch

    good = _jpeg_blob(0, (32, 32, 3), 2)
    bads = [
        _jpeg_blob(1, (32, 32, 3), 2)[:-40],  # entropy truncation
        b"\xff\xd8junk",                       # marker misalignment
        b"not a jpeg",                         # missing SOI
    ]
    res = jpeg_decode_batch([good, *bads], on_error="capture")
    assert res[0] == jpeg_decode(good)
    for got, blob in zip(res[1:], bads):
        assert isinstance(got, Exception)
        with pytest.raises(type(got)) as ei:
            jpeg_decode(blob)
        assert str(ei.value) == str(got)
    with pytest.raises(ValueError) as ei_raise:
        jpeg_decode_batch([good, bads[0]])
    assert str(ei_raise.value) == str(res[1])  # same error as capture mode
    with pytest.raises(ValueError, match="bad on_error"):
        jpeg_decode_batch([good], on_error="nope")


# ---------------------------------------------------------------------------
# round 15: wavefront memory gate + group-stage quarantine (ADVICE r14)
# ---------------------------------------------------------------------------

def test_png_scalar_unfilter_matches_wavefront(monkeypatch):
    """The gated scalar fallback (_png_unfilter_rows) is byte-exact vs
    the wavefront on mixed-filter images, and png_decode routed through
    the gate (budget forced to 0) still decodes identically."""
    import numpy as np

    from aeuc_vector_db_spark.sources import multimodal as MM

    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (24, 17, 3)).astype(np.uint8)
    # build a PNG cycling through all five filters per row, each row
    # filtered against the RECONSTRUCTED previous row
    import struct
    import zlib

    h, w, c = img.shape
    stride = w * c
    flat = img.reshape(h, stride)
    raw = bytearray()
    rec_prev = bytes(stride)
    for y in range(h):
        line = flat[y].tobytes()
        ft = y % 5
        row = bytearray(stride)
        for i in range(stride):
            a = line[i - c] if i >= c else 0
            b = rec_prev[i]
            cc = rec_prev[i - c] if i >= c else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
            row[i] = (line[i] - pred) & 0xFF
        raw += bytes([ft]) + bytes(row)
        rec_prev = line

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    blob = (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))

    ref = MM.png_decode(blob)
    assert ref[3] == img.tobytes()
    # force the gate: wavefront budget 0 → scalar per-row fallback
    monkeypatch.setattr(MM, "_PNG_BATCH_BUDGET_BYTES", 0)
    gated = MM.png_decode(blob)
    assert gated == ref


def test_png_decode_batch_group_stage_quarantine(monkeypatch):
    """A grouped-wavefront-stage failure must quarantine per item in
    capture mode (items recover through the gated single path), and
    propagate in raise mode — not fail the whole batch (ADVICE r14).
    Round 16: the native unfilter lane bypasses the wavefront entirely,
    so pin it OFF — this test is the Python fallback path's contract."""
    import numpy as np

    from aeuc_vector_db_spark.sources import codec_native as CN
    from aeuc_vector_db_spark.sources import multimodal as MM

    monkeypatch.setattr(CN, "available", lambda: False)

    rng = np.random.default_rng(4)
    imgs = [rng.integers(0, 255, (16, 16, 3)).astype(np.uint8) for _ in range(3)]

    # all-Paeth blobs so they take the grouped wavefront path
    def paeth_png(img):
        import struct
        import zlib

        h, w, c = img.shape
        stride = w * c
        raw = bytearray()
        prev = bytes(stride)
        flat = img.reshape(h, stride)
        for y in range(h):
            line = flat[y].tobytes()
            row = bytearray(stride)
            for i in range(stride):
                a = line[i - c] if i >= c else 0
                b = prev[i]
                cc = prev[i - c] if i >= c else 0
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                row[i] = (line[i] - pr) & 0xFF
            raw += b"\x04" + bytes(row)
            prev = line

        def chunk(tag, data):
            return (struct.pack(">I", len(data)) + tag + data
                    + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

        return (b"\x89PNG\r\n\x1a\n"
                + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
                + chunk(b"IDAT", zlib.compress(bytes(raw)))
                + chunk(b"IEND", b""))

    blobs = [paeth_png(i) for i in imgs]
    expected = [MM.png_decode(b) for b in blobs]

    calls = {"n": 0}
    real = MM._png_unfilter_wavefront

    def boom(x, f):
        # grouped (multi-image) calls fail like an allocation would;
        # single-image retries succeed through the real kernel
        if x.shape[0] > 1:
            calls["n"] += 1
            raise MemoryError("simulated skew-buffer allocation failure")
        return real(x, f)

    monkeypatch.setattr(MM, "_png_unfilter_wavefront", boom)
    got = MM.png_decode_batch(blobs, on_error="capture")
    assert calls["n"] == 1  # the grouped call failed once
    assert got == expected  # every item recovered singly
    # raise mode with an unrecoverable item: single path also fails
    monkeypatch.setattr(
        MM, "_png_unfilter_wavefront",
        lambda x, f: (_ for _ in ()).throw(MemoryError("always")),
    )
    monkeypatch.setattr(MM, "_PNG_BATCH_BUDGET_BYTES", 1 << 62)
    with pytest.raises(MemoryError):
        MM.png_decode_batch(blobs)
    res = MM.png_decode_batch(blobs, on_error="capture")
    assert all(isinstance(r, MemoryError) for r in res)


def test_decode_features_jpeg_batch_prepass_parity(spark, tmp_path):
    """The lockstep JPEG batch pre-pass inside decode_features (round
    15): DRI and no-DRI JPEGs in one Arrow batch decode through
    jpeg_decode_batch with per-row results identical to the per-item
    path, a corrupt JPEG neighbor quarantines to the same error row,
    and a registered native JPEG codec makes the pre-pass stand aside
    (seam contract — override results must win)."""
    import numpy as np

    from aeuc_vector_db_spark.sources.jpeg import jpeg_encode

    rng = np.random.default_rng(9)
    img = rng.integers(0, 255, (16, 24, 3)).astype(np.uint8)
    flat = np.full((8, 8, 3), [10, 200, 60], dtype=np.uint8)
    (tmp_path / "a_dri.jpg").write_bytes(
        jpeg_encode(img.tobytes(), 24, 16, 3, restart_interval=2)
    )
    (tmp_path / "b_plain.jpg").write_bytes(
        jpeg_encode(flat.tobytes(), 8, 8, 3)
    )
    (tmp_path / "c_trunc.jpg").write_bytes(
        jpeg_encode(img.tobytes(), 24, 16, 3, restart_interval=1)[:-30]
    )
    blobs = MM.read_binary_dir(spark, str(tmp_path))
    rows = {r["blob_id"]: r for r in MM.decode_features(blobs).collect()}
    assert rows["a_dri.jpg"]["decode_status"] == "real"
    assert (rows["a_dri.jpg"]["width"], rows["a_dri.jpg"]["height"]) == (24, 16)
    assert rows["b_plain.jpg"]["decode_status"] == "real"
    # features are [meanR, stdR, meanG, stdG, ...] — G mean at index 2
    assert abs(rows["b_plain.jpg"]["features"][2] - 200 / 255.0) < 0.02
    assert rows["c_trunc.jpg"]["decode_status"] == "error"
    # features must equal the pre-round-15 per-item arithmetic exactly:
    # recompute from a direct scalar decode of the same payload
    from aeuc_vector_db_spark.sources.jpeg import jpeg_decode

    w, h, c, pix = jpeg_decode((tmp_path / "a_dri.jpg").read_bytes())
    arr = np.frombuffer(pix, dtype=np.uint8).reshape(h, w, c)
    assert abs(
        rows["a_dri.jpg"]["features"][0] - arr[..., 0].mean() / 255.0
    ) < 1e-6
    # native-codec override: prepass stands aside, override result wins
    fixed = (5, 4, 3, bytes(5 * 4 * 3))

    def fake_jpeg(payload: bytes):
        return fixed

    over = {
        r["blob_id"]: r
        for r in MM.decode_features(
            blobs, decoder_overrides={"jpeg": fake_jpeg}
        ).collect()
    }
    assert (over["a_dri.jpg"]["width"], over["a_dri.jpg"]["height"]) == (5, 4)
    assert (over["b_plain.jpg"]["width"], over["b_plain.jpg"]["height"]) == (5, 4)
