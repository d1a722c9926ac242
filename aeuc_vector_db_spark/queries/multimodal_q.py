"""Declared multimodal query (E5) — rows-only check.

The corpus is REAL files now: valid PNGs (pure-stdlib encoder, pixels
derived deterministically from the documents fixture) and valid PCM16
WAVs, plus fake mp4 payloads exercising the declared-stub path. The
query reads them back through the binaryFile source, runs the unified
mapInPandas decode kernel (real PNG/WAV parsing, stub for video), and
aggregates per-modality feature stats — bytes → typed rows → Arrow
batches → features → agg, end-to-end.

Not DuckDB-oracled: the oracle has no PNG/WAV decoder; the kernels'
values are pinned by unit tests on known files instead
(tests/test_multimodal.py).
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aeuc_vector_db_spark.sources import multimodal as MM
from aeuc_vector_db_spark.sources.tables import load_table

# repo-local cache (driver may sandbox /tmp); gitignored
_CACHE_ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
                           ".cache", "multimodal")


def _blob_bytes(doc_id: int, text: str) -> tuple[str, bytes]:
    """Deterministic blob for one documents row, cycling real PNG / real
    WAV / real MP4 skeleton / real BMP / real JPEG / real MJPEG-AVI /
    real lossless WebP / real LOSSY WebP (VP8 key frame, round 8) /
    real QOI (round 12). Returns (filename, payload). Corpus doc_ids
    are multiples of 25, so the cycle uses (doc_id // 25) — doc_id % 9
    would alias the cycle."""
    h = hashlib.sha256(text.encode()).digest()
    kind = (doc_id // 25) % 9
    if kind == 8:
        # real QOI, 5x5 RGB from the hash stream (qoiformat.org spec;
        # sources/multimodal.py qoi_encode/qoi_decode — round-trip
        # lossless, so decode_status='real' like PNG/BMP)
        need = 5 * 5 * 3
        buf = bytearray()
        cur = h
        while len(buf) < need:
            buf += cur
            cur = hashlib.sha256(cur).digest()
        return f"blob_{doc_id}.qoi", MM.qoi_encode(bytes(buf[:need]), 5, 5)
    if kind == 7:
        # real lossy WebP: VP8 intra key frame, 16x16 RGB from the hash
        # stream (sources/vp8.py — bool coder, token trees, iDCT/iWHT,
        # intra prediction run for every such blob in the corpus)
        from aeuc_vector_db_spark.sources.webp import webp_encode_lossy

        need = 16 * 16 * 3
        buf = bytearray()
        cur = h
        while len(buf) < need:
            buf += cur
            cur = hashlib.sha256(cur).digest()
        return f"blob_{doc_id}.webp", webp_encode_lossy(
            bytes(buf[:need]), 16, 16, q_index=4
        )
    if kind == 6:
        # real lossless WebP (VP8L), 4x4 RGB from the hash stream
        from aeuc_vector_db_spark.sources.webp import webp_encode

        need = 4 * 4 * 3
        buf = bytearray()
        cur = h
        while len(buf) < need:
            buf += cur
            cur = hashlib.sha256(cur).digest()
        return f"blob_{doc_id}.webp", webp_encode(bytes(buf[:need]), 4, 4, 3)
    if kind == 5:
        # real MJPEG-in-AVI clip: 3 JPEG frames, 8x8 RGB, 4 fps →
        # exercises the REAL video decode path (decode_status='real')
        from aeuc_vector_db_spark.sources.jpeg import jpeg_encode

        frames = []
        cur = h
        for _ in range(3):
            buf = bytearray()
            while len(buf) < 8 * 8 * 3:
                buf += cur
                cur = hashlib.sha256(cur).digest()
            frames.append(jpeg_encode(bytes(buf[: 8 * 8 * 3]), 8, 8, 3))
        return f"blob_{doc_id}.avi", MM.avi_mjpeg_encode(frames, 8, 8, fps=4)
    if kind == 4:
        # real baseline JPEG, 8x8 RGB from the hash stream
        from aeuc_vector_db_spark.sources.jpeg import jpeg_encode

        need = 8 * 8 * 3
        buf = bytearray()
        cur = h
        while len(buf) < need:
            buf += cur
            cur = hashlib.sha256(cur).digest()
        return f"blob_{doc_id}.jpg", jpeg_encode(bytes(buf[:need]), 8, 8, 3)
    if kind == 3:
        # real 24-bit BMP, 4x4, pixels from the hash stream
        need = 4 * 4 * 3
        buf = bytearray()
        cur = h
        while len(buf) < need:
            buf += cur
            cur = hashlib.sha256(cur).digest()
        return f"blob_{doc_id}.bmp", MM.bmp_encode(bytes(buf[:need]), 4, 4)
    if kind == 0:
        # real 8x8 RGB PNG; pixel stream = sha256 chain over the text
        w = hgt = 8
        need = w * hgt * 3
        buf = bytearray()
        cur = h
        while len(buf) < need:
            buf += cur
            cur = hashlib.sha256(cur).digest()
        return f"blob_{doc_id}.png", MM.png_encode(bytes(buf[:need]), w, hgt, color_type=2)
    if kind == 1:
        # real PCM16 mono WAV, 64 samples @ 8 kHz from the hash stream
        samples = []
        cur = h
        while len(samples) < 64:
            samples += [
                int.from_bytes(cur[i : i + 2], "little", signed=True)
                for i in range(0, 32, 2)
            ]
            cur = hashlib.sha256(cur).digest()
        return f"blob_{doc_id}.wav", MM.wav_encode(samples[:64], sample_rate=8000)
    # real minimal ISO-BMFF skeleton → exercises the metadata-probe path
    # (decode_status='meta': real dims/duration, stubbed sample decode)
    return f"blob_{doc_id}.mp4", MM.mp4_minimal(
        width=160 + (doc_id % 8) * 16,
        height=120 + (doc_id % 8) * 8,
        duration_ms=1000 + (doc_id % 10) * 500,
    )


def _blob_dir(spark: SparkSession, sf_dir: str) -> str:
    """Materialize the binary corpus once per sf (marker-cached)."""
    tag = os.path.basename(sf_dir.rstrip("/")) + "-v8"  # v8: +QOI kind
    d = os.path.join(_CACHE_ROOT, tag)
    marker = f"{d}/.complete"
    if not os.path.exists(marker):
        os.makedirs(d, exist_ok=True)
        rows = (
            load_table(spark, "documents", sf_dir)
            .filter(F.col("doc_id") % 25 == 0)
            .select("doc_id", "text")
            .collect()
        )
        for r in rows:
            name, payload = _blob_bytes(r["doc_id"], r["text"])
            with open(os.path.join(d, name), "wb") as f:
                f.write(payload)
        with open(marker, "w") as f:
            f.write("ok")
    return d


def _expected_modality_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus's expected (modality, decode_status, count) derived
    from the DETERMINISTIC kind cycle alone — no decoding. This is what
    makes the rows-only checks self-validating (VERDICT r8 #4): a
    decode regression (e.g. a codec starting to quarantine) moves a
    group's count off this table and surfaces as extra violation rows,
    i.e. a driver-visible row-count change."""
    docs = load_table(spark, "documents", sf_dir).filter(F.col("doc_id") % 25 == 0)
    kind = (F.col("doc_id") / 25).cast("long") % 9
    modality = (
        F.when(kind == 1, "audio").when(kind.isin(2, 5), "video").otherwise("image")
    )
    status = F.when(kind == 2, "meta").otherwise("real")
    return (
        docs.select(modality.alias("modality"), status.alias("decode_status"))
        .groupBy("modality", "decode_status")
        .agg(F.count(F.lit(1)).alias("n_exp"))
    )


def _count_violations(
    actual: DataFrame, expected: DataFrame, keys: list, n_act: str, tag: str
) -> DataFrame:
    """Rows where an actual per-group count differs from the derived
    expectation (missing / extra groups included) — empty when healthy."""
    a = actual.select(*keys, F.col(n_act).alias("__act__"))
    j = a.join(expected, keys, "full_outer")
    return j.filter(
        F.coalesce(F.col("__act__"), F.lit(-1)) != F.coalesce(F.col("n_exp"), F.lit(-1))
    ).select(
        F.lit(tag).alias(keys[0]),
        F.concat_ws("/", *[F.col(k) for k in keys]).alias(keys[1]),
        (F.coalesce(F.col("__act__"), F.lit(0)) - F.coalesce(F.col("n_exp"), F.lit(0))).alias(
            "__delta__"
        ),
    )


def _multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    blobs = MM.read_binary_dir(spark, _blob_dir(spark, sf_dir))
    feats = MM.decode_features(blobs, feature_dim=8)
    agg = (
        feats.groupBy("modality", "decode_status")
        .agg(
            F.count(F.lit(1)).alias("n_blobs"),
            F.round(F.avg("width"), 6).alias("avg_width"),
            F.round(F.avg("duration_ms"), 6).alias("avg_duration_ms"),
            F.round(F.avg(F.element_at("features", 1)), 9).alias("avg_f0"),
        )
    )
    viol = _count_violations(
        agg,
        _expected_modality_counts(spark, sf_dir),
        ["modality", "decode_status"],
        "n_blobs",
        "__violation__",
    ).select(
        "modality",
        "decode_status",
        F.col("__delta__").alias("n_blobs"),
        F.lit(None).cast("double").alias("avg_width"),
        F.lit(None).cast("double").alias("avg_duration_ms"),
        F.lit(None).cast("double").alias("avg_f0"),
    )
    return agg.unionByName(viol).orderBy("modality", "decode_status")


def _multimodal_transform_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image resize (decode→nearest-resample→PNG re-encode) + audio
    framing (windowed RMS/peak) over the same blob corpus — the
    transform half of the multimodal surface, aggregated per modality.
    Rows-only (no SQL decoder); kernel values pinned in
    tests/test_multimodal.py."""
    blobs = MM.read_binary_dir(spark, _blob_dir(spark, sf_dir))
    resized = MM.resize_images(
        blobs.filter(F.col("modality") == "image"), 4, 4
    )
    frames = MM.audio_frame_features(
        blobs.filter(F.col("modality") == "audio"), window_ms=4
    )
    img = resized.groupBy("decode_status").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg(F.length("content")), 3).alias("avg_png_bytes"),
    ).select(
        F.lit("image_resize").alias("op"),
        F.col("decode_status"),
        "n",
        F.col("avg_png_bytes").alias("metric"),
    )
    aud = frames.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("rms"), 9).alias("avg_rms"),
    ).select(
        F.lit("audio_frames").alias("op"),
        F.lit("real").alias("decode_status"),
        "n",
        F.col("avg_rms").alias("metric"),
    )
    # video frame sampling: real JPEG bytes for MJPEG-AVI clips, declared
    # 32-byte sha256 fakes otherwise — the length split tells them apart
    vid = (
        MM.sample_frames(
            blobs.filter(F.col("modality") == "video"), every_ms=250, max_frames=3
        )
        .withColumn(
            "decode_status",
            F.when(
                F.substring("frame_bytes", 1, 2) == F.lit(b"\xff\xd8"), "real"
            ).otherwise("stub"),
        )
        .groupBy("decode_status")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg(F.length("frame_bytes")), 3).alias("avg_frame_bytes"),
        )
        .select(
            F.lit("video_frames").alias("op"),
            "decode_status",
            "n",
            F.col("avg_frame_bytes").alias("metric"),
        )
    )
    actual = img.unionByName(aud).unionByName(vid)
    # derived expectations, no decoding: every image resizes (n_img),
    # each 64-sample 8 kHz WAV frames into 2×4 ms windows (2·n_audio),
    # each 3-frame 4 fps AVI yields 3 real frames at 250 ms sampling,
    # each mp4 skeleton yields max_frames=3 declared fakes
    docs = load_table(spark, "documents", sf_dir).filter(F.col("doc_id") % 25 == 0)
    kind = (F.col("doc_id") / 25).cast("long") % 9
    per_blob = F.when(kind == 1, 2).when(kind.isin(2, 5), 3).otherwise(1)
    op = (
        F.when(kind == 1, "audio_frames")
        .when(kind.isin(2, 5), "video_frames")
        .otherwise("image_resize")
    )
    status = F.when(kind == 2, "stub").otherwise("real")
    expected = (
        docs.select(op.alias("op"), status.alias("decode_status"), per_blob.alias("w"))
        .groupBy("op", "decode_status")
        .agg(F.sum("w").alias("n_exp"))
    )
    viol = _count_violations(
        actual, expected, ["op", "decode_status"], "n", "__violation__"
    ).select(
        "op",
        "decode_status",
        F.col("__delta__").alias("n"),
        F.lit(None).cast("double").alias("metric"),
    )
    return actual.unionByName(viol).orderBy("op", "decode_status")


def _native_png(payload: bytes):
    """Stand-in 'native' PNG codec for the swap-seam query: delegates
    to the pure-Python builtin (the verified reference decoder), the
    way a libjpeg-turbo/Pillow wrapper would delegate to its library.
    Module-level in an importable package module → pickled by
    reference, exactly the deployment shape."""
    from aeuc_vector_db_spark.sources.multimodal import png_decode

    return png_decode(payload)


def _native_jpeg(payload: bytes):
    from aeuc_vector_db_spark.sources.jpeg import jpeg_decode

    return jpeg_decode(payload)


def _multimodal_native_codec_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The native-codec swap seam exercised END-TO-END as a declared
    query: the same blob corpus decoded twice — once through the
    builtin dispatch, once with PNG+JPEG routed through registered
    'native' decoders (delegating wrappers; a real deployment swaps in
    libjpeg-turbo the same way) — and both paths' per-modality
    aggregates emitted side-by-side under a `path` column. The two
    halves must be bit-identical (pinned in tests/test_multimodal.py);
    rows-only here (no SQL decoder oracle possible)."""
    blobs = MM.read_binary_dir(spark, _blob_dir(spark, sf_dir))

    def agg(feats: DataFrame, path: str) -> DataFrame:
        return (
            feats.groupBy("modality", "decode_status")
            .agg(
                F.count(F.lit(1)).alias("n_blobs"),
                F.round(F.avg("width"), 6).alias("avg_width"),
                F.round(F.avg(F.element_at("features", 1)), 9).alias("avg_f0"),
            )
            .select(F.lit(path).alias("path"), "*")
        )

    builtin = agg(MM.decode_features(blobs, feature_dim=8), "builtin")
    native = agg(
        MM.decode_features(
            blobs,
            feature_dim=8,
            decoder_overrides={"png": _native_png, "jpeg": _native_jpeg},
        ),
        "native",
    )
    # self-validation (VERDICT r8 #4): the bit-identity contract rides
    # the output — the two halves' symmetric difference (ignoring the
    # path tag) is emitted as '__diff__' rows, so ANY divergence between
    # builtin and native decode grows the driver-visible row count
    b = builtin.drop("path")
    n = native.drop("path")
    diff = (
        b.exceptAll(n).unionByName(n.exceptAll(b))
        .select(F.lit("__diff__").alias("path"), "*")
    )
    return (
        builtin.unionByName(native).unionByName(diff)
        .orderBy("path", "modality", "decode_status")
    )


def _canary_bad_png(payload: bytes):
    """Deliberately-WRONG PNG decoder for the codec canary: decodes
    correctly, then shifts every pixel byte by +101 mod 256 — a large,
    unmissable perturbation (avg_f0 moves by ~0.4, far above the 1e-9
    output rounding), exactly the kind of silent corruption a bad
    native-codec integration would introduce."""
    import numpy as np

    from aeuc_vector_db_spark.sources.multimodal import png_decode

    w, h, c, raw = png_decode(payload)
    arr = np.frombuffer(raw, dtype=np.uint8)
    bad = ((arr.astype(np.int16) + 101) % 256).astype(np.uint8).tobytes()
    return w, h, c, bad


def _multimodal_codec_canary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-visible canary for the native-codec diff machinery
    (round 11, VERDICT r10 #8): `multimodal_native_codec_stats` is
    rows-only and self-validating — its '__diff__' rows fire when the
    builtin and native decode paths diverge — but that violation
    machinery had never fired in a driver artifact. This query PROVES,
    in every driver run, that a decoder regression would flip a
    driver-visible count: it runs the same builtin-vs-native diff twice,
    once healthy (delegating wrappers — must produce ZERO diff rows)
    and once with a deliberately mis-registered PNG decoder
    (`_canary_bad_png` — must produce SOME diff rows). Healthy output
    is exactly one ('checks_ran', 2) row; a builtin/native divergence
    adds a 'healthy_diff_present' row, and a rotted diff machinery
    (the planted corruption NOT detected) adds a 'canary_diff_missing'
    row — either way the driver's rows-only count changes. Rows-only
    (no SQL decoder oracle possible); the corpus is the small blob
    fixture, so the three decode passes are bounded."""
    blobs = MM.read_binary_dir(spark, _blob_dir(spark, sf_dir))

    def agg(feats: DataFrame) -> DataFrame:
        return (
            feats.groupBy("modality", "decode_status")
            .agg(
                F.count(F.lit(1)).alias("n_blobs"),
                F.round(F.avg("width"), 6).alias("avg_width"),
                F.round(F.avg(F.element_at("features", 1)), 9).alias("avg_f0"),
            )
        )

    builtin = agg(MM.decode_features(blobs, feature_dim=8))
    native = agg(
        MM.decode_features(
            blobs,
            feature_dim=8,
            decoder_overrides={"png": _native_png, "jpeg": _native_jpeg},
        )
    )
    corrupted = agg(
        MM.decode_features(
            blobs, feature_dim=8, decoder_overrides={"png": _canary_bad_png}
        )
    )

    def n_diff(a: DataFrame, b: DataFrame) -> int:
        return a.exceptAll(b).unionByName(b.exceptAll(a)).count()

    healthy_diffs = n_diff(builtin, native)
    canary_diffs = n_diff(builtin, corrupted)
    rows = [("checks_ran", 2)]
    if healthy_diffs != 0:
        rows.append(("healthy_diff_present", healthy_diffs))
    if canary_diffs == 0:
        rows.append(("canary_diff_missing", 0))
    return spark.createDataFrame(rows, "check string, v long").orderBy("check")


def _multimodal_image_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image dedup (round 7, operators/imagehash.py): dHash
    every image blob in the corpus (audio/video rows quarantine as
    'error'/'stub' and drop out), plant nothing — the corpus's own
    PNG/BMP pairs that share pixel-derivation collide where they should
    — then the banded EXACT ≤3-bit Hamming pair set plus per-status
    counts. Rows-only (no SQL image decoder); the kernel's hash values
    and the pigeonhole guarantee are pinned in tests/test_imagehash.py
    against brute force."""
    from aeuc_vector_db_spark.operators.imagehash import (
        image_dhash,
        image_near_dup,
    )

    blobs = MM.read_binary_dir(spark, _blob_dir(spark, sf_dir))
    # plant a deterministic near-dup cluster so the pair branch is a
    # REAL check, not a vacuously-empty one: the same pixels as BMP and
    # PNG (distance 0), a one-pixel tweak (distance ≤ 3), and a far
    # image that must NOT pair with them
    base = bytes(
        ((x * 7 + y * 3 + ((x * y) % 13) * 5) % 256)
        for y in range(24) for x in range(32) for _ in range(3)
    )
    tweaked = bytearray(base)
    tweaked[100] = (tweaked[100] + 9) % 256
    far = bytes(
        ((x * 11 + y * 5 + ((x * y + 7) % 17) * 3) % 256)
        for y in range(24) for x in range(32) for _ in range(3)
    )
    planted = spark.createDataFrame(
        [
            ("planted_bmp", bytearray(MM.bmp_encode(base, 32, 24))),
            ("planted_png", bytearray(MM.png_encode(base, 32, 24))),
            ("planted_tweak", bytearray(MM.bmp_encode(bytes(tweaked), 32, 24))),
            ("planted_far", bytearray(MM.bmp_encode(far, 32, 24))),
        ],
        "blob_id string, content binary",
    )
    hashes = image_dhash(blobs, id_col="blob_id").unionByName(
        image_dhash(planted, id_col="blob_id")
    )
    status = hashes.groupBy("decode_status").agg(
        F.count(F.lit(1)).alias("n")
    ).select(
        F.lit("status").alias("kind"),
        F.col("decode_status").alias("a"),
        F.lit(None).cast("string").alias("b"),
        F.col("n").cast("long").alias("v"),
    )
    pairs = image_near_dup(hashes, max_distance=3, id_col="blob_id").select(
        F.lit("pair").alias("kind"),
        F.col("a_id").alias("a"),
        F.col("b_id").alias("b"),
        F.col("distance").cast("long").alias("v"),
    )
    # self-validation (VERDICT r8 #4): the pair set must be EXACTLY the
    # planted triangle — corpus images derive from distinct sha256
    # streams and must not collide, planted_far must stay out, and a
    # missing planted pair means the hash or the banded join broke.
    # Either direction of drift emits 'violation' rows (count change).
    expected = spark.createDataFrame(
        [
            ("planted_bmp", "planted_png"),
            ("planted_bmp", "planted_tweak"),
            ("planted_png", "planted_tweak"),
        ],
        "a string, b string",
    )
    # scope the contract to the PLANTED blobs: corpus-corpus pairs are
    # legitimate findings (tiny fixture images DO collide at sf0.1),
    # but any pair touching a planted id must match the expectation
    actual_keys = pairs.filter(
        F.col("a").startswith("planted_") | F.col("b").startswith("planted_")
    ).select("a", "b")
    drift = actual_keys.exceptAll(expected).unionByName(
        expected.exceptAll(actual_keys)
    )
    # each drift row is emitted TWICE (v=0 and v=1): a missing pair
    # removes one 'pair' row, so a single violation row would leave the
    # driver-visible row count unchanged — doubling guarantees every
    # drift moves the count
    viol = drift.select(
        F.lit("violation").alias("kind"), "a", "b", F.lit(0).cast("long").alias("v")
    ).unionByName(
        drift.select(
            F.lit("violation").alias("kind"), "a", "b",
            F.lit(1).cast("long").alias("v"),
        )
    )
    return status.unionByName(pairs).unionByName(viol)


def _multimodal_audio_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio twin of the image near-dup query: 64-bit adjacent-energy
    fingerprints with a planted gain-scaled duplicate — the fingerprint
    is gain-invariant modulo integer-floor ties, so the pair lands
    within the exact ≤3-bit banded Hamming gate while a different
    signal does not. Every corpus blob quarantines as 'error' BY
    DESIGN: images/videos are not WAVs, and the corpus's 64-sample
    micro-WAVs sit one sample below the fingerprint's 65-window floor
    — the status rows make that quarantine visible, the planted trio
    carries the positive check. Rows-only (no SQL WAV decoder);
    invariances pinned in tests/test_imagehash.py."""
    from aeuc_vector_db_spark.operators.imagehash import (
        audio_afp,
        hamming64_near_dup,
    )

    blobs = MM.read_binary_dir(spark, _blob_dir(spark, sf_dir))
    tone = [(((i * 13) % 200) - 100) * 30 for i in range(2600)]
    far = [(((i * 13 + 97) % 200) - 100) * 30 for i in range(2600)]
    planted = spark.createDataFrame(
        [
            ("planted_base", bytearray(MM.wav_encode(tone, 8000))),
            ("planted_gain", bytearray(MM.wav_encode([s * 2 for s in tone], 8000))),
            ("planted_far", bytearray(MM.wav_encode(far, 8000))),
        ],
        "blob_id string, content binary",
    )
    fp = audio_afp(blobs, id_col="blob_id").unionByName(
        audio_afp(planted, id_col="blob_id")
    )
    status = fp.groupBy("decode_status").agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("status").alias("kind"),
        F.col("decode_status").alias("a"),
        F.lit(None).cast("string").alias("b"),
        F.col("n").cast("long").alias("v"),
    )
    pairs = hamming64_near_dup(
        fp, max_distance=3, id_col="blob_id", hash_col="afp"
    ).select(
        F.lit("pair").alias("kind"),
        F.col("a_id").alias("a"),
        F.col("b_id").alias("b"),
        F.col("distance").cast("long").alias("v"),
    )
    # self-validation (VERDICT r8 #4): exactly the gain-invariance pair
    # — planted_far must stay out, the gain twin must land in. Drift in
    # either direction emits 'violation' rows.
    expected = spark.createDataFrame(
        [("planted_base", "planted_gain")], "a string, b string"
    )
    # scope the contract to the PLANTED blobs: corpus-corpus pairs are
    # legitimate findings (tiny fixture images DO collide at sf0.1),
    # but any pair touching a planted id must match the expectation
    actual_keys = pairs.filter(
        F.col("a").startswith("planted_") | F.col("b").startswith("planted_")
    ).select("a", "b")
    drift = actual_keys.exceptAll(expected).unionByName(
        expected.exceptAll(actual_keys)
    )
    # each drift row is emitted TWICE (v=0 and v=1): a missing pair
    # removes one 'pair' row, so a single violation row would leave the
    # driver-visible row count unchanged — doubling guarantees every
    # drift moves the count
    viol = drift.select(
        F.lit("violation").alias("kind"), "a", "b", F.lit(0).cast("long").alias("v")
    ).unionByName(
        drift.select(
            F.lit("violation").alias("kind"), "a", "b",
            F.lit(1).cast("long").alias("v"),
        )
    )
    return status.unionByName(pairs).unionByName(viol)


QUERIES = {
    "multimodal_feature_stats": (_multimodal_features, None),
    "multimodal_transform_stats": (_multimodal_transform_stats, None),
    "multimodal_native_codec_stats": (_multimodal_native_codec_stats, None),
    "multimodal_codec_canary": (_multimodal_codec_canary, None),
    "multimodal_image_near_dup": (_multimodal_image_near_dup, None),
    "multimodal_audio_near_dup": (_multimodal_audio_near_dup, None),
}
