"""Perceptual image hash + banded exact Hamming near-dup: cross-format
hash identity, noise locality, per-row quarantine, and the pigeonhole
guarantee cross-checked against brute force."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aeuc_vector_db_spark.operators.imagehash import (
    dhash64,
    image_dhash,
    image_near_dup,
)
from aeuc_vector_db_spark.sources.multimodal import bmp_encode, png_encode


def _pixels(w=32, h=24, phase=0):
    return bytes(
        ((x * 7 + y * 3 + ((x * y + phase) % 13) * 5) % 256)
        for y in range(h)
        for x in range(w)
        for _ in range(3)
    )


def test_dhash_is_format_invariant_and_noise_local():
    pix = _pixels()
    h_bmp = dhash64(bmp_encode(pix, 32, 24))
    h_png = dhash64(png_encode(pix, 32, 24))
    assert h_bmp == h_png  # same pixels, different container
    # a small perturbation moves few bits; a different image moves many
    tweaked = bytearray(pix)
    tweaked[100] = (tweaked[100] + 9) % 256
    d_small = bin((h_bmp ^ dhash64(bmp_encode(bytes(tweaked), 32, 24)))
                  & ((1 << 64) - 1)).count("1")
    d_far = bin((h_bmp ^ dhash64(bmp_encode(_pixels(phase=7), 32, 24)))
                & ((1 << 64) - 1)).count("1")
    assert d_small <= 3 < d_far


def test_image_dhash_kernel_quarantines_bad_rows(spark):
    rows = [
        ("good", bytearray(bmp_encode(_pixels(), 32, 24))),
        ("junk", bytearray(b"not an image at all")),
    ]
    df = spark.createDataFrame(rows, "path string, content binary")
    got = {r["path"]: (r["dhash"], r["decode_status"])
           for r in image_dhash(df).collect()}
    assert got["good"][1] == "ok" and got["good"][0] == dhash64(
        bmp_encode(_pixels(), 32, 24)
    )
    assert got["junk"] == (None, "error")


def test_near_dup_matches_brute_force_and_is_banded(spark):
    """Plant a cluster of near-identical images among distinct ones;
    the banded join must return EXACTLY the brute-force ≤3 pair set."""
    imgs = {}
    base = _pixels()
    imgs["a0"] = bmp_encode(base, 32, 24)
    t = bytearray(base)
    t[50] = (t[50] + 7) % 256
    imgs["a1"] = bmp_encode(bytes(t), 32, 24)
    imgs["png"] = png_encode(base, 32, 24)  # distance 0 to a0
    for i in range(6):
        imgs[f"x{i}"] = bmp_encode(_pixels(phase=11 + 17 * i), 32, 24)
    df = spark.createDataFrame(
        [(k, bytearray(v)) for k, v in imgs.items()], "path string, content binary"
    )
    hashes = image_dhash(df)
    got = sorted(
        (r["a_id"], r["b_id"], r["distance"])
        for r in image_near_dup(hashes, max_distance=3).collect()
    )
    hv = {k: dhash64(v) for k, v in imgs.items()}
    want = sorted(
        (a, b, bin((hv[a] ^ hv[b]) & ((1 << 64) - 1)).count("1"))
        for a in hv
        for b in hv
        if a < b
        and bin((hv[a] ^ hv[b]) & ((1 << 64) - 1)).count("1") <= 3
    )
    assert got == want and ("a0", "png", 0) in got
    # partitioning invariance
    again = sorted(
        (r["a_id"], r["b_id"], r["distance"])
        for r in image_near_dup(
            image_dhash(df.repartition(7)), max_distance=3
        ).collect()
    )
    assert again == got
    with pytest.raises(ValueError, match="max_distance"):
        image_near_dup(hashes, max_distance=4)


# -- audio fingerprint ------------------------------------------------------

from aeuc_vector_db_spark.operators.imagehash import (  # noqa: E402
    audio_afp,
    audio_fingerprint64,
    hamming64_near_dup,
)
from aeuc_vector_db_spark.sources.multimodal import wav_encode  # noqa: E402


def _tone(n=2600, scale=1, phase=0):
    return [((((i * 13 + phase) % 200) - 100) * 30) * scale for i in range(n)]


def _ham(a, b):
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_audio_fingerprint_invariances():
    base = audio_fingerprint64(wav_encode(_tone(), 8000))
    # declared sample rate is metadata — same samples, same fingerprint
    assert base == audio_fingerprint64(wav_encode(_tone(), 16000))
    # gain scaling preserves adjacent-energy ordering modulo integer
    # floor ties: a handful of bits at most, well under the pair gate
    assert _ham(base, audio_fingerprint64(wav_encode(_tone(scale=2), 8000))) <= 2
    # a different signal is far away
    assert _ham(base, audio_fingerprint64(wav_encode(_tone(phase=97), 8000))) > 8
    with pytest.raises(ValueError, match="too short"):
        audio_fingerprint64(wav_encode([0] * 10, 8000))


def test_audio_near_dup_via_banded_hamming(spark):
    rows = [
        ("base", bytearray(wav_encode(_tone(), 8000))),
        ("gain", bytearray(wav_encode(_tone(scale=2), 8000))),
        ("far", bytearray(wav_encode(_tone(phase=97), 8000))),
        ("junk", bytearray(b"definitely not audio")),
    ]
    df = spark.createDataFrame(rows, "path string, content binary")
    fp = audio_afp(df)
    st = {r["path"]: r["decode_status"] for r in fp.collect()}
    assert st == {"base": "ok", "gain": "ok", "far": "ok", "junk": "error"}
    pairs = sorted(
        (r["a_id"], r["b_id"])
        for r in hamming64_near_dup(fp, max_distance=3, hash_col="afp").collect()
    )
    assert pairs == [("base", "gain")]
