"""Perceptual image hashing + exact banded Hamming near-dup.

The multimodal half of dedup: byte-identical image dedup (sha of the
payload) misses re-encodes, format conversions, and single-pixel
tweaks; a perceptual hash maps visually-identical images to nearby
64-bit codes. dHash (difference hash — Krawetz's widely published
variant of average hash): decode → grayscale → nearest-resize to 9×8 →
one bit per horizontal gradient sign. Re-encoding the same pixels in
another container yields the IDENTICAL hash; small pixel noise flips
few bits.

Near-dup at scale reuses the engine's two standing tricks:

  * candidate generation is the PIGEONHOLE band join (the minhash-LSH
    shape, here made EXACT): split the 64-bit hash into 4 disjoint
    16-bit bands — two hashes within Hamming distance ≤ 3 differ in at
    most 3 bands, so they MUST agree on at least one; the equi-join on
    (band index, band value) therefore has zero false negatives. No
    all-pairs comparison ever materializes.
  * verification is `bit_count(a XOR b)` — pure JVM codegen, the
    binary.py popcount path.

Everything after the decode kernel is plain DataFrame ops; the decode
itself rides the multimodal codec seam (pure-stdlib codecs with the
`register_image_decoder` native swap point, corrupt payloads
quarantined per row).

Reference analog: none — the reference deduplicates nothing and has no
multimodal surface; this is charter E3×E5 composition. Public methods:
dHash (Krawetz 2013, "Kind of Like That"); banded exact Hamming search
is folklore pigeonhole (e.g. Manku et al. WWW'07 for SimHash).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dhash64(payload: bytes) -> int:
    """64-bit difference hash of one encoded image. Deterministic
    integer arithmetic throughout: ITU-R 601 grayscale via
    (299r + 587g + 114b) // 1000, nearest-neighbor resize to 9×8,
    bit r,c = gray[r,c] < gray[r,c+1], packed row-major MSB-first,
    returned as a SIGNED 64-bit value (Spark LongType two's
    complement). Raises like decode_image on corrupt/stub payloads."""
    from aeuc_vector_db_spark.sources.multimodal import (
        decode_image,
        resize_nearest,
    )

    w, h, c, pix = decode_image(payload)
    if c == 1:
        gray = pix
    else:
        import numpy as np

        arr = np.frombuffer(pix, dtype=np.uint8).reshape(h, w, c)[:, :, :3]
        g = (
            arr[:, :, 0].astype(np.int32) * 299
            + arr[:, :, 1].astype(np.int32) * 587
            + arr[:, :, 2].astype(np.int32) * 114
        ) // 1000
        gray = g.astype(np.uint8).tobytes()
    small = resize_nearest(gray, w, h, 1, 9, 8)
    v = 0
    for r in range(8):
        row = small[r * 9 : (r + 1) * 9]
        for col in range(8):
            v = (v << 1) | (1 if row[col] < row[col + 1] else 0)
    return v - (1 << 64) if v >= (1 << 63) else v


def image_dhash(
    blobs: DataFrame,
    payload_col: str = "content",
    id_col: str = "path",
) -> DataFrame:
    """(id, dhash LONG, decode_status) for every blob row — the same
    per-row quarantine contract as the other multimodal kernels:
    corrupt payloads yield status='error', declared-stub codecs
    'stub', both with a NULL hash; the job never dies on one bad
    file."""
    import pandas as pd

    schema = f"{id_col} string, dhash long, decode_status string"

    def _kernel(batches):
        for pdf in batches:
            ids, hashes, status = [], [], []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                ids.append(i)
                try:
                    hashes.append(dhash64(bytes(payload)))
                    status.append("ok")
                except NotImplementedError:
                    hashes.append(None)
                    status.append("stub")
                except Exception:
                    hashes.append(None)
                    status.append("error")
            yield pd.DataFrame(
                {id_col: ids, "dhash": pd.array(hashes, dtype="Int64"),
                 "decode_status": status}
            )

    return blobs.select(id_col, payload_col).mapInPandas(_kernel, schema)


def audio_fingerprint64(payload: bytes) -> int:
    """64-bit audio fingerprint of one PCM WAV: mono-mix, split the
    sample stream into 65 equal windows, integer mean-absolute
    amplitude per window, bit i = energy[i+1] > energy[i]. Comparing
    ADJACENT window energies makes the fingerprint gain-invariant
    (scaling every sample preserves the order of the means) — the
    audio analog of dHash's gradient-sign trick, same packed signed
    int64 contract. Raises like wav_decode on non-WAV/compressed
    payloads; all-integer arithmetic end to end."""
    import numpy as np

    from aeuc_vector_db_spark.sources.multimodal import wav_decode

    channels, _rate, bits, _dur, pcm = wav_decode(payload)
    if bits != 16:
        raise ValueError(f"fingerprint supports 16-bit PCM, got {bits}")
    samples = np.frombuffer(pcm, dtype="<i2").astype(np.int64)
    if channels > 1:
        n = (len(samples) // channels) * channels
        samples = samples[:n].reshape(-1, channels).sum(axis=1) // channels
    if len(samples) < 65:
        raise ValueError(f"too short to fingerprint: {len(samples)} samples")
    edges = (np.arange(66) * len(samples)) // 65
    v = 0
    prev = None
    for i in range(65):
        seg = samples[edges[i] : edges[i + 1]]
        e = int(np.abs(seg).sum()) // max(len(seg), 1)
        if prev is not None:
            v = (v << 1) | (1 if e > prev else 0)
        prev = e
    return v - (1 << 64) if v >= (1 << 63) else v


def audio_afp(
    blobs: DataFrame,
    payload_col: str = "content",
    id_col: str = "path",
) -> DataFrame:
    """(id, afp LONG, decode_status) per blob — audio_fingerprint64
    with the standard per-row quarantine (non-WAV/corrupt → 'error')."""
    import pandas as pd

    schema = f"{id_col} string, afp long, decode_status string"

    def _kernel(batches):
        for pdf in batches:
            ids, hashes, status = [], [], []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                ids.append(i)
                try:
                    hashes.append(audio_fingerprint64(bytes(payload)))
                    status.append("ok")
                except Exception:
                    hashes.append(None)
                    status.append("error")
            yield pd.DataFrame(
                {id_col: ids, "afp": pd.array(hashes, dtype="Int64"),
                 "decode_status": status}
            )

    return blobs.select(id_col, payload_col).mapInPandas(_kernel, schema)


def hamming64_near_dup(
    hashes: DataFrame,
    max_distance: int = 3,
    id_col: str = "path",
    hash_col: str = "dhash",
) -> DataFrame:
    """(a_id, b_id, distance) for every pair of 64-bit hashes within
    `max_distance` Hamming bits, a_id < b_id — generic over ANY 64-bit
    perceptual code (image dHash, audio fingerprint, SimHash). EXACT
    for max_distance ≤ 3 by pigeonhole over 4 disjoint 16-bit bands —
    candidates come from the band equi-join (never all-pairs), the
    real distance check removes band-collision false positives.
    max_distance ≥ 4 would silently lose pairs, so it raises."""
    if not 0 <= max_distance <= 3:
        raise ValueError(
            f"max_distance must be in [0, 3] for the 4-band exact "
            f"guarantee, got {max_distance}"
        )
    h = hashes.filter(F.col(hash_col).isNotNull()).select(
        F.col(id_col).alias("__id"), F.col(hash_col).alias("__h")
    )
    bands = h.select(
        "__id",
        "__h",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright(F.col("__h"), 16 * i)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("val"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("bv"),
    ).select("__id", "__h", F.col("bv.band").alias("band"), F.col("bv.val").alias("val"))
    a = bands.select(
        F.col("band"), F.col("val"),
        F.col("__id").alias("a_id"), F.col("__h").alias("__ha"),
    )
    b = bands.select(
        F.col("band"), F.col("val"),
        F.col("__id").alias("b_id"), F.col("__h").alias("__hb"),
    )
    cand = (
        a.join(b, ["band", "val"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", "__ha", "__hb")
        .distinct()
    )
    dist = F.bit_count(F.col("__ha").bitwiseXOR(F.col("__hb")))
    return (
        cand.withColumn("distance", dist.cast("int"))
        .filter(F.col("distance") <= max_distance)
        .select("a_id", "b_id", "distance")
    )


#: the image-named alias predates the generic name; both are public
image_near_dup = hamming64_near_dup
