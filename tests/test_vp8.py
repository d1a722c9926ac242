"""VP8 intra codec (sources/vp8.py): bool-coder, transform, and
prediction pins plus handcrafted-stream pixel tests and encoder/decoder
round-trips. No Spark needed — pure codec tests."""

from __future__ import annotations

import random

import pytest

from aeuc_vector_db_spark.sources import vp8 as V


# -- boolean arithmetic coder ------------------------------------------------

def test_bool_coder_round_trip_randomized():
    rng = random.Random(42)
    for _ in range(100):
        bits = [(rng.randint(0, 1), rng.randint(1, 255))
                for _ in range(rng.randint(1, 500))]
        enc = V.BoolEncoder()
        for b, p in bits:
            enc.write(b, p)
        dec = V.BoolDecoder(enc.bytes())
        assert [dec.read(p) for _, p in bits] == [b for b, _ in bits]


def test_bool_coder_literals_signed_trees():
    enc = V.BoolEncoder()
    enc.write_literal(0xA7, 8)
    enc.write_signed(-19, 6)
    for leaf in range(12):
        enc.write_tree(V.COEF_TREE, tuple(range(100, 111)), leaf)
    dec = V.BoolDecoder(enc.bytes())
    assert dec.read_literal(8) == 0xA7
    assert dec.read_signed(6) == -19
    for leaf in range(12):
        assert dec.read_tree(V.COEF_TREE, tuple(range(100, 111))) == leaf


# -- transforms --------------------------------------------------------------

def test_idct_dc_only_is_uniform_shift():
    """DC-only inverse DCT must be exactly (dc+4)>>3 in every cell —
    the hand-computable case the handcrafted streams rely on."""
    for dc in (-100, -8, 0, 7, 8, 80, 1000):
        assert V.idct4x4([dc] + [0] * 15) == [(dc + 4) >> 3] * 16


def test_transform_round_trips():
    rng = random.Random(3)
    for _ in range(200):
        x = [rng.randint(-255, 255) for _ in range(16)]
        y = V.idct4x4(V.fdct4x4(x))
        assert max(abs(a - b) for a, b in zip(x, y)) <= 1
    for _ in range(200):
        x = [rng.randint(-2000, 2000) for _ in range(16)]
        y = V.iwht4x4(V.fwht4x4(x))
        assert max(abs(a - b) for a, b in zip(x, y)) <= 1


def test_dequant_factors_spec_rules():
    dq = V.dequant_factors(0)
    assert dq["y1"] == (4, 4)
    assert dq["y2"][0] == 8          # dc ×2
    assert dq["y2"][1] == 8          # ac ×155/100 floored at 8
    dq = V.dequant_factors(127)
    assert dq["uv"][0] == 132        # UV dc cap
    assert V.dequant_factors(200)["y1"] == V.dequant_factors(127)["y1"]


# -- handcrafted streams: hand-computable pixels -----------------------------

def _flat(w, h, val):
    return bytes([val]) * (w * h)


def test_handcrafted_flat_frame_is_exact():
    """All-zero residuals, DC_PRED with no neighbors → every luma pixel
    is the 128 default DC; a flat 128 input therefore reconstructs
    EXACTLY (independent of any probability table)."""
    y = _flat(16, 16, 128)
    u = _flat(8, 8, 128)
    v = _flat(8, 8, 128)
    data = V.vp8_encode_yuv(y, u, v, 16, 16, q_index=0)
    w, h, dy, du, dv = V.vp8_decode_yuv(data)
    assert (w, h) == (16, 16)
    assert dy == y and du == u and dv == v


def test_handcrafted_flat_nonmid_value():
    """A flat value ≠ 128 forces a DC coefficient through the token
    coder; at q_index=0 (dc quant 4) the hand-computed reconstruction
    is pred(128) + (quant_round(fdct_dc)·4 + 4)>>3 per pixel — the
    encoder's residual is uniform, so fdct DC = 8·res and the whole
    chain collapses to ±1 of the source."""
    for val in (30, 96, 200, 255, 0):
        y = _flat(16, 16, val)
        data = V.vp8_encode_yuv(y, _flat(8, 8, 128), _flat(8, 8, 128),
                                16, 16, q_index=0)
        _, _, dy, du, dv = V.vp8_decode_yuv(data)
        assert max(abs(a - b) for a, b in zip(y, dy)) <= 1
        assert du == _flat(8, 8, 128)


def test_handcrafted_vertical_gradient_v_pred_chain():
    """Row-constant image: every MB below the first predicts V_PRED (or
    DC) from reconstructed rows; reconstruction must track the source
    within quantizer error at every row — a wrong above-row convention
    or a missed pad/borrow shows up as a growing drift."""
    wpx, hpx = 32, 48
    y = bytes((3 * yy) % 256 for yy in range(hpx) for _ in range(wpx))
    data = V.vp8_encode_yuv(y, _flat(16, 24, 128), _flat(16, 24, 128),
                            wpx, hpx, q_index=2)
    _, _, dy, _, _ = V.vp8_decode_yuv(data)
    worst = max(abs(a - b) for a, b in zip(y, dy))
    assert worst <= 6, worst


def test_all_bmodes_decode_consistently():
    """Force B_PRED everywhere on content with horizontal, vertical and
    diagonal structure: every 4×4 submode the encoder picks must be
    reproduced by the decoder bit-exactly (shared reconstruction), so
    the decode equals the encoder's own recon within quantizer error."""
    rng = random.Random(11)
    wpx = hpx = 32
    y = bytes(min(255, (x * 8) % 256 if yy < 16 else (yy * 8) % 256)
              for yy in range(hpx) for x in range(wpx))
    data = V.vp8_encode_yuv(y, _flat(16, 16, 100), _flat(16, 16, 180),
                            wpx, hpx, q_index=0, use_bpred=True)
    _, _, dy, du, dv = V.vp8_decode_yuv(data)
    assert max(abs(a - b) for a, b in zip(y, dy)) <= 4
    # noise exercises large-coefficient categories through B_PRED type-3
    # blocks (DC coded in-block, no Y2)
    y2 = bytes(rng.randint(0, 255) for _ in range(wpx * hpx))
    data = V.vp8_encode_yuv(y2, _flat(16, 16, 128), _flat(16, 16, 128),
                            wpx, hpx, q_index=0, use_bpred=True)
    _, _, dy, _, _ = V.vp8_decode_yuv(data)
    assert max(abs(a - b) for a, b in zip(y2, dy)) <= 4


def test_round_trip_error_bounded_by_quantizer():
    """Reconstruction error tracks the quantizer: q=0 within ±4,
    q=40 looser but bounded, and identical streams decode identically
    (determinism)."""
    rng = random.Random(7)
    wpx, hpx = 48, 32
    y = bytes(_smooth(x, yy) for yy in range(hpx) for x in range(wpx))
    u = bytes(rng.randint(90, 110) for _ in range(24 * 16))
    v = bytes(rng.randint(140, 160) for _ in range(24 * 16))
    d0 = V.vp8_encode_yuv(y, u, v, wpx, hpx, q_index=0)
    d40 = V.vp8_encode_yuv(y, u, v, wpx, hpx, q_index=40)
    assert V.vp8_encode_yuv(y, u, v, wpx, hpx, q_index=0) == d0
    _, _, y0, _, _ = V.vp8_decode_yuv(d0)
    _, _, y40, _, _ = V.vp8_decode_yuv(d40)
    e0 = max(abs(a - b) for a, b in zip(y, y0))
    e40 = max(abs(a - b) for a, b in zip(y, y40))
    assert e0 <= 4
    assert e0 <= e40 <= 80
    assert len(d40) < len(d0)  # coarser quantizer ⇒ smaller stream


def _smooth(x, yy):
    return (128 + (x * 3 - yy * 2) // 2) % 256


def test_odd_dimensions_crop():
    wpx, hpx = 19, 11
    y = bytes((x * 7 + yy * 3) % 256 for yy in range(hpx) for x in range(wpx))
    u = _flat(10, 6, 64)
    v = _flat(10, 6, 192)
    data = V.vp8_encode_yuv(y, u, v, wpx, hpx, q_index=1)
    w, h, dy, du, dv = V.vp8_decode_yuv(data)
    assert (w, h) == (19, 11)
    assert len(dy) == 19 * 11 and len(du) == 10 * 6 and len(dv) == 10 * 6
    assert max(abs(a - b) for a, b in zip(y, dy)) <= 5


def test_skip_macroblocks_round_trip():
    """A frame where interior MBs predict exactly (flat 128) emits
    skip=1 MBs; decode must still be exact (contexts reset correctly
    on both sides)."""
    y = _flat(64, 64, 128)
    data = V.vp8_encode_yuv(y, _flat(32, 32, 128), _flat(32, 32, 128),
                            64, 64, q_index=0)
    _, _, dy, du, dv = V.vp8_decode_yuv(data)
    assert dy == y
    # flat frames are almost all skip MBs → tiny stream
    assert len(data) < 120


# -- error paths -------------------------------------------------------------

def test_inter_frame_raises_not_implemented():
    with pytest.raises(NotImplementedError):
        V.vp8_decode_yuv(b"\x01" + b"\x00" * 20)


def test_corrupt_streams_raise_value_error():
    with pytest.raises(ValueError):
        V.vp8_decode_yuv(b"\x00\x00")           # too short
    with pytest.raises(ValueError):
        V.vp8_decode_yuv(b"\x00\x00\x00" + b"XXX" + b"\x00" * 6)  # start code
    good = V.vp8_encode_yuv(_flat(16, 16, 50), _flat(8, 8, 128),
                            _flat(8, 8, 128), 16, 16, q_index=0)
    with pytest.raises(ValueError):
        V.vp8_decode_yuv(good[:8])              # truncated header
    bad_dims = bytearray(good)
    bad_dims[6] = bad_dims[7] = 0               # width 0
    with pytest.raises(ValueError):
        V.vp8_decode_yuv(bytes(bad_dims))


def test_encode_validation():
    with pytest.raises(ValueError):
        V.vp8_encode(b"\x00" * 5, 2, 2)          # wrong buffer size
    with pytest.raises(ValueError):
        V.vp8_encode_yuv(_flat(16, 16, 0), _flat(8, 8, 0), _flat(8, 8, 0),
                         16, 16, q_index=300)


# -- RGB pipeline ------------------------------------------------------------

def test_rgb_round_trip_smooth_image():
    rgb = bytes([min(255, x * 4), min(255, yy * 4), 128][c]
                for yy in range(32) for x in range(32) for c in range(3))
    stream = V.vp8_encode(rgb, 32, 32, q_index=0)
    w, h, c, out = V.vp8_decode_rgb(stream)
    assert (w, h, c) == (32, 32, 3)
    assert max(abs(a - b) for a, b in zip(rgb, out)) <= 8


def test_yuv_rgb_conversion_identities():
    # pure gray is a fixed point of the BT.601 pair (chroma = 128)
    rgb = bytes([200] * 3) * 16
    y, u, v = V.rgb_to_yuv420(rgb, 4, 4)
    assert all(abs(b - 128) <= 1 for b in u) and all(abs(b - 128) <= 1 for b in v)
    back = V.yuv420_to_rgb(y, u, v, 4, 4)
    assert max(abs(a - b) for a, b in zip(rgb, back)) <= 3


def test_multi_partition_token_streams_decode_identically():
    """The format's decode-parallelism knob: token streams split by
    mb_row % n must reconstruct the identical frame for n = 1/2/4/8
    (exercises the decoder's partition size-table walk and per-row
    partition selection)."""
    w, h = 48, 48
    y = bytes((3 * x + 5 * yy) % 256 for yy in range(h) for x in range(w))
    u = _flat(24, 24, 100)
    v = _flat(24, 24, 170)
    ref = None
    for n in (1, 2, 4, 8):
        out = V.vp8_decode_yuv(V.vp8_encode_yuv(y, u, v, w, h, q_index=2,
                                                n_partitions=n))
        if ref is None:
            ref = out
        assert out == ref
    with pytest.raises(ValueError):
        V.vp8_encode_yuv(y, u, v, w, h, n_partitions=3)


# -- round 15: vectorized reconstruction parity ------------------------------

def test_vectorized_reconstruction_bit_parity_with_scalar_oracle():
    """The numpy reconstruction stage (idct4x4_batch + _predict_block_np
    + fused residual add/clamp + pad_rows/crop views) must reproduce
    the original scalar `_reconstruct_mb_scalar` path BIT-FOR-BIT on
    randomized streams covering whole-block and B_PRED modes, odd
    dimensions, skip MBs (flat regions at q=60), and all three q tiers
    — the PNG-wavefront oracle pattern."""
    rng = random.Random(1315)
    for _ in range(8):
        w = rng.choice([4, 16, 33, 48, 64])
        h = rng.choice([4, 16, 31, 48])
        flat = rng.random() < 0.3  # flat frames force skip MBs
        if flat:
            rgb = bytes([rng.randrange(256)] * (3 * w * h))
        else:
            rgb = bytes(rng.randrange(256) for _ in range(3 * w * h))
        for use_bpred in (False, True):
            blob = V.vp8_encode(rgb, w, h,
                                q_index=rng.choice([0, 8, 60]),
                                use_bpred=use_bpred)
            fast = V.vp8_decode_yuv(blob)
            V._SCALAR_RECON = True
            try:
                slow = V.vp8_decode_yuv(blob)
            finally:
                V._SCALAR_RECON = False
            assert fast == slow, (w, h, use_bpred, flat)


def test_idct4x4_batch_matches_scalar_on_extremes():
    """Batched IDCT vs the scalar loop on random and extreme
    (quantizer-cap ±2047·284) coefficient blocks — the int64 headroom
    and numpy arithmetic-shift-on-negatives claims, pinned."""
    import numpy as np

    rng = random.Random(77)
    blocks = [[rng.randint(-2047 * 284, 2047 * 284) for _ in range(16)]
              for _ in range(64)]
    blocks.append([2047 * 284] * 16)
    blocks.append([-2047 * 284] * 16)
    blocks.append([0] * 16)
    got = V.idct4x4_batch(np.asarray(blocks, dtype=np.int64))
    for k, blk in enumerate(blocks):
        assert got[k].reshape(16).tolist() == V.idct4x4(blk), k


def test_yuv420_to_rgb_matches_scalar_oracle():
    """Vectorized YUV→RGB vs the scalar twin: random planes, odd
    dimensions (chroma rounding), and the clamp extremes (Y=0/255
    against saturated chroma)."""
    rng = random.Random(9)
    for w, h in ((4, 4), (5, 3), (16, 16), (33, 31), (1, 1)):
        cw, ch = (w + 1) // 2, (h + 1) // 2
        y = bytes(rng.randrange(256) for _ in range(w * h))
        u = bytes(rng.randrange(256) for _ in range(cw * ch))
        v = bytes(rng.randrange(256) for _ in range(cw * ch))
        assert V.yuv420_to_rgb(y, u, v, w, h) == \
            V._yuv420_to_rgb_scalar(y, u, v, w, h), (w, h)
    for yv in (0, 255):
        for cv in (0, 255):
            y = bytes([yv] * 16)
            c = bytes([cv] * 4)
            assert V.yuv420_to_rgb(y, c, c, 4, 4) == \
                V._yuv420_to_rgb_scalar(y, c, c, 4, 4), (yv, cv)


def test_coef_prob_update_scan_inline_parity():
    """The inlined §13.4 probability-update scan must match the plain
    BoolDecoder read/read_literal walk bit-for-bit INCLUDING the
    update path (flag=1 + 8-bit literal), which encoder-produced
    streams never take (they write all no-update flags) — so this
    builds a randomized update stream with the BoolEncoder directly."""
    import itertools

    rng = random.Random(5)
    enc = V.BoolEncoder()
    script = []
    for t, b, c, n in itertools.product(
        range(4), range(8), range(3), range(11)
    ):
        p = V.COEF_UPDATE_PROBS[t][b][c][n]
        if rng.random() < 0.25:
            val = rng.randrange(256)
            enc.write(1, p)
            enc.write_literal(val, 8)
            script.append((t, b, c, n, val))
        else:
            enc.write(0, p)
    data = enc.bytes() + b"\x55" * 4  # trailing bytes: states must align

    def fresh():
        return [[[list(V.DEFAULT_COEF_PROBS[t][b][c]) for c in range(3)]
                 for b in range(8)] for t in range(4)]

    bd1 = V.BoolDecoder(data)
    got = fresh()
    V._read_coef_prob_updates(bd1, got)
    bd2 = V.BoolDecoder(data)
    ref = fresh()
    for t, b, c, n in itertools.product(
        range(4), range(8), range(3), range(11)
    ):
        if bd2.read(V.COEF_UPDATE_PROBS[t][b][c][n]):
            ref[t][b][c][n] = bd2.read_literal(8)
    assert got == ref
    for t, b, c, n, val in script:
        assert got[t][b][c][n] == val
    assert (bd1.pos, bd1.value, bd1.range, bd1.bit_count) == \
        (bd2.pos, bd2.value, bd2.range, bd2.bit_count)
