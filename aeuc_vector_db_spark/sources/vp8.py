"""Pure-stdlib VP8 intra (key-frame) codec — the lossy half of WebP.

Decodes VP8 key frames from the public bitstream definition (RFC 6386,
"VP8 Data Format and Decoding Guide"): the boolean arithmetic decoder
(§7), frame/segmentation/loop-filter/quantizer headers (§9), key-frame
macroblock intra modes (§11), token-tree residual decoding with
band/context-conditioned probabilities and extra-bit categories (§13),
per-plane dequantization (§14.1), the exact integer inverse DCT and
inverse Walsh-Hadamard transforms (§14.3-14.4), and 16×16/8×8/4×4 intra
prediction with the spec's 127/129 frame-edge conventions (§12).
Inter (non-key) frames need reference-frame buffers and motion
compensation — they raise NotImplementedError and stay on the declared
video-stub path, exactly like compressed video.

A minimal key-frame *encoder* (`vp8_encode`) — forward DCT/WHT,
16×16 DC/V/H/TM or all-B_PRED modes, one token partition, boolean
arithmetic encoder — exists so tests can pin the decoder with
handcrafted and round-trip streams without libwebp (none exists in
this sandbox).

**Table-fidelity note (read before trusting external files).** The
trees, token categories, zigzag order, coefficient bands, quantizer
lookup tables, transforms, and prediction rules below are the spec's.
The three large *empirical probability* tables (default coefficient
probs [4][8][3][11], their update-flag probs, and the key-frame B-mode
probs [10][10][9]) are NOT transcribed from the RFC — the text is not
available in this offline sandbox and a from-memory transcription of
~3,000 magic numbers would be silently wrong. They are replaced by
deterministic, structurally sensible placeholder distributions
(`_placeholder_*` below). Consequences: streams produced by
`vp8_encode` decode BIT-EXACTLY (both sides share the tables, and
every code path is pinned by tests), while a stream from an external
encoder (libwebp) would desync at the first residual token — and a
desynced arithmetic decoder does NOT raise, it produces silently wrong
pixels. The limitation therefore fails LOUD at the container router
(round 9): `webp_decode` only routes 'VP8 ' payloads here when the
container carries the engine's AEUC marker chunk (everything
`webp_encode_lossy` writes) or after `load_probability_tables()` has
installed the real RFC §13.5 / §13.4 / §11.5 values — a data-only,
shape-validated injection; the machinery is complete. Unmarked
external lossy WebP raises NotImplementedError (declared stub →
`decode_status='stub'`), never garbage labeled 'real'. Callers using
`vp8_decode_rgb` directly bypass the gate knowingly (that is the
round-trip test path).

Reference analog: none — the reference engine has no multimodal
surface; this continues charter extension E5 (the VP8L story from
round 5, now covering the lossy half).

Round 15: the reconstruction stage (inverse DCT, whole-block intra
prediction, residual add/clamp, plane pad/crop, YUV→RGB) is vectorized
with numpy — bit-exact integer twins of the scalar forms, which are
kept (`_reconstruct_mb_scalar`, `_yuv420_to_rgb_scalar`) as the parity
oracles pinned by test_vp8.py. The boolean arithmetic decoder and the
token state machine stay scalar: they are inherently sequential per
stream. Everything else in the module remains stdlib-only.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# Quantizer lookup tables (RFC 6386 §14.1)
# ---------------------------------------------------------------------------

_DC_QLOOKUP = (
    4, 5, 6, 7, 8, 9, 10, 10, 11, 12, 13, 14, 15, 16, 17, 17,
    18, 19, 20, 20, 21, 21, 22, 22, 23, 23, 24, 25, 25, 26, 27, 28,
    29, 30, 31, 32, 33, 34, 35, 36, 37, 37, 38, 39, 40, 41, 42, 43,
    44, 45, 46, 46, 47, 48, 49, 50, 51, 52, 53, 54, 55, 56, 57, 58,
    59, 60, 61, 62, 63, 64, 65, 66, 67, 68, 69, 70, 71, 72, 73, 74,
    75, 76, 76, 77, 78, 79, 80, 81, 82, 83, 84, 85, 86, 87, 88, 89,
    91, 93, 95, 96, 98, 100, 101, 102, 104, 106, 108, 110, 112, 114, 116, 118,
    122, 124, 126, 128, 130, 132, 134, 136, 138, 140, 143, 145, 148, 151, 154, 157,
)

_AC_QLOOKUP = (
    4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19,
    20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34, 35,
    36, 37, 38, 39, 40, 41, 42, 43, 44, 45, 46, 47, 48, 49, 50, 51,
    52, 53, 54, 55, 56, 57, 58, 60, 62, 64, 66, 68, 70, 72, 74, 76,
    78, 80, 82, 84, 86, 88, 90, 92, 94, 96, 98, 100, 102, 104, 106, 108,
    110, 112, 114, 116, 119, 122, 125, 128, 131, 134, 137, 140, 143, 146, 149, 152,
    155, 158, 161, 164, 167, 170, 173, 177, 181, 185, 189, 193, 197, 201, 205, 209,
    213, 217, 221, 225, 229, 234, 239, 245, 249, 254, 259, 264, 269, 274, 279, 284,
)


def _clamp_q(i: int) -> int:
    return 0 if i < 0 else (127 if i > 127 else i)


def dequant_factors(
    q_index: int,
    y1dc_delta: int = 0,
    y2dc_delta: int = 0,
    y2ac_delta: int = 0,
    uvdc_delta: int = 0,
    uvac_delta: int = 0,
) -> dict:
    """Per-plane (dc, ac) dequantization factors (§14.1): Y2 dc ×2,
    Y2 ac ×155/100 floored at 8, UV dc capped at 132."""
    y2ac = _AC_QLOOKUP[_clamp_q(q_index + y2ac_delta)] * 155 // 100
    uvdc = _DC_QLOOKUP[_clamp_q(q_index + uvdc_delta)]
    return {
        "y1": (_DC_QLOOKUP[_clamp_q(q_index + y1dc_delta)],
               _AC_QLOOKUP[_clamp_q(q_index)]),
        "y2": (_DC_QLOOKUP[_clamp_q(q_index + y2dc_delta)] * 2,
               y2ac if y2ac >= 8 else 8),
        "uv": (uvdc if uvdc <= 132 else 132,
               _AC_QLOOKUP[_clamp_q(q_index + uvac_delta)]),
    }


# ---------------------------------------------------------------------------
# Scan order, bands, token trees (§13.2-13.3)
# ---------------------------------------------------------------------------

ZIGZAG = (0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)

COEFF_BANDS = (0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7)

# token alphabet
DCT_EOB, DCT_0, DCT_1, DCT_2, DCT_3, DCT_4 = 0, 1, 2, 3, 4, 5
DCT_CAT1, DCT_CAT2, DCT_CAT3, DCT_CAT4, DCT_CAT5, DCT_CAT6 = 6, 7, 8, 9, 10, 11

#: token tree (§13.3): interior nodes as index pairs, leaves negated
COEF_TREE = (
    -DCT_EOB, 2,
    -DCT_0, 4,
    -DCT_1, 6,
    8, 12,
    -DCT_2, 10,
    -DCT_3, -DCT_4,
    14, 16,
    -DCT_CAT1, -DCT_CAT2,
    18, 20,
    -DCT_CAT3, -DCT_CAT4,
    -DCT_CAT5, -DCT_CAT6,
)

#: extra-bit categories: (base value, per-bit probabilities)
CAT_EXTRA = {
    DCT_CAT1: (5, (159,)),
    DCT_CAT2: (7, (165, 145)),
    DCT_CAT3: (11, (173, 148, 140)),
    DCT_CAT4: (19, (176, 155, 140, 135)),
    DCT_CAT5: (35, (180, 157, 141, 134, 130)),
    DCT_CAT6: (67, (254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129)),
}

#: token → (base value, n extra bits) for tokens with fixed values
_TOKEN_VALUE = {DCT_0: 0, DCT_1: 1, DCT_2: 2, DCT_3: 3, DCT_4: 4}

# ---------------------------------------------------------------------------
# Intra modes and trees (§11.2-11.4)
# ---------------------------------------------------------------------------

DC_PRED, V_PRED, H_PRED, TM_PRED, B_PRED = 0, 1, 2, 3, 4

KF_YMODE_TREE = (-B_PRED, 2, 4, 6, -DC_PRED, -V_PRED, -H_PRED, -TM_PRED)
KF_YMODE_PROB = (145, 156, 163, 128)

UV_MODE_TREE = (-DC_PRED, 2, -V_PRED, 4, -H_PRED, -TM_PRED)
KF_UV_MODE_PROB = (142, 114, 183)

(B_DC_PRED, B_TM_PRED, B_VE_PRED, B_HE_PRED, B_LD_PRED,
 B_RD_PRED, B_VR_PRED, B_VL_PRED, B_HD_PRED, B_HU_PRED) = range(10)

BMODE_TREE = (
    -B_DC_PRED, 2,
    -B_TM_PRED, 4,
    -B_VE_PRED, 6,
    8, 12,
    -B_HE_PRED, 10,
    -B_RD_PRED, -B_VR_PRED,
    -B_LD_PRED, 14,
    -B_VL_PRED, 16,
    -B_HD_PRED, -B_HU_PRED,
)


# ---------------------------------------------------------------------------
# Placeholder probability tables (see module docstring — data-only swap
# point for external-stream interop)
# ---------------------------------------------------------------------------

def _placeholder_coef_probs() -> list:
    """[4][8][3][11] coefficient-token probabilities. Deterministic and
    structurally sensible (EOB likelier in high bands, small tokens
    likelier than large), valid range [1, 255] — NOT the RFC §13.5
    empirical values."""
    table = []
    for btype in range(4):
        planes = []
        for band in range(8):
            ctxs = []
            for ctx in range(3):
                base = 32 + 24 * ctx - 8 * band + 4 * btype
                probs = []
                for node in range(11):
                    p = 128 + base - 18 * node
                    probs.append(max(1, min(255, p)))
                ctxs.append(tuple(probs))
            planes.append(tuple(ctxs))
        table.append(tuple(planes))
    return table


DEFAULT_COEF_PROBS = _placeholder_coef_probs()

#: probability that a coefficient-probability update flag is SET —
#: high values make the common no-update header nearly free
COEF_UPDATE_PROBS = [
    [[[252] * 11 for _ in range(3)] for _ in range(8)] for _ in range(4)
]


def _placeholder_kf_bmode_probs() -> list:
    """[10][10][9] key-frame B-mode probabilities conditioned on the
    (above, left) submodes — deterministic placeholder, not §11.5."""
    out = []
    for a in range(10):
        row = []
        for l in range(10):  # noqa: E741
            probs = tuple(
                max(1, min(255, 120 + 13 * ((a + l + n) % 7) - 30))
                for n in range(9)
            )
            row.append(probs)
        out.append(row)
    return out


KF_BMODE_PROBS = _placeholder_kf_bmode_probs()

#: True while the three empirical tables above are the in-repo
#: placeholders. webp_decode consults this to keep UNMARKED external
#: 'VP8 ' payloads on the declared-stub path — the arithmetic decoder
#: does not raise on desync, it returns silently wrong pixels, so the
#: limitation must fail loud at the router (ADVICE r8).
TABLES_ARE_PLACEHOLDER = True


def tables_are_placeholder() -> bool:
    return TABLES_ARE_PLACEHOLDER


def load_probability_tables(
    coef_probs,
    update_probs,
    kf_bmode_probs,
) -> None:
    """Data-only swap point for external-stream interop: install the
    REAL RFC 6386 §13.5 default coefficient probabilities, §13.4
    update-flag probabilities, and §11.5 key-frame B-mode
    probabilities. Shapes are validated ([4][8][3][11], [4][8][3][11],
    [10][10][9]; every entry an int in [1, 255]); on success the
    placeholder flag flips and webp_decode starts accepting unmarked
    (externally encoded) lossy streams. The decode machinery itself is
    complete — this is the only change external interop needs."""

    def _check(t, dims, name):
        if len(t) != dims[0]:
            raise ValueError(f"{name}: axis 0 must be {dims[0]}, got {len(t)}")
        for sub in t:
            if len(dims) > 1:
                _check(sub, dims[1:], name)
            elif not (isinstance(sub, int) and 1 <= sub <= 255):
                raise ValueError(f"{name}: entries must be ints in [1, 255]")

    _check(coef_probs, (4, 8, 3, 11), "coef_probs")
    _check(update_probs, (4, 8, 3, 11), "update_probs")
    _check(kf_bmode_probs, (10, 10, 9), "kf_bmode_probs")
    globals()["DEFAULT_COEF_PROBS"] = [
        tuple(tuple(tuple(c) for c in b) for b in t) for t in coef_probs
    ]
    globals()["COEF_UPDATE_PROBS"] = [
        [[list(c) for c in b] for b in t] for t in update_probs
    ]
    globals()["KF_BMODE_PROBS"] = [
        [tuple(l) for l in a] for a in kf_bmode_probs  # noqa: E741
    ]
    globals()["TABLES_ARE_PLACEHOLDER"] = False


def reset_placeholder_tables() -> None:
    """Restore the in-repo placeholder tables (test hook)."""
    globals()["DEFAULT_COEF_PROBS"] = _placeholder_coef_probs()
    globals()["COEF_UPDATE_PROBS"] = [
        [[[252] * 11 for _ in range(3)] for _ in range(8)] for _ in range(4)
    ]
    globals()["KF_BMODE_PROBS"] = _placeholder_kf_bmode_probs()
    globals()["TABLES_ARE_PLACEHOLDER"] = True


# ---------------------------------------------------------------------------
# Boolean arithmetic coder (§7; encoder per the spec's appendix)
# ---------------------------------------------------------------------------

class BoolDecoder:
    """Arithmetic decoder over a byte string (value/range/split form)."""

    __slots__ = ("data", "pos", "value", "range", "bit_count")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 2
        self.value = ((data[0] if len(data) > 0 else 0) << 8) | (
            data[1] if len(data) > 1 else 0
        )
        self.range = 255
        self.bit_count = 0

    def read(self, prob: int) -> int:
        split = 1 + (((self.range - 1) * prob) >> 8)
        big = split << 8
        if self.value >= big:
            ret = 1
            self.range -= split
            self.value -= big
        else:
            ret = 0
            self.range = split
        while self.range < 128:
            self.value = (self.value << 1) & 0xFFFF
            self.range <<= 1
            self.bit_count += 1
            if self.bit_count == 8:
                self.bit_count = 0
                if self.pos < len(self.data):
                    self.value |= self.data[self.pos]
                self.pos += 1
        return ret

    def read_literal(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read(128)
        return v

    def read_signed(self, n: int) -> int:
        v = self.read_literal(n)
        return -v if self.read(128) else v

    def read_tree(self, tree, probs) -> int:
        i = 0
        while True:
            i = tree[i + self.read(probs[i >> 1])]
            if i <= 0:
                return -i


def _norm_shift(r: int) -> int:
    """Left shifts needed to bring range back to [128, 255]."""
    s = 0
    while r < 128:
        r <<= 1
        s += 1
    return s


class BoolEncoder:
    """Arithmetic encoder producing streams BoolDecoder reads back
    bit-exactly (the spec's lowvalue/count formulation with carry
    propagation into already-emitted bytes)."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self.lowvalue = 0
        self.range = 255
        self.count = -24

    def write(self, bit: int, prob: int) -> None:
        split = 1 + (((self.range - 1) * prob) >> 8)
        if bit:
            self.lowvalue += split
            self.range -= split
        else:
            self.range = split
        shift = _norm_shift(self.range)
        self.range <<= shift
        self.count += shift
        if self.count >= 0:
            offset = shift - self.count
            if ((self.lowvalue << (offset - 1)) & 0x80000000) != 0:
                i = len(self.buf) - 1
                while i >= 0 and self.buf[i] == 0xFF:
                    self.buf[i] = 0
                    i -= 1
                if i >= 0:
                    self.buf[i] += 1
            self.buf.append((self.lowvalue >> (24 - offset)) & 0xFF)
            self.lowvalue = (self.lowvalue << offset) & 0xFFFFFF
            shift = self.count
            self.count -= 8
        self.lowvalue = (self.lowvalue << shift) & 0xFFFFFFFF

    def write_literal(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.write((value >> i) & 1, 128)

    def write_signed(self, value: int, n: int) -> None:
        self.write_literal(abs(value), n)
        self.write(1 if value < 0 else 0, 128)

    def write_tree(self, tree, probs, leaf: int) -> None:
        i = 0
        for bit in _tree_path(tree, leaf):
            self.write(bit, probs[i >> 1])
            i = tree[i + bit]

    def bytes(self) -> bytes:
        for _ in range(32):  # stop: flush 32 zero bits (spec appendix)
            self.write(0, 128)
        return bytes(self.buf)


def _tree_path(tree, leaf: int) -> "list[int]":
    """Root-to-leaf bit path in a VP8 tree (leaves stored negated; a
    child value ≤ 0 is leaf -value — index 0 can only be the root, so
    the encodings never collide). Trees are tiny; DFS is fine."""

    def rec(i: int, acc: "list[int]"):
        for bit in (0, 1):
            nxt = tree[i + bit]
            if nxt <= 0:
                if -nxt == leaf:
                    return acc + [bit]
            else:
                r = rec(nxt, acc + [bit])
                if r is not None:
                    return r
        return None

    path = rec(0, [])
    if path is None:
        raise ValueError(f"leaf {leaf} not in tree")
    return path


# ---------------------------------------------------------------------------
# Inverse transforms (§14.3-14.4) and their forward twins (encoder)
# ---------------------------------------------------------------------------

_COS = 20091  # cospi8sqrt2 - 1, Q16
_SIN = 35468  # sinpi8sqrt2, Q16


def idct4x4(coeffs: "list[int]") -> "list[int]":
    """Exact integer inverse DCT (§14.3). `coeffs` row-major 16; returns
    the 16 residuals to add to the prediction."""
    tmp = [0] * 16
    for i in range(4):  # vertical pass over columns
        ip0, ip4, ip8, ip12 = (coeffs[i], coeffs[i + 4],
                               coeffs[i + 8], coeffs[i + 12])
        a1 = ip0 + ip8
        b1 = ip0 - ip8
        t1 = (ip4 * _SIN) >> 16
        t2 = ip12 + ((ip12 * _COS) >> 16)
        c1 = t1 - t2
        t1 = ip4 + ((ip4 * _COS) >> 16)
        t2 = (ip12 * _SIN) >> 16
        d1 = t1 + t2
        tmp[i] = a1 + d1
        tmp[i + 12] = a1 - d1
        tmp[i + 4] = b1 + c1
        tmp[i + 8] = b1 - c1
    out = [0] * 16
    for i in range(4):  # horizontal pass over rows
        base = 4 * i
        ip0, ip1, ip2, ip3 = tmp[base:base + 4]
        a1 = ip0 + ip2
        b1 = ip0 - ip2
        t1 = (ip1 * _SIN) >> 16
        t2 = ip3 + ((ip3 * _COS) >> 16)
        c1 = t1 - t2
        t1 = ip1 + ((ip1 * _COS) >> 16)
        t2 = (ip3 * _SIN) >> 16
        d1 = t1 + t2
        out[base] = (a1 + d1 + 4) >> 3
        out[base + 3] = (a1 - d1 + 4) >> 3
        out[base + 1] = (b1 + c1 + 4) >> 3
        out[base + 2] = (b1 - c1 + 4) >> 3
    return out


def idct4x4_batch(coeffs: "np.ndarray") -> "np.ndarray":
    """`idct4x4` over N blocks at once: (N, 16) int64 row-major
    coefficients → (N, 4, 4) residuals. Bit-exact vectorization — the
    butterflies are pure integer adds/multiplies and `>>`, and numpy's
    right shift on negative int64 is the same arithmetic (floor) shift
    as Python's. int64 headroom: dequantized coefficients are bounded
    by 2047·284 (§14.1 tables × token cap), far inside 2**62/35468."""
    c = coeffs.reshape(-1, 4, 4)
    ip0, ip4, ip8, ip12 = c[:, 0], c[:, 1], c[:, 2], c[:, 3]
    a1 = ip0 + ip8
    b1 = ip0 - ip8
    c1 = ((ip4 * _SIN) >> 16) - (ip12 + ((ip12 * _COS) >> 16))
    d1 = (ip4 + ((ip4 * _COS) >> 16)) + ((ip12 * _SIN) >> 16)
    tmp = np.empty_like(c)
    tmp[:, 0] = a1 + d1
    tmp[:, 3] = a1 - d1
    tmp[:, 1] = b1 + c1
    tmp[:, 2] = b1 - c1
    ip0, ip1, ip2, ip3 = tmp[:, :, 0], tmp[:, :, 1], tmp[:, :, 2], tmp[:, :, 3]
    a1 = ip0 + ip2
    b1 = ip0 - ip2
    c1 = ((ip1 * _SIN) >> 16) - (ip3 + ((ip3 * _COS) >> 16))
    d1 = (ip1 + ((ip1 * _COS) >> 16)) + ((ip3 * _SIN) >> 16)
    out = np.empty_like(c)
    out[:, :, 0] = (a1 + d1 + 4) >> 3
    out[:, :, 3] = (a1 - d1 + 4) >> 3
    out[:, :, 1] = (b1 + c1 + 4) >> 3
    out[:, :, 2] = (b1 - c1 + 4) >> 3
    return out


def iwht4x4(coeffs: "list[int]") -> "list[int]":
    """Inverse Walsh-Hadamard for the Y2 (luma DC) block (§14.4);
    output[k] becomes the DC coefficient of luma subblock k."""
    tmp = [0] * 16
    for i in range(4):
        a1 = coeffs[i] + coeffs[i + 12]
        b1 = coeffs[i + 4] + coeffs[i + 8]
        c1 = coeffs[i + 4] - coeffs[i + 8]
        d1 = coeffs[i] - coeffs[i + 12]
        tmp[i] = a1 + b1
        tmp[i + 4] = c1 + d1
        tmp[i + 8] = a1 - b1
        tmp[i + 12] = d1 - c1
    out = [0] * 16
    for i in range(4):
        base = 4 * i
        a1 = tmp[base] + tmp[base + 3]
        b1 = tmp[base + 1] + tmp[base + 2]
        c1 = tmp[base + 1] - tmp[base + 2]
        d1 = tmp[base] - tmp[base + 3]
        out[base] = (a1 + b1 + 3) >> 3
        out[base + 1] = (c1 + d1 + 3) >> 3
        out[base + 2] = (a1 - b1 + 3) >> 3
        out[base + 3] = (d1 - c1 + 3) >> 3
    return out


def fdct4x4(block: "list[int]") -> "list[int]":
    """Forward 4×4 DCT (encoder side; libvpx-style fixed point, overall
    gain 8 to match idct4x4's (x+4)>>3)."""
    tmp = [0] * 16
    for i in range(4):
        base = 4 * i
        ip0, ip1, ip2, ip3 = block[base:base + 4]
        a1 = (ip0 + ip3) * 8
        b1 = (ip1 + ip2) * 8
        c1 = (ip1 - ip2) * 8
        d1 = (ip0 - ip3) * 8
        tmp[base] = a1 + b1
        tmp[base + 2] = a1 - b1
        tmp[base + 1] = (c1 * 2217 + d1 * 5352 + 14500) >> 12
        tmp[base + 3] = (d1 * 2217 - c1 * 5352 + 7500) >> 12
    out = [0] * 16
    for i in range(4):
        ip0, ip4, ip8, ip12 = tmp[i], tmp[i + 4], tmp[i + 8], tmp[i + 12]
        a1 = ip0 + ip12
        b1 = ip4 + ip8
        c1 = ip4 - ip8
        d1 = ip0 - ip12
        out[i] = (a1 + b1 + 7) >> 4
        out[i + 8] = (a1 - b1 + 7) >> 4
        out[i + 4] = ((c1 * 2217 + d1 * 5352 + 12000) >> 16) + (1 if d1 else 0)
        out[i + 12] = (d1 * 2217 - c1 * 5352 + 51000) >> 16
    return out


def fwht4x4(block: "list[int]") -> "list[int]":
    """Forward Walsh-Hadamard for Y2 (encoder side, gain matched to
    iwht4x4's (x+3)>>3: overall ×8 like the DCT pair)."""
    tmp = [0] * 16
    for i in range(4):
        base = 4 * i
        a1 = (block[base] + block[base + 2]) * 4
        d1 = (block[base + 1] + block[base + 3]) * 4
        c1 = (block[base + 1] - block[base + 3]) * 4
        b1 = (block[base] - block[base + 2]) * 4
        tmp[base] = a1 + d1 + (1 if a1 else 0)
        tmp[base + 1] = b1 + c1
        tmp[base + 2] = b1 - c1
        tmp[base + 3] = a1 - d1
    out = [0] * 16
    for i in range(4):
        a1 = tmp[i] + tmp[i + 8]
        d1 = tmp[i + 4] + tmp[i + 12]
        c1 = tmp[i + 4] - tmp[i + 12]
        b1 = tmp[i] - tmp[i + 8]
        a2 = a1 + d1
        b2 = b1 + c1
        c2 = b1 - c1
        d2 = a1 - d1
        out[i] = (a2 + (1 if a2 < 0 else 0) + 3) >> 3
        out[i + 4] = (b2 + (1 if b2 < 0 else 0) + 3) >> 3
        out[i + 8] = (c2 + (1 if c2 < 0 else 0) + 3) >> 3
        out[i + 12] = (d2 + (1 if d2 < 0 else 0) + 3) >> 3
    return out


def _clamp255(v: int) -> int:
    return 0 if v < 0 else (255 if v > 255 else v)


# ---------------------------------------------------------------------------
# Intra prediction (§12.2-12.3). Planes are bytearrays with a stride;
# predictors write into them in place. Frame-edge conventions: above
# row = 127, left column = 129, above-left corner = 127.
# ---------------------------------------------------------------------------

def _pred_dc(plane, stride, x, y, size, have_above, have_left):
    if have_above and have_left:
        s = sum(plane[(y - 1) * stride + x + i] for i in range(size)) + sum(
            plane[(y + i) * stride + x - 1] for i in range(size)
        )
        shift = {4: 3, 8: 4, 16: 5}[size]
        dc = (s + (1 << (shift - 1))) >> shift
    elif have_above:
        s = sum(plane[(y - 1) * stride + x + i] for i in range(size))
        shift = {4: 2, 8: 3, 16: 4}[size]
        dc = (s + (1 << (shift - 1))) >> shift
    elif have_left:
        s = sum(plane[(y + i) * stride + x - 1] for i in range(size))
        shift = {4: 2, 8: 3, 16: 4}[size]
        dc = (s + (1 << (shift - 1))) >> shift
    else:
        dc = 128
    for r in range(size):
        row = (y + r) * stride + x
        for c in range(size):
            plane[row + c] = dc


def _pred_v(plane, stride, x, y, size):
    for r in range(size):
        row = (y + r) * stride + x
        for c in range(size):
            plane[row + c] = plane[(y - 1) * stride + x + c]


def _pred_h(plane, stride, x, y, size):
    for r in range(size):
        row = (y + r) * stride + x
        left = plane[(y + r) * stride + x - 1]
        for c in range(size):
            plane[row + c] = left


def _pred_tm(plane, stride, x, y, size):
    tl = plane[(y - 1) * stride + x - 1]
    for r in range(size):
        row = (y + r) * stride + x
        left = plane[(y + r) * stride + x - 1]
        for c in range(size):
            plane[row + c] = _clamp255(
                left + plane[(y - 1) * stride + x + c] - tl
            )


def predict_block(plane, stride, x, y, size, mode, have_above, have_left):
    """16×16 / 8×8 whole-block intra prediction (modes DC/V/H/TM)."""
    if mode == DC_PRED:
        _pred_dc(plane, stride, x, y, size, have_above, have_left)
    elif mode == V_PRED:
        _pred_v(plane, stride, x, y, size)
    elif mode == H_PRED:
        _pred_h(plane, stride, x, y, size)
    elif mode == TM_PRED:
        _pred_tm(plane, stride, x, y, size)
    else:
        raise ValueError(f"bad whole-block mode {mode}")


def _avg3(a, b, c):
    return (a + 2 * b + c + 2) >> 2


def _avg2(a, b):
    return (a + b + 1) >> 1


def predict_subblock(plane, stride, x, y, mode, above_right):
    """4×4 B-mode prediction (§12.3). `above_right` supplies the 4
    pixels diagonally above-right (AR0..AR3) per the caller's edge
    rules."""
    A = [plane[(y - 1) * stride + x + i] for i in range(4)]
    AR = above_right
    L = [plane[(y + i) * stride + x - 1] for i in range(4)]
    TL = plane[(y - 1) * stride + x - 1]
    out = [[0] * 4 for _ in range(4)]
    if mode == B_DC_PRED:
        dc = (sum(A) + sum(L) + 4) >> 3
        for r in range(4):
            for c in range(4):
                out[r][c] = dc
    elif mode == B_TM_PRED:
        for r in range(4):
            for c in range(4):
                out[r][c] = _clamp255(L[r] + A[c] - TL)
    elif mode == B_VE_PRED:
        e = [_avg3(TL, A[0], A[1]), _avg3(A[0], A[1], A[2]),
             _avg3(A[1], A[2], A[3]), _avg3(A[2], A[3], AR[0])]
        for r in range(4):
            out[r] = e[:]
    elif mode == B_HE_PRED:
        e = [_avg3(TL, L[0], L[1]), _avg3(L[0], L[1], L[2]),
             _avg3(L[1], L[2], L[3]), _avg3(L[2], L[3], L[3])]
        for r in range(4):
            for c in range(4):
                out[r][c] = e[r]
    elif mode == B_LD_PRED:
        p = A + AR
        for r in range(4):
            for c in range(4):
                i = r + c
                out[r][c] = (_avg3(p[i], p[i + 1], p[i + 2])
                             if i < 6 else _avg3(p[6], p[7], p[7]))
    elif mode == B_RD_PRED:
        p = [L[3], L[2], L[1], L[0], TL, A[0], A[1], A[2], A[3]]
        for r in range(4):
            for c in range(4):
                out[r][c] = _avg3(p[c - r + 3], p[c - r + 4], p[c - r + 5])
    elif mode == B_VR_PRED:
        p = [L[3], L[2], L[1], L[0], TL, A[0], A[1], A[2], A[3]]
        out[3][0] = _avg3(p[1], p[2], p[3])
        out[2][0] = _avg3(p[2], p[3], p[4])
        out[3][1] = out[1][0] = _avg3(p[3], p[4], p[5])
        out[2][1] = out[0][0] = _avg2(p[4], p[5])
        out[3][2] = out[1][1] = _avg3(p[4], p[5], p[6])
        out[2][2] = out[0][1] = _avg2(p[5], p[6])
        out[3][3] = out[1][2] = _avg3(p[5], p[6], p[7])
        out[2][3] = out[0][2] = _avg2(p[6], p[7])
        out[1][3] = _avg3(p[6], p[7], p[8])
        out[0][3] = _avg2(p[7], p[8])
    elif mode == B_VL_PRED:
        p = A + AR
        out[0][0] = _avg2(p[0], p[1])
        out[1][0] = _avg3(p[0], p[1], p[2])
        out[2][0] = out[0][1] = _avg2(p[1], p[2])
        out[1][1] = out[3][0] = _avg3(p[1], p[2], p[3])
        out[2][1] = out[0][2] = _avg2(p[2], p[3])
        out[3][1] = out[1][2] = _avg3(p[2], p[3], p[4])
        out[0][3] = out[2][2] = _avg2(p[3], p[4])
        out[1][3] = out[3][2] = _avg3(p[3], p[4], p[5])
        out[2][3] = _avg3(p[4], p[5], p[6])
        out[3][3] = _avg3(p[5], p[6], p[7])
    elif mode == B_HD_PRED:
        p = [L[3], L[2], L[1], L[0], TL, A[0], A[1], A[2]]
        out[3][0] = _avg2(p[0], p[1])
        out[3][1] = _avg3(p[0], p[1], p[2])
        out[2][0] = out[3][2] = _avg2(p[1], p[2])
        out[2][1] = out[3][3] = _avg3(p[1], p[2], p[3])
        out[2][2] = out[1][0] = _avg2(p[2], p[3])
        out[2][3] = out[1][1] = _avg3(p[2], p[3], p[4])
        out[1][2] = out[0][0] = _avg2(p[3], p[4])
        out[1][3] = out[0][1] = _avg3(p[3], p[4], p[5])
        out[0][2] = _avg3(p[4], p[5], p[6])
        out[0][3] = _avg3(p[5], p[6], p[7])
    elif mode == B_HU_PRED:
        p = L
        out[0][0] = _avg2(p[0], p[1])
        out[0][1] = _avg3(p[0], p[1], p[2])
        out[0][2] = out[1][0] = _avg2(p[1], p[2])
        out[0][3] = out[1][1] = _avg3(p[1], p[2], p[3])
        out[1][2] = out[2][0] = _avg2(p[2], p[3])
        out[1][3] = out[2][1] = _avg3(p[2], p[3], p[3])
        out[2][2] = out[2][3] = p[3]
        out[3][0] = out[3][1] = out[3][2] = out[3][3] = p[3]
    else:
        raise ValueError(f"bad b-mode {mode}")
    for r in range(4):
        row = (y + r) * stride + x
        for c in range(4):
            plane[row + c] = out[r][c]


# ---------------------------------------------------------------------------
# Token (residual) coding — decoder and its encoder mirror (§13)
# ---------------------------------------------------------------------------

def _block_tokens(levels: "list[int]", first: int) -> "list[tuple[int, int]]":
    """Encoder-side tokenization of quantized levels (zigzag order):
    [(token, signed_level)] with a trailing EOB when the block ends
    early. Levels are quantizer-INDEPENDENT integers."""
    # find last nonzero in zigzag order
    zz = [levels[ZIGZAG[c]] for c in range(16)]
    last = -1
    for c in range(first, 16):
        if zz[c]:
            last = c
    toks = []
    for c in range(first, (last + 1) if last >= 0 else first):
        v = zz[c]
        a = abs(v)
        if a == 0:
            toks.append((DCT_0, 0))
        elif a <= 4:
            toks.append((DCT_0 + a, v))
        elif a <= 6:
            toks.append((DCT_CAT1, v))
        elif a <= 10:
            toks.append((DCT_CAT2, v))
        elif a <= 18:
            toks.append((DCT_CAT3, v))
        elif a <= 34:
            toks.append((DCT_CAT4, v))
        elif a <= 66:
            toks.append((DCT_CAT5, v))
        else:
            toks.append((DCT_CAT6, v))
    if last < 15:
        toks.append((DCT_EOB, 0))
    return toks


def _encode_coeffs(be: BoolEncoder, probs, first: int,
                   levels: "list[int]", first_ctx: int) -> int:
    """Mirror of _decode_block: writes the token stream for one block;
    returns the has-nonzero flag."""
    toks = _block_tokens(levels, first)
    prev_zero = False
    nonzero = 0
    c = first
    for token, v in toks:
        ctx = first_ctx if c == first else (
            0 if prev_zero else (1 if abs_prev == 1 else 2)
        )
        p = probs[COEFF_BANDS[c]][ctx]
        start = 2 if prev_zero else 0
        i = start
        for bit in _tree_path_from(COEF_TREE, token, start):
            be.write(bit, p[i >> 1])
            i = COEF_TREE[i + bit]
        if token == DCT_EOB:
            break
        if token == DCT_0:
            prev_zero = True
            abs_prev = 0
            c += 1
            continue
        a = abs(v)
        if token in (DCT_CAT1, DCT_CAT2, DCT_CAT3, DCT_CAT4, DCT_CAT5,
                     DCT_CAT6):
            base, bit_probs = CAT_EXTRA[token]
            extra = a - base
            for k, bp in enumerate(bit_probs):
                be.write((extra >> (len(bit_probs) - 1 - k)) & 1, bp)
        be.write(1 if v < 0 else 0, 128)
        prev_zero = False
        abs_prev = a
        nonzero += 1
        c += 1
    return 1 if nonzero else 0


_TREE_PATH_CACHE: dict = {}


def _tree_path_from(tree, leaf: int, start: int) -> "list[int]":
    key = (id(tree), leaf, start)
    hit = _TREE_PATH_CACHE.get(key)
    if hit is not None:
        return hit

    def rec(i, acc):
        for bit in (0, 1):
            nxt = tree[i + bit]
            if nxt <= 0:
                if -nxt == leaf:
                    return acc + [bit]
            else:
                r = rec(nxt, acc + [bit])
                if r is not None:
                    return r
        return None

    path = rec(start, [])
    if path is None:
        raise ValueError(f"leaf {leaf} unreachable from node {start}")
    _TREE_PATH_CACHE[key] = path
    return path


def _decode_block(bd, probs, first, dq_dc, dq_ac, first_ctx):
    """One 4x4 block's dequantized coefficients (raster order) and
    the has-nonzero flag; `first_ctx` is the neighbor-derived context
    for the first coefficient.

    The BoolDecoder read is inlined over local variables (state loaded
    once per block, written back once) — this loop decodes every
    residual token in the frame and per-bit attribute access plus a
    method call per `read` was ~45% of decode time. The arithmetic is
    `BoolDecoder.read`'s verbatim; `test_vp8.py` pins both the scalar
    parity and the handcrafted exact frames."""
    out = [0] * 16
    c = first
    prev_zero = False
    abs_prev = 0
    any_nz = 0
    data = bd.data
    dpos = bd.pos
    value = bd.value
    rng = bd.range
    bit_count = bd.bit_count
    dlen = len(data)
    while c < 16:
        ctx = first_ctx if c == first else (
            0 if prev_zero else (1 if abs_prev == 1 else 2)
        )
        p = probs[COEFF_BANDS[c]][ctx]
        i = 2 if prev_zero else 0
        while True:
            prob = p[i >> 1]
            split = 1 + (((rng - 1) * prob) >> 8)
            big = split << 8
            if value >= big:
                bit = 1
                rng -= split
                value -= big
            else:
                bit = 0
                rng = split
            while rng < 128:
                value = (value << 1) & 0xFFFF
                rng <<= 1
                bit_count += 1
                if bit_count == 8:
                    bit_count = 0
                    if dpos < dlen:
                        value |= data[dpos]
                    dpos += 1
            i = COEF_TREE[i + bit]
            if i <= 0:
                token = -i
                break
        if token == DCT_EOB:
            break
        if token == DCT_0:
            prev_zero = True
            abs_prev = 0
            c += 1
            continue
        if token in _TOKEN_VALUE:
            v = _TOKEN_VALUE[token]
        else:
            base, bit_probs = CAT_EXTRA[token]
            extra = 0
            for bp in bit_probs:
                split = 1 + (((rng - 1) * bp) >> 8)
                big = split << 8
                if value >= big:
                    bit = 1
                    rng -= split
                    value -= big
                else:
                    bit = 0
                    rng = split
                while rng < 128:
                    value = (value << 1) & 0xFFFF
                    rng <<= 1
                    bit_count += 1
                    if bit_count == 8:
                        bit_count = 0
                        if dpos < dlen:
                            value |= data[dpos]
                        dpos += 1
                extra = (extra << 1) | bit
            v = base + extra
        split = 1 + (((rng - 1) * 128) >> 8)
        big = split << 8
        if value >= big:
            rng -= split
            value -= big
            v = -v
        else:
            rng = split
        while rng < 128:
            value = (value << 1) & 0xFFFF
            rng <<= 1
            bit_count += 1
            if bit_count == 8:
                bit_count = 0
                if dpos < dlen:
                    value |= data[dpos]
                dpos += 1
        pos = ZIGZAG[c]
        out[pos] = v * (dq_dc if pos == 0 else dq_ac)
        any_nz = 1
        prev_zero = False
        abs_prev = abs(v)
        c += 1
    bd.pos = dpos
    bd.value = value
    bd.range = rng
    bd.bit_count = bit_count
    return out, any_nz


# ---------------------------------------------------------------------------
# Reconstruction planes (padded: top border row = 127, left border col =
# 129, 4-px right pad replicated per row — the frame-edge conventions of
# §12.2, applied uniformly)
# ---------------------------------------------------------------------------

class _Plane:
    __slots__ = ("w", "h", "stride", "data", "_view")

    def __init__(self, w: int, h: int) -> None:
        self.w = w
        self.h = h
        self.stride = 1 + w + 4
        self.data = bytearray(self.stride * (h + 1))
        self._view = None
        row0 = self.data
        for x in range(self.stride):
            row0[x] = 127  # above border incl. above-left corner
        for y in range(h):
            self.data[(y + 1) * self.stride] = 129  # left border

    def idx(self, y: int, x: int) -> int:
        return (y + 1) * self.stride + (x + 1)

    def view(self) -> "np.ndarray":
        """Writable uint8 view over the padded buffer, (h+1, stride);
        pixel (y, x) sits at view[y+1, x+1]. Shares memory with
        `data`, so scalar writes and numpy writes stay coherent."""
        if self._view is None:
            self._view = np.frombuffer(self.data, dtype=np.uint8).reshape(
                self.h + 1, self.stride
            )
        return self._view

    def pad_row(self, y: int) -> None:
        """Replicate the last real pixel into the 4-px right pad."""
        base = self.idx(y, self.w - 1)
        v = self.data[base]
        for i in range(1, 5):
            self.data[base + i] = v

    def pad_rows(self, y0: int, n: int) -> None:
        """pad_row over n consecutive rows as one vector op."""
        v = self.view()
        rows = v[y0 + 1:y0 + 1 + n]
        rows[:, self.w + 1:self.w + 5] = rows[:, self.w:self.w + 1]

    def crop(self) -> bytes:
        return self.view()[1:self.h + 1, 1:self.w + 1].tobytes()


def _add_residual(plane: _Plane, x: int, y: int, res: "list[int]") -> None:
    d, s = plane.data, plane.stride
    for r in range(4):
        base = plane.idx(y + r, x)
        for c in range(4):
            d[base + c] = _clamp255(d[base + c] + res[4 * r + c])


#: map of whole-MB luma modes to the B-mode used as the above/left
#: context for a neighboring B_PRED macroblock (§11.3)
_MODE_TO_BMODE = {DC_PRED: B_DC_PRED, V_PRED: B_VE_PRED,
                  H_PRED: B_HE_PRED, TM_PRED: B_TM_PRED}

_SEGMENT_TREE = (2, 4, -0, -1, -2, -3)


class VP8Error(ValueError):
    pass


def _parse_frame_header(data: bytes):
    if len(data) < 10:
        raise VP8Error("VP8 frame too short")
    tag = data[0] | (data[1] << 8) | (data[2] << 16)
    key_frame = (tag & 1) == 0
    first_part_size = tag >> 5
    if not key_frame:
        raise NotImplementedError(
            "VP8 inter frame: needs reference buffers/motion compensation "
            "(declared stub, like compressed video)"
        )
    if data[3:6] != b"\x9d\x01\x2a":
        raise VP8Error("bad VP8 key-frame start code")
    w_code = data[6] | (data[7] << 8)
    h_code = data[8] | (data[9] << 8)
    width, height = w_code & 0x3FFF, h_code & 0x3FFF
    if width == 0 or height == 0:
        raise VP8Error("zero VP8 frame dimension")
    if 10 + first_part_size > len(data):
        raise VP8Error("VP8 first partition overruns frame")
    return width, height, data[10:10 + first_part_size], data[10 + first_part_size:]


#: 24 shared all-zero coefficient blocks for skip MBs — read-only (fed
#: to np.asarray / idct4x4; never mutated: the y2-DC substitution only
#: happens on freshly decoded non-skip blocks)
_ZERO_BLOCKS_24 = tuple([0] * 16 for _ in range(24))


def _read_coef_prob_updates(bd: "BoolDecoder", coef_probs) -> None:
    """The §13.4 coefficient-probability update scan: 4·8·3·11 = 1,056
    conditional reads (update flag + optional 8-bit literal) — the
    largest fixed per-frame bool-read cost, so the decoder state is
    inlined over locals exactly like `_decode_block` (arithmetic
    verbatim; the pinned round-trip tests cover every path because the
    encoder always writes all 1,056 no-update flags)."""
    data = bd.data
    dpos = bd.pos
    value = bd.value
    rng = bd.range
    bit_count = bd.bit_count
    dlen = len(data)
    for t in range(4):
        cu_t = COEF_UPDATE_PROBS[t]
        cp_t = coef_probs[t]
        for b in range(8):
            cu_b = cu_t[b]
            cp_b = cp_t[b]
            for c in range(3):
                cu = cu_b[c]
                row = cp_b[c]
                for n in range(11):
                    prob = cu[n]
                    split = 1 + (((rng - 1) * prob) >> 8)
                    big = split << 8
                    if value >= big:
                        bit = 1
                        rng -= split
                        value -= big
                    else:
                        bit = 0
                        rng = split
                    while rng < 128:
                        value = (value << 1) & 0xFFFF
                        rng <<= 1
                        bit_count += 1
                        if bit_count == 8:
                            bit_count = 0
                            if dpos < dlen:
                                value |= data[dpos]
                            dpos += 1
                    if bit:
                        v = 0
                        for _ in range(8):
                            split = 1 + (((rng - 1) * 128) >> 8)
                            big = split << 8
                            if value >= big:
                                lit = 1
                                rng -= split
                                value -= big
                            else:
                                lit = 0
                                rng = split
                            while rng < 128:
                                value = (value << 1) & 0xFFFF
                                rng <<= 1
                                bit_count += 1
                                if bit_count == 8:
                                    bit_count = 0
                                    if dpos < dlen:
                                        value |= data[dpos]
                                    dpos += 1
                            v = (v << 1) | lit
                        row[n] = v
    bd.pos = dpos
    bd.value = value
    bd.range = rng
    bd.bit_count = bit_count


def vp8_decode_yuv(data: bytes):
    """Decode a VP8 key frame → (width, height, y, u, v) planes
    (bytes; chroma half-resolution, rounded up). Loop filtering is NOT
    applied — streams with loop_filter_level == 0 (all vp8_encode
    output) reconstruct exactly; for other streams the deblocking pass
    is skipped (documented omission)."""
    width, height, part1, rest = _parse_frame_header(data)
    mb_cols = (width + 15) // 16
    mb_rows = (height + 15) // 16
    bd = BoolDecoder(part1)
    bd.read_literal(1)  # color space
    bd.read_literal(1)  # clamping type
    seg_enabled = bd.read_literal(1)
    seg_probs = [255, 255, 255]
    seg_update_map = 0
    seg_abs = 0
    seg_q = [0, 0, 0, 0]
    if seg_enabled:
        seg_update_map = bd.read_literal(1)
        update_data = bd.read_literal(1)
        if update_data:
            seg_abs = bd.read_literal(1)
            for i in range(4):
                if bd.read_literal(1):
                    seg_q[i] = bd.read_signed(7)
            for i in range(4):
                if bd.read_literal(1):
                    bd.read_signed(6)  # per-segment loop-filter strength
        if seg_update_map:
            for i in range(3):
                if bd.read_literal(1):
                    seg_probs[i] = bd.read_literal(8)
    bd.read_literal(1)  # filter type
    bd.read_literal(6)  # filter level (deblocking not applied — see doc)
    bd.read_literal(3)  # sharpness
    if bd.read_literal(1):  # loop-filter deltas enabled
        if bd.read_literal(1):  # ... and updated
            for _ in range(8):
                if bd.read_literal(1):
                    bd.read_signed(6)
    n_parts = 1 << bd.read_literal(2)
    # token partition sizes: (n_parts - 1) little-endian 3-byte sizes
    sizes_len = 3 * (n_parts - 1)
    if sizes_len > len(rest):
        raise VP8Error("token partition size table overruns frame")
    offs, pos = [], sizes_len
    for i in range(n_parts - 1):
        sz = rest[3 * i] | (rest[3 * i + 1] << 8) | (rest[3 * i + 2] << 16)
        offs.append((pos, sz))
        pos += sz
    offs.append((pos, len(rest) - pos))
    parts = [BoolDecoder(rest[o:o + n]) for (o, n) in offs]
    q_index = bd.read_literal(7)
    deltas = []
    for _ in range(5):
        deltas.append(bd.read_signed(4) if bd.read_literal(1) else 0)
    base_dq = dequant_factors(q_index, *deltas)
    seg_dq = []
    for s in range(4):
        if seg_enabled:
            qi = seg_q[s] if seg_abs else q_index + seg_q[s]
            seg_dq.append(dequant_factors(_clamp_q(qi), *deltas))
        else:
            seg_dq.append(base_dq)
    bd.read_literal(1)  # refresh entropy probs
    coef_probs = [[[list(DEFAULT_COEF_PROBS[t][b][c]) for c in range(3)]
                   for b in range(8)] for t in range(4)]
    _read_coef_prob_updates(bd, coef_probs)
    mb_skip_enabled = bd.read_literal(1)
    prob_skip = bd.read_literal(8) if mb_skip_enabled else 0

    # --- mode pass (all from partition 1) ---
    mbs = []
    above_sub = [[B_DC_PRED] * 4 for _ in range(mb_cols)]
    for mb_row in range(mb_rows):
        left_sub = [B_DC_PRED] * 4
        for mb_col in range(mb_cols):
            seg = 0
            if seg_enabled and seg_update_map:
                seg = bd.read_tree(_SEGMENT_TREE, seg_probs)
            skip = bd.read(prob_skip) if mb_skip_enabled else 0
            ymode = bd.read_tree(KF_YMODE_TREE, KF_YMODE_PROB)
            bmodes = None
            if ymode == B_PRED:
                bmodes = [0] * 16
                for r in range(4):
                    for c in range(4):
                        a = above_sub[mb_col][c] if r == 0 else bmodes[(r - 1) * 4 + c]
                        l = left_sub[r] if c == 0 else bmodes[r * 4 + c - 1]  # noqa: E741
                        bmodes[r * 4 + c] = bd.read_tree(
                            BMODE_TREE, KF_BMODE_PROBS[a][l]
                        )
                above_sub[mb_col] = bmodes[12:16]
                left_sub = [bmodes[3], bmodes[7], bmodes[11], bmodes[15]]
            else:
                bm = _MODE_TO_BMODE[ymode]
                above_sub[mb_col] = [bm] * 4
                left_sub = [bm] * 4
            uvmode = bd.read_tree(UV_MODE_TREE, KF_UV_MODE_PROB)
            mbs.append({"seg": seg, "skip": skip, "ymode": ymode,
                        "bmodes": bmodes, "uvmode": uvmode})

    # --- residual + reconstruction pass ---
    yp = _Plane(mb_cols * 16, mb_rows * 16)
    up = _Plane(mb_cols * 8, mb_rows * 8)
    vp = _Plane(mb_cols * 8, mb_rows * 8)
    above_y = [0] * (mb_cols * 4)
    above_u = [0] * (mb_cols * 2)
    above_v = [0] * (mb_cols * 2)
    above_y2 = [0] * mb_cols
    for mb_row in range(mb_rows):
        left_y = [0] * 4
        left_u = [0] * 2
        left_v = [0] * 2
        left_y2 = 0
        td = parts[mb_row % n_parts]
        row_coeffs = []
        for mb_col in range(mb_cols):
            mb = mbs[mb_row * mb_cols + mb_col]
            dq = seg_dq[mb["seg"]]
            has_y2 = mb["ymode"] != B_PRED
            if mb["skip"]:
                # all 24 blocks are zero: share one read-only row (fed
                # to np.asarray / the scalar oracle, never mutated)
                row_coeffs.extend(_ZERO_BLOCKS_24)
                for i in range(4):
                    above_y[mb_col * 4 + i] = 0
                    left_y[i] = 0
                for i in range(2):
                    above_u[mb_col * 2 + i] = 0
                    left_u[i] = 0
                    above_v[mb_col * 2 + i] = 0
                    left_v[i] = 0
                if has_y2:
                    above_y2[mb_col] = 0
                    left_y2 = 0
            else:
                ytype, first = (0, 1) if has_y2 else (3, 0)
                if has_y2:
                    ctx = above_y2[mb_col] + left_y2
                    y2, nz = _decode_block(
                        td, coef_probs[1], 0, dq["y2"][0], dq["y2"][1], ctx
                    )
                    above_y2[mb_col] = left_y2 = nz
                    dcs = iwht4x4(y2)
                for r in range(4):
                    for c in range(4):
                        k = r * 4 + c
                        ctx = above_y[mb_col * 4 + c] + left_y[r]
                        blk, nz = _decode_block(
                            td, coef_probs[ytype], first,
                            dq["y1"][0], dq["y1"][1], ctx
                        )
                        if has_y2:
                            blk[0] = dcs[k]
                        row_coeffs.append(blk)
                        above_y[mb_col * 4 + c] = left_y[r] = nz
                for above_c, left_c in (
                    (above_u, left_u), (above_v, left_v)
                ):
                    for r in range(2):
                        for c in range(2):
                            ctx = above_c[mb_col * 2 + c] + left_c[r]
                            blk, nz = _decode_block(
                                td, coef_probs[2], 0,
                                dq["uv"][0], dq["uv"][1], ctx
                            )
                            row_coeffs.append(blk)
                            above_c[mb_col * 2 + c] = left_c[r] = nz
        # one exact-integer IDCT over every block in the MB row (24 per
        # MB) — hoisted out of _reconstruct_mb because residuals never
        # depend on reconstructed pixels; only prediction is sequential
        if _SCALAR_RECON:
            for mb_col in range(mb_cols):
                b = row_coeffs[mb_col * 24:mb_col * 24 + 24]
                _reconstruct_mb_scalar(
                    yp, up, vp, mb_row, mb_col,
                    mbs[mb_row * mb_cols + mb_col],
                    b[:16], b[16:20], b[20:24],
                )
        else:
            res_row = idct4x4_batch(np.asarray(row_coeffs, dtype=np.int64))
            for mb_col in range(mb_cols):
                _reconstruct_mb(
                    yp, up, vp, mb_row, mb_col,
                    mbs[mb_row * mb_cols + mb_col],
                    res_row[mb_col * 24:mb_col * 24 + 24],
                )
        yp.pad_rows(mb_row * 16, 16)
        up.pad_rows(mb_row * 8, 8)
        vp.pad_rows(mb_row * 8, 8)
    cw, ch = (width + 1) // 2, (height + 1) // 2
    return (width, height,
            _crop_to(yp, width, height),
            _crop_to(up, cw, ch), _crop_to(vp, cw, ch))


def _crop_to(plane: _Plane, w: int, h: int) -> bytes:
    return plane.view()[1:h + 1, 1:w + 1].tobytes()


def _predict_block_np(v, x, y, size, mode, have_above, have_left):
    """Vectorized whole-block intra prediction (DC/V/H/TM) over a
    padded-plane view; returns the (size, size) int prediction, TM
    pre-clamped exactly like `_pred_tm`. Bit-exact twin of
    `predict_block` (pinned by the scalar-parity test)."""
    above = v[y, x + 1:x + 1 + size].astype(np.int64)
    left = v[y + 1:y + 1 + size, x].astype(np.int64)
    if mode == DC_PRED:
        if have_above and have_left:
            s = int(above.sum() + left.sum())
            shift = {4: 3, 8: 4, 16: 5}[size]
        elif have_above:
            s = int(above.sum())
            shift = {4: 2, 8: 3, 16: 4}[size]
        elif have_left:
            s = int(left.sum())
            shift = {4: 2, 8: 3, 16: 4}[size]
        else:
            return np.full((size, size), 128, dtype=np.int64)
        dc = (s + (1 << (shift - 1))) >> shift
        return np.full((size, size), dc, dtype=np.int64)
    if mode == V_PRED:
        return np.broadcast_to(above, (size, size))
    if mode == H_PRED:
        return np.broadcast_to(left[:, None], (size, size))
    if mode == TM_PRED:
        tl = int(v[y, x])
        return np.clip(left[:, None] + above[None, :] - tl, 0, 255)
    raise ValueError(f"bad whole-block mode {mode}")


def _tile_residuals(res: "np.ndarray", n: int) -> "np.ndarray":
    """(n², 4, 4) raster-ordered subblock residuals → the (4n, 4n)
    spatial layout (block k = r·n + c occupies rows 4r.., cols 4c..)."""
    return res.reshape(n, n, 4, 4).transpose(0, 2, 1, 3).reshape(4 * n, 4 * n)


#: test hook — True routes vp8_decode_yuv through the scalar
#: reconstruction oracle (`_reconstruct_mb_scalar`) so parity tests can
#: pin the vectorized path bit-for-bit on the SAME streams
_SCALAR_RECON = False


def _reconstruct_mb(yp, up, vp, mb_row, mb_col, mb, res):
    """Vectorized macroblock reconstruction over precomputed residuals
    `res` ((24, 4, 4) int64 from idct4x4_batch: 16 luma raster blocks,
    4 U, 4 V): numpy intra prediction fused with the residual
    add/clamp, written through the plane buffer views. B_PRED keeps
    the scalar per-subblock predictor (true sequential dependency
    inside the MB) but rides the batched IDCT and vector adds.
    Bit-exact twin of `_reconstruct_mb_scalar` below — the two-stage
    clamping (TM prediction clamped, then pred+residual clamped) is
    preserved."""
    x0, y0 = mb_col * 16, mb_row * 16
    have_above = mb_row > 0
    have_left = mb_col > 0
    vy = yp.view()
    if mb["skip"] and mb["ymode"] != B_PRED:
        # all residuals are zero: prediction IS the reconstruction
        pred = _predict_block_np(vy, x0, y0, 16, mb["ymode"],
                                 have_above, have_left)
        vy[y0 + 1:y0 + 17, x0 + 1:x0 + 17] = np.clip(
            pred, 0, 255).astype(np.uint8)
        cx0, cy0 = mb_col * 8, mb_row * 8
        for plane in (up, vp):
            vv = plane.view()
            pred = _predict_block_np(vv, cx0, cy0, 8, mb["uvmode"],
                                     have_above, have_left)
            vv[cy0 + 1:cy0 + 9, cx0 + 1:cx0 + 9] = np.clip(
                pred, 0, 255).astype(np.uint8)
        return
    if mb["ymode"] == B_PRED:
        # capture the above-MB's above-right pixels BEFORE this MB's
        # reconstruction: right-column subblocks below the top row use
        # these (the spec's stale-above-right rule), not fresh pixels
        tr_base = yp.idx(y0 - 1, x0 + 16)
        top_right4 = list(yp.data[tr_base:tr_base + 4])
        for r in range(4):
            for c in range(4):
                k = r * 4 + c
                sx, sy = x0 + 4 * c, y0 + 4 * r
                if c == 3 and r > 0:
                    ar = top_right4
                else:
                    b = yp.idx(sy - 1, sx + 4)
                    ar = list(yp.data[b:b + 4])
                predict_subblock_plane(yp, sx, sy, mb["bmodes"][k], ar)
                blk = vy[sy + 1:sy + 5, sx + 1:sx + 5]
                vy[sy + 1:sy + 5, sx + 1:sx + 5] = np.clip(
                    blk.astype(np.int64) + res[k], 0, 255).astype(np.uint8)
    else:
        pred = _predict_block_np(vy, x0, y0, 16, mb["ymode"],
                                 have_above, have_left)
        vy[y0 + 1:y0 + 17, x0 + 1:x0 + 17] = np.clip(
            pred + _tile_residuals(res[:16], 4), 0, 255).astype(np.uint8)
    cx0, cy0 = mb_col * 8, mb_row * 8
    for pi, plane in enumerate((up, vp)):
        vv = plane.view()
        pred = _predict_block_np(vv, cx0, cy0, 8, mb["uvmode"],
                                 have_above, have_left)
        vv[cy0 + 1:cy0 + 9, cx0 + 1:cx0 + 9] = np.clip(
            pred + _tile_residuals(res[16 + 4 * pi:20 + 4 * pi], 2),
            0, 255).astype(np.uint8)


def _reconstruct_mb_scalar(yp, up, vp, mb_row, mb_col, mb,
                           ycoeffs, ublocks, vblocks):
    """Original scalar reconstruction — kept verbatim as the parity
    oracle for the vectorized `_reconstruct_mb` (see test_vp8.py)."""
    x0, y0 = mb_col * 16, mb_row * 16
    have_above = mb_row > 0
    have_left = mb_col > 0
    if mb["ymode"] == B_PRED:
        # capture the above-MB's above-right pixels BEFORE this MB's
        # reconstruction: right-column subblocks below the top row use
        # these (the spec's stale-above-right rule), not fresh pixels
        tr_base = yp.idx(y0 - 1, x0 + 16)
        top_right4 = list(yp.data[tr_base:tr_base + 4])
        for r in range(4):
            for c in range(4):
                k = r * 4 + c
                sx, sy = x0 + 4 * c, y0 + 4 * r
                if c == 3 and r > 0:
                    ar = top_right4
                else:
                    b = yp.idx(sy - 1, sx + 4)
                    ar = list(yp.data[b:b + 4])
                predict_subblock_plane(yp, sx, sy, mb["bmodes"][k], ar)
                _add_residual(yp, sx, sy, idct4x4(ycoeffs[k]))
    else:
        predict_block_plane(yp, x0, y0, 16, mb["ymode"], have_above, have_left)
        for r in range(4):
            for c in range(4):
                _add_residual(yp, x0 + 4 * c, y0 + 4 * r,
                              idct4x4(ycoeffs[r * 4 + c]))
    cx0, cy0 = mb_col * 8, mb_row * 8
    for plane, blocks in ((up, ublocks), (vp, vblocks)):
        predict_block_plane(plane, cx0, cy0, 8, mb["uvmode"],
                            have_above, have_left)
        for r in range(2):
            for c in range(2):
                _add_residual(plane, cx0 + 4 * c, cy0 + 4 * r,
                              idct4x4(blocks[r * 2 + c]))


def predict_block_plane(plane: _Plane, x, y, size, mode, have_above, have_left):
    """predict_block over a padded _Plane (border rows make every MB
    'have' neighbors; the have_* flags feed only the DC divisor rule)."""
    predict_block(_OffsetView(plane), plane.stride, x, y, size, mode,
                  have_above, have_left)


def predict_subblock_plane(plane: _Plane, x, y, mode, above_right):
    predict_subblock(_OffsetView(plane), plane.stride, x, y, mode, above_right)


class _OffsetView:
    """Indexable view shifting (y, x) pixel coordinates into the padded
    plane's buffer (origin at data[stride + 1])."""

    __slots__ = ("d", "off")

    def __init__(self, plane: _Plane) -> None:
        self.d = plane.data
        self.off = plane.stride + 1

    def __getitem__(self, i: int) -> int:
        return self.d[i + self.off]

    def __setitem__(self, i: int, v: int) -> None:
        self.d[i + self.off] = v


# ---------------------------------------------------------------------------
# Minimal key-frame encoder (mirror of the decoder; one token partition,
# segmentation off, loop filter level 0)
# ---------------------------------------------------------------------------

_SKIP_PROB = 200


def _quant(c: int, dq: int) -> int:
    a = abs(c)
    lvl = (a + (dq >> 1)) // dq
    if lvl > 2047:
        lvl = 2047
    return -lvl if c < 0 else lvl


def _copy_region(plane: _Plane, x, y, size):
    return [plane.data[plane.idx(y + r, x):plane.idx(y + r, x) + size]
            for r in range(size)]


def _restore_region(plane: _Plane, x, y, saved):
    for r, row in enumerate(saved):
        b = plane.idx(y + r, x)
        plane.data[b:b + len(row)] = row


def _sad_region(plane: _Plane, src: _Plane, x, y, size) -> int:
    s = 0
    for r in range(size):
        bp = plane.idx(y + r, x)
        bs = src.idx(y + r, x)
        for c in range(size):
            s += abs(plane.data[bp + c] - src.data[bs + c])
    return s


def _residual(plane: _Plane, src: _Plane, x, y) -> "list[int]":
    out = [0] * 16
    for r in range(4):
        bp = plane.idx(y + r, x)
        bs = src.idx(y + r, x)
        for c in range(4):
            out[4 * r + c] = src.data[bs + c] - plane.data[bp + c]
    return out


def _src_plane(raw: bytes, w: int, h: int, pw: int, ph: int) -> _Plane:
    """Source pixels in a padded plane, edge-replicated to the padded
    (MB-multiple) size so residuals at frame edges stay small."""
    p = _Plane(pw, ph)
    for y in range(ph):
        sy = y if y < h else h - 1
        b = p.idx(y, 0)
        for x in range(pw):
            sx = x if x < w else w - 1
            p.data[b + x] = raw[sy * w + sx]
    return p


def vp8_encode_yuv(y: bytes, u: bytes, v: bytes, width: int, height: int,
                   q_index: int = 8, use_bpred: bool = False,
                   n_partitions: int = 1) -> bytes:
    """Encode YUV420 planes as a one-partition VP8 key frame. Luma modes
    are best-of-{DC,V,H,TM} per MB (or B_PRED everywhere with per-
    subblock best-of-{B_DC,B_VE,B_HE,B_TM} when use_bpred) against the
    same reconstruction loop the decoder runs, so encoder and decoder
    recon are bit-identical. `n_partitions` ∈ {1, 2, 4, 8} splits the
    token stream by mb_row %% n (the format's decode-parallelism knob;
    exercises the decoder's partition table walk)."""
    import struct as _struct

    if not (0 <= q_index <= 127):
        raise VP8Error("q_index out of [0, 127]")
    if n_partitions not in (1, 2, 4, 8):
        raise VP8Error("n_partitions must be 1, 2, 4, or 8")
    mb_cols = (width + 15) // 16
    mb_rows = (height + 15) // 16
    cw, ch = (width + 1) // 2, (height + 1) // 2
    ysrc = _src_plane(y, width, height, mb_cols * 16, mb_rows * 16)
    usrc = _src_plane(u, cw, ch, mb_cols * 8, mb_rows * 8)
    vsrc = _src_plane(v, cw, ch, mb_cols * 8, mb_rows * 8)
    yp = _Plane(mb_cols * 16, mb_rows * 16)
    up = _Plane(mb_cols * 8, mb_rows * 8)
    vp = _Plane(mb_cols * 8, mb_rows * 8)
    dq = dequant_factors(q_index)

    hdr = BoolEncoder()
    hdr.write_literal(0, 1)   # color space
    hdr.write_literal(0, 1)   # clamping
    hdr.write_literal(0, 1)   # segmentation off
    hdr.write_literal(0, 1)   # filter type
    hdr.write_literal(0, 6)   # filter level 0 (exact decode w/o deblock)
    hdr.write_literal(0, 3)   # sharpness
    hdr.write_literal(0, 1)   # lf deltas off
    hdr.write_literal({1: 0, 2: 1, 4: 2, 8: 3}[n_partitions], 2)
    hdr.write_literal(q_index, 7)
    for _ in range(5):
        hdr.write_literal(0, 1)  # no quantizer deltas
    hdr.write_literal(0, 1)   # refresh entropy
    for t in range(4):
        for b in range(8):
            for c in range(3):
                for n in range(11):
                    hdr.write(0, COEF_UPDATE_PROBS[t][b][c][n])
    hdr.write_literal(1, 1)   # mb_no_coeff_skip enabled
    hdr.write_literal(_SKIP_PROB, 8)

    toks = [BoolEncoder() for _ in range(n_partitions)]
    above_y = [0] * (mb_cols * 4)
    above_u = [0] * (mb_cols * 2)
    above_v = [0] * (mb_cols * 2)
    above_y2 = [0] * mb_cols
    above_sub = [[B_DC_PRED] * 4 for _ in range(mb_cols)]
    for mb_row in range(mb_rows):
        left_y = [0] * 4
        left_u = [0] * 2
        left_v = [0] * 2
        left_y2 = 0
        left_sub = [B_DC_PRED] * 4
        tok = toks[mb_row % n_partitions]
        for mb_col in range(mb_cols):
            x0, y0 = mb_col * 16, mb_row * 16
            have_above, have_left = mb_row > 0, mb_col > 0
            # ---- luma mode choice + residual quantization ----
            if use_bpred:
                ymode = B_PRED
                bmodes = [0] * 16
                ylevels = [[0] * 16 for _ in range(16)]
                tr_base = yp.idx(y0 - 1, x0 + 16)
                top_right4 = list(yp.data[tr_base:tr_base + 4])
                for r in range(4):
                    for c in range(4):
                        k = r * 4 + c
                        sx, sy = x0 + 4 * c, y0 + 4 * r
                        if c == 3 and r > 0:
                            ar = top_right4
                        else:
                            b = yp.idx(sy - 1, sx + 4)
                            ar = list(yp.data[b:b + 4])
                        best, best_sad = B_DC_PRED, None
                        for cand in (B_DC_PRED, B_VE_PRED, B_HE_PRED,
                                     B_TM_PRED):
                            saved = _copy_region(yp, sx, sy, 4)
                            predict_subblock_plane(yp, sx, sy, cand, ar)
                            sad = _sad_region(yp, ysrc, sx, sy, 4)
                            _restore_region(yp, sx, sy, saved)
                            if best_sad is None or sad < best_sad:
                                best, best_sad = cand, sad
                        bmodes[k] = best
                        predict_subblock_plane(yp, sx, sy, best, ar)
                        res = _residual(yp, ysrc, sx, sy)
                        co = fdct4x4(res)
                        lv = [_quant(co[i], dq["y1"][0] if i == 0
                                     else dq["y1"][1]) for i in range(16)]
                        ylevels[k] = lv
                        deq = [lv[i] * (dq["y1"][0] if i == 0
                                        else dq["y1"][1]) for i in range(16)]
                        _add_residual(yp, sx, sy, idct4x4(deq))
                y2_levels = None
            else:
                best, best_sad = DC_PRED, None
                for cand in (DC_PRED, V_PRED, H_PRED, TM_PRED):
                    saved = _copy_region(yp, x0, y0, 16)
                    predict_block_plane(yp, x0, y0, 16, cand,
                                        have_above, have_left)
                    sad = _sad_region(yp, ysrc, x0, y0, 16)
                    _restore_region(yp, x0, y0, saved)
                    if best_sad is None or sad < best_sad:
                        best, best_sad = cand, sad
                ymode, bmodes = best, None
                predict_block_plane(yp, x0, y0, 16, ymode,
                                    have_above, have_left)
                ycoeffs = []
                for r in range(4):
                    for c in range(4):
                        res = _residual(yp, ysrc, x0 + 4 * c, y0 + 4 * r)
                        ycoeffs.append(fdct4x4(res))
                dcs = [co[0] for co in ycoeffs]
                wht = fwht4x4(dcs)
                y2_levels = [
                    _quant(wht[i], dq["y2"][0] if i == 0 else dq["y2"][1])
                    for i in range(16)
                ]
                y2_deq = [y2_levels[i] * (dq["y2"][0] if i == 0
                                          else dq["y2"][1]) for i in range(16)]
                dcs_rec = iwht4x4(y2_deq)
                ylevels = []
                for k, co in enumerate(ycoeffs):
                    lv = [0] + [_quant(co[i], dq["y1"][1])
                                for i in range(1, 16)]
                    ylevels.append(lv)
                    deq = [dcs_rec[k]] + [lv[i] * dq["y1"][1]
                                          for i in range(1, 16)]
                    _add_residual(yp, x0 + 4 * (k % 4), y0 + 4 * (k // 4),
                                  idct4x4(deq))
            # ---- chroma mode + residuals ----
            cx0, cy0 = mb_col * 8, mb_row * 8
            bestc, bestc_sad = DC_PRED, None
            for cand in (DC_PRED, V_PRED, H_PRED, TM_PRED):
                su = _copy_region(up, cx0, cy0, 8)
                sv = _copy_region(vp, cx0, cy0, 8)
                predict_block_plane(up, cx0, cy0, 8, cand,
                                    have_above, have_left)
                predict_block_plane(vp, cx0, cy0, 8, cand,
                                    have_above, have_left)
                sad = (_sad_region(up, usrc, cx0, cy0, 8)
                       + _sad_region(vp, vsrc, cx0, cy0, 8))
                _restore_region(up, cx0, cy0, su)
                _restore_region(vp, cx0, cy0, sv)
                if bestc_sad is None or sad < bestc_sad:
                    bestc, bestc_sad = cand, sad
            uvmode = bestc
            ulevels, vlevels = [], []
            for plane, srcp, levels in ((up, usrc, ulevels),
                                        (vp, vsrc, vlevels)):
                predict_block_plane(plane, cx0, cy0, 8, uvmode,
                                    have_above, have_left)
                for r in range(2):
                    for c in range(2):
                        res = _residual(plane, srcp, cx0 + 4 * c, cy0 + 4 * r)
                        co = fdct4x4(res)
                        lv = [_quant(co[i], dq["uv"][0] if i == 0
                                     else dq["uv"][1]) for i in range(16)]
                        levels.append(lv)
                        deq = [lv[i] * (dq["uv"][0] if i == 0
                                        else dq["uv"][1]) for i in range(16)]
                        _add_residual(plane, cx0 + 4 * c, cy0 + 4 * r,
                                      idct4x4(deq))
            # ---- skip decision + mode bits ----
            has_y2 = ymode != B_PRED
            all_zero = all(not any(lv) for lv in ylevels) and \
                all(not any(lv) for lv in ulevels) and \
                all(not any(lv) for lv in vlevels) and \
                (y2_levels is None or not any(y2_levels))
            skip = 1 if all_zero else 0
            hdr.write(skip, _SKIP_PROB)
            hdr.write_tree(KF_YMODE_TREE, KF_YMODE_PROB, ymode)
            if ymode == B_PRED:
                for r in range(4):
                    for c in range(4):
                        k = r * 4 + c
                        a = above_sub[mb_col][c] if r == 0 \
                            else bmodes[(r - 1) * 4 + c]
                        l = left_sub[r] if c == 0 else bmodes[k - 1]  # noqa: E741
                        hdr.write_tree(BMODE_TREE, KF_BMODE_PROBS[a][l],
                                       bmodes[k])
                above_sub[mb_col] = bmodes[12:16]
                left_sub = [bmodes[3], bmodes[7], bmodes[11], bmodes[15]]
            else:
                bm = _MODE_TO_BMODE[ymode]
                above_sub[mb_col] = [bm] * 4
                left_sub = [bm] * 4
            hdr.write_tree(UV_MODE_TREE, KF_UV_MODE_PROB, uvmode)
            # ---- token write (mirrors decoder context discipline) ----
            if skip:
                for i in range(4):
                    above_y[mb_col * 4 + i] = 0
                    left_y[i] = 0
                for i in range(2):
                    above_u[mb_col * 2 + i] = 0
                    left_u[i] = 0
                    above_v[mb_col * 2 + i] = 0
                    left_v[i] = 0
                if has_y2:
                    above_y2[mb_col] = 0
                    left_y2 = 0
            else:
                ytype, first = (0, 1) if has_y2 else (3, 0)
                if has_y2:
                    ctx = above_y2[mb_col] + left_y2
                    nz = _encode_coeffs(tok, DEFAULT_COEF_PROBS[1], 0,
                                        y2_levels, ctx)
                    above_y2[mb_col] = left_y2 = nz
                for r in range(4):
                    for c in range(4):
                        k = r * 4 + c
                        ctx = above_y[mb_col * 4 + c] + left_y[r]
                        nz = _encode_coeffs(tok, DEFAULT_COEF_PROBS[ytype],
                                            first, ylevels[k], ctx)
                        above_y[mb_col * 4 + c] = left_y[r] = nz
                for levels, above_c, left_c in (
                    (ulevels, above_u, left_u), (vlevels, above_v, left_v)
                ):
                    for r in range(2):
                        for c in range(2):
                            ctx = above_c[mb_col * 2 + c] + left_c[r]
                            nz = _encode_coeffs(tok, DEFAULT_COEF_PROBS[2], 0,
                                                levels[r * 2 + c], ctx)
                            above_c[mb_col * 2 + c] = left_c[r] = nz
        yp.pad_rows(mb_row * 16, 16)
        up.pad_rows(mb_row * 8, 8)
        vp.pad_rows(mb_row * 8, 8)

    part1 = hdr.bytes()
    token_parts = [t.bytes() for t in toks]
    # (n-1) little-endian 3-byte sizes precede the concatenated token
    # partitions; the last partition's size is implied by the frame end
    sizes = b"".join(
        bytes((len(tp) & 0xFF, (len(tp) >> 8) & 0xFF, (len(tp) >> 16) & 0xFF))
        for tp in token_parts[:-1]
    )
    tag = (0) | (1 << 4) | (len(part1) << 5)  # keyframe, show_frame
    head = bytes((tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF))
    head += b"\x9d\x01\x2a"
    head += _struct.pack("<HH", width & 0x3FFF, height & 0x3FFF)
    return head + part1 + sizes + b"".join(token_parts)


# ---------------------------------------------------------------------------
# RGB ↔ YUV420 (BT.601 limited range — the WebP-lossy convention) with
# 2×2 box-average downsampling / nearest-neighbor upsampling. The chroma
# resampling choice is presentation, not bitstream: libwebp's fancy
# upsampler would produce slightly different RGB from identical YUV.
# ---------------------------------------------------------------------------

def rgb_to_yuv420(rgb: bytes, w: int, h: int):
    cw, ch = (w + 1) // 2, (h + 1) // 2
    y = bytearray(w * h)
    u = bytearray(cw * ch)
    v = bytearray(cw * ch)
    usum = [[0, 0] for _ in range(cw * ch)]
    vsum = [[0, 0] for _ in range(cw * ch)]
    for yy in range(h):
        for x in range(w):
            i = 3 * (yy * w + x)
            r, g, b = rgb[i], rgb[i + 1], rgb[i + 2]
            y[yy * w + x] = _clamp255(((66 * r + 129 * g + 25 * b + 128) >> 8) + 16)
            ci = (yy // 2) * cw + (x // 2)
            usum[ci][0] += ((-38 * r - 74 * g + 112 * b + 128) >> 8) + 128
            usum[ci][1] += 1
            vsum[ci][0] += ((112 * r - 94 * g - 18 * b + 128) >> 8) + 128
            vsum[ci][1] += 1
    for i in range(cw * ch):
        u[i] = _clamp255((usum[i][0] + usum[i][1] // 2) // usum[i][1])
        v[i] = _clamp255((vsum[i][0] + vsum[i][1] // 2) // vsum[i][1])
    return bytes(y), bytes(u), bytes(v)


def yuv420_to_rgb(y: bytes, u: bytes, v: bytes, w: int, h: int) -> bytes:
    """Vectorized BT.601 full-swing YUV420→RGB24; bit-exact twin of
    `_yuv420_to_rgb_scalar` (numpy int32 `>>` is the same arithmetic
    shift; clip after shift matches `_clamp255`)."""
    cw, ch = (w + 1) // 2, (h + 1) // 2
    Y = np.frombuffer(bytes(y), np.uint8).reshape(h, w).astype(np.int32)
    rows, cols = np.arange(h) // 2, np.arange(w) // 2
    U = np.frombuffer(bytes(u), np.uint8).reshape(ch, cw).astype(
        np.int32)[rows][:, cols]
    V = np.frombuffer(bytes(v), np.uint8).reshape(ch, cw).astype(
        np.int32)[rows][:, cols]
    cy = 298 * (Y - 16) + 128
    d = U - 128
    e = V - 128
    out = np.empty((h, w, 3), dtype=np.uint8)
    out[:, :, 0] = np.clip((cy + 409 * e) >> 8, 0, 255)
    out[:, :, 1] = np.clip((cy - 100 * d - 208 * e) >> 8, 0, 255)
    out[:, :, 2] = np.clip((cy + 516 * d) >> 8, 0, 255)
    return out.tobytes()


def _yuv420_to_rgb_scalar(y: bytes, u: bytes, v: bytes,
                          w: int, h: int) -> bytes:
    """Original scalar conversion — the parity oracle for
    `yuv420_to_rgb` (see test_vp8.py)."""
    cw = (w + 1) // 2
    out = bytearray(3 * w * h)
    for yy in range(h):
        for x in range(w):
            cy = y[yy * w + x] - 16
            ci = (yy // 2) * cw + (x // 2)
            d = u[ci] - 128
            e = v[ci] - 128
            i = 3 * (yy * w + x)
            out[i] = _clamp255((298 * cy + 409 * e + 128) >> 8)
            out[i + 1] = _clamp255((298 * cy - 100 * d - 208 * e + 128) >> 8)
            out[i + 2] = _clamp255((298 * cy + 516 * d + 128) >> 8)
    return bytes(out)


def vp8_encode(rgb: bytes, width: int, height: int, q_index: int = 8,
               use_bpred: bool = False) -> bytes:
    """RGB24 → VP8 key-frame bitstream (the 'VP8 ' chunk payload)."""
    if len(rgb) != 3 * width * height:
        raise VP8Error("rgb length != 3*w*h")
    y, u, v = rgb_to_yuv420(rgb, width, height)
    return vp8_encode_yuv(y, u, v, width, height, q_index, use_bpred)


def vp8_decode_rgb(data: bytes):
    """VP8 key-frame bitstream → (width, height, 3, rgb_bytes)."""
    w, h, y, u, v = vp8_decode_yuv(data)
    return w, h, 3, yuv420_to_rgb(y, u, v, w, h)
