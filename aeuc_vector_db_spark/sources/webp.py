"""Pure-stdlib WebP codec: lossless (VP8L) and lossy (VP8 key frame).

Decodes the lossless half of WebP for REAL from the public bitstream
spec (RFC 9649 / WebP lossless bitstream specification): LSB-first bit
reading, canonical prefix codes (simple and code-length-coded forms,
incl. repeat codes 16/17/18 and the optional max-symbol cap), color
cache, LZ77 backward references with the 2D distance-plane mapping,
meta prefix codes, and all four transforms (predictor ×14 modes,
cross-color, subtract-green, color-indexing incl. sub-byte pixel
bundling). Lossy 'VP8 ' frames decode through the round-8 pure-Python
VP8 intra codec (sources/vp8.py — bool coder, token trees, inverse
DCT/WHT, intra prediction; see its table-fidelity note for the
external-interop caveat). Only VP8 *inter* frames remain
NotImplementedError (reference buffers — the video stub class).

A minimal encoder (`webp_encode`) emits transform-free fixed-8-bit-code
VP8L streams for tests and corpus builders; round-trip equality pins
the decoder's literal path, and handcrafted streams in
tests/test_multimodal.py pin the cache/LZ77/transform paths.

Reference analog: none — the reference has no multimodal surface at
all; this closes the WebP item of charter extension E5.
"""

from __future__ import annotations

import struct

# order in which code-length code lengths are stored (spec §)
_CLC_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

#: 2D distance-plane table: plane codes 1..120 map to (dx, dy) pixel
#: offsets. The spec's explicit 120-entry list follows a generative
#: rule — candidates are dy=0 with dx∈[1,8] plus dy∈[1,7] with
#: dx∈[-7,8], ordered by squared distance, ties by larger dy first,
#: then positive dx before negative — the table head is pinned against
#: the spec's own listing in tests/test_multimodal.py.
_PLANE_OFFSETS = sorted(
    [(dx, 0) for dx in range(1, 9)]
    + [(dx, dy) for dy in range(1, 8) for dx in range(-7, 9)],
    key=lambda p: (p[0] * p[0] + p[1] * p[1], -p[1], -p[0]),
)
assert len(_PLANE_OFFSETS) == 120


class _Bits:
    """LSB-first bit reader over bytes (the VP8L convention)."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def bits(self, n: int) -> int:
        end = self.pos + n
        if (end + 7) // 8 > len(self.data):
            raise ValueError("VP8L: bitstream truncated")
        v = 0
        for i in range(n):
            p = self.pos + i
            v |= ((self.data[p >> 3] >> (p & 7)) & 1) << i
        self.pos = end
        return v

    def bit(self) -> int:
        p = self.pos
        if p >> 3 >= len(self.data):
            raise ValueError("VP8L: bitstream truncated")
        self.pos = p + 1
        return (self.data[p >> 3] >> (p & 7)) & 1


class _Prefix:
    """Canonical prefix code: DEFLATE-style assignment (codes ascend by
    (length, symbol)), read MSB-of-code-first from the LSB-first stream.
    A code with exactly one used symbol is 'trivial' — zero bits read."""

    def __init__(self, lengths: list[int]) -> None:
        used = [(ln, sym) for sym, ln in enumerate(lengths) if ln > 0]
        if not used:
            raise ValueError("VP8L: empty prefix code")
        if len(used) == 1:
            self.trivial = used[0][1]
            return
        self.trivial = None
        kraft = sum(2 ** -ln for ln, _ in used)
        if abs(kraft - 1.0) > 1e-9:
            raise ValueError("VP8L: invalid (non-complete) prefix code")
        self.table: dict[tuple[int, int], int] = {}
        code = 0
        prev_len = None
        for ln, sym in sorted(used):
            if prev_len is not None:
                code = (code + 1) << (ln - prev_len)
            self.table[(ln, code)] = sym
            prev_len = ln
        self.max_len = max(ln for ln, _ in used)

    def read(self, br: _Bits) -> int:
        if self.trivial is not None:
            return self.trivial
        code = 0
        for ln in range(1, self.max_len + 1):
            code = (code << 1) | br.bit()
            sym = self.table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("VP8L: invalid prefix code word")


def _read_prefix_code(br: _Bits, alphabet_size: int) -> _Prefix:
    """One prefix code: 'simple' (1-2 symbols inline) or normal
    (code-length-coded lengths with repeats and optional max-symbol)."""
    if br.bit():  # simple
        num = br.bit() + 1
        if br.bit():
            first = br.bits(8)
        else:
            first = br.bit()
        lengths = [0] * alphabet_size
        if num == 1:
            if first >= alphabet_size:
                raise ValueError("VP8L: simple code symbol out of range")
            lengths[first] = 1
        else:
            second = br.bits(8)
            if first >= alphabet_size or second >= alphabet_size:
                raise ValueError("VP8L: simple code symbol out of range")
            if first == second:
                raise ValueError("VP8L: duplicate simple code symbols")
            lengths[first] = lengths[second] = 1
        return _Prefix(lengths)
    # normal: a prefix code over code lengths 0..18
    num_codes = 4 + br.bits(4)
    clc = [0] * 19
    for i in range(num_codes):
        clc[_CLC_ORDER[i]] = br.bits(3)
    cl_code = _Prefix(clc) if sum(clc) else None
    if cl_code is None:
        raise ValueError("VP8L: empty code-length code")
    if br.bit():
        length_nbits = 2 + 2 * br.bits(3)
        max_symbol = 2 + br.bits(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev = 8  # default repeat length when none seen yet (spec)
    i = 0
    while i < alphabet_size:
        if max_symbol <= 0:
            break
        max_symbol -= 1
        s = cl_code.read(br)
        if s < 16:
            lengths[i] = s
            i += 1
            if s:
                prev = s
        else:
            if s == 16:
                rep, fill = 3 + br.bits(2), prev
            elif s == 17:
                rep, fill = 3 + br.bits(3), 0
            else:
                rep, fill = 11 + br.bits(7), 0
            if i + rep > alphabet_size:
                raise ValueError("VP8L: code-length repeat overruns alphabet")
            for _ in range(rep):
                lengths[i] = fill
                i += 1
    return _Prefix(lengths)


def _lz77_value(br: _Bits, code: int) -> int:
    """LZ77 length/distance prefix-coded value (shared scheme)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.bits(extra) + 1


def _plane_to_dist(code: int, xsize: int) -> int:
    if code > 120:
        return code - 120
    dx, dy = _PLANE_OFFSETS[code - 1]
    return max(1, dy * xsize + dx)


_HASH_MUL = 0x1E35A7BD


def _decode_pixels(
    br: _Bits,
    w: int,
    h: int,
    groups: list[list[_Prefix]],
    cache_bits: int,
    meta: tuple[list[int], int, int] | None,
) -> list[int]:
    """The entropy-coded pixel stream: literals, LZ77 copies, cache hits.
    Returns w*h ARGB ints in row-major order."""
    cache = [0] * (1 << cache_bits) if cache_bits else None
    shift = 32 - cache_bits if cache_bits else 0
    out: list[int] = []
    n = w * h
    meta_px, meta_w, meta_bits = meta if meta else (None, 0, 0)
    g = groups[0]
    while len(out) < n:
        pos = len(out)
        if meta_px is not None:
            x, y = pos % w, pos // w
            mp = meta_px[(y >> meta_bits) * meta_w + (x >> meta_bits)]
            gid = (mp >> 8) & 0xFFFF
            if gid >= len(groups):
                raise ValueError("VP8L: meta prefix group out of range")
            g = groups[gid]
        s = g[0].read(br)
        if s < 256:
            r = g[1].read(br)
            b = g[2].read(br)
            a = g[3].read(br)
            px = (a << 24) | (r << 16) | (s << 8) | b
            out.append(px)
            if cache is not None:
                cache[(_HASH_MUL * px & 0xFFFFFFFF) >> shift] = px
        elif s < 280:
            length = _lz77_value(br, s - 256)
            dist = _plane_to_dist(_lz77_value(br, g[4].read(br)), w)
            if dist > pos or pos + length > n:
                raise ValueError("VP8L: LZ77 reference out of range")
            for i in range(length):
                px = out[pos - dist + i]
                out.append(px)
                if cache is not None:
                    cache[(_HASH_MUL * px & 0xFFFFFFFF) >> shift] = px
        else:
            if cache is None:
                raise ValueError("VP8L: cache hit without a color cache")
            out.append(cache[s - 280])
    return out


def _decode_image(br: _Bits, w: int, h: int, allow_meta: bool) -> list[int]:
    """One entropy-coded image: color-cache bit, optional meta prefix
    image (top level only), prefix code groups, pixel stream."""
    cache_bits = 0
    if br.bit():
        cache_bits = br.bits(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("VP8L: color cache bits out of range")
    meta = None
    n_groups = 1
    if allow_meta and br.bit():
        meta_bits = br.bits(3) + 2
        mw = (w + (1 << meta_bits) - 1) >> meta_bits
        mh = (h + (1 << meta_bits) - 1) >> meta_bits
        meta_px = _decode_image(br, mw, mh, allow_meta=False)
        meta = (meta_px, mw, meta_bits)
        n_groups = max(((p >> 8) & 0xFFFF) for p in meta_px) + 1
    green_alpha = 256 + 24 + ((1 << cache_bits) if cache_bits else 0)
    groups = []
    for _ in range(n_groups):
        groups.append(
            [
                _read_prefix_code(br, green_alpha),
                _read_prefix_code(br, 256),
                _read_prefix_code(br, 256),
                _read_prefix_code(br, 256),
                _read_prefix_code(br, 40),
            ]
        )
    return _decode_pixels(br, w, h, groups, cache_bits, meta)


# -- inverse transforms --------------------------------------------------


def _avg2(a: int, b: int) -> int:
    return (
        ((((a >> 24) + (b >> 24)) >> 1) << 24)
        | (((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) >> 1) << 16)
        | (((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) >> 1) << 8)
        | (((a & 0xFF) + (b & 0xFF)) >> 1)
    )


def _select(left: int, top: int, tl: int) -> int:
    p = [
        (left >> s & 0xFF) + (top >> s & 0xFF) - (tl >> s & 0xFF)
        for s in (24, 16, 8, 0)
    ]
    pl = sum(abs(pc - (left >> s & 0xFF)) for pc, s in zip(p, (24, 16, 8, 0)))
    pt = sum(abs(pc - (top >> s & 0xFF)) for pc, s in zip(p, (24, 16, 8, 0)))
    return left if pl < pt else top


def _clamp(v: int) -> int:
    return 0 if v < 0 else 255 if v > 255 else v


def _cas_full(a: int, b: int, c: int) -> int:
    out = 0
    for s in (24, 16, 8, 0):
        out |= _clamp((a >> s & 0xFF) + (b >> s & 0xFF) - (c >> s & 0xFF)) << s
    return out


def _cas_half(a: int, b: int) -> int:
    # RFC 9649 §4.4 / libwebp ClampAddSubtractHalf: (a - b) / 2 uses C
    # division, which truncates TOWARD ZERO — Python's // floors, which
    # differs by one for odd negative differences (e.g. -3: C → -1,
    # floor → -2) and would decode real libwebp mode-13 blocks to wrong
    # pixels
    out = 0
    for s in (24, 16, 8, 0):
        av, bv = a >> s & 0xFF, b >> s & 0xFF
        d = av - bv
        half = (abs(d) >> 1) if d >= 0 else -(abs(d) >> 1)
        out |= _clamp(av + half) << s
    return out


def _add_px(a: int, b: int) -> int:
    return (
        ((((a >> 24) + (b >> 24)) & 0xFF) << 24)
        | (((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) & 0xFF) << 16)
        | (((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) & 0xFF) << 8)
        | (((a & 0xFF) + (b & 0xFF)) & 0xFF)
    )


def _inv_predictor(px: list[int], w: int, h: int, bits: int, sub: list[int]) -> None:
    """Residuals → pixels, block-wise predictor modes (14). Edge rules:
    (0,0) is mode 0 (opaque black); the rest of row 0 predicts from L,
    of column 0 from T; the top-right neighbor of the rightmost column
    is the first pixel of the current row (contiguous-memory rule)."""
    bw = (w + (1 << bits) - 1) >> bits
    for y in range(h):
        for x in range(w):
            i = y * w + x
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = px[i - 1]
            elif x == 0:
                pred = px[i - w]
            else:
                mode = (sub[(y >> bits) * bw + (x >> bits)] >> 8) & 0xFF
                left, top, tl = px[i - 1], px[i - w], px[i - w - 1]
                tr = px[i - w + 1] if x < w - 1 else px[y * w]
                if mode == 0:
                    pred = 0xFF000000
                elif mode == 1:
                    pred = left
                elif mode == 2:
                    pred = top
                elif mode == 3:
                    pred = tr
                elif mode == 4:
                    pred = tl
                elif mode == 5:
                    pred = _avg2(_avg2(left, tr), top)
                elif mode == 6:
                    pred = _avg2(left, tl)
                elif mode == 7:
                    pred = _avg2(left, top)
                elif mode == 8:
                    pred = _avg2(tl, top)
                elif mode == 9:
                    pred = _avg2(top, tr)
                elif mode == 10:
                    pred = _avg2(_avg2(left, tl), _avg2(top, tr))
                elif mode == 11:
                    pred = _select(left, top, tl)
                elif mode == 12:
                    pred = _cas_full(left, top, tl)
                elif mode == 13:
                    pred = _cas_half(_avg2(left, top), tl)
                else:
                    raise ValueError(f"VP8L: predictor mode {mode} out of range")
            px[i] = _add_px(px[i], pred)


def _i8(v: int) -> int:
    return v - 256 if v >= 128 else v


def _inv_color_transform(
    px: list[int], w: int, h: int, bits: int, sub: list[int]
) -> None:
    """Inverse cross-color: red += (g2r·g)>>5; blue += (g2b·g)>>5 +
    (r2b·red')>>5 — multipliers are signed 3.5 fixed-point stored in the
    transform image's (blue, green, red) channels."""
    bw = (w + (1 << bits) - 1) >> bits
    for y in range(h):
        for x in range(w):
            i = y * w + x
            cm = sub[(y >> bits) * bw + (x >> bits)]
            g2r = _i8(cm & 0xFF)
            g2b = _i8((cm >> 8) & 0xFF)
            r2b = _i8((cm >> 16) & 0xFF)
            p = px[i]
            g = (p >> 8) & 0xFF
            r = ((p >> 16) & 0xFF) + ((g2r * _i8(g)) >> 5) & 0xFF
            b = ((p & 0xFF) + ((g2b * _i8(g)) >> 5) + ((r2b * _i8(r)) >> 5)) & 0xFF
            px[i] = (p & 0xFF00FF00) | (r << 16) | b


def _inv_subtract_green(px: list[int]) -> None:
    for i, p in enumerate(px):
        g = (p >> 8) & 0xFF
        r = (((p >> 16) & 0xFF) + g) & 0xFF
        b = ((p & 0xFF) + g) & 0xFF
        px[i] = (p & 0xFF00FF00) | (r << 16) | b


def _inv_palette(
    px: list[int], packed_w: int, h: int, orig_w: int, palette: list[int], pbits: int
) -> list[int]:
    """Color-index → palette lookup, unpacking sub-byte pixel bundling
    (palettes ≤16 colors pack 2/4/8 indices into one green byte)."""
    out = [0] * (orig_w * h)
    bpp = 8 >> pbits
    mask = (1 << bpp) - 1 if pbits else 0xFF
    per = 1 << pbits
    for y in range(h):
        for x in range(orig_w):
            src = px[y * packed_w + (x >> pbits)]
            idx = ((src >> 8) & 0xFF) >> ((x % per) * bpp) & mask if pbits else (
                (src >> 8) & 0xFF
            )
            if idx >= len(palette):
                raise ValueError("VP8L: palette index out of range")
            out[y * orig_w + x] = palette[idx]
    return out


# -- public API ----------------------------------------------------------


def vp8l_decode(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a raw VP8L stream → (width, height, 4, RGBA bytes)."""
    br = _Bits(data)
    if br.bits(8) != 0x2F:
        raise ValueError("VP8L: bad signature byte")
    w = br.bits(14) + 1
    h = br.bits(14) + 1
    br.bit()  # alpha-used hint
    if br.bits(3) != 0:
        raise ValueError("VP8L: unsupported stream version")
    if w * h > 16_000_000:
        raise ValueError("VP8L: image too large for the pure-Python decoder")
    transforms: list[tuple] = []
    seen: set[int] = set()
    xsize = w
    while br.bit():
        t = br.bits(2)
        if t in seen:
            raise ValueError("VP8L: transform repeated")
        seen.add(t)
        if t == 3:  # color indexing
            n_colors = br.bits(8) + 1
            pal = _decode_image(br, n_colors, 1, allow_meta=False)
            for i in range(1, n_colors):
                pal[i] = _add_px(pal[i], pal[i - 1])
            pbits = 3 if n_colors <= 2 else 2 if n_colors <= 4 else (
                1 if n_colors <= 16 else 0
            )
            transforms.append(("palette", pal, pbits, xsize))
            xsize = (xsize + (1 << pbits) - 1) >> pbits
        elif t in (0, 1):  # predictor / cross-color
            size_bits = br.bits(3) + 2
            bw = (xsize + (1 << size_bits) - 1) >> size_bits
            bh = (h + (1 << size_bits) - 1) >> size_bits
            sub = _decode_image(br, bw, bh, allow_meta=False)
            transforms.append(("predictor" if t == 0 else "color", size_bits, sub))
        else:
            transforms.append(("subgreen",))
    px = _decode_image(br, xsize, h, allow_meta=True)
    for tr in reversed(transforms):
        if tr[0] == "palette":
            _, pal, pbits, orig_w = tr
            px = _inv_palette(px, xsize, h, orig_w, pal, pbits)
            xsize = orig_w
        elif tr[0] == "subgreen":
            _inv_subtract_green(px)
        elif tr[0] == "predictor":
            _inv_predictor(px, xsize, h, tr[1], tr[2])
        else:
            _inv_color_transform(px, xsize, h, tr[1], tr[2])
    rgba = bytearray(xsize * h * 4)
    for i, p in enumerate(px):
        rgba[4 * i] = (p >> 16) & 0xFF
        rgba[4 * i + 1] = (p >> 8) & 0xFF
        rgba[4 * i + 2] = p & 0xFF
        rgba[4 * i + 3] = (p >> 24) & 0xFF
    return xsize, h, 4, bytes(rgba)


#: RIFF chunk marking an engine-encoded lossy stream. The VP8 decoder's
#: three empirical probability tables are in-repo placeholders (see
#: sources/vp8.py); a stream from any OTHER encoder desyncs the
#: arithmetic decoder into silently wrong pixels rather than an error,
#: so only marked streams (or a session that has loaded the real RFC
#: tables) take the real-decode path (ADVICE r8: fail loud, not wrong).
ENGINE_MARKER_TAG = b"AEUC"
_ENGINE_MARKER_CHUNK = ENGINE_MARKER_TAG + struct.pack("<I", 4) + b"VP8E"


def webp_decode(payload: bytes) -> tuple[int, int, int, bytes]:
    """RIFF/WEBP container → VP8L (lossless) or VP8 (lossy key-frame)
    decode. Lossy frames decode for real via sources/vp8.py ONLY when
    the container carries the engine's AEUC marker chunk (everything
    `webp_encode_lossy` emits) or the real RFC probability tables have
    been loaded (`vp8.load_probability_tables`); unmarked external
    lossy streams raise NotImplementedError (declared stub — the
    placeholder tables would desync into silent garbage, see the vp8
    module's table-fidelity note). Malformed bytes raise ValueError
    (error path); VP8 *inter* frames raise NotImplementedError
    (video-style stub).

    Strict-container contract (since round 9): the FULL chunk list is
    validated before any decode — a truncated or malformed chunk AFTER
    the image chunk rejects the container (ValueError) even though the
    image itself would decode. Deliberate: the AEUC marker chunk may
    legally follow the image chunk, so the marker scan must walk the
    whole list anyway, and a container whose tail is garbage is treated
    as corrupt rather than half-trusted. Encoders that emit trailing
    junk past the declared RIFF size are unaffected (the walk stops at
    the RIFF-declared end)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a RIFF/WEBP container")
    pos, end = 12, min(len(payload), 8 + struct.unpack("<I", payload[4:8])[0])
    chunks = []
    while pos + 8 <= end:
        tag = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        if pos + 8 + size > end:
            raise ValueError(f"truncated WEBP chunk {tag!r}")
        chunks.append((tag, pos + 8, size))
        pos += 8 + size + (size & 1)
    engine_marked = any(t == ENGINE_MARKER_TAG for t, _, _ in chunks)
    for tag, off, size in chunks:
        if tag == b"VP8L":
            return vp8l_decode(payload[off : off + size])
        if tag == b"VP8 ":
            from aeuc_vector_db_spark.sources import vp8 as _vp8

            chunk = payload[off : off + size]
            if engine_marked or not _vp8.tables_are_placeholder():
                return _vp8.vp8_decode_rgb(chunk)
            # Structural header parse first, so corrupt bytes keep the
            # ValueError error path and inter frames keep their own
            # stub message; only a well-formed external KEY frame lands
            # on the placeholder-table stub below.
            _vp8._parse_frame_header(chunk)
            raise NotImplementedError(
                "external lossy WebP ('VP8 ' chunk without the engine's "
                "AEUC marker): the decoder's empirical probability "
                "tables are placeholders and an external stream would "
                "desync into silently wrong pixels — declared stub "
                "until vp8.load_probability_tables() installs the "
                "RFC 6386 §13.5/§11.5 values"
            )
    raise ValueError("WEBP container has no VP8L/VP8 chunk")


class _BitWriter:
    """LSB-first bit writer (mirror of _Bits)."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int) -> None:
        self.acc |= (value & ((1 << nbits) - 1)) << self.n
        self.n += nbits
        while self.n >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def write_code(self, code: int, nbits: int) -> None:
        """Prefix code word: MSB of the code goes first."""
        for i in range(nbits - 1, -1, -1):
            self.write((code >> i) & 1, 1)

    def bytes(self) -> bytes:
        out = bytearray(self.buf)
        if self.n:
            out.append(self.acc & 0xFF)
        return bytes(out)


def _write_fixed8_code(bw: _BitWriter, alphabet_size: int) -> None:
    """Emit a normal prefix code whose first 256 symbols all have length
    8 (canonical ⇒ symbol == code) and the rest 0 — a complete code that
    makes every literal byte cost exactly 8 bits."""
    bw.write(0, 1)  # normal (not simple)
    # code-length code over {8, 18}: both length 1
    bw.write(14 - 4, 4)  # read 14 entries of _CLC_ORDER (covers 18 and 8)
    for i in range(14):
        bw.write(1 if _CLC_ORDER[i] in (8, 18) else 0, 3)
    bw.write(0, 1)  # no max-symbol cap
    # canonical over {8:len1, 18:len1} → code(8)=0, code(18)=1
    for _ in range(256):
        bw.write_code(0, 1)  # length 8, ×256
    rest = alphabet_size - 256
    while rest > 0:
        rep = min(rest, 138)
        if rep < 11:  # tail too short for code 18 — pad with single zeros
            zero_needs = rep
            # code-length 0 is not in our code-length alphabet; instead
            # stretch: emit 18 with the minimum run and let the reader
            # stop at the alphabet edge (guarded above) — runs <11 never
            # happen for the alphabets used here (24 or 24+cache).
            raise ValueError(f"fixed8 writer: unsupported tail {zero_needs}")
        bw.write_code(1, 1)
        bw.write(rep - 11, 7)  # repeat-zero run
        rest -= rep


def _write_trivial_code(bw: _BitWriter, symbol: int) -> None:
    """Simple prefix code with one symbol — zero bits per read."""
    bw.write(1, 1)  # simple
    bw.write(0, 1)  # one symbol
    if symbol < 2:
        bw.write(0, 1)  # 1-bit first symbol
        bw.write(symbol, 1)
    else:
        bw.write(1, 1)  # 8-bit first symbol
        bw.write(symbol, 8)


def vp8l_encode(pixels: bytes, width: int, height: int, channels: int = 3) -> bytes:
    """Minimal VP8L stream: no transforms, no cache, no meta, every
    channel a fixed 8-bit code. ~4 bytes/pixel — for tests, not size."""
    if width < 1 or height < 1 or width > 16384 or height > 16384:
        raise ValueError("vp8l_encode: dimensions out of range")
    if channels not in (3, 4) or len(pixels) != width * height * channels:
        raise ValueError("vp8l_encode: bad pixel buffer")
    bw = _BitWriter()
    bw.write(0x2F, 8)
    bw.write(width - 1, 14)
    bw.write(height - 1, 14)
    bw.write(1 if channels == 4 else 0, 1)  # alpha hint
    bw.write(0, 3)  # version
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta prefix codes
    _write_fixed8_code(bw, 256 + 24)  # green
    for _ in range(3):  # red, blue, alpha
        _write_fixed8_code(bw, 256)
    _write_trivial_code(bw, 0)  # distance code (never used)
    for i in range(width * height):
        o = i * channels
        r, g, b = pixels[o], pixels[o + 1], pixels[o + 2]
        a = pixels[o + 3] if channels == 4 else 0xFF
        bw.write_code(g, 8)
        bw.write_code(r, 8)
        bw.write_code(b, 8)
        bw.write_code(a, 8)
    return bw.bytes()


def webp_encode(pixels: bytes, width: int, height: int, channels: int = 3) -> bytes:
    """RIFF/WEBP container around a minimal VP8L stream."""
    stream = vp8l_encode(pixels, width, height, channels)
    chunk = b"VP8L" + struct.pack("<I", len(stream)) + stream
    if len(stream) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def webp_encode_lossy(pixels: bytes, width: int, height: int,
                      q_index: int = 8, use_bpred: bool = False) -> bytes:
    """RIFF/WEBP container around a lossy VP8 key-frame stream
    (sources/vp8.py) — RGB only (lossy WebP has no alpha channel
    without an ALPH chunk, which is out of scope)."""
    from aeuc_vector_db_spark.sources.vp8 import vp8_encode

    stream = vp8_encode(pixels, width, height, q_index=q_index,
                        use_bpred=use_bpred)
    chunk = b"VP8 " + struct.pack("<I", len(stream)) + stream
    if len(stream) & 1:
        chunk += b"\x00"
    # engine marker: lets webp_decode accept this stream as decodable
    # while the VP8 probability tables remain placeholders
    chunk = _ENGINE_MARKER_CHUNK + chunk
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
