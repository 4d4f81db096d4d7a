"""Lossless WebP (VP8L), stdlib + numpy: full bitstream decode
(prefix codes, meta-groups, color cache, LZ77 with the 2-D distance
map, all four inverse transforms incl. pixel bundling) conformance-
tested against libwebp in both directions, plus the transform-free
literal encoder make_webp.  Lossy VP8 and the VP8X container stay
library-gated (see the package __init__)."""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# WebP lossless (VP8L) — the format modern crawls serve MOST after
# JPEG, decoded with stdlib + numpy from the public "WebP Lossless
# Bitstream Specification": RIFF walk, LSB-first bit reading,
# canonical prefix codes (simple and code-length-coded, incl. the
# max_symbol short form), meta-prefix groups, color cache, LZ77 over
# ARGB pixels with the 120-entry 2D distance map, and all four
# inverse transforms (predictor with its 14 modes, cross-color,
# subtract-green, color-indexing with sub-byte pixel bundling).
# Lossy WebP (VP8) and the extended container (VP8X) raise into the
# library gate: VP8 is a full boolean-coder video intra-frame —
# H.264-class machinery, same rationale as MP4 pixels above.
# Conformance: the system libwebp (present: libwebp.so.7, ctypes) is
# the third-party oracle in BOTH directions — its encoder output
# (predictor/color/cache-heavy streams) through this decoder, and
# make_webp output through its decoder.

_VP8L_CLC_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

# distance codes 1..120 map to 2D neighborhood offsets (dx, dy)
_VP8L_DIST_MAP = (
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
)


class _Vp8lBitReader:
    """LSB-first bit reader over the VP8L payload."""

    __slots__ = ("d", "p", "acc", "n")

    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.d = data
        self.p = pos
        self.acc = 0
        self.n = 0

    def read(self, nbits: int) -> int:
        while self.n < nbits:
            if self.p >= len(self.d):
                raise ValueError("truncated VP8L stream")
            self.acc |= self.d[self.p] << self.n
            self.p += 1
            self.n += 8
        v = self.acc & ((1 << nbits) - 1)
        self.acc >>= nbits
        self.n -= nbits
        return v


class _Vp8lCode:
    """A canonical prefix code: DEFLATE-style code assignment, bits
    read one at a time building the code MSB-first.  A single-symbol
    code decodes in zero bits (spec: degenerate trees are legal)."""

    __slots__ = ("table", "single")

    def __init__(self, lengths) -> None:
        nz = [(l, s) for s, l in enumerate(lengths) if l]
        if not nz:
            raise ValueError("empty VP8L prefix code")
        if len(nz) == 1:
            self.single = nz[0][1]
            self.table = None
            return
        self.single = None
        if sum(1 << (15 - l) for l, _ in nz) != 1 << 15:
            raise ValueError("VP8L prefix code is not complete")
        bl_count: dict[int, int] = {}
        for l, _ in nz:
            bl_count[l] = bl_count.get(l, 0) + 1
        code = 0
        next_code = {}
        for l in range(1, max(bl_count) + 1):
            code = (code + bl_count.get(l - 1, 0)) << 1
            next_code[l] = code
        table: dict[tuple[int, int], int] = {}
        for sym, l in enumerate(lengths):
            if l:
                table[(l, next_code[l])] = sym
                next_code[l] += 1
        self.table = table

    def decode(self, br: _Vp8lBitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for length in range(1, 16):
            code = (code << 1) | br.read(1)
            sym = self.table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid VP8L prefix code word")


def _vp8l_read_code(br: _Vp8lBitReader, alphabet_size: int) -> _Vp8lCode:
    """One prefix code: the 'simple' 1/2-symbol form or the full
    code-length-coded form with 16/17/18 repeats and the optional
    max_symbol cap."""
    if br.read(1):  # simple
        nsym = br.read(1) + 1
        s0 = br.read(8) if br.read(1) else br.read(1)
        lengths = [0] * alphabet_size
        if s0 >= alphabet_size:
            raise ValueError("VP8L simple-code symbol out of range")
        if nsym == 1:
            lengths[s0] = 1  # degenerate single-symbol code
        else:
            s1 = br.read(8)
            if s1 >= alphabet_size or s1 == s0:
                raise ValueError("VP8L simple-code symbol out of range")
            lengths[s0] = lengths[s1] = 1
        return _Vp8lCode(lengths)
    num_codes = br.read(4) + 4
    clc = [0] * 19
    for i in range(num_codes):
        clc[_VP8L_CLC_ORDER[i]] = br.read(3)
    clc_code = _Vp8lCode(clc)
    if br.read(1):
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
        if max_symbol > alphabet_size:
            raise ValueError("VP8L max_symbol exceeds alphabet")
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev = 8
    i = 0
    while i < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        code = clc_code.decode(br)
        if code < 16:
            lengths[i] = code
            i += 1
            if code:
                prev = code
        else:
            if code == 16:
                rep, val = 3 + br.read(2), prev
            elif code == 17:
                rep, val = 3 + br.read(3), 0
            else:
                rep, val = 11 + br.read(7), 0
            if i + rep > alphabet_size:
                raise ValueError("VP8L code-length repeat overflows alphabet")
            if val:
                for k in range(i, i + rep):
                    lengths[k] = val
            i += rep
    return _Vp8lCode(lengths)


def _vp8l_prefix_value(br: _Vp8lBitReader, code: int) -> int:
    """LZ77 length/distance prefix decode: 4 direct codes then
    exponentially growing extra-bit ranges."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _vp8l_decode_image(br: _Vp8lBitReader, xsize: int, ysize: int,
                       is_level0: bool) -> "np.ndarray":
    """Decode one (possibly sub-resolution) entropy-coded ARGB image;
    level 0 additionally reads/applies transforms and may use
    meta-prefix groups."""
    transforms = []  # (type, xsize-at-read, data) applied inverse in reverse
    if is_level0:
        seen = set()
        while br.read(1):
            t = br.read(2)
            if t in seen:
                raise ValueError("VP8L transform repeated")
            seen.add(t)
            if t in (0, 1):  # PREDICTOR / COLOR
                bits = br.read(3) + 2
                bw = -(-xsize // (1 << bits))
                bh = -(-ysize // (1 << bits))
                data = _vp8l_decode_image(br, bw, bh, False)
                transforms.append((t, xsize, (bits, data)))
            elif t == 2:  # SUBTRACT_GREEN
                transforms.append((t, xsize, None))
            else:  # COLOR_INDEXING
                n_colors = br.read(8) + 1
                pal = _vp8l_decode_image(br, n_colors, 1, False)[0]
                # palette entries are delta-coded per channel (each
                # component accumulates over the previous entry mod 256)
                aa = np.cumsum((pal >> 24) & 0xFF) & 0xFF
                rr = np.cumsum((pal >> 16) & 0xFF) & 0xFF
                gg = np.cumsum((pal >> 8) & 0xFF) & 0xFF
                bb = np.cumsum(pal & 0xFF) & 0xFF
                pal = ((aa << 24) | (rr << 16) | (gg << 8) | bb).astype(np.uint32)
                transforms.append((t, xsize, (n_colors, pal)))
                if n_colors <= 2:
                    xbits = 3
                elif n_colors <= 4:
                    xbits = 2
                elif n_colors <= 16:
                    xbits = 1
                else:
                    xbits = 0
                xsize = -(-xsize // (1 << xbits))
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("bad VP8L color-cache size")
    cache = [0] * (1 << cache_bits) if cache_bits else None
    entropy_image = None
    huffman_bits = 0
    num_groups = 1
    if is_level0 and br.read(1):
        huffman_bits = br.read(3) + 2
        hx = -(-xsize // (1 << huffman_bits))
        hy = -(-ysize // (1 << huffman_bits))
        entropy_image = _vp8l_decode_image(br, hx, hy, False)
        meta = ((entropy_image >> 8) & 0xFFFF).astype(np.int64)
        num_groups = int(meta.max()) + 1
        entropy_image = meta
    green_alpha = 256 + 24 + (1 << cache_bits if cache_bits else 0)
    groups = []
    for _ in range(num_groups):
        groups.append((
            _vp8l_read_code(br, green_alpha),   # green + length + cache
            _vp8l_read_code(br, 256),           # red
            _vp8l_read_code(br, 256),           # blue
            _vp8l_read_code(br, 256),           # alpha
            _vp8l_read_code(br, 40),            # distance
        ))

    n = xsize * ysize
    px = np.zeros(n, dtype=np.uint32)
    pos = 0
    group = groups[0]
    while pos < n:
        if entropy_image is not None:
            y, x = divmod(pos, xsize)
            group = groups[
                int(entropy_image[y >> huffman_bits, x >> huffman_bits])
            ]
        g = group[0].decode(br)
        if g < 256:
            r = group[1].decode(br)
            b = group[2].decode(br)
            a = group[3].decode(br)
            argb = (a << 24) | (r << 16) | (g << 8) | b
            px[pos] = argb
            if cache is not None:
                cache[((argb * 0x1E35A7BD) & 0xFFFFFFFF) >> (32 - cache_bits)] = argb
            pos += 1
        elif g < 280:
            length = _vp8l_prefix_value(br, g - 256)
            dist_code = _vp8l_prefix_value(br, group[4].decode(br))
            if dist_code <= 120:
                dx, dy = _VP8L_DIST_MAP[dist_code - 1]
                dist = dy * xsize + dx
                if dist < 1:
                    dist = 1
            else:
                dist = dist_code - 120
            if dist > pos or pos + length > n:
                raise ValueError("VP8L back-reference out of range")
            for _ in range(length):
                argb = int(px[pos - dist])
                px[pos] = argb
                if cache is not None:
                    cache[((argb * 0x1E35A7BD) & 0xFFFFFFFF) >> (32 - cache_bits)] = argb
                pos += 1
        else:
            if cache is None:
                raise ValueError("VP8L cache reference without a color cache")
            px[pos] = cache[g - 280]
            pos += 1
    img = px.reshape(ysize, xsize)
    for t, orig_xsize, data in reversed(transforms):
        img = _vp8l_inverse_transform(t, orig_xsize, data, img)
    return img


def _vp8l_inverse_transform(t: int, xsize: int, data, img: "np.ndarray") -> "np.ndarray":
    if t == 2:  # subtract-green: add green back to red and blue
        g = (img >> 8) & 0xFF
        r = ((img >> 16) + g) & 0xFF
        b = (img + g) & 0xFF
        return (img & 0xFF00FF00) | (r << 16) | b
    if t == 3:  # color indexing (+ pixel bundling below 16 colors)
        n_colors, pal = data
        if n_colors <= 2:
            xbits = 3
        elif n_colors <= 4:
            xbits = 2
        elif n_colors <= 16:
            xbits = 1
        else:
            xbits = 0
        idx = (img >> 8) & 0xFF  # indices live in the green channel
        if xbits:
            per = 1 << xbits
            width_bits = 8 >> xbits
            cols = []
            for k in range(per):
                cols.append((idx >> (k * width_bits)) & ((1 << width_bits) - 1))
            idx = np.stack(cols, axis=2).reshape(img.shape[0], -1)
            idx = idx[:, :xsize]
        if int(idx.max(initial=0)) >= n_colors:
            raise ValueError("VP8L palette index out of range")
        return pal[idx.astype(np.int64)]
    if t == 1:  # cross-color
        bits, deltas = data
        h, w = img.shape
        out = img.astype(np.int64)
        g2r = ((deltas & 0xFF).astype(np.int64) ^ 0x80) - 0x80  # blue channel
        g2b = (((deltas >> 8) & 0xFF).astype(np.int64) ^ 0x80) - 0x80
        r2b = (((deltas >> 16) & 0xFF).astype(np.int64) ^ 0x80) - 0x80
        by = np.arange(h) >> bits
        bx = np.arange(w) >> bits
        tg2r = g2r[np.ix_(by, bx)]
        tg2b = g2b[np.ix_(by, bx)]
        tr2b = r2b[np.ix_(by, bx)]
        g = ((out >> 8) & 0xFF).astype(np.int64)
        gs = (g ^ 0x80) - 0x80  # as signed int8
        r = (out >> 16) & 0xFF
        r = (r + ((tg2r * gs) >> 5)) & 0xFF
        rs = (r ^ 0x80) - 0x80
        b = out & 0xFF
        b = (b + ((tg2b * gs) >> 5) + ((tr2b * rs) >> 5)) & 0xFF
        return ((out & 0xFF00FF00) | (r << 16) | b).astype(np.uint32)
    # t == 0: predictor — inherently sequential (each pixel depends on
    # decoded neighbors), walked row-by-row in plain Python ints
    bits, modes_img = data
    h, w = img.shape
    modes = ((modes_img >> 8) & 0xFF).astype(np.int64)
    res = img
    out = np.zeros((h, w), dtype=np.uint32)

    def add(p, q):  # per-channel byte add of packed ARGB
        return (
            (((p & 0xFF00FF00) + (q & 0xFF00FF00)) & 0xFF00FF00)
            | (((p & 0x00FF00FF) + (q & 0x00FF00FF)) & 0x00FF00FF)
        )

    def avg2(a, b):
        return (((a ^ b) & 0xFEFEFEFE) >> 1) + (a & b)

    def chan(p):
        return ((p >> 24) & 0xFF, (p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF)

    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = int(out[0, x - 1])  # top row: left
            elif x == 0:
                pred = int(out[y - 1, 0])  # left column: top
            else:
                mode = int(modes[y >> bits, x >> bits])
                left = int(out[y, x - 1])
                top = int(out[y - 1, x])
                tl = int(out[y - 1, x - 1])
                # Rightmost column: the spec's 1-D addressing (pos -
                # width + 1) wraps the "top-right" pixel into the
                # CURRENT row's first pixel out[y, 0], not the row
                # above (verified bit-exact against libwebp).
                tr = int(out[y - 1, x + 1]) if x + 1 < w else int(out[y, 0])
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
                    pred = avg2(avg2(left, tr), top)
                elif mode == 6:
                    pred = avg2(left, tl)
                elif mode == 7:
                    pred = avg2(left, top)
                elif mode == 8:
                    pred = avg2(tl, top)
                elif mode == 9:
                    pred = avg2(top, tr)
                elif mode == 10:
                    pred = avg2(avg2(left, tl), avg2(top, tr))
                elif mode == 11:
                    # Select: the full gradient L+T-TL, then whichever
                    # of L/T it is closer to (component-wise L1)
                    pl = pt = 0
                    for cl, ct, ctl in zip(chan(left), chan(top), chan(tl)):
                        grad = cl + ct - ctl
                        pl += abs(grad - cl)
                        pt += abs(grad - ct)
                    pred = left if pl < pt else top
                elif mode == 12:
                    pred = sum(
                        max(0, min(255, cl + ct - ctl)) << sh
                        for cl, ct, ctl, sh in zip(
                            chan(left), chan(top), chan(tl), (24, 16, 8, 0)
                        )
                    )
                elif mode == 13:
                    # ClampAddSubtractHalf: C's /2 truncates toward
                    # zero, unlike >>1 — the difference shows on
                    # negative (avg - TL) values
                    pred = 0
                    for cl, ct, ctl, sh in zip(
                        chan(left), chan(top), chan(tl), (24, 16, 8, 0)
                    ):
                        a = (cl + ct) >> 1
                        d = a - ctl
                        half = d // 2 if d >= 0 else -((-d) // 2)
                        pred |= max(0, min(255, a + half)) << sh
                else:
                    raise ValueError(f"bad VP8L predictor mode {mode}")
            out[y, x] = add(int(res[y, x]), pred) & 0xFFFFFFFF
    return out


class _Vp8lBitWriter:
    """LSB-first bit writer (prefix-code bits go in MSB-first via
    :meth:`write_code`, mirroring the reader)."""

    def __init__(self) -> None:
        self.acc = 0
        self.n = 0
        self.out = bytearray()

    def write(self, v: int, nbits: int) -> None:
        self.acc |= (v & ((1 << nbits) - 1)) << self.n
        self.n += nbits
        while self.n >= 8:
            self.out.append(self.acc & 255)
            self.acc >>= 8
            self.n -= 8

    def write_code(self, code: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.write((code >> i) & 1, 1)

    def finish(self) -> bytes:
        if self.n:
            self.out.append(self.acc & 255)
        return bytes(self.out)


def make_webp(width: int, height: int, rgb_fn) -> bytes:
    """A GENUINE lossless WebP (VP8L) — stdlib-only, losslessly
    decodable by libwebp (conformance-tested): literal-only coding
    under fixed COMPLETE prefix codes (green: the 256 literals at 9
    bits plus an unused-but-assigned length symbol closing the Kraft
    sum; red/blue flat 8-bit; alpha and distance as simple one-symbol
    codes costing zero bits per pixel), full code-length-code header
    emission with an 18-repeat for the unused length-prefix tail.
    Deliberately transform-free — the DECODER's transform and LZ77
    paths are exercised by libwebp-encoded conformance streams, which
    use them heavily."""
    import struct

    # The VP8L header stores width-1/height-1 in 14-bit fields; an
    # oversized dimension would silently wrap to a wrong header.
    if not (1 <= width <= 16384 and 1 <= height <= 16384):
        raise ValueError(
            f"VP8L dimensions must be in 1..16384, got {width}x{height}"
        )
    w = _Vp8lBitWriter()
    w.write(0x2F, 8)  # signature
    w.write(width - 1, 14)
    w.write(height - 1, 14)
    w.write(0, 1)  # alpha hint: every pixel opaque
    w.write(0, 3)  # version
    w.write(0, 1)  # no transforms
    w.write(0, 1)  # no color cache
    w.write(0, 1)  # no meta-prefix

    def normal_code(clc_lengths: dict, emit) -> None:
        # emit one code via the code-length-code path: clc_lengths maps
        # code-length symbols to their CLC code lengths; emit() writes
        # the symbol stream using the canonical CLC codes
        need = max(_VP8L_CLC_ORDER.index(s) for s in clc_lengths) + 1
        w.write(0, 1)  # not simple
        w.write(need - 4, 4)
        for i in range(need):
            w.write(clc_lengths.get(_VP8L_CLC_ORDER[i], 0), 3)
        w.write(0, 1)  # no max_symbol cap
        full = [clc_lengths.get(s, 0) for s in range(19)]
        codes = _Vp8lCode(full).table
        inv = {sym: (l, c) for (l, c), sym in codes.items()}
        emit(lambda sym: w.write_code(inv[sym][1], inv[sym][0]))

    def simple_one(symbol: int) -> None:
        w.write(1, 1)  # simple
        w.write(0, 1)  # one symbol
        w.write(1, 1)  # 8-bit symbol
        w.write(symbol, 8)

    # green: syms 0..255 at length 9, sym 256 at length 1 (Kraft-complete)
    def emit_green(put):
        for _ in range(256):
            put(9)
        put(1)
        put(18)  # 23 trailing zeros for the unused length/cache symbols
        w.write(23 - 11, 7)

    normal_code({9: 1, 1: 2, 18: 2}, emit_green)

    # red and blue: flat 8-bit over 256 symbols
    def emit_flat(put):
        for _ in range(256):
            put(8)

    normal_code({8: 1, 0: 1}, emit_flat)  # red
    normal_code({8: 1, 0: 1}, emit_flat)  # blue
    simple_one(255)  # alpha: constant, zero bits per pixel
    simple_one(0)  # distance: never referenced

    for y in range(height):
        for x in range(width):
            r, g, b = (v & 255 for v in rgb_fn(x, y))
            w.write_code(256 | g, 9)  # 9-bit literal codes 256..511
            w.write_code(r, 8)
            w.write_code(b, 8)
    payload = w.finish()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def _decode_webp(data: bytes) -> tuple[int, int]:
    """(luma checksum, pixel count) of a LOSSLESS WebP (VP8L) — full
    bitstream decode per the public spec, stdlib + numpy only.  Lossy
    (VP8) and extended (VP8X: animation/alpha-chunk containers) raise
    NotImplementedError into the library gate — VP8 is an H.264-class
    intra-frame coder (see the gate rationale in the module header)."""
    import struct

    data = bytes(data)
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP payload")
    pos = 12
    while pos + 8 <= len(data):
        fourcc = data[pos : pos + 4]
        ln = struct.unpack_from("<I", data, pos + 4)[0]
        body = data[pos + 8 : pos + 8 + ln]
        if fourcc == b"VP8L":
            break
        if fourcc == b"VP8 ":
            raise NotImplementedError("lossy WebP (VP8) — needs a codec library")
        if fourcc == b"VP8X":
            raise NotImplementedError(
                "extended WebP (VP8X: animation/metadata container) — "
                "needs a codec library"
            )
        pos += 8 + ln + (ln & 1)
    else:
        raise ValueError("WebP container without an image chunk")
    if len(body) < 5:
        raise ValueError("truncated VP8L chunk")
    if body[0] != 0x2F:
        raise ValueError("bad VP8L signature byte")
    br = _Vp8lBitReader(body, 1)
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha-is-used hint
    if br.read(3) != 0:
        raise ValueError("unknown VP8L version")
    img = _vp8l_decode_image(br, w, h, True)
    rr = ((img >> 16) & 0xFF).astype(np.int64)
    gg = ((img >> 8) & 0xFF).astype(np.int64)
    bb = (img & 0xFF).astype(np.int64)
    luma = (299 * rr + 587 * gg + 114 * bb) // 1000
    return int(luma.sum()), int(w * h)
