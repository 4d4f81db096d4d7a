"""Still-image codecs, stdlib + numpy only: 24-bit BMP, full static
PNG (all five unfilters, Adam7, palette/sub-byte/16-bit), GIF
(variable-width LZW, four-pass interlace), ICO (classic DIB entries +
embedded PNG), and baseline TIFF (both byte orders, strips,
PackBits/Deflate/TIFF-LZW, horizontal predictor).  Encoders emit
conformance-tested streams (JDK javax.imageio TIFF/PNG plugins); the
gate rationale lives in the package __init__."""

from __future__ import annotations

import numpy as np

def make_bmp(width: int, height: int, rgb_fn) -> bytes:
    """A genuine 24-bit uncompressed BMP (BITMAPINFOHEADER, bottom-up
    rows, 4-byte row padding).  ``rgb_fn(x, y) -> (r, g, b)`` with y=0
    the TOP row."""
    import struct

    row_size = (3 * width + 3) // 4 * 4
    img_size = row_size * height
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    rows = []
    for y in range(height - 1, -1, -1):  # bottom-up storage order
        row = bytearray()
        for x in range(width):
            r, g, b = rgb_fn(x, y)
            row += bytes((b & 255, g & 255, r & 255))  # BGR on disk
        row += b"\x00" * (row_size - 3 * width)
        rows.append(bytes(row))
    return header + dib + b"".join(rows)


# valid PNG (color type, bit depth) combinations, spec §11.2.2
_PNG_DEPTHS = {
    0: (1, 2, 4, 8, 16),  # greyscale
    2: (8, 16),  # truecolor
    3: (1, 2, 4, 8),  # palette indices
    4: (8, 16),  # grey + alpha
    6: (8, 16),  # truecolor + alpha
}
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_pack_row(samples: list, depth: int) -> bytes:
    """Pack one scanline's samples to bytes: MSB-first bit packing
    below 8 bits, big-endian two-byte samples at 16 (spec §7.2)."""
    if depth == 8:
        return bytes(samples)
    if depth == 16:
        out = bytearray()
        for s in samples:
            out += bytes(((s >> 8) & 255, s & 255))
        return bytes(out)
    out = bytearray()
    acc = nbits = 0
    for s in samples:
        acc = (acc << depth) | (s & ((1 << depth) - 1))
        nbits += depth
        if nbits == 8:
            out.append(acc)
            acc = nbits = 0
    if nbits:
        out.append(acc << (8 - nbits))
    return bytes(out)


def make_png(width: int, height: int, rgb_fn, row_filters=None,
             interlace: bool = False, color_type: int = 2,
             depth: int = 8) -> bytes:
    """A GENUINE PNG via stdlib ``zlib`` — real DEFLATE stream, real
    CRCs — over the full static format: ``color_type`` 0 (greyscale,
    the luma of ``rgb_fn``), 2 (truecolor), or 3 (palette, built from
    the distinct ``rgb_fn`` colors like :func:`make_gif`), at any
    legal ``depth`` (1/2/4/8/16 grey, 8/16 RGB, 1/2/4/8 palette —
    sub-byte depths quantize grey to the replicated d-bit scale,
    16-bit samples replicate the 8-bit value as ``s * 257``).
    ``row_filters`` picks the scanline filter per row (default cycles
    0..4) so a decoder must implement every unfilter path;
    ``interlace=True`` writes a real Adam7 stream: each of the seven
    passes extracted and filtered as its own reduced image (filters
    still cycling within the pass, empty passes contributing no
    bytes)."""
    import struct
    import zlib

    if depth not in _PNG_DEPTHS.get(color_type, ()):
        raise ValueError(f"illegal PNG depth {depth} for color type {color_type}")
    filters = row_filters or [0, 1, 2, 3, 4]
    palette: dict[tuple, int] = {}
    samples: list[list[int]] = []  # per row, w*ch sample values
    for y in range(height):
        row: list[int] = []
        for x in range(width):
            r, g, b = (v & 255 for v in rgb_fn(x, y))
            if color_type == 2:
                row += [r, g, b] if depth == 8 else [r * 257, g * 257, b * 257]
            elif color_type == 0:
                grey = (299 * r + 587 * g + 114 * b) // 1000
                if depth == 16:
                    row.append(grey * 257)
                elif depth == 8:
                    row.append(grey)
                else:
                    row.append(grey * ((1 << depth) - 1) // 255)
            else:  # palette
                c = (r, g, b)
                if c not in palette:
                    if len(palette) == (1 << depth):
                        raise ValueError(
                            f"palette PNG at depth {depth} allows "
                            f"{1 << depth} distinct colors"
                        )
                    palette[c] = len(palette)
                row.append(palette[c])
        samples.append(row)

    ch = _PNG_CHANNELS[color_type]
    bpp = max(1, (ch * depth) // 8)

    def filt(rows: list) -> bytes:
        # filter one (sub-)image of packed scanlines: prev row starts
        # zero per pass; the left neighbor is bpp bytes back
        stride = len(rows[0])
        prev = bytes(stride)
        out = bytearray()
        for yi, cur in enumerate(rows):
            f = filters[yi % len(filters)]
            enc = bytearray(stride)
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                up = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                if f == 0:
                    pred = 0
                elif f == 1:
                    pred = a
                elif f == 2:
                    pred = up
                elif f == 3:
                    pred = (a + up) // 2
                else:  # Paeth
                    p = a + up - c
                    pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (up if pb <= pc else c)
                enc[x] = (cur[x] - pred) & 255
            out += bytes([f]) + bytes(enc)
            prev = cur
        return bytes(out)

    if not interlace:
        packed = [_png_pack_row(row, depth) for row in samples]
        raw = filt(packed) if height else b""
    else:
        raw = bytearray()
        for x0, y0, dx, dy in _ADAM7:
            sub = [
                _png_pack_row(
                    [
                        v
                        for x in range(x0, width, dx)
                        for v in samples[y][x * ch : (x + 1) * ch]
                    ],
                    depth,
                )
                for y in range(y0, height, dy)
            ]
            if not sub or not sub[0]:
                continue  # empty pass: no bytes at all
            raw += filt(sub)
        raw = bytes(raw)

    def chunk(typ: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + typ
            + body
            + struct.pack(">I", zlib.crc32(typ + body))
        )

    ihdr = struct.pack(
        ">IIBBBBB", width, height, depth, color_type, 0, 0,
        1 if interlace else 0,
    )
    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    if color_type == 3:
        plte = b"".join(bytes(c) for c in palette)
        out += chunk(b"PLTE", plte)
    return (
        out
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def _lzw_encode(indices, min_code: int) -> bytes:
    """GIF-flavor LZW (variable code width, LSB-first packing, clear
    at table overflow) — the encode half that makes :func:`_decode_gif`
    differentially testable without any codec library."""
    clear, end = 1 << min_code, (1 << min_code) + 1

    def reset():
        return {(i,): i for i in range(clear)}, end + 1, min_code + 1

    table, next_code, cs = reset()
    codes = [(clear, cs)]
    buf: tuple = ()
    for sym in indices:
        cand = buf + (int(sym),)
        if cand in table:
            buf = cand
            continue
        codes.append((table[buf], cs))
        table[cand] = next_code
        next_code += 1
        # the DECODER's table lags one entry (no add on the first code
        # after clear), so it reaches 2^cs — its growth point — one
        # emission later than this table does: grow at 2^cs + 1
        if next_code == (1 << cs) + 1 and cs < 12:
            cs += 1
        elif next_code == 4096:
            codes.append((clear, cs))
            table, next_code, cs = reset()
        buf = (int(sym),)
    if buf:
        codes.append((table[buf], cs))
    codes.append((end, cs))
    bitbuf = nbits = 0
    out = bytearray()
    for code, width in codes:
        bitbuf |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(bitbuf & 255)
            bitbuf >>= 8
            nbits -= 8
    if nbits:
        out.append(bitbuf & 255)
    return bytes(out)


def _gif_row_order(ih: int) -> list:
    """GIF89a interlace row schedule (spec appendix E): the display
    rows in the order the file stores them — pass starts 0/4/2/1 with
    steps 8/8/4/2."""
    return [
        y
        for start, step in ((0, 8), (4, 8), (2, 4), (1, 2))
        for y in range(start, ih, step)
    ]


def make_gif(width: int, height: int, rgb_fn, interlace: bool = False) -> bytes:
    """A GENUINE GIF89a (global color table + real LZW-compressed
    pixel indices) — stdlib-only.  ``rgb_fn`` may use at most 256
    distinct colors (GIF is palettized).  ``interlace=True`` stores
    the rows in the four-pass interlace schedule and sets the image
    descriptor flag."""
    import struct

    palette: dict[tuple, int] = {}
    rows: list[list[int]] = []
    for y in range(height):
        row = []
        for x in range(width):
            r, g, b = rgb_fn(x, y)
            c = (r & 255, g & 255, b & 255)
            if c not in palette:
                if len(palette) == 256:
                    raise ValueError("GIF needs <= 256 distinct colors")
                palette[c] = len(palette)
            row.append(palette[c])
        rows.append(row)
    order = _gif_row_order(height) if interlace else range(height)
    indices = [v for y in order for v in rows[y]]
    n = 1
    while (1 << n) < max(len(palette), 2):
        n += 1
    min_code = max(2, n)
    gct = bytearray()
    for c in palette:
        gct += bytes(c)
    gct += b"\x00" * (3 * (1 << n) - len(gct))
    lzw = _lzw_encode(indices, min_code)
    blocks = bytearray()
    for i in range(0, len(lzw), 255):
        part = lzw[i : i + 255]
        blocks += bytes([len(part)]) + part
    blocks += b"\x00"
    return (
        b"GIF89a"
        + struct.pack("<HHBBB", width, height, 0x80 | (n - 1), 0, 0)
        + bytes(gct)
        + b"\x2c"
        + struct.pack("<HHHHB", 0, 0, width, height, 0x40 if interlace else 0)
        + bytes([min_code])
        + bytes(blocks)
        + b"\x3b"
    )


# ---------------------------------------------------------------------------
# ICO — favicons, which a web crawl fetches for every host.  A
# container of independently-encoded entries: classic headerless DIBs
# (BITMAPINFOHEADER with doubled height for the AND mask, bottom-up
# padded rows, 32/24/8/4/1 bpp with BGRX palettes) or embedded PNGs
# (Vista+), dispatched to the full PNG decoder above.  The decoder
# reports the LARGEST entry (the representative image); the AND mask
# is transparency only and does not enter the luma.


def _decode_ico_dib(body: bytes, w: int, h: int) -> tuple[int, int]:
    """One classic ICO DIB entry: headerless BITMAPINFOHEADER whose
    biHeight covers XOR image + AND mask."""
    import struct

    if len(body) < 40:
        raise ValueError("truncated ICO DIB header")
    (bisize, biw, bih, _planes, bpp, comp) = struct.unpack_from("<IiiHHI", body, 0)
    if bisize < 40:
        raise ValueError("bad ICO DIB header size")
    if comp != 0:
        raise NotImplementedError(f"ICO DIB compression {comp} (BI_RGB only)")
    if biw != w or bih not in (h, 2 * h):
        raise ValueError("ICO DIB dimensions disagree with the directory")
    if bpp not in (1, 4, 8, 24, 32):
        raise NotImplementedError(f"ICO DIB bpp {bpp}")
    pos = bisize
    pal = None
    if bpp <= 8:
        n_colors = struct.unpack_from("<I", body, 32)[0] or (1 << bpp)
        pal = np.frombuffer(
            body, np.uint8, n_colors * 4, pos
        ).reshape(n_colors, 4).astype(np.int64)  # BGRX
        pos += n_colors * 4
    stride = (w * bpp + 31) // 32 * 4
    if len(body) < pos + stride * h:
        raise ValueError("truncated ICO DIB pixel data")
    rows = np.frombuffer(body, np.uint8, stride * h, pos).reshape(h, stride)
    rows = rows[::-1]  # bottom-up
    if bpp == 32:
        px = rows[:, : w * 4].reshape(h, w, 4).astype(np.int64)
        b, g, r = px[:, :, 0], px[:, :, 1], px[:, :, 2]
    elif bpp == 24:
        px = rows[:, : w * 3].reshape(h, w, 3).astype(np.int64)
        b, g, r = px[:, :, 0], px[:, :, 1], px[:, :, 2]
    else:
        if bpp == 8:
            idx = rows[:, :w].astype(np.int64)
        else:
            bits = np.unpackbits(rows, axis=1)
            n = w * bpp
            grp = bits[:, :n].reshape(h, w, bpp)
            idx = np.zeros((h, w), np.int64)
            for k in range(bpp):
                idx = (idx << 1) | grp[:, :, k]
        if int(idx.max(initial=0)) >= len(pal):
            raise ValueError("ICO palette index out of range")
        rgb = pal[idx]
        b, g, r = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
    luma = (299 * r + 587 * g + 114 * b) // 1000
    return int(luma.sum()), int(w * h)


def _decode_ico(data: bytes) -> tuple[int, int]:
    """(luma checksum, pixel count) of an ICO's largest entry —
    directory walk, then per-entry dispatch to the embedded-PNG or
    classic-DIB decode."""
    import struct

    data = bytes(data)
    if len(data) < 6 or struct.unpack_from("<HHH", data, 0)[:2] != (0, 1):
        raise ValueError("not an ICO payload")
    count = struct.unpack_from("<H", data, 4)[0]
    if count == 0:
        raise ValueError("ICO with no entries")
    best = None
    for i in range(count):
        off = 6 + 16 * i
        if off + 16 > len(data):
            raise ValueError("truncated ICO directory")
        bw, bh = data[off], data[off + 1]
        w = bw or 256
        h = bh or 256
        size, payload_off = struct.unpack_from("<II", data, off + 8)
        if best is None or w * h > best[0] * best[1]:
            best = (w, h, payload_off, size)
    w, h, payload_off, size = best
    body = data[payload_off : payload_off + size]
    if len(body) != size:
        raise ValueError("truncated ICO entry payload")
    if body[:8] == b"\x89PNG\r\n\x1a\n":
        return _decode_png(body)
    return _decode_ico_dib(body, w, h)


def make_ico(width: int, height: int, rgb_fn, entry_formats=("dib24",)) -> bytes:
    """A GENUINE ICO: one entry per requested format — ``dib24`` /
    ``dib32`` / ``dib8`` / ``dib4`` / ``dib1`` classic DIBs (palette
    formats build it like :func:`make_gif`, bottom-up padded rows,
    all-zero AND mask) or ``png`` (the Vista+ embedded form via
    :func:`make_png`).  Entries after the first halve the dimensions,
    so the decoder's largest-entry selection is honestly testable."""
    import struct

    entries = []
    for i, ef in enumerate(entry_formats):
        w = max(1, width >> i)
        h = max(1, height >> i)
        if w > 256 or h > 256:
            raise ValueError("ICO entries are at most 256x256")
        if ef == "png":
            payload = make_png(w, h, rgb_fn)
        elif ef in ("dib24", "dib32", "dib8", "dib4", "dib1"):
            bpp = int(ef[3:])
            if bpp <= 8:
                palette: dict[tuple, int] = {}
                idx_rows = []
                for y in range(h):
                    row = []
                    for x in range(w):
                        c = tuple(v & 255 for v in rgb_fn(x, y))
                        if c not in palette:
                            if len(palette) == (1 << bpp):
                                raise ValueError(
                                    f"{ef} allows {1 << bpp} distinct colors"
                                )
                            palette[c] = len(palette)
                        row.append(palette[c])
                    idx_rows.append(row)
                pal_bytes = bytearray()
                for r, g, b in palette:
                    pal_bytes += bytes((b, g, r, 0))
                pal_bytes += b"\x00" * (4 * ((1 << bpp) - len(palette)))
                stride = (w * bpp + 31) // 32 * 4
                xor = bytearray()
                for y in range(h - 1, -1, -1):  # bottom-up
                    rowbits = bytearray()
                    acc = nb = 0
                    for v in idx_rows[y]:
                        if bpp == 8:
                            rowbits.append(v)
                        else:
                            acc = (acc << bpp) | v
                            nb += bpp
                            if nb == 8:
                                rowbits.append(acc)
                                acc = nb = 0
                    if nb:
                        rowbits.append(acc << (8 - nb))
                    xor += rowbits + b"\x00" * (stride - len(rowbits))
                pixel_data = bytes(pal_bytes) + bytes(xor)
                n_colors = 1 << bpp
            else:
                stride = (w * (bpp // 8) + 3) // 4 * 4
                xor = bytearray()
                for y in range(h - 1, -1, -1):
                    row = bytearray()
                    for x in range(w):
                        r, g, b = (v & 255 for v in rgb_fn(x, y))
                        row += bytes((b, g, r) if bpp == 24 else (b, g, r, 255))
                    xor += row + b"\x00" * (stride - len(row))
                pixel_data = bytes(xor)
                n_colors = 0
            mask_stride = (w + 31) // 32 * 4
            mask = b"\x00" * (mask_stride * h)  # fully opaque
            header = struct.pack(
                "<IiiHHIIiiII", 40, w, 2 * h, 1, bpp, 0,
                len(pixel_data) + len(mask), 0, 0,
                n_colors if bpp <= 8 else 0, 0,
            )
            payload = header + pixel_data + mask
        else:
            raise ValueError(f"unknown ICO entry format {ef!r}")
        entries.append((w, h, payload))
    out = bytearray(struct.pack("<HHH", 0, 1, len(entries)))
    offset = 6 + 16 * len(entries)
    for w, h, payload in entries:
        out += struct.pack(
            "<BBBBHHII", w & 0xFF if w < 256 else 0,
            h & 0xFF if h < 256 else 0, 0, 0, 1, 0, len(payload), offset,
        )
        offset += len(payload)
    for _, _, payload in entries:
        out += payload
    return bytes(out)


# ---------------------------------------------------------------------------
# TIFF (baseline, TIFF 6.0) — the scan/document format crawls hit in
# archives and digitized collections: header + IFD tag walk in either
# byte order, strip assembly, uncompressed / PackBits / Deflate /
# TIFF-LZW decompression (MSB-first codes, 256/257 control codes, the
# "early change" width bump one code BEFORE the table fills),
# horizontal-differencing predictor, bilevel (both photometric
# polarities), greyscale 1/4/8/16, palette via ColorMap, and chunky
# RGB(A).  Tiled layout, planar configuration 2 and the CCITT fax
# codings raise into the library gate.  Conformance: the JDK's
# javax.imageio TIFF plugin (inside the Spark runtime) is a TWO-WAY
# third-party oracle — it writes LZW/PackBits/Deflate streams this
# decoder must reproduce exactly, and reads make_tiff output.


def _tiff_lzw_decode(stream: bytes) -> bytes:
    """TIFF 6.0 LZW: MSB-first packed codes starting at 9 bits,
    ClearCode 256 / EndOfInformation 257, and the early-change width
    increment (at 510/1022/2046 — one code before the table fills,
    unlike GIF)."""
    clear, eoi = 256, 257
    out = bytearray()
    table: list[bytes] = []
    width = 9
    prev: bytes | None = None
    acc = nbits = 0
    pos = 0

    def reset():
        nonlocal table, width, prev
        table = [bytes((i,)) for i in range(256)] + [b"", b""]
        width = 9
        prev = None

    reset()
    while True:
        while nbits < width:
            if pos >= len(stream):
                return bytes(out)  # missing EOI: tolerate, data is complete
            acc = (acc << 8) | stream[pos]
            pos += 1
            nbits += 8
        code = (acc >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        if code == eoi:
            return bytes(out)
        if code == clear:
            reset()
            continue
        if prev is None:
            if code >= len(table):
                raise ValueError("corrupt TIFF LZW stream")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("corrupt TIFF LZW stream")
        out += entry
        prev = entry
        if len(table) + 1 >= (1 << width) and width < 12:  # early change
            width += 1


def _tiff_packbits_decode(stream: bytes, expect: int) -> bytes:
    """PackBits RLE (TIFF 6.0 section 9)."""
    out = bytearray()
    pos = 0
    while pos < len(stream) and len(out) < expect:
        n = stream[pos]
        pos += 1
        if n < 128:
            out += stream[pos : pos + n + 1]
            pos += n + 1
        elif n > 128:
            if pos >= len(stream):
                raise ValueError("truncated TIFF PackBits run")
            out += bytes((stream[pos],)) * (257 - n)
            pos += 1
        # n == 128: no-op
    return bytes(out)


def _decode_tiff(data: bytes) -> tuple[int, int]:
    """(luma checksum, pixel count) of a baseline TIFF's FIRST image
    (IFD) — see the section header for coverage and gates."""
    import struct
    import zlib

    data = bytes(data)
    if data[:4] == b"II*\x00":
        e = "<"
    elif data[:4] == b"MM\x00*":
        e = ">"
    else:
        raise ValueError("not a TIFF payload")
    if len(data) < 8:
        raise ValueError("truncated TIFF header")

    def u16(off):
        return struct.unpack_from(e + "H", data, off)[0]

    def u32(off):
        return struct.unpack_from(e + "I", data, off)[0]

    ifd = u32(4)
    if ifd + 2 > len(data):
        raise ValueError("truncated TIFF IFD")
    n_tags = u16(ifd)
    type_size = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8}
    tags: dict[int, list[int]] = {}
    for i in range(n_tags):
        off = ifd + 2 + 12 * i
        if off + 12 > len(data):
            raise ValueError("truncated TIFF IFD entry")
        tag, typ = u16(off), u16(off + 2)
        count = u32(off + 4)
        sz = type_size.get(typ)
        if sz is None:
            continue  # unknown type: skip per spec
        total = sz * count
        voff = off + 8 if total <= 4 else u32(off + 8)
        if voff + total > len(data):
            raise ValueError("TIFF tag value out of range")
        vals: list[int] = []
        for k in range(count):
            if typ == 3:
                vals.append(u16(voff + 2 * k))
            elif typ == 4:
                vals.append(u32(voff + 4 * k))
            elif typ in (1, 6, 7):
                vals.append(data[voff + k])
            elif typ == 5:  # rational
                vals.append(u32(voff + 8 * k))
            else:  # signed variants: unused by the tags we read
                vals.append(u32(voff + 4 * k) if sz == 4 else u16(voff + 2 * k))
        tags[tag] = vals

    def one(tag, default=None):
        v = tags.get(tag)
        return v[0] if v else default

    if 322 in tags or 323 in tags or 324 in tags:
        raise NotImplementedError("tiled TIFF — needs a codec library")
    if one(284, 1) != 1:
        raise NotImplementedError("planar-configuration-2 TIFF")
    w = one(256)
    h = one(257)
    if not w or not h:
        raise ValueError("TIFF without dimensions")
    comp = one(259, 1)
    photometric = one(262, 1)
    spp = one(277, 1)
    bits_list = tags.get(258, [1] * spp)
    if len(set(bits_list)) != 1:
        raise NotImplementedError("TIFF with mixed per-sample bit depths")
    bits = bits_list[0]
    if bits not in (1, 4, 8, 16):
        raise NotImplementedError(f"TIFF bit depth {bits}")
    if photometric in (2,) and spp < 3:
        raise ValueError("RGB TIFF with fewer than 3 samples")
    offsets = tags.get(273)
    counts = tags.get(279)
    if not offsets or not counts or len(offsets) != len(counts):
        raise ValueError("TIFF without a consistent strip layout")
    rows_per_strip = one(278, h)
    stride = (w * spp * bits + 7) // 8

    raw = bytearray()
    for idx, (soff, scnt) in enumerate(zip(offsets, counts)):
        chunk = data[soff : soff + scnt]
        if len(chunk) != scnt:
            raise ValueError("truncated TIFF strip")
        n_rows = min(rows_per_strip, h - idx * rows_per_strip)
        expect = stride * n_rows
        if comp == 1:
            out = chunk
        elif comp == 5:
            out = _tiff_lzw_decode(chunk)
        elif comp == 32773:
            out = _tiff_packbits_decode(chunk, expect)
        elif comp in (8, 32946):  # Adobe deflate / old deflate
            out = zlib.decompress(chunk)
        elif comp in (2, 3, 4):
            raise NotImplementedError("CCITT fax TIFF — needs a codec library")
        else:
            raise NotImplementedError(f"TIFF compression {comp}")
        if len(out) < expect:
            raise ValueError("short TIFF strip after decompression")
        raw += out[:expect]

    rows = np.frombuffer(bytes(raw), np.uint8).reshape(h, stride)
    if one(317, 1) == 2:  # horizontal differencing predictor
        if bits != 8:
            raise NotImplementedError("TIFF predictor on non-8-bit samples")
        px = rows[:, : w * spp].reshape(h, w, spp).astype(np.int64)
        px = np.cumsum(px, axis=1) & 0xFF
    else:
        if bits == 8:
            px = rows[:, : w * spp].reshape(h, w, spp).astype(np.int64)
        elif bits == 16:
            px = rows[:, : 2 * w * spp].reshape(h, w * spp, 2).astype(np.int64)
            hi, lo = (0, 1) if e == ">" else (1, 0)
            px = (px[:, :, hi]).reshape(h, w, spp)  # high byte: 16->8
        else:
            bits_arr = np.unpackbits(rows, axis=1)
            n = w * spp
            grp = bits_arr[:, : n * bits].reshape(h, n, bits)
            vals = np.zeros((h, n), np.int64)
            for k in range(bits):
                vals = (vals << 1) | grp[:, :, k]
            px = vals.reshape(h, w, spp)

    if photometric == 3:
        cmap = tags.get(320)
        if not cmap or len(cmap) != 3 * (1 << bits):
            raise ValueError("palette TIFF without a valid ColorMap")
        if int(px.max(initial=0)) >= (1 << bits):
            raise ValueError("TIFF palette index out of range")
        lut = np.asarray(cmap, np.int64).reshape(3, 1 << bits) >> 8
        idx = px[:, :, 0]
        r, g, b = lut[0][idx], lut[1][idx], lut[2][idx]
        luma = (299 * r + 587 * g + 114 * b) // 1000
    elif photometric == 2:
        r, g, b = px[:, :, 0], px[:, :, 1], px[:, :, 2]  # extra samples ignored
        luma = (299 * r + 587 * g + 114 * b) // 1000
    elif photometric in (0, 1):
        grey = px[:, :, 0]
        full = (1 << bits) - 1 if bits < 8 else 255
        if bits < 8:
            grey = grey * 255 // full
        if photometric == 0:  # WhiteIsZero
            grey = 255 - grey
        luma = grey
    else:
        raise NotImplementedError(f"TIFF photometric interpretation {photometric}")
    return int(luma.sum()), int(w * h)


def make_tiff(width: int, height: int, rgb_fn, compression: str = "none",
              photometric: str = "rgb", predictor: bool = False) -> bytes:
    """A GENUINE baseline TIFF (little-endian, one IFD, single strip):
    ``photometric`` 'rgb' / 'grey' / 'palette' / 'bilevel' (WhiteIsZero
    to exercise the inverted polarity), ``compression`` 'none' /
    'packbits' / 'deflate', optional horizontal-differencing
    ``predictor`` (8-bit only).  Readable by the JDK TIFF plugin
    (conformance-tested)."""
    import struct
    import zlib

    if photometric == "rgb":
        spp, bits, phot = 3, 8, 2
    elif photometric == "grey":
        spp, bits, phot = 1, 8, 1
    elif photometric == "palette":
        spp, bits, phot = 1, 8, 3
    elif photometric == "bilevel":
        spp, bits, phot = 1, 1, 0
    else:
        raise ValueError(f"unknown TIFF photometric {photometric!r}")
    palette: dict[tuple, int] = {}
    stride = (width * spp * bits + 7) // 8
    raw = bytearray()
    for y in range(height):
        acc = nb = 0
        row = bytearray()
        for x in range(width):
            r, g, b = (v & 255 for v in rgb_fn(x, y))
            if phot == 2:
                row += bytes((r, g, b))
            elif phot == 1:
                row.append((299 * r + 587 * g + 114 * b) // 1000)
            elif phot == 3:
                c = (r, g, b)
                if c not in palette:
                    if len(palette) == 256:
                        raise ValueError("palette TIFF allows 256 colors")
                    palette[c] = len(palette)
                row.append(palette[c])
            else:  # bilevel WhiteIsZero: 0 = white
                lum = (299 * r + 587 * g + 114 * b) // 1000
                acc = (acc << 1) | (0 if lum >= 128 else 1)
                nb += 1
                if nb == 8:
                    row.append(acc)
                    acc = nb = 0
        if nb:
            row.append(acc << (8 - nb))
        raw += row + b"\x00" * (stride - len(row))
    if predictor:
        if bits != 8:
            raise ValueError("predictor needs 8-bit samples")
        px = np.frombuffer(bytes(raw), np.uint8).reshape(height, width, spp).astype(np.int64)
        diff = np.empty_like(px)
        diff[:, 0] = px[:, 0]
        diff[:, 1:] = (px[:, 1:] - px[:, :-1]) & 0xFF
        raw = bytearray(diff.astype(np.uint8).tobytes())
    if compression == "none":
        strip, comp_tag = bytes(raw), 1
    elif compression == "packbits":
        # literal-only PackBits runs (valid, if uncompressed)
        strip = bytearray()
        raw = bytes(raw)
        for i in range(0, len(raw), 128):
            part = raw[i : i + 128]
            strip += bytes((len(part) - 1,)) + part
        strip, comp_tag = bytes(strip), 32773
    elif compression == "deflate":
        strip, comp_tag = zlib.compress(bytes(raw)), 8
    else:
        raise ValueError(f"unknown TIFF compression {compression!r}")

    # directory first (tag, type, count, value-or-"ool" marker), so the
    # out-of-line data area's base offset is known before values bind
    built: list = [
        (256, 3, 1, width),
        (257, 3, 1, height),
        (259, 3, 1, comp_tag),
        (262, 3, 1, phot),
        (273, 4, 1, "strip"),
        (277, 3, 1, spp),
        (278, 3, 1, height),
        (279, 4, 1, len(strip)),
    ]
    if spp > 1:
        built.append((258, 3, spp, "bits"))
    else:
        built.append((258, 3, 1, bits))
    if predictor:
        built.append((317, 3, 1, 2))
    if phot == 3:
        built.append((320, 3, 3 * 256, "cmap"))
    built.sort(key=lambda t: t[0])
    data_base = 8 + 2 + 12 * len(built) + 4
    ool = bytearray()
    resolved = []
    for tag, typ, count, val in built:
        if val == "bits":
            resolved.append((tag, typ, count, data_base + len(ool)))
            ool += struct.pack("<H", bits) * spp
        elif val == "cmap":
            resolved.append((tag, typ, count, data_base + len(ool)))
            colors = list(palette) + [(0, 0, 0)] * (256 - len(palette))
            for plane in range(3):
                for c in colors:
                    ool += struct.pack("<H", c[plane] * 257)
        elif val == "strip":
            resolved.append((tag, typ, count, val))  # bound below
        else:
            resolved.append((tag, typ, count, val))
    strip_off = data_base + len(ool)
    out = bytearray(struct.pack("<2sHI", b"II", 42, 8))
    out += struct.pack("<H", len(resolved))
    for tag, typ, count, val in resolved:
        if val == "strip":
            val = strip_off
        out += struct.pack("<HHI", tag, typ, count)
        if typ == 3 and count == 1:
            out += struct.pack("<HH", val, 0)
        else:
            out += struct.pack("<I", val)
    out += struct.pack("<I", 0)  # no next IFD
    return bytes(out) + bytes(ool) + strip


def _decode_bmp(data: bytes) -> tuple[int, int]:
    """(luma checksum, pixel count) of a 24-bit uncompressed BMP.
    Luma uses the integer ITU-R 601 weights (299R+587G+114B)//1000 —
    documentedly NOT identical to PIL's "L" rounding; the contract is
    determinism of THIS decoder, not PIL emulation."""
    import struct

    if bytes(data[:2]) != b"BM":
        raise ValueError("not a BMP payload")
    offset = struct.unpack_from("<I", data, 10)[0]
    width = struct.unpack_from("<i", data, 18)[0]
    height = struct.unpack_from("<i", data, 22)[0]
    bpp = struct.unpack_from("<H", data, 28)[0]
    comp = struct.unpack_from("<I", data, 30)[0]
    if bpp != 24 or comp != 0:
        raise NotImplementedError(f"only 24-bit uncompressed BMP (got bpp={bpp})")
    hh = abs(height)
    row_size = (3 * width + 3) // 4 * 4
    arr = (
        np.frombuffer(data, np.uint8, count=row_size * hh, offset=offset)
        .reshape(hh, row_size)[:, : 3 * width]
        .reshape(hh, width, 3)
        .astype(np.int64)
    )
    luma = (299 * arr[:, :, 2] + 587 * arr[:, :, 1] + 114 * arr[:, :, 0]) // 1000
    return int(luma.sum()), int(width * hh)


# Adam7 interlacing (PNG spec §8.2): per-pass origin and step.  Each
# pass is filtered as an independent reduced image; empty passes
# contribute no bytes at all (not even filter bytes).
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _png_unfilter(raw: bytes, off: int, h: int, stride: int,
                  bpp: int) -> tuple["np.ndarray", int]:
    """Unfilter one (sub-)image of ``h`` scanlines of ``stride`` bytes
    starting at ``off`` — all five scanline unfilters
    (None/Sub/Up/Average/Paeth), left neighbor ``bpp`` bytes back
    (1 for sub-byte depths, per spec §9.2) — returning the rows and
    the offset after the consumed bytes."""
    if len(raw) - off < (stride + 1) * h:
        raise ValueError("truncated PNG pixel data")
    out = np.zeros((h, stride), dtype=np.int64)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        f = raw[off + y * (stride + 1)]
        line = np.frombuffer(
            raw, np.uint8, stride, off + y * (stride + 1) + 1
        ).astype(np.int64)
        if f == 0:
            cur = line.copy()
        elif f == 2:
            cur = (line + prev) & 255
        elif f in (1, 3, 4):
            # left-dependent filters are inherently sequential within
            # the scanline; rows stay numpy, the walk is per-byte
            cur = np.empty(stride, np.int64)
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                up = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                if f == 1:
                    pred = a
                elif f == 3:
                    pred = (a + up) // 2
                else:  # Paeth
                    p = a + up - c
                    pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                    pred = (
                        a if pa <= pb and pa <= pc else (up if pb <= pc else c)
                    )
                cur[x] = (int(line[x]) + pred) & 255
        else:
            raise ValueError(f"bad PNG scanline filter {f}")
        out[y] = cur
        prev = cur
    return out, off + (stride + 1) * h


def _png_unpack(rows: "np.ndarray", wpx: int, ch: int,
                depth: int) -> "np.ndarray":
    """Unpack filtered scanline bytes to per-sample values: MSB-first
    bit groups below 8 bits, the HIGH byte of big-endian 16-bit
    samples (the standard 16->8 downsample, exact for the replicated
    ``s * 257`` encoding) — returning (h, wpx*ch)."""
    n = wpx * ch
    if depth == 8:
        return rows[:, :n]
    if depth == 16:
        return rows[:, 0 : 2 * n : 2]
    bits = np.unpackbits(rows.astype(np.uint8), axis=1)
    grp = bits[:, : n * depth].reshape(rows.shape[0], n, depth)
    vals = np.zeros((rows.shape[0], n), np.int64)
    for k in range(depth):
        vals = (vals << 1) | grp[:, :, k]
    return vals


def _decode_png(data: bytes) -> tuple[int, int]:
    """(luma checksum, pixel count) of a PNG — the FULL static format
    with nothing but stdlib zlib + numpy: every legal color-type x
    bit-depth combination (grey 1/2/4/8/16, truecolor 8/16, palette
    1/2/4/8 via PLTE, grey+alpha and RGBA 8/16), sequential or
    Adam7-INTERLACED — chunk walk, DEFLATE inflate, all five scanline
    unfilters (None/Sub/Up/Average/Paeth, left neighbor at the
    per-format byte distance), the seven-pass de-interlace scatter
    (each pass unfiltered as its own reduced image, empty passes
    byte-free), sub-byte MSB-first sample unpacking, and 16->8 high-
    byte downsampling.  Same integer ITU-R 601 luma as
    :func:`_decode_bmp`, so one image encoded any of these ways
    checksums identically (tested, incl. positionally vs the JVM's
    ImageIO)."""
    import struct
    import zlib

    data = bytes(data)
    if data[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos, idat, ihdr, plte = 8, b"", None, None
    while pos + 8 <= len(data):
        ln, typ = struct.unpack_from(">I4s", data, pos)
        body = data[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif typ == b"PLTE":
            plte = body
        elif typ == b"IDAT":
            idat += body
        elif typ == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG without IHDR")
    w, h, depth, ct, _comp, _filt, interlace = ihdr
    if ct not in _PNG_CHANNELS or depth not in _PNG_DEPTHS.get(ct, ()):
        raise ValueError(
            f"illegal PNG color-type/depth combination ({ct}, {depth})"
        )
    if interlace not in (0, 1):
        raise ValueError(f"bad PNG interlace method {interlace}")
    ch = _PNG_CHANNELS[ct]
    bpp = max(1, (ch * depth) // 8)
    raw = zlib.decompress(idat)
    if interlace == 0:
        rows, off = _png_unfilter(raw, 0, h, (w * ch * depth + 7) // 8, bpp)
        px = _png_unpack(rows, w, ch, depth).reshape(h, w, ch)
    else:
        px = np.zeros((h, w, ch), dtype=np.int64)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx if w > x0 else 0
            ph = (h - y0 + dy - 1) // dy if h > y0 else 0
            if pw == 0 or ph == 0:
                continue
            stride = (pw * ch * depth + 7) // 8
            sub, off = _png_unfilter(raw, off, ph, stride, bpp)
            px[y0::dy, x0::dx] = _png_unpack(sub, pw, ch, depth).reshape(
                ph, pw, ch
            )
    if off != len(raw):
        raise ValueError("trailing bytes in PNG pixel data")
    if ct == 3:
        if plte is None or len(plte) % 3:
            raise ValueError("palette PNG without a valid PLTE chunk")
        pal = np.frombuffer(plte, np.uint8).reshape(-1, 3).astype(np.int64)
        if px.size and int(px.max()) >= len(pal):
            raise ValueError("PNG palette index out of range")
        rgb = pal[px[:, :, 0]]
        luma = (299 * rgb[:, :, 0] + 587 * rgb[:, :, 1] + 114 * rgb[:, :, 2]) // 1000
    elif ct in (0, 4):
        grey = px[:, :, 0]
        if depth < 8:
            grey = grey * 255 // ((1 << depth) - 1)
        luma = grey
    else:
        luma = (299 * px[:, :, 0] + 587 * px[:, :, 1] + 114 * px[:, :, 2]) // 1000
    return int(luma.sum()), int(w * h)


def _lzw_decode(stream: bytes, min_code: int) -> list[int]:
    """GIF LZW decode: variable code width (min+1 .. 12 bits,
    LSB-first), clear/end control codes, the KwKwK next-code case."""
    clear, end = 1 << min_code, (1 << min_code) + 1
    cs = min_code + 1
    table = {i: (i,) for i in range(clear)}
    next_code = end + 1
    out: list[int] = []
    prev: tuple | None = None
    bitpos, total = 0, len(stream) * 8
    while True:
        if bitpos + cs > total:
            break
        byte, shift = divmod(bitpos, 8)
        code = (
            int.from_bytes(stream[byte : byte + 3], "little") >> shift
        ) & ((1 << cs) - 1)
        bitpos += cs
        if code == end:
            break
        if code == clear:
            cs = min_code + 1
            table = {i: (i,) for i in range(clear)}
            next_code = end + 1
            prev = None
            continue
        if prev is None:
            entry = table[code]
        elif code in table:
            entry = table[code]
            if next_code < 4096:
                table[next_code] = prev + (entry[0],)
                next_code += 1
        elif code == next_code:
            entry = prev + (prev[0],)  # the KwKwK case
            table[next_code] = entry
            next_code += 1
        else:
            raise ValueError("corrupt GIF LZW stream")
        if next_code == (1 << cs) and cs < 12:
            cs += 1
        out.extend(entry)
        prev = entry
    return out


def _decode_gif(data: bytes) -> tuple[int, int]:
    """(luma checksum, pixel count) of a GIF87a/89a —
    a second REAL compressed-image decode with stdlib + numpy only:
    block walk, full LZW decompression (variable code width, clear
    codes, KwKwK), palette lookup.  Same integer ITU-R 601 luma as
    the BMP/PNG decoders, so one image encoded all three ways
    checksums identically (tested).  Multi-image GIFs sum over every
    frame; interlaced images de-interlace through the four-pass row
    schedule (r9)."""
    import struct

    data = bytes(data)
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    packed = data[10]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 1 << ((packed & 7) + 1)
        gct = data[pos : pos + 3 * n]
        pos += 3 * n
    luma_sum = 0
    pixels = 0
    while pos < len(data):
        b0 = data[pos]
        if b0 == 0x3B:  # trailer
            break
        if b0 == 0x21:  # extension: label byte + data sub-blocks
            pos += 2
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
            continue
        if b0 != 0x2C:
            raise ValueError(f"bad GIF block 0x{b0:02x}")
        iw, ih = struct.unpack_from("<HH", data, pos + 5)
        ipacked = data[pos + 9]
        pos += 10
        table = gct
        if ipacked & 0x80:
            n = 1 << ((ipacked & 7) + 1)
            table = data[pos : pos + 3 * n]
            pos += 3 * n
        if table is None:
            raise ValueError("GIF image without a color table")
        min_code = data[pos]
        pos += 1
        stream = bytearray()
        while data[pos] != 0:
            ln = data[pos]
            stream += data[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        indices = _lzw_decode(bytes(stream), min_code)
        if len(indices) < iw * ih:
            raise ValueError("truncated GIF image data")
        idx = np.asarray(indices[: iw * ih], dtype=np.int64).reshape(ih, iw)
        if ipacked & 0x40:
            # interlaced: stored row i is display row _gif_row_order[i]
            rows = np.empty_like(idx)
            rows[_gif_row_order(ih)] = idx
            idx = rows
        idx = idx.reshape(-1)
        pal = np.frombuffer(table, np.uint8).reshape(-1, 3).astype(np.int64)
        px = pal[idx]
        luma_sum += int(
            ((299 * px[:, 0] + 587 * px[:, 1] + 114 * px[:, 2]) // 1000).sum()
        )
        pixels += iw * ih
    return luma_sum, pixels
