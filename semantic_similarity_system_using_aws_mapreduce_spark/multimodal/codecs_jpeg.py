"""Baseline + progressive JPEG, Huffman entropy layer: real marker
walk, canonical Huffman decode/encode, dequant + IDCT, 4:2:0
upsampling, restart markers, progressive spectral selection AND
successive approximation, Adobe APP14 colorspaces (RGB/CMYK/YCCK).
The arithmetic (Annex D/F) entropy layer lives in codecs_jpeg_arith;
the shared DCT/quant pipeline is here."""

from __future__ import annotations

import numpy as np

from semantic_similarity_system_using_aws_mapreduce_spark.multimodal.codecs_jpeg_arith import (
    _ARITH_FIXED,
    _ArithEncoder,
    _arith_encode_ac,
    _arith_encode_ac_refine,
    _arith_encode_dc,
    _decode_jpeg_scan_arith,
    _jpeg_next_marker,
)

# ---------------------------------------------------------------------------
# Baseline JPEG (ITU-T T.81): a REAL lossy-DCT codec with nothing but
# stdlib + numpy, the PNG/GIF precedent taken to the format a web
# crawl actually hits most.  Encoder and decoder cover Huffman-coded
# JPEG — baseline sequential AND progressive (SOF2: spectral
# selection, successive approximation, EOBRUN), Huffman AND
# arithmetic entropy coding (SOF9/10 via the T.81 Annex D/F coder
# further below), grayscale, YCbCr 4:4:4 and 4:2:0, restart markers —
# which together are essentially all crawl images; lossless/
# differential and 12-bit variants raise NotImplementedError into the
# library gate like every other compressed-codec seam.  All tables
# below are the public spec constants from T.81 Annex K.
# ---------------------------------------------------------------------------

#: zigzag scan: _ZIGZAG[k] = raster index of the k-th zigzag coefficient
_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

_QT_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
]
_QT_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
] + [99] * 32

# (bits per code length 1..16, symbol values) — T.81 Annex K.3
_HUFF_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HUFF_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

_DCT_MAT = None


def _dct_matrix() -> "np.ndarray":
    global _DCT_MAT
    if _DCT_MAT is None:
        k = np.arange(8).reshape(8, 1)
        n = np.arange(8).reshape(1, 8)
        c = np.cos((2 * n + 1) * k * np.pi / 16) * np.sqrt(2 / 8)
        c[0, :] = np.sqrt(1 / 8)
        _DCT_MAT = c
    return _DCT_MAT


def _huff_encode_table(spec) -> dict[int, tuple[int, int]]:
    """Canonical Huffman codes: symbol -> (code, length)."""
    bits, vals = spec
    code, k, out = 0, 0, {}
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_decode_table(bits, vals) -> dict[tuple[int, int], int]:
    """Canonical Huffman decode map: (length, code) -> symbol."""
    code, k, out = 0, 0, {}
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


class _JpegBitWriter:
    """MSB-first bit stream with the mandated 0xFF -> 0xFF 0x00 byte
    stuffing; the final partial byte pads with 1-bits (T.81 F.1.2.3)."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.n -= 8
            self.acc &= (1 << self.n) - 1
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)


def _mag_bits(v: int) -> tuple[int, int]:
    """(category, amplitude bits) of a DC diff / AC value (T.81 F.1.2.1)."""
    if v == 0:
        return 0, 0
    size = abs(v).bit_length()
    return size, (v if v > 0 else v + (1 << size) - 1)


def _quantized_blocks(plane: "np.ndarray", qt_raster: "np.ndarray") -> "np.ndarray":
    """FDCT + quantize every 8x8 block of an 8-multiple-sized plane;
    returns int blocks shaped (rows, cols, 8, 8)."""
    c = _dct_matrix()
    h, w = plane.shape
    blocks = (
        plane.astype(np.float64).reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)
        - 128.0
    )
    coef = np.einsum("ij,rcjk,lk->rcil", c, blocks, c)
    return np.round(coef / qt_raster).astype(np.int64)


def _pad_to(plane: "np.ndarray", mult: int) -> "np.ndarray":
    h, w = plane.shape
    ph = (-h) % mult
    pw = (-w) % mult
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge")


#: AC Huffman table for the progressive encoder: every symbol 0x00-
#: 0xFF gets a code (255 8-bit + one 9-bit), because EOBn symbols
#: (n<<4, n>=1) don't exist in the Annex K sequential tables — real
#: progressive encoders always emit custom tables for the same reason.
_HUFF_AC_FLAT = ([0] * 7 + [255, 1] + [0] * 7, list(range(256)))


def _flush_eobrun(w: "_JpegBitWriter", enc_ac, eobrun: int, bbuf: list) -> tuple[int, list]:
    """Emit a pending EOB run (EOBn symbol + extension bits) followed
    by the correction bits buffered across the run's blocks (T.81
    G.1.2.2/G.1.2.3 encoder side — the libjpeg emit_eobrun shape)."""
    if eobrun > 0:
        nbits = eobrun.bit_length() - 1
        code, ln = enc_ac[nbits << 4]
        w.write(code, ln)
        if nbits:
            w.write(eobrun - (1 << nbits), nbits)
        for b in bbuf:
            w.write(b, 1)
        return 0, []
    return eobrun, bbuf


def _encode_block_ac_first(
    w: "_JpegBitWriter", enc_ac, zz, ss: int, se: int, al: int, eobrun: int
) -> int:
    """Progressive AC first-scan encoding of one block's band: point
    transform (sign * (abs >> Al)), zero runs, EOB folding."""
    r = 0
    for k in range(ss, se + 1):
        t = int(zz[k])
        ta = abs(t) >> al
        if ta == 0:
            r += 1
            continue
        eobrun, _ = _flush_eobrun(w, enc_ac, eobrun, [])
        while r > 15:
            code, ln = enc_ac[0xF0]
            w.write(code, ln)
            r -= 16
        val = ta if t > 0 else -ta
        size, bits = _mag_bits(val)
        code, ln = enc_ac[(r << 4) | size]
        w.write(code, ln)
        w.write(bits, size)
        r = 0
    if r > 0:
        eobrun += 1
        if eobrun == 0x7FFF:
            eobrun, _ = _flush_eobrun(w, enc_ac, eobrun, [])
    return eobrun


def _encode_block_ac_refine(
    w: "_JpegBitWriter",
    enc_ac,
    zz,
    ss: int,
    se: int,
    al: int,
    eobrun: int,
    bbuf: list,
) -> tuple[int, list]:
    """Progressive AC refinement encoding of one block's band: newly
    significant coefficients as (run<<4)|1 + sign bit, correction bits
    for already-significant ones, EOB-run folding with the cross-block
    correction-bit buffer (the libjpeg encode_mcu_AC_refine shape —
    the exact mirror of the decoder's _block_ac_refine)."""
    absv = {k: abs(int(zz[k])) >> al for k in range(ss, se + 1)}
    eobpos = 0
    for k in range(ss, se + 1):
        if absv[k] == 1:
            eobpos = k
    r = 0
    br: list[int] = []
    for k in range(ss, se + 1):
        t = absv[k]
        if t == 0:
            r += 1
            continue
        while r > 15 and k <= eobpos:
            eobrun, bbuf = _flush_eobrun(w, enc_ac, eobrun, bbuf)
            code, ln = enc_ac[0xF0]
            w.write(code, ln)
            r -= 16
            for b in br:
                w.write(b, 1)
            br = []
        if t > 1:  # already significant: one correction bit
            br.append(t & 1)
            continue
        eobrun, bbuf = _flush_eobrun(w, enc_ac, eobrun, bbuf)
        code, ln = enc_ac[(r << 4) | 1]
        w.write(code, ln)
        w.write(0 if int(zz[k]) < 0 else 1, 1)  # sign of the new coef
        for b in br:
            w.write(b, 1)
        br = []
        r = 0
    if r > 0 or br:
        eobrun += 1
        bbuf = bbuf + br
        if eobrun == 0x7FFF:
            eobrun, bbuf = _flush_eobrun(w, enc_ac, eobrun, bbuf)
    return eobrun, bbuf


def make_jpeg(
    width: int,
    height: int,
    rgb_fn,
    quality: int = 90,
    subsample: bool = False,
    gray: bool = False,
    restart_interval: int = 0,
    progressive: bool = False,
    arithmetic: bool = False,
    colorspace: str | None = None,
) -> bytes:
    """A GENUINE baseline JPEG via stdlib + numpy: real FDCT, real
    quantization (Annex K tables scaled by ``quality`` per the IJG
    convention), real canonical Huffman entropy coding with byte
    stuffing.  ``subsample=True`` writes YCbCr 4:2:0 (16x16 MCUs, four
    Y blocks + averaged chroma); ``gray`` writes a single-component
    scan; ``restart_interval`` > 0 emits a DRI segment and RSTn
    markers so the decoder's restart path is honestly testable.

    ``progressive=True`` writes a GENUINE progressive (SOF2) stream
    exercising both progressive dimensions: spectral selection (DC
    scan, AC bands 1-5 and 6-63 per component) AND successive
    approximation (first scans at Al=1, then DC/AC refinement scans at
    Al=0) with EOB-run folding.  Identical quantized coefficients as
    the baseline stream for the same inputs, so baseline and
    progressive encodings of one image must DECODE IDENTICALLY — the
    cross-check tests/test_multimodal.py pins.

    ``arithmetic=True`` swaps the entropy layer for the T.81 Annex D/F
    arithmetic coder (SOF9 sequential / SOF10 progressive, DAC
    conditioning segment, no Huffman tables) over the SAME quantized
    coefficients, so all four (entropy x scan-script) encodings of one
    image decode identically; conformance against the system libjpeg
    is pinned by the coefficient-transcode tests when that library is
    present.

    ``colorspace`` writes the Adobe APP14 variants real encoders emit
    besides JFIF YCbCr: ``"rgb"`` (3 components, transform 0),
    ``"cmyk"`` (4 components, transform 0, inverted inks with K=255 so
    brightness round-trips exactly), ``"ycck"`` (4 components,
    transform 2)."""
    import struct

    if progressive and restart_interval:
        # The progressive scan builders (Huffman and arithmetic) emit
        # no RST markers, so a DRI segment would make the stream
        # self-inconsistent — this decoder rightly rejects such a
        # stream with 'expected RST marker'.  Fail loudly instead.
        raise ValueError(
            "progressive JPEG with restart_interval is not supported: "
            "progressive scans emit no RST markers"
        )
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    qts = []
    for base in (_QT_LUMA, _QT_CHROMA):
        q = np.clip((np.asarray(base, np.int64) * scale + 50) // 100, 1, 255)
        qts.append(q)
    qt_raster = [q.reshape(8, 8) for q in qts]

    rgb = np.empty((height, width, 3), np.int64)
    for y in range(height):
        for x in range(width):
            r, g, b = rgb_fn(x, y)
            rgb[y, x] = (r & 255, g & 255, b & 255)
    rf, gf, bf = (rgb[:, :, i].astype(np.float64) for i in range(3))
    yy = 0.299 * rf + 0.587 * gf + 0.114 * bf
    cb = 128.0 - 0.168736 * rf - 0.331264 * gf + 0.5 * bf
    cr = 128.0 + 0.5 * rf - 0.418688 * gf - 0.081312 * bf

    if colorspace is not None:
        if colorspace not in ("rgb", "cmyk", "ycck"):
            raise ValueError(f"unknown JPEG colorspace {colorspace!r}")
        if gray or subsample:
            raise ValueError("colorspace modes are full-resolution color")
        kplane = np.full((height, width), 255.0)
        if colorspace == "rgb":
            # 'R','G','B' component IDs (the libjpeg convention) so
            # the colorspace survives transcoders that drop APP14
            comps = [(0x52, 1, 1, 0), (0x47, 1, 1, 1), (0x42, 1, 1, 1)]
            planes = [np.clip(np.round(p), 0, 255) for p in (rf, gf, bf)]
        elif colorspace == "cmyk":
            # Adobe inverted-ink convention with no black ink: the
            # stored CMY ARE the RGB values and K is constant 255, so
            # the decode brightness round-trips exactly
            comps = [(1, 1, 1, 0), (2, 1, 1, 1), (3, 1, 1, 1), (4, 1, 1, 1)]
            planes = [np.clip(np.round(p), 0, 255) for p in (rf, gf, bf)]
            planes.append(kplane)
        else:  # ycck: the inverted CMY run through the YCbCr transform
            comps = [(1, 1, 1, 0), (2, 1, 1, 1), (3, 1, 1, 1), (4, 1, 1, 1)]
            planes = [
                np.clip(np.round(yy), 0, 255),
                np.clip(np.round(cb), 0, 255),
                np.clip(np.round(cr), 0, 255),
                kplane,
            ]
    elif gray:
        comps = [(1, 1, 1, 0)]
        planes = [np.clip(np.round(yy), 0, 255)]
    elif subsample:
        comps = [(1, 2, 2, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
        ye = _pad_to(np.clip(np.round(yy), 0, 255), 2)
        planes = [ye]
        for ch in (cb, cr):
            che = _pad_to(np.clip(np.round(ch), 0, 255), 2)
            h2, w2 = che.shape
            ds = che.reshape(h2 // 2, 2, w2 // 2, 2).mean(axis=(1, 3))
            planes.append(np.round(ds))
    else:
        comps = [(1, 1, 1, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
        planes = [np.clip(np.round(p), 0, 255) for p in (yy, cb, cr)]

    hmax = max(h for _, h, _, _ in comps)
    vmax = max(v for _, _, v, _ in comps)
    blocks = []
    for (cid, h, v, tq), plane in zip(comps, planes):
        plane = _pad_to(plane, 8 * max(1, h if cid == 1 else 1))
        # each component's plane must cover the full MCU grid
        mcux = -(-width // (8 * hmax))
        mcuy = -(-height // (8 * vmax))
        need_h, need_w = mcuy * 8 * v, mcux * 8 * h
        ph, pw = plane.shape
        plane = np.pad(
            plane, ((0, need_h - ph), (0, need_w - pw)), mode="edge"
        ) if (need_h > ph or need_w > pw) else plane[:need_h, :need_w]
        blocks.append(_quantized_blocks(plane, qt_raster[tq]))

    if progressive and restart_interval:
        raise ValueError("restart markers unsupported with progressive=True")

    enc_dc = [_huff_encode_table(_HUFF_DC_LUMA), _huff_encode_table(_HUFF_DC_CHROMA)]
    enc_ac = [_huff_encode_table(_HUFF_AC_LUMA), _huff_encode_table(_HUFF_AC_CHROMA)]
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    zz_idx = np.asarray(_ZIGZAG)
    # per-component zigzag-order coefficient grids (shared by both
    # entropy-coding modes)
    zzblocks = [
        blocks[ci].reshape(blocks[ci].shape[0], blocks[ci].shape[1], 64)[
            :, :, zz_idx
        ]
        for ci in range(len(comps))
    ]

    def _mcu_blocks():
        for my in range(mcuy):
            for mx in range(mcux):
                for ci, (cid, h, v, tq) in enumerate(comps):
                    for by in range(v):
                        for bx in range(h):
                            yield ci, zzblocks[ci][my * v + by, mx * h + bx]

    def _comp_blocks(ci):
        # non-interleaved scans cover the component's OWN block
        # grid: ceil(ceil(width*h/hmax)/8) x ceil(ceil(height*v/vmax)/8)
        _, h, v, _ = comps[ci]
        cw = -(-(width * h) // hmax)
        ch = -(-(height * v) // vmax)
        for by in range(-(-ch // 8)):
            for bx in range(-(-cw // 8)):
                yield zzblocks[ci][by, bx]

    # arithmetic conditioning (emitted in DAC, consumed by the coder):
    # table 0 keeps the T.81 defaults, table 1 is deliberately
    # non-default so decoders must actually parse the DAC segment
    cond_dc = {0: (0, 1), 1: (0, 2)}  # DC (L, U)
    cond_ac = {0: 5, 1: 4}  # AC Kx

    def _fresh_arith():
        return (
            _ArithEncoder(),
            {t: bytearray(64) for t in (0, 1)},
            {t: bytearray(256) for t in (0, 1)},
            bytearray((_ARITH_FIXED,)),
            [[0, 0] for _ in comps],
        )

    scans: list[tuple[list[int], int, int, int, int, bytes]] = []
    if arithmetic and not progressive:
        enc, dc_stats, ac_stats, fixed, dc_state = _fresh_arith()
        buf = bytearray()
        n_mcu = 0
        rst = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                    buf += enc.finish()
                    buf += bytes((0xFF, 0xD0 + rst))
                    rst = (rst + 1) % 8
                    enc, dc_stats, ac_stats, fixed, dc_state = _fresh_arith()
                for ci, (cid, h, v, tq) in enumerate(comps):
                    tab = 0 if ci == 0 else 1
                    lo, up = cond_dc[tab]
                    for by in range(v):
                        for bx in range(h):
                            zz = zzblocks[ci][my * v + by, mx * h + bx]
                            _arith_encode_dc(
                                enc, dc_stats[tab], dc_state[ci], lo, up,
                                int(zz[0]),
                            )
                            _arith_encode_ac(
                                enc, ac_stats[tab], fixed, zz, 1, 63, 0,
                                cond_ac[tab],
                            )
                n_mcu += 1
        buf += enc.finish()
        scans.append((list(range(len(comps))), 0, 63, 0, 0, bytes(buf)))
    elif arithmetic:
        # progressive arithmetic (SOF10): same scan script as the
        # Huffman progressive path — DC first at Al=1, AC bands first
        # at Al=1, then DC/AC refinement to Al=0 — with the Annex F
        # models in place of run/size Huffman coding (no EOBRUN: the
        # end-of-band decision is per block)
        al0 = 1
        enc, dc_stats, _, fixed, dc_state = _fresh_arith()
        for ci, zz in _mcu_blocks():
            tab = 0 if ci == 0 else 1
            lo, up = cond_dc[tab]
            _arith_encode_dc(
                enc, dc_stats[tab], dc_state[ci], lo, up, int(zz[0]) >> al0
            )
        scans.append((list(range(len(comps))), 0, 0, 0, al0, enc.finish()))
        for ss_, se_ in ((1, 5), (6, 63)):
            for ci in range(len(comps)):
                tab = 0 if ci == 0 else 1
                enc = _ArithEncoder()
                ac_st = bytearray(256)
                fixed = bytearray((_ARITH_FIXED,))
                for zz in _comp_blocks(ci):
                    _arith_encode_ac(
                        enc, ac_st, fixed, zz, ss_, se_, al0, cond_ac[tab]
                    )
                scans.append(([ci], ss_, se_, 0, al0, enc.finish()))
        enc = _ArithEncoder()
        fixed = bytearray((_ARITH_FIXED,))
        for ci, zz in _mcu_blocks():
            enc.encode(fixed, 0, int(zz[0]) & 1)  # DC refinement bit
        scans.append((list(range(len(comps))), 0, 0, al0, 0, enc.finish()))
        for ci in range(len(comps)):
            enc = _ArithEncoder()
            ac_st = bytearray(256)
            fixed = bytearray((_ARITH_FIXED,))
            for zz in _comp_blocks(ci):
                _arith_encode_ac_refine(enc, ac_st, fixed, zz, 1, 63, 0)
            scans.append(([ci], 1, 63, al0, 0, enc.finish()))
    elif not progressive:
        w = _JpegBitWriter()
        dc_prev = [0] * len(comps)
        n_mcu = 0
        rst = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                    w.flush()
                    w.buf += bytes((0xFF, 0xD0 + rst))
                    rst = (rst + 1) % 8
                    dc_prev = [0] * len(comps)
                for ci, (cid, h, v, tq) in enumerate(comps):
                    tab = 0 if ci == 0 else 1
                    for by in range(v):
                        for bx in range(h):
                            zz = zzblocks[ci][my * v + by, mx * h + bx]
                            diff = int(zz[0]) - dc_prev[ci]
                            dc_prev[ci] = int(zz[0])
                            size, bits = _mag_bits(diff)
                            code, ln = enc_dc[tab][size]
                            w.write(code, ln)
                            w.write(bits, size)
                            run = 0
                            last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
                            for k in range(1, 64):
                                val = int(zz[k])
                                if val == 0:
                                    run += 1
                                    continue
                                while run > 15:
                                    code, ln = enc_ac[tab][0xF0]
                                    w.write(code, ln)
                                    run -= 16
                                size, bits = _mag_bits(val)
                                code, ln = enc_ac[tab][(run << 4) | size]
                                w.write(code, ln)
                                w.write(bits, size)
                                run = 0
                            if last_nz < 63:
                                code, ln = enc_ac[tab][0x00]  # EOB
                                w.write(code, ln)
                n_mcu += 1
        w.flush()
        scans.append((list(range(len(comps))), 0, 63, 0, 0, bytes(w.buf)))
    else:
        flat_ac = _huff_encode_table(_HUFF_AC_FLAT)
        al0 = 1  # first scans at Al=1, refinements complete to Al=0

        # 1) DC first scan (interleaved), Al=1: diffs of (DC >> 1)
        w = _JpegBitWriter()
        dc_prev = [0] * len(comps)
        for ci, zz in _mcu_blocks():
            tab = 0 if ci == 0 else 1
            scaled = int(zz[0]) >> al0
            diff = scaled - dc_prev[ci]
            dc_prev[ci] = scaled
            size, bits = _mag_bits(diff)
            code, ln = enc_dc[tab][size]
            w.write(code, ln)
            w.write(bits, size)
        w.flush()
        scans.append((list(range(len(comps))), 0, 0, 0, al0, bytes(w.buf)))
        # 2) AC first scans per component: spectral bands 1-5, 6-63
        for ss, se in ((1, 5), (6, 63)):
            for ci in range(len(comps)):
                w = _JpegBitWriter()
                eobrun = 0
                for zz in _comp_blocks(ci):
                    eobrun = _encode_block_ac_first(
                        w, flat_ac, zz, ss, se, al0, eobrun
                    )
                eobrun, _ = _flush_eobrun(w, flat_ac, eobrun, [])
                w.flush()
                scans.append(([ci], ss, se, 0, al0, bytes(w.buf)))
        # 3) DC refinement scan (interleaved), Ah=1 -> Al=0: raw bits
        w = _JpegBitWriter()
        for ci, zz in _mcu_blocks():
            w.write((int(zz[0]) >> 0) & 1, 1)
        w.flush()
        scans.append((list(range(len(comps))), 0, 0, al0, 0, bytes(w.buf)))
        # 4) AC refinement scans per component, band 1-63, Ah=1 -> Al=0
        for ci in range(len(comps)):
            w = _JpegBitWriter()
            eobrun = 0
            bbuf: list[int] = []
            for zz in _comp_blocks(ci):
                eobrun, bbuf = _encode_block_ac_refine(
                    w, flat_ac, zz, 1, 63, 0, eobrun, bbuf
                )
            eobrun, bbuf = _flush_eobrun(w, flat_ac, eobrun, bbuf)
            w.flush()
            scans.append(([ci], 1, 63, al0, 0, bytes(w.buf)))

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    if colorspace is not None:
        transform = 2 if colorspace == "ycck" else 0
        app14 = b"Adobe" + struct.pack(">HHHB", 0x65, 0, 0, transform)
        out += b"\xff\xee" + struct.pack(">H", 2 + len(app14)) + app14
    n_qt = 1 if gray else 2
    for tq in range(n_qt):
        # tables are stored in ZIGZAG order
        body = bytes([tq]) + bytes(int(qts[tq][zz_idx[k]]) for k in range(64))
        out += b"\xff\xdb" + struct.pack(">H", 2 + len(body)) + body
    sof = bytes([8]) + struct.pack(">HH", height, width) + bytes([len(comps)])
    for cid, h, v, tq in comps:
        sof += bytes([cid, (h << 4) | v, tq])
    if arithmetic:
        sof_marker = b"\xff\xca" if progressive else b"\xff\xc9"
    else:
        sof_marker = b"\xff\xc2" if progressive else b"\xff\xc0"
    out += sof_marker + struct.pack(">H", 2 + len(sof)) + sof
    if arithmetic:
        # DAC conditioning instead of Huffman tables (B.2.4.3)
        dac = bytearray()
        for t in (0,) if gray else (0, 1):
            lo, up = cond_dc[t]
            dac += bytes(((0 << 4) | t, (up << 4) | lo))
        for t in (0,) if gray else (0, 1):
            dac += bytes(((1 << 4) | t, cond_ac[t]))
        out += b"\xff\xcc" + struct.pack(">H", 2 + len(dac)) + bytes(dac)
    else:
        huff_specs = [(0, 0, _HUFF_DC_LUMA)]
        if progressive:
            huff_specs += [(1, 0, _HUFF_AC_FLAT)]
        else:
            huff_specs += [(1, 0, _HUFF_AC_LUMA)]
        if not gray:
            huff_specs += [(0, 1, _HUFF_DC_CHROMA)]
            if not progressive:
                huff_specs += [(1, 1, _HUFF_AC_CHROMA)]
        for cls, tid, (bits, vals) in huff_specs:
            body = bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals)
            out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    for comp_idxs, ss, se, ah, al, buf in scans:
        sos = bytes([len(comp_idxs)])
        for ci in comp_idxs:
            cid = comps[ci][0]
            dc_tab = 0 if ci == 0 else 1
            ac_tab = dc_tab if arithmetic else (0 if progressive else dc_tab)
            sos += bytes([cid, (dc_tab << 4) | ac_tab])
        sos += bytes([ss, se, (ah << 4) | al])
        out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
        out += buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _JpegBitReader:
    """MSB-first bit reader over the entropy-coded segment, undoing
    byte stuffing; hitting a non-RST marker mid-symbol means the scan
    was truncated."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.d = data
        self.p = pos
        self.acc = 0
        self.n = 0

    def _byte(self) -> int:
        d, p = self.d, self.p
        if p >= len(d):
            raise ValueError("truncated JPEG scan")
        b = d[p]
        if b == 0xFF:
            if p + 1 < len(d) and d[p + 1] == 0x00:
                self.p = p + 2
                return 0xFF
            raise ValueError("marker inside entropy-coded segment (truncated scan)")
        self.p = p + 1
        return b

    def bit(self) -> int:
        if self.n == 0:
            self.acc = self._byte()
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def receive(self, size: int) -> int:
        v = 0
        for _ in range(size):
            v = (v << 1) | self.bit()
        return v

    def restart(self) -> None:
        """Consume an RSTn marker at a restart boundary (byte-aligned)."""
        self.n = 0
        d, p = self.d, self.p
        if p + 1 >= len(d) or d[p] != 0xFF or not (0xD0 <= d[p + 1] <= 0xD7):
            raise ValueError("expected RST marker at restart interval")
        self.p = p + 2


def _jpeg_decode_sym(r: _JpegBitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _jpeg_extend(v: int, size: int) -> int:
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _block_sequential(r: _JpegBitReader, zz, dct, act, dc_pred: int) -> int:
    """One sequential-Huffman block (DC diff + AC runs) into ``zz``
    (zigzag-order int array); returns the new DC predictor."""
    size = _jpeg_decode_sym(r, dct)
    diff = _jpeg_extend(r.receive(size), size)
    dc = dc_pred + diff
    zz[0] = dc
    k = 1
    while k < 64:
        rs = _jpeg_decode_sym(r, act)
        run, size = rs >> 4, rs & 15
        if size == 0:
            if run == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += run
        if k > 63:
            raise ValueError("JPEG AC run past block end")
        zz[k] = _jpeg_extend(r.receive(size), size)
        k += 1
    return dc


def _block_ac_first(
    r: _JpegBitReader, zz, act, ss: int, se: int, al: int, eobrun: int
) -> int:
    """Progressive AC first scan (Ah=0) for one block: run/size coding
    of the band with EOB-run folding (T.81 G.1.2.2); returns the
    updated EOBRUN."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _jpeg_decode_sym(r, act)
        run, size = rs >> 4, rs & 15
        if size == 0:
            if run == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << run) - 1
            if run:
                eobrun += r.receive(run)
            break
        k += run
        if k > se:
            raise ValueError("JPEG AC run past band end")
        zz[k] = _jpeg_extend(r.receive(size), size) << al
        k += 1
    return eobrun


def _block_ac_refine(
    r: _JpegBitReader, zz, act, ss: int, se: int, al: int, eobrun: int
) -> int:
    """Progressive AC refinement scan (Ah=Al+1) for one block: newly
    significant coefficients arrive as ±1<<Al with zero-run counting
    over zero-HISTORY positions only; every already-nonzero
    coefficient in the band consumes one correction bit (T.81
    G.1.2.3, the libjpeg decode_mcu_AC_refine shape); returns the
    updated EOBRUN."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _jpeg_decode_sym(r, act)
            run, size = rs >> 4, rs & 15
            val = 0
            if size == 0:
                if run != 15:
                    eobrun = 1 << run
                    if run:
                        eobrun += r.receive(run)
                    break  # current block finishes in the EOBRUN pass
                # run == 15: ZRL — skip 16 zero-history positions
            else:
                if size != 1:
                    raise ValueError("bad AC refinement magnitude")
                val = p1 if r.bit() else m1
            while k <= se:
                if zz[k] != 0:
                    if r.bit() and (zz[k] & p1) == 0:
                        zz[k] += p1 if zz[k] >= 0 else m1
                else:
                    if run == 0:
                        break
                    run -= 1
                k += 1
            if val and k <= se:
                zz[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:  # correction bits for the rest of the band
            if zz[k] != 0:
                if r.bit() and (zz[k] & p1) == 0:
                    zz[k] += p1 if zz[k] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _decode_jpeg(data: bytes) -> tuple[int, int]:
    """(luma checksum, pixel count) of a Huffman-coded JPEG — real
    marker walk, canonical Huffman decode, dequant, IDCT, 4:2:0/4:2:2
    chroma upsampling, restart markers.  Handles BASELINE/extended
    sequential (SOF0/1) and PROGRESSIVE (SOF2: spectral selection AND
    successive approximation — DC/AC first + refinement scans, EOBRUN)
    streams: every scan accumulates into per-component coefficient
    buffers and dequant/IDCT run once at the end, so a sequential
    stream is simply the one-scan special case of the same machinery.
    Same integer ITU-R 601 luma convention as the other image decoders
    (computed from the reconstructed RGB, so cross-format checksums
    are COMPARABLE under the codec's loss, not bit-equal — JPEG is
    lossy).  DCT arithmetic coding (SOF9/10) decodes through the T.81
    Annex D/F coder defined above; lossless/hierarchical/differential
    processes (SOF3/5/6/7/11/13-15) raise NotImplementedError into the
    library gate."""
    import struct

    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    qt: dict[int, "np.ndarray"] = {}
    huff: dict[tuple[int, int], dict] = {}
    comps: list[tuple[int, int, int, int]] = []
    width = height = 0
    dri = 0
    progressive = False
    arith = False
    adobe_transform = None  # APP14: 0 = no transform (RGB/CMYK), 1 = YCbCr, 2 = YCCK
    dac_dc: dict[int, tuple[int, int]] = {}
    dac_ac: dict[int, int] = {}
    coefs: dict[int, "np.ndarray"] = {}
    cgrid: dict[int, tuple[int, int]] = {}  # cid -> non-interleaved (bh, bw)
    hmax = vmax = mcux = mcuy = 0
    saw_scan = False
    pos = 2
    while pos + 1 < len(data):
        if data[pos] != 0xFF:
            raise ValueError("bad JPEG marker sync")
        # skip 0xFF fill bytes (T.81 §B.1.1.2: legal padding before
        # any marker; third-party encoders emit them for alignment)
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        if pos + 1 >= len(data):
            break
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01, *range(0xD0, 0xD8)):  # standalone
            continue
        if pos + 2 > len(data):
            raise ValueError("truncated JPEG segment")
        seglen = struct.unpack_from(">H", data, pos)[0]
        body = data[pos + 2 : pos + seglen]
        if len(body) != seglen - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 15
                if pq != 0:
                    raise NotImplementedError("16-bit JPEG quant tables")
                zz = np.frombuffer(body[i + 1 : i + 65], np.uint8).astype(np.int64)
                raster = np.zeros(64, np.int64)
                raster[np.asarray(_ZIGZAG)] = zz
                qt[tq] = raster.reshape(8, 8)
                i += 65
        elif marker == 0xC4:  # DHT (progressive streams redefine these)
            i = 0
            while i < len(body):
                cls, tid = body[i] >> 4, body[i] & 15
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                huff[(cls, tid)] = _huff_decode_table(bits, vals)
                i += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2, 0xC9, 0xCA):
            # Huffman sequential/progressive (SOF0/1/2) and arithmetic
            # sequential/progressive (SOF9/10) share the frame shape;
            # only the entropy layer differs
            progressive = marker in (0xC2, 0xCA)
            arith = marker in (0xC9, 0xCA)
            height, width = struct.unpack_from(">HH", body, 1)
            nf = body[5]
            comps = []
            for ci in range(nf):
                cid, hv, tq = body[6 + 3 * ci : 9 + 3 * ci]
                comps.append((cid, hv >> 4, hv & 15, tq))
            hmax = max(h for _, h, _, _ in comps)
            vmax = max(v for _, _, v, _ in comps)
            mcux = -(-width // (8 * hmax))
            mcuy = -(-height // (8 * vmax))
            for cid, h, v, _ in comps:
                coefs[cid] = np.zeros((mcuy * v, mcux * h, 64), np.int64)
                cw = -(-(width * h) // hmax)  # ceil(width*h/hmax)
                ch = -(-(height * v) // vmax)
                cgrid[cid] = (-(-ch // 8), -(-cw // 8))
        elif marker in (0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "lossless/differential arithmetic JPEG (SOF11/13-15) — "
                "needs a codec library (PIL)"
            )
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7):
            raise NotImplementedError("lossless/hierarchical JPEG coding process")
        elif marker == 0xCC:  # DAC — arithmetic conditioning (B.2.4.3)
            i = 0
            while i + 1 < len(body):
                tc, tb = body[i] >> 4, body[i] & 15
                val = body[i + 1]
                i += 2
                if tc == 0:
                    lo, up = val & 15, val >> 4
                    if up < lo:
                        raise ValueError("bad DAC DC conditioning (U < L)")
                    dac_dc[tb] = (lo, up)
                else:
                    if not 1 <= val <= 63:
                        raise ValueError("bad DAC AC conditioning Kx")
                    dac_ac[tb] = val
        elif marker == 0xEE and body[:5] == b"Adobe":  # APP14 color transform
            adobe_transform = body[11] if len(body) > 11 else 0
        elif marker == 0xDD:  # DRI
            dri = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:  # SOS — decode the scan in place
            if not comps:
                raise ValueError("JPEG SOS before SOF")
            ns = body[0]
            scomps = []
            for ci in range(ns):
                cid, tt = body[1 + 2 * ci : 3 + 2 * ci]
                scomps.append((cid, tt >> 4, tt & 15))
            ss, se, a = body[1 + 2 * ns : 4 + 2 * ns]
            ah, al = a >> 4, a & 15
            if arith:
                pos = _decode_jpeg_scan_arith(
                    data, pos + seglen, comps, scomps, ss, se, ah, al,
                    progressive, coefs, cgrid, dac_dc, dac_ac, dri,
                    mcux, mcuy,
                )
            else:
                pos = _decode_jpeg_scan(
                    data, pos + seglen, comps, scomps, ss, se, ah, al,
                    progressive, coefs, cgrid, huff, dri, mcux, mcuy,
                )
            saw_scan = True
            continue
        pos += seglen
    if not saw_scan or not comps or not width:
        raise ValueError("JPEG stream without SOF/SOS")

    # dequant + IDCT once, over the accumulated coefficient buffers
    c = _dct_matrix()
    zz_idx = np.asarray(_ZIGZAG)
    planes: dict[int, "np.ndarray"] = {}
    for cid, h, v, tq in comps:
        zzc = coefs[cid]  # (bh, bw, 64), zigzag order
        raster = np.zeros(zzc.shape, np.float64)
        raster[:, :, zz_idx] = zzc * qt[tq].reshape(64)[zz_idx]
        blocks = raster.reshape(zzc.shape[0], zzc.shape[1], 8, 8)
        px = np.einsum("ji,rcjk,kl->rcil", c, blocks, c) + 128.0
        planes[cid] = px.transpose(0, 2, 1, 3).reshape(
            zzc.shape[0] * 8, zzc.shape[1] * 8
        )

    full = {}
    for cid, h, v, _ in comps:
        p = planes[cid]
        if h < hmax or v < vmax:
            p = np.repeat(np.repeat(p, vmax // v, axis=0), hmax // h, axis=1)
        full[cid] = np.clip(np.round(p[:height, :width]), 0, 255).astype(np.int64)
    def _ycc_to_rgb(y_id, cb_id, cr_id):
        yy = planes[y_id][:height, :width]
        cb = full[cb_id].astype(np.float64)
        cr = full[cr_id].astype(np.float64)
        rf = np.clip(np.round(yy + 1.402 * (cr - 128.0)), 0, 255).astype(np.int64)
        gf = np.clip(
            np.round(yy - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)), 0, 255
        ).astype(np.int64)
        bf = np.clip(np.round(yy + 1.772 * (cb - 128.0)), 0, 255).astype(np.int64)
        return rf, gf, bf

    ids = [cid for cid, *_ in comps]
    if len(comps) == 1:
        luma = full[ids[0]]
    elif len(comps) == 3:
        if adobe_transform == 0 or ids == [0x52, 0x47, 0x42]:
            # plain RGB, signalled by APP14 transform 0 or by the
            # 'R','G','B' component IDs (both conventions are real)
            rf, gf, bf = (full[i] for i in ids)
        else:
            rf, gf, bf = _ycc_to_rgb(*ids)
        luma = (299 * rf + 587 * gf + 114 * bf) // 1000
    elif len(comps) == 4:
        # Adobe CMYK conventions: ink values are stored INVERTED
        # (255 = no ink); transform 2 (YCCK) additionally runs the
        # inverted CMY through the YCbCr transform.  Brightness is
        # then RGB = stored_ink * stored_K / 255 per channel.
        if adobe_transform == 2:
            cf, mf, yf = _ycc_to_rgb(ids[0], ids[1], ids[2])
        else:
            cf, mf, yf = (full[i] for i in ids[:3])
        kf = full[ids[3]]
        rf = (cf * kf) // 255
        gf = (mf * kf) // 255
        bf = (yf * kf) // 255
        luma = (299 * rf + 587 * gf + 114 * bf) // 1000
    else:
        raise ValueError(f"unsupported JPEG component count {len(comps)}")
    return int(luma.sum()), int(width * height)


def _decode_jpeg_scan(
    data: bytes,
    pos: int,
    comps,
    scomps,
    ss: int,
    se: int,
    ah: int,
    al: int,
    progressive: bool,
    coefs,
    cgrid,
    huff,
    dri: int,
    mcux: int,
    mcuy: int,
) -> int:
    """Decode one entropy-coded scan into the coefficient buffers and
    return the position of the marker that follows it.  Sequential
    scans must cover the full band untransformed; progressive scans
    follow the T.81 G.1 constraints (DC scans interleavable, AC scans
    single-component over the component's own block grid)."""
    if not progressive and (ss, se, ah, al) != (0, 63, 0, 0):
        raise ValueError("bad sequential JPEG scan header")
    if progressive:
        if ss == 0 and se != 0:
            raise ValueError("progressive DC scan with Se != 0")
        if ss > 0 and len(scomps) != 1:
            raise ValueError("interleaved progressive AC scan")
        if ss > se or se > 63:
            raise ValueError("bad spectral band")
    by_cid = {cid: (h, v, tq) for cid, h, v, tq in comps}
    for cid, _, _ in scomps:
        if cid not in by_cid:
            raise ValueError("scan references unknown component")
    r = _JpegBitReader(data, pos)
    dc_prev = {cid: 0 for cid, _, _ in scomps}
    eobrun = 0
    n_unit = 0

    def _maybe_restart() -> None:
        nonlocal dc_prev, eobrun
        if dri and n_unit and n_unit % dri == 0:
            r.restart()
            dc_prev = {cid: 0 for cid, _, _ in scomps}
            eobrun = 0

    if len(scomps) > 1 or (progressive and ss == 0):
        # MCU-interleaved (all sequential multi-comp scans + DC scans)
        for my in range(mcuy):
            for mx in range(mcux):
                _maybe_restart()
                for cid, td, ta in scomps:
                    h, v, _ = by_cid[cid]
                    for by in range(v):
                        for bx in range(h):
                            zz = coefs[cid][my * v + by, mx * h + bx]
                            if not progressive:
                                dc_prev[cid] = _block_sequential(
                                    r, zz, huff[(0, td)], huff[(1, ta)],
                                    dc_prev[cid],
                                )
                            elif ah == 0:  # DC first
                                size = _jpeg_decode_sym(r, huff[(0, td)])
                                diff = _jpeg_extend(r.receive(size), size)
                                dc_prev[cid] += diff
                                zz[0] = dc_prev[cid] << al
                            else:  # DC refinement: one raw bit
                                if r.bit():
                                    zz[0] |= 1 << al
                n_unit += 1
    else:
        # single-component scan over the component's OWN block grid
        cid, td, ta = scomps[0]
        bh, bw = cgrid[cid]
        for by in range(bh):
            for bx in range(bw):
                _maybe_restart()
                zz = coefs[cid][by, bx]
                if not progressive:
                    dc_prev[cid] = _block_sequential(
                        r, zz, huff[(0, td)], huff[(1, ta)], dc_prev[cid]
                    )
                elif ah == 0:
                    eobrun = _block_ac_first(
                        r, zz, huff[(1, ta)], ss, se, al, eobrun
                    )
                else:
                    eobrun = _block_ac_refine(
                        r, zz, huff[(1, ta)], ss, se, al, eobrun
                    )
                n_unit += 1
    return _jpeg_next_marker(data, r.p)
