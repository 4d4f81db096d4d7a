"""Multimodal columns: image/audio/video as opaque binary columns with
typed metadata, processed via Arrow-batched pandas operators.

The Spark-side plumbing (schemas, batch iterator shape, partition
behavior) is real and tested.  The real-decode path is GENUINE for the
formats a stdlib+numpy environment can parse — 24-bit BMP images
(struct header + pixel-array math), 8-bit PNG images (REAL compressed
decode: chunk walk, stdlib-zlib DEFLATE inflate, all five scanline
unfilters), PCM WAV audio (stdlib ``wave``), and YUV4MPEG2 (y4m) video
(header parse + frame walk) — and library-gated for the remaining
compressed formats: JPEG needs PIL, FLAC/OGG need soundfile, MP4 needs
av, none of which ship in this container, so those rows raise
NotImplementedError loudly (the probe + skip-marked test light the
seam up the moment the libraries appear).  Swapping in PIL/ffmpeg
changes only the inner per-format branch, not the Spark plan.

Design for 100 TB: binary payloads ride the DataFrame as parquet binary
columns (or references to object-store keys for >100 MB blobs);
`mapInPandas` keeps the data in Arrow record batches end to end, one
Python worker per core, and `maxRecordsPerBatch` bounds peak memory
(decode blow-up factor x batch size).  Feature extraction emits small
fixed-width arrays, so the shuffle after extraction is tiny relative to
the scan.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("data", T.BinaryType(), False),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ]
)

DECODED_SCHEMA = (
    "media_id long, kind string, n_bytes int, checksum long, "
    "pixels_or_samples long"
)

FEATURE_DIM = 16
FEATURE_SCHEMA = f"media_id long, feature array<float>"


def synthesize_media(spark: SparkSession, n: int = 64, seed: int = 7) -> DataFrame:
    """Deterministic fake media table for tests: payload bytes derive
    from (seed, media_id), so every run and every engine sees identical
    binaries."""
    rng = np.random.RandomState(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        size = int(rng.randint(256, 2048))
        data = bytes(bytearray((i * 131 + j * 7) % 256 for j in range(size)))
        rows.append(
            (
                i,
                kind,
                data,
                # jpeg/mp4 are library-gated (fake bytes must route to
                # the loud NotImplementedError, not a stdlib decoder)
                {"image": "jpeg", "audio": "wav", "video": "mp4"}[kind],
                64 if kind != "audio" else None,
                48 if kind != "audio" else None,
                1000 if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


# Formats the real decoder parses with stdlib + numpy alone — no
# external codec library involved.
STDLIB_FORMATS = {"bmp", "png", "gif", "wav", "y4m"}


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


def make_png(width: int, height: int, rgb_fn, row_filters=None) -> bytes:
    """A GENUINE 8-bit RGB PNG via stdlib ``zlib`` — real DEFLATE
    stream, real CRCs.  ``row_filters`` picks the PNG scanline filter
    per row (default cycles 0..4), so a decoder must implement every
    unfilter path, not just the trivial one."""
    import struct
    import zlib

    ch = 3
    stride = width * ch
    filters = row_filters or [0, 1, 2, 3, 4]
    prev = bytes(stride)
    raw = bytearray()
    for y in range(height):
        cur = bytearray()
        for x in range(width):
            r, g, b = rgb_fn(x, y)
            cur += bytes((r & 255, g & 255, b & 255))
        f = filters[y % len(filters)]
        enc = bytearray(stride)
        for x in range(stride):
            a = cur[x - ch] if x >= ch else 0
            up = prev[x]
            c = prev[x - ch] if x >= ch else 0
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
        raw += bytes([f]) + bytes(enc)
        prev = bytes(cur)

    def chunk(typ: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + typ
            + body
            + struct.pack(">I", zlib.crc32(typ + body))
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
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


def make_gif(width: int, height: int, rgb_fn) -> bytes:
    """A GENUINE GIF89a (global color table + real LZW-compressed
    pixel indices) — stdlib-only.  ``rgb_fn`` may use at most 256
    distinct colors (GIF is palettized)."""
    import struct

    palette: dict[tuple, int] = {}
    indices = []
    for y in range(height):
        for x in range(width):
            r, g, b = rgb_fn(x, y)
            c = (r & 255, g & 255, b & 255)
            if c not in palette:
                if len(palette) == 256:
                    raise ValueError("GIF needs <= 256 distinct colors")
                palette[c] = len(palette)
            indices.append(palette[c])
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
        + struct.pack("<HHHHB", 0, 0, width, height, 0)
        + bytes([min_code])
        + bytes(blocks)
        + b"\x3b"
    )


def make_wav(samples, rate: int = 8000, channels: int = 1) -> bytes:
    """A genuine PCM16 WAV via the stdlib ``wave`` writer."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


def make_y4m(width: int, height: int, n_frames: int, fill_fn) -> bytes:
    """A genuine YUV4MPEG2 stream (C420: each frame is W*H luma bytes +
    2 quarter-size chroma planes).  ``fill_fn(frame, j) -> int`` fills
    byte j of the frame payload."""
    head = f"YUV4MPEG2 W{width} H{height} F25:1 Ip A1:1 C420\n".encode()
    fsize = width * height * 3 // 2
    frames = [
        b"FRAME\n" + bytes(bytearray(fill_fn(i, j) % 256 for j in range(fsize)))
        for i in range(n_frames)
    ]
    return head + b"".join(frames)


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


def _decode_png(data: bytes) -> tuple[int, int]:
    """(luma checksum, pixel count) of an 8-bit non-interlaced
    grey/grey+alpha/RGB/RGBA PNG — a REAL compressed-image decode with
    nothing but stdlib zlib + numpy: chunk walk, DEFLATE inflate, and
    all five scanline unfilters (None/Sub/Up/Average/Paeth).  Same
    integer ITU-R 601 luma as :func:`_decode_bmp`, so one image
    encoded both ways checksums identically (tested).  Palette,
    16-bit, and interlaced PNGs raise NotImplementedError (rare in
    crawl data; PIL takes over when present)."""
    import struct
    import zlib

    data = bytes(data)
    if data[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos, idat, ihdr = 8, b"", None
    while pos + 8 <= len(data):
        ln, typ = struct.unpack_from(">I4s", data, pos)
        body = data[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif typ == b"IDAT":
            idat += body
        elif typ == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG without IHDR")
    w, h, depth, ct, _comp, _filt, interlace = ihdr
    if depth != 8 or interlace != 0 or ct not in (0, 2, 4, 6):
        raise NotImplementedError(
            f"only 8-bit non-interlaced grey/RGB(A) PNG "
            f"(depth={depth}, color={ct}, interlace={interlace})"
        )
    ch = {0: 1, 2: 3, 4: 2, 6: 4}[ct]
    raw = zlib.decompress(idat)
    stride = w * ch
    if len(raw) != (stride + 1) * h:
        raise ValueError("truncated PNG pixel data")
    out = np.zeros((h, stride), dtype=np.int64)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, np.uint8, stride, y * (stride + 1) + 1
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
                a = int(cur[x - ch]) if x >= ch else 0
                up = int(prev[x])
                c = int(prev[x - ch]) if x >= ch else 0
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
    px = out.reshape(h, w, ch)
    if ct in (0, 4):
        luma = px[:, :, 0]
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
    """(luma checksum, pixel count) of a non-interlaced GIF87a/89a —
    a second REAL compressed-image decode with stdlib + numpy only:
    block walk, full LZW decompression (variable code width, clear
    codes, KwKwK), palette lookup.  Same integer ITU-R 601 luma as
    the BMP/PNG decoders, so one image encoded all three ways
    checksums identically (tested).  Multi-image GIFs sum over every
    frame; interlaced images raise NotImplementedError."""
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
        if ipacked & 0x40:
            raise NotImplementedError("interlaced GIF")
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
        idx = np.asarray(indices[: iw * ih], dtype=np.int64)
        pal = np.frombuffer(table, np.uint8).reshape(-1, 3).astype(np.int64)
        px = pal[idx]
        luma_sum += int(
            ((299 * px[:, 0] + 587 * px[:, 1] + 114 * px[:, 2]) // 1000).sum()
        )
        pixels += iw * ih
    return luma_sum, pixels


_IMA_INDEX = [-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8]
_IMA_STEPS = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]


def _ima_step(predictor: int, index: int, nibble: int) -> tuple[int, int]:
    """One IMA-ADPCM state transition (shared by encode and decode, so
    the encoder's predictor tracks the decoder's exactly)."""
    step = _IMA_STEPS[index]
    diff = step >> 3
    if nibble & 4:
        diff += step
    if nibble & 2:
        diff += step >> 1
    if nibble & 1:
        diff += step >> 2
    predictor = predictor - diff if nibble & 8 else predictor + diff
    predictor = max(-32768, min(32767, predictor))
    index = max(0, min(88, index + _IMA_INDEX[nibble]))
    return predictor, index


def make_adpcm_wav(samples, rate: int = 8000) -> bytes:
    """A GENUINE mono IMA-ADPCM WAV (format tag 0x0011, one data
    block): 4 bits per sample vs PCM16's 16 — real compressed audio
    with no codec library.  Block layout per the IMA spec: a 4-byte
    header (first sample verbatim + step index) then nibble pairs for
    the remaining samples."""
    import struct

    s = [int(x) for x in samples]
    if not s:
        raise ValueError("need at least one sample")
    predictor, index = s[0], 0
    nibbles = []
    for x in s[1:]:
        step = _IMA_STEPS[index]
        delta = x - predictor
        n = 8 if delta < 0 else 0
        delta = abs(delta)
        if delta >= step:
            n |= 4
            delta -= step
        if delta >= step >> 1:
            n |= 2
            delta -= step >> 1
        if delta >= step >> 2:
            n |= 1
        predictor, index = _ima_step(predictor, index, n)
        nibbles.append(n)
    payload = bytearray(struct.pack("<hBB", s[0], 0, 0))
    for i in range(0, len(nibbles), 2):
        lo = nibbles[i]
        hi = nibbles[i + 1] if i + 1 < len(nibbles) else 0
        payload.append(lo | (hi << 4))
    block_align = len(payload)
    fmt = struct.pack(
        "<HHIIHHHH",
        0x0011,  # WAVE_FORMAT_IMA_ADPCM
        1,  # mono
        rate,
        rate * block_align // max(len(s), 1),
        block_align,
        4,  # bits per sample
        2,  # cbSize
        len(s),  # samples per block
    )
    data = bytes(payload)
    riff = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<II", 4, len(s))
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def _decode_adpcm_wav(data: bytes) -> tuple[int, int]:
    """(sum of |samples|, sample count) of a mono IMA-ADPCM WAV — a
    REAL compressed-audio decode with stdlib struct only: RIFF chunk
    walk, per-block header, 4-bit nibble expansion through the shared
    IMA state machine."""
    import struct

    data = bytes(data)
    pos, end = 12, len(data)
    fmt = None
    frames = None
    blocks = b""
    while pos + 8 <= end:
        cid, ln = struct.unpack_from("<4sI", data, pos)
        body = data[pos + 8 : pos + 8 + ln]
        pos += 8 + ln + (ln & 1)
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
            if len(body) >= 20:
                frames = struct.unpack_from("<H", body, 18)[0]
        elif cid == b"data":
            blocks = body
    if fmt is None:
        raise ValueError("WAV without fmt chunk")
    tag, channels, _rate, _bps, block_align, bits = fmt
    if tag != 0x0011 or channels != 1 or bits != 4:
        raise NotImplementedError(
            f"only mono 4-bit IMA-ADPCM (tag=0x{tag:04x}, ch={channels})"
        )
    out = []
    for b0 in range(0, len(blocks), block_align):
        block = blocks[b0 : b0 + block_align]
        if len(block) < 4:
            break
        predictor, index = struct.unpack_from("<hB", block, 0)[0], block[2]
        index = max(0, min(88, index))
        vals = [predictor]
        for byte in block[4:]:
            for nib in (byte & 15, byte >> 4):
                predictor, index = _ima_step(predictor, index, nib)
                vals.append(predictor)
        if frames:
            vals = vals[:frames]
        out.extend(vals)
    s = np.asarray(out, dtype=np.int64)
    return int(np.abs(s).sum()), int(s.size)


def _decode_wav(data: bytes) -> tuple[int, int]:
    """(sum of |samples|, sample count) of a WAV: PCM16 via the stdlib
    ``wave`` reader; IMA-ADPCM (format tag 0x0011, which ``wave``
    rejects) via the engine's own block decoder."""
    import io
    import struct
    import wave

    raw_bytes = bytes(data)
    # sniff the fmt tag — wave.open throws an opaque error on non-PCM
    if raw_bytes[:4] == b"RIFF" and b"fmt " in raw_bytes[:64]:
        at = raw_bytes.index(b"fmt ") + 8
        tag = struct.unpack_from("<H", raw_bytes, at)[0]
        if tag == 0x0011:
            return _decode_adpcm_wav(raw_bytes)
    with wave.open(io.BytesIO(raw_bytes)) as w:
        if w.getsampwidth() != 2:
            raise NotImplementedError("only PCM16 WAV")
        raw = w.readframes(w.getnframes())
    s = np.frombuffer(raw, "<i2").astype(np.int64)
    return int(np.abs(s).sum()), int(s.size)


def _decode_y4m(data: bytes) -> tuple[int, int]:
    """(frame count, frame count) of a YUV4MPEG2 stream — the same
    frames-decoded semantics as the av-backed video branch."""
    data = bytes(data)
    nl = data.index(b"\n")
    header = data[:nl].decode("ascii")
    if not header.startswith("YUV4MPEG2"):
        raise ValueError("not a y4m payload")
    params = {p[0]: p[1:] for p in header.split()[1:]}
    # the frame stride below is 4:2:0-specific; a C422/C444 stream
    # walked with it usually raises on a bad FRAME marker but can
    # coincidentally align and return a wrong frame count — reject
    # anything but 420 variants (C420, C420jpeg, C420paldv) up front
    chroma = params.get("C", "420")
    if not chroma.startswith("420"):
        raise NotImplementedError(f"y4m chroma subsampling C{chroma}; only C420*")
    fsize = int(params["W"]) * int(params["H"]) * 3 // 2
    pos, frames = nl + 1, 0
    while pos < len(data):
        if data[pos : pos + 5] != b"FRAME":
            raise ValueError(f"bad FRAME marker at {pos}")
        pos = data.index(b"\n", pos) + 1 + fsize
        frames += 1
    return frames, frames


def synthesize_real_media(spark: SparkSession, n: int = 24) -> DataFrame:
    """Media table whose payloads are GENUINE encodings of the stdlib
    formats (24-bit BMP, PCM16 WAV, y4m) — deterministic content, so
    decode checksums are stable across runs and engines."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        if kind == "image":
            fn = lambda x, y, i=i: (x * 7 + i, y * 11, (x + y) * 3)  # noqa: E731
            # alternate the uncompressed and the compressed image
            # format so one table exercises both real decoders
            if (i // 3) % 2 == 0:
                rows.append((i, kind, make_bmp(16, 10, fn), "bmp", 16, 10, None))
            else:
                rows.append((i, kind, make_png(16, 10, fn), "png", 16, 10, None))
        elif kind == "audio":
            samples = [((j * 37 + i * 101) % 2048) - 1024 for j in range(400)]
            # alternate PCM16 and IMA-ADPCM payloads (both labeled
            # "wav"; the decoder sniffs the fmt tag) so one table
            # exercises the uncompressed AND the compressed audio path
            enc = make_wav if (i // 3) % 2 == 0 else make_adpcm_wav
            rows.append((i, kind, enc(samples), "wav", None, None, 50))
        else:
            data = make_y4m(8, 6, 3 + i % 4, lambda f, j, i=i: f * 31 + j + i)
            rows.append((i, kind, data, "y4m", 8, 6, 1000))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def codec_support() -> dict[str, bool]:
    """Probe which real codec libraries are importable RIGHT NOW.
    The container this ships in has none of them; the probe (and the
    skip-marked test over it) makes the real-decoder seam light up the
    moment PIL / soundfile / av appear, instead of staying silently
    dead behind a hardcoded NotImplementedError."""
    import importlib

    support = {}
    for module, kind in (("PIL.Image", "image"), ("soundfile", "audio"), ("av", "video")):
        try:
            importlib.import_module(module)
            support[kind] = True
        except Exception:
            support[kind] = False
    return support


def _real_decode(pdf: pd.DataFrame, support: dict[str, bool]) -> pd.DataFrame:
    import io

    n_bytes, checksums, pixels = [], [], []
    for kind, fmt, data in zip(pdf["kind"], pdf["format"], pdf["data"]):
        fmt = (fmt or "").lower()
        if fmt == "bmp":
            checksum, count = _decode_bmp(data)
        elif fmt == "png":
            checksum, count = _decode_png(data)
        elif fmt == "gif":
            checksum, count = _decode_gif(data)
        elif fmt == "wav":
            checksum, count = _decode_wav(data)
        elif fmt == "y4m":
            checksum, count = _decode_y4m(data)
        elif kind == "image" and support.get("image"):
            from PIL import Image

            arr = np.asarray(
                Image.open(io.BytesIO(bytes(data))).convert("L"), dtype=np.int64
            )
            checksum, count = int(arr.sum()), int(arr.size)
        elif kind == "audio" and support.get("audio"):
            import soundfile as sf

            samples, _rate = sf.read(io.BytesIO(bytes(data)))
            checksum = int(np.abs(samples).sum())
            count = int(np.asarray(samples).size)
        elif kind == "video" and support.get("video"):
            import av

            with av.open(io.BytesIO(bytes(data))) as container:
                checksum = count = sum(1 for _ in container.decode(video=0))
        else:
            raise NotImplementedError(
                f"no codec available for format={fmt!r} kind={kind!r} "
                f"(stdlib formats: {sorted(STDLIB_FORMATS)}; probe: {support})"
            )
        checksums.append(checksum)
        pixels.append(count)
        n_bytes.append(len(data))
    return pd.DataFrame(
        {
            "media_id": pdf["media_id"],
            "kind": pdf["kind"],
            "n_bytes": n_bytes,
            "checksum": checksums,
            "pixels_or_samples": pixels,
        }
    )


def _fake_decode(pdf: pd.DataFrame) -> pd.DataFrame:
    checksums = [
        int(np.frombuffer(d, dtype=np.uint8).astype(np.int64).sum()) for d in pdf["data"]
    ]
    pixels = [
        (w * h if k == "image" else len(d))
        for k, d, w, h in zip(pdf["kind"], pdf["data"], pdf["width"], pdf["height"])
    ]
    return pd.DataFrame(
        {
            "media_id": pdf["media_id"],
            "kind": pdf["kind"],
            "n_bytes": [len(d) for d in pdf["data"]],
            "checksum": checksums,
            "pixels_or_samples": pixels,
        }
    )


def decode_media(media: DataFrame, decoder: str = "fake") -> DataFrame:
    """Decode binary payloads to per-item metadata via mapInPandas.

    ``decoder="real"`` GENUINELY decodes the stdlib formats (24-bit
    BMP, PCM16 WAV, y4m — :data:`STDLIB_FORMATS`) with no external
    library, and dispatches other formats to whatever codec libraries
    the environment offers (PIL / soundfile / av, per
    :func:`codec_support`); a row in a format nothing can decode
    raises NotImplementedError from the executor — loudly, never
    silently.  The Spark plan is identical across decoders; only the
    inner pandas function changes.
    """
    support = codec_support() if decoder == "real" else {}

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _real_decode(pdf, support) if decoder == "real" else _fake_decode(pdf)

    return media.mapInPandas(run, schema=DECODED_SCHEMA)


def extract_features(media: DataFrame) -> DataFrame:
    """Fixed-width float feature vector per item (deterministic stand-in
    for an embedding model): byte-histogram folded to FEATURE_DIM and
    l2-normalized.  Shape/partitioning identical to a real extractor."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for d in pdf["data"]:
                hist = np.bincount(
                    np.frombuffer(d, dtype=np.uint8), minlength=256
                ).astype(np.float64)
                folded = hist.reshape(FEATURE_DIM, -1).sum(axis=1)
                norm = np.linalg.norm(folded)
                feats.append((folded / norm if norm else folded).astype(np.float32))
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "feature": [list(f) for f in feats]}
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def sample_frames(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame sampling for video payloads: emit n_frames evenly-spaced
    byte slices per video (1 row in -> n rows out through the Arrow
    batch iterator — the UDTF/fan-out shape of a real frame sampler)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_idx, out_frame = [], [], []
            for mid, kind, data in zip(pdf["media_id"], pdf["kind"], pdf["data"]):
                if kind != "video":
                    continue
                step = max(len(data) // n_frames, 1)
                for fi in range(n_frames):
                    out_id.append(mid)
                    out_idx.append(fi)
                    out_frame.append(bytes(data[fi * step : fi * step + step]))
            yield pd.DataFrame(
                {"media_id": out_id, "frame_idx": out_idx, "frame": out_frame}
            )

    return media.mapInPandas(run, schema="media_id long, frame_idx int, frame binary")
