"""Multimodal binary-column plumbing: schemas, Arrow batch shapes,
fan-out, and the stubbed real-codec seam."""

import numpy as np
import pytest

from semantic_similarity_system_using_aws_mapreduce_spark.multimodal import (
    FEATURE_DIM,
    MEDIA_SCHEMA,
    codec_support,
    decode_media,
    extract_features,
    sample_frames,
    synthesize_media,
)

SUPPORT = codec_support()


@pytest.fixture(scope="module")
def media(spark):
    return synthesize_media(spark, n=30).cache()


def test_decode_fake(spark, media):
    rows = decode_media(media).collect()
    assert len(rows) == 30
    byid = {r.media_id: r for r in rows}
    # image items report pixel counts, others byte counts
    assert byid[0].kind == "image" and byid[0].pixels_or_samples == 64 * 48
    assert byid[1].kind == "audio" and byid[1].pixels_or_samples == byid[1].n_bytes
    # deterministic: running twice gives identical checksums
    again = {r.media_id: r.checksum for r in decode_media(media).collect()}
    assert again == {r.media_id: r.checksum for r in rows}


@pytest.mark.skipif(
    any(SUPPORT.values()), reason="real codecs available; covered by the decode test"
)
def test_decode_real_raises_on_undecodable_format(spark, media):
    """A format neither the stdlib decoders nor any importable library
    can handle fails loudly (NotImplementedError from the executor),
    never silently."""
    avif_only = media.filter("format = 'avif'")
    assert avif_only.count() > 0
    with pytest.raises(Exception, match="no codec available"):
        decode_media(avif_only, decoder="real").collect()


def test_decode_real_stdlib_formats(spark):
    """The real decoder GENUINELY parses the stdlib formats — exact
    pixel/sample/frame arithmetic verified against independently
    computed expectations, no codec library involved."""
    import numpy as np

    from semantic_similarity_system_using_aws_mapreduce_spark.multimodal import (
        make_bmp,
        make_wav,
        make_y4m,
        synthesize_real_media,
    )

    rows = [
        # 4x2 image, constant pixel (10, 20, 30):
        #   luma = (299*10 + 587*20 + 114*30) // 1000 = 18 per pixel
        (0, "image", make_bmp(4, 2, lambda x, y: (10, 20, 30)), "bmp", 4, 2, None),
        # 5 samples, |sum| = 1+2+3+4+5
        (1, "audio", make_wav([1, -2, 3, -4, 5]), "wav", None, None, 1),
        # 7 frames of 6x4 C420
        (2, "video", make_y4m(6, 4, 7, lambda f, j: f + j), "y4m", 6, 4, 280),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r.media_id: r for r in decode_media(media, decoder="real").collect()}
    assert got[0].pixels_or_samples == 8 and got[0].checksum == 8 * 18
    assert got[1].pixels_or_samples == 5 and got[1].checksum == 15
    assert got[2].pixels_or_samples == 7 and got[2].checksum == 7
    # the synthesized corpus decodes end-to-end and deterministically
    corpus = synthesize_real_media(spark, n=24)
    a = sorted(map(tuple, decode_media(corpus, decoder="real").collect()))
    b = sorted(map(tuple, decode_media(corpus, decoder="real").collect()))
    assert a == b and len(a) == 24
    assert all(r[2] > 0 for r in a)  # n_bytes
    # BMP payloads really carry the declared geometry
    img = next(r for r in a if r[1] == "image")
    assert img[4] == 16 * 10  # pixels_or_samples
    # round-trip guard: our own wav bytes reparse to the same samples
    s = np.frombuffer(make_wav([7, -7]), np.uint8)
    assert s[:4].tobytes() == b"RIFF"


def test_y4m_rejects_non_420_chroma():
    """The y4m frame stride is 4:2:0-specific: a C444 stream walked
    with a W*H*3/2 stride can coincidentally align and silently return
    a wrong frame count — it must be rejected up front, not parsed."""
    import pytest as _pytest

    from semantic_similarity_system_using_aws_mapreduce_spark.multimodal import _decode_y4m, make_y4m

    good = make_y4m(6, 4, 2, lambda f, j: f + j)
    assert _decode_y4m(good) == (2, 2)
    c444 = good.replace(b"\n", b" C444\n", 1)
    with _pytest.raises(NotImplementedError, match="C444"):
        _decode_y4m(c444)
    # explicit 420 variants still decode
    c420 = good.replace(b"\n", b" C420jpeg\n", 1)
    assert _decode_y4m(c420) == (2, 2)


@pytest.mark.skipif(
    not SUPPORT.get("image"), reason="PIL not importable in this environment"
)
def test_decode_real_images(spark):
    """Exercised the moment PIL appears: decode genuine PROGRESSIVE
    JPEG payloads (the one JPEG variant the stdlib baseline decoder
    deliberately gates — it must fall through to the library branch)
    through the same mapInPandas plan."""
    import io

    from PIL import Image

    rows = []
    for i in range(4):
        buf = io.BytesIO()
        Image.new("L", (8, 6), color=i * 40).save(
            buf, format="JPEG", progressive=True
        )
        rows.append((i, "image", buf.getvalue(), "jpeg", 8, 6, None))
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r.media_id: r for r in decode_media(media, decoder="real").collect()}
    assert len(got) == 4
    for i, r in got.items():
        assert r.pixels_or_samples == 8 * 6
        # JPEG is lossy; a constant image decodes within +-2/pixel
        assert abs(r.checksum - 8 * 6 * i * 40) <= 8 * 6 * 2


def test_feature_extraction(spark, media):
    rows = extract_features(media).collect()
    assert len(rows) == 30
    for r in rows:
        assert len(r.feature) == FEATURE_DIM
        norm = float(np.linalg.norm(r.feature))
        assert abs(norm - 1.0) < 1e-5


def test_frame_sampling_fanout(spark, media):
    frames = sample_frames(media, n_frames=4).collect()
    n_videos = media.filter("kind = 'video'").count()
    assert len(frames) == n_videos * 4
    by_media = {}
    for f in frames:
        by_media.setdefault(f.media_id, []).append(f.frame_idx)
    assert all(sorted(v) == [0, 1, 2, 3] for v in by_media.values())


def test_png_decode_is_real_and_filter_invariant(spark):
    """The stdlib PNG decoder REALLY decompresses and unfilters: the
    same pixels encoded with all five scanline filters and with
    filter-0-only must decode to identical checksums, equal to the
    same image's BMP decode (shared ITU-601 integer luma)."""
    from semantic_similarity_system_using_aws_mapreduce_spark.multimodal import (
        _decode_bmp,
        _decode_png,
        make_bmp,
        make_png,
    )

    fn = lambda x, y: ((x * 13 + y * 7) % 256, (x * 5) % 256, (y * 29) % 256)  # noqa: E731
    w, h = 13, 9  # odd sizes: exercises non-aligned strides
    all_filters = make_png(w, h, fn)  # cycles 0..4
    plain = make_png(w, h, fn, row_filters=[0])
    paeth_only = make_png(w, h, fn, row_filters=[4])
    assert all_filters != plain  # genuinely different byte streams
    want = _decode_bmp(make_bmp(w, h, fn))
    assert _decode_png(all_filters) == want
    assert _decode_png(plain) == want
    assert _decode_png(paeth_only) == want
    # compression is real: a constant image DEFLATEs far below raw size
    flat = make_png(64, 64, lambda x, y: (7, 7, 7))
    assert len(flat) < 64 * 64 * 3 // 10
    assert _decode_png(flat)[0] == 64 * 64 * 7  # luma(7,7,7) = 7

    # end-to-end through the mapInPandas plan
    rows = [(0, "image", all_filters, "png", w, h, None)]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = decode_media(media, decoder="real").collect()[0]
    assert (got.checksum, got.pixels_or_samples) == want


def test_png_decode_grey_and_unsupported(spark):
    """Greyscale (color type 0) decodes — luma IS the grey value; a
    16-bit IHDR over 8-bit pixel data is a loud truncation error, not
    a mis-parse (16-bit streams themselves decode since r9 — see the
    full-format tests below)."""
    import struct
    import zlib

    import pytest as _pytest

    from semantic_similarity_system_using_aws_mapreduce_spark.multimodal import _decode_png

    def chunk(typ, body):
        return struct.pack(">I", len(body)) + typ + body + struct.pack(
            ">I", zlib.crc32(typ + body)
        )

    # hand-built 3x2 grey PNG, filter 0 rows: values 1..6
    ihdr = struct.pack(">IIBBBBB", 3, 2, 8, 0, 0, 0, 0)
    raw = b"\x00\x01\x02\x03" + b"\x00\x04\x05\x06"
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    assert _decode_png(png) == (21, 6)
    # a 16-bit IHDR over these 8-bit rows leaves half the expected
    # bytes missing: loud truncation, never a silent mis-parse
    ihdr16 = struct.pack(">IIBBBBB", 3, 2, 16, 0, 0, 0, 0)
    png16 = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr16)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    with _pytest.raises(ValueError, match="truncated PNG"):
        _decode_png(png16)
    with _pytest.raises(ValueError, match="not a PNG"):
        _decode_png(b"BM not a png")


def test_gif_decode_matches_bmp_and_survives_dictionary_overflow(spark):
    """The stdlib GIF decoder really LZW-decompresses: cross-format
    checksum equality with BMP on structured images, on run-length
    images (the KwKwK next-code case), and on a high-entropy 60k-pixel
    image whose dictionary overflows 4096 entries (mid-stream clear
    codes); garbage and interlaced payloads fail loudly."""
    import pytest as _pytest

    from semantic_similarity_system_using_aws_mapreduce_spark.multimodal import (
        _decode_bmp,
        _decode_gif,
        make_bmp,
        make_gif,
    )

    fn = lambda x, y: ((x * 13 + y * 7) % 8 * 30, (x * 5) % 6 * 40, (y * 3) % 5 * 50)  # noqa: E731
    runs = lambda x, y: ((x // 7) % 2 * 255, 0, 0)  # noqa: E731  KwKwK stress
    pal = [((i * 37) % 256, (i * 91) % 256, (i * 53) % 256) for i in range(241)]
    noisy = lambda x, y: pal[(x * x + 3 * y + x * y) % 241]  # noqa: E731
    for w, h, f in ((13, 9, fn), (1, 1, fn), (50, 20, runs), (300, 200, noisy)):
        assert _decode_gif(make_gif(w, h, f)) == _decode_bmp(make_bmp(w, h, f))
    with _pytest.raises(ValueError, match="not a GIF"):
        _decode_gif(b"BM nope")
    inter = bytearray(make_gif(4, 4, fn))
    # image descriptor packed byte: set the interlace flag — since r9
    # this decodes (the de-interlace is a row permutation; the luma
    # SUM is row-order invariant, so a mislabeled flag cannot change
    # the result — the schedule itself is pinned in the r9 interlace
    # tests below)
    idx = inter.index(0x2C)
    inter[idx + 9] |= 0x40
    assert _decode_gif(bytes(inter)) == _decode_gif(make_gif(4, 4, fn))
    # end-to-end through the mapInPandas plan
    rows = [(0, "image", make_gif(13, 9, fn), "gif", 13, 9, None)]
    got = decode_media(
        spark.createDataFrame(rows, MEDIA_SCHEMA), decoder="real"
    ).collect()[0]
    assert (got.checksum, got.pixels_or_samples) == _decode_bmp(make_bmp(13, 9, fn))


def test_adpcm_wav_decode_is_real(spark):
    """IMA-ADPCM WAV: real compressed audio with stdlib struct only —
    4 bits/sample (4x smaller than PCM16), decoded through the shared
    IMA state machine.  The decode must track a smooth signal within
    0.5%, be deterministic, report the exact sample count, and route
    automatically off the RIFF fmt tag under the same 'wav' label."""
    import math

    from semantic_similarity_system_using_aws_mapreduce_spark.multimodal import (
        _decode_wav,
        make_adpcm_wav,
        make_wav,
    )

    sig = [int(8000 * math.sin(i / 20)) for i in range(1001)]  # odd count
    adp = make_adpcm_wav(sig)
    pcm = make_wav(sig)
    assert len(adp) < len(pcm) // 3  # genuinely compressed
    chk, n = _decode_wav(adp)
    assert n == 1001
    assert _decode_wav(adp) == (chk, n)  # deterministic
    orig = sum(abs(x) for x in sig)
    assert abs(chk - orig) / orig < 0.005  # tracks the signal
    assert _decode_wav(pcm) == (orig, 1001)  # PCM path untouched
    # end-to-end through the mapInPandas plan, same 'wav' format label
    rows = [
        (0, "audio", adp, "wav", None, None, 125),
        (1, "audio", pcm, "wav", None, None, 125),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r.media_id: r for r in decode_media(media, decoder="real").collect()}
    assert got[0].pixels_or_samples == got[1].pixels_or_samples == 1001
    assert got[1].checksum == orig


def test_image_decoders_cross_format_property():
    """Hypothesis fuzz: ANY small image (random dims, random color
    seed) must checksum identically through the BMP, PNG (all-filter),
    and GIF (LZW) decoders — 3 independent codepaths, 1 answer."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from semantic_similarity_system_using_aws_mapreduce_spark.multimodal import (
        _decode_bmp,
        _decode_gif,
        _decode_png,
        make_bmp,
        make_gif,
        make_png,
    )

    @settings(
        max_examples=25,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        w=st.integers(1, 24),
        h=st.integers(1, 16),
        a=st.integers(0, 255),
        b=st.integers(0, 255),
        c=st.integers(1, 7),
    )
    def check(w, h, a, b, c):
        fn = lambda x, y: (  # noqa: E731
            (a + x * c) % 256,
            (b + y * c) % 256,
            (a ^ b ^ (x * y)) % 256,
        )
        want = _decode_bmp(make_bmp(w, h, fn))
        assert _decode_png(make_png(w, h, fn)) == want
        # GIF needs <= 256 distinct colors: quantize to 4 levels per
        # channel (<= 64 combinations, safe for any dims/seed)
        qfn = lambda x, y: tuple(v & 0xC0 for v in fn(x, y))  # noqa: E731
        assert _decode_gif(make_gif(w, h, qfn)) == _decode_bmp(make_bmp(w, h, qfn))

    check()


def test_jpeg_decode_is_real_and_tracks_bmp(spark):
    """The stdlib baseline-JPEG decoder really Huffman-decodes,
    dequantizes and IDCTs: on a smooth gradient the decoded integer
    luma tracks the lossless BMP luma of the SAME image within the
    codec's quantization loss (<1 luma unit per pixel at q=90), across
    4:4:4, grayscale, 4:2:0 subsampling, and restart markers — four
    genuinely different scan structures, one answer."""
    from semantic_similarity_system_using_aws_mapreduce_spark.multimodal import (
        MEDIA_SCHEMA,
        _decode_bmp,
        make_bmp,
        make_jpeg,
    )

    fn = lambda x, y: (x * 8 + 10, y * 12 + 20, (x + y) * 4)  # noqa: E731
    variants = [
        ("444", dict()),
        ("gray", dict(gray=True)),
        ("420", dict(subsample=True)),
        ("rst", dict(restart_interval=2)),
        ("420rst", dict(subsample=True, restart_interval=3)),
    ]
    rows = [
        (i, "image", make_jpeg(16, 10, fn, **kw), "jpeg", 16, 10, None)
        for i, (_name, kw) in enumerate(variants)
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r.media_id: r for r in decode_media(media, decoder="real").collect()}
    want, n_px = _decode_bmp(make_bmp(16, 10, fn))
    assert len(got) == len(variants)
    for i, (name, _kw) in enumerate(variants):
        r = got[i]
        assert r.pixels_or_samples == n_px
        assert abs(r.checksum - want) < n_px, (name, r.checksum, want)
    # deterministic across runs
    again = {r.media_id: r.checksum for r in decode_media(media, decoder="real").collect()}
    assert again == {i: r.checksum for i, r in got.items()}


def test_jpeg_gates_and_garbage_never_hangs():
    """Lossless/differential-arithmetic (SOF11/13-15) and
    lossless/hierarchical Huffman streams raise the loud
    NotImplementedError gate (DCT arithmetic — SOF9/10 — decodes for
    real since r9, see the arithmetic section below); a stream
    MISLABELED progressive (SOF2 header over a baseline full-band
    scan — invalid per T.81 G.1) is rejected as ValueError; truncated
    or corrupted streams raise ValueError/NotImplementedError — never
    hang, never return silently-wrong output."""
    import pytest as _pytest

    from semantic_similarity_system_using_aws_mapreduce_spark.multimodal import _decode_jpeg, make_jpeg

    fn = lambda x, y: (x * 5, y * 9, x + y)  # noqa: E731
    data = make_jpeg(16, 10, fn)
    arith_lossless = data.replace(b"\xff\xc0", b"\xff\xcb", 1)
    with _pytest.raises(NotImplementedError, match="arithmetic"):
        _decode_jpeg(arith_lossless)
    lossless = data.replace(b"\xff\xc0", b"\xff\xc3", 1)
    with _pytest.raises(NotImplementedError, match="lossless"):
        _decode_jpeg(lossless)
    mislabeled = data.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with _pytest.raises(ValueError):
        _decode_jpeg(mislabeled)
    with _pytest.raises(ValueError):
        _decode_jpeg(b"\xff\xd8\xff\xd9")  # SOI+EOI, no SOF/SOS
    with _pytest.raises(ValueError):
        _decode_jpeg(b"not a jpeg at all")
    for cut in (6, 30, len(data) // 2, len(data) - 3):
        try:
            _decode_jpeg(data[:cut])
        except (ValueError, NotImplementedError, IndexError):
            pass  # rejecting is fine; silent wrong output is not
    # bit-flip fuzz over the entropy-coded segment: decode or reject,
    # deterministically, without hanging
    scan_start = data.find(b"\xff\xda")
    for k in range(scan_start + 14, min(len(data) - 2, scan_start + 60), 7):
        mut = bytearray(data)
        mut[k] ^= 0x41
        try:
            a = _decode_jpeg(bytes(mut))
            b = _decode_jpeg(bytes(mut))
            assert a == b
        except (ValueError, NotImplementedError, IndexError):
            pass


def test_jpeg_cross_format_property():
    """Hypothesis fuzz: ANY small gradient image must decode through
    the lossy JPEG path to a luma checksum within quantization
    tolerance of the lossless BMP decode — random dims exercise every
    partial-MCU padding shape, in all three component layouts."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from semantic_similarity_system_using_aws_mapreduce_spark.multimodal import (
        _decode_bmp,
        _decode_jpeg,
        make_bmp,
        make_jpeg,
    )

    @settings(
        max_examples=15,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        w=st.integers(1, 24),
        h=st.integers(1, 18),
        a=st.integers(0, 200),
        c=st.integers(0, 6),
        layout=st.sampled_from(["444", "gray", "420"]),
    )
    def check(w, h, a, c, layout):
        fn = lambda x, y: (  # noqa: E731
            min(a + x * c, 255),
            min(a + y * c, 255),
            min(a + (x + y) * (c // 2), 255),
        )
        kw = {"gray": layout == "gray", "subsample": layout == "420"}
        cs, px = _decode_jpeg(make_jpeg(w, h, fn, **kw))
        want, n_px = _decode_bmp(make_bmp(w, h, fn))
        assert px == n_px == w * h
        # smooth gradients: quantization error stays under ~3 luma
        # units/px even on 1-pixel images (DC-only blocks)
        assert abs(cs - want) <= 3 * n_px + 2, (w, h, a, c, layout)

    check()


def test_flac_decode_is_real_and_lossless(spark):
    """The stdlib FLAC decoder really rice-decodes and un-predicts:
    the SAME samples encoded as PCM16 WAV and as FLAC (fixed
    predictors, mid-side stereo) decode to IDENTICAL checksums —
    lossless means bit-exact, no tolerance.  And the FLAC stream is
    genuinely compressed, not verbatim."""
    import numpy as np

    from semantic_similarity_system_using_aws_mapreduce_spark.multimodal import (
        MEDIA_SCHEMA,
        _decode_wav,
        make_flac,
        make_wav,
    )

    mono = [int(900 * np.sin(i / 6)) + (i % 11) - 5 for i in range(2500)]
    stereo = []
    for i in range(1200):
        left = int(700 * np.sin(i / 8)) + (i % 7)
        stereo += [left, left + ((i * 13) % 31) - 15]  # correlated pair
    flac_mono = make_flac(mono, channels=1, blocksize=512)
    flac_stereo = make_flac(stereo, channels=2, blocksize=600)
    assert len(flac_mono) < 2 * len(mono)  # real compression
    rows = [
        (0, "audio", make_wav(mono), "wav", None, None, 1),
        (1, "audio", flac_mono, "flac", None, None, 1),
        (2, "audio", flac_stereo, "flac", None, None, 1),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r.media_id: r for r in decode_media(media, decoder="real").collect()}
    want_mono = _decode_wav(make_wav(mono))
    assert (got[0].checksum, got[0].pixels_or_samples) == want_mono
    assert (got[1].checksum, got[1].pixels_or_samples) == want_mono  # bit-exact
    assert got[2].checksum == sum(abs(v) for v in stereo)
    assert got[2].pixels_or_samples == 1200


def test_flac_gates_and_garbage():
    """Garbage and truncations are rejected, never hang, never return
    wrong data (Ogg-FLAC and Ogg Vorbis decode for real — see
    test_ogg_flac_encapsulation / test_ogg_vorbis_*; Opus remains the
    loud soundfile gate)."""
    import pytest as _pytest

    from semantic_similarity_system_using_aws_mapreduce_spark.multimodal import _decode_flac

    # a page claiming garbage: CRC verification rejects it
    with _pytest.raises(ValueError):
        _decode_flac(b"OggS" + b"\x00" * 40)
    from semantic_similarity_system_using_aws_mapreduce_spark.multimodal import make_flac
    with _pytest.raises(ValueError):
        _decode_flac(b"not flac data here")
    data = make_flac(list(range(-500, 500)), channels=1, blocksize=256)
    assert _decode_flac(data) == (sum(abs(v) for v in range(-500, 500)), 1000)
    for cut in (5, 20, len(data) // 2, len(data) - 2):
        try:
            _decode_flac(data[:cut])
        except (ValueError, NotImplementedError, IndexError, KeyError):
            pass
    # CRC really verifies: corrupt one header byte of the second frame
    mut = bytearray(data)
    # find second frame sync (0xFF 0xF8) after the first
    first = mut.find(b"\xff\xf8", 42)
    second = mut.find(b"\xff\xf8", first + 2)
    if second > 0:
        mut[second + 4] ^= 0x10
        with _pytest.raises(ValueError):
            _decode_flac(bytes(mut))


def test_mp4_container_parse_counts_frames(spark):
    """The ISO-BMFF parser really walks boxes: frame count comes off
    the stsz sample table of the hdlr-identified video track — the
    same answer the av branch would give — and fragmented/garbage
    streams fail loudly."""
    import pytest as _pytest

    from semantic_similarity_system_using_aws_mapreduce_spark.multimodal import (
        MEDIA_SCHEMA,
        _mp4_box,
        _parse_mp4,
        make_mp4,
    )

    for nf in (1, 7, 240):
        assert _parse_mp4(make_mp4(nf)) == (nf, nf)
    # through the live plan
    rows = [(0, "video", make_mp4(12), "mp4", 8, 6, 480)]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = decode_media(media, decoder="real").collect()[0]
    assert (got.checksum, got.pixels_or_samples) == (12, 12)
    # garbage/truncation -> rejected
    with _pytest.raises(ValueError):
        _parse_mp4(b"\x00\x00\x00\x08free not a real mp4")
    data = make_mp4(9)
    for cut in (4, 20, len(data) // 2):
        try:
            _parse_mp4(data[:cut])
        except (ValueError, NotImplementedError):
            pass


def test_flac_lossless_property():
    """Hypothesis fuzz: ANY int16 sample sequence, mono or stereo, any
    blocksize, must survive the FLAC encode/decode round trip
    bit-exactly (lossless is a property, not an example)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from semantic_similarity_system_using_aws_mapreduce_spark.multimodal import _decode_flac, make_flac

    @settings(
        max_examples=20,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        samples=st.lists(
            st.integers(-32768, 32767), min_size=1, max_size=600
        ),
        stereo=st.booleans(),
        blocksize=st.sampled_from([16, 100, 256, 4096]),
    )
    def check(samples, stereo, blocksize):
        if stereo and len(samples) % 2:
            samples = samples + [0]
        data = make_flac(
            samples, channels=2 if stereo else 1, blocksize=blocksize
        )
        cs, n = _decode_flac(data)
        assert cs == sum(abs(v) for v in samples)
        assert n == (len(samples) // 2 if stereo else len(samples))

    check()


def test_jpeg_progressive_decodes_identical_to_baseline():
    """The decoder's progressive path (spectral selection + successive
    approximation + EOBRUN, VERDICT r7 #7): baseline and progressive
    encodings share the exact quantized coefficients, so the two
    streams must reconstruct BIT-IDENTICALLY — any drift in the
    DC/AC first or refinement scan logic breaks the equality."""
    from semantic_similarity_system_using_aws_mapreduce_spark.multimodal import _decode_jpeg, make_jpeg

    fns = {
        "grad": lambda x, y: (x * 5 % 256, y * 9 % 256, (x + y) % 256),
        "noise": lambda x, y: (
            (x * 37 + y * 101) % 256,
            (x * 73 + y * 11) % 256,
            (x * 13 + y * 59) % 256,
        ),
    }
    for name, fn in fns.items():
        for w, h in ((16, 10), (17, 13), (8, 8), (32, 24)):
            for kw in ({}, {"gray": True}, {"subsample": True}):
                base = _decode_jpeg(make_jpeg(w, h, fn, **kw))
                prog = _decode_jpeg(make_jpeg(w, h, fn, progressive=True, **kw))
                assert base == prog, (name, w, h, kw)


def test_jpeg_progressive_cross_format_property():
    """Hypothesis fuzz over random dims (every partial-MCU shape, all
    three layouts): the progressive stream tracks the lossless BMP
    within the same quantization tolerance as the baseline path."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from semantic_similarity_system_using_aws_mapreduce_spark.multimodal import (
        _decode_bmp,
        _decode_jpeg,
        make_bmp,
        make_jpeg,
    )

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        w=st.integers(1, 24),
        h=st.integers(1, 18),
        a=st.integers(0, 200),
        c=st.integers(0, 6),
        layout=st.sampled_from(["444", "gray", "420"]),
    )
    def check(w, h, a, c, layout):
        fn = lambda x, y: (  # noqa: E731
            min(a + x * c, 255),
            min(a + y * c, 255),
            min(a + (x + y) * (c // 2), 255),
        )
        kw = {"gray": layout == "gray", "subsample": layout == "420"}
        cs, px = _decode_jpeg(make_jpeg(w, h, fn, progressive=True, **kw))
        want, n_px = _decode_bmp(make_bmp(w, h, fn))
        assert px == n_px == w * h
        assert abs(cs - want) <= 3 * n_px + 2, (w, h, a, c, layout)

    check()


def test_jpeg_fill_bytes_before_markers():
    """0xFF fill bytes before a marker are legal padding (T.81
    §B.1.1.2) — third-party encoders emit them for alignment; the
    marker walk must skip the run, not read marker=0xFF and a garbage
    length.  Safe to inject by byte-pair replace: inside entropy data
    0xFF is always stuffed (followed by 0x00) or an RST, so the pairs
    below only occur at real segment markers."""
    from semantic_similarity_system_using_aws_mapreduce_spark.multimodal import _decode_jpeg, make_jpeg

    fn = lambda x, y: (x * 7 % 256, y * 5 % 256, (x + y) * 3 % 256)  # noqa: E731
    for prog in (False, True):
        for kw in ({}, {"gray": True}, {"subsample": True}):
            data = make_jpeg(21, 14, fn, progressive=prog, **kw)
            want = _decode_jpeg(data)
            padded = data
            for mk in (b"\xdb", b"\xc4", b"\xc0", b"\xc2", b"\xda", b"\xd9"):
                padded = padded.replace(b"\xff" + mk, b"\xff\xff\xff" + mk)
            assert padded != data
            assert _decode_jpeg(padded) == want, (prog, kw)


def test_jpeg_progressive_garbage_never_hangs():
    """Truncation and bit-flip fuzz over a progressive stream: decode
    deterministically or reject — never hang, never return different
    results on identical input."""
    from semantic_similarity_system_using_aws_mapreduce_spark.multimodal import _decode_jpeg, make_jpeg

    fn = lambda x, y: (x * 5 % 256, y * 9 % 256, (x + y) % 256)  # noqa: E731
    data = make_jpeg(24, 18, fn, progressive=True)
    assert b"\xff\xc2" in data  # really progressive
    for cut in (6, 30, len(data) // 3, len(data) // 2, len(data) - 3):
        try:
            _decode_jpeg(data[:cut])
        except (ValueError, NotImplementedError, IndexError):
            pass
    scan_start = data.find(b"\xff\xda")
    for k in range(scan_start + 14, min(len(data) - 2, scan_start + 120), 11):
        mut = bytearray(data)
        mut[k] ^= 0x41
        try:
            a = _decode_jpeg(bytes(mut))
            b = _decode_jpeg(bytes(mut))
            assert a == b
        except (ValueError, NotImplementedError, IndexError):
            pass


def test_jpeg_progressive_through_decode_media(spark):
    """Progressive payloads decode through the same mapInPandas plan
    with NO codec library — the row that used to need PIL (the suite's
    one former skip) is stdlib now."""
    from semantic_similarity_system_using_aws_mapreduce_spark.multimodal import make_jpeg

    rows = []
    for i in range(4):
        fn = lambda x, y, _i=i: ((_i * 40) % 256,) * 3  # noqa: E731
        rows.append(
            (i, "image", make_jpeg(8, 6, fn, progressive=True), "jpeg", 8, 6, None)
        )
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r.media_id: r for r in decode_media(media, decoder="real").collect()}
    assert len(got) == 4
    for i, r in got.items():
        assert r.pixels_or_samples == 8 * 6
        # constant image: lossy within +-2/pixel, like the PIL twin test
        assert abs(r.checksum - 8 * 6 * ((i * 40) % 256)) <= 8 * 6 * 2


def test_ogg_flac_encapsulation():
    """Ogg-FLAC (the streaming/web shipping form) decodes with the
    SAME native frame decoder through a real RFC 3533 depacketizer:
    page sync, Ogg CRC-32 (non-zlib polynomial), lacing-value packet
    reassembly, and cross-page packet continuation all verified."""
    import pytest as _pytest

    from semantic_similarity_system_using_aws_mapreduce_spark.multimodal import (
        _decode_flac,
        _ogg_packets,
        make_flac,
        make_ogg_flac,
    )

    samples = [((j * 37) % 2048) - 1024 for j in range(3000)]
    want = _decode_flac(make_flac(samples))
    # normal pages AND forced cross-page continuation (1 segment/page)
    for msp in (255, 2, 1):
        ogg = make_ogg_flac(samples, max_segs_per_page=msp)
        assert ogg[:4] == b"OggS"
        assert _decode_flac(ogg) == want, msp
    # packet count per the FLAC-to-Ogg mapping: BOS + one per frame
    pkts = _ogg_packets(make_ogg_flac(samples))
    assert len(pkts) == 1 + -(-3000 // 1024)
    assert pkts[0][1][:5] == b"\x7fFLAC"
    # stereo mid-side survives the encapsulation
    st = [v for j in range(2000) for v in ((j * 13) % 1024 - 512, (j * 7) % 512 - 256)]
    assert _decode_flac(make_ogg_flac(st, channels=2)) == _decode_flac(
        make_flac(st, channels=2)
    )
    # CRC really verifies: one flipped payload byte kills its page
    bad = bytearray(make_ogg_flac(samples))
    bad[40] ^= 1
    with _pytest.raises(ValueError, match="CRC"):
        _decode_flac(bytes(bad))
    # a bare Vorbis BOS without its mandatory comment/setup headers is
    # rejected by the (now real, r9) Vorbis decoder, not silently read
    import struct

    vorbis_pkt = b"\x01vorbis" + b"\x00" * 22
    page = bytearray(b"OggS\x00\x02")
    page += struct.pack("<q", 0) + struct.pack("<I", 99) + struct.pack("<I", 0)
    page += b"\x00" * 4 + bytes([1, len(vorbis_pkt)]) + vorbis_pkt
    from semantic_similarity_system_using_aws_mapreduce_spark.multimodal import _ogg_crc

    struct.pack_into("<I", page, 22, _ogg_crc(bytes(page)))
    with _pytest.raises(ValueError, match="Vorbis"):
        _decode_flac(bytes(page))
    # truncation fuzz: reject or decode deterministically, never hang
    data = make_ogg_flac(samples, max_segs_per_page=2)
    for cut in (3, 20, len(data) // 2, len(data) - 2):
        try:
            _decode_flac(data[:cut])
        except (ValueError, NotImplementedError, IndexError, KeyError):
            pass


def test_mp4_fragmented_frame_counts(spark):
    """Fragmented MP4 (DASH/CMAF): frame counts come off the moof
    fragments' trun boxes, summed for the hdlr-identified video track
    — the former av gate is a real parser now."""
    from semantic_similarity_system_using_aws_mapreduce_spark.multimodal import (
        MEDIA_SCHEMA,
        _parse_mp4,
        make_mp4,
    )

    assert _parse_mp4(make_mp4(0, fragments=[5, 7, 3])) == (15, 15)
    assert _parse_mp4(make_mp4(0, fragments=[1])) == (1, 1)
    assert _parse_mp4(make_mp4(0, fragments=[])) == (0, 0)
    data = make_mp4(0, fragments=[4, 4])
    assert b"moof" in data and b"mvex" in data
    # through the live mapInPandas plan
    rows = [(0, "video", data, "mp4", 8, 6, 320)]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = decode_media(media, decoder="real").collect()[0]
    assert (got.checksum, got.pixels_or_samples) == (8, 8)
    # truncation never hangs
    for cut in (10, 40, len(data) // 2):
        try:
            _parse_mp4(data[:cut])
        except (ValueError, NotImplementedError):
            pass


def test_vorbis_codeword_assignment_matches_spec_example():
    """The canonical lowest-available-leaf assignment reproduces the
    Vorbis I spec's own worked example (§3.2.1) and handles the
    single-entry and overpopulated cases."""
    import pytest as _pytest

    from semantic_similarity_system_using_aws_mapreduce_spark.multimodal import _vorbis_assign_codewords

    got = _vorbis_assign_codewords([2, 4, 4, 4, 4, 2, 3, 3])
    assert got == [0b00, 0b0100, 0b0101, 0b0110, 0b0111, 0b10, 0b110, 0b111]
    assert _vorbis_assign_codewords([1]) == [0]
    assert _vorbis_assign_codewords([0, 3, 0, 3]) == [None, 0, None, 0b001]
    with _pytest.raises(ValueError):
        _vorbis_assign_codewords([1, 1, 1])  # overpopulated


def test_vorbis_float_pack_roundtrip():
    from semantic_similarity_system_using_aws_mapreduce_spark.multimodal import (
        _vorbis_float_pack,
        _vorbis_float_unpack,
    )

    for x in (0.0, 1.0, -4.0, 8.0 / 16383, 3.14159, -1e-5, 65536.0):
        y = _vorbis_float_unpack(_vorbis_float_pack(x))
        assert x == 0 and y == 0 or abs(y - x) <= abs(x) * 2**-20, x
        # the pair is idempotent: pack(unpack(pack(x))) == pack(x)
        assert _vorbis_float_pack(y) == _vorbis_float_pack(x)


def test_ogg_vorbis_decodes_against_wav_twin(spark):
    """The stdlib Vorbis decoder really walks headers, codebooks,
    floor1 posts and residue partitions, and its IMDCT/overlap-add
    tracks the lossless WAV twin within the fixture codebook's
    quantization bound — across tones, noise, silence, impulses, and
    lengths that are not multiples of the hop (JPEG tolerance
    convention; Vorbis is lossy)."""
    import numpy as np

    from semantic_similarity_system_using_aws_mapreduce_spark.multimodal import (
        MEDIA_SCHEMA,
        _decode_flac,
        _decode_wav,
        make_ogg_vorbis,
        make_wav,
    )

    rng = np.random.default_rng(11)
    t = np.arange(2000)
    signals = {
        "tones": np.clip(
            8000 * np.sin(2 * np.pi * t / 50)
            + 4000 * np.sin(2 * np.pi * t / 13),
            -32768, 32767,
        ).astype(int),
        "noise": rng.integers(-2000, 2000, 1500),
        "silence": np.zeros(700, dtype=int),
        "impulse": np.concatenate(
            [np.zeros(300, int), [20000], np.zeros(301, int)]
        ),
        "short_odd": rng.integers(-500, 500, 97),  # < one block, odd len
    }
    for name, sig in signals.items():
        sig = [int(v) for v in sig]
        data = make_ogg_vorbis(sig)
        assert data[:4] == b"OggS"
        cs, n = _decode_flac(data)  # Ogg dispatch lives in the FLAC entry
        want, nw = _decode_wav(make_wav(sig))
        assert n == nw == len(sig), name
        assert abs(cs - want) <= 8 * len(sig) + 64, (name, cs, want)
    # through the live plan (the audio decode path of decode_media)
    sig = [int(v) for v in signals["tones"]]
    rows = [(0, "audio", make_ogg_vorbis(sig), "flac", None, None, 1)]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = decode_media(media, decoder="real").collect()[0]
    want, _ = _decode_wav(make_wav(sig))
    assert abs(got.checksum - want) <= 8 * len(sig) + 64
    assert got.pixels_or_samples == len(sig)


def test_ogg_vorbis_garbage_never_hangs():
    """Corruption drills on a real Vorbis stream: page-body flips die
    at the CRC; packet-level flips (CRC recomputed, so the parser
    really sees them) decode deterministically or reject — never hang,
    never crash with a non-Value error; truncations reject."""
    import struct

    import numpy as np
    import pytest as _pytest

    from semantic_similarity_system_using_aws_mapreduce_spark.multimodal import (
        _decode_flac,
        _ogg_crc,
        make_ogg_vorbis,
    )

    sig = [int(v) for v in np.arange(600) % 251 - 125]
    data = make_ogg_vorbis(sig)
    # body flip without CRC repair -> the page CRC rejects it
    # (byte 40 sits inside the first page's packet body: 27-byte
    # header + 1 lacing value + the id packet)
    bad = bytearray(data)
    bad[40] ^= 0x20
    with _pytest.raises(ValueError, match="CRC"):
        _decode_flac(bytes(bad))
    # truncations
    for cut in (10, 40, len(data) // 2, len(data) - 3):
        try:
            _decode_flac(data[:cut])
        except (ValueError, NotImplementedError):
            pass
    # packet-level flips the parser really sees: corrupt a byte inside
    # the FIRST page (the id header), recompute its CRC
    def flip_with_crc(pos: int) -> bytes:
        mut = bytearray(data)
        mut[pos] ^= 0x41
        nseg = mut[26]
        end = 27 + nseg + sum(mut[27 : 27 + nseg])
        struct.pack_into("<I", mut, 22, 0)
        page = bytes(mut[:end])
        page = bytearray(page)
        struct.pack_into(
            "<I", page, 22, _ogg_crc(bytes(page[:22]) + b"\x00\x00\x00\x00" + bytes(page[26:]))
        )
        return bytes(page) + bytes(mut[end:])

    nseg0 = data[26]
    body0 = 27 + nseg0
    for pos in range(body0, body0 + 20):
        try:
            r = _decode_flac(flip_with_crc(pos))
            assert isinstance(r, tuple)
        except (ValueError, NotImplementedError):
            pass


def test_ogg_vorbis_cross_page_and_property():
    """Cross-page packet continuation (continuation flag + 255-lacing
    tails) decodes identically to normal pagination, and a hypothesis
    sweep over random int16 signals/lengths keeps the decode within
    the quantization bound of the WAV twin."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from semantic_similarity_system_using_aws_mapreduce_spark.multimodal import (
        _decode_flac,
        _decode_wav,
        make_ogg_vorbis,
        make_wav,
    )

    sig = [((j * 37) % 4096) - 2048 for j in range(900)]
    want = _decode_flac(make_ogg_vorbis(sig))
    for msp in (3, 1):
        assert _decode_flac(make_ogg_vorbis(sig, max_segs_per_page=msp)) == want

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        sig=st.lists(
            st.integers(-32768, 32767), min_size=1, max_size=700
        )
    )
    def check(sig):
        try:
            data = make_ogg_vorbis(sig)
        except ValueError as exc:
            # the encoder's loud amplitude-headroom gate: only
            # near-full-scale MDCT-basis-aligned inputs reach it
            assert "headroom" in str(exc)
            return
        cs, n = _decode_flac(data)
        want, nw = _decode_wav(make_wav(sig))
        assert n == nw == len(sig)
        assert abs(cs - want) <= 8 * len(sig) + 64

    check()


@pytest.mark.skipif(
    not SUPPORT.get("audio"), reason="soundfile not importable in this environment"
)
def test_ogg_vorbis_conformance_against_soundfile():
    """Lights up the moment soundfile/libvorbis appears: the fixture
    encoder's streams must decode in the REFERENCE Vorbis
    implementation to the same samples (within the grid quantization
    bound) — the external conformance proof that make_ogg_vorbis emits
    spec-valid streams, not merely streams our own decoder accepts."""
    import io

    import numpy as np
    import soundfile as sf

    from semantic_similarity_system_using_aws_mapreduce_spark.multimodal import make_ogg_vorbis

    sig = [int(6000 * np.sin(i / 7)) + (i % 13) * 50 for i in range(1700)]
    samples, rate = sf.read(io.BytesIO(make_ogg_vorbis(sig)))
    assert rate == 8000 and len(samples) == len(sig)
    err = np.abs(np.rint(np.asarray(samples) * 32768.0) - np.asarray(sig))
    assert err.max() <= 8


def test_ogg_vorbis_stereo_coupling():
    """Stereo streams use REAL square-polar channel coupling (one
    magnitude/angle step), so the decoder's §4.3.5 inverse-coupling
    path is honestly exercised — correlated channels (the case
    coupling exists for), uncorrelated channels (stressing the
    angle-range guard in the floor sizing), and a silent channel,
    each within the quantization bound of the WAV twin; per-channel
    sample counting matches the FLAC stereo convention."""
    import numpy as np

    from semantic_similarity_system_using_aws_mapreduce_spark.multimodal import (
        _decode_flac,
        _decode_wav,
        _vorbis_couple_forward,
        make_ogg_vorbis,
        make_wav,
    )

    rng = np.random.default_rng(5)
    correlated = []
    for i in range(1100):
        left = int(6000 * np.sin(i / 8)) + (i % 11) * 30
        correlated += [left, left + ((i * 7) % 101) - 50]
    uncorrelated = [int(v) for v in rng.integers(-9000, 9000, 1600)]
    half_silent = []
    for i in range(800):
        half_silent += [int(4000 * np.sin(i / 5)), 0]
    for name, st in (
        ("correlated", correlated),
        ("uncorrelated", uncorrelated),
        ("half_silent", half_silent),
    ):
        cs, n = _decode_flac(make_ogg_vorbis(st, channels=2))
        want, _ = _decode_wav(make_wav(st, channels=2))
        assert n == len(st) // 2, name  # per-channel count
        assert abs(cs - want) <= 8 * len(st) + 64, (name, cs, want)
    # the forward coupling is the exact inverse of the decode table
    x = rng.uniform(-1, 1, 4096)
    y = rng.uniform(-1, 1, 4096)
    m, a = _vorbis_couple_forward(x, y)
    # decode-side case table, scalarized
    xs, ys = [], []
    for mi, ai in zip(m, a):
        if mi > 0:
            xi, yi = (mi, mi - ai) if ai > 0 else (mi + ai, mi)
        else:
            xi, yi = (mi, mi + ai) if ai > 0 else (mi - ai, mi)
        xs.append(xi), ys.append(yi)
    assert np.allclose(xs, x) and np.allclose(ys, y)
    # magnitude channel always carries the larger-|.| value, so a
    # near-zero quantization sign flip cannot pick a wrong branch
    assert np.all(np.abs(m) >= np.abs(np.minimum(np.abs(x), np.abs(y))) - 1e-12)


def test_ogg_vorbis_mixed_blocksizes():
    """Two-blocksize streams (256/512 — what every real Vorbis stream
    uses): per-packet mode selection, the long blocks' previous/next
    window flags, hybrid window slopes, and the unequal-lap
    overlap-add (including the long->short transition where the
    current frame starts inside the output region) all decode within
    the quantization bound of the WAV twin — mono, stereo-coupled,
    and across odd lengths."""
    import numpy as np

    from semantic_similarity_system_using_aws_mapreduce_spark.multimodal import (
        _decode_flac,
        _decode_wav,
        make_ogg_vorbis,
        make_wav,
    )

    sig = [int(7000 * np.sin(i / 9)) + (i % 17) * 20 for i in range(1300)]
    data = make_ogg_vorbis(sig, mixed_blocks=True)
    eq = make_ogg_vorbis(sig)
    assert data != eq and len(data) > len(eq) // 2  # genuinely different stream
    want, _ = _decode_wav(make_wav(sig))
    cs, n = _decode_flac(data)
    assert n == len(sig)
    assert abs(cs - want) <= 8 * len(sig) + 64
    # stereo coupling composes with block switching
    st = []
    for i in range(1000):
        left = int(5000 * np.sin(i / 6))
        st += [left, left + (i % 23) * 40 - 400]
    cs2, n2 = _decode_flac(make_ogg_vorbis(st, channels=2, mixed_blocks=True))
    want2, _ = _decode_wav(make_wav(st, channels=2))
    assert n2 == 1000 and abs(cs2 - want2) <= 8 * len(st) + 64
    # odd lengths exercise every point of the frame-size schedule
    rng = np.random.default_rng(9)
    for length in (1, 97, 511, 777):
        s = [int(v) for v in rng.integers(-3000, 3000, length)]
        cs3, n3 = _decode_flac(make_ogg_vorbis(s, mixed_blocks=True))
        want3, _ = _decode_wav(make_wav(s))
        assert n3 == length
        assert abs(cs3 - want3) <= 8 * length + 64, length


def test_ogg_vorbis_residue_type2():
    """Residue type 2 — the sample-major interleaved format real
    stereo encoders emit — decodes through its own partition walk and
    deinterleave, composing with channel coupling and block switching;
    results match the type-1 stream's within the shared quantization
    bound."""
    import numpy as np

    from semantic_similarity_system_using_aws_mapreduce_spark.multimodal import (
        _decode_flac,
        _decode_wav,
        make_ogg_vorbis,
        make_wav,
    )

    st = []
    for i in range(1000):
        left = int(5000 * np.sin(i / 6))
        st += [left, left + (i % 23) * 40 - 400]
    want, _ = _decode_wav(make_wav(st, channels=2))
    for mixed in (False, True):
        t2 = make_ogg_vorbis(st, channels=2, mixed_blocks=mixed, residue_type=2)
        t1 = make_ogg_vorbis(st, channels=2, mixed_blocks=mixed, residue_type=1)
        assert t2 != t1  # genuinely different residue layout
        cs, n = _decode_flac(t2)
        assert n == 1000 and abs(cs - want) <= 8 * len(st) + 64, mixed
    # mono type 2 degenerates to the single-vector walk
    sig = [int(v) for v in np.arange(600) % 401 - 200]
    cs, n = _decode_flac(make_ogg_vorbis(sig, residue_type=2))
    wm, _ = _decode_wav(make_wav(sig))
    assert n == 600 and abs(cs - wm) <= 8 * 600 + 64


def test_ogg_vorbis_two_pass_cascade():
    """A real TWO-PASS residue cascade (coarse dims-2 lookup-type-1 VQ
    + fine scalar correction): exercises the implicit idx_div entry
    unpacking, multi-element vector placement, and cross-pass value
    accumulation — alone and composed with stereo coupling, residue
    type 2, and block switching."""
    import numpy as np

    from semantic_similarity_system_using_aws_mapreduce_spark.multimodal import (
        _decode_flac,
        _decode_wav,
        make_ogg_vorbis,
        make_wav,
    )

    sig = [int(7000 * np.sin(i / 9)) + (i % 17) * 20 for i in range(1300)]
    want, _ = _decode_wav(make_wav(sig))
    tp = make_ogg_vorbis(sig, two_pass=True)
    sp = make_ogg_vorbis(sig)
    assert tp != sp  # a genuinely different codebook/cascade layout
    cs, n = _decode_flac(tp)
    assert n == len(sig) and abs(cs - want) <= 8 * len(sig) + 64
    # everything on at once
    st = [
        v
        for i in range(900)
        for v in (
            int(5500 * np.sin(i / 7)),
            int(5500 * np.sin(i / 7)) + (i % 29) * 25 - 350,
        )
    ]
    w2, _ = _decode_wav(make_wav(st, channels=2))
    cs2, n2 = _decode_flac(
        make_ogg_vorbis(
            st, channels=2, two_pass=True, residue_type=2, mixed_blocks=True
        )
    )
    assert n2 == 900 and abs(cs2 - w2) <= 8 * len(st) + 64


def test_vorbis_codebook_parse_layouts():
    """Direct parse-path coverage for the codebook header layouts the
    fixture encoder doesn't emit: the SPARSE entry layout (per-entry
    used flags, unused entries get no codeword), the ordered run-length
    layout, lookup type 1 vs 2 value mapping, and sequence_p
    accumulation — headers built bit-by-bit with the encoder's own
    LSB-first writer."""
    from semantic_similarity_system_using_aws_mapreduce_spark.multimodal import (
        _VorbisBits,
        _VorbisBitsW,
        _VorbisCodebook,
        _vorbis_float_pack,
    )

    # sparse: 4 entries, entries 1 and 3 used with length 1 (flags
    # 0,1,0,1), scalar (no lookup)
    w = _VorbisBitsW()
    w.bits(0x564342, 24)
    w.bits(1, 16), w.bits(4, 24)
    w.bits(0, 1)  # unordered
    w.bits(1, 1)  # sparse
    for used, ln in ((0, None), (1, 0), (0, None), (1, 0)):
        w.bits(used, 1)
        if used:
            w.bits(ln, 5)  # length - 1
    w.bits(0, 4)  # lookup 0
    book = _VorbisCodebook.parse(_VorbisBits(w.data()))
    assert book.entries == 4 and book.lookup == 0
    # used entries 1 and 3 got 1-bit codewords 0 and 1
    assert book.table == {(1, 0): 1, (1, 1): 3}
    # decoding walks the stream bit-by-bit
    r = _VorbisBits(bytes([0b10]))  # LSB-first: bit0=0 -> entry 1, bit1=1 -> entry 3
    assert book.decode_scalar(r) == 1 and book.decode_scalar(r) == 3

    # ordered run-length layout + lookup 1 with sequence_p: dims 2,
    # 4 entries (lv = 2 multiplicands), values accumulate within a
    # vector when sequence_p is set
    w = _VorbisBitsW()
    w.bits(0x564342, 24)
    w.bits(2, 16), w.bits(4, 24)
    w.bits(1, 1)  # ordered
    w.bits(1, 5)  # first length = 2
    # ilog(4)=3 bits: all 4 entries at length 2
    w.bits(4, 3)
    w.bits(1, 4)  # lookup type 1
    w.bits(_vorbis_float_pack(1.0), 32)  # minimum
    w.bits(_vorbis_float_pack(0.5), 32)  # delta
    w.bits(0, 4)  # value_bits = 1
    w.bits(1, 1)  # sequence_p
    w.bits(0, 1), w.bits(1, 1)  # multiplicands [0, 1]
    book = _VorbisCodebook.parse(_VorbisBits(w.data()))
    assert book.dims == 2 and sorted(book.table) == [(2, 0), (2, 1), (2, 2), (2, 3)]
    # entry e decomposes (e % 2, e // 2); with sequence_p the second
    # component adds onto the first: entry 3 -> mults (1,1) ->
    # values (1.5, 1.5+1.5)
    assert book.vector(3) == [1.5, 3.0]
    assert book.vector(0) == [1.0, 2.0]
    assert book.vector(2) == [1.0, 2.5]


def test_vorbis_corrupt_header_rejections():
    """The corrupt-header classes the r9 self-review found by
    execution: a dims-0 codebook with lookup type 1 used to HANG the
    lookup-values search forever; out-of-range book/mapping indices
    and duplicate floor1 X values used to escape as IndexError/
    ZeroDivisionError.  All must reject with ValueError — the one
    exception type every corrupt-media caller catches."""
    import pytest as _pytest

    from semantic_similarity_system_using_aws_mapreduce_spark.multimodal import (
        _VorbisBits,
        _VorbisBitsW,
        _VorbisCodebook,
        _decode_flac,
        make_ogg_vorbis,
    )

    # dims = 0 -> rejected up front (was: infinite loop)
    w = _VorbisBitsW()
    w.bits(0x564342, 24)
    w.bits(0, 16), w.bits(4, 24)  # dims 0, entries 4
    with _pytest.raises(ValueError, match="geometry"):
        _VorbisCodebook.parse(_VorbisBits(w.data()))

    # header-field corruption sweep on a REAL stream: flip every byte
    # of the setup header's body in turn (recomputing the page CRC so
    # the parser truly sees it) — decode must return a tuple or raise
    # ValueError/NotImplementedError, never hang or crash otherwise
    import struct

    from semantic_similarity_system_using_aws_mapreduce_spark.multimodal import _ogg_crc

    sig = [((j * 29) % 1024) - 512 for j in range(400)]
    data = make_ogg_vorbis(sig)
    # page layout: page0 = id header, page1 = comment, page2+ = setup
    def page_bounds(raw, k):
        pos = 0
        for _ in range(k):
            nseg = raw[26 + pos]
            pos += 27 + nseg + sum(raw[pos + 27 : pos + 27 + nseg])
        nseg = raw[pos + 26]
        return pos, pos + 27 + nseg + sum(raw[pos + 27 : pos + 27 + nseg])
    s0, s1 = page_bounds(data, 2)
    nseg = data[s0 + 26]
    body0 = s0 + 27 + nseg
    for off in range(body0, min(body0 + 160, s1), 7):
        mut = bytearray(data)
        mut[off] ^= 0x5A
        page = bytearray(mut[s0:s1])
        struct.pack_into("<I", page, 22, 0)
        crc = _ogg_crc(bytes(page))
        struct.pack_into("<I", page, 22, crc)
        mut[s0:s1] = page
        try:
            r = _decode_flac(bytes(mut))
            assert isinstance(r, tuple)
        except (ValueError, NotImplementedError):
            pass


# ---------------------------------------------------------------------------
# Arithmetic-coded JPEG (ITU-T T.81 Annexes D + F: SOF9 sequential,
# SOF10 progressive).  The entropy layer is validated three
# independent ways: (1) cross-entropy-coder decode identity against
# the Huffman twin over the same quantized coefficients, (2) two
# COMMITTED fixtures entropy-transcoded by the system libjpeg-turbo
# (true third-party streams, no toolchain needed at test time), and
# (3) a gcc-gated live transcode conformance drill in BOTH directions.


def _jarith_fix_fn(x, y):
    # the committed-fixture pattern (regenerated here; see
    # tests/data/jpeg_arith/README for the transcode provenance)
    return ((x * 31 + y * 7) % 256, (x * 5 ^ y * 13) % 256, (x * 11 + y * 17) % 256)


def test_jpeg_arithmetic_decodes_identical_to_huffman():
    """Baseline, progressive, arithmetic-sequential and
    arithmetic-progressive encodings of one image share the exact
    quantized coefficients, so all four must decode BIT-IDENTICALLY —
    any drift in the Annex D coder or the Annex F DC/AC models breaks
    the equality.  Covers gray / 4:4:4 / 4:2:0, partial MCUs, and the
    restart path (coder + statistics + DC predictions reset per RST)."""
    from semantic_similarity_system_using_aws_mapreduce_spark.multimodal import _decode_jpeg, make_jpeg

    fns = {
        "grad": lambda x, y: (x * 5 % 256, y * 9 % 256, (x + y) % 256),
        "noise": lambda x, y: (
            (x * 37 + y * 101) % 256,
            (x * 73 + y * 11) % 256,
            (x * 13 + y * 59) % 256,
        ),
    }
    for name, fn in fns.items():
        for w, h in ((16, 10), (17, 13), (32, 24)):
            for kw in ({}, {"gray": True}, {"subsample": True}):
                base = _decode_jpeg(make_jpeg(w, h, fn, **kw))
                seq = _decode_jpeg(make_jpeg(w, h, fn, arithmetic=True, **kw))
                prog = _decode_jpeg(
                    make_jpeg(w, h, fn, progressive=True, arithmetic=True, **kw)
                )
                assert base == seq == prog, (name, w, h, kw)
    fn = fns["noise"]
    base = _decode_jpeg(make_jpeg(48, 24, fn, restart_interval=3))
    seq = _decode_jpeg(make_jpeg(48, 24, fn, restart_interval=3, arithmetic=True))
    assert base == seq


def test_jpeg_arithmetic_committed_libjpeg_fixtures():
    """TRUE third-party conformance with no toolchain at test time:
    the two committed streams were entropy-transcoded by the system
    libjpeg-turbo 2.1.5 (jpeg_read_coefficients -> arith_code=TRUE ->
    jpeg_write_coefficients, lossless at the coefficient level) from
    make_jpeg sources this test regenerates.  Decoding a fixture must
    therefore equal decoding its regenerated Huffman twin EXACTLY —
    the DCT side is shared, so any difference is an entropy-layer
    divergence from the reference implementation of T.81."""
    import pathlib

    from semantic_similarity_system_using_aws_mapreduce_spark.multimodal import _decode_jpeg, make_jpeg

    fixdir = pathlib.Path(__file__).parent / "data" / "jpeg_arith"
    seq = (fixdir / "libjpeg_seq_420.jpg").read_bytes()
    prog = (fixdir / "libjpeg_prog_444.jpg").read_bytes()
    assert b"\xff\xc9" in seq  # SOF9: really arithmetic sequential
    assert b"\xff\xca" in prog  # SOF10: really arithmetic progressive
    want420 = _decode_jpeg(make_jpeg(37, 26, _jarith_fix_fn, subsample=True))
    want444 = _decode_jpeg(make_jpeg(37, 26, _jarith_fix_fn))
    assert _decode_jpeg(seq) == want420 == (118042, 962)
    assert _decode_jpeg(prog) == want444 == (118046, 962)


def test_jpeg_arithmetic_qe_table_matches_system_libjpeg():
    """The transcribed T.81 Table D.3 against the table the system
    libjpeg exports (jpeg_aritab) — entry-for-entry, including the
    non-adaptive fixed bin at index 113."""
    import ctypes

    from semantic_similarity_system_using_aws_mapreduce_spark.multimodal import _ARITH_QE

    try:
        lib = ctypes.CDLL("libjpeg.so.62")
        tab = (ctypes.c_int64 * 114).in_dll(lib, "jpeg_aritab")
    except OSError:
        pytest.skip("system libjpeg (libjpeg.so.62) not loadable")
    except ValueError:
        pytest.skip("jpeg_aritab not exported by this libjpeg build")
    assert len(_ARITH_QE) == 114
    for i, v in enumerate(tab):
        qe = (v >> 16) & 0xFFFF
        nmps = (v >> 8) & 0xFF
        sw = (v >> 7) & 1
        nlps = v & 0x7F
        assert _ARITH_QE[i] == (qe, nmps, nlps, sw), f"state {i}"


def _build_jpeg_transcoder(tmpdir):
    """Compile the libjpeg coefficient-transcode harness (lossless
    entropy-layer rewrite: Huffman <-> arithmetic over IDENTICAL
    coefficients), or None when the toolchain is absent."""
    import os
    import shutil
    import subprocess
    import textwrap

    if shutil.which("gcc") is None or not os.path.exists("/usr/include/jpeglib.h"):
        return None
    src = os.path.join(tmpdir, "transcode.c")
    exe = os.path.join(tmpdir, "transcode")
    with open(src, "w") as f:
        f.write(textwrap.dedent("""
            #include <stdio.h>
            #include <jpeglib.h>
            int main(int argc, char **argv) {
              struct jpeg_decompress_struct s; struct jpeg_compress_struct d;
              struct jpeg_error_mgr e1, e2; jvirt_barray_ptr *coefs;
              FILE *fi = fopen(argv[1], "rb"), *fo = fopen(argv[2], "wb");
              if (!fi || !fo) return 2;
              s.err = jpeg_std_error(&e1); jpeg_create_decompress(&s);
              d.err = jpeg_std_error(&e2); jpeg_create_compress(&d);
              jpeg_stdio_src(&s, fi); (void) jpeg_read_header(&s, TRUE);
              coefs = jpeg_read_coefficients(&s);
              jpeg_copy_critical_parameters(&s, &d);
              if (argv[3][0] == 'a') d.arith_code = TRUE;
              else { d.arith_code = FALSE; d.optimize_coding = TRUE; }
              if (argc > 4) jpeg_simple_progression(&d);
              jpeg_stdio_dest(&d, fo);
              jpeg_write_coefficients(&d, coefs);
              jpeg_finish_compress(&d); jpeg_destroy_compress(&d);
              (void) jpeg_finish_decompress(&s); jpeg_destroy_decompress(&s);
              fclose(fi); fclose(fo); return 0;
            }
        """))
    r = subprocess.run(["gcc", "-O2", "-o", exe, src, "-ljpeg"], capture_output=True)
    return exe if r.returncode == 0 else None


def test_jpeg_arithmetic_live_libjpeg_conformance(tmp_path):
    """Lights up wherever gcc + libjpeg headers exist: transcode a
    make_jpeg stream through the system libjpeg in BOTH directions —
    its arithmetic output (sequential AND progressive) must decode to
    exactly what the Huffman source decodes to, and libjpeg must
    accept THIS encoder's arithmetic streams and produce a Huffman
    stream with the same decode.  A noisy image drives the estimator
    through the deep Table D.3 states."""
    import random
    import subprocess

    from semantic_similarity_system_using_aws_mapreduce_spark.multimodal import _decode_jpeg, make_jpeg

    exe = _build_jpeg_transcoder(str(tmp_path))
    if exe is None:
        pytest.skip("gcc or libjpeg development headers unavailable")

    rng = random.Random(99)
    noise = [
        [(rng.randrange(256), rng.randrange(256), rng.randrange(256)) for _ in range(64)]
        for _ in range(48)
    ]
    cases = [
        ("grad", lambda x, y: (x * 7 % 256, y * 3 % 256, (x * 13 + y * 5) % 256), {}),
        ("noise420", lambda x, y: noise[y][x], {"subsample": True}),
        ("noise_rst", lambda x, y: noise[y][x], {"restart_interval": 4}),
    ]

    def transcode(data, mode, prog=False):
        src = tmp_path / "in.jpg"
        dst = tmp_path / "out.jpg"
        src.write_bytes(data)
        cmd = [exe, str(src), str(dst), mode] + (["p"] if prog else [])
        subprocess.run(cmd, check=True)
        return dst.read_bytes()

    for name, fn, kw in cases:
        huff = make_jpeg(64, 48, fn, **kw)
        want = _decode_jpeg(huff)
        got = _decode_jpeg(transcode(huff, "arith"))
        assert got == want, ("libjpeg arith seq", name)
        got = _decode_jpeg(transcode(huff, "arith", prog=True))
        assert got == want, ("libjpeg arith prog", name)
        mine = make_jpeg(64, 48, fn, arithmetic=True, **kw)
        got = _decode_jpeg(transcode(mine, "huff"))
        assert got == want, ("mine seq -> libjpeg", name)
        minep = make_jpeg(64, 48, fn, progressive=True, arithmetic=True,
                          **{k: v for k, v in kw.items() if k != "restart_interval"})
        got = _decode_jpeg(transcode(minep, "huff"))
        assert got == want, ("mine prog -> libjpeg", name)


def test_jpeg_arithmetic_dac_validation_and_gates():
    """Bad DAC conditioning raises loudly (Kx out of range, U < L);
    the remaining SOF11/13-15 arithmetic variants stay behind the
    loud library gate."""
    from semantic_similarity_system_using_aws_mapreduce_spark.multimodal import _decode_jpeg, make_jpeg

    fn = lambda x, y: (x % 256, y % 256, (x + y) % 256)  # noqa: E731
    data = make_jpeg(8, 8, fn, arithmetic=True)
    dac_at = data.find(b"\xff\xcc")
    assert dac_at > 0
    bad_kx = bytearray(data)
    # table 0's AC entry value lives 2 entries in: (0,Tb0) (0,Tb1) (1,Tb0) val
    ac0_val_at = dac_at + 4 + 2 * 2 + 1
    assert bad_kx[ac0_val_at] == 5  # Kx for conditioning table 0
    bad_kx[ac0_val_at] = 0
    with pytest.raises(ValueError, match="Kx"):
        _decode_jpeg(bytes(bad_kx))
    bad_lu = bytearray(data)
    bad_lu[dac_at + 5] = 0x01  # DC table 0: U=0 < L=1
    with pytest.raises(ValueError, match="U < L"):
        _decode_jpeg(bytes(bad_lu))
    mislabeled = data.replace(b"\xff\xc9", b"\xff\xcb", 1)
    with pytest.raises(NotImplementedError, match="SOF11"):
        _decode_jpeg(mislabeled)


def test_jpeg_arithmetic_garbage_never_hangs():
    """Truncation and bit-flip fuzz over both arithmetic scan scripts:
    decode deterministically or reject loudly — never hang.  Feeding
    zero bytes past a premature marker is LEGAL in arithmetic coding
    (T.81 D.2.6), so many mutations still decode; they must then
    decode identically twice."""
    from semantic_similarity_system_using_aws_mapreduce_spark.multimodal import _decode_jpeg, make_jpeg

    fn = lambda x, y: (x * 5 % 256, y * 9 % 256, (x + y) % 256)  # noqa: E731
    for prog in (False, True):
        data = make_jpeg(24, 18, fn, progressive=prog, arithmetic=True)
        for cut in range(4, len(data), 7):
            try:
                _decode_jpeg(data[:cut])
            except (ValueError, NotImplementedError, IndexError):
                pass
        scan_start = data.find(b"\xff\xda")
        for k in range(scan_start + 14, len(data) - 2, 5):
            mut = bytearray(data)
            mut[k] ^= 0x41
            try:
                a = _decode_jpeg(bytes(mut))
                b = _decode_jpeg(bytes(mut))
                assert a == b
            except (ValueError, NotImplementedError, IndexError):
                pass


def test_jpeg_arithmetic_through_decode_media(spark):
    """Arithmetic payloads (the row that used to need PIL) decode
    through the same mapInPandas plan with NO codec library."""
    from semantic_similarity_system_using_aws_mapreduce_spark.multimodal import make_jpeg

    rows = []
    for i in range(4):
        fn = lambda x, y, _i=i: ((_i * 40) % 256,) * 3  # noqa: E731
        rows.append(
            (
                i,
                "image",
                make_jpeg(8, 6, fn, progressive=i % 2 == 1, arithmetic=True),
                "jpeg",
                8,
                6,
                None,
            )
        )
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r.media_id: r for r in decode_media(media, decoder="real").collect()}
    assert len(got) == 4
    for i, r in got.items():
        assert r.pixels_or_samples == 8 * 6
        assert abs(r.checksum - 8 * 6 * ((i * 40) % 256)) <= 8 * 6 * 2


# ---------------------------------------------------------------------------
# Interlaced images (r9): PNG Adam7 and GIF four-pass interlacing —
# the last two stdlib-image gates.  PNG de-interlacing is pinned by
# EXACT checksum equality with the BMP twin (scanline filters depend
# on row adjacency, so a scheduling mistake corrupts the unfilter);
# the row schedules themselves are pinned positionally against the
# JVM's javax.imageio readers (third-party, already inside the Spark
# runtime — no extra dependency).


def test_png_adam7_decodes_identical_to_sequential():
    """Adam7 and sequential encodings of one image are LOSSLESS, so
    both must equal the BMP twin exactly — across every pass-emptiness
    shape (dims < 8 drop whole passes) and all five scanline filters
    cycling WITHIN each reduced pass image."""
    from semantic_similarity_system_using_aws_mapreduce_spark.multimodal import (
        _decode_bmp,
        _decode_png,
        make_bmp,
        make_png,
    )

    fn = lambda x, y: (  # noqa: E731
        (x * 7 + y * 3) % 256,
        (x * 2 + y * 11) % 256,
        (x * 13 + y * 5) % 256,
    )
    for w, h in ((1, 1), (2, 3), (7, 5), (8, 8), (9, 10), (16, 13), (33, 21)):
        want = _decode_bmp(make_bmp(w, h, fn))
        assert _decode_png(make_png(w, h, fn)) == want, (w, h)
        assert _decode_png(make_png(w, h, fn, interlace=True)) == want, (w, h)
    # single-filter streams keep every unfilter path honest per pass
    for f in range(5):
        got = _decode_png(make_png(17, 9, fn, row_filters=[f], interlace=True))
        assert got == _decode_bmp(make_bmp(17, 9, fn)), f


def test_gif_interlace_roundtrip_and_schedule():
    """Interlaced and sequential GIF encodings of one image decode
    identically; the four-pass row schedule itself (0/8, 4/8, 2/4,
    1/2) is pinned directly — the decoder applies its inverse."""
    from semantic_similarity_system_using_aws_mapreduce_spark.multimodal import (
        _decode_gif,
        _gif_row_order,
        make_gif,
    )

    assert _gif_row_order(10) == [0, 8, 4, 2, 6, 1, 3, 5, 7, 9]
    assert _gif_row_order(1) == [0]
    for ih in (1, 2, 3, 7, 8, 9, 23):
        order = _gif_row_order(ih)
        assert sorted(order) == list(range(ih)), ih
    fn = lambda x, y: ((x % 4) * 60, (y % 4) * 50, ((x + y) % 4) * 40)  # noqa: E731
    for w, h in ((1, 1), (7, 5), (16, 13)):
        plain = _decode_gif(make_gif(w, h, fn))
        inter = _decode_gif(make_gif(w, h, fn, interlace=True))
        assert plain == inter, (w, h)


def _jvm_pixels(spark, data: bytes):
    """Decode an image via the JVM's javax.imageio (third-party
    reader living inside the Spark runtime); None when ImageIO has no
    reader for the payload."""
    jvm = spark.sparkContext._jvm
    bais = jvm.java.io.ByteArrayInputStream(bytearray(data))
    img = jvm.javax.imageio.ImageIO.read(bais)
    if img is None:
        return None
    w, h = img.getWidth(), img.getHeight()
    rgbs = img.getRGB(0, 0, w, h, None, 0, w)
    return w, h, [((v >> 16) & 255, (v >> 8) & 255, v & 255) for v in rgbs]


def test_interlaced_images_conform_to_jvm_imageio(spark):
    """POSITIONAL third-party conformance: javax.imageio decodes this
    encoder's Adam7 PNG and interlaced GIF back to the exact per-pixel
    pattern (a luma sum alone cannot see a row-scheduling mistake in
    the GIF case — the palette sum is order-invariant)."""
    from semantic_similarity_system_using_aws_mapreduce_spark.multimodal import (
        _decode_png,
        make_gif,
        make_png,
    )

    fn = lambda x, y: (  # noqa: E731
        (x * 7 + y * 3) % 256,
        (x * 2 + y * 11) % 256,
        (x * 13 + y * 5) % 256,
    )
    got = _jvm_pixels(spark, make_png(19, 11, fn, interlace=True))
    if got is None:
        pytest.skip("JVM ImageIO has no PNG reader")
    w, h, px = got
    assert (w, h) == (19, 11)
    assert px == [fn(x, y) for y in range(11) for x in range(19)]
    # and the JVM agrees with this decoder's checksum on its own read
    luma = sum((299 * r + 587 * g + 114 * b) // 1000 for r, g, b in px)
    assert (luma, w * h) == _decode_png(make_png(19, 11, fn, interlace=True))

    gfn = lambda x, y: ((x % 4) * 60, (y % 4) * 50, ((x + y) % 4) * 40)  # noqa: E731
    got = _jvm_pixels(spark, make_gif(13, 9, gfn, interlace=True))
    if got is None:
        pytest.skip("JVM ImageIO has no GIF reader")
    w, h, px = got
    assert (w, h) == (13, 9)
    assert px == [gfn(x, y) for y in range(9) for x in range(13)]


def test_interlaced_garbage_never_hangs():
    """Truncation fuzz over interlaced streams: loud rejection or a
    deterministic result, never a hang; a short Adam7 pass payload is
    a loud truncation error."""
    from semantic_similarity_system_using_aws_mapreduce_spark.multimodal import _decode_gif, _decode_png, make_gif, make_png

    fn = lambda x, y: (x * 3 % 256, y * 5 % 256, (x ^ y) % 256)  # noqa: E731
    png = make_png(16, 12, fn, interlace=True)
    gif = make_gif(16, 12, lambda x, y: ((x % 3) * 80, (y % 3) * 70, 0), interlace=True)
    for data, dec in ((png, _decode_png), (gif, _decode_gif)):
        for cut in range(8, len(data), 9):
            try:
                dec(data[:cut])
            except (ValueError, NotImplementedError, IndexError, Exception):
                pass


# ---------------------------------------------------------------------------
# Full PNG format (r9): palette (PLTE), sub-byte and 16-bit depths —
# every legal color-type x bit-depth combination, both interlace
# modes.  Palette PNGs in particular are everywhere in crawl data
# (icons, screenshots, optimized graphics); they were the largest
# remaining PNG gate.


def test_png_full_format_matrix_matches_bmp():
    """Exact checksum equality with the BMP twin across the whole
    legal (color type, depth, interlace) matrix, with content chosen
    so every encoding is lossless: palettized patterns for type 3,
    replicated d-bit grey levels for sub-byte grey, s*257 samples for
    16-bit."""
    from semantic_similarity_system_using_aws_mapreduce_spark.multimodal import (
        _decode_bmp,
        _decode_png,
        make_bmp,
        make_png,
    )

    fn = lambda x, y: (  # noqa: E731
        (x * 7 + y * 3) % 256,
        (x * 2 + y * 11) % 256,
        (x * 13 + y * 5) % 256,
    )
    pal8 = [(i * 30 % 256, i * 50 % 256, i * 70 % 256) for i in range(8)]
    pfn = lambda x, y: pal8[(x + 2 * y) % 8]  # noqa: E731
    bifn = lambda x, y: [(0, 0, 0), (255, 255, 255)][(x ^ y) & 1]  # noqa: E731

    def grey_fn(d):
        levels = [(v * 255) // ((1 << d) - 1) for v in range(1 << d)]
        return lambda x, y: (levels[(x + y) % len(levels)],) * 3

    for w, h in ((1, 1), (7, 5), (16, 13), (33, 21)):
        for inter in (False, True):
            want = _decode_bmp(make_bmp(w, h, fn))
            got = _decode_png(make_png(w, h, fn, interlace=inter, depth=16))
            assert got == want, ("rgb16", w, h, inter)
            pw = _decode_bmp(make_bmp(w, h, pfn))
            for d in (4, 8):
                got = _decode_png(
                    make_png(w, h, pfn, interlace=inter, color_type=3, depth=d)
                )
                assert got == pw, ("palette", d, w, h, inter)
            bw = _decode_bmp(make_bmp(w, h, bifn))
            got = _decode_png(
                make_png(w, h, bifn, interlace=inter, color_type=3, depth=1)
            )
            assert got == bw, ("palette", 1, w, h, inter)
            for d in (1, 2, 4, 8, 16):
                gfn = grey_fn(min(d, 8))
                gw = _decode_bmp(make_bmp(w, h, gfn))
                got = _decode_png(
                    make_png(w, h, gfn, interlace=inter, color_type=0, depth=d)
                )
                assert got == gw, ("grey", d, w, h, inter)


def test_png_full_format_conforms_to_jvm_imageio(spark):
    """POSITIONAL third-party conformance of the palette / sub-byte /
    16-bit encoder output via javax.imageio — a packing or PLTE
    mistake that preserved the luma SUM would still fail here."""
    from semantic_similarity_system_using_aws_mapreduce_spark.multimodal import make_png

    pal8 = [(i * 30 % 256, i * 50 % 256, i * 70 % 256) for i in range(8)]
    pfn = lambda x, y: pal8[(x + 2 * y) % 8]  # noqa: E731
    fn = lambda x, y: (  # noqa: E731
        (x * 7 + y * 3) % 256,
        (x * 2 + y * 11) % 256,
        (x * 13 + y * 5) % 256,
    )
    g4 = lambda x, y: (((x + y) % 16) * 17,) * 3  # noqa: E731
    bifn = lambda x, y: [(0, 0, 0), (255, 255, 255)][(x ^ y) & 1]  # noqa: E731
    cases = [
        (make_png(13, 9, pfn, color_type=3, depth=4, interlace=True), pfn),
        (make_png(13, 9, pfn, color_type=3, depth=8), pfn),
        (make_png(13, 9, fn, depth=16), fn),
        (make_png(13, 9, g4, color_type=0, depth=4), g4),
        (make_png(13, 9, bifn, color_type=0, depth=1, interlace=True), bifn),
    ]
    for data, expect in cases:
        got = _jvm_pixels(spark, data)
        if got is None:
            pytest.skip("JVM ImageIO has no PNG reader")
        w, h, px = got
        assert px == [expect(x, y) for y in range(h) for x in range(w)]


def test_png_validation_is_loud():
    """Illegal header combinations and palette violations reject with
    ValueError, encoder-side and decoder-side."""
    from semantic_similarity_system_using_aws_mapreduce_spark.multimodal import _decode_png, make_png

    fn = lambda x, y: (x % 256, y % 256, 0)  # noqa: E731
    with pytest.raises(ValueError, match="illegal PNG depth"):
        make_png(4, 4, fn, color_type=3, depth=16)
    with pytest.raises(ValueError, match="distinct colors"):
        make_png(16, 16, fn, color_type=3, depth=2)  # >4 colors at depth 2
    data = bytearray(make_png(6, 6, fn, color_type=3, depth=8))
    # corrupt the IHDR color type to an illegal combination (3, 16)
    assert data[24] == 8 and data[25] == 3
    data[24] = 16
    import struct
    import zlib

    data[29:33] = struct.pack(">I", zlib.crc32(bytes(data[12:29])))
    with pytest.raises(ValueError, match="illegal PNG"):
        _decode_png(bytes(data))
    # palette index out of range: shrink PLTE below the used indices
    good = make_png(6, 6, fn, color_type=3, depth=8)
    at = good.find(b"PLTE") - 4
    ln = struct.unpack_from(">I", good, at)[0]
    body = good[at + 8 : at + 8 + 3]  # keep ONE entry
    rebuilt = (
        good[:at]
        + struct.pack(">I", 3)
        + b"PLTE"
        + body
        + struct.pack(">I", zlib.crc32(b"PLTE" + body))
        + good[at + 12 + ln :]
    )
    with pytest.raises(ValueError, match="palette index"):
        _decode_png(rebuilt)


# ---------------------------------------------------------------------------
# JPEG colorspace variants (r9): Adobe CMYK / YCCK (4 components,
# APP14 transform 0 / 2 — print-workflow images that DO land in web
# crawls) and plain-RGB (APP14 transform 0 or 'R','G','B' component
# IDs).  Before this, a 4-component stream decoded silently wrong
# (treated as YCbCr with K ignored) — the one state the decoders are
# never allowed to be in.


def test_jpeg_colorspace_variants_decode():
    """RGB/CMYK/YCCK streams track the BMP twin within the usual
    quantization tolerance, and each variant's Huffman, arithmetic and
    progressive-arithmetic encodings decode BIT-IDENTICALLY (shared
    coefficients); stripping the APP14 from a YCCK stream changes the
    decode (the transform byte is really consumed — the fallback is
    plain inverted CMYK)."""
    import struct

    from semantic_similarity_system_using_aws_mapreduce_spark.multimodal import (
        _decode_bmp,
        _decode_jpeg,
        make_bmp,
        make_jpeg,
    )

    fn = lambda x, y: (  # noqa: E731
        (x * 7 + y * 3) % 256,
        (x * 2 + y * 11) % 256,
        (x * 13 + y * 5) % 256,
    )
    want, n = _decode_bmp(make_bmp(33, 21, fn))
    for cs in ("rgb", "cmyk", "ycck"):
        base = _decode_jpeg(make_jpeg(33, 21, fn, colorspace=cs))
        arith = _decode_jpeg(make_jpeg(33, 21, fn, colorspace=cs, arithmetic=True))
        prog = _decode_jpeg(
            make_jpeg(33, 21, fn, colorspace=cs, progressive=True, arithmetic=True)
        )
        assert base == arith == prog, cs
        assert base[1] == n and abs(base[0] - want) <= 3 * n + 2, cs
    data = make_jpeg(33, 21, fn, colorspace="ycck")
    at = data.find(b"\xff\xee")
    ln = struct.unpack_from(">H", data, at + 2)[0]
    stripped = data[:at] + data[at + 2 + ln :]
    assert _decode_jpeg(data) != _decode_jpeg(stripped)
    # rgb is ALSO signalled by 'R','G','B' component IDs alone, the
    # convention that survives APP14-dropping transcoders
    rgb = make_jpeg(33, 21, fn, colorspace="rgb")
    at = rgb.find(b"\xff\xee")
    ln = struct.unpack_from(">H", rgb, at + 2)[0]
    no_app14 = rgb[:at] + rgb[at + 2 + ln :]
    assert _decode_jpeg(no_app14) == _decode_jpeg(rgb)
    with pytest.raises(ValueError, match="unknown JPEG colorspace"):
        make_jpeg(8, 8, fn, colorspace="cmy")
    with pytest.raises(ValueError, match="full-resolution"):
        make_jpeg(8, 8, fn, colorspace="cmyk", gray=True)


def test_jpeg_colorspace_live_libjpeg_conformance(tmp_path):
    """gcc-gated: each colorspace variant entropy-transcodes through
    the system libjpeg in both directions with identical decodes —
    including the 4-component arithmetic path (a component-count
    assumption anywhere in the coder would break here)."""
    import subprocess

    from semantic_similarity_system_using_aws_mapreduce_spark.multimodal import _decode_jpeg, make_jpeg

    exe = _build_jpeg_transcoder(str(tmp_path))
    if exe is None:
        pytest.skip("gcc or libjpeg development headers unavailable")
    fn = lambda x, y: (  # noqa: E731
        (x * 7 + y * 3) % 256,
        (x * 2 + y * 11) % 256,
        (x * 13 + y * 5) % 256,
    )

    def transcode(data, mode):
        src = tmp_path / "in.jpg"
        dst = tmp_path / "out.jpg"
        src.write_bytes(data)
        subprocess.run([exe, str(src), str(dst), mode], check=True)
        return dst.read_bytes()

    for cs in ("rgb", "cmyk", "ycck"):
        huff = make_jpeg(33, 21, fn, colorspace=cs)
        want = _decode_jpeg(huff)
        assert _decode_jpeg(transcode(huff, "arith")) == want, cs
        mine = make_jpeg(33, 21, fn, colorspace=cs, arithmetic=True)
        assert _decode_jpeg(transcode(mine, "huff")) == want, cs


# ---------------------------------------------------------------------------
# Lossless WebP / VP8L (r9) — the format modern crawls serve most
# after JPEG.  Decoder covers the full bitstream (prefix codes,
# meta-groups, color cache, LZ77 with the 2D distance map, all four
# inverse transforms incl. pixel bundling); make_webp emits minimal
# valid literal-only streams.  The system libwebp (libwebp.so.7,
# ctypes — no dev headers needed) is the third-party oracle in both
# directions.


def _webp_fix_fns():
    import math

    photo = lambda x, y: (  # noqa: E731
        int(127 + 120 * math.sin(x / 11) * math.cos(y / 17)) & 255,
        int(127 + 120 * math.sin((x + y) / 13)) & 255,
        int(127 + 120 * math.cos(x / 7 + y / 19)) & 255,
    )
    tile = lambda x, y: (  # noqa: E731
        ((x % 13) * 41 + (y % 7) * 3) % 256,
        ((x % 13) * 11) % 256,
        ((y % 7) * 59) % 256,
    )
    pal3 = lambda x, y: [(255, 0, 0), (0, 255, 0), (0, 0, 255)][(x + 2 * y) % 3]  # noqa: E731
    return {
        "photo_96x64": (96, 64, photo),
        "tiled_80x56": (80, 56, tile),
        "pal3_41x23": (41, 23, pal3),
    }


def _libwebp():
    import ctypes

    try:
        lib = ctypes.CDLL("libwebp.so.7")
    except OSError:
        return None
    lib.WebPEncodeLosslessRGB.restype = ctypes.c_size_t
    lib.WebPEncodeLosslessRGB.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ]
    lib.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
    lib.WebPEncodeLosslessRGBA.argtypes = lib.WebPEncodeLosslessRGB.argtypes
    lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
    lib.WebPDecodeRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    return lib


def test_webp_encoder_matches_bmp_and_decodes():
    """make_webp is LOSSLESS: exact checksum equality with the BMP
    twin through this decoder, across partial widths and tiny dims."""
    from semantic_similarity_system_using_aws_mapreduce_spark.multimodal import (
        _decode_bmp,
        _decode_webp,
        make_bmp,
        make_webp,
    )

    fn = lambda x, y: (  # noqa: E731
        (x * 7 + y * 3) % 256,
        (x * 2 + y * 11) % 256,
        (x * 13 + y * 5) % 256,
    )
    for w, h in ((1, 1), (2, 3), (7, 5), (16, 10), (33, 21)):
        assert _decode_webp(make_webp(w, h, fn)) == _decode_bmp(make_bmp(w, h, fn))


def test_webp_committed_libwebp_fixtures():
    """TRUE third-party conformance with no library at test time: the
    committed streams are libwebp encoder output over regenerable
    patterns (lossless, so the decode must reproduce the pattern
    exactly), chosen so the encoder used the predictor + cross-color
    transforms with meta-groups, LZ77 + color cache, and the
    color-indexing transform with sub-byte pixel bundling."""
    import pathlib

    from semantic_similarity_system_using_aws_mapreduce_spark.multimodal import _decode_webp

    fixdir = pathlib.Path(__file__).parent / "data" / "webp"
    pinned = {
        "photo_96x64": (769094, 6144),
        "tiled_80x56": (389112, 4480),
        "pal3_41x23": (79832, 943),
    }
    for name, (w, h, fn) in _webp_fix_fns().items():
        data = (fixdir / f"libwebp_{name}.webp").read_bytes()
        want = sum(
            (299 * fn(x, y)[0] + 587 * fn(x, y)[1] + 114 * fn(x, y)[2]) // 1000
            for y in range(h)
            for x in range(w)
        )
        assert (want, w * h) == pinned[name], name  # pattern regenerates
        assert _decode_webp(data) == pinned[name], name


def test_webp_live_libwebp_conformance():
    """Lights up wherever libwebp.so is loadable: libwebp-encoded
    streams (noise, RGBA with varying alpha, wide palettes) decode to
    exactly what libwebp itself decodes them to, and libwebp decodes
    make_webp output back to the exact source pixels."""
    import ctypes
    import random

    from semantic_similarity_system_using_aws_mapreduce_spark.multimodal import _decode_webp, make_webp

    lib = _libwebp()
    if lib is None:
        pytest.skip("libwebp.so.7 not loadable")

    def libwebp_encode(w, h, fn, rgba=False):
        ch = 4 if rgba else 3
        buf = bytes(c & 255 for y in range(h) for x in range(w) for c in fn(x, y)[:ch])
        out = ctypes.POINTER(ctypes.c_uint8)()
        f = lib.WebPEncodeLosslessRGBA if rgba else lib.WebPEncodeLosslessRGB
        n = f(buf, w, h, w * ch, ctypes.byref(out))
        assert n
        return bytes(out[i] for i in range(n))

    def libwebp_luma(data):
        ww, hh = ctypes.c_int(), ctypes.c_int()
        px = lib.WebPDecodeRGBA(data, len(data), ctypes.byref(ww), ctypes.byref(hh))
        assert px, "libwebp rejected the stream"
        total = sum(
            (299 * px[4 * i] + 587 * px[4 * i + 1] + 114 * px[4 * i + 2]) // 1000
            for i in range(ww.value * hh.value)
        )
        return total, ww.value * hh.value

    rng = random.Random(11)
    noise = [
        [(rng.randrange(256), rng.randrange(256), rng.randrange(256)) for _ in range(64)]
        for _ in range(48)
    ]
    pal17 = [(i * 15 % 256, (255 - i * 9) % 256, i * 33 % 256) for i in range(17)]
    cases = [
        (64, 48, lambda x, y: noise[y][x], False),
        (120, 60, lambda x, y: pal17[(x * x + y) % 17], False),
        (50, 40, lambda x, y: (x * 5 % 256, y * 6 % 256, (x + y) % 256, (x * y) % 256), True),
        (33, 9, lambda x, y: [(0, 0, 0), (255, 255, 255)][(x ^ y) & 1], False),
    ]
    for w, h, fn, rgba in cases:
        data = libwebp_encode(w, h, fn, rgba)
        assert _decode_webp(data) == libwebp_luma(data), (w, h, rgba)
    # reverse direction: libwebp reads make_webp output pixel-exactly
    fn = lambda x, y: (  # noqa: E731
        (x * 7 + y * 3) % 256,
        (x * 2 + y * 11) % 256,
        (x * 13 + y * 5) % 256,
    )
    mine = make_webp(19, 11, fn)
    ww, hh = ctypes.c_int(), ctypes.c_int()
    px = lib.WebPDecodeRGBA(mine, len(mine), ctypes.byref(ww), ctypes.byref(hh))
    assert px and (ww.value, hh.value) == (19, 11)
    for i in range(19 * 11):
        r, g, b = fn(i % 19, i // 19)
        assert (px[4 * i], px[4 * i + 1], px[4 * i + 2], px[4 * i + 3]) == (r, g, b, 255)


def test_webp_gates_and_garbage_never_hangs():
    """Lossy VP8 and extended VP8X raise the loud library gate;
    truncation and bit-flip fuzz decodes deterministically or rejects,
    never hangs."""
    from semantic_similarity_system_using_aws_mapreduce_spark.multimodal import _decode_webp, make_webp

    fn = lambda x, y: (x * 3 % 256, y * 5 % 256, (x ^ y) % 256)  # noqa: E731
    data = make_webp(16, 12, fn)
    lossy = data.replace(b"VP8L", b"VP8 ", 1)
    with pytest.raises(NotImplementedError, match="lossy WebP"):
        _decode_webp(lossy)
    ext = data.replace(b"VP8L", b"VP8X", 1)
    with pytest.raises(NotImplementedError, match="extended WebP"):
        _decode_webp(ext)
    with pytest.raises(ValueError, match="not a WebP"):
        _decode_webp(b"RIFFxxxxWAVE....")
    for cut in range(4, len(data), 11):
        try:
            _decode_webp(data[:cut])
        except (ValueError, NotImplementedError, IndexError):
            pass
    for k in range(20, len(data) - 1, 7):
        mut = bytearray(data)
        mut[k] ^= 0x2D
        try:
            a = _decode_webp(bytes(mut))
            b = _decode_webp(bytes(mut))
            assert a == b
        except (ValueError, NotImplementedError, IndexError):
            pass


def test_encoder_invalid_parameter_combinations_fail_loudly():
    """ADVICE r9 (low x2): make_webp validates the VP8L 14-bit
    dimension fields instead of silently wrapping, and make_jpeg
    rejects progressive + restart_interval (progressive scans emit no
    RST markers, so the stream would be self-inconsistent)."""
    from semantic_similarity_system_using_aws_mapreduce_spark.multimodal import make_jpeg, make_webp

    fn = lambda x, y: (x % 256, y % 256, 0)  # noqa: E731
    for w, h in ((0, 5), (5, 0), (16385, 5), (5, 16385), (-1, 5)):
        with pytest.raises(ValueError, match="1..16384"):
            make_webp(w, h, fn)
    with pytest.raises(ValueError, match="restart_interval"):
        make_jpeg(16, 16, fn, progressive=True, restart_interval=2)
    with pytest.raises(ValueError, match="restart_interval"):
        make_jpeg(16, 16, fn, progressive=True, arithmetic=True, restart_interval=1)
    # the boundary dimensions themselves stay encodable
    assert make_webp(1, 1, fn)[:4] == b"RIFF"


def _craft_predictor_webp(w, h, mode, tile_bits, rgb_fn):
    """Hand-assemble a VP8L stream whose PREDICTOR transform forces
    ``mode`` over every tile, with per-pixel literal residuals chosen
    so the decoded image is exactly ``rgb_fn`` (opaque).  The
    residuals come from an independent in-test reference of the
    spec's predictor rules — in particular the rightmost-column rule,
    where the spec's 1-D addressing wraps 'top-right' into the
    CURRENT row's first pixel — and the live libwebp arm of the test
    below proves this reference (not just the engine decoder)
    matches the real codec."""
    import struct

    from semantic_similarity_system_using_aws_mapreduce_spark.multimodal import (
        _VP8L_CLC_ORDER,
        _Vp8lBitWriter,
        _Vp8lCode,
    )

    target = [
        [(255,) + tuple(v & 255 for v in rgb_fn(x, y)) for x in range(w)]
        for y in range(h)
    ]

    def avg2(p, q):
        return tuple((a + b) // 2 for a, b in zip(p, q))

    def pred_at(x, y):
        if x == 0 and y == 0:
            return (255, 0, 0, 0)
        if y == 0:
            return target[0][x - 1]
        if x == 0:
            return target[y - 1][0]
        left = target[y][x - 1]
        top = target[y - 1][x]
        tl = target[y - 1][x - 1]
        tr = target[y - 1][x + 1] if x + 1 < w else target[y][0]
        return {
            2: top,
            3: tr,
            5: avg2(avg2(left, tr), top),
            9: avg2(top, tr),
            10: avg2(avg2(left, tl), avg2(top, tr)),
        }[mode]

    bw = _Vp8lBitWriter()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # alpha hint
    bw.write(0, 3)  # version

    def simple_one(sym):
        bw.write(1, 1)
        bw.write(0, 1)
        bw.write(1, 1)
        bw.write(sym, 8)

    bw.write(1, 1)  # a transform follows
    bw.write(0, 2)  # type 0: PREDICTOR
    bw.write(tile_bits - 2, 3)
    bw.write(0, 1)  # mode sub-image: no color cache
    simple_one(mode)  # green channel carries the per-tile mode
    simple_one(0)  # red
    simple_one(0)  # blue
    simple_one(0)  # alpha
    simple_one(0)  # distance
    bw.write(0, 1)  # no more transforms
    bw.write(0, 1)  # main image: no color cache
    bw.write(0, 1)  # no meta-prefix

    def normal_code(clc_lengths, emit):
        need = max(_VP8L_CLC_ORDER.index(s) for s in clc_lengths) + 1
        bw.write(0, 1)
        bw.write(need - 4, 4)
        for i in range(need):
            bw.write(clc_lengths.get(_VP8L_CLC_ORDER[i], 0), 3)
        bw.write(0, 1)
        full = [clc_lengths.get(s, 0) for s in range(19)]
        inv = {sym: (ln, c) for (ln, c), sym in _Vp8lCode(full).table.items()}
        emit(lambda sym: bw.write_code(inv[sym][1], inv[sym][0]))

    def emit_green(put):
        for _ in range(256):
            put(9)
        put(1)
        put(18)  # 23 trailing zeros for the unused length symbols
        bw.write(23 - 11, 7)

    def emit_flat(put):
        for _ in range(256):
            put(8)

    normal_code({9: 1, 1: 2, 18: 2}, emit_green)
    normal_code({8: 1, 0: 1}, emit_flat)  # red
    normal_code({8: 1, 0: 1}, emit_flat)  # blue
    normal_code({8: 1, 0: 1}, emit_flat)  # alpha: residual-coded too
    simple_one(0)  # distance, never referenced

    for y in range(h):
        for x in range(w):
            pa, pr, pg, pb = pred_at(x, y)
            ta, tre, tg, tb = target[y][x]
            bw.write_code(256 | ((tg - pg) & 255), 9)
            bw.write_code((tre - pr) & 255, 8)
            bw.write_code((tb - pb) & 255, 8)
            bw.write_code((ta - pa) & 255, 8)
    payload = bw.finish()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    stream = b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
    luma = sum(
        (299 * p[1] + 587 * p[2] + 114 * p[3]) // 1000
        for row in target
        for p in row
    )
    return stream, target, (luma, w * h)


def test_webp_tr_predictor_right_edge_conformance():
    """ADVICE r9 (high): predictor modes consuming the top-right
    pixel (3/5/9/10) must wrap TR to the CURRENT row's first pixel at
    the rightmost column.  Crafted streams force each TR-family mode
    over tiles covering the last column — both a single whole-image
    tile and a multi-tile grid whose last column sits in its own tile
    column — and the live libwebp arm pins the decoded pixels
    byte-exactly, proving the in-test reference rule (and therefore
    the engine decoder, which must agree with it) matches the real
    codec."""
    import ctypes

    from semantic_similarity_system_using_aws_mapreduce_spark.multimodal import _decode_webp

    fn = lambda x, y: (  # noqa: E731
        (x * 37 + y * 11) % 256,
        (x * 5 + y * 29) % 256,
        (x * 13 + y * 3) % 256,
    )
    lib = _libwebp()
    for mode in (2, 3, 5, 9, 10):
        for w, h, bits in ((11, 7, 4), (10, 9, 2)):
            stream, target, want = _craft_predictor_webp(w, h, mode, bits, fn)
            assert _decode_webp(stream) == want, (mode, w, h)
            if lib is not None:
                ww, hh = ctypes.c_int(), ctypes.c_int()
                px = lib.WebPDecodeRGBA(
                    stream, len(stream), ctypes.byref(ww), ctypes.byref(hh)
                )
                assert px, (mode, w, h)
                assert (ww.value, hh.value) == (w, h)
                for i in range(w * h):
                    a, r, g, b = target[i // w][i % w]
                    assert (
                        px[4 * i], px[4 * i + 1], px[4 * i + 2], px[4 * i + 3]
                    ) == (r, g, b, a), (mode, w, h, i % w, i // w)


def test_webp_through_decode_media(spark):
    """VP8L payloads decode through the same mapInPandas plan with NO
    codec library, alongside the other stdlib formats."""
    from semantic_similarity_system_using_aws_mapreduce_spark.multimodal import make_webp

    rows = []
    for i in range(3):
        fn = lambda x, y, _i=i: ((x * 3 + _i * 40) % 256, (y * 7) % 256, 0)  # noqa: E731
        rows.append((i, "image", make_webp(9, 6, fn), "webp", 9, 6, None))
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r.media_id: r for r in decode_media(media, decoder="real").collect()}
    assert len(got) == 3
    for i, r in got.items():
        fn = lambda x, y, _i=i: ((x * 3 + _i * 40) % 256, (y * 7) % 256, 0)  # noqa: E731
        want = sum(
            (299 * fn(x, y)[0] + 587 * fn(x, y)[1]) // 1000
            for y in range(6)
            for x in range(9)
        )
        assert r.pixels_or_samples == 54
        assert r.checksum == want


def test_decode_media_quarantine_confines_bad_rows(spark):
    """on_error='quarantine' (r9): a corrupt payload nulls its OWN row
    and names the failure in the error column — the batch, the task
    and the good rows survive.  Same per-record philosophy as the WARC
    reader; at crawl scale one torn image must never kill a stage."""
    from semantic_similarity_system_using_aws_mapreduce_spark.multimodal import make_png, make_webp

    fn = lambda x, y: (x * 9 % 256, y * 4 % 256, (x + y) % 256)  # noqa: E731
    good_png = make_png(8, 6, fn)
    rows = [
        (0, "image", good_png, "png", 8, 6, None),
        (1, "image", b"\x89PNG\r\n\x1a\n garbage", "png", 8, 6, None),
        (2, "image", make_webp(8, 6, fn), "webp", 8, 6, None),
        (3, "image", b"not media at all", "avif", 8, 6, None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r.media_id: r for r in
           decode_media(media, decoder="real", on_error="quarantine").collect()}
    assert got[0].error is None and got[0].pixels_or_samples == 48
    assert got[2].error is None and got[2].pixels_or_samples == 48
    assert got[1].checksum is None and "PNG" in got[1].error
    assert got[3].checksum is None and got[3].error.startswith("NotImplementedError")
    # default mode still fails the task loudly
    with pytest.raises(Exception):
        decode_media(media, decoder="real").collect()
    with pytest.raises(ValueError, match="on_error"):
        decode_media(media, decoder="real", on_error="skip")
    # the fake decoder is total: quarantine mode adds an all-null column
    fake = decode_media(media, decoder="fake", on_error="quarantine").collect()
    assert all(r.error is None for r in fake)


def test_decode_media_quarantine_skewed_payloads(spark):
    """Media-path scale drill (VERDICT r9 #7): one HOT multi-MB
    payload among dozens of small ones through quarantine-mode real
    decode, with maxRecordsPerBatch pinned small so the hot row's
    Arrow batch stays bounded (the 100 TB memory contract: peak =
    batch rows x largest decode blow-up, not partition size) and two
    corrupt rows scattered through the batches.  Every row returns:
    the hot decode is exact, each corrupt row quarantines alone, and
    its batch siblings survive."""
    from semantic_similarity_system_using_aws_mapreduce_spark.multimodal import make_bmp, make_png

    fn = lambda x, y: (x * 9 % 256, y * 4 % 256, (x + y) % 256)  # noqa: E731
    big_w, big_h = 1200, 800  # ~2.9 MB BMP
    rows = []
    for i in range(40):
        rows.append((i, "image", make_png(8, 6, fn), "png", 8, 6, None))
    hot = make_bmp(big_w, big_h, fn)
    assert len(hot) > 2_500_000
    rows.append((100, "image", hot, "bmp", big_w, big_h, None))
    rows.append((101, "image", b"\x89PNG\r\n\x1a\n torn", "png", 8, 6, None))
    rows.append((102, "image", b"BM torn bmp", "bmp", 4, 4, None))
    prior = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "8")
    try:
        media = spark.createDataFrame(rows, MEDIA_SCHEMA).repartition(2)
        got = {
            r.media_id: r
            for r in decode_media(
                media, decoder="real", on_error="quarantine"
            ).collect()
        }
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prior)
    assert len(got) == 43
    small_sum = sum(
        (299 * fn(x, y)[0] + 587 * fn(x, y)[1] + 114 * fn(x, y)[2]) // 1000
        for y in range(6)
        for x in range(8)
    )
    for i in range(40):
        assert got[i].error is None and got[i].checksum == small_sum, i
    assert got[100].error is None
    assert got[100].pixels_or_samples == big_w * big_h
    assert got[101].checksum is None and got[101].error
    assert got[102].checksum is None and got[102].error


# ---------------------------------------------------------------------------
# ICO favicons (r9): a container of classic DIB entries (doubled-
# height BITMAPINFOHEADER, bottom-up padded rows, 32/24/8/4/1 bpp,
# BGRX palettes, AND mask) or embedded PNGs, decoding the LARGEST
# entry.  A crawl fetches one of these per host.


def test_ico_all_entry_formats_match_bmp():
    """Every encoder entry format decodes to the exact BMP-twin
    checksum; the embedded-PNG form routes through the full PNG
    decoder; multi-entry files pick the largest entry."""
    from semantic_similarity_system_using_aws_mapreduce_spark.multimodal import (
        _decode_bmp,
        _decode_ico,
        make_bmp,
        make_ico,
    )

    fn = lambda x, y: (  # noqa: E731
        (x * 7 + y * 3) % 256,
        (x * 2 + y * 11) % 256,
        (x * 13 + y * 5) % 256,
    )
    pal8 = [(i * 30 % 256, i * 50 % 256, i * 70 % 256) for i in range(8)]
    pfn = lambda x, y: pal8[(x + 2 * y) % 8]  # noqa: E731
    bifn = lambda x, y: [(0, 0, 0), (255, 255, 255)][(x ^ y) & 1]  # noqa: E731
    for w, h in ((1, 1), (7, 5), (16, 10), (33, 21)):
        want = _decode_bmp(make_bmp(w, h, fn))
        for ef in ("dib24", "dib32", "png"):
            assert _decode_ico(make_ico(w, h, fn, (ef,))) == want, (ef, w, h)
        pw = _decode_bmp(make_bmp(w, h, pfn))
        for ef in ("dib8", "dib4"):
            assert _decode_ico(make_ico(w, h, pfn, (ef,))) == pw, (ef, w, h)
        bw = _decode_bmp(make_bmp(w, h, bifn))
        assert _decode_ico(make_ico(w, h, bifn, ("dib1",))) == bw, (w, h)
    # the largest entry wins regardless of directory position: later
    # entries are half-size, so a 3-entry file still reports entry 0
    want = _decode_bmp(make_bmp(32, 20, fn))
    assert _decode_ico(make_ico(32, 20, fn, ("dib24", "png", "dib24"))) == want


def test_ico_gates_and_garbage_never_hangs():
    """Exotic DIB compressions raise the library gate; malformed
    directories and truncations reject loudly."""
    import struct

    from semantic_similarity_system_using_aws_mapreduce_spark.multimodal import _decode_ico, make_ico

    fn = lambda x, y: (x * 3 % 256, y * 5 % 256, (x ^ y) % 256)  # noqa: E731
    data = make_ico(16, 12, fn, ("dib24",))
    # flip the DIB's biCompression field to BI_RLE8
    hdr_at = 6 + 16  # directory header + one entry
    mut = bytearray(data)
    struct.pack_into("<I", mut, hdr_at + 16, 1)
    with pytest.raises(NotImplementedError, match="compression"):
        _decode_ico(bytes(mut))
    with pytest.raises(ValueError, match="not an ICO"):
        _decode_ico(b"\x00\x00\x03\x00\x01\x00")  # type 3
    with pytest.raises(ValueError, match="no entries"):
        _decode_ico(b"\x00\x00\x01\x00\x00\x00")
    for cut in range(4, len(data), 9):
        try:
            _decode_ico(data[:cut])
        except (ValueError, NotImplementedError, IndexError):
            pass
    for k in range(6, len(data) - 1, 7):
        mut = bytearray(data)
        mut[k] ^= 0x55
        try:
            a = _decode_ico(bytes(mut))
            b = _decode_ico(bytes(mut))
            assert a == b
        except (ValueError, NotImplementedError, IndexError):
            pass


def test_ico_through_decode_media(spark):
    """ICO payloads decode through the live plan stdlib-only."""
    from semantic_similarity_system_using_aws_mapreduce_spark.multimodal import make_ico

    rows = []
    for i, ef in enumerate(("dib24", "png", "dib4")):
        pal4 = [(0, 0, 0), (255, 0, 0), (0, 255, 0), (0, 0, 255)]
        fn = (lambda x, y, _i=i: ((x * 3 + _i) % 256, y * 7 % 256, 0)) if ef != "dib4" \
            else (lambda x, y: pal4[(x + y) % 4])
        rows.append((i, "image", make_ico(10, 8, fn, (ef,)), "ico", 10, 8, None))
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = decode_media(media, decoder="real").collect()
    assert len(got) == 3 and all(r.pixels_or_samples == 80 for r in got)


# ---------------------------------------------------------------------------
# Baseline TIFF (r9) — the scan/document format: IFD walk both byte
# orders, strips, uncompressed/PackBits/Deflate/TIFF-LZW (early
# change), horizontal predictor, bilevel/grey/palette/RGB.  The JDK's
# javax.imageio TIFF plugin is a TWO-WAY third-party oracle.


def test_tiff_all_modes_match_bmp():
    """Every make_tiff photometric x compression combination decodes
    to the exact BMP-twin checksum (TIFF is lossless), including the
    horizontal-differencing predictor and WhiteIsZero bilevel."""
    from semantic_similarity_system_using_aws_mapreduce_spark.multimodal import (
        _decode_bmp,
        _decode_tiff,
        make_bmp,
        make_tiff,
    )

    fn = lambda x, y: (  # noqa: E731
        (x * 7 + y * 3) % 256,
        (x * 2 + y * 11) % 256,
        (x * 13 + y * 5) % 256,
    )
    gfn = lambda x, y: (((x * 11 + y * 3) % 256),) * 3  # noqa: E731
    pal8 = [(i * 30 % 256, i * 50 % 256, i * 70 % 256) for i in range(8)]
    pfn = lambda x, y: pal8[(x + 2 * y) % 8]  # noqa: E731
    bifn = lambda x, y: [(0, 0, 0), (255, 255, 255)][(x ^ y) & 1]  # noqa: E731
    for w, h in ((1, 1), (7, 5), (16, 10), (33, 21)):
        want = _decode_bmp(make_bmp(w, h, fn))
        for comp in ("none", "packbits", "deflate"):
            assert _decode_tiff(make_tiff(w, h, fn, compression=comp)) == want
        assert _decode_tiff(
            make_tiff(w, h, fn, compression="deflate", predictor=True)
        ) == want
        assert _decode_tiff(
            make_tiff(w, h, gfn, photometric="grey", compression="packbits")
        ) == _decode_bmp(make_bmp(w, h, gfn))
        assert _decode_tiff(
            make_tiff(w, h, pfn, photometric="palette")
        ) == _decode_bmp(make_bmp(w, h, pfn))
        assert _decode_tiff(
            make_tiff(w, h, bifn, photometric="bilevel")
        ) == _decode_bmp(make_bmp(w, h, bifn))


def test_tiff_committed_jdk_fixtures():
    """TRUE third-party conformance without a JVM at test time: the
    committed streams were written by the JDK TIFF plugin with
    explicit LZW and PackBits compression over a regenerable pattern;
    lossless, so the decode must reproduce the pattern exactly — any
    drift in the LZW early-change logic or the PackBits runs breaks
    it."""
    import pathlib

    from semantic_similarity_system_using_aws_mapreduce_spark.multimodal import _decode_tiff

    fixdir = pathlib.Path(__file__).parent / "data" / "tiff"
    fn = lambda x, y: (  # noqa: E731
        (x * 7 + y * 3) % 256,
        (x * 2 + y * 11) % 256,
        (x * 13 + y * 5) % 256,
    )
    want = sum(
        (299 * fn(x, y)[0] + 587 * fn(x, y)[1] + 114 * fn(x, y)[2]) // 1000
        for y in range(27)
        for x in range(41)
    )
    assert (want, 41 * 27) == (131139, 1107)  # the pattern regenerates
    for name in ("jdk_lzw_41x27.tiff", "jdk_packbits_41x27.tiff"):
        data = (fixdir / name).read_bytes()
        assert _decode_tiff(data) == (131139, 1107), name


def test_tiff_live_jdk_conformance(spark):
    """Two-way live oracle via the Spark JVM: the JDK plugin's
    LZW/PackBits/Deflate/ZLib/uncompressed output decodes to the exact
    pattern, and the JDK reads every make_tiff variant back to the
    same raw samples this decoder reports (raster samples, not
    getRGB — Java gamma-converts its linear-gray color space)."""
    from semantic_similarity_system_using_aws_mapreduce_spark.multimodal import _decode_tiff, make_tiff

    jvm = spark.sparkContext._jvm
    writers = jvm.javax.imageio.ImageIO.getImageWritersByFormatName("tiff")
    if not writers.hasNext():
        pytest.skip("JVM has no TIFF plugin")

    fn = lambda x, y: (  # noqa: E731
        (x * 7 + y * 3) % 256,
        (x * 2 + y * 11) % 256,
        (x * 13 + y * 5) % 256,
    )

    def jvm_write(w, h, compression):
        img = jvm.java.awt.image.BufferedImage(w, h, 1)
        for y in range(h):
            for x in range(w):
                r, g, b = fn(x, y)
                img.setRGB(x, y, (r << 16) | (g << 8) | b)
        baos = jvm.java.io.ByteArrayOutputStream()
        ios = jvm.javax.imageio.ImageIO.createImageOutputStream(baos)
        writer = jvm.javax.imageio.ImageIO.getImageWritersByFormatName("tiff").next()
        writer.setOutput(ios)
        param = writer.getDefaultWriteParam()
        if compression:
            param.setCompressionMode(jvm.javax.imageio.ImageWriteParam.MODE_EXPLICIT)
            param.setCompressionType(compression)
        writer.write(None, jvm.javax.imageio.IIOImage(img, None, None), param)
        ios.flush()
        writer.dispose()
        return bytes(baos.toByteArray())

    w, h = 33, 21
    want = (
        sum(
            (299 * fn(x, y)[0] + 587 * fn(x, y)[1] + 114 * fn(x, y)[2]) // 1000
            for y in range(h)
            for x in range(w)
        ),
        w * h,
    )
    for comp in (None, "LZW", "PackBits", "Deflate", "ZLib"):
        assert _decode_tiff(jvm_write(w, h, comp)) == want, comp

    def jvm_luma_sum(data):
        bais = jvm.java.io.ByteArrayInputStream(bytearray(data))
        img = jvm.javax.imageio.ImageIO.read(bais)
        assert img is not None
        raster = img.getRaster()
        ww, hh = img.getWidth(), img.getHeight()
        bands = raster.getNumBands()
        total = 0
        for y in range(hh):
            for x in range(ww):
                if bands >= 3:
                    r = raster.getSample(x, y, 0)
                    g = raster.getSample(x, y, 1)
                    b = raster.getSample(x, y, 2)
                elif img.getColorModel().getPixelSize() <= 8 and bands == 1 and \
                        img.getType() == 13:  # TYPE_BYTE_INDEXED: palette
                    v = img.getRGB(x, y)
                    r, g, b = (v >> 16) & 255, (v >> 8) & 255, v & 255
                else:
                    r = g = b = raster.getSample(x, y, 0)
                    if img.getColorModel().getPixelSize() == 1:
                        r = g = b = 255 * r
                total += (299 * r + 587 * g + 114 * b) // 1000
        return total, ww * hh

    pal8 = [(i * 30 % 256, i * 50 % 256, i * 70 % 256) for i in range(8)]
    cases = [
        (fn, {}),
        (fn, {"compression": "packbits"}),
        (fn, {"compression": "deflate", "predictor": True}),
        (lambda x, y: pal8[(x + 2 * y) % 8], {"photometric": "palette"}),
        (lambda x, y: (((x * 11 + y * 3) % 256),) * 3, {"photometric": "grey"}),
    ]
    for f2, kw in cases:
        mine = make_tiff(19, 11, f2, **kw)
        assert jvm_luma_sum(mine) == _decode_tiff(mine), kw


def test_tiff_gates_and_garbage_never_hangs():
    """Tiled layout and CCITT fax codings raise the loud library gate;
    truncations and bit-flips reject or decode deterministically."""
    import struct

    from semantic_similarity_system_using_aws_mapreduce_spark.multimodal import _decode_tiff, make_tiff

    fn = lambda x, y: (x * 3 % 256, y * 5 % 256, (x ^ y) % 256)  # noqa: E731
    data = make_tiff(16, 12, fn, compression="packbits")
    # rewrite the compression tag (259) to CCITT T.4 (3)
    mut = bytearray(data)
    n_tags = struct.unpack_from("<H", mut, 8)[0]
    for i in range(n_tags):
        off = 10 + 12 * i
        if struct.unpack_from("<H", mut, off)[0] == 259:
            struct.pack_into("<H", mut, off + 8, 3)
    with pytest.raises(NotImplementedError, match="CCITT"):
        _decode_tiff(bytes(mut))
    with pytest.raises(ValueError, match="not a TIFF"):
        _decode_tiff(b"II+\x00junk")
    for cut in range(4, len(data), 9):
        try:
            _decode_tiff(data[:cut])
        except (ValueError, NotImplementedError, IndexError):
            pass
    for k in range(8, len(data) - 1, 7):
        mut = bytearray(data)
        mut[k] ^= 0x33
        try:
            a = _decode_tiff(bytes(mut))
            b = _decode_tiff(bytes(mut))
            assert a == b
        except (ValueError, NotImplementedError, IndexError):
            pass
