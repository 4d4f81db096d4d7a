"""Spark-side multimodal surface: schemas, synthetic corpora, and the
mapInPandas decode/feature plans.  The per-format codecs live in the
sibling modules (codecs_image / codecs_webp / codecs_jpeg /
codecs_jpeg_arith / audio / codecs_vorbis / codecs_mp4); this module
owns everything the QUERY layer touches — decode_media,
extract_features, sample_frames, codec_support, and the two
synthesizers.  See the package __init__ for the format inventory and
the permanent-gate rationale."""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from semantic_similarity_system_using_aws_mapreduce_spark.multimodal.audio import (
    _decode_flac,
    _decode_wav,
    _decode_y4m,
    make_adpcm_wav,
    make_flac,
    make_wav,
    make_y4m,
)
from semantic_similarity_system_using_aws_mapreduce_spark.multimodal.codecs_image import (
    _decode_bmp,
    _decode_gif,
    _decode_ico,
    _decode_png,
    _decode_tiff,
    make_bmp,
    make_gif,
    make_ico,
    make_png,
    make_tiff,
)
from semantic_similarity_system_using_aws_mapreduce_spark.multimodal.codecs_jpeg import (
    _decode_jpeg,
    make_jpeg,
)
from semantic_similarity_system_using_aws_mapreduce_spark.multimodal.codecs_mp4 import (
    _parse_mp4,
    make_mp4,
)
from semantic_similarity_system_using_aws_mapreduce_spark.multimodal.codecs_vorbis import (
    make_ogg_vorbis,
)
from semantic_similarity_system_using_aws_mapreduce_spark.multimodal.codecs_webp import (
    _decode_webp,
    make_webp,
)

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
DECODED_QUARANTINE_SCHEMA = DECODED_SCHEMA + ", error string"

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
                # avif/mp4 are library-gated (fake bytes must route to
                # the loud NotImplementedError, not a stdlib decoder —
                # the fake image label has moved bmp -> jpeg -> webp ->
                # avif as each gained a real stdlib decode; AV1 images
                # will always need a library)
                {"image": "avif", "audio": "wav", "video": "mp4"}[kind],
                64 if kind != "audio" else None,
                48 if kind != "audio" else None,
                1000 if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


# Formats the real decoder parses with stdlib + numpy alone — no
# external codec library involved.  "jpeg" means every DCT-based
# T.81 process: baseline/extended sequential AND progressive, Huffman
# AND arithmetic entropy coding (grayscale / 4:4:4 / 4:2:0, restart
# markers, spectral selection + successive approximation); only the
# lossless/differential processes still fall through to the PIL gate.
STDLIB_FORMATS = {
    "bmp", "png", "gif", "jpeg", "webp", "ico", "tiff",
    "wav", "flac", "y4m", "mp4",
}


def synthesize_real_media(spark: SparkSession, n: int = 24) -> DataFrame:
    """Media table whose payloads are GENUINE encodings of the stdlib
    formats (24-bit BMP, PCM16 WAV, y4m) — deterministic content, so
    decode checksums are stable across runs and engines."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        if kind == "image":
            fn = lambda x, y, i=i: (x * 7 + i, y * 11, (x + y) * 3)  # noqa: E731
            # rotate the uncompressed format, both interlace modes of
            # the two lossless compressed formats, both JPEG entropy
            # coders, lossless WebP, an ICO favicon, and a PackBits
            # TIFF so one table exercises every real image decoder
            # path (a 16x10 pattern stays under GIF's 256 palette
            # entries)
            which = (i // 3) % 9
            if which == 8:
                rows.append(
                    (
                        i,
                        kind,
                        make_tiff(16, 10, fn, compression="packbits"),
                        "tiff",
                        16,
                        10,
                        None,
                    )
                )
                continue
            if which == 6:
                rows.append(
                    (i, kind, make_webp(16, 10, fn), "webp", 16, 10, None)
                )
                continue
            if which == 7:
                rows.append(
                    (
                        i,
                        kind,
                        make_ico(16, 10, fn, ("dib24", "png")),
                        "ico",
                        16,
                        10,
                        None,
                    )
                )
                continue
            if which == 0:
                rows.append((i, kind, make_bmp(16, 10, fn), "bmp", 16, 10, None))
            elif which == 1:
                rows.append((i, kind, make_png(16, 10, fn), "png", 16, 10, None))
            elif which == 2:
                # palette + Adam7 in one row: the two r9 PNG paths
                rows.append(
                    (
                        i,
                        kind,
                        make_png(
                            16, 10, fn, interlace=True, color_type=3, depth=8
                        ),
                        "png",
                        16,
                        10,
                        None,
                    )
                )
            elif which == 3:
                rows.append(
                    (
                        i,
                        kind,
                        make_gif(16, 10, fn, interlace=i % 2 == 0),
                        "gif",
                        16,
                        10,
                        None,
                    )
                )
            elif which == 4:
                rows.append(
                    (i, kind, make_jpeg(16, 10, fn), "jpeg", 16, 10, None)
                )
            else:
                rows.append(
                    (
                        i,
                        kind,
                        make_jpeg(16, 10, fn, arithmetic=True),
                        "jpeg",
                        16,
                        10,
                        None,
                    )
                )
        elif kind == "audio":
            samples = [((j * 37 + i * 101) % 2048) - 1024 for j in range(400)]
            # rotate PCM16, IMA-ADPCM (both labeled "wav"; the decoder
            # sniffs the fmt tag), FLAC and Ogg Vorbis so one table
            # exercises the uncompressed, lossy-legacy, lossless AND
            # perceptual-codec audio paths ("flac" is the Ogg entry
            # point — the decoder dispatches on the OggS magic)
            which = (i // 3) % 4
            if which == 2:
                rows.append(
                    (i, kind, make_flac(samples), "flac", None, None, 50)
                )
            elif which == 3:
                rows.append(
                    (i, kind, make_ogg_vorbis(samples), "flac", None, None, 50)
                )
            else:
                enc = make_wav if which == 0 else make_adpcm_wav
                rows.append((i, kind, enc(samples), "wav", None, None, 50))
        else:
            # alternate the raw-frame stream and the MP4 container so
            # one table exercises both real video parsers
            if (i // 3) % 2 == 0:
                data = make_y4m(8, 6, 3 + i % 4, lambda f, j, i=i: f * 31 + j + i)
                rows.append((i, kind, data, "y4m", 8, 6, 1000))
            else:
                rows.append((i, kind, make_mp4(3 + i % 4), "mp4", 8, 6, 1000))
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


def _decode_one(kind, fmt, data, support: dict[str, bool]) -> tuple[int, int]:
    """Decode ONE payload to (checksum, pixels_or_samples) — the
    stdlib dispatch with library-gate fallbacks, shared by the
    raise-through and quarantine paths."""
    import io

    fmt = (fmt or "").lower()
    if fmt == "bmp":
        checksum, count = _decode_bmp(data)
    elif fmt == "png":
        checksum, count = _decode_png(data)
    elif fmt == "gif":
        checksum, count = _decode_gif(data)
    elif fmt in ("jpeg", "jpg"):
        try:
            checksum, count = _decode_jpeg(data)
        except NotImplementedError:
            # lossless/differential variants fall through to the
            # library gate below (PIL decodes them when present)
            if not (kind == "image" and support.get("image")):
                raise
            from PIL import Image

            arr = np.asarray(
                Image.open(io.BytesIO(bytes(data))).convert("L"), dtype=np.int64
            )
            checksum, count = int(arr.sum()), int(arr.size)
    elif fmt == "ico":
        try:
            checksum, count = _decode_ico(data)
        except NotImplementedError:
            # exotic DIB compressions fall to the PIL gate
            if not (kind == "image" and support.get("image")):
                raise
            from PIL import Image

            arr = np.asarray(
                Image.open(io.BytesIO(bytes(data))).convert("L"), dtype=np.int64
            )
            checksum, count = int(arr.sum()), int(arr.size)
    elif fmt in ("tiff", "tif"):
        try:
            checksum, count = _decode_tiff(data)
        except NotImplementedError:
            # tiled / planar-2 / CCITT-fax variants fall to the PIL gate
            if not (kind == "image" and support.get("image")):
                raise
            from PIL import Image

            arr = np.asarray(
                Image.open(io.BytesIO(bytes(data))).convert("L"), dtype=np.int64
            )
            checksum, count = int(arr.sum()), int(arr.size)
    elif fmt == "webp":
        try:
            checksum, count = _decode_webp(data)
        except NotImplementedError:
            # lossy VP8 / extended VP8X fall to the PIL gate
            if not (kind == "image" and support.get("image")):
                raise
            from PIL import Image

            arr = np.asarray(
                Image.open(io.BytesIO(bytes(data))).convert("L"), dtype=np.int64
            )
            checksum, count = int(arr.sum()), int(arr.size)
    elif fmt == "wav":
        checksum, count = _decode_wav(data)
    elif fmt == "flac":
        try:
            checksum, count = _decode_flac(data)
        except NotImplementedError:
            # Ogg Opus / >2-channel / floor-0 fall to the soundfile gate
            if not (kind == "audio" and support.get("audio")):
                raise
            import soundfile as sf

            samples, _rate = sf.read(io.BytesIO(bytes(data)))
            checksum = int(np.abs(samples).sum())
            count = int(np.asarray(samples).size)
    elif fmt == "y4m":
        checksum, count = _decode_y4m(data)
    elif fmt == "mp4":
        try:
            checksum, count = _parse_mp4(data)
        except NotImplementedError:
            # fragmented streams fall to the av gate
            if not (kind == "video" and support.get("video")):
                raise
            import av

            with av.open(io.BytesIO(bytes(data))) as container:
                checksum = count = sum(1 for _ in container.decode(video=0))
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
    return checksum, count


def _real_decode(pdf: pd.DataFrame, support: dict[str, bool],
                 quarantine: bool = False) -> pd.DataFrame:
    n_bytes, checksums, pixels, errors = [], [], [], []
    for kind, fmt, data in zip(pdf["kind"], pdf["format"], pdf["data"]):
        if quarantine:
            try:
                checksum, count = _decode_one(kind, fmt, data, support)
                errors.append(None)
            except Exception as ex:  # one bad payload, not the batch
                checksum = count = None
                errors.append(f"{type(ex).__name__}: {ex}")
        else:
            checksum, count = _decode_one(kind, fmt, data, support)
        checksums.append(checksum)
        pixels.append(count)
        n_bytes.append(len(data))
    if quarantine:
        return pd.DataFrame(
            {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": n_bytes,
                "checksum": pd.array(checksums, dtype="Int64"),
                "pixels_or_samples": pd.array(pixels, dtype="Int64"),
                "error": errors,
            }
        )
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


def decode_media(media: DataFrame, decoder: str = "fake",
                 on_error: str = "raise") -> DataFrame:
    """Decode binary payloads to per-item metadata via mapInPandas.

    ``decoder="real"`` GENUINELY decodes the stdlib formats (24-bit
    BMP, PNG, GIF, Huffman AND arithmetic DCT JPEG, lossless WebP,
    PCM16/IMA-ADPCM WAV, native FLAC, y4m — :data:`STDLIB_FORMATS`)
    with no external library, and dispatches the rest (lossless JPEG,
    lossy WebP, Ogg Opus, MP4 pixels) to whatever codec libraries the
    environment offers (PIL / soundfile / av, per
    :func:`codec_support`).

    ``on_error`` picks the failure semantics for a payload nothing can
    decode (or that is corrupt): ``"raise"`` fails the task loudly —
    right for tests and known-clean tables; ``"quarantine"`` confines
    the failure to its ONE row (null checksum/pixels plus an ``error``
    column naming the exception), the same per-record philosophy as
    the WARC reader — at crawl scale one torn image must never kill a
    stage after hours of work.  The Spark plan is identical across
    decoders and error modes; only the inner pandas function and the
    declared schema change."""
    if on_error not in ("raise", "quarantine"):
        raise ValueError(f"unknown on_error mode {on_error!r}")
    support = codec_support() if decoder == "real" else {}
    quarantine = on_error == "quarantine"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "real":
                yield _real_decode(pdf, support, quarantine=quarantine)
            else:
                out = _fake_decode(pdf)
                if quarantine:  # fake decode is total; errors all null
                    out = out.assign(error=None)
                yield out

    schema = DECODED_QUARANTINE_SCHEMA if quarantine else DECODED_SCHEMA
    return media.mapInPandas(run, schema=schema)


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
