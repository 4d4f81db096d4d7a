"""Multimodal columns: image/audio/video as opaque binary columns with
typed metadata, processed via Arrow-batched pandas operators.

The Spark-side plumbing (schemas, batch iterator shape, partition
behavior) is real and tested; the actual codec work is STUBBED — the
runtime image/audio libraries are not in this environment, so
`decode_fn="real"` raises NotImplementedError and the deterministic
fake decoder stands in for tests.  Swapping in PIL/ffmpeg later changes
only the inner function, not the Spark plan.

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
                {"image": "png", "audio": "wav", "video": "mp4"}[kind],
                64 if kind != "audio" else None,
                48 if kind != "audio" else None,
                1000 if kind != "image" else None,
            )
        )
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
    for kind, data in zip(pdf["kind"], pdf["data"]):
        if not support.get(kind):
            raise NotImplementedError(
                f"no codec available for kind={kind!r} (probe: {support})"
            )
        if kind == "image":
            from PIL import Image

            img = Image.open(io.BytesIO(bytes(data)))
            arr = np.asarray(img.convert("L"), dtype=np.int64)
            checksums.append(int(arr.sum()))
            pixels.append(int(arr.size))
        elif kind == "audio":
            import soundfile as sf

            samples, _rate = sf.read(io.BytesIO(bytes(data)))
            checksums.append(int(np.abs(samples).sum()))
            pixels.append(int(np.asarray(samples).size))
        else:  # video
            import av

            with av.open(io.BytesIO(bytes(data))) as container:
                frames = sum(1 for _ in container.decode(video=0))
            checksums.append(frames)
            pixels.append(frames)
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

    ``decoder="real"`` uses whatever codec libraries the environment
    offers (PIL / soundfile / av, per :func:`codec_support`) and raises
    NotImplementedError up front when none are importable — in this
    container that is always, so tests exercise the seam via the probe
    (skip-marked for the real-decode path).  The Spark plan is
    identical either way; only the inner pandas function changes.
    """
    if decoder == "real":
        support = codec_support()
        if not any(support.values()):
            raise NotImplementedError(
                f"no real codecs importable in this environment ({support}); "
                "use decoder='fake'"
            )
    else:
        support = {}

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
