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
def test_decode_real_raises_without_codecs(spark, media):
    """With no codec library importable, the real seam fails loudly and
    immediately (driver side), never silently."""
    with pytest.raises(NotImplementedError):
        decode_media(media, decoder="real")


@pytest.mark.skipif(
    not SUPPORT.get("image"), reason="PIL not importable in this environment"
)
def test_decode_real_images(spark):
    """Exercised the moment PIL appears: decode genuine PNG payloads
    through the same mapInPandas plan as the fake decoder."""
    import io

    from PIL import Image

    rows = []
    for i in range(4):
        buf = io.BytesIO()
        Image.new("L", (8, 6), color=i * 40).save(buf, format="PNG")
        rows.append((i, "image", buf.getvalue(), "png", 8, 6, None))
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r.media_id: r for r in decode_media(media, decoder="real").collect()}
    assert len(got) == 4
    for i, r in got.items():
        assert r.pixels_or_samples == 8 * 6
        assert r.checksum == 8 * 6 * i * 40


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
