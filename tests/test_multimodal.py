"""Multimodal binary-column plumbing: schemas, Arrow batch shapes,
fan-out, and the stubbed real-codec seam."""

import numpy as np
import pytest

from semantic_similarity_system_using_aws_mapreduce_spark.multimodal import (
    FEATURE_DIM,
    decode_media,
    extract_features,
    sample_frames,
    synthesize_media,
)


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


def test_decode_real_is_stubbed(spark, media):
    with pytest.raises(Exception) as exc_info:
        decode_media(media, decoder="real").collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )


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
