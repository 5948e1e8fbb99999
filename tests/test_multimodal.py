"""Multimodal plumbing: schema, batch shape, quarantine, near-dup."""

from __future__ import annotations

import pytest

from deduplicator_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    decode_media,
    deterministic_fake_decoder,
    extract_media_features,
    media_near_dup_pairs,
)


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [
        ("m://a.jpg", "image", b"\x89PNG" + bytes(range(256)) * 8, (64, 64, None)),
        ("m://a2.jpg", "image", b"\x89PNG" + bytes(range(256)) * 8, (64, 64, None)),  # dup bytes
        ("m://b.jpg", "image", bytes([7] * 2048), (32, 32, None)),
        ("m://v.mp4", "video", bytes(range(256)) * 64, (None, None, 9000)),
        ("m://bad.jpg", "image", None, (None, None, None)),
        ("m://empty.mp3", "audio", b"", (None, None, 100)),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_decode_media_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_media(b"xx", "image")


def test_fake_decoder_deterministic_and_normalized():
    import numpy as np

    f1 = deterministic_fake_decoder(b"hello world")
    f2 = deterministic_fake_decoder(b"hello world")
    assert np.array_equal(f1, f2)
    assert abs(float(np.linalg.norm(f1)) - 1.0) < 1e-6
    assert f1.shape == (16,)


def test_extract_features_schema_and_quarantine(media_df):
    feats = extract_media_features(media_df)
    rows = {r["url"]: r for r in feats.collect()}
    assert len(rows) == 6
    assert rows["m://a.jpg"]["features"] is not None
    assert len(rows["m://a.jpg"]["features"]) == 16
    assert rows["m://v.mp4"]["n_frames"] > 1          # frame sampling ran
    assert rows["m://bad.jpg"]["features"] is None    # quarantine, no throw
    assert rows["m://empty.mp3"]["features"] is None


def test_media_near_dup_pairs(media_df):
    feats = extract_media_features(media_df)
    pairs = {(r["url_a"], r["url_b"]) for r in media_near_dup_pairs(feats).collect()}
    assert ("m://a.jpg", "m://a2.jpg") in pairs
    assert all("bad" not in a and "bad" not in b for a, b in pairs)
