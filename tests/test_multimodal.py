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


# ---------------------------------------------------------------- real decode

import numpy as np


def _ppm_bytes(px: np.ndarray, comment: bool = False) -> bytes:
    """Independent PPM writer (test-side, not the module's parser)."""
    h, w, _ = px.shape
    hdr = b"P6\n" + (b"# test comment\n" if comment else b"") + f"{w} {h}\n255\n".encode()
    return hdr + px.tobytes()


def _bmp_bytes(px: np.ndarray, top_down: bool = False, bpp: int = 24) -> bytes:
    """Independent BMP writer: BI_RGB, 4-byte row padding, BGR order,
    bottom-up unless top_down."""
    import struct

    h, w, _ = px.shape
    ch = bpp // 8
    row = w * ch
    pad = (-row) % 4
    raster = b""
    order = range(h) if top_down else range(h - 1, -1, -1)
    for y in order:
        for x in range(w):
            r, g, b = (int(v) for v in px[y, x])
            raster += bytes([b, g, r] + ([0] if ch == 4 else []))
        raster += b"\x00" * pad
    off = 14 + 40
    filehdr = b"BM" + struct.pack("<IHHI", off + len(raster), 0, 0, off)
    infohdr = struct.pack(
        "<IiiHHIIiiII", 40, w, (-h if top_down else h), 1, bpp, 0, len(raster), 2835, 2835, 0, 0
    )
    return filehdr + infohdr + raster


@pytest.fixture(scope="module")
def rgb_px():
    rng = np.random.Generator(np.random.PCG64(11))
    return rng.integers(0, 256, (5, 7, 3), dtype=np.uint8)  # w=7 -> row padding


def test_decode_ppm_roundtrip(rgb_px):
    assert np.array_equal(decode_media(_ppm_bytes(rgb_px), "image"), rgb_px)
    assert np.array_equal(decode_media(_ppm_bytes(rgb_px, comment=True), "image"), rgb_px)


def test_decode_bmp_roundtrip_both_orientations(rgb_px):
    assert np.array_equal(decode_media(_bmp_bytes(rgb_px), "image"), rgb_px)
    assert np.array_equal(decode_media(_bmp_bytes(rgb_px, top_down=True), "image"), rgb_px)
    assert np.array_equal(decode_media(_bmp_bytes(rgb_px, bpp=32), "image"), rgb_px)


def test_decode_rejects_compressed_or_truncated(rgb_px):
    import struct

    with pytest.raises(NotImplementedError):
        decode_media(b"\x89PNG1234", "image")  # compressed format, no PIL
    ppm = _ppm_bytes(rgb_px)
    with pytest.raises(ValueError):
        decode_media(ppm[: len(ppm) - 5], "image")  # truncated raster
    bmp = bytearray(_bmp_bytes(rgb_px))
    bmp[30:34] = struct.pack("<I", 1)  # BI_RLE8 compression flag
    with pytest.raises(ValueError):
        decode_media(bytes(bmp), "image")


def test_pixel_features_golden(rgb_px):
    """pixel_features vs a from-scratch per-pixel recomputation."""
    from deduplicator_spark.operators.multimodal import pixel_features

    counts = [0] * 16
    for y in range(rgb_px.shape[0]):
        for x in range(rgb_px.shape[1]):
            r, g, b = (float(v) for v in rgb_px[y, x])
            lum = 0.299 * r + 0.587 * g + 0.114 * b
            counts[min(int(lum) // 16, 15)] += 1
    want = np.asarray(counts, dtype=np.float64)
    want = (want / np.linalg.norm(want)).astype(np.float32)
    got = pixel_features(rgb_px)
    assert np.array_equal(got, want)
    # format-independence: same pixels via PPM and BMP -> same features
    assert np.array_equal(
        pixel_features(decode_media(_ppm_bytes(rgb_px), "image")),
        pixel_features(decode_media(_bmp_bytes(rgb_px), "image")),
    )


def test_extract_features_real_decoder(spark, rgb_px):
    """decoder='real' end-to-end: PPM/BMP rows featurize from pixels,
    undecodable rows quarantine."""
    rows = [
        ("m://x.ppm", "image", _ppm_bytes(rgb_px), (7, 5, None)),
        ("m://x.bmp", "image", _bmp_bytes(rgb_px), (7, 5, None)),
        ("m://x.png", "image", b"\x89PNGnotreallydecodable", (1, 1, None)),
        ("m://x.mp3", "audio", b"\x00" * 64, (None, None, 100)),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["url"]: r for r in extract_media_features(df, decoder="real").collect()}
    from deduplicator_spark.operators.multimodal import pixel_features

    want = pixel_features(rgb_px).tolist()
    assert got["m://x.ppm"]["features"] == pytest.approx(want)
    assert got["m://x.bmp"]["features"] == pytest.approx(want)
    assert got["m://x.png"]["features"] is None   # quarantined, not thrown
    assert got["m://x.mp3"]["features"] is None
