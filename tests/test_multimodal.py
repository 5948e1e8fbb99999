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


def test_decoders_adversarial_headers(rgb_px):
    """Table-driven adversarial byte layouts (VERDICT r3 #7): every
    case must either decode to exactly the right pixel array or raise
    ValueError (quarantine) / NotImplementedError (no decoder) —
    never return a wrong or degenerate pixel array.  Covers
    comment-laden PPM headers, maxval edges, zero/negative dims,
    top-down and 4-byte-aligned odd-width BMPs, header-overlapping
    pixel offsets, truncations, and random garbage."""
    import struct

    def ppm_hdr(w, h, maxval, body: bytes, pre=b"\n") -> bytes:
        return f"P6".encode() + pre + f"{w} {h}\n{maxval}\n".encode() + body

    px = rgb_px  # 5x7x3
    body = px.tobytes()
    one = np.full((1, 1, 3), 200, dtype=np.uint8)

    ok_cases = [
        # (bytes, expected array)
        (_ppm_bytes(px), px),
        (_ppm_bytes(px, comment=True), px),
        # multiple comments + mixed whitespace between every token
        (b"P6 # c1\n#c2\n 7\t5 # mid comment\n\n255\n" + body, px),
        # CR / TAB as the single post-maxval whitespace byte
        (b"P6\n7 5\n255\t" + body, px),
        # maxval edge 255 explicit and minimal maxval 1
        (ppm_hdr(7, 5, 255, body), px),
        (ppm_hdr(1, 1, 1, bytes([1, 0, 1])), np.array([[[1, 0, 1]]], np.uint8)),
        # trailing junk after a complete raster is ignored
        (_ppm_bytes(px) + b"JUNK", px),
        (_bmp_bytes(px), px),
        (_bmp_bytes(px, top_down=True), px),
        (_bmp_bytes(px, bpp=32), px),
        (_bmp_bytes(one), one),  # w=1: 3 pixel bytes + 1 pad byte/row
        (_bmp_bytes(px[:, :6]), px[:, :6]),  # w=6: 18 bytes, 2 pad
        (_bmp_bytes(px[:, :4]), px[:, :4]),  # w=4: 12 bytes, no pad
    ]
    for raw, want in ok_cases:
        got = decode_media(raw, "image")
        assert got.dtype == np.uint8 and got.shape == want.shape
        assert np.array_equal(got, want), raw[:24]

    bad_cases = [
        ppm_hdr(0, 5, 255, body),              # zero width
        ppm_hdr(7, 0, 255, body),              # zero height
        ppm_hdr(-7, 5, 255, body),             # negative width parses as int
        ppm_hdr(7, -5, 255, body),             # negative height
        ppm_hdr(7, 5, 0, body),                # maxval 0
        ppm_hdr(7, 5, 256, body),              # 2-byte-sample maxval
        ppm_hdr(7, 5, 65535, body),            # way out of range
        b"P6\n7 5\n255\n",                     # header only, empty raster
        _ppm_bytes(px)[:-1],                   # 1 byte short
        b"P6\n#only comments forever",         # header never completes
        b"P6\n7 x\n255\n" + body,              # non-numeric token
        b"P3\n7 5\n255\n" + body,              # ASCII PPM (unsupported)
        _bmp_with_offset(px, 0),               # pixel offset 0 = header bytes as pixels
        _bmp_with_offset(px, 14),              # offset inside DIB header
        _bmp_with_offset(px, 53),              # one short of the header end
        _bmp_bytes(px)[:-3],                   # truncated raster
        _bmp_bytes(px)[:20],                   # truncated header
        _bmp_hacked(px, 28, struct.pack("<H", 8)),   # 8bpp palette
        _bmp_hacked(px, 28, struct.pack("<H", 16)),  # 16bpp
        _bmp_hacked(px, 30, struct.pack("<I", 3)),   # BI_BITFIELDS
        _bmp_hacked(px, 18, struct.pack("<i", 0)),   # zero width
        _bmp_hacked(px, 18, struct.pack("<i", -7)),  # negative width
        _bmp_hacked(px, 22, struct.pack("<i", 0)),   # zero height
        _bmp_hacked(px, 18, struct.pack("<i", 1 << 28)),  # absurd width -> truncated
    ]
    for raw in bad_cases:
        with pytest.raises((ValueError, NotImplementedError)):
            decode_media(raw, "image")

    # random garbage fuzz: forged magic + noise must never return an array
    rng = np.random.Generator(np.random.PCG64(99))
    for magic in (b"P6", b"BM"):
        for n in (2, 7, 40, 200):
            raw = magic + rng.integers(0, 256, n, dtype=np.uint8).tobytes()
            try:
                got = decode_media(raw, "image")
            except (ValueError, NotImplementedError, OverflowError):
                continue
            # if it decoded, the raster must be fully consistent:
            # non-degenerate uint8 pixels that fit inside the buffer
            assert got.dtype == np.uint8 and got.ndim == 3 and got.shape[2] == 3
            assert got.shape[0] > 0 and got.shape[1] > 0
            assert got.size <= len(raw) * 4 / 3 + 64


def _bmp_with_offset(px, off: int) -> bytes:
    import struct

    raw = bytearray(_bmp_bytes(px))
    raw[10:14] = struct.pack("<I", off)
    return bytes(raw)


def _bmp_hacked(px, at: int, patch: bytes) -> bytes:
    raw = bytearray(_bmp_bytes(px))
    raw[at : at + len(patch)] = patch
    return bytes(raw)
