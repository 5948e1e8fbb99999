"""Multimodal (image/audio/video) column plumbing.

Media content is an opaque ``binary`` column with typed metadata — the
Spark-side schema, partitioning, UDF signatures and Arrow batch shapes
are real and tested; the actual decoders (PIL/cv2/librosa) are NOT in
this container, so the decode step is stubbed:

- ``decode_media`` raises ``NotImplementedError`` with a clear message
  when the real libraries are absent (import-try gated), and
- ``deterministic_fake_decoder`` provides a seedless, content-derived
  stand-in (byte-histogram features) so every downstream stage —
  feature extraction, frame sampling, near-dup over features — runs
  end-to-end in tests.

Reference analog: the image/video decode sources (dupedb.py:33, 85,
92-98) with their corruption guards; failures here likewise quarantine
(null features) instead of throwing (dupedb.py:229-244).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField("meta", T.StructType([
            T.StructField("width", T.IntegerType(), True),
            T.StructField("height", T.IntegerType(), True),
            T.StructField("duration_ms", T.LongType(), True),
        ]), True),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("byte_len", T.LongType(), False),
        T.StructField("features", T.ArrayType(T.FloatType()), True),  # null => quarantine
        T.StructField("n_frames", T.IntegerType(), True),
    ]
)

try:  # real decoders, absent in this container
    import PIL.Image  # type: ignore  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False


def decode_media(content: bytes, media_type: str) -> np.ndarray:
    """Real decode path. STUB: requires PIL/cv2, not in this image."""
    if not _HAVE_PIL:
        raise NotImplementedError(
            "media decoding requires PIL/cv2 which are not installed; "
            "use deterministic_fake_decoder for tests or install the codecs"
        )
    raise NotImplementedError("real decoder wiring is environment-specific")


def deterministic_fake_decoder(content: bytes) -> np.ndarray:
    """Content-derived 16-bin byte histogram, L2-normalized — a
    deterministic stand-in with the same shape contract as a real
    embedding."""
    arr = np.frombuffer(content, dtype=np.uint8)
    hist = np.bincount(arr >> 4, minlength=16).astype(np.float64)
    norm = np.linalg.norm(hist)
    return (hist / norm if norm > 0 else hist).astype(np.float32)


def extract_media_features(media: DataFrame, frame_stride: int = 4096) -> DataFrame:
    """mapInPandas feature extraction over Arrow batches.

    - image: one feature vector over all bytes
    - audio: one vector + duration-derived frame count
    - video: 'frame sample' = one vector per ``frame_stride`` chunk,
      mean-pooled (real impl: decode + sample frames; same shape)
    Corrupt/empty content -> null features (quarantine, never throw).
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            out = []
            for url, mtype, content in zip(pdf["url"], pdf["media_type"], pdf["content"]):
                if content is None or len(content) == 0:
                    out.append((url, mtype, 0, None, None))
                    continue
                try:
                    if mtype == "video":
                        chunks = [
                            deterministic_fake_decoder(content[i : i + frame_stride])
                            for i in range(0, len(content), frame_stride)
                        ]
                        feat = np.mean(chunks, axis=0).astype(np.float32)
                        n_frames = len(chunks)
                    else:
                        feat = deterministic_fake_decoder(content)
                        n_frames = 1
                    out.append((url, mtype, len(content), feat.tolist(), n_frames))
                except Exception:
                    out.append((url, mtype, len(content), None, None))
            yield pd.DataFrame(
                out, columns=["url", "media_type", "byte_len", "features", "n_frames"]
            )

    # repartition by url so feature extraction parallelizes evenly even
    # when the source is few large files
    return media.repartition(F.col("url")).mapInPandas(extract, schema=FEATURES_SCHEMA)


def media_near_dup_pairs(features: DataFrame, min_cosine: float = 0.95) -> DataFrame:
    """Near-dup media via cosine over feature vectors (JVM-side), the
    media analog of the text MinHash stage."""
    v = features.filter(F.col("features").isNotNull()).select(
        "url", F.col("features").cast("array<double>").alias("v")
    )
    a, b = v.alias("a"), v.alias("b")
    dot = F.aggregate(
        F.zip_with("a.v", "b.v", lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x
    )
    return (
        a.join(b, F.col("a.url") < F.col("b.url"))
        .withColumn("cosine", F.round(dot, 6))
        .filter(F.col("cosine") >= min_cosine)
        .select(
            F.col("a.url").alias("url_a"), F.col("b.url").alias("url_b"), "cosine"
        )
    )
