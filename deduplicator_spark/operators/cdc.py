"""Content-defined chunking (CDC) dedup — Gear-hash chunk boundaries.

Fixed-window segment dedup (operators/segments.py) breaks when content
shifts: insert one byte and every downstream window changes.  CDC cuts
chunks where a rolling Gear hash hits a zero-mask, so boundaries are a
function of local CONTENT — after an insertion the chunker resyncs
within one chunk and every later chunk hashes identically again.  This
is the storage-dedup primitive (LBFS/FastCDC) applied to web text: it
catches shifted boilerplate and prefix/suffix-wrapped mirrors that both
exact md5 and fixed windows miss, cheaper than MinHash.

Semantics (pinned by the committed golden and the independent
implementation in tools/make_goldens.py):

- operates on UTF-8 bytes; offsets/lengths are byte-based
- gear table: ``gear[b] = first 8 bytes of md5(f"gear-{seed}-{b}")``
- rolling hash ``h = (h << 1) + gear[b]  (mod 2^64)`` — equivalently a
  64-byte sliding window, which is how the vectorized kernel computes
  it (the shift ages contributions out after 64 bytes)
- position i ends a chunk when ``h[i] & (avg_len-1) == 0`` and the
  chunk is >= min_len; chunks are force-cut at max_len; the document
  remainder is the final chunk; empty docs produce no chunks

Scale notes (100 TB): the kernel is one Arrow-batched ``mapInPandas``
pass (all-numpy, no per-row Python on the hash math; the boundary walk
touches only mask-hit candidates, ~len/avg_len per doc).  Everything
downstream is relational: the dedup stats are one map-side-combined
agg on chunk_md5 + one hash join back — same shape as segment dedup.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

GEAR_SEED = 42
_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def gear_table(seed: int = GEAR_SEED) -> np.ndarray:
    """256-entry uint64 gear table, derived from md5 so any engine (or
    the pure-Python golden generator) rebuilds it identically."""
    return np.array(
        [
            int.from_bytes(
                hashlib.md5(f"gear-{seed}-{b}".encode()).digest()[:8], "big"
            )
            for b in range(256)
        ],
        dtype=np.uint64,
    )


_GEAR = gear_table()


def _gear_hashes(data: np.ndarray) -> np.ndarray:
    """Vectorized rolling Gear hash: h[i] = Σ_{d=0..63} gear[b[i-d]] << d.

    This is the closed form of the sequential ``h = (h<<1) + gear[b]``
    recurrence (contributions shifted past bit 63 vanish mod 2^64), so
    it matches the golden generator's byte-at-a-time loop exactly while
    staying all-numpy: 64 shifted adds over the batch instead of a
    Python loop over bytes.
    """
    g = _GEAR[data]
    h = g.copy()
    with np.errstate(over="ignore"):
        for d in range(1, 64):
            h[np.uint64(d):] += g[: -d if d else None] << np.uint64(d)
    return h


def chunk_doc(
    text: str, min_len: int = 64, avg_len: int = 256, max_len: int = 1024
) -> list[tuple[int, int, str]]:
    """[(byte_start, byte_len, chunk_md5)] for one document."""
    data = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    n = len(data)
    if n == 0:
        return []
    mask = np.uint64(avg_len - 1)
    cands = np.nonzero((_gear_hashes(data) & mask) == 0)[0]
    raw = bytes(data)
    out: list[tuple[int, int, str]] = []
    start, ci = 0, 0
    while start < n:
        end_limit = start + max_len - 1
        while ci < len(cands) and cands[ci] < start + min_len - 1:
            ci += 1
        if ci < len(cands) and cands[ci] <= end_limit:
            cut = int(cands[ci])
            ci += 1
        else:
            cut = min(end_limit, n - 1)
        out.append(
            (start, cut - start + 1, hashlib.md5(raw[start : cut + 1]).hexdigest())
        )
        start = cut + 1
    return out


def cdc_chunk_table(
    pages: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    min_len: int = 64,
    avg_len: int = 256,
    max_len: int = 1024,
) -> DataFrame:
    """(url, chunk_idx, start, length, chunk_md5) — one row per chunk.

    The output url field follows the input url type (string or long),
    so long-surrogate pipelines don't hit Arrow type errors.
    """
    assert avg_len & (avg_len - 1) == 0, "avg_len must be a power of two"
    url_type = pages.schema[url_col].dataType
    schema = T.StructType(
        [
            T.StructField(url_col, url_type, False),
            T.StructField("chunk_idx", T.IntegerType(), False),
            T.StructField("start", T.IntegerType(), False),
            T.StructField("length", T.IntegerType(), False),
            T.StructField("chunk_md5", T.StringType(), False),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls: list = []
            idxs: list[int] = []
            starts: list[int] = []
            lens: list[int] = []
            md5s: list[str] = []
            for url, text in zip(pdf[url_col], pdf[text_col]):
                for i, (s, ln, d) in enumerate(
                    chunk_doc(text or "", min_len, avg_len, max_len)
                ):
                    urls.append(url)
                    idxs.append(i)
                    starts.append(s)
                    lens.append(ln)
                    md5s.append(d)
            yield pd.DataFrame(
                {
                    # inherit the input dtype so empty batches still
                    # Arrow-cast cleanly for long-keyed pipelines
                    url_col: pd.Series(urls, dtype=pdf[url_col].dtype),
                    "chunk_idx": pd.Series(idxs, dtype="int32"),
                    "start": pd.Series(starts, dtype="int32"),
                    "length": pd.Series(lens, dtype="int32"),
                    "chunk_md5": md5s,
                }
            )

    return pages.select(F.col(url_col).alias(url_col), text_col).mapInPandas(
        gen, schema
    )


def cdc_dedup_stats(chunks: DataFrame, url_col: str = "url") -> DataFrame:
    """Per-doc chunk-dedup stats: (url, n_chunks, n_dup_chunks,
    dup_bytes, total_bytes, dup_byte_ratio), where a chunk is 'dup' if
    its md5 occurs in >= 2 distinct docs — the storage-dedup savings
    estimate."""
    shared = (
        chunks.groupBy("chunk_md5")
        .agg(F.countDistinct(url_col).alias("n_urls"))
        .filter(F.col("n_urls") >= 2)
        .select("chunk_md5", F.lit(True).alias("is_dup"))
    )
    return (
        chunks.join(shared, "chunk_md5", "left")
        .groupBy(url_col)
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum(F.coalesce(F.col("is_dup"), F.lit(False)).cast("long")).alias(
                "n_dup_chunks"
            ),
            F.sum(
                F.when(F.col("is_dup"), F.col("length")).otherwise(F.lit(0)).cast("long")
            ).alias("dup_bytes"),
            F.sum(F.col("length").cast("long")).alias("total_bytes"),
        )
        .withColumn(
            "dup_byte_ratio",
            F.round(F.col("dup_bytes") / F.col("total_bytes").cast("double"), 4),
        )
    )
