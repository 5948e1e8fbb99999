"""Deterministic synthetic Common-Crawl-style ``pages`` generator.

Schema per BASELINE.json input_hint:
    pages(url: string, warc_ts: timestamp, html: binary,
          text: string, lang: string)

plus a companion ``truth`` table (FIXTURES.md section 3):
    truth(url: string, truth_cluster_id: long, dup_kind: string)

Every value is a pure function of ``(seed, row_id, n)`` — no wall
clock, no unseeded RNG, and the output is invariant to partition count
(generation runs as vectorized numpy over ``spark.range(n)`` batches
via ``mapInPandas``; each row depends only on its id).

Planted duplicate structure (proportions from FIXTURES.md section 3):

    boilerplate_hot  2%   one giant template cluster (LSH skew trigger)
    degenerate       2%   empty / whitespace / < k-token texts
    exact           10%   byte-identical text, distinct url/ts
    near            12%   0.5-2% token substitutions off a prototype
                          (shingle-Jaccard >= ~0.8 at k=5)
    substring        4%   pairs where doc A's text is contained in B's
    unique          70%   the rest

Reference analogs: exact <-> identical dhash buckets (dupedb.py:255-257),
near <-> hashsize-fuzzy dhash equality, degenerate <-> the zero-hash
guard (dedupc.py:176-178). Series-suffixed urls are planted inside near
clusters so the alt-series filter (compare.py:77-105) has true positives.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
    ]
)

TRUTH_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("truth_cluster_id", T.LongType(), False),
        T.StructField("dup_kind", T.StringType(), False),
    ]
)

_FULL_SCHEMA = T.StructType(PAGES_SCHEMA.fields + TRUTH_SCHEMA.fields[1:])

_U64 = np.uint64
_VOCAB_SIZE = 4096
_LANGS = np.array(["en", "en", "en", "en", "en", "zh", "zh", "es", "de", "fr"])
_DOMAINS = [f"site{i:02d}.example.com" for i in range(50)]
_EPOCH_2024 = 1704067200  # 2024-01-01T00:00:00Z
_WINDOW_S = 30 * 86400


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 — the one deterministic mixing primitive.

    uint64 wraparound is intentional; errstate silences numpy's
    scalar-overflow warning (arrays wrap silently, 0-d scalars warn).
    """
    with np.errstate(over="ignore"):
        x = (x + _U64(0x9E3779B97F4A7C15)).astype(_U64)
        x = (x ^ (x >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> _U64(27))) * _U64(0x94D049BB133111EB)
        return x ^ (x >> _U64(31))


def _h(seed: int, *parts: np.ndarray | int) -> np.ndarray:
    with np.errstate(over="ignore"):
        acc = np.asarray(parts[0], dtype=_U64) * _U64(0x9E3779B97F4A7C15) + _U64(seed)
        acc = _splitmix64(acc)
        for p in parts[1:]:
            acc = _splitmix64(acc ^ (np.asarray(p, dtype=_U64) * _U64(0xC2B2AE3D27D4EB4F)))
        return acc


def _proto_tokens(seed: int, key: int, length: int) -> np.ndarray:
    """Token ids of a prototype document keyed by ``key``."""
    pos = np.arange(length, dtype=np.uint64)
    return (_h(seed, np.full(length, key, dtype=_U64) ^ _U64(0xD0C), pos) % _U64(_VOCAB_SIZE)).astype(np.int64)


def _words(tok_ids: np.ndarray) -> str:
    return " ".join([f"w{t:04d}" for t in tok_ids])


class _Blocks:
    """Id-space layout: [hot | degenerate | exact | near | substring | unique]."""

    def __init__(self, n: int):
        self.n = n
        # hot template cluster: 2% of the corpus but capped — a real
        # boilerplate cluster doesn't grow linearly with corpus size,
        # and an uncapped one makes planted-pair counts quadratic in n
        self.hot_end = min(max(min(3, n), n * 2 // 100), 1500)
        self.deg_end = self.hot_end + n * 2 // 100
        self.exact_end = self.deg_end + n * 10 // 100
        self.near_end = self.exact_end + n * 12 // 100
        self.sub_end = self.near_end + n * 4 // 100


# Repeating cluster-size patterns inside the exact / near blocks.
_EXACT_PATTERN = np.array([0, 2, 4])      # sizes 2,2,3 period 7
_EXACT_PERIOD = 7
_NEAR_PATTERN = np.array([0, 2, 5, 7])    # sizes 2,3,2,4 period 11
_NEAR_PERIOD = 11


def _cluster_of(offset: np.ndarray, pattern: np.ndarray, period: int) -> tuple[np.ndarray, np.ndarray]:
    """Map block-local offsets to (cluster_ordinal, member_index)."""
    block = offset // period
    r = offset % period
    slot = np.searchsorted(pattern, r, side="right") - 1
    member = r - pattern[slot]
    cluster = block * len(pattern) + slot
    return cluster, member


def _gen_batch(ids: np.ndarray, n: int, seed: int, tok_scale: int = 1) -> pd.DataFrame:
    b = _Blocks(n)
    m = len(ids)
    texts: list[str] = [""] * m
    kinds: list[str] = [""] * m
    cluster_ids = np.empty(m, dtype=np.int64)
    members = np.zeros(m, dtype=np.int64)

    hot_template = _proto_tokens(seed, -1 & 0xFFFF, 60 * tok_scale)

    for j in range(m):
        i = int(ids[j])
        if i < b.hot_end:
            kinds[j] = "boilerplate_hot"
            cluster_ids[j] = 0
            members[j] = i
            toks = hot_template.copy()
            slot = int(_h(seed, i, 1)[()] % len(toks))
            toks[slot] = int(_h(seed, i, 2)[()] % _VOCAB_SIZE)
            texts[j] = _words(toks)
        elif i < b.deg_end:
            kinds[j] = "degenerate"
            cluster_ids[j] = i
            variant = int(_h(seed, i, 3)[()] % 4)
            texts[j] = ["", "   ", "w0001", "w0001 w0002"][variant]
        elif i < b.exact_end:
            kinds[j] = "exact"
            c, mem = _cluster_of(np.array([i - b.deg_end]), _EXACT_PATTERN, _EXACT_PERIOD)
            cluster_ids[j] = b.deg_end + int(c[0]) * 1000 + 1  # stable synthetic key
            members[j] = int(mem[0])
            L = (30 + int(_h(seed, int(c[0]), 4)[()] % 50)) * tok_scale
            texts[j] = _words(_proto_tokens(seed, int(c[0]) ^ 0xE0, L))
        elif i < b.near_end:
            kinds[j] = "near"
            c, mem = _cluster_of(np.array([i - b.exact_end]), _NEAR_PATTERN, _NEAR_PERIOD)
            cluster_ids[j] = b.exact_end + int(c[0]) * 1000 + 2
            members[j] = int(mem[0])
            L = (40 + int(_h(seed, int(c[0]), 5)[()] % 40)) * tok_scale
            toks = _proto_tokens(seed, int(c[0]) ^ 0xF0, L)
            mi = int(mem[0])
            if mi > 0:
                rate = 0.005 + 0.015 * float(_h(seed, int(c[0]), mi, 6)[()] % 100) / 100.0
                mask = (_h(seed, np.full(L, int(c[0]), dtype=_U64), np.arange(L, dtype=_U64) + _U64(mi * 7919)) % _U64(10_000)) < _U64(int(rate * 10_000))
                repl = (_h(seed, np.arange(L, dtype=_U64) + _U64(mi * 104729), 8) % _U64(_VOCAB_SIZE)).astype(np.int64)
                toks = np.where(mask, repl, toks)
            texts[j] = _words(toks)
        elif i < b.sub_end:
            kinds[j] = "substring"
            off = i - b.near_end
            c, mem = off // 2, off % 2
            cluster_ids[j] = b.near_end + c * 1000 + 3
            members[j] = mem
            L = (20 + int(_h(seed, c, 9)[()] % 30)) * tok_scale
            core = _words(_proto_tokens(seed, c ^ 0xAB, L))
            if mem == 0:
                texts[j] = core
            else:
                pre = _words(_proto_tokens(seed, c ^ 0xAC, (5 + int(_h(seed, c, 10)[()] % 6)) * tok_scale))
                post = _words(_proto_tokens(seed, c ^ 0xAD, (5 + int(_h(seed, c, 11)[()] % 6)) * tok_scale))
                texts[j] = f"{pre} {core} {post}"
        else:
            kinds[j] = "unique"
            cluster_ids[j] = i
            L = (30 + int(_h(seed, i, 12)[()] % 60)) * tok_scale
            texts[j] = _words(_proto_tokens(seed, i ^ 0xBEEF0000, L))

    # urls: skewed domains, cluster-keyed leafs, series suffixes in near clusters
    hv = _h(seed, ids.astype(_U64), 13)
    u = (hv % _U64(1000)).astype(np.float64) / 1000.0
    dom_idx = np.minimum((u * u * len(_DOMAINS)).astype(np.int64), len(_DOMAINS) - 1)
    urls: list[str] = [""] * m
    for j in range(m):
        i = int(ids[j])
        kind = kinds[j]
        c = int(cluster_ids[j])
        mi = int(members[j])
        a = int(_h(seed, i, 14)[()] % 20)
        if kind in ("near", "exact") and mi > 0:
            base = f"doc{c:010d}"
            style = (c + mi) % 5
            if mi == 1 and style == 3:
                leaf = f"{base}-alt"
            elif mi == 1 and style == 4:
                leaf = f"{base} edit"
            elif style % 3 == 0:
                leaf = f"{base}_{mi + 1}"
            elif style % 3 == 1:
                leaf = f"{base} ({mi + 1})"
            else:
                leaf = f"{base}_p{mi + 1}"
        elif kind in ("near", "exact"):
            leaf = f"doc{c:010d}"
        else:
            leaf = f"doc{i:010d}"
        urls[j] = f"https://{_DOMAINS[dom_idx[j]]}/c{a:02d}/{leaf}.html"

    lang_keys = np.where(
        np.isin(np.array(kinds), ["exact", "near", "substring"]), cluster_ids, ids.astype(np.int64)
    )
    langs = _LANGS[(_h(seed, lang_keys.astype(_U64), 15) % _U64(10)).astype(np.int64)]
    ts = pd.to_datetime(
        _EPOCH_2024 + (_h(seed, ids.astype(_U64), 16) % _U64(_WINDOW_S)).astype(np.int64), unit="s"
    )
    htmls = [b"<html><body>" + t.encode("utf-8") + b"</body></html>" for t in texts]

    return pd.DataFrame(
        {
            "url": urls,
            "warc_ts": ts,
            "html": htmls,
            "text": texts,
            "lang": langs,
            "truth_cluster_id": cluster_ids,
            "dup_kind": kinds,
        }
    )


def synth_pages_with_truth(
    spark: SparkSession, n: int, seed: int = 42, partitions: int | None = None, tok_scale: int = 1
) -> DataFrame:
    """tok_scale multiplies every document's token count (default 1 =
    the frozen fixture sizes; bench uses >1 for web-realistic lengths
    of ~300-500 tokens — duplicate structure is unchanged)."""
    """pages ⋈ truth in one DataFrame (columns of both schemas)."""
    parts = partitions or max(2, spark.sparkContext.defaultParallelism)
    base = spark.range(0, n, numPartitions=parts)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield _gen_batch(pdf["id"].to_numpy(), n, seed, tok_scale)

    return base.mapInPandas(gen, schema=_FULL_SCHEMA)


def synth_pages(
    spark: SparkSession, n: int, seed: int = 42, partitions: int | None = None, tok_scale: int = 1
) -> DataFrame:
    return synth_pages_with_truth(spark, n, seed, partitions, tok_scale).select(
        "url", "warc_ts", "html", "text", "lang"
    )


def synth_truth(spark: SparkSession, n: int, seed: int = 42, partitions: int | None = None) -> DataFrame:
    return synth_pages_with_truth(spark, n, seed, partitions).select(
        "url", "truth_cluster_id", "dup_kind"
    )
