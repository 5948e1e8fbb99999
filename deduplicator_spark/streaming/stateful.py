"""Custom stateful streaming dedup via ``applyInPandasWithState``.

The foreachBatch path (streaming/incremental.py) re-reads its own
parquet state each micro-batch — simple, resumable, but the state
round-trips through storage.  This module is the other Structured
Streaming shape the engine needs at ingest time: **keyed state held by
the state store itself**, one state row per content fingerprint,
updated by an Arrow-batched pandas function.

Semantics (first-seen-wins exact dedup, the streaming form of the
reference's identity dedupe dupedb.py:255-257 / operators/exact.py):

    group key   = content_md5 (or any fingerprint column)
    state       = (canonical_url, seen_count)  per key
    output      = one row per input doc:
                  (url, key, is_duplicate, canonical_url, dup_rank)

Within a micro-batch the canonical is the min url among state + batch
(deterministic, order-independent — pinned by test); across batches the
state row makes later re-appearances duplicates of the first batch's
canonical.  State survives query restarts via the checkpoint dir's
state store, which is how the cross-restart test drives two batches.

Scale shape: the groupBy hash-partitions keys across executors, so
state is sharded exactly like a shuffle — no single-node state.  Each
executor holds only its shard (HDFS/RocksDB-backed state store on a
real cluster).  For unbounded key spaces the operator takes a TTL:
with ``ttl_minutes`` set it registers a processing-time timeout per
key and drops state rows idle longer than the TTL (web-crawl dedup
typically only needs dup detection within a crawl horizon — Lee et
al.'s within-snapshot setting).  No per-row Python: the callback gets
whole Arrow batches per key group.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

if TYPE_CHECKING:  # pragma: no cover
    pass

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("key", T.StringType(), False),
        T.StructField("is_duplicate", T.BooleanType(), False),
        T.StructField("canonical_url", T.StringType(), False),
        T.StructField("dup_rank", T.LongType(), False),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("canonical_url", T.StringType(), False),
        T.StructField("seen_count", T.LongType(), False),
    ]
)


def _dedup_group(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
    ttl_ms: int | None,
) -> Iterator[pd.DataFrame]:
    """Per-key callback: merge batch urls with state, emit verdicts."""
    if state.hasTimedOut:
        # TTL eviction: drop the state row; nothing to emit this trigger
        state.remove()
        return
    urls: list[str] = []
    for pdf in pdfs:
        urls.extend(pdf["url"].tolist())
    # sorted: dup_rank and the keep verdict are then deterministic
    # under repartitioning/replay, where arrival order is not
    # (ADVICE r2 #2 — the old arrival-order ranks were not)
    urls = sorted(urls)
    if state.exists:
        canonical, seen = state.get
    else:
        canonical, seen = None, 0
    # first-seen-wins: once a key has a canonical it is FINAL (later
    # batches never steal it).  Within the key's first batch the min
    # url wins.  Exactly ONE occurrence is ever marked non-duplicate:
    # the first canonical occurrence of the key's first batch — a url
    # repeated within that batch is a duplicate of itself (ADVICE r2
    # #2: both copies used to be marked keep).
    if canonical is None:
        canonical = urls[0]
    kept = seen > 0
    is_dup: list[bool] = []
    for u in urls:
        keep = (u == canonical) and not kept
        is_dup.append(not keep)
        kept = kept or keep
    out = pd.DataFrame(
        {
            "url": urls,
            "key": key[0],
            "is_duplicate": is_dup,
            "canonical_url": canonical,
            "dup_rank": [seen + i for i in range(len(urls))],
        }
    )
    state.update((canonical, seen + len(urls)))
    if ttl_ms is not None:
        state.setTimeoutDuration(ttl_ms)
    yield out


def stateful_exact_dedup(
    stream: DataFrame,
    key_col: str = "content_md5",
    url_col: str = "url",
    ttl_minutes: int | None = None,
) -> DataFrame:
    """Streaming first-seen-wins dedup keyed by ``key_col``.

    ``stream`` must be a streaming DataFrame with at least
    (url_col, key_col).  Returns the verdict stream (OUTPUT_SCHEMA);
    write it with ``.writeStream.outputMode("update")``.
    """
    from pyspark.sql import functions as F

    ttl_ms = None if ttl_minutes is None else ttl_minutes * 60_000
    timeout = (
        GroupStateTimeout.NoTimeout
        if ttl_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )

    def fn(key, pdfs, state):
        return _dedup_group(key, pdfs, state, ttl_ms)

    keyed = stream.select(
        F.col(url_col).alias("url"), F.col(key_col).alias("key")
    )
    return keyed.groupBy("key").applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )


# ---------------------------------------------------------------------------
# Streaming NEAR-dup candidates: band-bucket-keyed state
# ---------------------------------------------------------------------------

PAIR_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("url_a", T.StringType(), False),
        T.StructField("url_b", T.StringType(), False),
        T.StructField("band_idx", T.IntegerType(), False),
    ]
)

PAIR_STATE_SCHEMA = T.StructType(
    [
        T.StructField("members", T.ArrayType(T.StringType()), False),
        T.StructField("n_overflow", T.LongType(), False),
    ]
)


def _near_group(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
    cap: int,
    ttl_ms: int | None,
) -> Iterator[pd.DataFrame]:
    """Per-(band_idx, band_hash) callback: pair arriving docs against
    the bucket's remembered members, then append them (capped)."""
    if state.hasTimedOut:
        state.remove()
        return
    arriving: list[str] = []
    for pdf in pdfs:
        arriving.extend(pdf["url"].tolist())
    members, overflow = (state.get if state.exists else ([], 0))
    cur = list(members)
    seen = set(cur)
    out_a: list[str] = []
    out_b: list[str] = []
    # sorted: deterministic under replay/repartitioning, where arrival
    # order within a micro-batch is not
    for u in sorted(set(arriving) - seen):
        for m in cur:
            a, b = (u, m) if u < m else (m, u)
            out_a.append(a)
            out_b.append(b)
        if len(cur) < cap:
            cur.append(u)
        else:
            overflow += 1
    state.update((cur, overflow))
    if ttl_ms is not None:
        state.setTimeoutDuration(ttl_ms)
    if out_a:
        yield pd.DataFrame(
            {"url_a": out_a, "url_b": out_b, "band_idx": int(key[0])}
        )


def stateful_near_dup_candidates(
    banded: DataFrame,
    max_bucket: int = 400,
    ttl_minutes: int | None = None,
) -> DataFrame:
    """Streaming LSH candidate pairs with the band buckets AS the keyed
    state — the ingest-time form of ``operators/lsh.candidate_pairs``.

    ``banded`` is a streaming frame of (url, band_idx, band_hash) —
    ``band_explode`` is pure JVM expressions, so it runs unchanged on a
    readStream source fed by the fingerprint UDF.  Each state row
    remembers one bucket's member urls (capped at ``max_bucket`` with
    an overflow counter, mirroring the batch cap-and-audit policy); an
    arriving doc emits a pair against every remembered member and joins
    the bucket.  Downstream dedups pairs across bands and runs the
    exact verify — same contract as the batch chain.  REMEMBERED
    members pair exactly once per (pair, band) with no recomputation
    over history; a doc that arrived while the bucket was over cap is
    NOT remembered, so if it re-arrives in a later batch it re-emits
    its pairs (and re-increments the overflow counter) — downstream
    pair dedup absorbs the repeats, and the overflow counter is a
    activity tally, not a distinct-doc count (ADVICE r2 #3).

    Scale shape: state is hash-partitioned by (band_idx, band_hash)
    like any shuffle — each executor's state store holds only its
    bucket shard, and TTL eviction bounds it to the crawl horizon.
    """
    ttl_ms = None if ttl_minutes is None else ttl_minutes * 60_000
    timeout = (
        GroupStateTimeout.NoTimeout
        if ttl_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )

    def fn(key, pdfs, state):
        return _near_group(key, pdfs, state, max_bucket, ttl_ms)

    return banded.groupBy("band_idx", "band_hash").applyInPandasWithState(
        fn,
        outputStructType=PAIR_OUTPUT_SCHEMA,
        stateStructType=PAIR_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
