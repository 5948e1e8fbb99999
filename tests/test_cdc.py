"""Content-defined chunking (operators/cdc.py): boundary invariants,
the shift-resync property that motivates CDC over fixed windows, and
golden parity."""

from __future__ import annotations

import hashlib
import random

import pandas as pd
import pyarrow.parquet as pq

from deduplicator_spark.operators.cdc import (
    cdc_chunk_table,
    cdc_dedup_stats,
    chunk_doc,
)

import __spark_entry__ as entry


def _rand_text(rng: random.Random, n: int) -> str:
    return "".join(rng.choice("abcdefgh ijklmnop 日本語 0123456789") for _ in range(n))


def test_chunk_bounds_and_coverage():
    rng = random.Random(1)
    for _ in range(20):
        text = _rand_text(rng, rng.randint(0, 4000))
        data = text.encode("utf-8")
        chunks = chunk_doc(text, min_len=32, avg_len=128, max_len=512)
        if not data:
            assert chunks == []
            continue
        # contiguous, covering, within bounds (last chunk may be short)
        pos = 0
        for i, (s, ln, d) in enumerate(chunks):
            assert s == pos
            assert ln <= 512
            if i < len(chunks) - 1:
                assert ln >= 32
            assert d == hashlib.md5(data[s : s + ln]).hexdigest()
            pos += ln
        assert pos == len(data)


def test_shift_resync_shares_tail_chunks():
    """THE CDC property: prepending bytes changes only the first
    chunk(s); boundaries resync because they depend on local content,
    so the tail chunks hash identically — fixed windows share none."""
    rng = random.Random(2)
    text = _rand_text(rng, 8000)
    base = {d for _, _, d in chunk_doc(text, 32, 128, 512)}
    shifted = {d for _, _, d in chunk_doc("INSERTED HEADER " + text, 32, 128, 512)}
    overlap = len(base & shifted) / len(base)
    assert overlap > 0.8, f"resync overlap only {overlap:.2f}"


def test_chunk_invariants_hypothesis():
    """Property-based: for arbitrary unicode text and any valid
    (min, avg, max) config, chunks are contiguous, cover the byte
    range, respect bounds, and hash correctly; and the kernel equals a
    sequential recurrence re-derivation of the same boundaries."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from deduplicator_spark.operators.cdc import gear_table

    gear = [int(x) for x in gear_table()]

    def chunks_ref(data: bytes, min_len: int, avg_len: int, max_len: int):
        n, h, cands = len(data), 0, set()
        for pos in range(n):
            h = ((h << 1) + gear[data[pos]]) & 0xFFFFFFFFFFFFFFFF
            if h & (avg_len - 1) == 0:
                cands.add(pos)
        out, start = [], 0
        while start < n:
            limit = min(start + max_len, n)
            end = next(
                (p for p in range(start + min_len - 1, limit) if p in cands),
                limit - 1,
            )
            out.append((start, end - start + 1))
            start = end + 1
        return out

    @settings(max_examples=60, deadline=None)
    @given(
        text=st.text(max_size=3000),
        cfg=st.sampled_from([(8, 32, 128), (32, 128, 512), (64, 256, 1024)]),
    )
    def check(text, cfg):
        mn, avg, mx = cfg
        data = text.encode("utf-8")
        got = chunk_doc(text, mn, avg, mx)
        assert [(s, ln) for s, ln, _ in got] == chunks_ref(data, mn, avg, mx)
        pos = 0
        for i, (s, ln, d) in enumerate(got):
            assert s == pos and 1 <= ln <= mx
            assert d == hashlib.md5(data[s : s + ln]).hexdigest()
            pos += ln
        assert pos == len(data)

    check()


def test_cdc_chunk_table_matches_kernel_and_long_keys(spark):
    pdf = pd.DataFrame({"doc_id": [1, 2], "text": ["alpha " * 50, ""]})
    df = spark.createDataFrame(pdf)
    out = (
        cdc_chunk_table(df, url_col="doc_id", min_len=32, avg_len=128, max_len=512)
        .toPandas()
        .sort_values(["doc_id", "chunk_idx"])
    )
    want = chunk_doc("alpha " * 50, 32, 128, 512)
    assert len(out) == len(want)  # empty doc contributes no rows
    assert list(out["start"]) == [s for s, _, _ in want]
    assert out["doc_id"].dtype == "int64"


def test_cdc_dedup_stats_flags_shared_chunks(spark):
    rng = random.Random(3)
    shared_tail = _rand_text(rng, 3000)
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "unique head one " + shared_tail,
                "a different head " + shared_tail,
                _rand_text(rng, 3000),
            ],
        }
    )
    chunks = cdc_chunk_table(
        spark.createDataFrame(pdf), url_col="doc_id", min_len=32, avg_len=128, max_len=512
    )
    stats = {r["doc_id"]: r for r in cdc_dedup_stats(chunks, "doc_id").collect()}
    assert stats[1]["n_dup_chunks"] > 0 and stats[2]["n_dup_chunks"] > 0
    assert stats[3]["n_dup_chunks"] == 0
    assert 0 < stats[1]["dup_byte_ratio"] <= 1.0


def test_cdc_engine_matches_golden(spark):
    """The distributed kernel (64-lane windowed numpy) == the committed
    golden from the sequential byte-loop reference implementation."""
    got = (
        entry.queries()["cdc_chunks"](spark, "/root/testdata/sf0.01")
        .toPandas()
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )
    want = (
        pq.read_table(entry.GOLDEN_CDC)
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
