"""Distributed Bloom filter as a relational bitmap — the skip-known
prefilter for incremental / cross-snapshot dedup.

At 10^12 docs the "have I seen this url/content before?" check cannot
shuffle the known set against every new batch.  A Bloom filter over
the known keys is the classic answer; here it is built and probed
entirely with DataFrame operations:

- the bitmap is a TABLE (word_idx, word) of ceil(m/60) words, 60
  payload bits each (bit 63 is never set, so signed 64-bit engines and
  SQL oracles agree), built by one map-side-combined ``bit_or``
  aggregation — no driver-side bitmap, no UDF, no collect;
- probing is a broadcast-size equi-join on word_idx (a 2^20-bit filter
  is 16K rows ~128KB — trivially broadcastable to every executor);
- misses are EXACT (no false negatives); hits are "maybe" with the
  standard FP rate, so the expensive exact path only runs for hits.

Hashing is engine-neutral: two 60-bit integers from md5 hex slices
(DuckDB: ``('0x' || substr(md5(k),1,15))::BIGINT``), combined by
double hashing  pos_i = (h1 + i*h2) mod m  (Kirsch–Mitzenmacher), so a
SQL oracle reproduces every bit.

Reference analog: the reference's shelve keyed by hash IS its
known-set membership structure (dupedb.py:255-257); this is the
bounded-memory, shardable form of the same check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _h(col: str, start: int) -> F.Column:
    """60-bit non-negative int from 15 hex chars of md5(col)."""
    return F.conv(F.substring(F.md5(F.col(col)), start, 15), 16, 10).cast("long")


def _positions(key_col: str, m_bits: int, k: int) -> F.Column:
    """Array of k bit positions for the key (double hashing)."""
    h1 = _h(key_col, 1) % m_bits
    h2 = _h(key_col, 17) % m_bits
    return F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda i: (h1 + i.cast("long") * h2) % m_bits,
    )


def bloom_build(
    keys: DataFrame, key_col: str = "url", m_bits: int = 1 << 20, k: int = 5
) -> DataFrame:
    """Bitmap table (word_idx, word) over the key set.

    One explode (map-side) + one bit_or aggregation; output has at most
    ceil(m_bits/60) rows regardless of input size.
    """
    pos = keys.select(
        F.explode(_positions(key_col, m_bits, k)).alias("pos")
    )
    return (
        pos.select(
            F.expr("pos DIV 60").alias("word_idx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 60 AS INT))").alias(
                "mask"
            ),
        )
        .groupBy("word_idx")
        .agg(F.expr("bit_or(mask)").alias("word"))
    )


def bloom_probe(
    probes: DataFrame,
    bloom: DataFrame,
    key_col: str = "url",
    m_bits: int = 1 << 20,
    k: int = 5,
) -> DataFrame:
    """(key, maybe_member) — true iff all k bits are set.

    The join side is the bitmap (<= ceil(m_bits/60) rows), which Spark/AQE
    broadcasts; the probe stream never shuffles.
    """
    pos = probes.select(key_col).distinct().select(
        F.col(key_col), F.explode(_positions(key_col, m_bits, k)).alias("pos")
    ).select(
        key_col,
        F.expr("pos DIV 60").alias("word_idx"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 60 AS INT))").alias("mask"),
    )
    hit = (F.col("word").isNotNull() & ((F.col("word").bitwiseAND(F.col("mask"))) == F.col("mask"))).cast("long")
    return (
        pos.join(F.broadcast(bloom), "word_idx", "left")
        .select(key_col, hit.alias("hit"))
        .groupBy(key_col)
        .agg((F.sum("hit") == F.lit(k)).alias("maybe_member"))
    )
