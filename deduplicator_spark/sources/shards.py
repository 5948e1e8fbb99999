"""Training-shard writer sink: deterministic hash sharding + manifest.

The last stage of a data pipeline writes the cleaned corpus as N
shards a trainer can stream independently.  Shard assignment must be
deterministic (re-runs land docs in the same shard) and
engine-independent (so an oracle can reproduce it): we derive the
bucket from two md5 hex characters via ``ascii()`` — both Spark and
DuckDB expose the identical primitives.

Scale notes: ``partitionBy("shard")`` hash-clusters writes so each task
appends to few shard dirs; the manifest is one map-side-combinable
groupBy.  At 100 TB pick n_shards so each shard is a few GB
(n_shards ~ corpus_bytes / 4e9), and repartition by shard before the
write so every output file belongs to one shard.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def shard_assignment(col: Column | str, n_shards: int) -> Column:
    """Deterministic shard in [0, n_shards) from the md5 of the key.

    bucket = (ascii(hex[0]) * 256 + ascii(hex[1])) % n_shards — chosen
    over xxhash64/crc32 because DuckDB reproduces md5+ascii exactly.
    """
    c = F.col(col) if isinstance(col, str) else col
    h = F.md5(c.cast("string"))
    return (
        (F.ascii(F.substring(h, 1, 1)) * 256 + F.ascii(F.substring(h, 2, 1)))
        % n_shards
    ).cast("int")


def shard_manifest(
    df: DataFrame, key: str = "doc_id", text_col: str = "text", n_shards: int = 10
) -> DataFrame:
    """Per-shard accounting: ``(shard, n_docs, total_chars)``."""
    return (
        df.select(shard_assignment(key, n_shards).alias("shard"), F.length(text_col).alias("_n"))
        .groupBy("shard")
        .agg(F.count("*").alias("n_docs"), F.sum("_n").alias("total_chars"))
    )


def sample_bucket(col: Column | str, granularity: int = 10_000) -> Column:
    """Deterministic sampling bucket in [0, granularity) from the md5
    of the key — a 60-bit hex prefix parsed to a long, so both Spark
    (``conv``) and DuckDB (``('0x'||hex)::BIGINT``) reproduce it
    bit-for-bit.  Uniform enough for rate control at basis-point
    resolution."""
    c = F.col(col) if isinstance(col, str) else col
    h = F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10).cast("long")
    return (h % granularity).cast("int")


def stratified_sample(
    df: DataFrame,
    key: str = "doc_id",
    strata_col: str = "lang",
    rates: dict[str, float] | None = None,
    default_rate: float = 1.0,
) -> DataFrame:
    """Deterministic per-stratum subsampling — the data-mixing stage of
    a training pipeline (e.g. downsample head languages / boilerplate
    sources, upsample the rest) expressed so re-runs and an external
    oracle select the IDENTICAL rows.

    A row is kept iff ``sample_bucket(key) < rate(stratum) * 10000``.
    No RNG anywhere: membership is a pure function of the key, so the
    sample is stable across partitionings, re-runs and engines (the
    property ``df.sample()`` cannot give).  Shuffle-free: one JVM
    hash + compare per row, fully pushdown-friendly.
    """
    rate_bp = F.lit(int(round(default_rate * 10_000)))
    for val, r in (rates or {}).items():
        rate_bp = F.when(
            F.col(strata_col) == val, F.lit(int(round(r * 10_000)))
        ).otherwise(rate_bp)
    return df.filter(sample_bucket(key) < rate_bp)


def pack_manifest(
    df: DataFrame,
    key: str = "doc_id",
    text_col: str = "text",
    budget_tokens: int = 2048,
    n_shards: int = 10,
) -> DataFrame:
    """Sequence-packing manifest: where every document lands in the
    packed fixed-budget training stream (the greedy concat packing
    step of LLM data prep, as a deterministic table instead of a
    tokenizer-side loop).

    Documents are hash-assigned to shards, ordered by key within the
    shard, and concatenated into one token stream per shard; sequence
    ``seq_idx`` of a shard is the ``budget_tokens``-sized window of
    that stream.  Output row per doc:
    ``(key, shard, n_tok, begin_tok, seq_idx)`` — ``begin_tok`` the
    doc's offset in its shard stream, ``seq_idx = begin_tok //
    budget_tokens`` the sequence its first token lands in (docs may
    straddle sequence boundaries, exactly like the real packed stream).

    Scale shape: one exchange on ``shard`` + an in-partition sort —
    the same layout the shard writer needs anyway; the cumulative sum
    is a running window inside each shard partition, never global.
    """
    from pyspark.sql import Window

    from deduplicator_spark.functions.quality import n_tokens

    sized = df.select(
        key,
        shard_assignment(key, n_shards).alias("shard"),
        n_tokens(text_col).cast("long").alias("n_tok"),
    )
    w = Window.partitionBy("shard").orderBy(key).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        sized.withColumn("_cum", F.sum("n_tok").over(w))
        .withColumn("begin_tok", F.col("_cum") - F.col("n_tok"))
        .withColumn(
            "seq_idx", F.floor(F.col("begin_tok") / budget_tokens).cast("long")
        )
        .select(key, "shard", "n_tok", "begin_tok", "seq_idx")
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    key: str = "doc_id",
    text_col: str = "text",
    n_shards: int = 10,
) -> DataFrame:
    """Write ``df`` as ``path/shard=K/*.parquet`` and return the
    manifest.  Repartitions by shard first so each output file belongs
    to exactly one shard directory."""
    sharded = df.withColumn("shard", shard_assignment(key, n_shards))
    sharded.repartition("shard").write.mode("overwrite").partitionBy("shard").parquet(path)
    spark = df.sparkSession
    manifest = shard_manifest(df, key=key, text_col=text_col, n_shards=n_shards)
    manifest.write.mode("overwrite").parquet(os.path.join(path + "_manifest"))
    return spark.read.parquet(os.path.join(path + "_manifest"))
