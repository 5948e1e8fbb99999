"""Incremental (batch-incremental and Structured-Streaming) dedup.

The reference is strictly batch with incremental re-runs: it skips
already-fingerprinted paths via a known-set (dupedb.py:192-194,
271-274).  The Spark mapping (SURVEY.md §2.10) is batch-incremental:

    new_docs = batch ANTI-JOIN fingerprint_state (on url)
    fingerprint only new_docs; append to state
    candidate pairs are restricted to LSH buckets TOUCHED by new docs
    (semi-join on band keys) — old-vs-old pairs are never recomputed
    edges accumulate; connected components re-run over the edge set

So each micro-batch costs O(new docs + touched buckets), not O(corpus).

``IncrementalDedup.process_batch`` is directly usable as a Structured
Streaming ``foreachBatch`` sink, which is how the streaming test runs
it (readStream over a parquet dir -> foreachBatch -> state tables).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deduplicator_spark.config import DedupConfig
from deduplicator_spark.functions.fingerprints import make_fingerprint_udf
from deduplicator_spark.operators.components import clusters_from_pairs
from deduplicator_spark.operators.lsh import band_explode, candidate_pairs, verify_pairs


class IncrementalDedup:
    def __init__(self, spark: SparkSession, cfg: DedupConfig, state_dir: str):
        self.spark = spark
        self.cfg = cfg
        self.state_dir = state_dir
        os.makedirs(state_dir, exist_ok=True)

    def _state_path(self, name: str) -> str:
        return os.path.join(self.state_dir, name)

    def _read_state(self, name: str, schema: str) -> DataFrame:
        p = self._state_path(name)
        if os.path.exists(os.path.join(p, "_SUCCESS")):
            return self.spark.read.parquet(p)
        return self.spark.createDataFrame([], schema)

    def process_batch(self, batch: DataFrame, epoch_id: int | None = None) -> None:
        """foreachBatch-compatible: fingerprint new docs, extend edges."""
        cfg = self.cfg
        fp_schema = (
            "url string, content_md5 string, n_chars int, byte_len int, "
            "minhash array<bigint>, simhash bigint, n_shingles int, "
            "n_tokens int, shingles array<bigint>"
        )
        state_fp = self._read_state("fingerprints", fp_schema)

        fp_udf = make_fingerprint_udf(cfg)
        new_fp = (
            batch.join(state_fp.select("url"), "url", "left_anti")  # S3/J1 skip-known
            .select(
                "url",
                F.md5("text").alias("content_md5"),
                F.length("text").cast("int").alias("n_chars"),
                F.octet_length("text").cast("int").alias("byte_len"),
                fp_udf(F.col("text")).alias("f"),
            )
            .select(
                "url", "content_md5", "n_chars", "byte_len",
                "f.minhash", "f.simhash", "f.n_shingles", "f.n_tokens", "f.shingles",
            )
            .localCheckpoint()
        )
        if new_fp.isEmpty():
            return

        all_fp = state_fp.unionByName(new_fp)

        # pair generation restricted to buckets touched by new docs
        new_bands = band_explode(new_fp, cfg)
        touched = new_bands.select("band_idx", "band_hash").distinct()
        all_bands = band_explode(all_fp, cfg)
        cand_bands = all_bands.join(touched, ["band_idx", "band_hash"], "left_semi")
        pairs, _ = candidate_pairs(cand_bands, cfg)
        # only pairs involving at least one new url are genuinely new
        new_urls = new_fp.select("url")
        fresh = pairs.join(
            new_urls.withColumnRenamed("url", "url_a"), "url_a", "left_semi"
        ).unionByName(
            pairs.join(new_urls.withColumnRenamed("url", "url_b"), "url_b", "left_semi")
        ).dropDuplicates(["url_a", "url_b"])
        verified = verify_pairs(fresh, all_fp, cfg)

        state_edges = self._read_state("edges", "url_a string, url_b string")
        edges = state_edges.unionByName(verified.select("url_a", "url_b")).dropDuplicates()

        # commit state (overwrite-with-union is the copy-on-write MERGE)
        edges.write.mode("overwrite").parquet(self._state_path("edges.tmp"))
        all_fp.write.mode("overwrite").parquet(self._state_path("fingerprints.tmp"))
        for name in ("edges", "fingerprints"):
            final = self._state_path(name)
            tmp = self._state_path(f"{name}.tmp")
            swap = self._state_path(f"{name}.old")
            if os.path.exists(final):
                os.rename(final, swap)
            os.rename(tmp, final)
            if os.path.exists(swap):
                import shutil

                shutil.rmtree(swap)

    def clusters(self, min_size: int = 2) -> DataFrame:
        edges = self._read_state("edges", "url_a string, url_b string")
        fp = self._read_state("fingerprints", "url string")
        return clusters_from_pairs(edges, all_docs=fp, min_size=min_size)

    def run_stream(self, source_dir: str, schema, checkpoint_dir: str):
        """Structured Streaming ingestion: parquet dir -> foreachBatch."""
        stream = self.spark.readStream.schema(schema).parquet(source_dir)
        return (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
