"""Training-shard writer sink: determinism, layout, manifest."""

from __future__ import annotations

import os

from deduplicator_spark.sources.shards import (
    shard_assignment,
    shard_manifest,
    write_training_shards,
)


def _docs(spark, n=200):
    return spark.range(n).selectExpr("id AS doc_id", "repeat('x', CAST(id % 50 AS INT)) AS text")


def test_shard_assignment_deterministic_and_bounded(spark):
    df = _docs(spark)
    a = df.select("doc_id", shard_assignment("doc_id", 10).alias("s")).collect()
    b = df.select("doc_id", shard_assignment("doc_id", 10).alias("s")).collect()
    assert sorted((r.doc_id, r.s) for r in a) == sorted((r.doc_id, r.s) for r in b)
    assert all(0 <= r.s < 10 for r in a)
    # not degenerate: more than one shard actually used
    assert len({r.s for r in a}) > 1


def test_write_training_shards_layout_and_manifest(spark, tmp_path):
    df = _docs(spark)
    path = str(tmp_path / "shards")
    manifest = write_training_shards(df, path, key="doc_id", n_shards=10)
    rows = manifest.collect()
    assert sum(r.n_docs for r in rows) == 200
    # each shard dir exists and holds only its own rows
    for r in rows:
        shard_dir = os.path.join(path, f"shard={r.s if hasattr(r, 's') else r.shard}")
        assert os.path.isdir(shard_dir), shard_dir
        back = spark.read.parquet(path).filter(f"shard = {r.shard}")
        assert back.count() == r.n_docs
    # round-trip preserves every doc
    assert spark.read.parquet(path).count() == 200
    # manifest agrees with a fresh computation
    fresh = {r.shard: (r.n_docs, r.total_chars) for r in shard_manifest(df, n_shards=10).collect()}
    assert {r.shard: (r.n_docs, r.total_chars) for r in rows} == fresh
