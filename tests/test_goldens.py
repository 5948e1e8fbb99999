"""Golden fixtures (tests/golden/, built by tools/make_goldens.py with
NO Spark) pinned against the engine: the committed files must stay in
lockstep with the generator and the UDF math, or the driver's oracles
would drift silently."""

from __future__ import annotations

import pandas as pd
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry

SF001 = "/root/testdata/sf0.01"


def test_golden_pages_match_spark_generator(spark):
    """The committed pages parquet == synth_pages_with_truth output."""
    from deduplicator_spark.sources.pages import synth_pages_with_truth

    got = (
        synth_pages_with_truth(spark, 500)
        .toPandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    want = (
        pq.read_table(entry.GOLDEN_PAGES)
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    got["html"] = got["html"].apply(bytes)
    want["html"] = want["html"].apply(bytes)
    got["warc_ts"] = got["warc_ts"].astype("datetime64[us]")
    want["warc_ts"] = want["warc_ts"].astype("datetime64[us]")
    pd.testing.assert_frame_equal(got[sorted(got.columns)], want[sorted(want.columns)])


def test_golden_simhash_matches_udf(spark):
    """Independent per-doc bit-majority simhash == the batched
    unpackbits/reduceat UDF, value for value."""
    fp = entry._docs_fp(spark, SF001).filter(F.col("simhash").isNotNull())
    got = {int(r["url"]): r["simhash"] for r in fp.select("url", "simhash").collect()}
    want = {
        int(r["doc_id"]): int(r["simhash"])
        for r in pq.read_table(entry.GOLDEN_SIMHASH).to_pylist()
    }
    assert got == want


def test_golden_rolling_fp_matches_engine(spark):
    """The winnow UDF's per-doc anchor aggregates must equal the
    independent pure-Python mod-2^64 implementation's golden."""
    got = {
        r["doc_id"]: (r["n_anchors"], r["min_anchor"], r["anchor_xor"])
        for r in entry.q_rolling_fingerprints(spark, SF001).collect()
    }
    want = {
        r["doc_id"]: (r["n_anchors"], r["min_anchor"], r["anchor_xor"])
        for r in pq.read_table(entry.GOLDEN_ROLLING).to_pylist()
    }
    assert got == want


def test_golden_ivf_cells_match_udf(spark):
    from deduplicator_spark.operators.ann import make_ivf_cell_udf

    emb = spark.read.parquet(f"{SF001}/embeddings.parquet")
    cell_udf = make_ivf_cell_udf(dim=64, n_cells=16, seed=42)
    got = {
        r["vec_id"]: r["cell"]
        for r in emb.select("vec_id", cell_udf("embedding").alias("cell")).collect()
    }
    want = {r["vec_id"]: r["cell"] for r in pq.read_table(entry.GOLDEN_IVF_CELLS).to_pylist()}
    assert got == want


def test_golden_ann_sig_matches_udf(spark):
    from deduplicator_spark.operators.ann import make_hyperplane_udf

    emb = spark.read.parquet(f"{SF001}/embeddings.parquet")
    sig_udf = make_hyperplane_udf(dim=64, bits=16, seed=42)
    got = {
        r["vec_id"]: r["sig"]
        for r in emb.select("vec_id", sig_udf("embedding").alias("sig")).collect()
    }
    want = {r["vec_id"]: r["sig"] for r in pq.read_table(entry.GOLDEN_ANN_SIG).to_pylist()}
    assert got == want
