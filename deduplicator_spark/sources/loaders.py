"""Readers for the driver-generated testdata tables, plus a
deterministic mapping of ``documents`` into the ``pages`` shape.

The mapping is pure column algebra (JVM-side, no UDF) so the DuckDB
oracle can reproduce it exactly — it is the analog of the reference's
image-decode source (dupedb.py:85) with the byte-identical-text
invariant of BASELINE.json's input_hint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TESTDATA_TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)

_EPOCH_2024 = 1704067200


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_documents_as_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents(doc_id, text, lang, source, n_chars) -> pages shape.

    url/warc_ts/html are pure functions of the row so both Spark and
    the DuckDB oracle derive identical values.
    """
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        F.concat(
            F.lit("https://docs.example.com/"),
            F.col("source"),
            F.lit("/doc"),
            F.lpad(F.col("doc_id").cast("string"), 10, "0"),
            F.lit(".html"),
        ).alias("url"),
        F.to_timestamp(F.from_unixtime(F.lit(_EPOCH_2024) + F.col("doc_id") * 37)).alias("warc_ts"),
        F.concat(
            F.lit(b"<html><body>"), F.encode("text", "UTF-8"), F.lit(b"</body></html>")
        ).alias("html"),
        F.col("text"),
        F.col("lang"),
    )
