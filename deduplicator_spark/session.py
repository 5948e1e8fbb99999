"""SparkSession builder with the configuration this engine assumes.

All the scale-relevant settings live here so tests, bench and the
driver entrypoint agree:

- Arrow execution on (every UDF in this engine is a vectorized
  pandas/Arrow UDF; per-row Python UDFs are banned by design).
- AQE + skew-join on: LSH band buckets over web text are Zipfian
  (boilerplate mega-buckets); AQE splits skewed partitions at runtime.
- UTC session timezone so results hash-compare cleanly against the
  DuckDB oracle (duckdb timestamps are UTC-naive).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "deduplicator-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    # Default shuffle partitions to 4x the worker count, NOT 1x: with
    # partitions == cores each task sorts/joins a cores-th of the data
    # in one pass, and wide rows (shingle/signature arrays) blow the
    # per-task execution-memory share and spill — measured 2x slower on
    # the verify join at BOTH 2 and 8 cores (tools/verify_probe.py:
    # 17.5s -> 8.6s at 2 cores, 14.6s -> 6.6s at 8).  4x matches the
    # 2-4x-cores guidance for real clusters; AQE coalesces the
    # partitions that end up small.
    shuffle_partitions = shuffle_partitions or 4 * int(cpus)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
