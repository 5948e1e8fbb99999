"""Event-time windowed dedup (batch expression of the streaming shape).

The reference engine dedups a static snapshot; an event/log pipeline at
scale dedups *within event-time windows* so state stays bounded
(Structured Streaming's ``dropDuplicatesWithinWatermark`` semantics).
``windowed_dedup`` is written against the DataFrame API only, so the
same function body works on a batch frame or a ``readStream`` frame
(add ``withWatermark`` upstream for the streaming case; see
streaming/incremental.py for the foreachBatch harness).

Scale notes: one map-side-combinable groupBy on
(window, keys...) — state per window is O(distinct keys), and event-time
partitioning means a 100 TB log shards by time naturally.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def latest_snapshot(
    df: DataFrame,
    key: str = "url",
    ts_col: str = "warc_ts",
    payload_col: str = "text",
) -> DataFrame:
    """Keep the newest crawl snapshot per ``key`` (as-of dedup on the
    crawl timestamp) — the standard first pass over a multi-snapshot
    Common-Crawl-style table where the same url appears once per crawl.

    Returns one row per key: (key, ts, payload md5 of the kept row,
    n_snapshots).  Ties on ``ts_col`` break deterministically toward
    the lexicographically larger payload digest so re-runs and engines
    agree.

    Scale notes: expressed as one ``max_by`` aggregation, NOT a window —
    the partial aggregate combines map-side, so the shuffle carries one
    candidate row per (partition, key) instead of every snapshot of
    every url.  At 100 crawls x 10^10 urls that is the difference
    between shuffling the corpus and shuffling ~the key set.
    """
    digest = F.md5(F.col(payload_col))
    agg = df.groupBy(key).agg(
        F.max_by(
            F.struct(F.col(ts_col).alias("ts"), digest.alias("payload_md5")),
            # newest ts wins; digest breaks exact-ts ties (struct
            # compare is field-ordered, strings lexicographic)
            F.struct(F.col(ts_col), digest),
        ).alias("kept"),
        F.count("*").alias("n_snapshots"),
    )
    return agg.select(
        key,
        F.col("kept.ts").alias(ts_col),
        F.col("kept.payload_md5").alias("payload_md5"),
        "n_snapshots",
    )


def windowed_dedup(
    df: DataFrame,
    time_col: str = "ts",
    keys: Sequence[str] = ("user_id", "event_type"),
    window: str = "1 hour",
    id_col: str = "event_id",
    min_count: int = 2,
) -> DataFrame:
    """Collapse rows sharing ``keys`` within each tumbling ``window``.

    Returns one row per (window_start, *keys) group that had at least
    ``min_count`` events: the canonical (minimum) ``id_col`` plus the
    group size.  Downstream can anti-join on this to drop the dups.
    """
    grouped = df.groupBy(
        F.window(F.col(time_col), window).alias("w"), *keys
    ).agg(
        F.min(id_col).alias(f"canonical_{id_col}"),
        F.count("*").alias("n_events"),
    )
    return grouped.filter(F.col("n_events") >= min_count).select(
        F.col("w.start").alias("window_start"),
        *keys,
        f"canonical_{id_col}",
        "n_events",
    )
