"""Surrogate-id encoding for the heavy middle of the dedup chain.

Urls are ~50-200 byte strings; candidate-pair expansion, pair dedup
and connected-components iterations shuffle pair keys many times.  At
100 TB that difference is terabytes of shuffle.  So the chain runs on
64-bit ``xxhash64(url)`` surrogate ids and maps back to urls at the
edges of the plan.

The id is a pure column function, so in the common (collision-free)
case attaching it is a PROJECTION — no join, no extra shuffle, no
second checkpoint of the wide fingerprint rows.  The url->nid
dictionary is only materialized for the final decode step and for the
collision check.

Collision policy: LOUD, never silent.  ``encode_ids`` counts distinct
ids vs distinct urls (one cheap aggregation) and on collision falls
back to ``zipWithIndex`` dense ids — fully distributed (one extra
count job, no global sort; the old row_number-over-everything fallback
was a single-task outage waiting at 10^12 urls).  nid VALUES in the
fallback depend on partitioning, which is safe: every consumer
(pair expansion, CC) only needs uniqueness — cluster ids are
re-derived as min(real url) at decode time (``decode_clusters``), so
pipeline output is identical either way.  Callers then attach ids via
the dictionary join instead of the hash projection.
"""

from __future__ import annotations

import atexit
import os
import shutil
import socket
import tempfile
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cluster_visible_ckpt(spark) -> bool:
    """Driver-local parquet checkpoints are only correct when every
    executor shares the driver's filesystem: a ``local[*]`` master, or
    the user explicitly pointing ``DEDUP_CKPT_DIR`` at cluster-visible
    storage (HDFS/NFS/object-store mount).  On any other master a
    scheme-less /dev/shm path would let executors commit task files to
    their OWN local disks and the driver's read-back silently return
    partial data (ADVICE r3) — callers must fall back to
    ``localCheckpoint`` instead."""
    if os.environ.get("DEDUP_CKPT_DIR"):
        return True
    return spark.sparkContext.master.startswith("local")


def checkpoint_parquet(df: DataFrame, name: str) -> DataFrame:
    """Materialize ``df`` as a parquet checkpoint and return the
    re-read frame.

    Preferred over ``localCheckpoint`` for WIDE frames that are
    referenced repeatedly with different column needs: localCheckpoint
    is a row store with no column pruning, so every reference re-reads
    the KB-scale shingle arrays even when it only needs a 512-byte
    signature — measured 42.8s -> 34.8s median on the 200k-doc
    flagship chain at 8 cores when the fingerprint checkpoint switched
    to parquet (tools/fp_checkpoint_ab.py).  It is also exactly the
    durable shape the full pipeline writes for resume, so bench and
    production share one physical layout.

    Files land under ``$DEDUP_CKPT_DIR`` (default: /dev/shm when
    present, else the system temp dir), keyed by Spark application id
    and ``name`` — re-running the same stage in one session overwrites
    rather than accumulates, and the application dir is reclaimed at
    driver exit (``_register_app_dir``).  On a non-local master with
    no explicit cluster-visible ``DEDUP_CKPT_DIR`` this degrades to
    ``localCheckpoint`` — correct everywhere, just without parquet's
    column pruning.
    """
    spark = df.sparkSession
    if not cluster_visible_ckpt(spark):
        return df.localCheckpoint()
    path = checkpoint_path(spark, name)
    df.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def checkpoint_path(spark, name: str) -> str:
    """Ephemeral checkpoint location for this application: under
    ``$DEDUP_CKPT_DIR`` (default /dev/shm when present, else the
    system temp dir), keyed by application id so concurrent sessions
    never collide and same-name stages overwrite within a session.
    First call per application registers exit-time cleanup and purges
    stale sibling app dirs (ADVICE r3: /dev/shm is RAM — leaked
    checkpoint dirs from past runs accumulate until tmpfs exhaustion)."""
    base = os.environ.get("DEDUP_CKPT_DIR") or (
        "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
    )
    root = os.path.join(base, "dedup-ckpt")
    app_dir = os.path.join(root, spark.sparkContext.applicationId)
    _register_app_dir(app_dir, root)
    return os.path.join(app_dir, name)


_registered_app_dirs: set[str] = set()


def _register_app_dir(app_dir: str, root: str) -> None:
    """tmpfs hygiene: mark this application's checkpoint dir with the
    driver pid and remove it at interpreter exit; purge sibling app
    dirs left behind by crashed/killed drivers (their recorded pid is
    dead) or, when no pidfile survives, older than
    ``$DEDUP_CKPT_TTL_S`` (default 6 h)."""
    if app_dir in _registered_app_dirs:
        return
    _registered_app_dirs.add(app_dir)
    os.makedirs(app_dir, exist_ok=True)
    with open(os.path.join(app_dir, ".driver-pid"), "w") as fh:
        fh.write(f"{os.getpid()}@{socket.gethostname()}")
    atexit.register(shutil.rmtree, app_dir, ignore_errors=True)
    try:
        ttl = float(os.environ.get("DEDUP_CKPT_TTL_S", str(6 * 3600)))
        now = time.time()
        for d in os.listdir(root):
            p = os.path.join(root, d)
            if p != app_dir and os.path.isdir(p) and _stale_app_dir(p, now, ttl):
                shutil.rmtree(p, ignore_errors=True)
    except OSError:
        pass


def _stale_app_dir(p: str, now: float, ttl: float) -> bool:
    """Dead recorded driver pid -> stale.  Live pid -> never purge
    (a concurrent session owns it).  The pid-liveness probe is only
    meaningful on the host that RECORDED the pid: on a shared mount
    (DEDUP_CKPT_DIR on NFS) a foreign driver's pid number usually
    doesn't exist locally, and ``os.kill(pid, 0)`` would declare a
    LIVE remote run stale and rmtree its checkpoints mid-run (ADVICE
    r4 #3) — so pidfiles record ``pid@hostname`` and foreign-host
    dirs fall back to the mtime TTL.  Unreadable/absent pidfile (old
    layout, partial write) -> mtime TTL as well."""
    try:
        raw = open(os.path.join(p, ".driver-pid")).read().strip()
        pid_s, _, host = raw.partition("@")
        pid = int(pid_s)
    except (OSError, ValueError):
        try:
            return now - os.path.getmtime(p) > ttl
        except OSError:
            return False
    if host and host != socket.gethostname():
        # foreign host: pid numbers don't transfer; only the TTL is safe
        try:
            return now - os.path.getmtime(p) > ttl
        except OSError:
            return False
    try:
        os.kill(pid, 0)
        return False
    except ProcessLookupError:
        return True
    except PermissionError:
        return False


def encode_ids(docs: DataFrame, url_col: str = "url") -> tuple[DataFrame, bool]:
    """Returns ((url, nid) dictionary, hash_ok).

    hash_ok=True  -> nid == xxhash64(url): attach ids with a projection.
    hash_ok=False -> collision detected: dense fallback ids, attach via join.

    The returned dictionary is already materialized (lazy checkpoint
    driven by the collision-check action here), so callers must NOT
    add their own checkpoint — per-job overhead is the measured
    scaling floor of the chain, and the old caller-side
    ``dict_ids.localCheckpoint()`` was a second full scan of the
    fingerprint frame just to store what this function had already
    computed.
    """
    urls = docs.select(F.col(url_col).alias("url")).distinct()
    ids = urls.select("url", F.xxhash64("url").alias("nid")).localCheckpoint(
        eager=False
    )
    counts = ids.agg(
        F.count("*").alias("n"), F.count_distinct("nid").alias("nd")
    ).collect()[0]
    if counts["n"] == counts["nd"]:
        return ids, True
    dense = urls.rdd.zipWithIndex().map(lambda t: (t[0][0], t[1]))
    return dense.toDF(["url", "nid"]).localCheckpoint(), False


def encode_fp(fp: DataFrame, dict_ids: DataFrame, hash_ok: bool = True, url_col: str = "url") -> DataFrame:
    """fingerprints keyed by url -> same frame keyed by nid AS 'url'.

    Projection (no join) when hash_ok — the wide fingerprint rows
    never re-shuffle just to pick up their id.
    """
    if hash_ok:
        return fp.withColumn("__nid", F.xxhash64(url_col)).drop(url_col).withColumnRenamed(
            "__nid", "url"
        )
    return fp.join(dict_ids.withColumnRenamed("url", url_col), url_col).drop(
        url_col
    ).withColumnRenamed("nid", "url")


def decode_pairs(pairs: DataFrame, dict_ids: DataFrame) -> DataFrame:
    """(url_a, url_b, ...) on nids -> on url strings."""
    a = dict_ids.withColumnsRenamed({"url": "_ua", "nid": "url_a"})
    b = dict_ids.withColumnsRenamed({"url": "_ub", "nid": "url_b"})
    return (
        pairs.join(a, "url_a")
        .join(b, "url_b")
        .drop("url_a", "url_b")
        .withColumnsRenamed({"_ua": "url_a", "_ub": "url_b"})
    )


def decode_clusters(clusters: DataFrame, dict_ids: DataFrame) -> DataFrame:
    """clusters on nids -> (url, cluster_id=min member url, cluster_size).

    Restores the string cluster-id semantics (deterministic, debuggable
    — the analog of the reference's shelve key)."""
    with_urls = (
        clusters.withColumnRenamed("url", "nid")
        .join(dict_ids.withColumnsRenamed({"url": "real_url", "nid": "nid"}), "nid")
    )
    labels = with_urls.groupBy("cluster_id").agg(F.min("real_url").alias("cluster_url"))
    return (
        with_urls.join(labels, "cluster_id")
        .select(
            F.col("real_url").alias("url"),
            F.col("cluster_url").alias("cluster_id"),
            "cluster_size",
        )
    )
