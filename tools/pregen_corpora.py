#!/usr/bin/env python
"""Pre-generate the deterministic scaling-bench corpora at full box
parallelism, so the gated measurement windows (bench_scaling.py, which
generates lazily on first run) never pay the synthesis cost inside the
timed session — at local[2] generating the 1.6M-doc corpus would
otherwise dominate the first window's wall clock.

Usage: python tools/pregen_corpora.py [n_docs ...] (default: the
ladder sizes 200000 400000 800000 1600000)
"""

from __future__ import annotations

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import bench_scaling as bs  # noqa: E402
from deduplicator_spark.session import build_session  # noqa: E402
from deduplicator_spark.sources.pages import synth_pages  # noqa: E402


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [200_000, 400_000, 800_000, 1_600_000]
    spark = build_session(
        app_name="pregen-corpora",
        master="local[32]",
        shuffle_partitions=64,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    for n in sizes:
        bs.N_DOCS = n
        path = bs.corpus_path()
        if os.path.exists(os.path.join(path, "_SUCCESS")):
            print(f"# {path} exists")
            continue
        t0 = time.monotonic()
        synth_pages(
            spark, n, partitions=bs.CORPUS_FILES, tok_scale=bs.TOK_SCALE
        ).write.mode("overwrite").parquet(path)
        print(f"# generated {path} in {time.monotonic() - t0:.1f}s")
    spark.stop()


if __name__ == "__main__":
    main()
