#!/usr/bin/env python
"""Build the --py-files archive for cluster submission.

    python package.py            # writes dist/deduplicator_spark.zip
    spark-submit --py-files dist/deduplicator_spark.zip bench.py

The zip contains only the package sources (no tests, no caches) — the
artifact a real N/4N-executor deployment ships to its executors.
"""

from __future__ import annotations

import os
import zipfile

ROOT = os.path.dirname(os.path.abspath(__file__))


def build(out_dir: str = "dist") -> str:
    dist = os.path.join(ROOT, out_dir)
    os.makedirs(dist, exist_ok=True)
    out = os.path.join(dist, "deduplicator_spark.zip")
    pkg = os.path.join(ROOT, "deduplicator_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, dirnames, filenames in os.walk(pkg):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for fn in sorted(filenames):
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    zf.write(full, os.path.relpath(full, ROOT))
    return out


if __name__ == "__main__":
    print(build())
