"""SnapshotTable: a minimal versioned table format with MERGE,
time-travel and rollback — the Iceberg-shaped system-of-record the
survey maps the reference's shelve onto, implemented dependency-free
because this environment ships no Iceberg runtime jar (documented gap,
VERDICT r1-r3).

What it reproduces, and from where in the reference:

- **Chunked upsert sink -> MERGE INTO** (S7, `dupedb.py:278-294`):
  every scan chunk committed a whole-file rewrite of the JSON shelve;
  here ``merge(df, key)`` commits one immutable snapshot whose
  manifest lists parquet files, with upsert-on-key semantics.
- **Validate / rename propagation** (J4/J7, `dupedb.py:413-438,
  145-157`): both are "MERGE on url WHEN MATCHED UPDATE" — expressed
  directly with ``merge``.
- **Trash undo / journal rollback** (S8/S9, `compare.py:377-380`,
  `dedupc.py:329-337`): ``rollback(version)`` commits a NEW version
  whose manifest points at an old version's (immutable) files —
  exactly Iceberg's snapshot rollback, and the durable analog of the
  reference's undo scripts.
- **Prune/GC** (`dupedb.py:395-411`): ``expire_snapshots`` deletes
  data files no retained manifest references.

Format (all commits atomic, all data files immutable):

    table_dir/
      _log/v00000001.json   one manifest per version:
                            {version, parent, op, files[], n_rows}
      data/<uuid>/part-*.parquet

A manifest is committed with exclusive-create (``open(..., "x")``):
two concurrent writers racing the same version number -> exactly one
wins, the loser gets a loud ``SnapshotConflict`` (optimistic
concurrency, the same contract Iceberg's catalog swap gives).

Scale notes: MERGE here is copy-on-write of the FULL table (one
distributed anti-join + union + parquet write — no driver-side data).
Real Iceberg prunes the rewrite to files that contain matched keys;
with a manifest-per-file min/max key index that optimization drops in
here without changing the API, and the commit protocol is unchanged.
Reads are plain ``spark.read.parquet(*files)`` — column pruning and
predicate pushdown work exactly as for any parquet scan.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


class SnapshotConflict(RuntimeError):
    """Another writer committed this version first (optimistic
    concurrency) — retry on the new head."""


class SnapshotTable:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self.log_dir = os.path.join(path, "_log")
        self.data_dir = os.path.join(path, "data")
        os.makedirs(self.log_dir, exist_ok=True)
        os.makedirs(self.data_dir, exist_ok=True)

    # -- log plumbing -------------------------------------------------------

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self.log_dir, f"v{version:08d}.json")

    def versions(self) -> list[int]:
        """Retained versions, ascending (expiry removes old ones)."""
        return sorted(
            int(f[1:9])
            for f in os.listdir(self.log_dir)
            if f.startswith("v") and f.endswith(".json")
        )

    def current_version(self) -> int:
        """0 = empty table (no snapshot yet)."""
        return max(self.versions(), default=0)

    def _manifest(self, version: int) -> dict:
        with open(self._manifest_path(version)) as fh:
            return json.load(fh)

    def _commit(self, files: list[str], op: str, n_rows: int) -> int:
        parent = self.current_version()
        version = parent + 1
        manifest = {
            "version": version,
            "parent": parent,
            "op": op,
            "files": sorted(files),
            "n_rows": n_rows,
            "ts": time.time(),
        }
        try:
            with open(self._manifest_path(version), "x") as fh:
                json.dump(manifest, fh)
        except FileExistsError as exc:
            raise SnapshotConflict(
                f"version {version} of {self.path} was committed concurrently"
            ) from exc
        return version

    def _write_files(self, df: DataFrame) -> tuple[list[str], int]:
        """One immutable parquet dir per write; returns (files, rows).
        Row count comes free from the parquet footers (no extra job)."""
        import pyarrow.parquet as pq

        out = os.path.join(self.data_dir, uuid.uuid4().hex)
        df.write.parquet(out)
        files = sorted(
            os.path.join(out, f) for f in os.listdir(out) if f.endswith(".parquet")
        )
        n = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
        return files, n

    # -- write ops ----------------------------------------------------------

    def append(self, df: DataFrame) -> int:
        files, n = self._write_files(df)
        prev = self.current_version()
        prev_files = self._manifest(prev)["files"] if prev else []
        prev_rows = self._manifest(prev)["n_rows"] if prev else 0
        return self._commit(prev_files + files, "append", prev_rows + n)

    def overwrite(self, df: DataFrame) -> int:
        files, n = self._write_files(df)
        return self._commit(files, "overwrite", n)

    def merge(self, source: DataFrame, key: str | list[str]) -> int:
        """Upsert: rows of ``source`` replace same-key rows of the
        current snapshot; unmatched source rows are inserted.  The
        reference's whole-shelve rewrite (`dupedb.py:278-294`) and its
        MERGE-shaped validate/rename ops (`dupedb.py:413-438,145-157`)
        in one distributed op: anti-join + union, copy-on-write."""
        keys = [key] if isinstance(key, str) else list(key)
        cur = self.read()
        merged = (
            cur.join(source.select(*keys).distinct(), keys, "left_anti").unionByName(
                source
            )
            if cur is not None
            else source
        )
        files, n = self._write_files(merged)
        return self._commit(files, "merge", n)

    def delete_where(self, condition) -> int:
        """Copy-on-write delete (the reference's trash sink, S8 —
        minus the physical file moves, which are action rows here)."""
        cur = self.read()
        if cur is None:
            raise ValueError("delete from empty table")
        remaining = cur.filter(~condition)
        files, n = self._write_files(remaining)
        return self._commit(files, "delete", n)

    def rollback(self, version: int) -> int:
        """Commit a NEW version pointing at ``version``'s immutable
        files — history is never rewritten (undo that is itself
        undoable, unlike the reference's destructive undo scripts)."""
        m = self._manifest(version)
        return self._commit(m["files"], f"rollback:{version}", m["n_rows"])

    # -- read ops -----------------------------------------------------------

    def read(self, version: int | None = None) -> DataFrame | None:
        """Time-travel read: the table as of ``version`` (default:
        head).  None for an empty table."""
        v = self.current_version() if version is None else version
        if v == 0:
            return None
        files = self._manifest(v)["files"]
        if not files:
            return None
        return self.spark.read.parquet(*files)

    def history(self) -> DataFrame:
        rows = [
            (m["version"], m["parent"], m["op"], len(m["files"]), m["n_rows"])
            for m in (self._manifest(v) for v in self.versions())
        ]
        return self.spark.createDataFrame(
            rows, "version int, parent int, op string, n_files int, n_rows long"
        )

    # -- maintenance --------------------------------------------------------

    def expire_snapshots(self, keep_last: int = 1) -> int:
        """Drop manifests older than the last ``keep_last`` versions
        and GC data files nothing retained references (the prune/
        validate GC of `dupedb.py:395-411`).  Returns files deleted."""
        vs = self.versions()
        keep_vs, drop_vs = vs[-keep_last:], vs[:-keep_last]
        keep_files: set[str] = set()
        for v in keep_vs:
            keep_files.update(self._manifest(v)["files"])
        removed = 0
        for v in drop_vs:
            for f in self._manifest(v)["files"]:
                if f not in keep_files and os.path.exists(f):
                    os.remove(f)
                    removed += 1
            os.remove(self._manifest_path(v))
        # sweep now-empty data dirs
        for d in os.listdir(self.data_dir):
            p = os.path.join(self.data_dir, d)
            if os.path.isdir(p) and not any(
                f.endswith(".parquet") for f in os.listdir(p)
            ):
                shutil.rmtree(p, ignore_errors=True)
        return removed
