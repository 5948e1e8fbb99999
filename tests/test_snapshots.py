"""SnapshotTable: versioned parquet + MERGE + time-travel + rollback
(the Iceberg-shaped system-of-record, sources/snapshots.py)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from deduplicator_spark.sources.snapshots import SnapshotConflict, SnapshotTable


@pytest.fixture()
def table(spark, tmp_path):
    return SnapshotTable(spark, str(tmp_path / "tbl"))


def _df(spark, rows):
    return spark.createDataFrame(rows, "k int, v string")


def _rows(df):
    return sorted((r["k"], r["v"]) for r in df.collect())


def test_append_and_head_read(spark, table):
    assert table.read() is None and table.current_version() == 0
    v1 = table.append(_df(spark, [(1, "a"), (2, "b")]))
    v2 = table.append(_df(spark, [(3, "c")]))
    assert (v1, v2) == (1, 2)
    assert _rows(table.read()) == [(1, "a"), (2, "b"), (3, "c")]


def test_merge_upserts_and_inserts(spark, table):
    table.overwrite(_df(spark, [(1, "a"), (2, "b"), (3, "c")]))
    table.merge(_df(spark, [(2, "B"), (9, "new")]), key="k")
    assert _rows(table.read()) == [(1, "a"), (2, "B"), (3, "c"), (9, "new")]
    # merge into an empty table = plain insert
    t2 = SnapshotTable(spark, table.path + "2")
    t2.merge(_df(spark, [(5, "e")]), key="k")
    assert _rows(t2.read()) == [(5, "e")]


def test_time_travel_reads_are_immutable(spark, table):
    table.overwrite(_df(spark, [(1, "a")]))
    table.merge(_df(spark, [(1, "A"), (2, "b")]), key="k")
    table.delete_where(F.col("k") == 2)
    assert _rows(table.read(1)) == [(1, "a")]
    assert _rows(table.read(2)) == [(1, "A"), (2, "b")]
    assert _rows(table.read(3)) == [(1, "A")]


def test_rollback_restores_without_rewriting_history(spark, table):
    table.overwrite(_df(spark, [(1, "a"), (2, "b")]))
    table.delete_where(F.col("k") == 1)
    v3 = table.rollback(1)
    assert v3 == 3
    assert _rows(table.read()) == [(1, "a"), (2, "b")]
    ops = [r["op"] for r in table.history().orderBy("version").collect()]
    assert ops == ["overwrite", "delete", "rollback:1"]


def test_concurrent_commit_conflicts_loudly(spark, table, monkeypatch):
    """The optimistic-concurrency race: two writers both read head=1
    and both try to commit v2.  Simulated by letting a racer claim the
    v2 manifest while our writer's view of the head is pinned stale —
    the exclusive-create commit must fail LOUDLY, never overwrite."""
    table.overwrite(_df(spark, [(1, "a")]))
    with open(table._manifest_path(2), "x") as fh:
        fh.write("{}")  # racer wins version 2
    monkeypatch.setattr(table, "current_version", lambda: 1)  # stale head view
    with pytest.raises(SnapshotConflict):
        table.append(_df(spark, [(2, "b")]))


def test_expire_gcs_unreferenced_files_only(spark, table):
    table.overwrite(_df(spark, [(1, "a")]))
    table.append(_df(spark, [(2, "b")]))  # v2 references v1's files too
    table.overwrite(_df(spark, [(9, "z")]))  # v3 drops them
    before = {
        f
        for m in (table._manifest(v) for v in table.versions())
        for f in m["files"]
    }
    removed = table.expire_snapshots(keep_last=1)
    assert removed > 0
    assert table.versions() == [3]
    assert _rows(table.read()) == [(9, "z")]
    # every retained file still exists; expired ones are gone
    head_files = set(table._manifest(3)["files"])
    assert all(os.path.exists(f) for f in head_files)
    assert all(not os.path.exists(f) for f in before - head_files)


def test_expire_keeps_files_shared_with_retained_versions(spark, table):
    table.overwrite(_df(spark, [(1, "a")]))
    table.append(_df(spark, [(2, "b")]))  # head shares v1's files
    removed = table.expire_snapshots(keep_last=1)
    assert removed == 0  # v1's files are referenced by v2
    assert _rows(table.read()) == [(1, "a"), (2, "b")]


def test_history_row_counts_from_footers(spark, table):
    table.overwrite(_df(spark, [(1, "a"), (2, "b")]))
    table.merge(_df(spark, [(3, "c")]), key="k")
    h = {r["version"]: r["n_rows"] for r in table.history().collect()}
    assert h == {1: 2, 2: 3}
