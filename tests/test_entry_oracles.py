"""Driver-contract simulation: every oracle-backed query must match
DuckDB exactly (row count + schema-sorted value comparison) at sf0.01.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(entrymod.oracle_sql().keys()))
def test_query_matches_oracle(spark, duck, name):
    q = entrymod.queries()[name]
    sdf = _normalize(q(spark, SF_DIR).toPandas())
    odf = _normalize(duck.execute(entrymod.oracle_sql()[name]).df())
    assert list(sdf.columns) == list(odf.columns), f"schema mismatch in {name}"
    assert len(sdf) == len(odf), f"row count {len(sdf)} vs {len(odf)} in {name}"
    # the driver's value hash is dtype-sensitive (an int column vs a
    # float column of equal values hash differently) — pin the numeric
    # KIND even though exact width may differ (int32 vs int64 is fine)
    for c in sdf.columns:
        ks, ko = sdf[c].dtype.kind, odf[c].dtype.kind
        both = {ks, ko}
        assert ks == ko or both <= {"i", "u"}, f"dtype kind mismatch in {name}.{c}: {ks} vs {ko}"
    if len(sdf):
        pd.testing.assert_frame_equal(sdf, odf, check_dtype=False, check_exact=True)


def test_rows_only_queries_run(spark):
    """Queries without oracles must still run and be deterministic."""
    qs = entrymod.queries()
    for name in sorted(set(qs) - set(entrymod.oracle_sql())):
        df = qs[name](spark, SF_DIR)
        n1 = df.count()
        assert n1 >= 0, name


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
