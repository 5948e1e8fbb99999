from __future__ import annotations

import pytest

from deduplicator_spark.config import DedupConfig
from deduplicator_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session(app_name="dedup-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def cfg() -> DedupConfig:
    return DedupConfig()


@pytest.fixture(scope="session")
def small_pages(spark):
    """300-doc deterministic synthetic fixture, cached for the session."""
    from deduplicator_spark.sources.pages import synth_pages_with_truth

    df = synth_pages_with_truth(spark, 300).cache()
    df.count()
    return df
