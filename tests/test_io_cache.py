"""HARMONY_CACHE_TABLES=1 (the bench's warm-input mode) must be a pure
performance knob: identical rows to the bare-scan path, one materialized
copy per (session, sf_dir, table), and an InMemoryTableScan in the plan.
"""

import os

import pytest

from harmony_spark import io as hio


@pytest.fixture()
def cache_env(monkeypatch):
    monkeypatch.setenv("HARMONY_CACHE_TABLES", "1")
    yield
    # unpersist this session's entries so later tests see a cold session
    for key, df in list(hio._TABLE_CACHE.items()):
        df.unpersist()
        del hio._TABLE_CACHE[key]


SF = "/root/testdata/sf0.001"


def test_cached_rows_match_bare_scan(spark, cache_env):
    cached = hio.table(spark, SF, "orders")
    assert "InMemoryTableScan" in cached._jdf.queryExecution().executedPlan().toString()
    got = sorted(tuple(r) for r in cached.collect())
    os.environ.pop("HARMONY_CACHE_TABLES")
    bare = hio.table(spark, SF, "orders")
    assert "InMemoryTableScan" not in bare._jdf.queryExecution().executedPlan().toString()
    assert got == sorted(tuple(r) for r in bare.collect())


def test_cache_is_per_table_singleton(spark, cache_env):
    a = hio.table(spark, SF, "customer")
    b = hio.table_parallel(spark, SF, "customer")
    assert a is b  # table and table_parallel share one cached copy


def test_cached_events_ts_normalized(spark, cache_env):
    ev = hio.table(spark, SF, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp"
    assert ev.count() > 0
