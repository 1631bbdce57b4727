"""Query-result cache (engine/query_cache.py vs reference
src/Interpreters/Cache/QueryCache.h): per-statement opt-in, TTL staleness,
transactional invalidation on session-DDL writes, non-deterministic-function
skip, LRU entry cap, system.query_cache introspection."""

from __future__ import annotations

import time

import pytest

from byconity_spark.engine.query_cache import query_cache
from byconity_spark.frontend.sql import ch_sql


@pytest.fixture(autouse=True)
def _fresh_cache():
    query_cache.clear()
    query_cache.configure(enabled=False, ttl=60.0, max_entries=64,
                          min_query_runs=0, writes_enabled=True,
                          reads_enabled=True)
    yield
    query_cache.clear()


def test_hit_serves_same_persisted_frame(spark):
    q = "SELECT 1 + 1 AS two SETTINGS use_query_cache = 1"
    first = ch_sql(spark, q)
    assert first.collect()[0]["two"] == 2
    second = ch_sql(spark, q)
    assert second is first  # the stored persisted DataFrame is re-served
    assert query_cache.stats["hits"] == 1
    assert query_cache.stats["stores"] == 1
    # case variants of keywords normalize to the same key (the reference
    # hashes the AST for the same reason, QueryCache.h:48)
    third = ch_sql(spark, "select 1 + 1 as two SETTINGS use_query_cache=1")
    assert third is first


def test_setting_zero_overrides_session_default(spark):
    query_cache.configure(enabled=True)
    ch_sql(spark, "SELECT 2 AS v SETTINGS use_query_cache = 0")
    assert query_cache.stats["stores"] == 0
    ch_sql(spark, "SELECT 2 AS v")  # session default on -> cached
    assert query_cache.stats["stores"] == 1


def test_ttl_expiry(spark):
    query_cache.configure(ttl=0.05)
    q = "SELECT 3 AS v SETTINGS use_query_cache = 1"
    ch_sql(spark, q)
    time.sleep(0.1)
    ch_sql(spark, q)
    assert query_cache.stats["hits"] == 0
    assert query_cache.stats["stale_drops"] == 1
    assert query_cache.stats["stores"] == 2  # re-stored after expiry


def test_insert_invalidates_cached_reader(spark):
    ch_sql(spark, "DROP TABLE IF EXISTS qc_t")
    ch_sql(spark, "CREATE TABLE qc_t (k Int64) ENGINE = MergeTree")
    ch_sql(spark, "INSERT INTO qc_t VALUES (1), (2)")
    q = "SELECT count(*) AS n FROM qc_t SETTINGS use_query_cache = 1"
    assert ch_sql(spark, q).collect()[0]["n"] == 2
    ch_sql(spark, "INSERT INTO qc_t VALUES (3)")
    # the cached entry went stale via the table-version bump (cnch_txn
    # analogue) — the re-run must see the new row, not the cached result
    assert ch_sql(spark, q).collect()[0]["n"] == 3
    assert query_cache.stats["stale_drops"] == 1


def test_nondeterministic_results_never_cached(spark):
    ch_sql(spark, "SELECT now() AS t SETTINGS use_query_cache = 1")
    ch_sql(spark, "SELECT rand() AS r SETTINGS use_query_cache = 1")
    assert query_cache.stats["stores"] == 0


def test_lru_entry_cap_evicts_oldest(spark):
    query_cache.configure(max_entries=2)
    ch_sql(spark, "SELECT 10 AS v SETTINGS use_query_cache = 1")
    ch_sql(spark, "SELECT 20 AS v SETTINGS use_query_cache = 1")
    ch_sql(spark, "SELECT 30 AS v SETTINGS use_query_cache = 1")
    assert query_cache.stats["evictions"] == 1
    # oldest (10) evicted; 20 and 30 still hit
    ch_sql(spark, "SELECT 20 AS v SETTINGS use_query_cache = 1")
    assert query_cache.stats["hits"] == 1
    ch_sql(spark, "SELECT 10 AS v SETTINGS use_query_cache = 1")
    assert query_cache.stats["stores"] == 4  # 10 was re-stored


def test_min_query_runs_gate(spark):
    query_cache.configure(min_query_runs=2)
    q = "SELECT 40 AS v SETTINGS use_query_cache = 1"
    ch_sql(spark, q)  # run 1: below the gate, not stored
    assert query_cache.stats["stores"] == 0
    ch_sql(spark, q)  # run 2: stored
    assert query_cache.stats["stores"] == 1
    assert ch_sql(spark, q).collect()[0]["v"] == 40
    assert query_cache.stats["hits"] == 1


def test_system_query_cache_view(spark):
    ch_sql(spark, "SELECT 50 AS v SETTINGS use_query_cache = 1")
    rows = ch_sql(
        spark,
        "SELECT query, hits, stale FROM system.query_cache",
    ).collect()
    assert len(rows) == 1
    assert "50" in rows[0]["query"]
    assert rows[0]["stale"] is False
