"""SYSTEM commands (reference ASTSystemQuery.h Type enum /
InterpreterSystemQuery.cpp): the operational subset with real engine
effects."""

from __future__ import annotations

import pytest

from byconity_spark.engine.catalog import register_views
from byconity_spark.engine.query_cache import query_cache
from byconity_spark.frontend import ch_sql
from byconity_spark.frontend.sql import (
    _MERGES_STOPPED,
    _SESSION_DICTIONARIES,
    ChSqlError,
)
from tests.conftest import SF_DIR


@pytest.fixture(autouse=True)
def _clean(spark):
    _MERGES_STOPPED.clear()
    _SESSION_DICTIONARIES.clear()
    yield
    _MERGES_STOPPED.clear()
    _SESSION_DICTIONARIES.clear()
    ch_sql(spark, "DROP TABLE IF EXISTS sys_t")


def test_drop_query_cache(spark):
    register_views(spark, SF_DIR)
    query_cache.configure(enabled=True, min_query_runs=0)
    try:
        q = "SELECT count(*) AS n FROM nation SETTINGS use_query_cache = 1"
        ch_sql(spark, q).collect()
        ch_sql(spark, q).collect()
        assert len(query_cache._entries) > 0
        out = ch_sql(spark, "SYSTEM DROP QUERY CACHE").collect()
        assert out[0][1] == "cleared"
        assert len(query_cache._entries) == 0
    finally:
        query_cache.configure(enabled=False, min_query_runs=0)


def test_stop_merges_blocks_optimize_final(spark):
    register_views(spark, SF_DIR)
    ch_sql(
        spark,
        "CREATE TABLE sys_t ENGINE = ReplacingMergeTree ORDER BY k AS "
        "SELECT n_nationkey AS k, n_name AS v FROM nation",
    )
    ch_sql(spark, "SYSTEM STOP MERGES sys_t")
    assert ch_sql(
        spark, "OPTIMIZE TABLE sys_t FINAL"
    ).collect()[0][1] == "merges_stopped"
    ch_sql(spark, "SYSTEM START MERGES sys_t")
    assert ch_sql(
        spark, "OPTIMIZE TABLE sys_t FINAL"
    ).collect()[0][1] == "optimized_final"
    ch_sql(spark, "SYSTEM STOP MERGES")  # the global form
    assert ch_sql(
        spark, "OPTIMIZE TABLE sys_t FINAL"
    ).collect()[0][1] == "merges_stopped"


def test_reload_dictionaries(spark):
    register_views(spark, SF_DIR)
    ch_sql(
        spark,
        "CREATE DICTIONARY sys_dict PRIMARY KEY n_nationkey "
        "SOURCE(CLICKHOUSE(TABLE 'nation'))",
    )
    assert ch_sql(
        spark, "SYSTEM RELOAD DICTIONARIES"
    ).collect()[0][1] == "reloaded 1"
    assert ch_sql(
        spark, "SYSTEM RELOAD DICTIONARY sys_dict"
    ).collect()[0][1] == "reloaded 1"
    with pytest.raises(ChSqlError, match="unknown dictionary"):
        ch_sql(spark, "SYSTEM RELOAD DICTIONARY ghost")
    out = ch_sql(spark, "SYSTEM FLUSH LOGS").collect()
    assert out[0][1].startswith("flushed")


def test_show_create_echoes_partition_and_ttl(spark):
    register_views(spark, SF_DIR)
    ch_sql(
        spark,
        "CREATE TABLE sys_t PARTITION BY n_regionkey "
        "TTL ts_col + INTERVAL 5 DAY AS "
        "SELECT n_regionkey, CAST('2024-01-01' AS TIMESTAMP) AS ts_col "
        "FROM nation",
    )
    stmt = ch_sql(spark, "SHOW CREATE TABLE sys_t").collect()[0][0]
    assert "PARTITION BY n_regionkey" in stmt
    assert "TTL ts_col + INTERVAL 5 DAY" in stmt


def test_system_mutations_log(spark):
    from byconity_spark.frontend.sql import _MUTATIONS_LOG

    register_views(spark, SF_DIR)
    before = len(_MUTATIONS_LOG)
    ch_sql(spark, "CREATE TABLE sys_t AS SELECT n_nationkey AS k FROM nation")
    ch_sql(spark, "ALTER TABLE sys_t DELETE WHERE k > 20")
    ch_sql(spark, "ALTER TABLE sys_t UPDATE k = k + 100 WHERE k = 0")
    rows = ch_sql(
        spark,
        "SELECT table, command, is_done FROM system.mutations",
    ).collect()
    assert len(rows) == before + 2
    assert rows[before][0:1] == ("sys_t",)
    assert rows[before][1].startswith("DELETE WHERE")
    assert rows[before + 1][1].startswith("UPDATE k = k + 100")
    assert all(r[2] == 1 for r in rows)
