"""system.query_log (engine/query_log.py vs reference
src/Interpreters/QueryLog.h): top-level statements are recorded with kind,
status, duration and query-cache usage; internal recursion (CTAS / EXPLAIN
inner SELECTs) is not double-logged."""

from __future__ import annotations

import pytest

from byconity_spark.engine.query_cache import query_cache
from byconity_spark.engine.query_log import query_log
from byconity_spark.frontend.sql import ChSqlError, ch_sql


@pytest.fixture(autouse=True)
def _fresh():
    query_log.clear()
    query_cache.clear()
    query_cache.configure(enabled=False)
    yield
    query_log.clear()
    query_cache.clear()


def _log_rows(spark):
    return ch_sql(
        spark,
        "SELECT query, query_kind, status, cache_usage, exception "
        "FROM system.query_log",
    ).collect()


def test_statements_logged_with_kind(spark):
    ch_sql(spark, "SELECT 1 AS v")
    ch_sql(spark, "DROP TABLE IF EXISTS ql_missing")
    rows = _log_rows(spark)
    kinds = [(r["query_kind"], r["status"]) for r in rows]
    assert ("Select", "QueryFinish") in kinds
    assert ("Drop", "QueryFinish") in kinds


def test_internal_recursion_not_double_logged(spark):
    ch_sql(spark, "CREATE TABLE ql_t ENGINE = MergeTree AS SELECT 7 AS k")
    rows = _log_rows(spark)
    assert len(rows) == 1  # the CTAS only — not its inner SELECT
    assert rows[0]["query_kind"] == "Create"
    ch_sql(spark, "DROP TABLE ql_t")


def test_cache_usage_write_then_read(spark):
    q = "SELECT 5 AS v SETTINGS use_query_cache = 1"
    ch_sql(spark, q)
    ch_sql(spark, q)
    usages = [r["cache_usage"] for r in _log_rows(spark)
              if r["query"].startswith("SELECT 5")]
    assert usages == ["Write", "Read"]


def test_failed_statement_logged_with_exception(spark):
    with pytest.raises(ChSqlError):
        ch_sql(spark, "SELECT versionCompare('1.2', '1.3', '???')")
    rows = _log_rows(spark)
    assert rows[0]["status"] == "ExceptionBeforeStart"
    assert rows[0]["exception"] == "ChSqlError"
