"""ByConity stats DDL (reference src/Parsers/ASTStatsQuery.h,
src/Statistics/StatisticsCollector.h): CREATE/DROP/SHOW STATS|COLUMN_STATS
through the SQL frontend, backed by the engine/stats.py collection pass."""

from __future__ import annotations

import pytest

from byconity_spark.engine.catalog import register_views
from byconity_spark.engine.stats import _SHOW_STATS, _STATS_REGISTRY
from byconity_spark.frontend import ch_sql
from tests.conftest import SF_DIR


@pytest.fixture(autouse=True)
def _clean_registry():
    _STATS_REGISTRY.clear()
    _SHOW_STATS.clear()
    yield
    _STATS_REGISTRY.clear()
    _SHOW_STATS.clear()


def test_create_stats_base_table(spark):
    """Reference output shapes (InterpreterCreateStatsQuery.cpp /
    InterpreterShowStatsQuery.cpp, 45022 golden): CREATE STATS returns
    (table_name, column_count, row_count_or_error); SHOW STATS the
    9-column formatted block led by a `t.*` row-count line."""
    register_views(spark, SF_DIR)
    out = ch_sql(spark, "CREATE STATS orders (o_orderkey, o_custkey)").collect()
    true_n = spark.table("orders").count()
    assert out[0][1] == 2 and out[0][2] == str(true_n)

    shown = {r[0]: r for r in ch_sql(spark, "SHOW STATS orders").collect()}
    assert shown["orders.*"][2] == str(true_n)
    ck = shown["orders.o_custkey"]
    exact_ndv = spark.table("orders").select("o_custkey").distinct().count()
    assert ck[2] == str(true_n)      # count (non-null)
    assert ck[3] == "0"              # null_count: TPC-H custkey
    assert ck[4] == str(exact_ndv)   # ndv (exact collection)
    lo, hi = (
        spark.sql("SELECT min(o_custkey), max(o_custkey) FROM orders")
        .collect()[0]
    )
    assert ck[5] == str(lo) and ck[6] == str(hi)
    assert ck[8] == "1"              # has_histogram

    # COLUMN_STATS = per-bucket histogram rows; wide-NDV columns (>64)
    # skip the exact bucket listing
    cs = ch_sql(spark, "SHOW COLUMN_STATS orders").collect()
    assert all(r[0].startswith("orders.") for r in cs)


def test_create_stats_feeds_cbo_catalog(spark):
    register_views(spark, SF_DIR)
    ch_sql(spark, "CREATE STATS nation")
    assert spark.catalog.tableExists("cbo_nation")


def test_create_stats_session_table(spark):
    register_views(spark, SF_DIR)
    ch_sql(spark, "DROP TABLE IF EXISTS st_probe")
    ch_sql(
        spark,
        "CREATE TABLE st_probe AS SELECT n_nationkey, n_regionkey "
        "FROM nation WHERE n_regionkey < 2",
    )
    out = ch_sql(spark, "CREATE STATS st_probe").collect()
    expect = spark.table("st_probe").count()
    assert out[0][1] == 2 and out[0][2] == str(expect)
    ch_sql(spark, "DROP TABLE st_probe")


def test_drop_and_show_all(spark):
    register_views(spark, SF_DIR)
    ch_sql(spark, "CREATE STATS region")
    ch_sql(spark, "CREATE STATS nation")
    allrows = ch_sql(spark, "SHOW STATS nation").collect()
    # named form: only that table — the `nation.*` line + its columns
    assert allrows[0][0] == "nation.*"
    assert all(r[0].startswith("nation.") for r in allrows)
    dropped = ch_sql(spark, "DROP STATS region").collect()
    assert dropped[0][1] == "dropped"
    assert ch_sql(spark, "SHOW STATS region").collect() == []
    again = ch_sql(spark, "DROP STATS IF EXISTS region").collect()
    assert again[0][1] in ("dropped", "not_found")  # sidecar may linger


def test_show_processlist_statement(spark):
    rows = ch_sql(spark, "SHOW PROCESSLIST").collect()
    assert len(rows) == 1 and "PROCESSLIST" in rows[0][1].upper()


def test_show_tables_and_like(spark):
    register_views(spark, SF_DIR)
    names = [r[0] for r in ch_sql(spark, "SHOW TABLES").collect()]
    assert "nation" in names and "lineitem" in names
    filtered = [
        r[0] for r in ch_sql(spark, "SHOW TABLES LIKE 'nat%'").collect()
    ]
    assert filtered == ["nation"]


def test_show_databases(spark):
    names = {r[0] for r in ch_sql(spark, "SHOW DATABASES").collect()}
    # `test` is pre-created like clickhouse-test's harness; other tests
    # may drop it — accept either state (order-independence)
    assert {"default", "system"} <= names <= {"default", "system", "test"}


def test_show_settings_like(spark):
    from byconity_spark.engine.limits import session_limits

    session_limits.reset()
    rows = ch_sql(
        spark, "SHOW SETTINGS LIKE 'max!_%'".replace("!", "\\")
    ).collect()
    # underscore is a single-char wildcard in CH LIKE; escaped form above
    assert {r[0] for r in rows} >= {"max_result_rows", "max_rows_to_read"}
    assert all(r[2] == 0 for r in rows)  # nothing changed from defaults
    ch_sql(spark, "SET max_result_rows = 9")
    try:
        row = [
            r for r in
            ch_sql(spark, "SHOW SETTINGS LIKE 'max%'").collect()
            if r[0] == "max_result_rows"
        ][0]
        assert row[1] == "9" and row[2] == 1
    finally:
        session_limits.reset()
