"""SQL-surface materialized views (reference StorageMaterializedView.h,
InterpreterCreateQuery MV branch): refresh-on-stale against source table
versions; full re-run semantics documented."""

from __future__ import annotations

import pytest

from byconity_spark.engine.catalog import register_views
from byconity_spark.frontend import ch_sql
from byconity_spark.frontend.sql import _SESSION_MVS
from tests.conftest import SF_DIR


@pytest.fixture(autouse=True)
def _clean(spark):
    yield
    for v in ("mv_agg", "mv_over"):
        _SESSION_MVS.pop(v, None)
        spark.catalog.dropTempView(v)
    ch_sql(spark, "DROP TABLE IF EXISTS mv_src")


def test_mv_refreshes_after_source_insert(spark):
    register_views(spark, SF_DIR)
    ch_sql(
        spark,
        "CREATE TABLE mv_src AS SELECT n_regionkey AS r, n_nationkey AS k "
        "FROM nation",
    )
    ch_sql(
        spark,
        "CREATE MATERIALIZED VIEW mv_agg AS "
        "SELECT r, count(*) AS n FROM mv_src GROUP BY r",
    )
    before = {
        row[0]: row[1]
        for row in ch_sql(spark, "SELECT r, n FROM mv_agg").collect()
    }
    assert sum(before.values()) == 25
    ch_sql(spark, "INSERT INTO mv_src VALUES (9, 999)")
    after = {
        row[0]: row[1]
        for row in ch_sql(spark, "SELECT r, n FROM mv_agg").collect()
    }
    assert after.get(9) == 1 and sum(after.values()) == 26


def test_mv_on_mv_chain_refreshes(spark):
    register_views(spark, SF_DIR)
    ch_sql(spark, "CREATE TABLE mv_src AS SELECT 1 AS x")
    ch_sql(
        spark,
        "CREATE MATERIALIZED VIEW mv_agg AS "
        "SELECT count(*) AS n FROM mv_src",
    )
    ch_sql(
        spark,
        "CREATE MATERIALIZED VIEW mv_over AS "
        "SELECT n * 10 AS n10 FROM mv_agg",
    )
    assert ch_sql(spark, "SELECT n10 FROM mv_over").collect()[0][0] == 10
    ch_sql(spark, "INSERT INTO mv_src VALUES (2)")
    assert ch_sql(spark, "SELECT n10 FROM mv_over").collect()[0][0] == 20


def test_drop_view_covers_mv(spark):
    ch_sql(spark, "CREATE TABLE mv_src AS SELECT 1 AS x")
    ch_sql(
        spark,
        "CREATE MATERIALIZED VIEW mv_agg AS SELECT count(*) AS n FROM mv_src",
    )
    assert "mv_agg" in _SESSION_MVS
    assert ch_sql(spark, "DROP VIEW mv_agg").collect()[0][1] == "dropped"
    assert "mv_agg" not in _SESSION_MVS
