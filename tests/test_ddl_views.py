"""EXCHANGE TABLES, CREATE/DROP VIEW, system.functions (reference
ASTRenameQuery.h exchange flag, ASTCreateQuery is_ordinary_view,
StorageSystemFunctions.cpp)."""

from __future__ import annotations

import pytest

from byconity_spark.engine.catalog import register_views
from byconity_spark.frontend import ch_sql
from byconity_spark.frontend.sql import ChSqlError
from tests.conftest import SF_DIR


@pytest.fixture(autouse=True)
def _clean(spark):
    yield
    for t in ("ex_a", "ex_b", "v_nations"):
        spark.catalog.dropTempView(t)


def test_exchange_tables(spark):
    register_views(spark, SF_DIR)
    ch_sql(spark, "CREATE TABLE ex_a AS SELECT 1 AS x")
    ch_sql(spark, "CREATE TABLE ex_b AS SELECT 2 AS x UNION ALL SELECT 3")
    ch_sql(spark, "EXCHANGE TABLES ex_a AND ex_b")
    assert ch_sql(spark, "SELECT count(*) AS n FROM ex_a").collect()[0][0] == 2
    assert ch_sql(spark, "SELECT count(*) AS n FROM ex_b").collect()[0][0] == 1


def test_exchange_rolls_back_in_transaction(spark):
    from byconity_spark.engine.transactions import transactions

    transactions.reset()
    ch_sql(spark, "CREATE TABLE ex_a AS SELECT 1 AS x")
    ch_sql(spark, "CREATE TABLE ex_b AS SELECT 2 AS x UNION ALL SELECT 3")
    ch_sql(spark, "BEGIN")
    ch_sql(spark, "EXCHANGE TABLES ex_a AND ex_b")
    ch_sql(spark, "ROLLBACK")
    assert ch_sql(spark, "SELECT count(*) AS n FROM ex_a").collect()[0][0] == 1


def test_create_and_drop_view(spark):
    register_views(spark, SF_DIR)
    ch_sql(
        spark,
        "CREATE VIEW v_nations AS SELECT n_regionkey, count(*) AS n "
        "FROM nation GROUP BY n_regionkey",
    )
    assert (
        ch_sql(spark, "SELECT sum(n) AS s FROM v_nations").collect()[0][0]
        == 25
    )
    with pytest.raises(ChSqlError, match="not a view"):
        ch_sql(spark, "DROP VIEW nation")
    out = ch_sql(spark, "DROP VIEW v_nations").collect()
    assert out[0][1] == "dropped"
    assert ch_sql(
        spark, "DROP VIEW IF EXISTS v_nations"
    ).collect()[0][1] == "not_found"


def test_system_functions(spark):
    rows = ch_sql(
        spark,
        "SELECT name, is_aggregate FROM system.functions "
        "WHERE name IN ('windowFunnel', 'uniqExact', 'toStartOfHour')",
    ).collect()
    by_name = {r[0]: r[1] for r in rows}
    assert by_name["windowFunnel"] == 1
    assert by_name["uniqExact"] == 1
    assert by_name["toStartOfHour"] == 0
    n = ch_sql(
        spark, "SELECT count(*) AS n FROM system.functions"
    ).collect()[0][0]
    assert n > 1000  # the parity inventory covers 1200+ reference names
