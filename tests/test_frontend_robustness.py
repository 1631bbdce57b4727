"""Error-path invariants for the round-6 statement surface: a failing
statement must never leave swapped views, partial transactions, or
half-registered session state behind."""

from __future__ import annotations

import pytest

from byconity_spark.engine.access import access_control
from byconity_spark.engine.catalog import register_views
from byconity_spark.engine.transactions import transactions
from byconity_spark.frontend import ch_sql
from byconity_spark.frontend.sql import (
    _SESSION_DICTIONARIES,
    _SESSION_TABLE_ENGINES,
    ChSqlError,
)
from tests.conftest import SF_DIR


@pytest.fixture(autouse=True)
def _clean(spark):
    access_control.reset()
    transactions.reset()
    yield
    access_control.reset()
    transactions.reset()
    ch_sql(spark, "DROP TABLE IF EXISTS rb_t")


def test_policy_views_restored_after_failing_statement(spark):
    register_views(spark, SF_DIR)
    ch_sql(
        spark,
        "CREATE ROW POLICY rb_p ON orders USING o_orderstatus = 'F' TO ALL",
    )
    # statement that fails AFTER the view swap happened (bad column)
    with pytest.raises(Exception):
        ch_sql(spark, "SELECT no_such_col FROM orders").collect()
    # the swap must have been rolled back: dropping the policy restores
    # the FULL table through the ORIGINAL registered view
    ch_sql(spark, "DROP ROW POLICY rb_p ON orders")
    full = ch_sql(spark, "SELECT count(*) AS n FROM orders").collect()[0][0]
    only_f = ch_sql(
        spark,
        "SELECT count(*) AS n FROM orders WHERE o_orderstatus = 'F'",
    ).collect()[0][0]
    assert full > only_f


def test_denied_statement_restores_earlier_swaps(spark):
    register_views(spark, SF_DIR)
    ch_sql(spark, "CREATE USER bob")
    ch_sql(spark, "GRANT SELECT ON customer TO bob")
    ch_sql(
        spark,
        "CREATE ROW POLICY rb_p2 ON customer USING c_nationkey = 1 TO ALL",
    )
    ch_sql(spark, "SET SESSION USER bob")
    # customer swaps first (alphabetical), then orders raises ACCESS_DENIED
    with pytest.raises(Exception, match="ACCESS_DENIED"):
        ch_sql(
            spark,
            "SELECT count(*) FROM customer JOIN orders "
            "ON c_custkey = o_custkey",
        )
    ch_sql(spark, "SET SESSION USER default")
    access_control.reset()
    n = ch_sql(spark, "SELECT count(*) AS n FROM customer").collect()[0][0]
    assert n > 100  # the unswapped full view is back


def test_bad_inline_payload_leaves_table_unchanged(spark):
    ch_sql(spark, "CREATE TABLE rb_t (k Int32)")
    with pytest.raises(Exception):
        ch_sql(spark, 'INSERT INTO rb_t FORMAT JSONEachRow {"k": not-json}')
    assert ch_sql(spark, "SELECT count(*) AS n FROM rb_t").collect()[0][0] == 0


def test_failed_statement_inside_transaction_keeps_txn_usable(spark):
    ch_sql(spark, "CREATE TABLE rb_t (k Int32)")
    ch_sql(spark, "BEGIN")
    ch_sql(spark, "INSERT INTO rb_t VALUES (1)")
    with pytest.raises(Exception):
        ch_sql(spark, "SELECT broken syntax FROM nowhere")
    ch_sql(spark, "INSERT INTO rb_t VALUES (2)")  # txn still open and usable
    ch_sql(spark, "ROLLBACK")
    assert ch_sql(spark, "SELECT count(*) AS n FROM rb_t").collect()[0][0] == 0


def test_malformed_ddl_raises_without_registering_state(spark):
    before_dicts = dict(_SESSION_DICTIONARIES)
    before_tables = dict(_SESSION_TABLE_ENGINES)
    with pytest.raises(Exception):
        ch_sql(
            spark,
            "CREATE DICTIONARY bad PRIMARY KEY k "
            "SOURCE(CLICKHOUSE(TABLE 'missing_xyz'))",
        )
    with pytest.raises(ChSqlError):
        ch_sql(spark, "ALTER TABLE nation DROP PARTITION 0")  # not partitioned
    assert _SESSION_DICTIONARIES == before_dicts
    assert _SESSION_TABLE_ENGINES == before_tables
