"""Interactive transactions (engine/transactions.py + frontend BEGIN/
COMMIT/ROLLBACK/SHOW STATEMENTS) — reference src/Parsers/ASTTransaction.h
keywords over CnchTransaction semantics, scoped to session tables."""

from __future__ import annotations

import pytest

from byconity_spark.engine.catalog import register_views
from byconity_spark.engine.transactions import TransactionError, transactions
from byconity_spark.frontend import ch_sql
from tests.conftest import SF_DIR


@pytest.fixture(autouse=True)
def _clean(spark):
    transactions.reset()
    yield
    transactions.reset()
    for t in ("txn_t", "txn_new", "txn_gone"):
        spark.catalog.dropTempView(t)


def _mk(spark, name="txn_t"):
    register_views(spark, SF_DIR)
    ch_sql(
        spark,
        f"CREATE TABLE {name} AS SELECT n_nationkey AS k FROM nation "
        "WHERE n_regionkey = 0",
    )


def _count(spark, name="txn_t"):
    return ch_sql(spark, f"SELECT count(*) AS n FROM {name}").collect()[0][0]


def test_rollback_restores_and_commit_keeps(spark):
    _mk(spark)
    assert _count(spark) == 5
    ch_sql(spark, "BEGIN TRANSACTION")
    ch_sql(spark, "INSERT INTO txn_t VALUES (100), (101)")
    assert _count(spark) == 7  # read-your-writes inside the transaction
    ch_sql(spark, "ROLLBACK")
    assert _count(spark) == 5
    ch_sql(spark, "BEGIN")
    ch_sql(spark, "INSERT INTO txn_t VALUES (200)")
    ch_sql(spark, "COMMIT")
    assert _count(spark) == 6


def test_rollback_undoes_create_and_drop(spark):
    _mk(spark)
    ch_sql(spark, "BEGIN")
    ch_sql(spark, "CREATE TABLE txn_new AS SELECT 1 AS x")
    ch_sql(spark, "DROP TABLE txn_t")
    ch_sql(spark, "ROLLBACK")
    assert _count(spark) == 5  # DROP undone
    with pytest.raises(Exception):  # CREATE undone
        spark.table("txn_new")


def test_first_snapshot_wins_across_multiple_writes(spark):
    _mk(spark)
    ch_sql(spark, "BEGIN")
    ch_sql(spark, "INSERT INTO txn_t VALUES (1)")
    ch_sql(spark, "INSERT INTO txn_t VALUES (2)")
    ch_sql(spark, "ROLLBACK")
    assert _count(spark) == 5  # back to transaction start, not mid-state


def test_show_statements_and_errors(spark):
    _mk(spark)
    with pytest.raises(TransactionError, match="INVALID_TRANSACTION"):
        ch_sql(spark, "COMMIT")
    with pytest.raises(TransactionError, match="INVALID_TRANSACTION"):
        ch_sql(spark, "ROLLBACK")
    ch_sql(spark, "BEGIN")
    with pytest.raises(TransactionError, match="already active"):
        ch_sql(spark, "BEGIN")
    ch_sql(spark, "INSERT INTO txn_t VALUES (7)")
    ch_sql(spark, "SELECT count(*) FROM txn_t").collect()
    rows = ch_sql(spark, "SHOW STATEMENTS").collect()
    stmts = [r[1] for r in rows]
    assert any(s.startswith("INSERT INTO txn_t") for s in stmts)
    assert any(s.startswith("SELECT count(*)") for s in stmts)
    ch_sql(spark, "ROLLBACK")


def test_rollback_restores_partition_ttl_projection_metadata(spark):
    """ADVICE r6 (low): BEGIN; DROP TABLE t; ROLLBACK used to restore only
    the view/engine/replacing-keys — PARTITION BY, TTL and projections
    vanished, so ALTER ... DROP PARTITION failed afterwards."""
    from byconity_spark.engine.projections import projections
    from byconity_spark.frontend.sql import (
        _SESSION_TABLE_PARTITIONS,
        _SESSION_TABLE_TTLS,
    )

    register_views(spark, SF_DIR)
    try:
        ch_sql(
            spark,
            "CREATE TABLE txn_pt ENGINE = MergeTree "
            "PARTITION BY n_regionkey ORDER BY n_nationkey "
            "AS SELECT * FROM nation",
        )
        ch_sql(
            spark, "ALTER TABLE txn_pt MODIFY TTL n_nationkey + 1000000"
        )
        ch_sql(
            spark,
            "ALTER TABLE txn_pt ADD PROJECTION pr ("
            "SELECT n_regionkey, count(n_nationkey) AS n "
            "GROUP BY n_regionkey)",
        )
        ch_sql(spark, "BEGIN TRANSACTION")
        ch_sql(spark, "DROP TABLE txn_pt")
        assert "txn_pt" not in _SESSION_TABLE_PARTITIONS
        ch_sql(spark, "ROLLBACK")
        assert _SESSION_TABLE_PARTITIONS.get("txn_pt") == "n_regionkey"
        assert _SESSION_TABLE_TTLS.get("txn_pt") == "n_nationkey + 1000000"
        assert "pr" in projections._by_table.get("txn_pt", {})
        ch_sql(spark, "ALTER TABLE txn_pt DROP PARTITION 0")
        assert (
            ch_sql(spark, "SELECT count(*) AS n FROM txn_pt").collect()[0][0]
            == 20
        )
    finally:
        projections.clear()
        ch_sql(spark, "DROP TABLE IF EXISTS txn_pt")
