"""Row TTL applied at merge time (reference TTLDescription.h,
TTLBlockInputStream.h): CREATE TABLE ... TTL expr, ALTER MODIFY/REMOVE
TTL, sweep at OPTIMIZE ... FINAL with a pinnable clock."""

from __future__ import annotations

import pytest

from byconity_spark.engine.catalog import register_views
from byconity_spark.frontend import ch_sql
from byconity_spark.frontend.sql import _SESSION_TABLE_TTLS, _TTL_NOW
from tests.conftest import SF_DIR


@pytest.fixture(autouse=True)
def _clean(spark):
    _TTL_NOW[0] = None
    yield
    _TTL_NOW[0] = None
    ch_sql(spark, "DROP TABLE IF EXISTS ttl_t")


def test_ttl_sweep_at_optimize(spark):
    register_views(spark, SF_DIR)
    ch_sql(
        spark,
        "CREATE TABLE ttl_t TTL ts + INTERVAL 10 DAY AS "
        "SELECT event_id, ts FROM events",
    )
    assert _SESSION_TABLE_TTLS["ttl_t"] == "ts + INTERVAL 10 DAY"
    total = ch_sql(spark, "SELECT count(*) AS n FROM ttl_t").collect()[0][0]
    ch_sql(spark, "SET ttl_now = '2024-01-25 00:00:00'")
    out = ch_sql(spark, "OPTIMIZE TABLE ttl_t FINAL").collect()
    assert out[0][1] == "optimized_ttl"
    kept = ch_sql(spark, "SELECT count(*) AS n FROM ttl_t").collect()[0][0]
    want = ch_sql(
        spark,
        "SELECT count(*) AS n FROM events "
        "WHERE NOT (ts + INTERVAL 10 DAY <= toDateTime('2024-01-25 00:00:00'))",
    ).collect()[0][0]
    assert 0 < kept == want < total


def test_modify_and_remove_ttl(spark):
    register_views(spark, SF_DIR)
    ch_sql(spark, "CREATE TABLE ttl_t AS SELECT event_id, ts FROM events")
    assert "ttl_t" not in _SESSION_TABLE_TTLS
    ch_sql(spark, "ALTER TABLE ttl_t MODIFY TTL ts + INTERVAL 5 DAY")
    assert _SESSION_TABLE_TTLS["ttl_t"] == "ts + INTERVAL 5 DAY"
    assert ch_sql(
        spark, "ALTER TABLE ttl_t REMOVE TTL"
    ).collect()[0][1] == "ttl_removed"
    # without TTL, OPTIMIZE FINAL on a plain table is a noop
    assert ch_sql(
        spark, "OPTIMIZE TABLE ttl_t FINAL"
    ).collect()[0][1] == "noop"


def test_far_future_ttl_keeps_everything(spark):
    register_views(spark, SF_DIR)
    ch_sql(
        spark,
        "CREATE TABLE ttl_t TTL ts + INTERVAL 3650 DAY AS "
        "SELECT event_id, ts FROM events",
    )
    total = ch_sql(spark, "SELECT count(*) AS n FROM ttl_t").collect()[0][0]
    ch_sql(spark, "SET ttl_now = '2024-02-01 00:00:00'")
    ch_sql(spark, "OPTIMIZE TABLE ttl_t FINAL")
    assert (
        ch_sql(spark, "SELECT count(*) AS n FROM ttl_t").collect()[0][0]
        == total
    )
