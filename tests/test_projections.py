"""MergeTree projections + automatic aggregate rewrite (reference
ASTProjectionDeclaration.h, ProjectionsDescription.h,
optimizeUseAggregateProjection.cpp)."""

from __future__ import annotations

import pytest

from byconity_spark.engine.catalog import register_views
from byconity_spark.engine.projections import projections
from byconity_spark.frontend import ch_sql
from byconity_spark.frontend.sql import ChSqlError
from tests.conftest import SF_DIR


@pytest.fixture(autouse=True)
def _clean(spark):
    projections.clear()
    yield
    projections.clear()
    ch_sql(spark, "DROP TABLE IF EXISTS pj_t")


def _mk(spark):
    register_views(spark, SF_DIR)
    ch_sql(
        spark,
        "CREATE TABLE pj_t AS SELECT o_orderstatus, o_orderpriority, "
        "o_totalprice, o_custkey FROM orders",
    )
    ch_sql(
        spark,
        "ALTER TABLE pj_t ADD PROJECTION by_status ("
        "SELECT o_orderstatus, o_orderpriority, "
        "sum(o_totalprice) AS rev, count(o_custkey) AS n, "
        "avg(o_totalprice) AS avg_price "
        "GROUP BY o_orderstatus, o_orderpriority)",
    )


def _direct(spark, sql):
    """The same aggregate straight off the base table (no projections
    registered while computing)."""
    saved = dict(projections._by_table)
    projections._by_table.clear()
    try:
        return sorted(tuple(r) for r in ch_sql(spark, sql).collect())
    finally:
        projections._by_table.update(saved)


def test_rollup_rewrite_matches_direct(spark):
    _mk(spark)
    q = (
        "SELECT o_orderstatus, sum(o_totalprice) AS rev, "
        "count(o_custkey) AS n FROM pj_t GROUP BY o_orderstatus"
    )
    assert projections.try_rewrite(spark, q) is not None
    got = sorted(tuple(r) for r in ch_sql(spark, q).collect())
    want = _direct(spark, q)
    assert [(g[0], g[2]) for g in got] == [(w[0], w[2]) for w in want]
    for g, w in zip(got, want):  # sum-of-sums reorders float addition
        assert g[1] == pytest.approx(w[1])


def test_avg_and_where_over_dims(spark):
    _mk(spark)
    q = (
        "SELECT o_orderstatus, avg(o_totalprice) AS avg_price FROM pj_t "
        "WHERE o_orderpriority = '1-URGENT' GROUP BY o_orderstatus"
    )
    assert projections.try_rewrite(spark, q) is not None
    got = sorted(tuple(r) for r in ch_sql(spark, q).collect())
    want = _direct(spark, q)
    assert [g[0] for g in got] == [w[0] for w in want]
    for g, w in zip(got, want):
        assert g[1] == pytest.approx(w[1])


def test_non_dim_predicate_blocks_rewrite(spark):
    _mk(spark)
    q = (
        "SELECT o_orderstatus, sum(o_totalprice) AS rev FROM pj_t "
        "WHERE o_totalprice > 100 GROUP BY o_orderstatus"
    )
    assert projections.try_rewrite(spark, q) is None
    q2 = (
        "SELECT o_custkey, sum(o_totalprice) AS rev FROM pj_t "
        "GROUP BY o_custkey"
    )
    assert projections.try_rewrite(spark, q2) is None  # dim not projected


def test_stale_projection_refreshes_after_insert(spark):
    _mk(spark)
    q = (
        "SELECT o_orderstatus, count(o_custkey) AS n FROM pj_t "
        "GROUP BY o_orderstatus"
    )
    before = dict(
        (r[0], r[1]) for r in ch_sql(spark, q).collect()
    )
    ch_sql(
        spark,
        "INSERT INTO pj_t VALUES ('Z', '9-TEST', 1.0, 42)",
    )
    after = dict((r[0], r[1]) for r in ch_sql(spark, q).collect())
    assert after.get("Z") == 1 and sum(after.values()) == sum(
        before.values()
    ) + 1


def test_ddl_and_system_view(spark):
    _mk(spark)
    rows = ch_sql(
        spark, "SELECT table, name, dims FROM system.projections"
    ).collect()
    assert rows == [("pj_t", "by_status", "o_orderstatus,o_orderpriority")]
    out = ch_sql(
        spark, "ALTER TABLE pj_t MATERIALIZE PROJECTION by_status"
    ).collect()
    assert out[0][2] == "materialized"
    assert ch_sql(
        spark, "ALTER TABLE pj_t DROP PROJECTION by_status"
    ).collect()[0][2] == "dropped"
    with pytest.raises(ChSqlError):
        ch_sql(spark, "ALTER TABLE pj_t MATERIALIZE PROJECTION ghost")
