"""Workload advisor (engine/advisor.py) — reference src/Advisor rules:
column-usage extraction, order-by / partition-key / data-type / MV advises."""

from __future__ import annotations

import pytest

from byconity_spark.engine.advisor import (
    EQUALITY_PREDICATE,
    EQUI_JOIN,
    GROUP_BY,
    IN_PREDICATE,
    RANGE_PREDICATE,
    analyze_workload,
    column_usages,
)
from byconity_spark.engine.catalog import register_views
from byconity_spark.engine.stats import _STATS_REGISTRY
from byconity_spark.frontend import ch_sql
from tests.conftest import SF_DIR


@pytest.fixture(autouse=True)
def _clean():
    _STATS_REGISTRY.clear()
    yield
    _STATS_REGISTRY.clear()


def test_column_usage_extraction(spark):
    register_views(spark, SF_DIR)
    us = column_usages(
        spark,
        "SELECT c.c_mktsegment, count() FROM orders o "
        "JOIN customer c ON o.o_custkey = c.c_custkey "
        "WHERE o_orderdate >= '1995-01-01' AND o_orderstatus = 'F' "
        "AND c_mktsegment IN ('BUILDING', 'AUTOMOBILE') "
        "GROUP BY c.c_mktsegment",
    )
    assert (EQUI_JOIN, "orders", "o_custkey") in us
    assert (EQUI_JOIN, "customer", "c_custkey") in us
    assert (RANGE_PREDICATE, "orders", "o_orderdate") in us
    assert (EQUALITY_PREDICATE, "orders", "o_orderstatus") in us
    assert (IN_PREDICATE, "customer", "c_mktsegment") in us
    assert (GROUP_BY, "customer", "c_mktsegment") in us


def test_order_by_and_partition_key_advises(spark):
    register_views(spark, SF_DIR)
    w = [
        "SELECT count() FROM orders WHERE o_orderdate >= '1995-01-01'",
        "SELECT count() FROM orders WHERE o_orderdate >= '1996-01-01'",
        "SELECT count() FROM orders o JOIN customer c "
        "ON o.o_custkey = c.c_custkey",
    ]
    advises = analyze_workload(spark, w)
    ob = {a.table: a for a in advises if a.advisor == "OrderByKeyAdvisor"}
    assert ob["orders"].optimized_value == "o_orderdate"
    assert ob["orders"].benefit == 2
    # candidates carry (column, freq) ranked freq desc, name desc
    assert ob["orders"].candidates[0] == ("o_orderdate", 2)
    pk = {a.table: a for a in advises if a.advisor == "PartitionKeyAdvisor"}
    assert pk["orders"].optimized_value == "o_custkey"
    assert pk["customer"].optimized_value == "c_custkey"


def test_data_type_advises(spark):
    register_views(spark, SF_DIR)
    ch_sql(spark, "CREATE STATS nation (n_nationkey, n_name)")
    ch_sql(spark, "CREATE STATS orders (o_orderstatus)")
    advises = analyze_workload(
        spark,
        ["SELECT count() FROM nation WHERE n_nationkey = 3",
         "SELECT count() FROM orders WHERE o_orderstatus = 'F'"],
    )
    dt = {(a.table, a.column): a for a in advises
          if a.advisor == "DataTypeAdvisor"}
    # n_nationkey: 0..24 fits UInt8
    assert dt[("nation", "n_nationkey")].optimized_value == "UInt8"
    # n_name is ALL-DISTINCT (25/25) → the ndv+nulls==rows guard skips it,
    # exactly like DataTypeAdvise.cpp:121
    assert ("nation", "n_name") not in dt
    # o_orderstatus: 3 values over thousands of rows → LowCardinality
    assert dt[("orders", "o_orderstatus")].optimized_value == \
        "LowCardinality(String)"


def test_materialized_view_advise(spark):
    register_views(spark, SF_DIR)
    q = ("SELECT l_returnflag, sum(l_quantity) FROM lineitem "
         "GROUP BY l_returnflag")
    advises = analyze_workload(spark, [q, q, "SELECT count() FROM region"])
    mv = [a for a in advises if a.advisor == "MaterializedViewAdvisor"]
    assert len(mv) == 1
    assert mv[0].table == "lineitem"
    assert mv[0].benefit == 2
    assert "l_returnflag" in mv[0].optimized_value
    assert len(mv[0].related_queries) == 2


def test_no_mv_advise_for_single_occurrence(spark):
    register_views(spark, SF_DIR)
    advises = analyze_workload(
        spark,
        ["SELECT l_returnflag, sum(l_quantity) FROM lineitem "
         "GROUP BY l_returnflag"],
    )
    assert not [a for a in advises if a.advisor == "MaterializedViewAdvisor"]
