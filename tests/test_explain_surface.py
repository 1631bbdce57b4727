"""EXPLAIN surface + plan-properties API (reference ASTExplainQuery.h)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from byconity_spark.engine.catalog import load_table, register_views
from byconity_spark.plans.explain import (
    PlanContractError,
    assert_plan,
    explain_ch,
    plan_properties,
)
from byconity_spark.workloads import all_queries
from tests.conftest import SF_DIR


def test_explain_kinds(spark):
    df = load_table(spark, SF_DIR, "nation").filter(F.col("n_nationkey") > 3)
    assert "Filter" in explain_ch(df, "PLAN")
    assert "WholeStageCodegen" in explain_ch(df, "PIPELINE")
    with pytest.raises(ValueError):
        explain_ch(df, "NOPE")


def test_plan_properties_pushdown(spark):
    q6 = all_queries()["q6_forecast_revenue"].builder(spark, SF_DIR)
    p = plan_properties(q6)
    assert any("l_shipdate" in f for f in p.pushed_filters)
    assert p.cartesian_products == 0
    # codegen ids materialize once the adaptive plan is final
    q6.collect()
    assert plan_properties(q6).codegen_stages > 0


def test_assert_plan_contract(spark):
    q3 = all_queries()["q3_shipping_priority"].builder(spark, SF_DIR)
    assert_plan(q3, no_cartesian=True)
    limit_by = all_queries()["op_limit_by_segment_top3"].builder(spark, SF_DIR)
    assert_plan(limit_by, requires_window_group_limit=True)


def test_assert_plan_fails_loudly(spark):
    from pyspark.sql import Window

    # an empty-partition-spec window = the classic single-partition sort
    li = load_table(spark, SF_DIR, "lineitem")
    bad = li.withColumn(
        "rn", F.row_number().over(Window.orderBy("l_orderkey"))
    )
    with pytest.raises(PlanContractError):
        assert_plan(bad, no_single_partition_exchange=True)


def test_explain_sql_surface(spark):
    register_views(spark, SF_DIR)
    from byconity_spark.frontend import ch_sql

    rows = ch_sql(
        spark, "EXPLAIN SELECT count() AS n FROM lineitem WHERE l_quantity > 40"
    ).collect()
    text = "\n".join(r.explain for r in rows)
    assert "PushedFilters" in text and "l_quantity" in text
    rows2 = ch_sql(spark, "EXPLAIN PIPELINE SELECT count() FROM nation").collect()
    assert any("WholeStageCodegen" in r.explain for r in rows2)
