"""Registered correctness queries for the custom relational operators —
the ByConity surface Spark lacks as primitives, each checked against a
DuckDB oracle at sf0.01.

Operator → reference mapping:
  * ASOF JOIN        — src/Interpreters/RowRefs.h:210 (AsofRowRefs)
  * ANY JOIN         — src/Parsers/ASTTablesInSelectQuery.h:127
  * LIMIT n BY k     — src/QueryPlan/LimitByStep.h:23
  * WITH TOTALS      — src/QueryPlan/TotalsHavingStep.h:29
  * ORDER BY WITH FILL — src/QueryPlan/FillingStep.h:24
  * LIMIT WITH TIES  — src/QueryPlan/LimitStep.h:25
  * x <op> ALL/ANY (sub) — src/QueryPlan/ApplyStep.h:25 QUANTIFIED_COMPARISON

Determinism notes: every query pins ties (explicit tiebreak orderings,
deduped ASOF right side) so the value-hash compare is stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from byconity_spark.engine.catalog import load_table
from byconity_spark.operators.aggregates import limit_by, with_totals
from byconity_spark.operators.joins import any_join, asof_join, quantified_compare
from byconity_spark.operators.sorts import fill_time_series, limit_with_ties
from byconity_spark.workloads import register


def _t(spark: SparkSession, sf: str, name: str) -> DataFrame:
    return load_table(spark, sf, name)


# --------------------------------------------------------------------------
# ASOF JOIN: each purchase event matched to the user's latest click at or
# before the purchase timestamp.  Right side deduped to one row per
# (user_id, ts) so the picked match is deterministic on both engines.
# --------------------------------------------------------------------------
@register(
    "op_asof_purchase_prior_click",
    oracle="""
    WITH p AS (
      SELECT event_id AS purchase_id, user_id,
             CAST(ts AS TIMESTAMP) AS purchase_ts
      FROM events WHERE event_type = 'purchase'
    ),
    c AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS click_ts, max(event_id) AS click_id
      FROM events WHERE event_type = 'click' GROUP BY user_id, CAST(ts AS TIMESTAMP)
    )
    SELECT p.purchase_id, p.user_id, p.purchase_ts, c.click_id, c.click_ts
    FROM p ASOF LEFT JOIN c
      ON p.user_id = c.user_id AND p.purchase_ts >= c.click_ts
    """,
)
def op_asof_purchase_prior_click(spark: SparkSession, sf: str) -> DataFrame:
    ev = _t(spark, sf, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("purchase_ts")
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
    )
    joined = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_time="purchase_ts",
        right_time="ts",
        direction="backward",
        allow_exact_matches=True,
    )
    return joined.select(
        "purchase_id",
        "user_id",
        "purchase_ts",
        "click_id",
        F.col("__matched_ts").alias("click_ts"),
    )


# --------------------------------------------------------------------------
# ANY LEFT JOIN: each BUILDING-segment customer with their FIRST order
# (earliest o_orderdate, orderkey tiebreak) — ClickHouse ANY strictness
# made deterministic via the prefer ordering.
# --------------------------------------------------------------------------
@register(
    "op_any_join_first_order",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           o.o_orderkey AS first_orderkey,
           CAST(o.o_orderdate AS DATE) AS first_orderdate,
           o.o_totalprice AS first_totalprice
    FROM customer c
    LEFT JOIN (
      SELECT * FROM (
        SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey) AS rn
        FROM orders
      ) WHERE rn = 1
    ) o ON c.c_custkey = o.o_custkey
    WHERE c.c_mktsegment = 'BUILDING'
    """,
)
def op_any_join_first_order(spark: SparkSession, sf: str) -> DataFrame:
    cust = _t(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf, "orders").select(
        F.col("o_custkey").alias("c_custkey"), "o_orderkey", "o_orderdate", "o_totalprice"
    )
    joined = any_join(
        cust,
        orders,
        on="c_custkey",
        how="left",
        prefer=[F.col("o_orderdate").asc(), F.col("o_orderkey").asc()],
    )
    return joined.select(
        "c_custkey",
        "c_name",
        F.col("o_orderkey").alias("first_orderkey"),
        F.col("o_orderdate").cast("date").alias("first_orderdate"),
        F.col("o_totalprice").alias("first_totalprice"),
    )


# --------------------------------------------------------------------------
# LIMIT 3 BY c_mktsegment: top-3 customers by balance per segment.
# Catalyst rewrites the row_number filter into a partial group-limit below
# the shuffle (InferWindowGroupLimit — same rewrite as ByConity's
# FilterWindowToPartitionTopN.h).
# --------------------------------------------------------------------------
@register(
    "op_limit_by_segment_top3",
    oracle="""
    SELECT c_mktsegment, c_custkey, c_name, c_acctbal
    FROM customer
    QUALIFY row_number() OVER (PARTITION BY c_mktsegment
                               ORDER BY c_acctbal DESC, c_custkey) <= 3
    """,
)
def op_limit_by_segment_top3(spark: SparkSession, sf: str) -> DataFrame:
    cust = _t(spark, sf, "customer")
    return limit_by(
        cust,
        keys=["c_mktsegment"],
        order=[F.col("c_acctbal").desc(), F.col("c_custkey").asc()],
        n=3,
    ).select("c_mktsegment", "c_custkey", "c_name", "c_acctbal")


# --------------------------------------------------------------------------
# GROUP BY ... WITH TOTALS: grouped rows plus the grand-total row, computed
# in ONE aggregation pass via rollup + grouping_id (no second scan).
# --------------------------------------------------------------------------
@register(
    "op_with_totals_returnflag",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           sum(l_quantity) AS sum_qty,
           count(*)        AS n_rows
    FROM lineitem
    WHERE l_shipdate <= DATE '1998-09-02'
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), ())
    """,
)
def op_with_totals_returnflag(spark: SparkSession, sf: str) -> DataFrame:
    li = _t(spark, sf, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("date")
    )
    return with_totals(
        li,
        keys=["l_returnflag", "l_linestatus"],
        aggs=[F.sum("l_quantity").alias("sum_qty"), F.count(F.lit(1)).alias("n_rows")],
    )


# --------------------------------------------------------------------------
# ORDER BY hour WITH FILL STEP 1 HOUR: densify the hourly purchase-count
# series — gap hours appear with n_events = 0.  The spine is generated
# distributively from the 1-row bounds aggregate (F.sequence + explode).
# --------------------------------------------------------------------------
@register(
    "op_fill_hourly_purchases",
    oracle="""
    WITH hourly AS (
      SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour, count(*) AS n_events
      FROM events
      WHERE event_type = 'purchase' AND ts < TIMESTAMP '2024-01-08 00:00:00'
      GROUP BY 1
    )
    SELECT s.hour, coalesce(h.n_events, 0) AS n_events
    FROM (SELECT unnest(generate_series((SELECT min(hour) FROM hourly),
                                        (SELECT max(hour) FROM hourly),
                                        INTERVAL 1 HOUR)) AS hour) s
    LEFT JOIN hourly h ON s.hour = h.hour
    """,
)
def op_fill_hourly_purchases(spark: SparkSession, sf: str) -> DataFrame:
    ev = _t(spark, sf, "events")
    hourly = (
        ev.filter(
            (F.col("event_type") == "purchase")
            & (F.col("ts") < F.lit("2024-01-08 00:00:00").cast("timestamp"))
        )
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("hour"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    return fill_time_series(
        hourly, "hour", step_expr="interval 1 hour", fill_values={"n_events": 0}
    )


# --------------------------------------------------------------------------
# LIMIT 10 WITH TIES on l_quantity (integer-valued → real tie groups; the
# result keeps every peer of the 10th row).
# --------------------------------------------------------------------------
@register(
    "op_limit_ties_quantity",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    WHERE l_returnflag = 'A' AND l_shipdate >= DATE '1998-06-01'
    QUALIFY rank() OVER (ORDER BY l_quantity DESC) <= 10
    """,
)
def op_limit_ties_quantity(spark: SparkSession, sf: str) -> DataFrame:
    li = _t(spark, sf, "lineitem").filter(
        (F.col("l_returnflag") == "A")
        & (F.col("l_shipdate") >= F.lit("1998-06-01").cast("date"))
    )
    return limit_with_ties(
        li.select("l_orderkey", "l_linenumber", "l_quantity"),
        order=[(F.col("l_quantity"), False)],
        n=10,
    )


# --------------------------------------------------------------------------
# Quantified comparisons: x > ALL (sub) and x < ANY (sub) — rewritten to a
# broadcast scalar aggregate (ByConity RemoveApply.h decorrelation).
# --------------------------------------------------------------------------
@register(
    "op_quantified_above_all",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer
    WHERE c_acctbal > ALL (SELECT s_acctbal FROM supplier WHERE s_nationkey < 5)
    """,
)
def op_quantified_above_all(spark: SparkSession, sf: str) -> DataFrame:
    cust = _t(spark, sf, "customer")
    sup = _t(spark, sf, "supplier").filter(F.col("s_nationkey") < 5).select("s_acctbal")
    return quantified_compare(
        cust, F.col("c_acctbal"), sup, "s_acctbal", ">", "ALL"
    ).select("c_custkey", "c_name", "c_acctbal")


@register(
    "op_quantified_below_any",
    oracle="""
    SELECT s_suppkey, s_name, s_acctbal
    FROM supplier
    WHERE s_acctbal < ANY (SELECT c_acctbal FROM customer WHERE c_mktsegment = 'MACHINERY')
    """,
)
def op_quantified_below_any(spark: SparkSession, sf: str) -> DataFrame:
    sup = _t(spark, sf, "supplier")
    cust = (
        _t(spark, sf, "customer")
        .filter(F.col("c_mktsegment") == "MACHINERY")
        .select("c_acctbal")
    )
    return quantified_compare(
        sup, F.col("s_acctbal"), cust, "c_acctbal", "<", "ANY"
    ).select("s_suppkey", "s_name", "s_acctbal")


# --------------------------------------------------------------------------
# CBO join reorder: the SQL lists lineitem FIRST, but with ANALYZE-collected
# statistics + spark.sql.cbo.joinReorder the optimizer builds
# (customer ⋈ nation) ⋈ orders ⋈ lineitem — smallest inputs first
# (reference src/Optimizer/CardinalityEstimate/CardinalityEstimator.h,
# src/Statistics/StatisticsCollector.h). tests/test_plan_contracts.py
# asserts the reorder on the optimized plan.
# --------------------------------------------------------------------------
@register(
    "cbo_join_reorder",
    oracle="""
    SELECT n_name, count(*) AS n, sum(l_quantity) AS qty
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def cbo_join_reorder(spark: SparkSession, sf: str) -> DataFrame:
    from byconity_spark.engine.stats import register_stats_tables

    # rowcount-only ANALYZE: enough for the reorder decision (probe-verified)
    # and skips four per-column NDV scans on the per-round driver run
    register_stats_tables(
        spark, sf, ["lineitem", "orders", "customer", "nation"], column_stats=False
    )
    return spark.sql(
        """
        SELECT n_name, count(*) AS n, sum(l_quantity) AS qty
        FROM cbo_lineitem
        JOIN cbo_orders   ON l_orderkey = o_orderkey
        JOIN cbo_customer ON o_custkey = c_custkey
        JOIN cbo_nation   ON c_nationkey = n_nationkey
        GROUP BY n_name
        """
    )


# --------------------------------------------------------------------------
# Stats-driven broadcast: ANALYZE sidecar estimates a filtered dim frame,
# the SetJoinDistribution analogue hints broadcast, the plan is asserted.
# (reference src/Statistics/AutoStatisticsManager.h, CardinalityEstimate/*,
# Rule/Implementation/SetJoinDistribution.h)
# --------------------------------------------------------------------------
@register(
    "cbo_stats_broadcast",
    oracle="""
    SELECT c.c_mktsegment,
           count(*) AS n,
           CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_acctbal > 9000
    GROUP BY c.c_mktsegment
    """,
)
def cbo_stats_broadcast(spark: SparkSession, sf: str) -> DataFrame:
    from byconity_spark.engine.stats import (
        analyze_table,
        broadcast_if_small,
        estimate_rows,
    )

    stats = analyze_table(spark, sf, "customer")
    cust = _t(spark, sf, "customer").filter(F.col("c_acctbal") > 9000)
    est = estimate_rows(stats, [("c_acctbal", ">", 9000)])
    cust = broadcast_if_small(
        cust, est, stats.avg_row_bytes(_t(spark, sf, "customer").schema)
    )
    o = _t(spark, sf, "orders")
    joined = o.join(cust, o.o_custkey == cust.c_custkey)
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,4)")).cast("double").alias("total"),
    )


# --------------------------------------------------------------------------
# Deterministic keyed SAMPLE (the reference's SAMPLE k OFFSET m semantics:
# a fixed slice of the sampling key's hash space, reproducible across runs
# and engines — unlike TABLESAMPLE's RNG).  Upgrades the §2.6 SAMPLE row
# from rows-only to exact-oracle: the md5 bucket is portable, so DuckDB
# selects the identical row set.
# --------------------------------------------------------------------------
@register(
    "op_sample_keyed",
    oracle="""
    WITH sampled AS (
      SELECT * FROM lineitem
      WHERE ('0x' || substring(md5(CAST(l_orderkey AS VARCHAR)), 1, 8))::BIGINT
                 % 1000000 BETWEEN 200000 AND 299999
    )
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
           round(sum(l_extendedprice), 2) AS total
    FROM sampled GROUP BY l_returnflag
    """,
)
def op_sample_keyed(spark: SparkSession, sf: str) -> DataFrame:
    """SAMPLE 1/10 OFFSET 2/10 over the l_orderkey sampling key."""
    from byconity_spark.operators.sorts import keyed_sample

    li = _t(spark, sf, "lineitem")
    sampled = keyed_sample(li, F.col("l_orderkey"), fraction=0.1, offset=0.2)
    return sampled.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.round(F.sum("l_extendedprice"), 2).alias("total"),
    )
