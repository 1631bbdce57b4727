"""Star Schema Benchmark flight (reference
/root/reference/tests/optimizers/ssb/ — 13 golden-plan queries the
reference's CBO is regression-tested against;
gtest_plan_check_ssb1000.cpp).  SSB derives from TPC-H, so the four
flight shapes map directly onto the driver's star schema: Q1 =
restrictive scan-aggregate, Q2 = dim joins + grouped revenue, Q3 =
multi-dim group over time, Q4 = profit drill-down.  One query per
flight; the plan shapes (pushed filters, broadcast dims, partial aggs)
are the same properties the reference's golden plans pin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from byconity_spark.engine.catalog import load_table
from byconity_spark.workloads import register


def _t(spark: SparkSession, sf: str, name: str) -> DataFrame:
    return load_table(spark, sf, name)


# ------------------------------------------------- flight 1: scan-agg
@register(
    "ssb_q1_revenue_filter",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue
    FROM lineitem
    WHERE l_shipdate >= DATE '1994-01-01' AND l_shipdate < DATE '1995-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 25
    """,
)
def ssb_q1_revenue_filter(spark: SparkSession, sf: str) -> DataFrame:
    li = _t(spark, sf, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1994-01-01").cast("date"))
            & (F.col("l_shipdate") < F.lit("1995-01-01").cast("date"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 25)
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4
            ).alias("revenue")
        )
    )


# ------------------------------------- flight 2: dim joins + grouping
@register(
    "ssb_q2_brand_revenue",
    oracle="""
    SELECT year(o.o_orderdate) AS yr, p.p_brand AS brand,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE p.p_size < 15 AND n.n_regionkey = 1
    GROUP BY 1, 2
    """,
)
def ssb_q2_brand_revenue(spark: SparkSession, sf: str) -> DataFrame:
    li = _t(spark, sf, "lineitem")
    o = _t(spark, sf, "orders")
    p = _t(spark, sf, "part").filter(F.col("p_size") < 15)
    s = _t(spark, sf, "supplier")
    n = F.broadcast(_t(spark, sf, "nation").filter(F.col("n_regionkey") == 1))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.year("o_orderdate").alias("yr"), F.col("p_brand").alias("brand")
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
    )


# ----------------------------------- flight 3: multi-dim group over time
@register(
    "ssb_q3_nation_flows",
    oracle="""
    SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
           year(o.o_orderdate) AS yr,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation cn ON c.c_nationkey = cn.n_nationkey
    JOIN nation sn ON s.s_nationkey = sn.n_nationkey
    WHERE cn.n_regionkey = 2 AND sn.n_regionkey = 2
      AND o.o_orderdate >= DATE '1995-01-01'
    GROUP BY 1, 2, 3
    """,
)
def ssb_q3_nation_flows(spark: SparkSession, sf: str) -> DataFrame:
    li = _t(spark, sf, "lineitem")
    o = _t(spark, sf, "orders").filter(
        F.col("o_orderdate") >= F.lit("1995-01-01").cast("date")
    )
    c = _t(spark, sf, "customer")
    s = _t(spark, sf, "supplier")
    nat = _t(spark, sf, "nation").filter(F.col("n_regionkey") == 2)
    cn = F.broadcast(nat.select(
        F.col("n_nationkey").alias("cnk"), F.col("n_name").alias("cust_nation")
    ))
    sn = F.broadcast(nat.select(
        F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation")
    ))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(cn, c.c_nationkey == F.col("cnk"))
        .join(sn, s.s_nationkey == F.col("snk"))
        .groupBy("cust_nation", "supp_nation", F.year("o_orderdate").alias("yr"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
    )


# ------------------------------------------- flight 4: profit drill-down
@register(
    "ssb_q4_profit_drilldown",
    oracle="""
    SELECT year(o.o_orderdate) AS yr, n.n_name AS nation,
           round(sum(l.l_extendedprice * (1 - l.l_discount)
                     - p.p_retailprice * l.l_quantity * 0.1), 4) AS profit
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY 1, 2
    """,
)
def ssb_q4_profit_drilldown(spark: SparkSession, sf: str) -> DataFrame:
    li = _t(spark, sf, "lineitem")
    o = _t(spark, sf, "orders")
    p = _t(spark, sf, "part")
    s = _t(spark, sf, "supplier")
    n = F.broadcast(_t(spark, sf, "nation"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .groupBy(F.year("o_orderdate").alias("yr"), F.col("n_name").alias("nation"))
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    - F.col("p_retailprice") * F.col("l_quantity") * 0.1
                ),
                4,
            ).alias("profit")
        )
    )
