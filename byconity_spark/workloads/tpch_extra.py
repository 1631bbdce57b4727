"""TPC-H-shaped queries covering the relational gaps: EXISTS/NOT EXISTS
(semi/anti joins incl. non-equi conditions), outer joins, correlated and
uncorrelated scalar subqueries, disjunctive predicates.

Adapted to the driver's trimmed star schema (no partsupp/commitdate/phone —
shapes preserved, columns substituted).  Reference shapes:
/root/reference/tests/optimizers/tpch/ q4/q7/q13/q17/q19/q21/q22; Apply
decorrelation — src/Optimizer/Rewriter/RemoveApply.h (we express the
decorrelated plan directly; Catalyst handles the rest).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from byconity_spark.engine.catalog import load_table
from byconity_spark.workloads import register


def _t(spark: SparkSession, sf: str, name: str) -> DataFrame:
    return load_table(spark, sf, name)


# ------------------------------------------------------- q4: EXISTS (semi)
@register(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= DATE '1997-01-01' AND o.o_orderdate < DATE '1997-04-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf: str) -> DataFrame:
    o = _t(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("date"))
    )
    l = _t(spark, sf, "lineitem")
    kept = o.join(
        l,
        (o.o_orderkey == l.l_orderkey) & (l.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return kept.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n_orders"))


# ------------------------------------------- q7: two-nation shipping flows
@register(
    "q7_volume_shipping",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           year(l.l_shipdate) AS l_year,
           sum(l.l_extendedprice * (1 - l.l_discount)) AS revenue
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l.l_shipdate BETWEEN DATE '1996-01-01' AND DATE '1997-12-31'
    GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)
    """,
)
def q7_volume_shipping(spark: SparkSession, sf: str) -> DataFrame:
    # Plan note: filter both nation dims to the TWO names BEFORE the joins
    # (reference golden plan tests/optimizers/tpch/q7 pushes the disjunction
    # into each nation scan).  The 2-row broadcasts prune supplier/customer
    # immediately, and AQE runtime filters on s_suppkey/o_custkey then prune
    # lineitem/orders early — at 100× scale this joins ~8% of lineitem
    # instead of all of it.  Only the symmetric-pair condition (which needs
    # both sides) stays post-join.
    pair = ["NATION_1", "NATION_2"]
    l = _t(spark, sf, "lineitem").filter(
        F.col("l_shipdate").between("1996-01-01", "1997-12-31")
    )
    o = _t(spark, sf, "orders")
    n1 = (
        _t(spark, sf, "nation")
        .filter(F.col("n_name").isin(pair))
        .select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    )
    n2 = (
        _t(spark, sf, "nation")
        .filter(F.col("n_name").isin(pair))
        .select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    )
    s = _t(spark, sf, "supplier").join(
        F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk")
    )
    c = _t(spark, sf, "customer").join(
        F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk")
    )
    j = (
        l.join(s, l.l_suppkey == s.s_suppkey)
        .join(o, o.o_orderkey == l.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        j.groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year"))
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
        )
    )


# ---------------------------------- q13: outer join + count distribution
@register(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c
      LEFT OUTER JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    ) GROUP BY c_count
    """,
)
def q13_customer_distribution(spark: SparkSession, sf: str) -> DataFrame:
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "1-URGENT"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# ------------------------- q17: correlated scalar subquery (decorrelated)
@register(
    "q17_small_quantity_revenue",
    oracle="""
    WITH pa AS (SELECT l_partkey, 0.5 * avg(l_quantity) AS half_avg
                FROM lineitem GROUP BY l_partkey)
    SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly,
           count(*) AS n_small
    FROM lineitem l
    JOIN pa ON l.l_partkey = pa.l_partkey
    JOIN part p ON p.p_partkey = l.l_partkey AND p.p_size <= 10
    WHERE l.l_quantity < pa.half_avg
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf: str) -> DataFrame:
    l = _t(spark, sf, "lineitem")
    p = _t(spark, sf, "part").filter(F.col("p_size") <= 10)
    pa = l.groupBy(F.col("l_partkey").alias("pa_partkey")).agg(
        (0.5 * F.avg("l_quantity")).alias("half_avg")
    )
    return (
        l.join(pa, l.l_partkey == F.col("pa_partkey"))
        .join(p, p.p_partkey == l.l_partkey)
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .agg(
            # round(2): canonical TPC-H Q17 output precision — at sf>=0.1
            # the sum reaches ~1e9 where round(6) sits below the ulp of a
            # double under cross-engine summation order
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_small"),
        )
    )


# --------------------------------------- q19: disjunctive join predicates
@register(
    "q19_disjunctive_revenue",
    oracle="""
    SELECT CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           count(*) AS n
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_size BETWEEN 1 AND 10  AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_size BETWEEN 11 AND 25 AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_size > 25 AND l.l_quantity > 25)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf: str) -> DataFrame:
    l = _t(spark, sf, "lineitem")
    p = _t(spark, sf, "part")
    q, sz = F.col("l_quantity"), F.col("p_size")
    cond = (
        (sz.between(1, 10) & q.between(1, 20))
        | (sz.between(11, 25) & q.between(10, 30))
        | ((sz > 25) & (q > 25))
    )
    return (
        l.join(p, p.p_partkey == l.l_partkey)
        .filter(cond)
        .agg(
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)"))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


# -------------------- q21: correlated EXISTS + NOT EXISTS (semi + anti)
@register(
    "q21_waiting_supplier",
    oracle="""
    SELECT s.s_name, count(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey AND o.o_orderstatus = 'F'
    WHERE l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s.s_name
    """,
)
def q21_waiting_supplier(spark: SparkSession, sf: str) -> DataFrame:
    s = _t(spark, sf, "supplier")
    li = _t(spark, sf, "lineitem")
    o = _t(spark, sf, "orders").filter(F.col("o_orderstatus") == "F")
    l1 = li.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_suppkey"
    )
    l2 = li.select(
        F.col("l_orderkey").alias("x_orderkey"), F.col("l_suppkey").alias("x_suppkey")
    )
    l3 = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("y_orderkey"), F.col("l_suppkey").alias("y_suppkey")
    )
    base = l1.join(o, l1.l_orderkey == o.o_orderkey).select("l_orderkey", "l_suppkey")
    kept = base.join(
        l2,
        (F.col("l_orderkey") == F.col("x_orderkey"))
        & (F.col("l_suppkey") != F.col("x_suppkey")),
        "left_semi",
    ).join(
        l3,
        (F.col("l_orderkey") == F.col("y_orderkey"))
        & (F.col("l_suppkey") != F.col("y_suppkey")),
        "left_anti",
    )
    return (
        kept.join(s, F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


# ------------- q22: scalar subquery + NOT EXISTS + expression grouping
@register(
    "q22_global_sales_opportunity",
    oracle="""
    WITH avg_bal AS (SELECT avg(c_acctbal) AS ab FROM customer WHERE c_acctbal > 0.0)
    SELECT CAST(c_custkey % 10 AS VARCHAR) AS cntrycode,
           count(*)        AS numcust,
           sum(c_acctbal)  AS totacctbal
    FROM customer, avg_bal
    WHERE c_acctbal > ab
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c_custkey)
    GROUP BY 1
    """,
)
def q22_global_sales_opportunity(spark: SparkSession, sf: str) -> DataFrame:
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(F.avg("c_acctbal").alias("ab"))
    eligible = (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
    )
    return (
        eligible.groupBy((F.col("c_custkey") % 10).cast("string").alias("cntrycode"))
        .agg(F.count(F.lit(1)).alias("numcust"), F.sum("c_acctbal").alias("totacctbal"))
    )


# --- q2-shape: correlated min over a join (min-cost supplier, adapted:
# no partsupp -> suppliers linked through lineitem, cost = s_acctbal)
@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH ps AS (
      SELECT DISTINCT l.l_partkey AS partkey, s.s_suppkey, s.s_name, s.s_acctbal
      FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
    ),
    mins AS (SELECT partkey, min(s_acctbal) AS min_bal FROM ps GROUP BY partkey)
    SELECT p.p_partkey, p.p_name, ps.s_name, ps.s_acctbal
    FROM part p
    JOIN ps ON ps.partkey = p.p_partkey
    JOIN mins ON mins.partkey = ps.partkey AND ps.s_acctbal = mins.min_bal
    WHERE p.p_size < 5
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf: str) -> DataFrame:
    l = _t(spark, sf, "lineitem")
    s = _t(spark, sf, "supplier")
    p = _t(spark, sf, "part").filter(F.col("p_size") < 5)
    ps = (
        l.join(s, s.s_suppkey == l.l_suppkey)
        .select(F.col("l_partkey").alias("partkey"), "s_suppkey", "s_name", "s_acctbal")
        .distinct()
    )
    mins = ps.groupBy("partkey").agg(F.min("s_acctbal").alias("min_bal"))
    return (
        p.join(ps, ps.partkey == p.p_partkey)
        .join(mins, (mins.partkey == ps.partkey) & (ps.s_acctbal == mins.min_bal))
        .select("p_partkey", "p_name", "s_name", "s_acctbal")
    )


# ------- q12: dual conditional aggregation (shipmode absent -> priority)
@register(
    "q12_priority_shipping",
    oracle="""
    SELECT year(l.l_shipdate) AS ship_year,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= DATE '1996-01-01' AND l.l_shipdate < DATE '1998-01-01'
    GROUP BY year(l.l_shipdate)
    """,
)
def q12_priority_shipping(spark: SparkSession, sf: str) -> DataFrame:
    o = _t(spark, sf, "orders")
    l = _t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("date"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy(F.year("l_shipdate").cast("long").alias("ship_year"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# ------------------ q16: NOT IN subquery (anti join) + count distinct
@register(
    "q16_supplier_part_counts",
    oracle="""
    SELECT p.p_brand, p.p_size, count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_type NOT LIKE 'PROMO%'
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                              WHERE s_name LIKE '%7%')
    GROUP BY p.p_brand, p.p_size
    """,
)
def q16_supplier_part_counts(spark: SparkSession, sf: str) -> DataFrame:
    l = _t(spark, sf, "lineitem")
    p = _t(spark, sf, "part").filter(~F.col("p_type").like("PROMO%"))
    bad_supp = (
        _t(spark, sf, "supplier")
        .filter(F.col("s_name").like("%7%"))
        .select("s_suppkey")
    )
    return (
        l.join(bad_supp, l.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .join(p, p.p_partkey == l.l_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# ---------------- q20: IN subquery with HAVING (semi join on aggregate)
@register(
    "q20_bulk_suppliers",
    oracle="""
    SELECT s.s_name, s.s_acctbal
    FROM supplier s
    WHERE s.s_suppkey IN (
      SELECT l.l_suppkey
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_size < 15
        AND l.l_shipdate >= DATE '1997-01-01' AND l.l_shipdate < DATE '1998-01-01'
      GROUP BY l.l_suppkey HAVING sum(l.l_quantity) > 100
    )
    """,
)
def q20_bulk_suppliers(spark: SparkSession, sf: str) -> DataFrame:
    s = _t(spark, sf, "supplier")
    l = _t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("date"))
    )
    p = _t(spark, sf, "part").filter(F.col("p_size") < 15)
    bulk = (
        l.join(p, p.p_partkey == l.l_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 100)
        .select("l_suppkey")
    )
    return s.join(bulk, s.s_suppkey == bulk.l_suppkey, "left_semi").select(
        "s_name", "s_acctbal"
    )


# ------------------- q8: market share (conditional agg over join tree)
@register(
    "q8_market_share",
    oracle="""
    WITH flows AS (
      SELECT year(o.o_orderdate) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             n2.n_name AS supp_nation
      FROM lineitem l
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n1  ON n1.n_nationkey = c.c_nationkey
      JOIN region r   ON r.r_regionkey = n1.n_regionkey
      JOIN nation n2  ON n2.n_nationkey = s.s_nationkey
      WHERE r.r_name = 'EUROPE'
        AND o.o_orderdate BETWEEN DATE '1996-01-01' AND DATE '1997-12-31'
    )
    SELECT o_year,
           sum(CASE WHEN supp_nation = 'NATION_7' THEN volume ELSE 0 END)
             / sum(volume) AS mkt_share
    FROM flows GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf: str) -> DataFrame:
    l = _t(spark, sf, "lineitem")
    o = _t(spark, sf, "orders").filter(
        F.col("o_orderdate").between("1996-01-01", "1997-12-31")
    )
    c = _t(spark, sf, "customer")
    s = _t(spark, sf, "supplier")
    n1 = _t(spark, sf, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    n2 = _t(spark, sf, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    r = _t(spark, sf, "region").filter(F.col("r_name") == "EUROPE")
    flows = (
        l.join(o, o.o_orderkey == l.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(s, s.s_suppkey == l.l_suppkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(r), F.col("c_rk") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nk"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
            "supp_nation",
        )
    )
    return flows.groupBy("o_year").agg(
        (
            F.sum(F.when(F.col("supp_nation") == "NATION_7", F.col("volume")).otherwise(0.0))
            / F.sum("volume")
        ).alias("mkt_share")
    )


# -------------------- q9: profit by supplier nation and year (adapted:
# no partsupp table -> supply cost proxied from p_retailprice)
@register(
    "q9_product_profit",
    oracle="""
    SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
           sum(l.l_extendedprice * (1 - l.l_discount)
               - 0.6 * p.p_retailprice * l.l_quantity) AS profit
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%5%'
    GROUP BY n.n_name, year(o.o_orderdate)
    """,
)
def q9_product_profit(spark: SparkSession, sf: str) -> DataFrame:
    l = _t(spark, sf, "lineitem")
    p = _t(spark, sf, "part").filter(F.col("p_name").like("%5%"))
    s = _t(spark, sf, "supplier")
    o = _t(spark, sf, "orders")
    n = _t(spark, sf, "nation")
    return (
        l.join(p, p.p_partkey == l.l_partkey)
        .join(s, s.s_suppkey == l.l_suppkey)
        .join(o, o.o_orderkey == l.l_orderkey)
        .join(F.broadcast(n), n.n_nationkey == s.s_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
                - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
            ).alias("profit")
        )
    )


# --------------------------- q15: shared CTE (revenue view used twice)
@register(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey, sum(l_extendedprice * (1 - l_discount)) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_rev
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.l_suppkey
    WHERE r.total_rev = (SELECT max(total_rev) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf: str) -> DataFrame:
    l = _t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("date"))
    )
    s = _t(spark, sf, "supplier")
    # CTERef: materialize the shared subplan once (ByConity CTERefStep.h:34)
    revenue = (
        l.groupBy("l_suppkey")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_rev"))
        .cache()
    )
    max_rev = revenue.agg(F.max("total_rev").alias("mx"))
    return (
        revenue.crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_rev") == F.col("mx"))
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_rev")
    )


# ---------------- q11: important stock (scalar-subquery HAVING threshold)
@register(
    "q11_important_stock",
    oracle="""
    WITH val AS (
      SELECT l.l_partkey AS partkey,
             sum(l.l_extendedprice * l.l_quantity) AS part_value
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_7'
      GROUP BY l.l_partkey
    )
    SELECT partkey, part_value
    FROM val
    WHERE part_value > (SELECT sum(part_value) * 0.001 FROM val)
    """,
)
def q11_important_stock(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H q11 shape (partsupp absent -> lineitem stock value): per-part
    value for one nation's suppliers, HAVING above a scalar-subquery
    fraction of the nation total.  Ref tests/optimizers/tpch/q11; the
    shared subplan is the CTERef pattern (CTERefStep.h:34) — materialized
    once, threshold broadcast.  Scale: one shuffle on l_partkey; nation is
    a bounded broadcast dim; the threshold row is a 1-row broadcast."""
    l = _t(spark, sf, "lineitem")
    s = _t(spark, sf, "supplier")
    n = _t(spark, sf, "nation").filter(F.col("n_name") == "NATION_7")
    val = (
        l.join(s, s.s_suppkey == l.l_suppkey)
        .join(F.broadcast(n), n.n_nationkey == s.s_nationkey)
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(F.col("l_extendedprice") * F.col("l_quantity")).alias("part_value"))
        .cache()
    )
    thr = val.agg((F.sum("part_value") * F.lit(0.001)).alias("thr"))
    return (
        val.crossJoin(F.broadcast(thr))
        .filter(F.col("part_value") > F.col("thr"))
        .select("partkey", "part_value")
    )
