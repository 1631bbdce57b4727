"""Set operations, grouping-sets machinery, arrayJoin/explode, inline
Values, table functions, DISTINCT, theta joins, JOIN USING, semi/anti
counts, trivial count, SAMPLE.

Reference operators: UnionStep.h:23 / IntersectStep.h:21 / ExceptStep.h:21
(set ops), CubeStep.h:28 / RollupStep.h:27 + Expand (grouping sets),
ArrayJoinStep.h:26 (explode), ValuesStep.h:45, numbers table function
(src/TableFunctions/), DistinctStep.h:24, NestedLoopJoin.h:79 (theta),
JoinUsingToJoinOn.h, OptimizeTrivialCount.h, FinalSampleStep.h:29.
"""

from __future__ import annotations

from byconity_spark.engine.localdf import local_df as _local_df

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from byconity_spark.engine.catalog import load_table
from byconity_spark.plans.trivial_count import table_row_count
from byconity_spark.workloads import register


def _t(spark: SparkSession, sf: str, name: str) -> DataFrame:
    return load_table(spark, sf, name)


# ------------------------------------------------------------------ UNION
@register(
    "set_union_distinct",
    oracle="""
    SELECT o_custkey AS custkey FROM orders
    WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
    UNION
    SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 7000
    """,
)
def set_union_distinct(spark: SparkSession, sf: str) -> DataFrame:
    o = _t(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("date"))
    )
    c = _t(spark, sf, "customer").filter(F.col("c_acctbal") > 7000)
    return (
        o.select(F.col("o_custkey").alias("custkey"))
        .union(c.select(F.col("c_custkey").alias("custkey")))
        .distinct()
    )


# -------------------------------------------------------- INTERSECT ALL
@register(
    "set_intersect_all",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT ALL
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def set_intersect_all(spark: SparkSession, sf: str) -> DataFrame:
    o = _t(spark, sf, "orders")
    f_side = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    o_side = o.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    return f_side.intersectAll(o_side)


# ------------------------------------------------------------- EXCEPT
@register(
    "set_except_nonbuyers",
    oracle="""
    SELECT c_custkey AS custkey FROM customer
    EXCEPT
    SELECT o_custkey AS custkey FROM orders
    """,
)
def set_except_nonbuyers(spark: SparkSession, sf: str) -> DataFrame:
    c = _t(spark, sf, "customer").select(F.col("c_custkey").alias("custkey"))
    o = _t(spark, sf, "orders").select(F.col("o_custkey").alias("custkey"))
    return c.exceptAll(o).distinct()


# ----------------------------------------------------- ROLLUP and CUBE
@register(
    "rollup_revenue",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS gid,
           sum(l_extendedprice) AS sum_price,
           count(*)             AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_revenue(spark: SparkSession, sf: str) -> DataFrame:
    li = _t(spark, sf, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        (F.grouping("l_returnflag") * 2 + F.grouping("l_linestatus"))
        .cast("long")
        .alias("gid"),
        F.sum("l_extendedprice").alias("sum_price"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "cube_status_priority",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS gid,
           count(*) AS n, sum(o_totalprice) AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_status_priority(spark: SparkSession, sf: str) -> DataFrame:
    o = _t(spark, sf, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        (F.grouping("o_orderstatus") * 2 + F.grouping("o_orderpriority"))
        .cast("long")
        .alias("gid"),
        F.count(F.lit(1)).alias("n"),
        F.sum("o_totalprice").alias("total"),
    )


# ------------------------------------------------- arrayJoin / explode
@register(
    "explode_word_topk",
    oracle="""
    SELECT w AS word, count(*) AS n
    FROM (SELECT unnest(string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')) AS w
          FROM documents)
    GROUP BY w
    ORDER BY n DESC, word
    LIMIT 20
    """,
)
def explode_word_topk(spark: SparkSession, sf: str) -> DataFrame:
    d = _t(spark, sf, "documents")
    words = F.split(F.lower(F.trim(F.regexp_replace(F.col("text"), r"\s+", " "))), " ")
    return (
        d.select(F.explode(words).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(20)
    )


@register(
    "explode_outer_long_tokens",
    oracle="""
    SELECT d.doc_id, u.tok
    FROM (SELECT doc_id,
                 list_filter(string_split(text, ' '), w -> length(w) > 9) AS toks
          FROM documents WHERE doc_id < 30) d
    LEFT JOIN LATERAL (SELECT unnest(d.toks) AS tok) u ON true
    """,
)
def explode_outer_long_tokens(spark: SparkSession, sf: str) -> DataFrame:
    d = _t(spark, sf, "documents").filter(F.col("doc_id") < 30)
    toks = F.filter(F.split(F.col("text"), " "), lambda w: F.length(w) > 9)
    return d.select("doc_id", F.explode_outer(toks).alias("tok"))


# ------------------------------------------------------ Values inline
@register(
    "values_inline_join",
    oracle="""
    SELECT v.label, count(*) AS n
    FROM orders o
    JOIN (VALUES ('F', 'finished'), ('O', 'open'), ('P', 'pending'))
         AS v(code, label)
      ON o.o_orderstatus = v.code
    GROUP BY v.label
    """,
)
def values_inline_join(spark: SparkSession, sf: str) -> DataFrame:
    o = _t(spark, sf, "orders")
    v = _local_df(o.sparkSession, 
        [("F", "finished"), ("O", "open"), ("P", "pending")], "code string, label string"
    )
    return (
        o.join(F.broadcast(v), o.o_orderstatus == v.code)
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ------------------------------------------- numbers/range table function
@register(
    "numbers_range_agg",
    oracle="""
    SELECT count(*) AS n, CAST(sum(range) AS BIGINT) AS total, CAST(sum(range * range % 7) AS BIGINT) AS checksum
    FROM range(1, 100001)
    """,
)
def numbers_range_agg(spark: SparkSession, sf: str) -> DataFrame:
    r = spark.range(1, 100001)
    return r.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("id").alias("total"),
        F.sum((F.col("id") * F.col("id")) % 7).alias("checksum"),
    )


# ----------------------------------------------------- trivial count(*)
@register(
    "trivial_count_lineitem",
    oracle="SELECT count(*) AS n_rows FROM lineitem",
)
def trivial_count_lineitem(spark: SparkSession, sf: str) -> DataFrame:
    return table_row_count(spark, sf, "lineitem")


# ------------------------------------------------------------ DISTINCT
@register(
    "distinct_segment_priority",
    oracle="""
    SELECT DISTINCT c.c_mktsegment, o.o_orderpriority
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    """,
)
def distinct_segment_priority(spark: SparkSession, sf: str) -> DataFrame:
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .select("c_mktsegment", "o_orderpriority")
        .distinct()
    )


# ----------------------------------------------- theta (non-equi) join
@register(
    "theta_join_nation_pairs",
    oracle="""
    SELECT a.n_name AS nation_a, b.n_name AS nation_b
    FROM nation a JOIN nation b
      ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
    """,
)
def theta_join_nation_pairs(spark: SparkSession, sf: str) -> DataFrame:
    a = _t(spark, sf, "nation").alias("a")
    b = _t(spark, sf, "nation").alias("b")
    return a.join(
        b,
        (F.col("a.n_regionkey") == F.col("b.n_regionkey"))
        & (F.col("a.n_nationkey") < F.col("b.n_nationkey")),
    ).select(F.col("a.n_name").alias("nation_a"), F.col("b.n_name").alias("nation_b"))


# --------------------------------------------------------- JOIN USING
@register(
    "join_using_nation_counts",
    oracle="""
    SELECT nationkey, count(*) AS n_pairs
    FROM (SELECT c_nationkey AS nationkey, c_custkey FROM customer) c
    JOIN (SELECT s_nationkey AS nationkey, s_suppkey FROM supplier) s
    USING (nationkey)
    GROUP BY nationkey
    """,
)
def join_using_nation_counts(spark: SparkSession, sf: str) -> DataFrame:
    c = _t(spark, sf, "customer").select(
        F.col("c_nationkey").alias("nationkey"), "c_custkey"
    )
    s = _t(spark, sf, "supplier").select(
        F.col("s_nationkey").alias("nationkey"), "s_suppkey"
    )
    return c.join(s, on="nationkey").groupBy("nationkey").agg(
        F.count(F.lit(1)).alias("n_pairs")
    )


# ------------------------------------------------ semi/anti summaries
@register(
    "semi_anti_counts",
    oracle="""
    SELECT 'recent_buyers' AS kind, count(*) AS n FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= DATE '1997-01-01'
                    AND o.o_orderdate <  DATE '1997-02-01')
    UNION ALL
    SELECT 'never_ordered' AS kind, count(*) AS n FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def semi_anti_counts(spark: SparkSession, sf: str) -> DataFrame:
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    recent = o.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1997-02-01").cast("date"))
    )
    semi = c.join(recent, c.c_custkey == recent.o_custkey, "left_semi").agg(
        F.count(F.lit(1)).alias("n")
    ).select(F.lit("recent_buyers").alias("kind"), "n")
    anti = c.join(o, c.c_custkey == o.o_custkey, "left_anti").agg(
        F.count(F.lit(1)).alias("n")
    ).select(F.lit("never_ordered").alias("kind"), "n")
    return semi.unionByName(anti)


# -------------------------------------------------- FULL OUTER JOIN
@register(
    "full_outer_customer_supplier",
    oracle="""
    SELECT coalesce(c.nationkey, s.nationkey) AS nationkey,
           count(c.c_custkey) AS n_cust,
           count(s.s_suppkey) AS n_supp
    FROM (SELECT c_nationkey AS nationkey, c_custkey FROM customer WHERE c_acctbal > 9000) c
    FULL OUTER JOIN (SELECT s_nationkey AS nationkey, s_suppkey FROM supplier WHERE s_acctbal > 9000) s
      ON c.nationkey = s.nationkey
    GROUP BY 1
    """,
)
def full_outer_customer_supplier(spark: SparkSession, sf: str) -> DataFrame:
    c = (
        _t(spark, sf, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select(F.col("c_nationkey").alias("nk_c"), "c_custkey")
    )
    s = (
        _t(spark, sf, "supplier")
        .filter(F.col("s_acctbal") > 9000)
        .select(F.col("s_nationkey").alias("nk_s"), "s_suppkey")
    )
    j = c.join(s, c.nk_c == s.nk_s, "full_outer")
    return j.groupBy(
        F.coalesce("nk_c", "nk_s").alias("nationkey")
    ).agg(F.count("c_custkey").alias("n_cust"), F.count("s_suppkey").alias("n_supp"))


# ------------------------------------- explicit sort-merge join (hint)
@register(
    "smj_order_lineitem_totals",
    oracle="""
    SELECT o.o_orderpriority, count(*) AS n, sum(l.l_quantity) AS qty
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderdate >= DATE '1997-06-01' AND o.o_orderdate < DATE '1997-09-01'
    GROUP BY o.o_orderpriority
    """,
)
def smj_order_lineitem_totals(spark: SparkSession, sf: str) -> DataFrame:
    """Forced SortMergeJoin (merge hint) — the spill-safe strategy for
    joins where neither side fits in memory (GraceHashJoin.h analogue;
    Spark SMJ spills both sides)."""
    o = _t(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-06-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1997-09-01").cast("date"))
    )
    l = _t(spark, sf, "lineitem")
    return (
        o.hint("merge")
        .join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("qty"))
    )


# -------------------------------------------- ReadNothing (empty source)
@register(
    "read_nothing",
    oracle="SELECT CAST(NULL AS BIGINT) AS id WHERE 1 = 0",
)
def read_nothing(spark: SparkSession, sf: str) -> DataFrame:
    """Empty source with a stable schema (ReadNothingStep.h:23)."""
    return spark.range(0).select(F.col("id").cast("bigint").alias("id"))


# ------------------------------------------------------------- SAMPLE
@register("sample_lineitem")  # rows-only: sampling is engine-specific
def sample_lineitem(spark: SparkSession, sf: str) -> DataFrame:
    li = _t(spark, sf, "lineitem")
    return li.sample(fraction=0.1, seed=42).agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.sum("l_quantity").alias("qty_sum"),
    )
