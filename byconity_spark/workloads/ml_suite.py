"""ML-scoring aggregate workloads: fastAuc2/3/fastPrevAuc2 tiers,
regressionAuc2 flag variants, stochasticLinear/LogisticRegression GD, and
retention4.

Reference: AggregateFunctionFastAuc2.h / FastAuc3.h / FastPrevAuc2.h,
AggregateFunctionRegAucV2.h, AggregateFunctionMLMethod.h,
AggregateFunctionRetention4.h.
"""

from __future__ import annotations

from byconity_spark.engine.localdf import local_df as _local_df

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from byconity_spark.engine.catalog import load_table
from byconity_spark.udafs.behavioral import (
    fast_auc2,
    regression_auc2,
    retention4,
)
from byconity_spark.udafs.mlmethod import eval_ml_method, gd_oracle_sql, gd_train
from byconity_spark.workloads import register


def _t(spark: SparkSession, sf: str, name: str) -> DataFrame:
    return load_table(spark, sf, name)


# --------------------------------------------------------------------------
# fastAuc2 / fastAuc3 / fastPrevAuc2: identical bucketed-rank AUC at three
# precision tiers (the reference trio differs only in state layout).
# --------------------------------------------------------------------------
def _duck_fast_auc(precision: float) -> str:
    nb = int(__import__("math").ceil(1.0 / precision))
    return f"""
    (WITH b AS (SELECT least(greatest(CAST(floor(((value % 1000) / 1000.0)
                                           / {precision}) AS BIGINT), 0),
                              {nb - 1}) AS bin,
                       CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                         AS lab
                FROM events),
     pb AS (SELECT bin, count(*) AS n, sum(lab) AS p FROM b GROUP BY bin),
     pr AS (SELECT *, coalesce(sum(n) OVER (ORDER BY bin
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
            FROM pb)
     SELECT CASE WHEN sum(p) = 0 OR sum(n) - sum(p) = 0 THEN 1.0
            ELSE (sum(p * (before + (n + 1) / 2.0)) - sum(p) * (sum(p) + 1) / 2.0)
                 / (sum(p) * (sum(n) - sum(p))) END
     FROM pr)"""


@register(
    "ml_fast_auc2_tiers",
    oracle=f"""
    SELECT round({_duck_fast_auc(0.001)}, 6) AS auc_p3,
           round({_duck_fast_auc(0.01)}, 6)  AS auc_p2,
           round({_duck_fast_auc(0.1)}, 6)   AS auc_p1
    """,
)
def ml_fast_auc2_tiers(spark: SparkSession, sf: str) -> DataFrame:
    ev = _t(spark, sf, "events")
    pred = (F.col("value") % 1000) / 1000.0
    lab = (F.col("event_type") == "purchase").cast("int")
    tiers = []
    for name, prec in (("auc_p3", 0.001), ("auc_p2", 0.01), ("auc_p1", 0.1)):
        tiers.append(
            fast_auc2(ev, pred, lab, precision=prec, lo=0.0, hi=1.0).select(
                F.round("auc", 6).alias(name)
            )
        )
    out = tiers[0]
    for t in tiers[1:]:
        out = out.crossJoin(F.broadcast(t))
    return out


# --------------------------------------------------------------------------
# regressionAuc2 (RegAucV2): all four tie-handling flags in closed form.
# --------------------------------------------------------------------------
@register(
    "ml_regression_auc2",
    oracle="""
    WITH g AS (SELECT CAST(l_quantity AS BIGINT) AS pr,
                      CAST(round(l_discount * 100) AS BIGINT) AS lb,
                      count(*) AS c
               FROM lineitem GROUP BY 1, 2),
    tot AS (SELECT sum(c) AS n, sum(c * (c - 1) / 2) AS e FROM g),
    dd AS (SELECT sum(cl * (cl - 1) / 2) AS d
           FROM (SELECT sum(c) AS cl FROM g GROUP BY lb)),
    cc AS (SELECT coalesce(sum(a.c * b.c), 0) AS cc
           FROM g a JOIN g b ON a.pr < b.pr AND a.lb < b.lb),
    s AS (SELECT n * (n - 1) / 2.0 AS t, e, d, cc FROM tot, dd, cc)
    SELECT round(CASE WHEN t <= 0 THEN -1.0 ELSE (cc + e) / t END, 6)
             AS auc_flag1,
           round(CASE WHEN t <= 0 THEN -1.0 ELSE (cc + d) / t END, 6)
             AS auc_flag2,
           round(CASE WHEN t <= 0 THEN -1.0 ELSE cc / t END, 6)
             AS auc_flag3,
           round(CASE WHEN t - d <= 0 THEN -1.0 ELSE cc / (t - d) END, 6)
             AS auc_flag4
    FROM s
    """,
)
def ml_regression_auc2(spark: SparkSession, sf: str) -> DataFrame:
    li = _t(spark, sf, "lineitem")
    out = regression_auc2(
        li,
        F.col("l_quantity").cast("long"),
        F.round(F.col("l_discount") * 100).cast("long"),
    )
    return out.select(
        *[F.round(c, 6).alias(c) for c in
          ("auc_flag1", "auc_flag2", "auc_flag3", "auc_flag4")]
    )


# --------------------------------------------------------------------------
# stochasticLinearRegression: 3 full-batch GD iterations; the oracle
# unrolls the loop into a CTE chain running the identical math.
# --------------------------------------------------------------------------
_LIN_BASE = (
    "SELECT l_quantity / 50.0 AS x1, l_discount AS x2, "
    "l_extendedprice / 100000.0 AS y FROM lineitem"
)


@register(
    "ml_linear_gd",
    oracle=gd_oracle_sql(_LIN_BASE, ["x1", "x2"], lr=0.5, iterations=3),
)
def ml_linear_gd(spark: SparkSession, sf: str) -> DataFrame:
    li = _t(spark, sf, "lineitem").select(
        (F.col("l_quantity") / 50.0).alias("x1"),
        F.col("l_discount").alias("x2"),
        (F.col("l_extendedprice") / 100000.0).alias("y"),
    )
    w, b = gd_train(li, ["x1", "x2"], "y", lr=0.5, iterations=3)
    return _local_df(spark, 
        [(round(w[0], 6), round(w[1], 6), round(b, 6))], "w1 double, w2 double, b double"
    )


# --------------------------------------------------------------------------
# stochasticLogisticRegression: same shape, sigmoid gradient; label =
# "was returned".
# --------------------------------------------------------------------------
_LOG_BASE = (
    "SELECT l_quantity / 50.0 AS x1, l_discount AS x2, "
    "CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END AS y FROM lineitem"
)


@register(
    "ml_logistic_gd",
    oracle=gd_oracle_sql(
        _LOG_BASE, ["x1", "x2"], lr=0.5, iterations=3, logistic=True
    ),
)
def ml_logistic_gd(spark: SparkSession, sf: str) -> DataFrame:
    li = _t(spark, sf, "lineitem").select(
        (F.col("l_quantity") / 50.0).alias("x1"),
        F.col("l_discount").alias("x2"),
        F.when(F.col("l_returnflag") == "R", 1.0).otherwise(0.0).alias("y"),
    )
    w, b = gd_train(li, ["x1", "x2"], "y", lr=0.5, iterations=3, logistic=True)
    return _local_df(spark, 
        [(round(w[0], 6), round(w[1], 6), round(b, 6))], "w1 double, w2 double, b double"
    )


# --------------------------------------------------------------------------
# evalMLMethod surface: train once, score per order-priority bucket — the
# model application is a pure Column expression (no UDF), checked by
# re-deriving the same weights in the oracle and scoring in SQL.
# --------------------------------------------------------------------------
@register(
    "ml_eval_method_scores",
    oracle=gd_oracle_sql(_LIN_BASE, ["x1", "x2"], lr=0.5, iterations=3).replace(
        "SELECT round(w1, 6) AS w1, round(w2, 6) AS w2, round(b, 6) AS b FROM w3",
        """
        SELECT li.l_linestatus AS status,
               round(avg(w.w1 * li.l_quantity / 50.0 + w.w2 * li.l_discount
                         + w.b), 6) AS avg_pred,
               count(*) AS n
        FROM lineitem li CROSS JOIN w3 w
        GROUP BY 1
        """,
    ),
)
def ml_eval_method_scores(spark: SparkSession, sf: str) -> DataFrame:
    li = _t(spark, sf, "lineitem").select(
        F.col("l_linestatus").alias("status"),
        (F.col("l_quantity") / 50.0).alias("x1"),
        F.col("l_discount").alias("x2"),
        (F.col("l_extendedprice") / 100000.0).alias("y"),
    )
    w, b = gd_train(li, ["x1", "x2"], "y", lr=0.5, iterations=3)
    scored = li.withColumn("pred", eval_ml_method(w, b, ["x1", "x2"]))
    return scored.groupBy("status").agg(
        F.round(F.avg("pred"), 6).alias("avg_pred"),
        F.count(F.lit(1)).alias("n"),
    )


# --------------------------------------------------------------------------
# retention4: windowed cohort-return matrix over explicit date bounds.
# --------------------------------------------------------------------------
@register(
    "beh_retention4",
    oracle="""
    WITH f AS (SELECT user_id,
                      min(date_diff('day', DATE '2024-01-03',
                                    CAST(ts AS DATE))) AS fd
               FROM events
               WHERE event_type = 'signup' AND CAST(ts AS DATE) >= DATE '2024-01-03'
               GROUP BY user_id
               HAVING min(date_diff('day', DATE '2024-01-03',
                                    CAST(ts AS DATE))) < 10),
    r AS (SELECT DISTINCT user_id,
                 date_diff('day', DATE '2024-01-03', CAST(ts AS DATE)) AS d
          FROM events
          WHERE event_type = 'purchase' AND CAST(ts AS DATE) >= DATE '2024-01-03'),
    ret AS (SELECT f.fd, (r.d - f.fd) AS slot, count(*) AS cnt
            FROM f JOIN r USING (user_id)
            WHERE r.d > f.fd AND r.d - f.fd < 7 GROUP BY 1, 2),
    base AS (SELECT fd, 0 AS slot, count(*) AS cnt FROM f GROUP BY 1),
    cells AS (SELECT * FROM base UNION ALL SELECT * FROM ret),
    grid AS (SELECT d.range AS fd, s.range AS slot
             FROM range(10) d CROSS JOIN range(7) s),
    filled AS (SELECT g.fd, g.slot, coalesce(c.cnt, 0) AS cnt
               FROM grid g LEFT JOIN cells c ON c.fd = g.fd AND c.slot = g.slot)
    SELECT DATE '2024-01-03' + CAST(fd AS INTEGER) AS cohort_date,
           string_agg(CAST(cnt AS VARCHAR), '|' ORDER BY slot) AS slots
    FROM filled GROUP BY 1
    """,
)
def beh_retention4(spark: SparkSession, sf: str) -> DataFrame:
    return retention4(
        _t(spark, sf, "events"),
        first_type="signup",
        return_type="purchase",
        start_date="2024-01-03",
        end_date="2024-01-12",
        window_days=7,
    )
