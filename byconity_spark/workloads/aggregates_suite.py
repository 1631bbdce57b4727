"""Aggregate-function workload: uniq/quantile/topK/argMinMax/groupArray/
statistics — the ByConity aggregate families beyond plain sum/avg.

Reference: AggregateFunctionUniq.h (uniq/uniqExact), Quantile*.h
(quantileExact/TDigest), AggregateFunctionTopK, AggregateFunctionArgMinMax.h
(argMin/argMax), AggregateFunctionGroupArray, statistics aggregates
(src/AggregateFunctions/AggregateFunctionStatistics*.h), combinators
registerAggregateFunctions.cpp:140-152 (exercised via the ch() registry).

Approximate variants (approx_count_distinct / percentile_approx) use
different sketches than DuckDB, so the oracle-checked queries pin the EXACT
forms; the approx forms are bounds-tested in tests/test_aggregates.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from byconity_spark.engine.catalog import load_table
from byconity_spark.functions import ch
from byconity_spark.workloads import register
from byconity_spark.workloads._arrays import arr_dbl_str, arr_str


def _t(spark: SparkSession, sf: str, name: str) -> DataFrame:
    return load_table(spark, sf, name)


# ---------------------------------------------- uniq + -If combinators
@register(
    "agg_uniq_suite",
    oracle="""
    SELECT event_type,
           count(*)                                           AS n,
           count(DISTINCT user_id)                            AS uniq_users,
           count(*) FILTER (WHERE value > 100)                AS n_big,
           sum(value) FILTER (WHERE value > 100)              AS sum_big,
           avg(value) FILTER (WHERE value <= 100)             AS avg_small,
           min(value) FILTER (WHERE user_id % 2 = 0)          AS min_even
    FROM events GROUP BY event_type
    """,
)
def agg_uniq_suite(spark: SparkSession, sf: str) -> DataFrame:
    ev = _t(spark, sf, "events")
    v, u = F.col("value"), F.col("user_id")
    return ev.groupBy("event_type").agg(
        ch("count").alias("n"),
        ch("uniqExact", u).alias("uniq_users"),
        ch("countIf", v > 100).alias("n_big"),
        ch("sumIf", v, v > 100).alias("sum_big"),
        ch("avgIf", v, v <= 100).alias("avg_small"),
        ch("minIf", v, u % 2 == 0).alias("min_even"),
    )


# ------------------------------------------------------ exact quantiles
@register(
    "agg_quantiles_exact",
    oracle="""
    SELECT event_type,
           quantile_cont(value, 0.5)  AS p50,
           quantile_cont(value, 0.9)  AS p90,
           quantile_cont(value, 0.99) AS p99,
           min(value) AS lo, max(value) AS hi
    FROM events GROUP BY event_type
    """,
)
def agg_quantiles_exact(spark: SparkSession, sf: str) -> DataFrame:
    ev = _t(spark, sf, "events")
    v = F.col("value")
    return ev.groupBy("event_type").agg(
        ch("quantileExact", 0.5, v).alias("p50"),
        ch("quantileExact", 0.9, v).alias("p90"),
        ch("quantileExact", 0.99, v).alias("p99"),
        F.min(v).alias("lo"),
        F.max(v).alias("hi"),
    )


# ------------------------------------------------------ exact topK
@register(
    "agg_topk_words",
    oracle="""
    SELECT event_type, user_id, n, rnk FROM (
      SELECT event_type, user_id, count(*) AS n,
             CAST(row_number() OVER (PARTITION BY event_type
                                     ORDER BY count(*) DESC, user_id) AS INT) AS rnk
      FROM events GROUP BY event_type, user_id
    ) WHERE rnk <= 5
    """,
)
def agg_topk_words(spark: SparkSession, sf: str) -> DataFrame:
    ev = _t(spark, sf, "events")
    counts = ev.groupBy("event_type", "user_id").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type").orderBy(F.desc("n"), F.asc("user_id"))
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select("event_type", "user_id", "n", "rnk")
    )


# ------------------------------------------------- argMin/argMax/anyLast
@register(
    "agg_argminmax",
    oracle="""
    SELECT user_id,
           arg_max(event_type, ord) AS last_type,
           arg_min(event_type, ord) AS first_type,
           arg_max(value, ord)      AS last_value
    FROM (SELECT *,
                 epoch_us(CAST(ts AS TIMESTAMP)) * 1000 + event_id % 1000 AS ord
          FROM events)
    GROUP BY user_id
    """,
)
def agg_argminmax(spark: SparkSession, sf: str) -> DataFrame:
    ev = _t(spark, sf, "events")
    # packed (ts, event_id) tiebreak key — DuckDB arg_max can't order by
    # struct, so both engines use the same bigint encoding
    ord_ = F.unix_micros(F.col("ts")) * 1000 + F.col("event_id") % 1000
    return ev.groupBy("user_id").agg(
        ch("argMax", F.col("event_type"), ord_).alias("last_type"),
        ch("argMin", F.col("event_type"), ord_).alias("first_type"),
        ch("argMax", F.col("value"), ord_).alias("last_value"),
    )


# -------------------------------------------- groupArray / groupUniqArray
@register(
    "agg_group_arrays",
    oracle="""
    SELECT user_id,
           array_to_string(list_sort(list(event_type)), '|')          AS all_types,
           array_to_string(list_sort(list(DISTINCT event_type)), '|') AS uniq_types,
           len(list(DISTINCT event_type))        AS n_uniq_types
    FROM events WHERE user_id < 40 GROUP BY user_id
    """,
)
def agg_group_arrays(spark: SparkSession, sf: str) -> DataFrame:
    ev = _t(spark, sf, "events").filter(F.col("user_id") < 40)
    return ev.groupBy("user_id").agg(
        arr_str(F.sort_array(ch("groupArray", F.col("event_type")))).alias("all_types"),
        arr_str(F.sort_array(ch("groupUniqArray", F.col("event_type")))).alias("uniq_types"),
        F.size(ch("groupUniqArray", F.col("event_type"))).cast("long").alias("n_uniq_types"),
    )


# ----------------------------------- decimal money math (SURVEY §1.2:
# Decimal64(s) -> DecimalType(18,s); exact integer-scaled arithmetic)
@register(
    "agg_decimal_money",
    oracle="""
    SELECT o_orderstatus,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
           CAST(min(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS lo,
           CAST(max(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS hi,
           count(*)                                   AS n
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_decimal_money(spark: SparkSession, sf: str) -> DataFrame:
    # The groupBy runs in exact Decimal64 arithmetic (the point of the
    # operator); the OUTPUT renders as DOUBLE on both engines — the driver
    # hash is dtype-exact, and DuckDB DECIMAL fetches to pandas as float64.
    o = _t(spark, sf, "orders")
    money = ch("toDecimal64", F.col("o_totalprice"), 2)
    return o.groupBy("o_orderstatus").agg(
        F.sum(money).cast("double").alias("total"),
        F.min(money).cast("double").alias("lo"),
        F.max(money).cast("double").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    )


# ------------------------------------------ histogram (fixed-width bins)
@register(
    "agg_histogram",
    oracle="""
    SELECT event_type,
           CAST(floor(value / 50.0) AS BIGINT) AS bin,
           count(*) AS n,
           round(avg(value), 6) AS bin_avg
    FROM events GROUP BY 1, 2
    """,
)
def agg_histogram(spark: SparkSession, sf: str) -> DataFrame:
    ev = _t(spark, sf, "events")
    return ev.groupBy(
        "event_type", F.floor(F.col("value") / 50.0).alias("bin")
    ).agg(F.count(F.lit(1)).alias("n"), F.round(F.avg("value"), 6).alias("bin_avg"))


# -------------------------------------------------- weighted aggregates
@register(
    "agg_weighted",
    oracle="""
    SELECT event_type,
           round(sum(value * (user_id + 1)) / sum(user_id + 1), 6) AS wavg
    FROM events GROUP BY event_type
    """,
)
def agg_weighted(spark: SparkSession, sf: str) -> DataFrame:
    ev = _t(spark, sf, "events")
    w = F.col("user_id") + 1
    return ev.groupBy("event_type").agg(
        F.round(ch("avgWeighted", F.col("value"), w), 6).alias("wavg")
    )


# ----------------------- groupArrayMovingSum: running sums as an array
@register(
    "agg_moving_sum_arrays",
    oracle="""
    WITH r AS (
      SELECT user_id, event_id,
             sum(value) OVER (PARTITION BY user_id
                              ORDER BY CAST(ts AS TIMESTAMP), event_id
                              ROWS UNBOUNDED PRECEDING) AS rs
      FROM events WHERE user_id < 20
    )
    SELECT user_id,
           array_to_string(list_transform(list(round(rs, 6) ORDER BY event_id),
                                          x -> printf('%.6f', x)), '|') AS moving_sums
    FROM r GROUP BY user_id
    """,
)
def agg_moving_sum_arrays(spark: SparkSession, sf: str) -> DataFrame:
    ev = _t(spark, sf, "events").filter(F.col("user_id") < 20)
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    r = ev.select(
        "user_id",
        "event_id",
        F.round(F.sum("value").over(w.rowsBetween(Window.unboundedPreceding, 0)), 6).alias(
            "rs"
        ),
    )
    pairs = r.select(
        "user_id", F.struct(F.col("event_id"), F.col("rs")).alias("er")
    )
    return (
        pairs.groupBy("user_id")
        .agg(F.sort_array(F.collect_list("er")).alias("ers"))
        .select("user_id", arr_dbl_str(F.col("ers.rs")).alias("moving_sums"))
    )


# -------------------------------- cohort retention (retention2 shape)
@register(
    "agg_cohort_retention",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, CAST(min(CAST(ts AS TIMESTAMP)) AS DATE) AS d0
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    activity AS (SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d FROM events)
    SELECT f.d0 AS cohort_day,
           count(DISTINCT f.user_id) AS cohort_size,
           count(DISTINCT CASE WHEN a.d = f.d0 + 1 THEN f.user_id END) AS d1,
           count(DISTINCT CASE WHEN a.d = f.d0 + 7 THEN f.user_id END) AS d7
    FROM first_seen f LEFT JOIN activity a ON a.user_id = f.user_id
    GROUP BY f.d0
    """,
)
def agg_cohort_retention(spark: SparkSession, sf: str) -> DataFrame:
    ev = _t(spark, sf, "events")
    first_seen = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").cast("date").alias("d0"))
    )
    activity = ev.select("user_id", F.col("ts").cast("date").alias("d")).distinct()
    j = first_seen.join(activity, "user_id", "left")
    return j.groupBy(F.col("d0").alias("cohort_day")).agg(
        F.countDistinct("user_id").alias("cohort_size"),
        F.countDistinct(
            F.when(F.col("d") == F.date_add(F.col("d0"), 1), F.col("user_id"))
        ).alias("d1"),
        F.countDistinct(
            F.when(F.col("d") == F.date_add(F.col("d0"), 7), F.col("user_id"))
        ).alias("d7"),
    )


# ----------------------------- topK(3) returning the CH-shaped array
@register(
    "agg_topk_arrays",
    oracle="""
    WITH counts AS (
      SELECT event_type, user_id % 10 AS k, count(*) AS n
      FROM events GROUP BY event_type, user_id % 10
    )
    SELECT event_type,
           array_to_string((list(k ORDER BY n DESC, k))[1:3], '|') AS top3
    FROM counts GROUP BY event_type
    """,
)
def agg_topk_arrays(spark: SparkSession, sf: str) -> DataFrame:
    ev = _t(spark, sf, "events").withColumn("k", F.col("user_id") % 10)
    counts = ev.groupBy("event_type", "k").agg(F.count(F.lit(1)).alias("n"))
    pairs = counts.select(
        "event_type", F.struct((-F.col("n")).alias("neg_n"), F.col("k")).alias("nk")
    )
    return (
        pairs.groupBy("event_type")
        .agg(F.slice(F.sort_array(F.collect_list("nk")), 1, 3).alias("nks"))
        .select("event_type", arr_str(F.col("nks.k")).alias("top3"))
    )


# ------------------------------------------------------------ statistics
@register(
    "agg_statistics",
    oracle="""
    SELECT event_type,
           round(stddev_samp(value), 6) AS sd_samp,
           round(stddev_pop(value), 6)  AS sd_pop,
           round(var_samp(value), 5)    AS v_samp,
           round(corr(value, CAST(user_id AS DOUBLE)), 6)       AS c,
           round(covar_samp(value, CAST(user_id AS DOUBLE)), 5) AS cv
    FROM events GROUP BY event_type
    """,
)
def agg_statistics(spark: SparkSession, sf: str) -> DataFrame:
    ev = _t(spark, sf, "events")
    v, u = F.col("value"), F.col("user_id").cast("double")
    return ev.groupBy("event_type").agg(
        F.round(ch("stddevSamp", v), 6).alias("sd_samp"),
        F.round(ch("stddevPop", v), 6).alias("sd_pop"),
        F.round(ch("varSamp", v), 5).alias("v_samp"),
        F.round(ch("corr", v, u), 6).alias("c"),
        F.round(ch("covarSamp", v, u), 5).alias("cv"),
    )


@register(
    "agg_advanced_stats",
    oracle="""
    WITH d AS (SELECT event_type, user_id, value,
                      CAST(ts AS TIMESTAMP) AS ts,
                      user_id % 2 = 0 AS grp
               FROM events),
    ent AS (
      SELECT event_type, -sum(p * log2(p)) AS entropy FROM (
        SELECT event_type, count(*)::DOUBLE / sum(count(*)) OVER (PARTITION BY event_type) AS p
        FROM d GROUP BY event_type, user_id % 10
      ) GROUP BY event_type
    ),
    ds AS (
      SELECT event_type, sum(CASE WHEN dd > 0 THEN dd ELSE 0 END) AS delta_sum FROM (
        SELECT event_type, value - lag(value) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS dd
        FROM (SELECT event_type, value, ts, event_id FROM events)
      ) GROUP BY event_type
    ),
    rc AS (
      SELECT event_type, corr(rx, ry) AS rank_corr FROM (
        SELECT event_type,
               avg(rn_x) OVER (PARTITION BY event_type, user_id)  AS rx,
               avg(rn_y) OVER (PARTITION BY event_type, value)    AS ry
        FROM (
          SELECT event_type, user_id, value,
                 row_number() OVER (PARTITION BY event_type ORDER BY user_id) AS rn_x,
                 row_number() OVER (PARTITION BY event_type ORDER BY value)   AS rn_y
          FROM d
        )
      ) GROUP BY event_type
    ),
    tt AS (
      SELECT event_type,
             (avg(value) FILTER (WHERE grp) - avg(value) FILTER (WHERE NOT grp))
             / sqrt(var_samp(value) FILTER (WHERE grp) / count(*) FILTER (WHERE grp)
                    + var_samp(value) FILTER (WHERE NOT grp) / count(*) FILTER (WHERE NOT grp))
               AS t_stat
      FROM d GROUP BY event_type
    )
    SELECT ent.event_type, round(ent.entropy, 6) AS entropy,
           round(ds.delta_sum, 3) AS delta_sum,
           round(rc.rank_corr, 6) AS rank_corr,
           round(tt.t_stat, 6) AS t_stat
    FROM ent JOIN ds USING (event_type) JOIN rc USING (event_type)
             JOIN tt USING (event_type)
    """,
)
def agg_advanced_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Statistical aggregate family (entropy, deltaSum, Spearman
    rankCorrelation, Welch t) — reference AggregateFunctionEntropy.h,
    DeltaSum.h, RankCorrelation.h, TTest.h — composed from JVM-side
    windows + aggregates (functions/registry.py helpers)."""
    from byconity_spark.functions.registry import (
        delta_sum,
        entropy,
        rank_corr,
        welch_t_stat,
    )

    ev = load_table(spark, sf, "events")
    d = ev.select(
        "event_type",
        "user_id",
        "value",
        "ts",
        "event_id",
        (F.col("user_id") % 2 == 0).alias("grp"),
    )
    # four stat families consume the same projected base: hash-partition it
    # by the common grouping key ONCE and cache — every downstream window /
    # groupBy clusters on event_type (or a superset), so Catalyst reuses the
    # cached partitioning instead of shuffling four more times.  Parallelism
    # is not reduced: the event_type windows force that clustering anyway.
    d = d.repartition("event_type").persist()
    ent = entropy(
        d.withColumn("bucket", F.col("user_id") % 10), ["event_type"], "bucket"
    ).withColumn("entropy", F.round("entropy", 6))
    ds = delta_sum(d, ["event_type"], ["ts", "event_id"], "value").withColumn(
        "delta_sum", F.round("delta_sum", 3)
    )
    rc = rank_corr(d, ["event_type"], "user_id", "value").withColumn(
        "rank_corr", F.round("rank_corr", 6)
    )
    tt = welch_t_stat(d, ["event_type"], "value", "grp").select(
        "event_type", F.round("t_stat", 6).alias("t_stat")
    )
    return (
        ent.join(ds, "event_type").join(rc, "event_type").join(tt, "event_type")
    )


# ------------------------- HLL uniq -State/-Merge (AggregatingMergeTree
# rollup pattern: fine-grained sketch states, coarser re-aggregation by
# merging 16 KiB blobs instead of re-shuffling raw ids)
@register(
    "agg_uniq_state_merge",
    oracle="""
    SELECT event_type, true AS within_tol
    FROM events GROUP BY event_type
    """,
)
def agg_uniq_state_merge(spark: SparkSession, sf: str) -> DataFrame:
    """uniqState per (event_type, day) -> uniqMerge per event_type ->
    estimate, asserted within the documented HLL error (p=14, σ≈0.81%; the
    gate uses 5σ) against the Spark-exact distinct.  The boolean is the
    oracle contract: a broken sketch or merge flips it false and fails the
    hash compare.  Reference: AggregateFunctionUniq.h, DataTypeSketchBinary.h."""
    from byconity_spark.udafs.sketches import uniq_estimate, uniq_merge, uniq_state

    ev = _t(spark, sf, "events").withColumn("day", F.to_date("ts"))
    states = uniq_state(ev, ["event_type", "day"], "user_id")
    merged = uniq_merge(states.drop("day"), ["event_type"])
    est = merged.select(
        "event_type", uniq_estimate(F.col("uniq_state")).alias("est")
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact")
    )
    return est.join(exact, "event_type").select(
        "event_type",
        (
            F.abs(F.col("est").cast("double") / F.col("exact") - 1.0) < 0.0405
        ).alias("within_tol"),
    )


# --------------- statistical-test aggregates as a checked query (reference
# AggregateFunctionTTest.h welchTTest, AggregateFunctionRankCorrelation.h,
# AggregateFunctionEntropy.h, AggregateFunctionDeltaSum.h).  Outputs are
# rounded on both sides: the statistics are ratios of distributed double
# sums, exact to ~1e-15 but not bit-stable across summation orders.
@register(
    "agg_stat_tests",
    oracle="""
    WITH e AS (
      SELECT event_type, user_id, event_id, value,
             (user_id % 2 = 0) AS is_even,
             floor(value / 100.0) AS bucket
      FROM events
    ),
    t AS (
      SELECT event_type,
             round((avg(value) FILTER (WHERE is_even)
                     - avg(value) FILTER (WHERE NOT is_even))
                   / sqrt(var_samp(value) FILTER (WHERE is_even)
                            / count(value) FILTER (WHERE is_even)
                          + var_samp(value) FILTER (WHERE NOT is_even)
                            / count(value) FILTER (WHERE NOT is_even)), 6)
               AS t_stat
      FROM e GROUP BY event_type
    ),
    ranked AS (
      SELECT event_type, value, user_id,
             avg(rn_x) OVER (PARTITION BY event_type, value)          AS rx,
             avg(rn_y) OVER (PARTITION BY event_type, user_id % 97)   AS ry
      FROM (
        SELECT event_type, value, user_id,
               row_number() OVER (PARTITION BY event_type ORDER BY value)        AS rn_x,
               row_number() OVER (PARTITION BY event_type ORDER BY user_id % 97) AS rn_y
        FROM e
      )
    ),
    rc AS (
      SELECT event_type, round(corr(rx, ry), 6) AS rank_corr
      FROM ranked GROUP BY event_type
    ),
    ent AS (
      SELECT event_type, round(-sum(p * log2(p)), 6) AS entropy
      FROM (
        SELECT event_type,
               count(*)::DOUBLE
                 / sum(count(*)) OVER (PARTITION BY event_type) AS p
        FROM e GROUP BY event_type, bucket
      ) GROUP BY event_type
    ),
    ds AS (
      SELECT event_type,
             round(sum(CASE WHEN d > 0 THEN d ELSE 0 END), 4) AS delta_sum
      FROM (
        SELECT event_type,
               value - lag(value) OVER (PARTITION BY event_type
                                        ORDER BY CAST(ts AS TIMESTAMP), event_id) AS d
        FROM events
      ) GROUP BY event_type
    )
    SELECT t.event_type, t.t_stat, rc.rank_corr, ent.entropy, ds.delta_sum
    FROM t JOIN rc USING (event_type) JOIN ent USING (event_type)
           JOIN ds USING (event_type)
    """,
)
def agg_stat_tests(spark: SparkSession, sf: str) -> DataFrame:
    from byconity_spark.functions.registry import (
        delta_sum,
        entropy,
        rank_corr,
        welch_t_stat,
    )

    ev = _t(spark, sf, "events")
    base = ev.withColumn("bucket", F.floor(F.col("value") / 100.0))
    t = welch_t_stat(
        base, ["event_type"], "value", F.col("user_id") % 2 == 0
    ).select("event_type", F.round("t_stat", 6).alias("t_stat"))
    rc = rank_corr(
        base.withColumn("y", F.col("user_id") % 97), ["event_type"], "value", "y"
    ).select("event_type", F.round("rank_corr", 6).alias("rank_corr"))
    ent = entropy(base, ["event_type"], "bucket").select(
        "event_type", F.round("entropy", 6).alias("entropy")
    )
    ds = delta_sum(ev, ["event_type"], ["ts", "event_id"], "value").select(
        "event_type", F.round("delta_sum", 4).alias("delta_sum")
    )
    return t.join(rc, "event_type").join(ent, "event_type").join(ds, "event_type")


# ------------------------------ -Resample combinator (value-range buckets)
@register(
    "agg_resample",
    oracle="""
    SELECT event_type,
           array_to_string(
             [CAST(coalesce(sum(CASE WHEN user_id >= 0  AND user_id < 50  THEN 1 END), 0) AS BIGINT),
              CAST(coalesce(sum(CASE WHEN user_id >= 50 AND user_id < 100 THEN 1 END), 0) AS BIGINT),
              CAST(coalesce(sum(CASE WHEN user_id >= 100 AND user_id < 150 THEN 1 END), 0) AS BIGINT)],
             '|') AS n_by_bucket,
           array_to_string(list_transform(
             [round(coalesce(sum(CASE WHEN user_id >= 0  AND user_id < 50  THEN value END), 0), 4),
              round(coalesce(sum(CASE WHEN user_id >= 50 AND user_id < 100 THEN value END), 0), 4),
              round(coalesce(sum(CASE WHEN user_id >= 100 AND user_id < 150 THEN value END), 0), 4)],
             x -> printf('%.6f', x)), '|') AS sum_by_bucket
    FROM events GROUP BY event_type
    """,
)
def agg_resample(spark: SparkSession, sf: str) -> DataFrame:
    """countResample / sumResample (reference AggregateFunctionResample.h):
    one aggregation pass split into key-range buckets, emitted as arrays."""
    ev = _t(spark, sf, "events")
    uid = F.col("user_id")
    counts = ch("countResample", 0, 150, 50, uid)
    sums = ch("sumResample", 0, 150, 50, F.col("value"), uid)
    return ev.groupBy("event_type").agg(
        arr_str(
            F.transform(counts, lambda c: F.coalesce(c, F.lit(0)).cast("long"))
        ).alias("n_by_bucket"),
        arr_dbl_str(
            F.transform(sums, lambda s: F.round(F.coalesce(s, F.lit(0.0)), 4))
        ).alias("sum_by_bucket"),
    )


# ------------------------------------------- ndcg (ranking quality metric)
@register(
    "agg_ndcg",
    oracle="""
    WITH base AS (
      SELECT user_id % 20 AS qid, event_id, value AS pred,
             CASE event_type WHEN 'purchase' THEN 2
                             WHEN 'click' THEN 1 ELSE 0 END AS label
      FROM events WHERE user_id < 60
    ),
    ranked AS (
      SELECT qid,
             POW(2, label + 1) - 1 AS rel,
             row_number() OVER (PARTITION BY qid ORDER BY pred DESC, event_id) AS pos,
             row_number() OVER (PARTITION BY qid ORDER BY label DESC, event_id) AS ideal_pos
      FROM base
    ),
    per_q AS (
      SELECT qid,
             sum(rel / log2(pos + 1.0)) AS dcg,
             sum(rel / log2(ideal_pos + 1.0)) AS idcg
      FROM (SELECT qid, rel, pos, ideal_pos FROM ranked) ranked2
      GROUP BY qid
    )
    SELECT round(avg(dcg / idcg), 6) AS ndcg FROM per_q
    """,
)
def agg_ndcg(spark: SparkSession, sf: str) -> DataFrame:
    """ndcg (reference AggregateFunctionNdcg.h): per query group, DCG of the
    prediction ordering over IDCG of the ideal ordering with exponential
    gain 2^(label+1)-1 (Ndcg.h:133), averaged over groups.  Deterministic
    event_id tiebreaks on both orderings; window ranks, no Python.

    NOTE on the ideal ordering: dcg here uses rel/log2(pos+1) with pos from
    pred ordering — the standard NDCG formulation; the reference's
    real_rank remap is position-equivalent under a total order."""
    ev = _t(spark, sf, "events").filter(F.col("user_id") < 60)
    base = ev.select(
        (F.col("user_id") % 20).alias("qid"),
        F.col("event_id"),
        F.col("value").alias("pred"),
        F.when(F.col("event_type") == "purchase", 2)
        .when(F.col("event_type") == "click", 1)
        .otherwise(0)
        .alias("label"),
    )
    w_pred = Window.partitionBy("qid").orderBy(F.col("pred").desc(), F.col("event_id"))
    w_ideal = Window.partitionBy("qid").orderBy(
        F.col("label").desc(), F.col("event_id")
    )
    rel = F.pow(F.lit(2.0), F.col("label") + 1) - 1
    ranked = base.select(
        "qid",
        rel.alias("rel"),
        F.row_number().over(w_pred).alias("pos"),
        F.row_number().over(w_ideal).alias("ideal_pos"),
    )
    per_q = ranked.groupBy("qid").agg(
        F.sum(F.col("rel") / F.log2(F.col("pos") + 1.0)).alias("dcg"),
        F.sum(F.col("rel") / F.log2(F.col("ideal_pos") + 1.0)).alias("idcg"),
    )
    return per_q.agg(F.round(F.avg(F.col("dcg") / F.col("idcg")), 6).alias("ndcg"))


# ------------- categoricalInformationValue (feature-screening IV metric)
@register(
    "agg_categorical_iv",
    oracle="""
    WITH c AS (
      SELECT event_type,
             sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS n1,
             sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS n0
      FROM events GROUP BY event_type
    ),
    t AS (SELECT sum(n1) AS t1, sum(n0) AS t0 FROM c)
    SELECT round(sum((n1 / t1 - n0 / t0) * ln((n1 / t1) / (n0 / t0))), 6)
             AS iv
    FROM c, t
    """,
)
def agg_categorical_iv(spark: SparkSession, sf: str) -> DataFrame:
    """categoricalInformationValue (reference
    AggregateFunctionCategoricalInformationValue.cpp): IV of a categorical
    feature against a binary label — sum over categories of
    (p1 - p0) * ln(p1/p0).  Two chained aggregates, both map-side
    combinable; the category totals broadcast."""
    ev = _t(spark, sf, "events")
    lab = (F.col("user_id") % 2 == 0).cast("int")
    c = ev.groupBy("event_type").agg(
        F.sum(lab).alias("n1"),
        F.sum(1 - lab).alias("n0"),
    )
    t = c.agg(F.sum("n1").alias("t1"), F.sum("n0").alias("t0"))
    p1 = F.col("n1") / F.col("t1")
    p0 = F.col("n0") / F.col("t0")
    return (
        c.crossJoin(F.broadcast(t))
        .agg(F.round(F.sum((p1 - p0) * F.log(p1 / p0)), 6).alias("iv"))
    )


# ----------------------------------------- meanZTest (known-variance z)
@register(
    "agg_mean_ztest",
    oracle="""
    SELECT event_type,
           round((avg(CASE WHEN user_id % 2 = 0 THEN value END)
                   - avg(CASE WHEN user_id % 2 = 1 THEN value END))
                 / sqrt(1000.0 / count(CASE WHEN user_id % 2 = 0 THEN value END)
                        + 1000.0 / count(CASE WHEN user_id % 2 = 1 THEN value END)),
                 6) AS z
    FROM events GROUP BY event_type
    """,
)
def agg_mean_ztest(spark: SparkSession, sf: str) -> DataFrame:
    """meanZTest (reference AggregateFunctionMeanZTest.h): two-sample z
    statistic with KNOWN population variances (1000 here for both sides).
    One conditional aggregate."""
    ev = _t(spark, sf, "events")
    a = F.when(F.col("user_id") % 2 == 0, F.col("value"))
    b = F.when(F.col("user_id") % 2 == 1, F.col("value"))
    z = (F.avg(a) - F.avg(b)) / F.sqrt(
        F.lit(1000.0) / F.count(a) + F.lit(1000.0) / F.count(b)
    )
    return ev.groupBy("event_type").agg(F.round(z, 6).alias("z"))


# ------------------- theta (KMV) sketch -State/-Merge, same gate as HLL
@register(
    "agg_theta_state_merge",
    oracle="""
    SELECT event_type, true AS within_tol
    FROM events GROUP BY event_type
    """,
)
def agg_theta_state_merge(spark: SparkSession, sf: str) -> DataFrame:
    """thetaSketchEstimate over -State/-Merge (reference
    AggregateFunctionThetaSketchEstimate.h, DataTypeSketchBinary.h): KMV
    bottom-k states per (type, day) merged to per-type, estimate gated
    within 5/sqrt(k) of the Spark-exact distinct."""
    from byconity_spark.udafs.sketches import (
        THETA_K,
        theta_estimate,
        theta_merge,
        theta_state,
    )

    ev = _t(spark, sf, "events").withColumn("day", F.to_date("ts"))
    states = theta_state(ev, ["event_type", "day"], "user_id")
    merged = theta_merge(states.drop("day"), ["event_type"])
    est = merged.select(
        "event_type", theta_estimate(F.col("theta_state")).alias("est")
    )
    exact = ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("exact"))
    tol = 5.0 / (THETA_K ** 0.5)
    return est.join(exact, "event_type").select(
        "event_type",
        (F.abs(F.col("est").cast("double") / F.col("exact") - 1.0) < tol).alias(
            "within_tol"
        ),
    )


# ------------------- frequency: fixed engagement-bucket histogram
@register(
    "agg_frequency",
    oracle="""
    WITH per_user AS (
      SELECT event_type, user_id, count(*) AS n
      FROM events GROUP BY event_type, user_id
    )
    SELECT event_type,
           array_to_string(
           [CAST(count(CASE WHEN n = 1 THEN 1 END) AS BIGINT),
            CAST(count(CASE WHEN n = 2 THEN 1 END) AS BIGINT),
            CAST(count(CASE WHEN n = 3 THEN 1 END) AS BIGINT),
            CAST(count(CASE WHEN n = 4 THEN 1 END) AS BIGINT),
            CAST(count(CASE WHEN n = 5 THEN 1 END) AS BIGINT),
            CAST(count(CASE WHEN n >= 6 AND n <= 10 THEN 1 END) AS BIGINT),
            CAST(count(CASE WHEN n >= 11 AND n <= 20 THEN 1 END) AS BIGINT),
            CAST(count(CASE WHEN n >= 21 AND n <= 50 THEN 1 END) AS BIGINT),
            CAST(count(CASE WHEN n > 50 AND n <= 100 THEN 1 END) AS BIGINT),
            CAST(count(CASE WHEN n > 100 THEN 1 END) AS BIGINT)], '|') AS freq
    FROM per_user GROUP BY event_type
    """,
)
def agg_frequency(spark: SparkSession, sf: str) -> DataFrame:
    """frequency (reference AggregateFunctionFrequency.h): per event type,
    the 10-bucket histogram of per-user event counts."""
    ev = _t(spark, sf, "events")
    per_user = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("n")
    )
    return per_user.groupBy("event_type").agg(
        arr_str(ch("frequency", F.col("n"))).alias("freq")
    )


# ---------------- misc aggregate names: avgWeighted / boundingRatio /
# sumCount / singleValueOrNull / groupArrayInsertAt (reference
# AggregateFunctionAvgWeighted.h, BoundingRatio.h, SumCount.h,
# SingleValueOrNull, GroupArrayInsertAt.h)
@register(
    "agg_misc_suite",
    oracle="""
    SELECT event_type,
           round(sum(value * user_id) / sum(user_id), 6)  AS w_avg,
           round((max(value) - min(value))
                 / (max(user_id) - min(user_id)), 6)      AS brat,
           round(sum(value), 4)                           AS s,
           count(value)                                   AS c,
           CASE WHEN count(DISTINCT event_type) = 1
                THEN any_value(event_type) END            AS single_val
    FROM events GROUP BY event_type
    """,
)
def agg_misc_suite(spark: SparkSession, sf: str) -> DataFrame:
    ev = _t(spark, sf, "events")
    v, u = F.col("value"), F.col("user_id")
    sc = ch("sumCount", v)
    return ev.groupBy("event_type").agg(
        F.round(ch("avgWeighted", v, u), 6).alias("w_avg"),
        F.round(ch("boundingRatio", u, v), 6).alias("brat"),
        F.round(sc.getField("sum"), 4).alias("s"),
        sc.getField("count").alias("c"),
        ch("singleValueOrNull", F.col("event_type")).alias("single_val"),
    )


# ------------------------- groupArrayInsertAt: position-addressed array
@register(
    "agg_group_array_insert_at",
    oracle="""
    WITH pairs AS (
      SELECT event_type, user_id % 10 AS pos, max(event_id) AS v
      FROM events WHERE user_id < 40
      GROUP BY event_type, user_id % 10
    )
    SELECT event_type,
           array_to_string(
           [coalesce(max(CASE WHEN pos = 0 THEN v END), -1),
            coalesce(max(CASE WHEN pos = 1 THEN v END), -1),
            coalesce(max(CASE WHEN pos = 2 THEN v END), -1),
            coalesce(max(CASE WHEN pos = 3 THEN v END), -1),
            coalesce(max(CASE WHEN pos = 4 THEN v END), -1),
            coalesce(max(CASE WHEN pos = 5 THEN v END), -1),
            coalesce(max(CASE WHEN pos = 6 THEN v END), -1),
            coalesce(max(CASE WHEN pos = 7 THEN v END), -1),
            coalesce(max(CASE WHEN pos = 8 THEN v END), -1),
            coalesce(max(CASE WHEN pos = 9 THEN v END), -1)], '|') AS arr
    FROM pairs GROUP BY event_type
    """,
)
def agg_group_array_insert_at(spark: SparkSession, sf: str) -> DataFrame:
    """groupArrayInsertAt(default, size)(value, pos) (reference
    AggregateFunctionGroupArrayInsertAt.h): array with each value placed at
    its position, default-filled holes.  Conditional max per slot — one
    map-side-combinable aggregate, no collect_list reshuffle."""
    ev = _t(spark, sf, "events").filter(F.col("user_id") < 40)
    pairs = ev.groupBy("event_type", (F.col("user_id") % 10).alias("pos")).agg(
        F.max("event_id").alias("v")
    )
    slots = [
        F.coalesce(
            F.max(F.when(F.col("pos") == p, F.col("v"))), F.lit(-1).cast("long")
        )
        for p in range(10)
    ]
    return pairs.groupBy("event_type").agg(arr_str(F.array(*slots)).alias("arr"))


# -------------------------------- -ForEach combinator: elementwise arrays
@register(
    "agg_foreach_suite",
    oracle="""
    WITH v AS (
      SELECT label,
             [CAST(embedding[1] AS DOUBLE), CAST(embedding[2] AS DOUBLE),
              CAST(embedding[3] AS DOUBLE), CAST(embedding[4] AS DOUBLE)] AS a
      FROM embeddings
    )
    SELECT label,
           array_to_string(list_transform(
             [round(sum(a[1]), 6), round(sum(a[2]), 6),
              round(sum(a[3]), 6), round(sum(a[4]), 6)],
             x -> printf('%.6f', x)), '|') AS sums,
           array_to_string(list_transform(
             [round(max(a[1]), 6), round(max(a[2]), 6),
              round(max(a[3]), 6), round(max(a[4]), 6)],
             x -> printf('%.6f', x)), '|') AS maxs,
           array_to_string(list_transform(
             [round(avg(a[1]), 6), round(avg(a[2]), 6),
              round(avg(a[3]), 6), round(avg(a[4]), 6)],
             x -> printf('%.6f', x)), '|') AS avgs
    FROM v GROUP BY label
    """,
)
def agg_foreach_suite(spark: SparkSession, sf: str) -> DataFrame:
    """sumForEach/maxForEach/avgForEach over the first 4 embedding dims
    (reference AggregateFunctionForEach.h).  Rounded: elementwise double
    sums are summation-order-dependent across engines."""
    emb = _t(spark, sf, "embeddings").select(
        "label", F.slice(F.col("embedding"), 1, 4).alias("a")
    )
    rnd = lambda c: F.transform(c, lambda x: F.round(x, 6))  # noqa: E731
    return emb.groupBy("label").agg(
        arr_dbl_str(rnd(ch("sumForEach", F.col("a")))).alias("sums"),
        arr_dbl_str(rnd(ch("maxForEach", F.col("a")))).alias("maxs"),
        arr_dbl_str(rnd(ch("avgForEach", F.col("a")))).alias("avgs"),
    )


# ------------------- -Stack combinator (stacked-graph cumulative resample)
_STACK_ORACLE = """
    SELECT event_type,
           concat(
             '0:',    printf('%.4f', round(coalesce(sum(CASE WHEN user_id >= 0 AND user_id < 50  THEN value END), 0), 4)),
             '|50:',  printf('%.4f', round(coalesce(sum(CASE WHEN user_id >= 0 AND user_id < 100 THEN value END), 0), 4)),
             '|100:', printf('%.4f', round(coalesce(sum(CASE WHEN user_id >= 0 AND user_id < 150 THEN value END), 0), 4))
           ) AS stack
    FROM events GROUP BY event_type
"""


def _stack_to_string(stack) -> "F.Column":
    return F.array_join(
        F.transform(
            stack,
            lambda s: F.concat_ws(
                ":",
                s.k.cast("string"),
                F.format_string(
                    "%.4f", F.round(F.coalesce(s.v, F.lit(0.0)), 4)
                ),
            ),
        ),
        "|",
    )


@register("agg_sum_stack", oracle=_STACK_ORACLE)
def agg_sum_stack(spark: SparkSession, sf: str) -> DataFrame:
    """sumStack(0, 150, 50)(value, user_id) (reference
    AggregateFunctionStackGraph.h AggregateFunctionStack): resample buckets
    whose emitted cell i is the CUMULATIVE merge of slots 0..i — the
    stacked-graph curve.  One conditional-masked aggregation pass."""
    ev = _t(spark, sf, "events")
    st = ch("sumStack", 0, 150, 50, F.col("value"), F.col("user_id"))
    return ev.groupBy("event_type").agg(_stack_to_string(st).alias("stack"))


@register("agg_merge_stream_stack", oracle=_STACK_ORACLE)
def agg_merge_stream_stack(spark: SparkSession, sf: str) -> DataFrame:
    """MergeStreamStack (reference AggregateFunctionStackGraph.h
    AggregateFunctionMergeStreamStack): element-wise SUM of per-stream
    stack curves with identical key vectors.  Sub-curves build per
    (event_type, user_id%4) shard; the merge must reproduce the whole-group
    curve exactly (sum is distributive), which the shared oracle asserts."""
    from byconity_spark.operators.aggregates import merge_stream_stack

    ev = _t(spark, sf, "events").withColumn("part", F.col("user_id") % 4)
    st = ch("sumStack", 0, 150, 50, F.col("value"), F.col("user_id"))
    sub = ev.groupBy("event_type", "part").agg(st.alias("curve"))
    merged = merge_stream_stack(sub.drop("part"), ["event_type"], "curve")
    return merged.select(
        "event_type", _stack_to_string(F.col("curve")).alias("stack")
    )


# ---------------- bitwise aggregates + uniqUpTo + simpleLinearRegression
@register(
    "agg_bitwise_linreg",
    oracle="""
    SELECT event_type,
           CAST(bit_and(user_id) AS BIGINT)                  AS band,
           CAST(bit_or(user_id) AS BIGINT)                   AS bor,
           CAST(bit_xor(user_id) AS BIGINT)                  AS bxor,
           CAST(least(count(DISTINCT user_id), 11) AS BIGINT) AS uniq_upto_10,
           round(regr_slope(value, CAST(user_id AS DOUBLE)), 4)     AS k,
           round(regr_intercept(value, CAST(user_id AS DOUBLE)), 4) AS b
    FROM events GROUP BY event_type
    """,
)
def agg_bitwise_linreg(spark: SparkSession, sf: str) -> DataFrame:
    """groupBitAnd/Or/Xor (reference AggregateFunctionBitwise.h),
    uniqUpTo(10) (AggregateFunctionUniqUpTo.h: exact count, saturating at
    threshold+1), simpleLinearRegression (returns the (k, b) fit tuple,
    AggregateFunctionSimpleLinearRegression.h)."""
    ev = _t(spark, sf, "events")
    u, v = F.col("user_id"), F.col("value")
    lin = ch("simpleLinearRegression", u.cast("double"), v)
    return ev.groupBy("event_type").agg(
        ch("groupBitAnd", u).cast("long").alias("band"),
        ch("groupBitOr", u).cast("long").alias("bor"),
        ch("groupBitXor", u).cast("long").alias("bxor"),
        ch("uniqUpTo", 10, u).cast("long").alias("uniq_upto_10"),
        F.round(lin.getField("k"), 4).alias("k"),
        F.round(lin.getField("b"), 4).alias("b"),
    )


# ------------------------------------------------ uniqCombined precision tiers
# uniqCombined(K)/uniqCombined64 (reference AggregateFunctionUniqCombined
# .cpp:100-126): the oracle cannot replay the HLL registers (different
# hash), so the check is exact-count equality PLUS error-banded booleans
# per precision tier — 5-sigma bands on 1.04/sqrt(2^K): 8% (K=12),
# 2% (K=16), 0.6% (K=20).
@register(
    "agg_uniq_combined_tiers",
    oracle="""
    SELECT event_type,
           count(DISTINCT user_id) AS exact_cnt,
           TRUE AS ok12, TRUE AS ok16, TRUE AS ok20
    FROM events GROUP BY event_type
    """,
)
def agg_uniq_combined_tiers(spark: SparkSession, sf: str) -> DataFrame:
    from byconity_spark.udafs.sketches import uniq_combined

    ev = _t(spark, sf, "events")
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_cnt")
    )
    out = exact
    for k, tol, name in ((12, 0.08, "ok12"), (16, 0.02, "ok16"), (20, 0.006, "ok20")):
        est = uniq_combined(ev, ["event_type"], "user_id", precision=k,
                            out_col=f"est{k}")
        out = out.join(est, "event_type")
        out = out.withColumn(
            name,
            (
                F.abs(F.col(f"est{k}") - F.col("exact_cnt"))
                <= F.greatest(F.lit(1.0), F.col("exact_cnt") * tol)
            ),
        ).drop(f"est{k}")
    return out


# ------------------------------------- groupConcat + deltaSumTimestamp
@register(
    "agg_concat_deltasum_ts",
    oracle="""
    WITH ds AS (
      SELECT event_type,
             sum(CASE WHEN dd > 0 THEN dd ELSE 0 END) AS delta_sum_ts
      FROM (SELECT event_type,
                   value - lag(value) OVER
                     (PARTITION BY event_type ORDER BY ts, event_id) AS dd
            FROM events)
      GROUP BY event_type
    ),
    gc AS (
      SELECT event_type,
             string_agg(d, ',' ORDER BY d) AS days_concat
      FROM (SELECT DISTINCT event_type,
                   CAST(CAST(ts AS DATE) AS VARCHAR) AS d FROM events)
      GROUP BY event_type
    )
    SELECT event_type, round(ds.delta_sum_ts, 3) AS delta_sum_ts,
           gc.days_concat
    FROM ds JOIN gc USING (event_type)
    """,
)
def agg_concat_deltasum_ts(spark: SparkSession, sf: str) -> DataFrame:
    """groupConcat (AggregateFunctionGroupConcat.cpp, sorted-deterministic
    form) + deltaSumTimestamp (AggregateFunctionDeltaSumTimestamp.h via
    the ts-ordered delta_sum frame op)."""
    from byconity_spark.functions.registry import delta_sum

    ev = _t(spark, sf, "events")
    ds = delta_sum(ev, ["event_type"], ["ts", "event_id"], "value").select(
        "event_type", F.round("delta_sum", 3).alias("delta_sum_ts")
    )
    days = ev.select(
        "event_type", F.to_date("ts").cast("string").alias("d")
    ).distinct()
    gc = days.groupBy("event_type").agg(
        ch("groupConcat", ",", F.col("d")).alias("days_concat")
    )
    return ds.join(gc, "event_type")


# ------------------- arbitrary / singleValueOrNull corner semantics
# (AggregateFunctionArbitrary.cpp, AggregateFunctionSingleValueOrNull.cpp —
# the last registered aggregate names).  `arbitrary` may return ANY group
# member, so the oracle-checked columns apply it to values CONSTANT within
# the group (any pick is the same value — deterministic by construction);
# singleValueOrNull's NULL-on-conflict shows on event_type (multi-typed
# users -> NULL, single-typed -> the type).
@register(
    "agg_arbitrary_single",
    oracle="""
    SELECT user_id,
           user_id % 7 AS arb_mod,
           CASE WHEN count(DISTINCT event_type) = 1
                THEN max(event_type) END AS single_type,
           user_id % 2 AS single_flag,
           count(*) AS n
    FROM events WHERE user_id < 50 GROUP BY user_id
    """,
)
def agg_arbitrary_single(spark: SparkSession, sf: str) -> DataFrame:
    ev = _t(spark, sf, "events").filter(F.col("user_id") < 50)
    return ev.groupBy("user_id").agg(
        ch("arbitrary", F.col("user_id") % 7).alias("arb_mod"),
        ch("singleValueOrNull", F.col("event_type")).alias("single_type"),
        ch("singleValueOrNull", F.col("user_id") % 2).alias("single_flag"),
        F.count(F.lit(1)).alias("n"),
    )


# ----------------- skew/kurt moment aggregates + pooled t
# (AggregateFunctionStatisticsSimple.cpp: skewPop/skewSamp/kurtPop/
# kurtSamp — CH flavors: skewPop=m3/m2^1.5, skewSamp=m3/s^3 with SAMPLE
# variance, kurtPop=m4/m2^2 (not excess), kurtSamp=m4/s^4; StudentTTest.h
# pooled-variance t).  round(5): the central-moment subtraction amplifies
# double summation-order ulps between engines (~1e-7 at 60k rows).
@register(
    "agg_moments_suite",
    oracle="""
    WITH s AS (SELECT event_type,
                      count(*)::DOUBLE AS n, avg(value) AS mean,
                      avg(value*value) AS s2, avg(value*value*value) AS s3,
                      avg(value*value*value*value) AS s4,
                      avg(CASE WHEN user_id % 2 = 0 THEN value END) AS a1,
                      avg(CASE WHEN user_id % 2 != 0 THEN value END) AS a0,
                      var_samp(CASE WHEN user_id % 2 = 0 THEN value END) AS v1,
                      var_samp(CASE WHEN user_id % 2 != 0 THEN value END) AS v0,
                      count(CASE WHEN user_id % 2 = 0 THEN 1 END)::DOUBLE AS n1,
                      count(CASE WHEN user_id % 2 != 0 THEN 1 END)::DOUBLE AS n0
               FROM events GROUP BY event_type),
    m AS (SELECT event_type, n, a1, a0, v1, v0, n1, n0,
                 s2 - mean*mean AS m2,
                 s3 - 3*mean*s2 + 2*mean*mean*mean AS m3,
                 s4 - 4*mean*s3 + 6*mean*mean*s2
                   - 3*mean*mean*mean*mean AS m4
          FROM s)
    SELECT event_type,
           round(m3 / pow(m2, 1.5), 5)              AS skew_pop,
           round(m3 / pow(n/(n-1)*m2, 1.5), 5)      AS skew_samp,
           round(m4 / (m2*m2), 5)                   AS kurt_pop,
           round(m4 / pow(n/(n-1)*m2, 2), 5)        AS kurt_samp,
           round((a1 - a0) / sqrt(((n1-1)*v1 + (n0-1)*v0) / (n1+n0-2)
                 * (1/n1 + 1/n0)), 5)               AS t_stat
    FROM m
    """,
)
def agg_moments_suite(spark: SparkSession, sf: str) -> DataFrame:
    ev = _t(spark, sf, "events")
    v, even = F.col("value"), F.col("user_id") % 2 == 0
    return ev.groupBy("event_type").agg(
        F.round(ch("skewPop", v), 5).alias("skew_pop"),
        F.round(ch("skewSamp", v), 5).alias("skew_samp"),
        F.round(ch("kurtPop", v), 5).alias("kurt_pop"),
        F.round(ch("kurtSamp", v), 5).alias("kurt_samp"),
        F.round(ch("studentTTest", v, even), 5).alias("t_stat"),
    )


# ------------------------------------------- round-6 agg parity extension
# (registry_ext batch 3): SQL-standard aliases, medianExactLow/High picks,
# deltaSumTimestamp sorted-fold, welch/mann-whitney/rankCorr Column forms,
# deterministic topK, sorted GROUP_CONCAT.
@register(
    "agg_parity_ext_suite",
    oracle="""
    WITH ev AS (
      -- ~2% deterministic sample (odd modulus keeps user parity mixed): the rank-based columns (mwu/rankc) are
      -- O(n^2) folds per group in the Column form; bounded-group inputs are
      -- the documented contract (the scale path is the window-rank variant
      -- in workloads/behavioral.py)
      SELECT event_type, value, ts, user_id,
             epoch(date_trunc('second', ts)) AS sec
      FROM events WHERE user_id % 49 = 7
    ),
    ranks AS (
      SELECT event_type, value, sec, user_id,
             rank() OVER (PARTITION BY event_type ORDER BY value)
               + (count(*) OVER (PARTITION BY event_type, value) - 1) / 2.0
               AS rv,
             rank() OVER (PARTITION BY event_type ORDER BY sec)
               + (count(*) OVER (PARTITION BY event_type, sec) - 1) / 2.0
               AS rs
      FROM ev
    ),
    delta AS (
      SELECT event_type,
             CASE WHEN value > lag_v THEN value - lag_v ELSE 0 END AS inc
      FROM (SELECT event_type, value,
                   lag(value) OVER (PARTITION BY event_type
                                    ORDER BY ts, value) AS lag_v
            FROM ev)
    ),
    counts AS (
      SELECT event_type, user_id % 3 AS tag, count(*) AS cnt
      FROM ev GROUP BY 1, 2
    ),
    topk AS (
      SELECT event_type, string_agg(CAST(tag AS VARCHAR), '|' ORDER BY rn) AS top2
      FROM (SELECT event_type, tag,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY cnt DESC, CAST(tag AS VARCHAR)) AS rn
            FROM counts)
      WHERE rn <= 2 GROUP BY event_type
    )
    SELECT e.event_type,
           CAST(count(*) AS BIGINT)                              AS n,
           round(stddev_pop(e.value), 6)                         AS std_pop,
           round(var_pop(e.value), 6)                            AS var_p,
           quantile_disc(e.value, 0.5)                           AS medlow,
           -quantile_disc(-e.value, 0.5)                         AS medhigh,
           round((SELECT sum(inc) FROM delta d
                  WHERE d.event_type = e.event_type), 4)         AS dsum_ts,
           round((avg(CASE WHEN e.user_id % 2 = 0 THEN e.value END)
                  - avg(CASE WHEN e.user_id % 2 = 1 THEN e.value END))
                 / sqrt(var_samp(CASE WHEN e.user_id % 2 = 0 THEN e.value END)
                        / count(CASE WHEN e.user_id % 2 = 0 THEN e.value END)
                        + var_samp(CASE WHEN e.user_id % 2 = 1 THEN e.value END)
                        / count(CASE WHEN e.user_id % 2 = 1 THEN e.value END)),
                 6)                                              AS welch_t,
           round((SELECT sum(r.rv) FROM ranks r
                  WHERE r.event_type = e.event_type AND r.user_id % 2 = 0)
                 - count(CASE WHEN e.user_id % 2 = 0 THEN 1 END)
                   * (count(CASE WHEN e.user_id % 2 = 0 THEN 1 END) + 1) / 2.0,
                 4)                                              AS mwu,
           round((SELECT corr(r.rv, r.rs) FROM ranks r
                  WHERE r.event_type = e.event_type), 6)         AS rankc,
           (SELECT t.top2 FROM topk t
            WHERE t.event_type = e.event_type)                   AS top2
    FROM ev e
    GROUP BY e.event_type
    """,
)
def agg_parity_ext_suite(spark: SparkSession, sf: str) -> DataFrame:
    from byconity_spark.functions.registry import ch_agg

    ev = (
        _t(spark, sf, "events")
        .filter(F.col("user_id") % 49 == 7)  # bounded groups for the O(n^2) folds
        .select(
            "event_type", "value", "ts", "user_id",
            F.unix_timestamp(F.date_trunc("second", F.col("ts"))).alias("sec"),
        )
    )
    v = F.col("value")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(ch_agg("STD", v), 6).alias("std_pop"),
        F.round(ch_agg("VARIANCE", v), 6).alias("var_p"),
        ch_agg("medianExactLow", v).alias("medlow"),
        ch_agg("medianExactHigh", v).alias("medhigh"),
        F.round(ch_agg("deltaSumTimestamp", v, F.struct(
            F.col("ts").alias("t0"), v.alias("t1"))), 4).alias("dsum_ts"),
        F.round(
            ch_agg("welchTTest", v, (F.col("user_id") % 2).cast("int"))
            ["t_statistic"], 6
        ).alias("welch_t"),
        F.round(
            ch_agg("mannWhitneyUTest", v, (F.col("user_id") % 2).cast("int"))
            ["u_statistic"], 4
        ).alias("mwu"),
        F.round(ch_agg("rankCorr", v, F.col("sec")), 6).alias("rankc"),
        F.array_join(
            ch_agg("topK", 2, (F.col("user_id") % 3).cast("string")), "|"
        ).alias("top2"),
    )


# uniqTheta set algebra (reference uniqThetaUnion/Intersect/Not over
# DataSketches states; udafs/sketches.py theta KMV states + explicit-theta
# set ops).  Audiences are bounded to < THETA_K distinct members, where the
# KMV retains every hash (theta = 1.0) and the set algebra is EXACT — so a
# plain COUNT(DISTINCT ...) SQL oracle applies.
@register(
    "agg_theta_setops",
    oracle="""
    WITH a AS (SELECT DISTINCT user_id % 700 AS m FROM events
               WHERE event_type = 'purchase'),
         b AS (SELECT DISTINCT user_id % 700 AS m FROM events
               WHERE event_type = 'click')
    SELECT CAST((SELECT count(*) FROM (SELECT m FROM a UNION SELECT m FROM b))
                AS BIGINT) AS u,
           CAST((SELECT count(*) FROM (SELECT m FROM a INTERSECT SELECT m FROM b))
                AS BIGINT) AS i,
           CAST((SELECT count(*) FROM (SELECT m FROM a EXCEPT SELECT m FROM b))
                AS BIGINT) AS d
    """,
)
def agg_theta_setops(spark: SparkSession, sf: str) -> DataFrame:
    from byconity_spark.functions import ch
    from byconity_spark.udafs.sketches import theta_state

    ev = _t(spark, sf, "events").filter(
        F.col("event_type").isin("purchase", "click")
    ).select("event_type", (F.col("user_id") % 700).alias("m"))
    states = theta_state(ev, ["event_type"], "m")
    wide = (
        states.filter(F.col("event_type") == "purchase")
        .select(F.col("theta_state").alias("sa"))
        .crossJoin(
            states.filter(F.col("event_type") == "click")
            .select(F.col("theta_state").alias("sb"))
        )
    )
    return wide.select(
        ch("uniqThetaSetEstimate",
           ch("uniqThetaUnion", F.col("sa"), F.col("sb"))).alias("u"),
        ch("uniqThetaSetEstimate",
           ch("uniqThetaIntersect", F.col("sa"), F.col("sb"))).alias("i"),
        ch("uniqThetaSetEstimate",
           ch("uniqThetaNot", F.col("sa"), F.col("sb"))).alias("d"),
    )
