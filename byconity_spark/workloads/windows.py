"""Window-function workload over the events/orders tables.

Covers the reference's window surface (src/Processors/Transforms/
WindowTransform.cpp:2445-2538 registrations; frame spec
src/Interpreters/WindowDescription.h:54-68 — ROWS and RANGE frames; GROUPS
frames are documented-unsupported, Spark lacks them too): rank, dense_rank,
row_number, percent_rank, cume_dist, ntile, nth_value, lag/lead, plus
arbitrary aggregates over ROWS/RANGE frames.

Determinism: every window ordering ends in a unique tiebreak column
(event_id / orderkey) so ROWS frames and rank ties hash identically on both
engines.

Scale notes: a window = one shuffle on the partition keys + an in-partition
sort.  user_id / o_custkey partitions are numerous and small, so the shuffle
is well-spread; AQE's skew-split handles hot users.  No driver-side work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from byconity_spark.engine.catalog import load_table
from byconity_spark.workloads import register


def _t(spark: SparkSession, sf: str, name: str) -> DataFrame:
    return load_table(spark, sf, name)


# --------------------------------------------------------------------------
# Ranking trio per customer over their orders; keep each customer's 2 most
# recent orders (the PartitionTopN shape — Catalyst's InferWindowGroupLimit
# pushes a partial group-limit below the shuffle, ByConity's
# FilterWindowToPartitionTopN.h analogue).
# --------------------------------------------------------------------------
@register(
    "win_rank_recent_orders",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey,
             CAST(o_orderdate AS DATE) AS orderdate,
             row_number() OVER w AS rn,
             rank()       OVER w AS rk,
             dense_rank() OVER w AS drk
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey)
    ) WHERE rn <= 2
    """,
)
def win_rank_recent_orders(spark: SparkSession, sf: str) -> DataFrame:
    o = _t(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("orderdate"),
            F.row_number().over(w).cast("long").alias("rn"),
            F.rank().over(w).cast("long").alias("rk"),
            F.dense_rank().over(w).cast("long").alias("drk"),
        )
        .filter(F.col("rn") <= 2)
    )


# --------------------------------------------------------------------------
# lag/lead navigation per user ordered by event time (WindowTransform.cpp
# lagInFrame/leadInFrame :2122).
# --------------------------------------------------------------------------
@register(
    "win_lag_lead_user_activity",
    oracle="""
    SELECT event_id, user_id,
           lag(value)  OVER w AS prev_value,
           lead(value) OVER w AS next_value,
           epoch_us(CAST(ts AS TIMESTAMP))
             - epoch_us(lag(CAST(ts AS TIMESTAMP)) OVER w) AS gap_us
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
    """,
)
def win_lag_lead_user_activity(spark: SparkSession, sf: str) -> DataFrame:
    ev = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return ev.select(
        "event_id",
        "user_id",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        (F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))).alias("gap_us"),
    )


# --------------------------------------------------------------------------
# ROWS and RANGE frames: running sum, 3-row sliding average, and a 1-hour
# RANGE sliding event count (WindowDescription.h FrameType Rows/Range).
# --------------------------------------------------------------------------
@register(
    "win_frames_running_value",
    oracle="""
    SELECT event_id, user_id,
           sum(value) OVER (PARTITION BY user_id
                            ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS running_sum,
           avg(value) OVER (PARTITION BY user_id
                            ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id
                            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
             AS sliding_avg3,
           count(*) OVER (PARTITION BY user_id
                          ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
                          RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
             AS n_last_hour
    FROM events
    """,
)
def win_frames_running_value(spark: SparkSession, sf: str) -> DataFrame:
    ev = _t(spark, sf, "events").withColumn("__us", F.unix_micros(F.col("ts")))
    w_rows = Window.partitionBy("user_id").orderBy(F.col("__us").asc(), F.col("event_id").asc())
    w_range = Window.partitionBy("user_id").orderBy(F.col("__us").asc())
    return ev.select(
        "event_id",
        "user_id",
        F.sum("value")
        .over(w_rows.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("running_sum"),
        F.avg("value").over(w_rows.rowsBetween(-2, Window.currentRow)).alias("sliding_avg3"),
        F.count(F.lit(1))
        .over(w_range.rangeBetween(-3_600_000_000, Window.currentRow))
        .alias("n_last_hour"),
    )


# --------------------------------------------------------------------------
# Distribution functions: ntile / percent_rank / cume_dist / nth_value per
# event_type partition (WindowTransform.cpp :1871-:2043).
# --------------------------------------------------------------------------
@register(
    "win_distribution_by_type",
    oracle="""
    SELECT event_id, event_type,
           ntile(4)       OVER w AS quartile,
           percent_rank() OVER w AS pct_rank,
           cume_dist()    OVER w AS cum_dist,
           nth_value(value, 3) OVER w AS third_value
    FROM events
    WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
    """,
)
def win_distribution_by_type(spark: SparkSession, sf: str) -> DataFrame:
    ev = _t(spark, sf, "events")
    w = Window.partitionBy("event_type").orderBy(F.col("value").asc(), F.col("event_id").asc())
    return ev.select(
        "event_id",
        "event_type",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cum_dist"),
        F.nth_value("value", 3).over(w).alias("third_value"),
    )


# --------------------------------------------------------------------------
# nonNegativeDerivative + deltaSum: rate-of-change per second (clamped at 0)
# and the per-user sum of positive increments (WindowTransform.cpp :2331
# nonNegativeDerivative registration; AggregateFunctionDeltaSum).
# --------------------------------------------------------------------------
@register(
    "win_derivative_delta",
    oracle="""
    WITH d AS (
      SELECT user_id, event_id, value,
             epoch_us(CAST(ts AS TIMESTAMP)) AS us,
             lag(value) OVER w AS prev_v,
             lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER w AS prev_us
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
    )
    SELECT user_id,
           sum(greatest(value - prev_v, 0.0))     AS delta_sum,
           max(greatest((value - prev_v) / ((us - prev_us) / 1000000.0), 0.0))
                                                  AS max_rate_per_sec
    FROM d WHERE prev_v IS NOT NULL
    GROUP BY user_id
    """,
)
def win_derivative_delta(spark: SparkSession, sf: str) -> DataFrame:
    ev = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    us = F.unix_micros(F.col("ts"))
    d = ev.select(
        "user_id",
        "value",
        F.lag("value").over(w).alias("prev_v"),
        us.alias("us"),
        F.lag(us).over(w).alias("prev_us"),
    ).filter(F.col("prev_v").isNotNull())
    diff = F.col("value") - F.col("prev_v")
    rate = diff / ((F.col("us") - F.col("prev_us")) / 1_000_000.0)
    return d.groupBy("user_id").agg(
        F.sum(F.greatest(diff, F.lit(0.0))).alias("delta_sum"),
        F.max(F.greatest(rate, F.lit(0.0))).alias("max_rate_per_sec"),
    )


# --------------------------------------------------------------------------
# Sessionization via lag-gap flags: a new session starts after a >30 min
# silence.  The window form of ByConity's sessionSplit UDAF
# (AggregateFunctionSessionSplit.cpp) — the applyInPandas kernel variant
# lives in udafs/behavioral.py.
# --------------------------------------------------------------------------
@register(
    "win_sessionize_users",
    oracle="""
    WITH flagged AS (
      SELECT user_id,
             CASE WHEN epoch_us(CAST(ts AS TIMESTAMP))
                       - epoch_us(lag(CAST(ts AS TIMESTAMP))
                                  OVER (PARTITION BY user_id
                                        ORDER BY CAST(ts AS TIMESTAMP), event_id))
                       > 1800000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    )
    SELECT user_id,
           CAST(1 + sum(new_session) AS BIGINT) AS n_sessions,
           count(*)             AS n_events
    FROM flagged GROUP BY user_id
    """,
)
def win_sessionize_users(spark: SparkSession, sf: str) -> DataFrame:
    ev = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    flagged = ev.select(
        "user_id", F.when(gap > 1_800_000_000, 1).otherwise(0).alias("new_session")
    )
    return flagged.groupBy("user_id").agg(
        (F.lit(1) + F.sum("new_session")).alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )


# --------------------------------------- GROUPS frame (peer-group bounds)
@register(
    "win_groups_frame_sum",
    oracle="""
    -- GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING, stated independently:
    -- aggregate per peer group (priority, date), then each row's frame is
    -- the previous/current/next group's aggregate (DuckDB has no GROUPS)
    WITH d AS (SELECT o_orderpriority, o_orderdate,
                      sum(o_totalprice) AS s, count(*) AS c
               FROM orders GROUP BY 1, 2),
    d2 AS (SELECT o_orderpriority, o_orderdate,
                  round(coalesce(lag(s)  OVER w, 0) + s + coalesce(lead(s) OVER w, 0), 2) AS grp_sum,
                  coalesce(lag(c)  OVER w, 0) + c + coalesce(lead(c) OVER w, 0) AS grp_n
           FROM d WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderdate))
    SELECT o.o_orderkey, o.o_orderpriority, o.o_orderdate, d2.grp_sum, d2.grp_n
    FROM orders o JOIN d2 USING (o_orderpriority, o_orderdate)
    """,
)
def win_groups_frame_sum(spark: SparkSession, sf: str) -> DataFrame:
    """GROUPS frame emulation (operators/windows.py): dense_rank collapses
    each peer group to one integer, RANGE over it = GROUPS frame.  Matches
    reference WindowTransform.cpp FrameType::Groups."""
    from byconity_spark.operators.windows import groups_frame_agg

    o = _t(spark, sf, "orders")
    out = groups_frame_agg(
        o.select("o_orderkey", "o_orderpriority", "o_orderdate", "o_totalprice"),
        partition_by=["o_orderpriority"],
        order_by="o_orderdate",
        aggs={
            "grp_sum": F.sum("o_totalprice"),
            "grp_n": F.count(F.lit(1)),
        },
    ).drop("o_totalprice")
    return out.withColumn("grp_sum", F.round("grp_sum", 2))


# --------------------------------------------------------------------------
# lagInFrame / leadInFrame (WindowTransform.cpp:2524,2531; the lag/lead
# aliases at :2545 map to them): frame-RESPECTING offsets — NULL when the
# offset row leaves the ROWS frame, unlike Spark/ANSI lag which ignore it.
# Frame here: ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING; offset 2 stays in
# frame (= plain lag/lead), offset 3 always leaves it (frame-clip -> NULL
# for every row, which the plain-lag contrast column shows is NOT what ANSI
# lag produces).
# --------------------------------------------------------------------------
@register(
    "win_lag_in_frame",
    oracle="""
    WITH e AS (SELECT user_id, event_id, value,
                      row_number() OVER w AS rn,
                      lag(value, 2)  OVER w AS lag2,
                      lead(value, 2) OVER w AS lead2,
                      lag(value, 3)  OVER w AS ansi_lag3
               FROM events
               WINDOW w AS (PARTITION BY user_id
                            ORDER BY CAST(ts AS TIMESTAMP), event_id))
    SELECT user_id, event_id,
           round(lag2, 6)           AS lag_in_frame_2,
           CAST(NULL AS DOUBLE)     AS lag_in_frame_3,
           round(lead2, 6)          AS lead_in_frame_2,
           round(ansi_lag3, 6)      AS ansi_lag_3
    FROM e WHERE user_id < 30
    """,
)
def win_lag_in_frame(spark: SparkSession, sf: str) -> DataFrame:
    from byconity_spark.operators.windows import lag_in_frame, lead_in_frame

    ev = _t(spark, sf, "events").filter(F.col("user_id") < 30)
    pb, ob = ["user_id"], ["ts", "event_id"]
    w = Window.partitionBy(*pb).orderBy(*ob)
    return ev.select(
        "user_id",
        "event_id",
        F.round(lag_in_frame("value", 2, pb, ob, preceding=2, following=2), 6)
        .alias("lag_in_frame_2"),
        F.round(lag_in_frame("value", 3, pb, ob, preceding=2, following=2), 6)
        .alias("lag_in_frame_3"),
        F.round(lead_in_frame("value", 2, pb, ob, following=2, preceding=2), 6)
        .alias("lead_in_frame_2"),
        F.round(F.lag("value", 3).over(w), 6).alias("ansi_lag_3"),
    )


@register(
    "win_running_concurrency",
    oracle="""
    WITH iv AS (
      SELECT user_id, event_id, ts AS b,
             ts + to_seconds(60 * (1 + event_id % 5)) AS e
      FROM events WHERE event_type = 'click' AND user_id < 500
    ),
    ev AS (
      SELECT user_id, b AS t, 1 AS d, e FROM iv
      UNION ALL
      SELECT user_id, e AS t, -1 AS d, e FROM iv
    ),
    s AS (
      SELECT user_id, d,
             sum(d) OVER (PARTITION BY user_id ORDER BY t, d, e
                          ROWS UNBOUNDED PRECEDING) AS conc
      FROM ev
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT)    AS n_intervals,
           CAST(max(conc) AS BIGINT)   AS max_conc,
           CAST(sum(conc) AS BIGINT)   AS sum_conc
    FROM s WHERE d = 1
    GROUP BY user_id ORDER BY user_id
    """,
)
def win_running_concurrency(spark: SparkSession, sf: str) -> DataFrame:
    """runningConcurrency (src/Functions/runningConcurrency.cpp) over
    per-user click intervals: each click opens an interval of 1-5 minutes;
    the operator reports how many intervals are open at each begin
    instant.  Aggregated per user (max + sum of concurrency) because the
    per-row value is tie-order-dependent while its multiset is not — the
    same reason the DuckDB oracle folds the identical event stream."""
    from byconity_spark.operators.windows import running_concurrency

    ev = _t(spark, sf, "events").filter(
        (F.col("event_type") == "click") & (F.col("user_id") < 500)
    )
    iv = ev.select(
        "user_id",
        "event_id",
        F.col("ts").alias("b"),
        (
            F.col("ts")
            + F.make_interval(secs=(60 * (1 + F.col("event_id") % 5)))
        ).alias("e"),
    )
    scored = running_concurrency(iv, "b", "e", partition_by=["user_id"])
    return (
        scored.groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_intervals"),
            F.max("concurrency").cast("long").alias("max_conc"),
            F.sum("concurrency").cast("long").alias("sum_conc"),
        )
        .orderBy("user_id")
    )
