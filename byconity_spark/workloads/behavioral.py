"""Behavioral-analytics workload over the events table — the registered,
oracle-checked surface of the udafs/behavioral.py kernels.

Reference: AggregateFunctionWindowFunnel.cpp, AggregateFunctionRetention.cpp,
AggregateFunctionSequenceMatch.cpp, AggregateFunctionSessionSplit.cpp.

Each oracle reimplements the exact kernel semantics in ANSI SQL (conditional
min-timestamp chains / boolean aggregates / lag-gap windows) so DuckDB can
hash-check the Arrow-batched applyInPandas kernels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from byconity_spark.engine.catalog import load_table
from byconity_spark.udafs.behavioral import (
    auc,
    interval_length_sum,
    retention,
    sequence_count,
    sequence_match,
    sequence_next_node,
    session_split,
    window_funnel,
)
from byconity_spark.workloads import register
from byconity_spark.workloads._arrays import stringify_arrays

_DAY_US = 86_400_000_000


def _ev(spark: SparkSession, sf: str) -> DataFrame:
    return load_table(spark, sf, "events")


# --------------------------------------------------------------------------
# windowFunnel(7 days)(signup -> click -> purchase), first-anchor variant.
# --------------------------------------------------------------------------
@register(
    "beh_window_funnel",
    oracle="""
    WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM events),
    u1 AS (SELECT user_id, min(ts) AS t1 FROM e WHERE event_type = 'signup' GROUP BY user_id),
    u2 AS (SELECT e.user_id, min(e.ts) AS t2
           FROM e JOIN u1 ON e.user_id = u1.user_id
           WHERE e.event_type = 'click' AND e.ts > u1.t1
             AND e.ts <= u1.t1 + INTERVAL 7 DAY
           GROUP BY e.user_id),
    u3 AS (SELECT e.user_id, min(e.ts) AS t3
           FROM e JOIN u1 ON e.user_id = u1.user_id
                  JOIN u2 ON e.user_id = u2.user_id
           WHERE e.event_type = 'purchase' AND e.ts > u2.t2
             AND e.ts <= u1.t1 + INTERVAL 7 DAY
           GROUP BY e.user_id)
    SELECT u.user_id,
           CASE WHEN u3.user_id IS NOT NULL THEN 3
                WHEN u2.user_id IS NOT NULL THEN 2
                WHEN u1.user_id IS NOT NULL THEN 1
                ELSE 0 END AS funnel_level
    FROM (SELECT DISTINCT user_id FROM e) u
    LEFT JOIN u1 ON u.user_id = u1.user_id
    LEFT JOIN u2 ON u.user_id = u2.user_id
    LEFT JOIN u3 ON u.user_id = u3.user_id
    """,
)
def beh_window_funnel(spark: SparkSession, sf: str) -> DataFrame:
    return window_funnel(
        _ev(spark, sf), window_us=7 * _DAY_US, steps=["signup", "click", "purchase"]
    )


# --------------------------------------------------------------------------
# windowFunnel, ClickHouse-DEFAULT sliding-anchor semantics: every signup
# re-anchors the chain, so a late signup can rescue a funnel the first
# signup's window missed.  Oracle: the sliding walk is equivalent to chain
# EXISTENCE (for the default flags) — level >= k iff some signup->...->step_k
# chain fits inside one window — because the stored anchor is always the
# LATEST feasible one, which maximizes anchor+window (proof sketch in
# udafs/behavioral.py funnel_level_sliding_core docstring).  Ties: the
# events table has no duplicate (user_id, ts) pairs, so strict > in the
# oracle equals scan-order-after in the kernel.
# --------------------------------------------------------------------------
@register(
    "beh_window_funnel_sliding",
    oracle="""
    WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM events),
    l1 AS (SELECT DISTINCT user_id FROM e WHERE event_type = 'signup'),
    l2 AS (SELECT DISTINCT a.user_id
           FROM e a JOIN e b ON a.user_id = b.user_id
           WHERE a.event_type = 'signup' AND b.event_type = 'click'
             AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 7 DAY),
    l3 AS (SELECT DISTINCT a.user_id
           FROM e a JOIN e b ON a.user_id = b.user_id
                    JOIN e c ON a.user_id = c.user_id
           WHERE a.event_type = 'signup' AND b.event_type = 'click'
             AND c.event_type = 'purchase'
             AND b.ts > a.ts AND c.ts > b.ts
             AND c.ts <= a.ts + INTERVAL 7 DAY)
    SELECT u.user_id,
           CASE WHEN l3.user_id IS NOT NULL THEN 3
                WHEN l2.user_id IS NOT NULL THEN 2
                WHEN l1.user_id IS NOT NULL THEN 1
                ELSE 0 END AS funnel_level
    FROM (SELECT DISTINCT user_id FROM e) u
    LEFT JOIN l1 ON u.user_id = l1.user_id
    LEFT JOIN l2 ON u.user_id = l2.user_id
    LEFT JOIN l3 ON u.user_id = l3.user_id
    """,
)
def beh_window_funnel_sliding(spark: SparkSession, sf: str) -> DataFrame:
    from byconity_spark.udafs.behavioral import window_funnel_modes

    return window_funnel_modes(
        _ev(spark, sf),
        window_us=7 * _DAY_US,
        steps=["signup", "click", "purchase"],
        sliding=True,
    )


# --------------------------------------------------------------------------
# windowFunnel strict_order: after the first signup, the user's very next
# events (ANY type) must be click then purchase, inside the window.
# --------------------------------------------------------------------------
@register(
    "beh_funnel_strict_order",
    oracle="""
    WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM events),
    a AS (SELECT user_id, min(ts) AS t1 FROM e WHERE event_type = 'signup' GROUP BY user_id),
    seq AS (
      SELECT e.user_id, e.event_type, e.ts, a.t1,
             row_number() OVER (PARTITION BY e.user_id ORDER BY e.ts, e.event_id) AS rn
      FROM e JOIN a ON e.user_id = a.user_id
      WHERE e.ts > a.t1
    ),
    l2 AS (SELECT user_id FROM seq
           WHERE rn = 1 AND event_type = 'click' AND ts <= t1 + INTERVAL 7 DAY),
    l3 AS (SELECT s.user_id FROM seq s JOIN l2 ON s.user_id = l2.user_id
           WHERE s.rn = 2 AND s.event_type = 'purchase' AND s.ts <= s.t1 + INTERVAL 7 DAY)
    SELECT u.user_id,
           CASE WHEN l3.user_id IS NOT NULL THEN 3
                WHEN l2.user_id IS NOT NULL THEN 2
                WHEN a.user_id IS NOT NULL THEN 1
                ELSE 0 END AS funnel_level
    FROM (SELECT DISTINCT user_id FROM e) u
    LEFT JOIN a  ON u.user_id = a.user_id
    LEFT JOIN l2 ON u.user_id = l2.user_id
    LEFT JOIN l3 ON u.user_id = l3.user_id
    """,
)
def beh_funnel_strict_order(spark: SparkSession, sf: str) -> DataFrame:
    from byconity_spark.udafs.behavioral import window_funnel_modes

    return window_funnel_modes(
        _ev(spark, sf),
        window_us=7 * _DAY_US,
        steps=["signup", "click", "purchase"],
        strict_order=True,
    )


# --------------------------------------------------------------------------
# windowFunnel strict_deduplication: a repeat of an already-matched step
# before the next step freezes the level (signup..signup..click -> 1).
# --------------------------------------------------------------------------
@register(
    "beh_funnel_strict_dedup",
    oracle="""
    WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM events),
    a AS (SELECT user_id, min(ts) AS t1 FROM e WHERE event_type = 'signup' GROUP BY user_id),
    c2 AS (SELECT e.user_id, min(e.ts) AS t2
           FROM e JOIN a ON e.user_id = a.user_id
           WHERE e.event_type = 'click' AND e.ts > a.t1
             AND e.ts <= a.t1 + INTERVAL 7 DAY
           GROUP BY e.user_id),
    d1 AS (SELECT e.user_id, min(e.ts) AS dts
           FROM e JOIN a ON e.user_id = a.user_id
           WHERE e.event_type = 'signup' AND e.ts > a.t1
           GROUP BY e.user_id),
    ok2 AS (SELECT c2.user_id, c2.t2 FROM c2
            LEFT JOIN d1 ON c2.user_id = d1.user_id
            WHERE d1.dts IS NULL OR d1.dts > c2.t2),
    p3 AS (SELECT e.user_id, min(e.ts) AS t3
           FROM e JOIN ok2 ON e.user_id = ok2.user_id
                  JOIN a   ON e.user_id = a.user_id
           WHERE e.event_type = 'purchase' AND e.ts > ok2.t2
             AND e.ts <= a.t1 + INTERVAL 7 DAY
           GROUP BY e.user_id),
    d2 AS (SELECT e.user_id, min(e.ts) AS dts
           FROM e JOIN ok2 ON e.user_id = ok2.user_id
           WHERE e.event_type IN ('signup', 'click') AND e.ts > ok2.t2
           GROUP BY e.user_id),
    ok3 AS (SELECT p3.user_id FROM p3
            LEFT JOIN d2 ON p3.user_id = d2.user_id
            WHERE d2.dts IS NULL OR d2.dts > p3.t3)
    SELECT u.user_id,
           CASE WHEN ok3.user_id IS NOT NULL THEN 3
                WHEN ok2.user_id IS NOT NULL THEN 2
                WHEN a.user_id IS NOT NULL THEN 1
                ELSE 0 END AS funnel_level
    FROM (SELECT DISTINCT user_id FROM e) u
    LEFT JOIN a   ON u.user_id = a.user_id
    LEFT JOIN ok2 ON u.user_id = ok2.user_id
    LEFT JOIN ok3 ON u.user_id = ok3.user_id
    """,
)
def beh_funnel_strict_dedup(spark: SparkSession, sf: str) -> DataFrame:
    from byconity_spark.udafs.behavioral import window_funnel_modes

    return window_funnel_modes(
        _ev(spark, sf),
        window_us=7 * _DAY_US,
        steps=["signup", "click", "purchase"],
        strict_dedup=True,
    )


# --------------------------------------------------------------------------
# retention(signup, purchase, error): r1 / r1&r2 / r1&r3 flags per user.
# --------------------------------------------------------------------------
@register(
    "beh_retention",
    oracle="""
    SELECT user_id,
           max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS r1,
           max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
             * max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS r2,
           max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
             * max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS r3
    FROM events GROUP BY user_id
    """,
)
def beh_retention(spark: SparkSession, sf: str) -> DataFrame:
    ev = _ev(spark, sf)
    return retention(
        ev,
        conds=[
            F.col("event_type") == "signup",
            F.col("event_type") == "purchase",
            F.col("event_type") == "error",
        ],
    )


# --------------------------------------------------------------------------
# sequenceMatch('(?1).*(?2).*(?3)')(ts, signup, error, purchase).
# --------------------------------------------------------------------------
@register(
    "beh_sequence_match",
    oracle="""
    WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM events),
    t1 AS (SELECT user_id, min(ts) AS ts FROM e WHERE event_type = 'signup' GROUP BY user_id),
    t2 AS (SELECT e.user_id, min(e.ts) AS ts
           FROM e JOIN t1 ON e.user_id = t1.user_id
           WHERE e.event_type = 'error' AND e.ts > t1.ts GROUP BY e.user_id),
    t3 AS (SELECT e.user_id, min(e.ts) AS ts
           FROM e JOIN t2 ON e.user_id = t2.user_id
           WHERE e.event_type = 'purchase' AND e.ts > t2.ts GROUP BY e.user_id)
    SELECT u.user_id, (t3.user_id IS NOT NULL) AS matched
    FROM (SELECT DISTINCT user_id FROM e) u
    LEFT JOIN t3 ON u.user_id = t3.user_id
    """,
)
def beh_sequence_match(spark: SparkSession, sf: str) -> DataFrame:
    ev = _ev(spark, sf)
    return sequence_match(
        ev,
        conds=[
            F.col("event_type") == "signup",
            F.col("event_type") == "error",
            F.col("event_type") == "purchase",
        ],
    )


# --------------------------------------------------------------------------
# sequenceMatch with per-step time bounds: '(?1)(?t<=2d)(?2)(?t<=2d)(?3)'.
# Oracle: the existence chain as correlated joins with interval bounds.
# --------------------------------------------------------------------------
@register(
    "beh_sequence_match_gaps",
    oracle="""
    WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM events),
    m AS (
      SELECT DISTINCT a.user_id
      FROM e a
      JOIN e b ON b.user_id = a.user_id AND b.event_type = 'click'
              AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 2 DAY
      JOIN e c ON c.user_id = a.user_id AND c.event_type = 'purchase'
              AND c.ts > b.ts AND c.ts <= b.ts + INTERVAL 2 DAY
      WHERE a.event_type = 'signup'
    )
    SELECT u.user_id, (m.user_id IS NOT NULL) AS matched
    FROM (SELECT DISTINCT user_id FROM e) u
    LEFT JOIN m ON u.user_id = m.user_id
    """,
)
def beh_sequence_match_gaps(spark: SparkSession, sf: str) -> DataFrame:
    two_days = 2 * _DAY_US
    return sequence_match(
        _ev(spark, sf),
        conds=[
            F.col("event_type") == "signup",
            F.col("event_type") == "click",
            F.col("event_type") == "purchase",
        ],
        max_gaps_us=[two_days, two_days],
    )


# --------------------------------------------------------------------------
# sequenceCount: non-overlapping signup->purchase chains per user
# (greedy core property-tested vs exhaustive DP).  For a 2-step pattern the
# greedy state machine has a closed form over the (signup|purchase)-filtered
# subsequence: the machine is "open" at an event iff the PREVIOUS filtered
# event was a signup (any signup opens; any purchase either matches or was
# ignored while closed), so n_matches = #purchases whose lagged filtered
# event is a signup — a plain window scan the oracle reproduces.
# --------------------------------------------------------------------------
@register(
    "beh_sequence_count",
    oracle="""
    WITH f AS (
      SELECT user_id, event_type AS t,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY CAST(ts AS TIMESTAMP), event_id) AS pt
      FROM events WHERE event_type IN ('signup', 'purchase')),
    m AS (SELECT user_id,
                 count(*) FILTER (WHERE t = 'purchase' AND pt = 'signup') AS n
          FROM f GROUP BY user_id)
    SELECT u.user_id, CAST(coalesce(m.n, 0) AS BIGINT) AS n_matches
    FROM (SELECT DISTINCT user_id FROM events) u
    LEFT JOIN m USING (user_id)
    """,
)
def beh_sequence_count(spark: SparkSession, sf: str) -> DataFrame:
    return sequence_count(_ev(spark, sf), pattern=["signup", "purchase"])


# --------------------------------------------------------------------------
# AUC: purchase-propensity of the value score (rank-sum formulation).
# --------------------------------------------------------------------------
@register(
    "beh_auc",
    oracle="""
    WITH ranked AS (
      SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS label,
             row_number() OVER (ORDER BY value, event_id) AS rnk
      FROM events
    )
    SELECT (sum(CASE WHEN label = 1 THEN rnk ELSE 0 END)::DOUBLE
              - sum(label)::DOUBLE * (sum(label) + 1) / 2.0)
           / (sum(label)::DOUBLE * (count(*) - sum(label))::DOUBLE) AS auc
    FROM ranked
    """,
)
def beh_auc(spark: SparkSession, sf: str) -> DataFrame:
    ev = _ev(spark, sf)
    return auc(ev, F.col("value"), F.col("event_type") == "purchase")


# --------------------------------------------------------------------------
# sequenceNextNode: what follows a signup?
# --------------------------------------------------------------------------
@register(
    "beh_next_after_signup",
    oracle="""
    WITH nxt AS (
      SELECT event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY CAST(ts AS TIMESTAMP), event_id)
               AS next_type
      FROM events
    )
    SELECT next_type, count(*) AS n
    FROM nxt WHERE event_type = 'signup' AND next_type IS NOT NULL
    GROUP BY next_type
    """,
)
def beh_next_after_signup(spark: SparkSession, sf: str) -> DataFrame:
    return sequence_next_node(_ev(spark, sf), base_type="signup")


# --------------------------------------------------------------------------
# intervalLengthSum: union length of 5-minute activity intervals per user.
# --------------------------------------------------------------------------
@register(
    "beh_interval_length_sum",
    oracle="""
    WITH iv AS (
      SELECT user_id, event_id,
             epoch_us(CAST(ts AS TIMESTAMP)) AS s,
             epoch_us(CAST(ts AS TIMESTAMP)) + 300000000 AS e
      FROM events
    ),
    flagged AS (
      SELECT user_id, s, e,
             CASE WHEN max(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       IS NULL
                    OR s > max(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  THEN 1 ELSE 0 END AS new_island,
             event_id
      FROM iv
    ),
    islands AS (
      SELECT user_id, s, e,
             sum(new_island) OVER (PARTITION BY user_id ORDER BY s, event_id
                                   ROWS UNBOUNDED PRECEDING) AS island
      FROM flagged
    ),
    per_island AS (
      SELECT user_id, island, max(e) - min(s) AS len
      FROM islands GROUP BY user_id, island
    )
    SELECT user_id, CAST(sum(len) AS BIGINT) AS total_us FROM per_island GROUP BY user_id
    """,
)
def beh_interval_length_sum(spark: SparkSession, sf: str) -> DataFrame:
    return interval_length_sum(_ev(spark, sf), length_us=300_000_000)


# --------------------------------------------------------------------------
# Last-touch attribution (AggregateFunctionAttribution family shape): each
# purchase credits the latest preceding click/view of the same user;
# purchases with no prior touch are 'direct'.  Composed from the ASOF-join
# operator — attribution IS an as-of lookup plus an aggregate.
# --------------------------------------------------------------------------
@register(
    "beh_attribution_last_touch",
    oracle="""
    WITH p AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
      FROM events WHERE event_type = 'purchase'
    ),
    t AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
             arg_max(event_type, event_id) AS channel
      FROM events WHERE event_type IN ('click', 'view')
      GROUP BY user_id, CAST(ts AS TIMESTAMP)
    )
    SELECT coalesce(t.channel, 'direct') AS channel,
           count(*)       AS n_purchases,
           round(sum(p.value), 4) AS attributed_value
    FROM p ASOF LEFT JOIN t ON p.user_id = t.user_id AND p.ts >= t.ts
    GROUP BY 1
    """,
)
def beh_attribution_last_touch(spark: SparkSession, sf: str) -> DataFrame:
    from byconity_spark.operators.joins import asof_join

    ev = _ev(spark, sf)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("p_ts"), "value"
    )
    touches = (
        ev.filter(F.col("event_type").isin("click", "view"))
        .groupBy("user_id", "ts")
        .agg(F.max_by("event_type", "event_id").alias("channel"))
    )
    joined = asof_join(
        purchases, touches, on="user_id", left_time="p_ts", right_time="ts"
    )
    return joined.groupBy(
        F.coalesce("channel", F.lit("direct")).alias("channel")
    ).agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.round(F.sum("value"), 4).alias("attributed_value"),
    )


# --------------------------------------------------------------------------
# sessionSplit(30 min): one row per (user, session) with bounds and totals.
# --------------------------------------------------------------------------
@register(
    "beh_session_split",
    oracle="""
    WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
    f AS (SELECT user_id, event_id, ts, value,
                 CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                      THEN 1 ELSE 0 END AS brk
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    s AS (SELECT user_id, ts, value,
                 CAST(1 + sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                         ROWS UNBOUNDED PRECEDING) AS INT) AS session_id
          FROM f)
    SELECT user_id, session_id,
           min(ts)    AS session_start,
           max(ts)    AS session_end,
           count(*)   AS n_events,
           round(sum(value), 4) AS sum_value
    FROM s GROUP BY user_id, session_id
    """,
)
def beh_session_split(spark: SparkSession, sf: str) -> DataFrame:
    out = session_split(_ev(spark, sf), gap_us=1_800_000_000)
    return out.withColumn("sum_value", F.round("sum_value", 4))


# --------------------------------------------------------------------------
# pathSplit(30 min, first 5): ordered per-session event-type paths.
# --------------------------------------------------------------------------
@register(
    "beh_path_split",
    oracle="""
    WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM events),
    f AS (SELECT user_id, event_id, ts, event_type,
                 CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                      THEN 1 ELSE 0 END AS brk
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    s AS (SELECT user_id, ts, event_id, event_type,
                 CAST(1 + sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                         ROWS UNBOUNDED PRECEDING) AS INT) AS session_id
          FROM f)
    SELECT user_id, session_id,
           array_to_string((list(event_type ORDER BY ts, event_id))[1:5], '|') AS path,
           count(*) AS n_events
    FROM s GROUP BY user_id, session_id
    """,
)
def beh_path_split(spark: SparkSession, sf: str) -> DataFrame:
    from byconity_spark.udafs.behavioral import path_split

    return stringify_arrays(
        path_split(_ev(spark, sf), gap_us=1_800_000_000, max_session_events=5)
    )


# --------------------------------------------------------------------------
# Multi-touch attribution over a 30-day lookback (AggregateFunctionAttribution
# family): purchases credit click/view touches. Three weight models.
# --------------------------------------------------------------------------
_ATTR_ORACLE = """
    WITH p AS (SELECT event_id AS conv_id, user_id, CAST(ts AS TIMESTAMP) AS conv_ts,
                      value AS conv_value
               FROM events WHERE event_type = 'purchase'),
    t AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS touch_ts,
                 arg_max(event_type, event_id) AS channel
          FROM events WHERE event_type IN ('click', 'view')
          GROUP BY user_id, CAST(ts AS TIMESTAMP)),
    j AS (SELECT p.conv_id, p.conv_ts, p.conv_value, t.touch_ts, t.channel
          FROM p LEFT JOIN t ON p.user_id = t.user_id AND t.touch_ts <= p.conv_ts
                 AND epoch_us(p.conv_ts) - epoch_us(t.touch_ts) < 2592000000000),
    w AS (SELECT *, count(touch_ts) OVER (PARTITION BY conv_id) AS n,
                 row_number() OVER (PARTITION BY conv_id ORDER BY touch_ts) AS rn,
                 power(2.0, -((epoch_us(conv_ts) - epoch_us(touch_ts)) / 604800000000.0)) AS raw,
                 sum(power(2.0, -((epoch_us(conv_ts) - epoch_us(touch_ts)) / 604800000000.0)))
                   OVER (PARTITION BY conv_id) AS rawsum
          FROM j)
    SELECT coalesce(channel, 'direct') AS channel,
           round(sum(CASE WHEN touch_ts IS NULL THEN 1.0 ELSE {W} END * conv_value), 4) AS attributed_value,
           round(sum(CASE WHEN touch_ts IS NULL THEN 1.0 ELSE {W} END), 6) AS n_conversions
    FROM w GROUP BY 1
"""


@register(
    "beh_attribution_linear",
    oracle=_ATTR_ORACLE.replace("{W}", "1.0 / n"),
)
def beh_attribution_linear(spark: SparkSession, sf: str) -> DataFrame:
    from byconity_spark.udafs.behavioral import attribution_multi_touch

    out = attribution_multi_touch(
        _ev(spark, sf), touch_types=["click", "view"], conv_type="purchase",
        model="linear",
    )
    return out.withColumn(
        "attributed_value", F.round("attributed_value", 4)
    ).withColumn("n_conversions", F.round("n_conversions", 6))


@register(
    "beh_attribution_position",
    oracle=_ATTR_ORACLE.replace(
        "{W}",
        "CASE WHEN n = 1 THEN 1.0 WHEN n = 2 THEN 0.5 "
        "WHEN rn = 1 THEN 0.4 WHEN rn = n THEN 0.4 ELSE 0.2 / (n - 2) END",
    ),
)
def beh_attribution_position(spark: SparkSession, sf: str) -> DataFrame:
    from byconity_spark.udafs.behavioral import attribution_multi_touch

    out = attribution_multi_touch(
        _ev(spark, sf), touch_types=["click", "view"], conv_type="purchase",
        model="position",
    )
    return out.withColumn(
        "attributed_value", F.round("attributed_value", 4)
    ).withColumn("n_conversions", F.round("n_conversions", 6))


@register(
    "beh_attribution_time_decay",
    oracle=_ATTR_ORACLE.replace("{W}", "raw / rawsum"),
)
def beh_attribution_time_decay(spark: SparkSession, sf: str) -> DataFrame:
    from byconity_spark.udafs.behavioral import attribution_multi_touch

    out = attribution_multi_touch(
        _ev(spark, sf), touch_types=["click", "view"], conv_type="purchase",
        model="time_decay",
    )
    return out.withColumn(
        "attributed_value", F.round("attributed_value", 4)
    ).withColumn("n_conversions", F.round("n_conversions", 6))


# --------------------------------------------------------------------------
# xirr per user: signups as outflows (-value), purchases as inflows (+value)
# (AggregateFunctionXirr.h: NPV root, 365-day year).  The kernel's
# root-finder is DETERMINISTIC — a fixed 128-point grid scan (numpy
# linspace(-0.999999, 0, 64, endpoint=False) ++ linspace(0, 10, 64)) for the
# first zero / sign-change bracket, then bisection with |npv| < 1e-10 or
# width < 1e-12 stops — so the oracle replicates the SAME algorithm in a
# recursive CTE over per-user cashflow lists.  Both engines bisect the same
# bracket to <=1e-11 of the same root; rates compare after round(6).
# --------------------------------------------------------------------------
_XIRR_NPV = (
    "list_sum(list_transform(range(1, len(f.as_) + 1), "
    "k -> f.as_[k] / power(1.0 + {rate}, f.ys[k])))"
)

_XIRR_ORACLE = f"""
    WITH RECURSIVE flows AS (
      SELECT user_id,
             CASE WHEN event_type = 'signup' THEN -value ELSE value END AS a,
             CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS DOUBLE) AS d
      FROM events WHERE event_type IN ('signup', 'purchase')),
    fl AS (SELECT user_id, a,
                  (d - min(d) OVER (PARTITION BY user_id)) / 365.0 AS y
           FROM flows),
    eligible AS (SELECT user_id FROM fl GROUP BY user_id
                 HAVING min(a) < 0 AND max(a) > 0),
    fla AS (SELECT user_id, list(a ORDER BY y, a) AS as_,
                   list(y ORDER BY y, a) AS ys
            FROM fl JOIN eligible USING (user_id) GROUP BY user_id),
    g AS (SELECT j.range AS j,
                 CASE WHEN j.range < 64
                        THEN CAST(j.range AS DOUBLE) * (0.999999 / 64.0)
                             + (-0.999999)
                      WHEN j.range = 127 THEN 10.0
                      ELSE CAST(j.range - 64 AS DOUBLE) * (10.0 / 63.0) END AS r
          FROM range(128) j),
    gv AS (SELECT f.user_id, g.j, g.r,
                  {_XIRR_NPV.format(rate="g.r")} AS v
           FROM fla f CROSS JOIN g),
    ev2 AS (SELECT a.user_id, a.j,
                   CASE WHEN a.v = 0.0 THEN 'zero' ELSE 'bracket' END AS kind,
                   a.r AS lo, b.r AS hi, a.v AS flo
            FROM gv a JOIN gv b ON a.user_id = b.user_id AND b.j = a.j + 1
            WHERE a.j <= 126 AND (a.v = 0.0 OR a.v * b.v < 0)),
    fev AS (SELECT user_id, min(j) AS j0 FROM ev2 GROUP BY user_id),
    start AS (SELECT e.user_id, e.kind, e.lo, e.hi, e.flo
              FROM ev2 e JOIN fev q ON e.user_id = q.user_id AND e.j = q.j0),
    bis(user_id, it, lo, hi, flo, rate, done) AS (
      SELECT user_id, 0, lo, hi, flo,
             CASE WHEN kind = 'zero' THEN lo END,
             kind = 'zero'
      FROM start
      UNION ALL
      SELECT user_id, it + 1,
             CASE WHEN stop OR flo * fm < 0 THEN lo ELSE mid END,
             CASE WHEN stop THEN hi WHEN flo * fm < 0 THEN mid ELSE hi END,
             CASE WHEN stop OR flo * fm < 0 THEN flo ELSE fm END,
             CASE WHEN stop THEN mid
                  WHEN it + 1 >= 200 THEN
                    CASE WHEN flo * fm < 0 THEN (lo + mid) / 2.0
                         ELSE (mid + hi) / 2.0 END
                  END,
             stop OR it + 1 >= 200
      FROM (
        SELECT s.*, (abs(fm) < 1e-10 OR (s.hi - s.lo) < 1e-12) AS stop
        FROM (
          SELECT b.user_id, b.it, b.lo, b.hi, b.flo,
                 (b.lo + b.hi) / 2.0 AS mid,
                 {_XIRR_NPV.format(rate="(b.lo + b.hi) / 2.0")} AS fm
          FROM bis b JOIN fla f USING (user_id)
          WHERE NOT b.done
        ) s
      ) q
    )
    SELECT user_id, round(rate, 6) AS rate FROM bis WHERE done
"""


@register("beh_xirr", oracle=_XIRR_ORACLE)
def beh_xirr(spark: SparkSession, sf: str) -> DataFrame:
    from byconity_spark.udafs.behavioral import xirr

    ev = _ev(spark, sf)
    flows = ev.filter(F.col("event_type").isin("signup", "purchase")).select(
        "user_id",
        "ts",
        F.when(F.col("event_type") == "signup", -F.col("value"))
        .otherwise(F.col("value"))
        .alias("amount"),
    )
    # NaN from the Arrow kernel may surface as NULL (pandas uses NaN as its
    # missing marker) — and Spark's isnan(NULL) is false, so guard BOTH.
    out = xirr(flows, group_col="user_id").filter(
        F.col("rate").isNotNull() & ~F.isnan("rate")
    )
    return out.withColumn("rate", F.round("rate", 6))


# --------------------------------------------------------------------------
# funnelRep: per-signup-day step-reach counts from windowFunnel levels
# (reference AggregateFunctionFunnelRep.h add(): out[slot][e] += level > e).
# --------------------------------------------------------------------------
@register(
    "beh_funnel_rep",
    oracle="""
    WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM events),
    u1 AS (SELECT user_id, min(ts) AS t1 FROM e WHERE event_type = 'signup' GROUP BY user_id),
    u2 AS (SELECT e.user_id, min(e.ts) AS t2
           FROM e JOIN u1 ON e.user_id = u1.user_id
           WHERE e.event_type = 'click' AND e.ts > u1.t1
             AND e.ts <= u1.t1 + INTERVAL 7 DAY
           GROUP BY e.user_id),
    u3 AS (SELECT e.user_id, min(e.ts) AS t3
           FROM e JOIN u1 ON e.user_id = u1.user_id
                  JOIN u2 ON e.user_id = u2.user_id
           WHERE e.event_type = 'purchase' AND e.ts > u2.t2
             AND e.ts <= u1.t1 + INTERVAL 7 DAY
           GROUP BY e.user_id),
    lv AS (SELECT u1.user_id, CAST(u1.t1 AS DATE) AS day,
                  CASE WHEN u3.user_id IS NOT NULL THEN 3
                       WHEN u2.user_id IS NOT NULL THEN 2
                       ELSE 1 END AS funnel_level
           FROM u1
           LEFT JOIN u2 ON u1.user_id = u2.user_id
           LEFT JOIN u3 ON u1.user_id = u3.user_id)
    SELECT day,
           array_to_string(
           [CAST(sum(CASE WHEN funnel_level > 0 THEN 1 ELSE 0 END) AS BIGINT),
            CAST(sum(CASE WHEN funnel_level > 1 THEN 1 ELSE 0 END) AS BIGINT),
            CAST(sum(CASE WHEN funnel_level > 2 THEN 1 ELSE 0 END) AS BIGINT)], '|')
             AS funnel_counts
    FROM lv GROUP BY day
    """,
)
def beh_funnel_rep(spark: SparkSession, sf: str) -> DataFrame:
    from byconity_spark.udafs.behavioral import funnel_rep

    ev = _ev(spark, sf)
    levels = window_funnel(
        ev, window_us=7 * _DAY_US, steps=["signup", "click", "purchase"]
    ).filter(F.col("funnel_level") >= 1)
    first_signup = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.to_date(F.min("ts")).alias("day"))
    )
    return stringify_arrays(
        funnel_rep(levels.join(first_signup, "user_id"), ["day"], event_numbers=3)
    )


# --------------------------------------------------------------------------
# userDistribution: weekly ARRIVE/NEWONE user counts
# (reference AggregateFunctionUserDistribution.h: ARRIVE = any event in the
# slot, NEWONE = registered in the same slot; register ts = first signup).
# --------------------------------------------------------------------------
_UD_START_US = 1_704_067_200_000_000  # 2024-01-01 00:00:00 UTC
_UD_GRAN_US = 7 * 24 * 3600 * 1_000_000  # one week
_UD_SLOTS = 26


@register(
    "beh_user_distribution",
    oracle=f"""
    WITH arr AS (
      SELECT DISTINCT user_id,
             CAST(floor((epoch_us(CAST(ts AS TIMESTAMP)) - {_UD_START_US})
                        / {_UD_GRAN_US}) AS BIGINT) AS slot
      FROM events
    ),
    arr_ok AS (SELECT * FROM arr WHERE slot >= 0 AND slot < {_UD_SLOTS}),
    reg AS (
      SELECT user_id,
             CAST(floor((epoch_us(min(CAST(ts AS TIMESTAMP))) - {_UD_START_US})
                        / {_UD_GRAN_US}) AS BIGINT) AS reg_slot
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    per_slot AS (
      SELECT a.slot,
             count(*) AS n_arrive,
             CAST(sum(CASE WHEN r.reg_slot = a.slot THEN 1 ELSE 0 END) AS BIGINT)
               AS n_new
      FROM arr_ok a LEFT JOIN reg r ON a.user_id = r.user_id
      GROUP BY a.slot
    )
    SELECT s.range AS slot,
           coalesce(p.n_arrive, 0) AS n_arrive,
           coalesce(p.n_new, 0)    AS n_new
    FROM range({_UD_SLOTS}) s LEFT JOIN per_slot p ON s.range = p.slot
    """,
)
def beh_user_distribution(spark: SparkSession, sf: str) -> DataFrame:
    from byconity_spark.udafs.behavioral import user_distribution

    ev = _ev(spark, sf)
    registrations = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("register_ts"))
    )
    return user_distribution(
        ev, registrations, _UD_START_US, _UD_GRAN_US, _UD_SLOTS
    )


# --------------------------------------------------------------------------
# maxIntersections: peak concurrent 5-minute activity intervals
# (reference AggregateFunctionMaxIntersections.h; ends sort before starts
# at equal points, so touching intervals don't intersect).
# --------------------------------------------------------------------------
@register(
    "beh_max_intersections",
    oracle="""
    WITH iv AS (
      SELECT epoch_us(CAST(ts AS TIMESTAMP))             AS s,
             epoch_us(CAST(ts AS TIMESTAMP)) + 300000000 AS e
      FROM events
    ),
    deltas AS (
      SELECT s AS p, 1 AS d FROM iv
      UNION ALL
      SELECT e AS p, -1 AS d FROM iv
    ),
    run AS (
      SELECT p, d,
             CAST(sum(d) OVER (ORDER BY p, d ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS r
      FROM deltas
    )
    SELECT (SELECT max(r) FROM run)          AS max_intersections,
           (SELECT p FROM run
            WHERE r = (SELECT max(r) FROM run)
            ORDER BY p, d LIMIT 1)           AS position
    """,
)
def beh_max_intersections(spark: SparkSession, sf: str) -> DataFrame:
    from byconity_spark.udafs.behavioral import max_intersections

    iv = _ev(spark, sf).select(
        F.unix_micros(F.col("ts")).alias("s"),
        (F.unix_micros(F.col("ts")) + 300_000_000).alias("e"),
    )
    return max_intersections(iv, "s", "e")


# --------------------------------------------------------------------------
# genArray: per-user daily presence bitmask over 100 days, packed into two
# 64-bit words (reference AggregateFunctionGenArray.h).
# --------------------------------------------------------------------------
_GA_START_US = 1_704_067_200_000_000  # 2024-01-01 UTC
_GA_STEP_US = 24 * 3600 * 1_000_000
_GA_STEPS = 100


@register(
    "beh_gen_array",
    oracle=f"""
    WITH slotted AS (
      SELECT DISTINCT user_id,
             CAST(floor((epoch_us(CAST(ts AS TIMESTAMP)) - {_GA_START_US})
                        / {_GA_STEP_US}) AS BIGINT) AS slot
      FROM events
    ),
    ok AS (SELECT * FROM slotted WHERE slot >= 0 AND slot < {_GA_STEPS})
    SELECT user_id,
           array_to_string(
           [coalesce(bit_or(CASE WHEN slot // 64 = 0
                            THEN (1::BIGINT << CAST(slot % 64 AS INT)) END), 0),
            coalesce(bit_or(CASE WHEN slot // 64 = 1
                            THEN (1::BIGINT << CAST(slot % 64 AS INT)) END), 0)], '|')
             AS gen_array
    FROM ok GROUP BY user_id
    """,
)
def beh_gen_array(spark: SparkSession, sf: str) -> DataFrame:
    from byconity_spark.udafs.behavioral import gen_array

    ev = _ev(spark, sf).select("user_id", F.unix_micros(F.col("ts")).alias("tus"))
    return stringify_arrays(
        gen_array(ev, ["user_id"], "tus", _GA_START_US, _GA_STEP_US, _GA_STEPS)
    )


# --------------------------------------------------------------------------
# countByGranularity with day granules
# (reference AggregateFunctionCountByGranularity.h — granule here is a
# declared column, not the physical 8192-row block; documented divergence).
# --------------------------------------------------------------------------
@register(
    "beh_count_by_granularity",
    oracle="""
    SELECT user_id AS value, count(DISTINCT CAST(CAST(ts AS TIMESTAMP) AS DATE))
             AS n_granules
    FROM events GROUP BY user_id
    """,
)
def beh_count_by_granularity(spark: SparkSession, sf: str) -> DataFrame:
    from byconity_spark.udafs.behavioral import count_by_granularity

    ev = _ev(spark, sf).withColumn("day", F.to_date("ts"))
    return count_by_granularity(ev, "user_id", "day")


# --------------------------------------------------------------------------
# mannWhitneyUTest: purchase values vs other values per event-type family
# (reference AggregateFunctionMannWhitney.h; avg ranks on ties, tie-
# corrected z).
# --------------------------------------------------------------------------
@register(
    "beh_mann_whitney",
    oracle="""
    WITH ranked AS (
      SELECT value,
             CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS lab,
             avg(rn) OVER (PARTITION BY value) AS rank
      FROM (
        SELECT value, user_id,
               row_number() OVER (ORDER BY value) AS rn
        FROM events
      )
    ),
    stats AS (
      SELECT sum(CASE WHEN lab = 1 THEN rank END) AS r1,
             sum(lab)  AS n1,
             count(*)  AS n
      FROM ranked
    ),
    ties AS (
      SELECT sum(t * t * t - t) AS tie3
      FROM (SELECT count(*) AS t FROM ranked GROUP BY value)
    )
    SELECT round(r1 - n1 * (n1 + 1.0) / 2.0, 4) AS u_stat,
           round((r1 - n1 * (n1 + 1.0) / 2.0 - n1 * (n - n1) / 2.0)
                 / sqrt(n1 * (n - n1) / 12.0
                        * ((n + 1) - tie3 / (n * (n - 1.0)))), 6) AS z_score
    FROM stats, ties
    """,
)
def beh_mann_whitney(spark: SparkSession, sf: str) -> DataFrame:
    from byconity_spark.udafs.behavioral import mann_whitney_u

    ev = _ev(spark, sf)
    out = mann_whitney_u(ev, [], "value", F.col("user_id") % 2 == 0)
    return out.select(
        F.round("u_stat", 4).alias("u_stat"),
        F.round("z_score", 6).alias("z_score"),
    )


# --------------------------------------------------------------------------
# finderFunnel: per-(user, day-slot) funnel levels; funnelRepByTimes: the
# per-slot step-reach counts built from them (reference
# AggregateFunctionFinderFunnel.h, AggregateFunctionFunnelRepByTimes.h).
# --------------------------------------------------------------------------
_FF_START_US = 1_704_067_200_000_000
_FF_STEP_US = 24 * 3600 * 1_000_000
_FF_SLOTS = 100
_FF_WINDOW_US = 3 * 24 * 3600 * 1_000_000

_FF_ORACLE_CORE = f"""
    e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t, event_type
          FROM events),
    a AS (SELECT user_id,
                 CAST(floor((t - {_FF_START_US}) / {_FF_STEP_US}) AS BIGINT) AS slot,
                 min(t) AS t1
          FROM e
          WHERE event_type = 'signup'
            AND floor((t - {_FF_START_US}) / {_FF_STEP_US}) >= 0
            AND floor((t - {_FF_START_US}) / {_FF_STEP_US}) < {_FF_SLOTS}
          GROUP BY user_id, slot),
    s2 AS (SELECT a.user_id, a.slot, min(e.t) AS t2
           FROM a JOIN e ON a.user_id = e.user_id
           WHERE e.event_type = 'click' AND e.t > a.t1
             AND e.t <= a.t1 + {_FF_WINDOW_US}
           GROUP BY a.user_id, a.slot),
    s3 AS (SELECT a.user_id, a.slot, min(e.t) AS t3
           FROM a JOIN s2 ON a.user_id = s2.user_id AND a.slot = s2.slot
                  JOIN e ON a.user_id = e.user_id
           WHERE e.event_type = 'purchase' AND e.t > s2.t2
             AND e.t <= a.t1 + {_FF_WINDOW_US}
           GROUP BY a.user_id, a.slot),
    lv AS (SELECT a.user_id, a.slot,
                  CASE WHEN s3.t3 IS NOT NULL THEN 3
                       WHEN s2.t2 IS NOT NULL THEN 2
                       ELSE 1 END AS funnel_level
           FROM a
           LEFT JOIN s2 ON a.user_id = s2.user_id AND a.slot = s2.slot
           LEFT JOIN s3 ON a.user_id = s3.user_id AND a.slot = s3.slot)
"""


@register(
    "beh_finder_funnel",
    oracle=f"""
    WITH {_FF_ORACLE_CORE}
    SELECT user_id, slot, CAST(funnel_level AS BIGINT) AS funnel_level FROM lv
    """,
)
def beh_finder_funnel(spark: SparkSession, sf: str) -> DataFrame:
    from byconity_spark.udafs.behavioral import finder_funnel

    return finder_funnel(
        _ev(spark, sf),
        watch_start_us=_FF_START_US,
        watch_step_us=_FF_STEP_US,
        watch_numbers=_FF_SLOTS,
        window_us=_FF_WINDOW_US,
        steps=["signup", "click", "purchase"],
    )


@register(
    "beh_funnel_rep_by_times",
    oracle=f"""
    WITH {_FF_ORACLE_CORE}
    SELECT slot,
           array_to_string(
           [CAST(sum(CASE WHEN funnel_level > 0 THEN 1 ELSE 0 END) AS BIGINT),
            CAST(sum(CASE WHEN funnel_level > 1 THEN 1 ELSE 0 END) AS BIGINT),
            CAST(sum(CASE WHEN funnel_level > 2 THEN 1 ELSE 0 END) AS BIGINT)], '|')
             AS funnel_counts
    FROM lv GROUP BY slot
    """,
)
def beh_funnel_rep_by_times(spark: SparkSession, sf: str) -> DataFrame:
    from byconity_spark.udafs.behavioral import finder_funnel, funnel_rep

    levels = finder_funnel(
        _ev(spark, sf),
        watch_start_us=_FF_START_US,
        watch_step_us=_FF_STEP_US,
        watch_numbers=_FF_SLOTS,
        window_us=_FF_WINDOW_US,
        steps=["signup", "click", "purchase"],
    )
    return stringify_arrays(funnel_rep(levels, ["slot"], event_numbers=3))


# --------------------------------------------------------------------------
# finderFunnelByTimes: every signup anchors its OWN chain (counting every
# funnel pass, with step-2+ events consumed), vs finderFunnel's one level
# per (user, slot).  Oracle: DuckDB recursive CTE replaying the greedy
# rounds per user — state carries the consumed click/purchase timestamp
# lists; validated row-exact against an independent python simulation
# (.dev/ffbt_proto.py derivation note in udafs/behavioral.py docstring).
# --------------------------------------------------------------------------
_FFBT_ORACLE_CORE = f"""
e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t, event_type
      FROM events WHERE epoch_us(CAST(ts AS TIMESTAMP)) >= {_FF_START_US}),
a AS (SELECT user_id, t,
             CAST(floor((t - {_FF_START_US}) / {_FF_STEP_US}) AS BIGINT) AS slot,
             row_number() OVER (PARTITION BY user_id ORDER BY t) AS rn
      FROM e WHERE event_type = 'signup'
        AND floor((t - {_FF_START_US}) / {_FF_STEP_US}) >= 0
        AND floor((t - {_FF_START_US}) / {_FF_STEP_US}) < {_FF_SLOTS}),
bl AS (SELECT user_id, list(t ORDER BY t) AS bs FROM e
       WHERE event_type = 'click' GROUP BY user_id),
cl AS (SELECT user_id, list(t ORDER BY t) AS cs FROM e
       WHERE event_type = 'purchase' GROUP BY user_id),
sim(user_id, rn, slot, level, used_b, used_c) AS (
  SELECT user_id, 0, CAST(NULL AS BIGINT), CAST(0 AS BIGINT),
         CAST([] AS BIGINT[]), CAST([] AS BIGINT[])
  FROM (SELECT DISTINCT user_id FROM a)
  UNION ALL
  SELECT s.user_id, s.rn + 1, a.slot,
         CASE WHEN p.cpick IS NOT NULL THEN 3
              WHEN p.bpick IS NOT NULL THEN 2 ELSE 1 END,
         CASE WHEN p.bpick IS NOT NULL THEN list_append(s.used_b, p.bpick)
              ELSE s.used_b END,
         CASE WHEN p.cpick IS NOT NULL THEN list_append(s.used_c, p.cpick)
              ELSE s.used_c END
  FROM sim s
  JOIN a ON a.user_id = s.user_id AND a.rn = s.rn + 1
  LEFT JOIN bl ON bl.user_id = s.user_id
  LEFT JOIN cl ON cl.user_id = s.user_id,
  LATERAL (
    SELECT bpick,
           CASE WHEN bpick IS NOT NULL THEN
             list_min(list_filter(coalesce(cl.cs, CAST([] AS BIGINT[])),
               x -> x > bpick AND x <= a.t + {_FF_WINDOW_US}
                    AND NOT list_contains(s.used_c, x)))
           END AS cpick
    FROM (SELECT list_min(list_filter(coalesce(bl.bs, CAST([] AS BIGINT[])),
            x -> x > a.t AND x <= a.t + {_FF_WINDOW_US}
                 AND NOT list_contains(s.used_b, x))) AS bpick)
  ) p
)
"""


@register(
    "beh_finder_funnel_by_times",
    oracle=f"""
    WITH RECURSIVE
    {_FFBT_ORACLE_CORE}
    SELECT user_id, slot,
           CAST(count(*) AS BIGINT) AS reach1,
           CAST(sum(CASE WHEN level >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS reach2,
           CAST(sum(CASE WHEN level >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS reach3
    FROM sim WHERE rn > 0
    GROUP BY user_id, slot
    """,
)
def beh_finder_funnel_by_times(spark: SparkSession, sf: str) -> DataFrame:
    from byconity_spark.udafs.behavioral import finder_funnel_by_times

    return finder_funnel_by_times(
        _ev(spark, sf),
        watch_start_us=_FF_START_US,
        watch_step_us=_FF_STEP_US,
        watch_numbers=_FF_SLOTS,
        window_us=_FF_WINDOW_US,
        steps=["signup", "click", "purchase"],
    )


# --------------------------------------------------------------------------
# finderGroupFunnelByTimes: ByTimes chain counts split by a USER property
# (reference AggregateFunctionFinderGroupFunnelByTimes.h — composition of
# the ByTimes kernel with the group join, same pattern as
# finder_group_funnel).
# --------------------------------------------------------------------------
@register(
    "beh_finder_group_funnel_by_times",
    oracle=f"""
    WITH RECURSIVE
    {_FFBT_ORACLE_CORE}
    SELECT slot, user_id % 3 AS prop,
           CAST(count(*) AS BIGINT) AS reach1,
           CAST(sum(CASE WHEN level >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS reach2,
           CAST(sum(CASE WHEN level >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS reach3
    FROM sim WHERE rn > 0
    GROUP BY slot, user_id % 3
    """,
)
def beh_finder_group_funnel_by_times(spark: SparkSession, sf: str) -> DataFrame:
    from byconity_spark.udafs.behavioral import finder_funnel_by_times

    per_user = finder_funnel_by_times(
        _ev(spark, sf),
        watch_start_us=_FF_START_US,
        watch_step_us=_FF_STEP_US,
        watch_numbers=_FF_SLOTS,
        window_us=_FF_WINDOW_US,
        steps=["signup", "click", "purchase"],
    )
    return (
        per_user.withColumn("prop", F.col("user_id") % 3)
        .groupBy("slot", "prop")
        .agg(
            F.sum("reach1").cast("long").alias("reach1"),
            F.sum("reach2").cast("long").alias("reach2"),
            F.sum("reach3").cast("long").alias("reach3"),
        )
    )


# --------------------------------------------------------------------------
# sessionAnalysis: per-session duration/depth/entry/exit
# (reference AggregateFunctionSessionAnalysis.h — output tuple
# (session_duration, session_depth, end_event, ...)).
# --------------------------------------------------------------------------
@register(
    "beh_session_analysis",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, event_type,
             epoch_us(CAST(ts AS TIMESTAMP)) AS t
      FROM events
    ),
    f AS (
      SELECT *,
             CASE WHEN t - lag(t) OVER w > 1800000000 THEN 1 ELSE 0 END AS brk
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)
    ),
    s AS (
      SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY t, event_id
                               ROWS UNBOUNDED PRECEDING) AS sid
      FROM f
    )
    SELECT user_id,
           (max(t) - min(t)) / 1000000.0          AS duration_s,
           count(*)                               AS depth,
           arg_min(event_type, printf('%020d%020d', t, event_id)) AS entry_event,
           arg_max(event_type, printf('%020d%020d', t, event_id)) AS exit_event,
           make_timestamp(min(t))                 AS session_start
    FROM s GROUP BY user_id, sid
    """,
)
def beh_session_analysis(spark: SparkSession, sf: str) -> DataFrame:
    from byconity_spark.udafs.behavioral import session_analysis

    return session_analysis(_ev(spark, sf), gap_us=1_800_000_000)


# --------------------------------------------------------------------------
# pathCount: Sankey edge counts — (from_event -> to_event) transition
# frequencies with distinct-user counts (reference
# AggregateFunctionPathCount.h: Edge = (from, to), per-edge count + uniq).
# --------------------------------------------------------------------------
@register(
    "beh_path_count",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type AS from_event,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY CAST(ts AS TIMESTAMP), event_id)
               AS to_event
      FROM events
    )
    SELECT from_event, to_event,
           count(*)                 AS n_transitions,
           count(DISTINCT user_id)  AS n_users
    FROM seq WHERE to_event IS NOT NULL
    GROUP BY from_event, to_event
    """,
)
def beh_path_count(spark: SparkSession, sf: str) -> DataFrame:
    ev = _ev(spark, sf)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        F.col("event_type").alias("from_event"),
        F.lead("event_type").over(w).alias("to_event"),
    ).filter(F.col("to_event").isNotNull())
    return seq.groupBy("from_event", "to_event").agg(
        F.count(F.lit(1)).alias("n_transitions"),
        F.countDistinct("user_id").alias("n_users"),
    )


# --------------------------------------------------------------------------
# sparkbar: unicode bar-chart string of time-bucketed counts per group
# (reference AggregateFunctionSparkbar.h).  Deterministic Column expr:
# bucket counts -> 8-level block glyphs scaled by the max bucket.
# --------------------------------------------------------------------------
@register(
    "beh_sparkbar",
    oracle="""
    WITH b AS (
      SELECT event_type,
             CAST(floor((epoch_us(CAST(ts AS TIMESTAMP)) - 1704067200000000)
                        / (7 * 86400000000)) AS BIGINT) AS wk,
             count(*) AS n
      FROM events
      WHERE epoch_us(CAST(ts AS TIMESTAMP)) >= 1704067200000000
      GROUP BY 1, 2
    ),
    filled AS (
      SELECT t.event_type, s.range AS wk, coalesce(b.n, 0) AS n
      FROM (SELECT DISTINCT event_type FROM b) t
      CROSS JOIN range(0, 26) s
      LEFT JOIN b ON b.event_type = t.event_type AND b.wk = s.range
    ),
    scaled AS (
      SELECT event_type, wk, n,
             max(n) OVER (PARTITION BY event_type) AS mx
      FROM filled WHERE wk < 26
    )
    SELECT event_type,
           string_agg(
             CASE WHEN n = 0 THEN ' '
                  ELSE ['▁','▂','▃','▄','▅','▆','▇','█']
                       [CAST(ceil(n * 8.0 / mx) AS INT)]
             END, '' ORDER BY wk) AS bar
    FROM scaled GROUP BY event_type
    """,
)
def beh_sparkbar(spark: SparkSession, sf: str) -> DataFrame:
    """sparkbar(26)(week, count): weekly activity rendered as block glyphs
    (reference AggregateFunctionSparkbar.h) — bucket counts, zero-filled
    spine, per-group max scaling, concat_ws fold.  All JVM expressions."""
    glyphs = ["▁", "▂", "▃", "▄", "▅", "▆", "▇", "█"]
    start = 1_704_067_200_000_000
    week = 7 * 86_400_000_000
    ev = _ev(spark, sf).select(
        "event_type",
        F.floor((F.unix_micros(F.col("ts")) - F.lit(start)) / F.lit(week)).alias("wk"),
    ).filter((F.col("wk") >= 0) & (F.col("wk") < 26))
    counts = ev.groupBy("event_type", "wk").agg(F.count(F.lit(1)).alias("n"))
    spine = (
        counts.select("event_type").distinct()
        .crossJoin(spark.range(26).select(F.col("id").alias("wk")))
    )
    filled = spine.join(counts, ["event_type", "wk"], "left").select(
        "event_type", "wk", F.coalesce("n", F.lit(0)).alias("n")
    )
    w_max = Window.partitionBy("event_type")
    glyph = F.when(F.col("n") == 0, F.lit(" ")).otherwise(
        F.element_at(
            F.array(*[F.lit(g) for g in glyphs]),
            F.ceil(F.col("n") * 8.0 / F.max("n").over(w_max)).cast("int"),
        )
    )
    lined = filled.select("event_type", "wk", glyph.alias("g"))
    return (
        lined.groupBy("event_type")
        .agg(
            F.concat_ws(
                "", F.transform(F.array_sort(
                    F.collect_list(F.struct("wk", "g"))
                ), lambda s: s.g)
            ).alias("bar")
        )
    )


# --------------------------------------------------------------------------
# fastAuc: histogram-bucketed AUC (reference AggregateFunctionFastAuc.h) —
# gated within 1e-3 of the tie-averaged exact AUC (bin-width error bound).
# --------------------------------------------------------------------------
@register(
    "beh_fast_auc",
    # the Spark side compares the histogram AUC against its own exact
    # tie-averaged AUC; the oracle pins the expected gate outcome (same
    # pattern as the sketch -State/-Merge gates)
    oracle="SELECT true AS within_tol",
)
def beh_fast_auc(spark: SparkSession, sf: str) -> DataFrame:
    from byconity_spark.udafs.behavioral import auc, fast_auc

    ev = _ev(spark, sf)
    approx = fast_auc(
        ev, F.col("value"), F.col("event_type") == "purchase",
        n_bins=100_000, lo=0.0, hi=1000.0,
    )
    # exact baseline: the distributed-rank AUC (id tiebreak); the gate
    # bound covers both the bin-width error and the tie-convention delta
    # (average-rank vs id-tiebreak), both tiny on near-continuous scores
    exact = auc(
        ev, F.col("value"), F.col("event_type") == "purchase"
    ).withColumnRenamed("auc", "exact_auc")
    return approx.crossJoin(exact).select(
        (F.abs(F.col("auc") - F.col("exact_auc")) < 2e-3).alias("within_tol")
    )


# --------------------------------------------------------------------------
# retentionLoss: cumulative first-return cohort matrix
# (reference AggregateFunctionRetentionLoss.h).
# --------------------------------------------------------------------------
@register(
    "beh_retention_loss",
    oracle="""
    WITH base AS (
      SELECT user_id AS u, event_type AS tp,
             date_diff('day', DATE '2024-01-01',
                       CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS d
      FROM events
    ),
    ok AS (SELECT * FROM base WHERE d >= 0 AND d < 14),
    starts AS (SELECT DISTINCT u, d AS i FROM ok WHERE tp = 'signup'),
    rets   AS (SELECT DISTINCT u, d AS r FROM ok WHERE tp = 'purchase'),
    first_ret AS (
      SELECT s.u, s.i, min(r.r) AS j0
      FROM starts s JOIN rets r ON s.u = r.u AND r.r > s.i
      GROUP BY s.u, s.i
    ),
    cohort AS (SELECT i, count(*) AS n_start FROM starts GROUP BY i),
    arrivals AS (SELECT i, j0, count(*) AS n_first FROM first_ret GROUP BY i, j0),
    grid AS (
      SELECT gi.range AS i, gj.range AS j
      FROM range(14) gi, range(14) gj WHERE gj.range >= gi.range
    ),
    filled AS (
      SELECT g.i, g.j, coalesce(a.n_first, 0) AS nf
      FROM grid g LEFT JOIN arrivals a ON g.i = a.i AND g.j = a.j0
    ),
    cum AS (
      SELECT i, j, sum(nf) OVER (PARTITION BY i ORDER BY j
                                 ROWS UNBOUNDED PRECEDING) AS cum_returned
      FROM filled
    )
    SELECT c.i, c.j,
           CAST(CASE WHEN c.i = c.j THEN coalesce(ch.n_start, 0)
                     ELSE c.cum_returned END AS BIGINT) AS n
    FROM cum c LEFT JOIN cohort ch ON c.i = ch.i
    """,
)
def beh_retention_loss(spark: SparkSession, sf: str) -> DataFrame:
    from byconity_spark.udafs.behavioral import retention_loss

    return retention_loss(
        _ev(spark, sf),
        start_type="signup",
        return_type="purchase",
        start_date="2024-01-01",
        window_days=14,
    )


# --------------------------------------------------------------------------
# slideMatchCount: sliding "registered last week AND returned this week"
# pattern over weekly ARRIVE/NEWONE states (reference
# AggregateFunctionSlideMatchCount.h; states per UserDistributionCommon.h).
# --------------------------------------------------------------------------
@register(
    "beh_slide_match_count",
    oracle=f"""
    WITH arr AS (
      SELECT DISTINCT user_id AS u,
             CAST(floor((epoch_us(CAST(ts AS TIMESTAMP)) - {_UD_START_US})
                        / {_UD_GRAN_US}) AS BIGINT) AS slot
      FROM events
    ),
    ok AS (SELECT * FROM arr WHERE slot >= 0 AND slot < {_UD_SLOTS}),
    reg AS (
      SELECT user_id AS u,
             CAST(floor((epoch_us(min(CAST(ts AS TIMESTAMP))) - {_UD_START_US})
                        / {_UD_GRAN_US}) AS BIGINT) AS reg_slot
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    st AS (
      SELECT o.u, o.slot,
             1 + CASE WHEN r.reg_slot = o.slot THEN 2 ELSE 0 END AS state
      FROM ok o LEFT JOIN reg r ON o.u = r.u
    ),
    dense AS (
      SELECT u.u, s.range AS slot, coalesce(st.state, 0) AS state
      FROM (SELECT DISTINCT u FROM st) u
      CROSS JOIN range({_UD_SLOTS}) s
      LEFT JOIN st ON st.u = u.u AND st.slot = s.range
    ),
    hits AS (
      SELECT a.u, a.slot - 1 AS base
      FROM dense a JOIN dense b ON a.u = b.u AND b.slot = a.slot - 1
      WHERE b.state = 3 AND (a.state & 1) != 0
    )
    SELECT array_to_string(
           [CAST(count(CASE WHEN base = 0 THEN 1 END) AS BIGINT),
            CAST(count(CASE WHEN base = 1 THEN 1 END) AS BIGINT),
            CAST(count(CASE WHEN base = 2 THEN 1 END) AS BIGINT),
            CAST(count(CASE WHEN base = 3 THEN 1 END) AS BIGINT),
            CAST(count(CASE WHEN base = 4 THEN 1 END) AS BIGINT),
            CAST(count(CASE WHEN base = 5 THEN 1 END) AS BIGINT)], '|')
             AS match_counts
    FROM hits
    """,
)
def beh_slide_match_count(spark: SparkSession, sf: str) -> DataFrame:
    from byconity_spark.udafs.behavioral import slide_match_count, user_slot_states

    ev = _ev(spark, sf)
    registrations = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("register_ts"))
    )
    states = user_slot_states(
        ev, registrations, _UD_START_US, _UD_GRAN_US, _UD_SLOTS
    )
    # pattern [NEW+ARRIVE, ARRIVE]: registered in week w-1, back in week w;
    # slides cover bases 1..6
    return stringify_arrays(
        slide_match_count(
            states,
            pattern=[3, 1],
            start_index=1,
            num_slides=6,
            total_slots=_UD_SLOTS,
        )
    )


# --------------------------------------------------------------------------
# lastRangeCount: rolling 4-week active users over weekly slots
# (reference AggregateFunctionLastRangeCount.h).
# --------------------------------------------------------------------------
@register(
    "beh_last_range_count",
    oracle=f"""
    WITH arr AS (
      SELECT DISTINCT user_id AS u,
             CAST(floor((epoch_us(CAST(ts AS TIMESTAMP)) - {_UD_START_US})
                        / {_UD_GRAN_US}) AS BIGINT) AS slot
      FROM events
    ),
    ok AS (SELECT * FROM arr WHERE slot >= 0 AND slot < {_UD_SLOTS}),
    slides AS (
      SELECT s.range AS i,
             (SELECT count(DISTINCT u) FROM ok
              WHERE slot >= s.range AND slot <= s.range + 3) AS n
      FROM range(6) s
    )
    SELECT array_to_string(list(n ORDER BY i), '|') AS range_counts FROM slides
    """,
)
def beh_last_range_count(spark: SparkSession, sf: str) -> DataFrame:
    from byconity_spark.udafs.behavioral import last_range_count, user_slot_states

    ev = _ev(spark, sf)
    registrations = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("register_ts"))
    )
    states = user_slot_states(
        ev, registrations, _UD_START_US, _UD_GRAN_US, _UD_SLOTS
    )
    # duration 4 weeks, slides ending at slots 3..8
    return stringify_arrays(
        last_range_count(
            states, duration=4, start_index=3, num_slides=6, total_slots=_UD_SLOTS
        )
    )


# --------------------------------------------------------------------------
# debiasAuc: sample-rate-weighted bucketed AUC (reference
# AggregateFunctionDebiasAuc.h).  Gate: with rate=1 it must agree with the
# exact distributed-rank AUC; the weighted path is property-tested.
# --------------------------------------------------------------------------
@register(
    "beh_debias_auc",
    oracle="SELECT true AS within_tol",
)
def beh_debias_auc(spark: SparkSession, sf: str) -> DataFrame:
    from byconity_spark.udafs.behavioral import auc, debias_auc

    ev = _ev(spark, sf)
    d = debias_auc(
        ev, F.col("value"), F.col("event_type") == "purchase",
        n_bins=100_000, lo=0.0, hi=1000.0,
    )
    exact = auc(ev, F.col("value"), F.col("event_type") == "purchase")
    return (
        d.withColumnRenamed("auc", "d_auc")
        .crossJoin(exact)
        .select((F.abs(F.col("d_auc") - F.col("auc")) < 2e-3).alias("within_tol"))
    )


# --------------------------------------------------------------------------
# funnelPathSplit: what does each user do in the day after first signup?
# (reference AggregateFunctionFunnelPathSplit.h — anchored, windowed,
# depth-bounded paths).
# --------------------------------------------------------------------------
@register(
    "beh_funnel_path_split",
    oracle="""
    WITH e AS (
      SELECT user_id AS u, event_id AS i, event_type AS e,
             epoch_us(CAST(ts AS TIMESTAMP)) AS t
      FROM events
    ),
    a AS (SELECT u, min(t) AS t0 FROM e WHERE e = 'signup' GROUP BY u),
    w AS (
      SELECT e.u, e.t, e.i, e.e
      FROM e JOIN a ON e.u = a.u
      WHERE e.t >= a.t0 AND e.t <= a.t0 + 86400000000
    )
    SELECT u AS user_id,
           array_to_string((list(e ORDER BY t, i))[1:10], '|') AS path
    FROM w GROUP BY u
    """,
)
def beh_funnel_path_split(spark: SparkSession, sf: str) -> DataFrame:
    from byconity_spark.udafs.behavioral import funnel_path_split

    return stringify_arrays(
        funnel_path_split(
            _ev(spark, sf),
            anchor_type="signup",
            window_us=86_400_000_000,
            max_depth=10,
        )
    )


# --------------------------------------------------------------------------
# funnelPathSplitByTimes: EVERY anchor opens a new path bucket (reference
# AggregateFunctionFunnelPathSplitByTimes.h) — vs the base funnelPathSplit
# which anchors only at the user's first anchor event.  Duplicate-timestamp
# anchors are deduped (max event_id) so the bucket key is (user, anchor_ts)
# on both engines.
# --------------------------------------------------------------------------
@register(
    "beh_funnel_path_split_times",
    oracle="""
    WITH raw AS (
      SELECT user_id AS u, event_id AS i, event_type AS e,
             epoch_us(CAST(ts AS TIMESTAMP)) AS t
      FROM events
    ),
    ded AS (
      SELECT u, t, i, e FROM (
        SELECT u, t, i, e,
               row_number() OVER (PARTITION BY u, t, e ORDER BY i DESC) AS rn
        FROM raw) x
      WHERE e != 'signup' OR rn = 1
    ),
    tagged AS (
      SELECT u, t, i, e,
             max(CASE WHEN e = 'signup' THEN t END)
               OVER (PARTITION BY u ORDER BY t, i ROWS UNBOUNDED PRECEDING) AS a_t
      FROM ded
    ),
    win AS (
      SELECT * FROM tagged
      WHERE a_t IS NOT NULL AND t <= a_t + 86400000000
    ),
    paths AS (
      SELECT u, a_t, (list(e ORDER BY t, i))[1:10] AS parr
      FROM win GROUP BY u, a_t
    )
    SELECT u AS user_id,
           CAST(row_number() OVER (PARTITION BY u ORDER BY a_t) AS BIGINT)
             AS path_no,
           array_to_string(parr, '|') AS path
    FROM paths
    """,
)
def beh_funnel_path_split_times(spark: SparkSession, sf: str) -> DataFrame:
    from byconity_spark.udafs.behavioral import funnel_path_split_by_times

    ev = _ev(spark, sf)
    wdup = Window.partitionBy("user_id", "ts", "event_type").orderBy(
        F.col("event_id").desc()
    )
    ded = (
        ev.withColumn("__rn", F.row_number().over(wdup))
        .filter((F.col("event_type") != "signup") | (F.col("__rn") == 1))
        .drop("__rn")
    )
    return stringify_arrays(
        funnel_path_split_by_times(
            ded, anchor_type="signup", window_us=86_400_000_000, max_depth=10
        )
    )


# --------------------------------------------------------------------------
# regAuc: exact concordance rate over (pred, label) pairs (reference
# AggregateFunctionRegAuc.h, default flag: strict-concordant + identical).
# Bounded subset — the DuckDB oracle materializes all pairs.
# --------------------------------------------------------------------------
@register(
    "beh_reg_auc",
    oracle="""
    WITH d AS (
      SELECT event_id, round(value, 0) AS p,
             CAST(user_id % 3 AS DOUBLE) AS l
      FROM events WHERE user_id < 50
    ),
    pairs AS (
      SELECT a.p AS pa, a.l AS la, b.p AS pb, b.l AS lb
      FROM d a JOIN d b ON a.event_id < b.event_id
    )
    SELECT round(
      CAST(sum(CASE WHEN (pa > pb AND la > lb) OR (pb > pa AND lb > la)
                      OR (pa = pb AND la = lb) THEN 1 ELSE 0 END) AS DOUBLE)
      / count(*), 6) AS reg_auc
    FROM pairs
    """,
)
def beh_reg_auc(spark: SparkSession, sf: str) -> DataFrame:
    from byconity_spark.udafs.behavioral import reg_auc

    ev = _ev(spark, sf).filter(F.col("user_id") < 50)
    return reg_auc(
        ev, F.round(F.col("value"), 0), (F.col("user_id") % 3).cast("double")
    )


# --------------------------------------------------------------------------
# ecpmAuc: bucketed area under the ecpm-ranked advertiser-value curve
# (reference AggregateFunctionEcpmAuc.h).
# --------------------------------------------------------------------------
@register(
    "beh_ecpm_auc",
    oracle="""
    WITH d AS (
      SELECT least(99999, greatest(0,
               CAST(floor((2.5 - log10(value + 1.0)) / (0.00001 * 5.0)) AS INT)
             )) AS bucket,
             value * 0.01 AS adv
      FROM events
    ),
    per AS (
      SELECT bucket, count(*) AS n, sum(adv) AS a
      FROM d GROUP BY bucket
    ),
    pref AS (
      SELECT bucket, n, a,
             coalesce(sum(a) OVER (ORDER BY bucket
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING), 0) AS before
      FROM per
    )
    SELECT round(
      (sum(n * before) + sum(n * (before + a)))
      / (2.0 * sum(n) * sum(a)), 6) AS ecpm_auc
    FROM pref
    """,
)
def beh_ecpm_auc(spark: SparkSession, sf: str) -> DataFrame:
    from byconity_spark.udafs.behavioral import ecpm_auc

    ev = _ev(spark, sf)
    return ecpm_auc(
        ev,
        F.col("value") + F.lit(1.0),
        F.col("value") * F.lit(0.01),
    )


# --------------------------------------------------------------------------
# finderGroupFunnel: finderFunnel levels split by a user property, emitted
# as per-(slot, prop) step-reach counts (reference
# AggregateFunctionFinderGroupFunnel.h return [(prop, [counts...])...]).
# --------------------------------------------------------------------------
@register(
    "beh_finder_group_funnel",
    oracle=f"""
    WITH {{core}}
    SELECT slot, user_id % 3 AS prop,
           array_to_string(
           [CAST(sum(CASE WHEN funnel_level > 0 THEN 1 ELSE 0 END) AS BIGINT),
            CAST(sum(CASE WHEN funnel_level > 1 THEN 1 ELSE 0 END) AS BIGINT),
            CAST(sum(CASE WHEN funnel_level > 2 THEN 1 ELSE 0 END) AS BIGINT)], '|')
             AS funnel_counts
    FROM lv GROUP BY slot, user_id % 3
    """.format(core=_FF_ORACLE_CORE),
)
def beh_finder_group_funnel(spark: SparkSession, sf: str) -> DataFrame:
    from byconity_spark.udafs.behavioral import finder_group_funnel, funnel_rep

    ev = _ev(spark, sf)
    props = ev.select("user_id").distinct().select(
        "user_id", (F.col("user_id") % 3).alias("prop")
    )
    levels = finder_group_funnel(
        ev,
        props,
        watch_start_us=_FF_START_US,
        watch_step_us=_FF_STEP_US,
        watch_numbers=_FF_SLOTS,
        window_us=_FF_WINDOW_US,
        steps=["signup", "click", "purchase"],
    )
    return stringify_arrays(funnel_rep(levels, ["slot", "prop"], event_numbers=3))


# --------------------------------------------------------------------------
# genArrayMonth: monthly presence bitmask (reference
# AggregateFunctionGenArrayMonth.h — calendar-month slots).
# --------------------------------------------------------------------------
@register(
    "beh_gen_array_month",
    oracle="""
    WITH slotted AS (
      SELECT DISTINCT user_id,
             (year(CAST(ts AS TIMESTAMP)) - 2024) * 12
               + (month(CAST(ts AS TIMESTAMP)) - 1) AS slot
      FROM events
    ),
    ok AS (SELECT * FROM slotted WHERE slot >= 0 AND slot < 12)
    SELECT user_id,
           array_to_string(
           [coalesce(bit_or(1::BIGINT << CAST(slot AS INT)), 0)], '|')
             AS gen_array
    FROM ok GROUP BY user_id
    """,
)
def beh_gen_array_month(spark: SparkSession, sf: str) -> DataFrame:
    from byconity_spark.udafs.behavioral import gen_array_month

    return stringify_arrays(
        gen_array_month(_ev(spark, sf), ["user_id"], "ts", "2024-01-01", 12)
    )


# --------------------------------------------------------------------------
# retention2: cohort retention triangle from start/end day slots (reference
# AggregateFunctionRetention2.h — flat window*window array; emitted here as
# (start_slot, offset, n_users) rows, the relational un-flattening).
# --------------------------------------------------------------------------
@register(
    "beh_retention_triangle",
    oracle="""
    WITH base AS (
      SELECT user_id AS u, event_type AS tp,
             CAST(floor((epoch_us(CAST(ts AS TIMESTAMP)) - 1704067200000000)
                        / 86400000000) AS BIGINT) AS d
      FROM events
    ),
    ok AS (SELECT * FROM base WHERE d >= 0 AND d < 28),
    s AS (SELECT DISTINCT u, d AS sd FROM ok WHERE tp = 'signup'),
    e AS (SELECT DISTINCT u, d AS ed FROM ok WHERE tp = 'purchase')
    SELECT s.sd AS start_slot, e.ed - s.sd AS offset,
           count(DISTINCT s.u) AS n_users
    FROM s JOIN e ON s.u = e.u AND e.ed >= s.sd
    GROUP BY s.sd, e.ed - s.sd
    """,
)
def beh_retention_triangle(spark: SparkSession, sf: str) -> DataFrame:
    from byconity_spark.udafs.behavioral import retention2

    return retention2(
        _ev(spark, sf),
        start_type="signup",
        end_type="purchase",
        start_us=1_704_067_200_000_000,
        window_days=28,
    )


# --------------------------------------------------------------------------
# userDistributionMonthly: ARRIVE/NEWONE per calendar month (reference
# AggregateFunctionUserDistributionMonthly.h).
# --------------------------------------------------------------------------
@register(
    "beh_user_distribution_monthly",
    oracle="""
    WITH arr AS (
      SELECT DISTINCT user_id,
             (year(CAST(ts AS TIMESTAMP)) - 2024) * 12
               + (month(CAST(ts AS TIMESTAMP)) - 1) AS slot
      FROM events
    ),
    ok AS (SELECT * FROM arr WHERE slot >= 0 AND slot < 6),
    reg AS (
      SELECT user_id,
             (year(min(CAST(ts AS TIMESTAMP))) - 2024) * 12
               + (month(min(CAST(ts AS TIMESTAMP))) - 1) AS reg_slot
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    per AS (
      SELECT o.slot,
             count(*) AS n_arrive,
             coalesce(sum(CASE WHEN r.reg_slot = o.slot THEN 1 ELSE 0 END), 0) AS n_new
      FROM ok o LEFT JOIN reg r ON o.user_id = r.user_id
      GROUP BY o.slot
    )
    SELECT s.range AS slot,
           CAST(coalesce(per.n_arrive, 0) AS BIGINT) AS n_arrive,
           CAST(coalesce(per.n_new, 0) AS BIGINT)    AS n_new
    FROM range(6) s LEFT JOIN per ON per.slot = s.range
    """,
)
def beh_user_distribution_monthly(spark: SparkSession, sf: str) -> DataFrame:
    from byconity_spark.udafs.behavioral import user_distribution_monthly

    ev = _ev(spark, sf)
    registrations = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("register_ts"))
    )
    return user_distribution_monthly(ev, registrations, "2024-01-01", 6)


# --------------------------------------------------------------------------
# funnelRep2: conversion-interval distribution per watch slot (reference
# AggregateFunctionFunnelRep2.h "TEA format" — interval-group counts plus
# count/sum/min/max of the conversion time).
# --------------------------------------------------------------------------
_FR2_GROUPS = [0, 3_600_000_000, 86_400_000_000, 259_200_000_000]


@register(
    "beh_funnel_rep2",
    oracle=f"""
    WITH {_FF_ORACLE_CORE},
    conv AS (
      SELECT a.slot, s3.t3 - a.t1 AS iv
      FROM a JOIN s3 ON a.user_id = s3.user_id AND a.slot = s3.slot
    )
    SELECT slot,
           concat(
             CAST(coalesce(sum(CASE WHEN iv >= 0 AND iv < 3600000000 THEN 1 END), 0) AS VARCHAR), '|',
             CAST(coalesce(sum(CASE WHEN iv >= 3600000000 AND iv < 86400000000 THEN 1 END), 0) AS VARCHAR), '|',
             CAST(coalesce(sum(CASE WHEN iv >= 86400000000 AND iv < 259200000000 THEN 1 END), 0) AS VARCHAR)
           ) AS interval_counts,
           count(*) AS n_conv,
           CAST(sum(iv) AS BIGINT) AS iv_sum,
           min(iv) AS iv_min,
           max(iv) AS iv_max
    FROM conv GROUP BY slot
    """,
)
def beh_funnel_rep2(spark: SparkSession, sf: str) -> DataFrame:
    from byconity_spark.udafs.behavioral import finder_funnel, funnel_rep2

    levels = finder_funnel(
        _ev(spark, sf),
        watch_start_us=_FF_START_US,
        watch_step_us=_FF_STEP_US,
        watch_numbers=_FF_SLOTS,
        window_us=_FF_WINDOW_US,
        steps=["signup", "click", "purchase"],
        emit_times=True,
    )
    return funnel_rep2(levels, n_steps=3, interval_group_us=_FR2_GROUPS)


# --------------------------------------------------------------------------
# funnelRep3: per-(slot, step) reached-counts + interval stats incl.
# 0.25/0.5/0.75 percentiles (exact, vs the reference tdigest).
# --------------------------------------------------------------------------
@register(
    "beh_funnel_rep3",
    oracle=f"""
    WITH {{core}},
    iv1 AS (SELECT a.slot, CAST(0 AS DOUBLE) AS iv FROM a),
    iv2 AS (SELECT a.slot, CAST(s2.t2 - a.t1 AS DOUBLE) AS iv
            FROM a JOIN s2 ON a.user_id = s2.user_id AND a.slot = s2.slot),
    iv3 AS (SELECT a.slot, CAST(s3.t3 - a.t1 AS DOUBLE) AS iv
            FROM a JOIN s3 ON a.user_id = s3.user_id AND a.slot = s3.slot),
    cnts AS (
      -- cross slots x steps so sparse slots keep their ZERO-count rows
      -- (funnelRep emits every watch slot; a bare per-step GROUP BY
      -- drops slots with no user above that level at tiny scale)
      SELECT sl.slot, st.step, count(lv2.user_id) AS cnt
      FROM (SELECT DISTINCT slot FROM lv) sl
      CROSS JOIN (SELECT CAST(unnest(range(0, 3)) AS INTEGER) AS step) st
      LEFT JOIN lv lv2 ON lv2.slot = sl.slot AND lv2.funnel_level > st.step
      GROUP BY 1, 2
    ),
    stats AS (
      SELECT slot, 0 AS step, count(*) AS iv_count,
             round(sum(iv) / 1e6, 4) AS iv_sum,
             round(min(iv) / 1e6, 4) AS iv_min,
             round(max(iv) / 1e6, 4) AS iv_max,
             round(quantile_cont(iv, 0.25) / 1e6, 4) AS q25,
             round(quantile_cont(iv, 0.5) / 1e6, 4) AS q50,
             round(quantile_cont(iv, 0.75) / 1e6, 4) AS q75
      FROM iv1 GROUP BY slot
      UNION ALL
      SELECT slot, 1, count(*), round(sum(iv) / 1e6, 4),
             round(min(iv) / 1e6, 4), round(max(iv) / 1e6, 4),
             round(quantile_cont(iv, 0.25) / 1e6, 4),
             round(quantile_cont(iv, 0.5) / 1e6, 4),
             round(quantile_cont(iv, 0.75) / 1e6, 4)
      FROM iv2 GROUP BY slot
      UNION ALL
      SELECT slot, 2, count(*), round(sum(iv) / 1e6, 4),
             round(min(iv) / 1e6, 4), round(max(iv) / 1e6, 4),
             round(quantile_cont(iv, 0.25) / 1e6, 4),
             round(quantile_cont(iv, 0.5) / 1e6, 4),
             round(quantile_cont(iv, 0.75) / 1e6, 4)
      FROM iv3 GROUP BY slot
    )
    SELECT c.slot, c.step, c.cnt,
           coalesce(s.iv_count, 0) AS iv_count,
           coalesce(s.iv_sum, 0.0) AS iv_sum,
           s.iv_min, s.iv_max, s.q25, s.q50, s.q75
    FROM cnts c LEFT JOIN stats s ON c.slot = s.slot AND c.step = s.step
    """.format(core=_FF_ORACLE_CORE),
)
def beh_funnel_rep3(spark: SparkSession, sf: str) -> DataFrame:
    from byconity_spark.udafs.behavioral import finder_funnel, funnel_rep3

    levels = finder_funnel(
        _ev(spark, sf),
        watch_start_us=_FF_START_US,
        watch_step_us=_FF_STEP_US,
        watch_numbers=_FF_SLOTS,
        window_us=_FF_WINDOW_US,
        steps=["signup", "click", "purchase"],
        emit_times=True,
    )
    out = funnel_rep3(levels, n_steps=3)
    # interval stats reported in SECONDS (see oracle note: microsecond
    # sums outgrow the round(4) double grid at larger scale factors)
    return out.select(
        "slot", "step", "cnt", "iv_count",
        F.round(F.col("iv_sum") / 1e6, 4).alias("iv_sum"),
        F.round(F.col("iv_min") / 1e6, 4).alias("iv_min"),
        F.round(F.col("iv_max") / 1e6, 4).alias("iv_max"),
        F.round(F.col("q25") / 1e6, 4).alias("q25"),
        F.round(F.col("q50") / 1e6, 4).alias("q50"),
        F.round(F.col("q75") / 1e6, 4).alias("q75"),
    )


# --------------------------------------------------------------------------
# Association statistics over the contingency table: cramersV,
# cramersVBiasCorrected, contingencyCoefficient, theilsU.
# --------------------------------------------------------------------------
@register(
    "beh_association_stats",
    oracle="""
    WITH p AS (SELECT event_type AS a, user_id % 7 AS b, count(*) AS c_ab
               FROM events GROUP BY 1, 2),
    ca AS (SELECT a, sum(c_ab) AS c_a FROM p GROUP BY a),
    cb AS (SELECT b, sum(c_ab) AS c_b FROM p GROUP BY b),
    tot AS (SELECT sum(c_ab) AS n, count(DISTINCT a) AS na,
                   count(DISTINCT b) AS nb FROM p),
    agg1 AS (
      SELECT max(t.n) AS n, max(t.na) AS na, max(t.nb) AS nb,
             sum(pow(p.c_ab - ca.c_a * cb.c_b / t.n, 2)
                 / (ca.c_a * cb.c_b / t.n)) AS chi,
             sum((p.c_ab / t.n) * ln(p.c_ab / cb.c_b)) AS dep
      FROM p JOIN ca USING (a) JOIN cb USING (b) CROSS JOIN tot t
    ),
    ha AS (SELECT sum((ca.c_a / t.n) * ln(ca.c_a / t.n)) AS h_a
           FROM ca CROSS JOIN tot t)
    SELECT round(sqrt((chi / n) / (least(na, nb) - 1)), 6) AS cramers_v,
           round(sqrt(greatest(0.0, chi / n - (na-1)*(nb-1)/(n-1.0))
                 / (least(na - (na-1)*(na-1)/(n-1.0),
                          nb - (nb-1)*(nb-1)/(n-1.0)) - 1)), 6) AS cramers_v_bc,
           round(sqrt((chi / n) / (chi / n + n)), 6) AS contingency,
           round((dep - h_a) / h_a, 6) AS theils_u
    FROM agg1 CROSS JOIN ha
    """,
)
def beh_association_stats(spark: SparkSession, sf: str) -> DataFrame:
    from byconity_spark.udafs.behavioral import cross_tab_stats

    out = cross_tab_stats(
        _ev(spark, sf), F.col("event_type"), F.col("user_id") % 7
    )
    return out.select(
        *[F.round(c, 6).alias(c)
          for c in ("cramers_v", "cramers_v_bc", "contingency", "theils_u")]
    )


# --------------------------------------------------------------------------
# exponentialMovingAverage(half_decay)(value, time): order-independent
# latest-time-anchored decay sum over a constant weight denominator.
# --------------------------------------------------------------------------
@register(
    "beh_ema_by_type",
    oracle="""
    WITH b AS (SELECT event_type, value AS v,
                      CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS DOUBLE) / 1e6 AS t
               FROM events),
    m AS (SELECT event_type, max(t) AS t_max FROM b GROUP BY event_type)
    SELECT b.event_type,
           round(sum(b.v * power(2.0, (b.t - m.t_max) / 3600.0))
                 * (1.0 - power(2.0, -1.0 / 3600.0)), 6) AS ema
    FROM b JOIN m USING (event_type)
    GROUP BY b.event_type
    """,
)
def beh_ema_by_type(spark: SparkSession, sf: str) -> DataFrame:
    from byconity_spark.udafs.behavioral import exponential_moving_average

    ev = _ev(spark, sf)
    out = exponential_moving_average(
        ev,
        F.col("value"),
        F.unix_micros("ts") / 1e6,
        half_decay=3600.0,
        group_cols=["event_type"],
    )
    return out.withColumn("ema", F.round("ema", 6))


# --------------------------------------------------------------------------
# pathSplitR / sessionSplitR2 (reference AggregateFunctionPathSplit.cpp
# reversed template, AggregateFunctionSessionSplit.h:234): reverse-scan
# path sessions + (duration, depth, entry, exit) session tuples.
# --------------------------------------------------------------------------
@register(
    "beh_path_split_r",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS t,
             lag(CAST(ts AS TIMESTAMP)) OVER
               (PARTITION BY user_id
                ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS prev_t
      FROM events WHERE user_id % 20 = 3
    ),
    sess AS (
      SELECT *, 1 + sum(CASE WHEN prev_t IS NOT NULL
                              AND epoch_us(prev_t) - epoch_us(t) > 1800000000
                             THEN 1 ELSE 0 END)
                OVER (PARTITION BY user_id
                      ORDER BY t DESC, event_id DESC) AS session_id
      FROM ordered
    )
    SELECT user_id, CAST(session_id AS INT) AS session_id,
           CAST(count(*) AS BIGINT) AS n_events,
           string_agg(event_type, '|' ORDER BY t DESC, event_id DESC) AS path
    FROM sess GROUP BY user_id, session_id
    """,
)
def beh_path_split_r(spark: SparkSession, sf: str) -> DataFrame:
    from byconity_spark.udafs.behavioral import path_split_reverse

    ev = _ev(spark, sf).filter(F.col("user_id") % 20 == 3)
    out = path_split_reverse(ev, gap_us=1_800_000_000)
    return out.select(
        "user_id", "session_id", "n_events",
        F.array_join(F.col("path"), "|").alias("path"),
    )


@register(
    "beh_session_split_r2",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS t,
             lag(CAST(ts AS TIMESTAMP)) OVER
               (PARTITION BY user_id
                ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_t
      FROM events WHERE user_id % 20 = 11
    ),
    sess AS (
      SELECT *, 1 + sum(CASE WHEN prev_t IS NOT NULL
                              AND epoch_us(t) - epoch_us(prev_t) > 1800000000
                             THEN 1 ELSE 0 END)
                OVER (PARTITION BY user_id ORDER BY t, event_id) AS session_id
      FROM ordered
    ),
    tagged AS (
      SELECT *, first_value(event_type) OVER
               (PARTITION BY user_id, session_id ORDER BY t, event_id) AS entry_param,
             last_value(event_type) OVER
               (PARTITION BY user_id, session_id ORDER BY t, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS exit_param
      FROM sess
    )
    SELECT user_id, CAST(session_id AS INT) AS session_id,
           CAST((max(epoch_us(t)) - min(epoch_us(t))) // 1000000 AS BIGINT)
             AS duration_sec,
           CAST(count(*) AS BIGINT) AS depth,
           any_value(entry_param) AS entry_param,
           any_value(exit_param) AS exit_param
    FROM tagged GROUP BY user_id, session_id
    """,
)
def beh_session_split_r2(spark: SparkSession, sf: str) -> DataFrame:
    from byconity_spark.udafs.behavioral import session_split_r2

    ev = _ev(spark, sf).filter(F.col("user_id") % 20 == 11)
    return session_split_r2(ev, gap_us=1_800_000_000)


# pageTime (AggregateFunctionSessionSplit.h:794): per-URL visit count +
# total dwell (next-hit approximation), sessions split at 30-min gaps.
@register(
    "beh_page_time",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS t,
             lag(CAST(ts AS TIMESTAMP)) OVER
               (PARTITION BY user_id
                ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_t
      FROM events
    ),
    sess AS (
      SELECT *, 1 + sum(CASE WHEN prev_t IS NOT NULL
                              AND epoch_us(t) - epoch_us(prev_t) > 1800000000
                             THEN 1 ELSE 0 END)
                OVER (PARTITION BY user_id ORDER BY t, event_id) AS sid
      FROM ordered
    ),
    dwell AS (
      SELECT event_type AS url,
             coalesce(epoch_us(lead(t) OVER
               (PARTITION BY user_id, sid ORDER BY t, event_id))
               - epoch_us(t), 0) AS d_us
      FROM sess
    )
    SELECT url, CAST(count(*) AS BIGINT) AS cnt,
           CAST(sum(d_us) // 1000000 AS BIGINT) AS total_duration_sec
    FROM dwell GROUP BY url
    """,
)
def beh_page_time(spark: SparkSession, sf: str) -> DataFrame:
    from byconity_spark.udafs.behavioral import page_time

    return page_time(_ev(spark, sf), gap_us=1_800_000_000)
