"""attributionAnalysis / Fuse / Correlation workload queries.

Reference: src/AggregateFunctions/AggregateFunctionAttributionAnalysis.h,
AggregateFunctionAttributionAnalysisFuse.h,
AggregateFunctionAttributionCorrelation.h (+ the Fuse .cpp registrations).

Every oracle re-derives the journey/backward-scan semantics in ANSI SQL:
``jid`` = targets strictly before the event in (ts, name, id) order, valid
touches join their journey's target within the back-time window, procedure
gating is an EXISTS between the touch and the target, and the contribution
modes are closed-form per-journey expressions.  The 10-bucket
distributions reproduce the UInt64 arithmetic ((max-min) DIV 10 + 1,
items > 0 only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from byconity_spark.engine.catalog import load_table
from byconity_spark.udafs.attribution import (
    attribution_analysis,
    attribution_analysis_fuse,
    attribution_analysis_partials,
    attribution_correlation,
)
from byconity_spark.workloads import register

_BACK_3D_MS = 3 * 86_400_000
_T_6H_MS = 21_600_000


def _ev(spark: SparkSession, sf: str) -> DataFrame:
    return load_table(spark, sf, "events")


# Shared oracle prelude: relevant-event ordering, journey ids, targets,
# touches, and the window-valid touch occurrences (3-day back time).
_PRELUDE = """
    WITH e AS (
      SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
             event_type AS name, value,
             row_number() OVER w AS rn,
             count(*) FILTER (WHERE event_type = 'purchase')
               OVER (PARTITION BY user_id
                     ORDER BY CAST(ts AS TIMESTAMP), event_type, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS jid
      FROM events WHERE event_type IN ('purchase', 'click', 'view')
      WINDOW w AS (PARTITION BY user_id
                   ORDER BY CAST(ts AS TIMESTAMP), event_type, event_id)
    ),
    tgt AS (SELECT user_id, jid, rn AS trn, ts_us AS tts,
                   CASE WHEN value >= 0 THEN value ELSE -1 END AS tv
            FROM e WHERE name = 'purchase'),
    tch AS (SELECT user_id, jid, rn, ts_us, name FROM e
            WHERE name IN ({touches})),
    valid AS (
      SELECT t.user_id, t.jid, t.tts, t.tv, t.trn, c.name, c.rn,
             (t.tts - c.ts_us) AS dt_us, (t.trn - c.rn) AS step
      FROM tgt t JOIN tch c USING (user_id, jid)
      WHERE c.rn < t.trn AND t.tts - c.ts_us <= 259200000000{procedure_pred}
    ),
    clicks AS (SELECT name AS touch_event, count(*) AS click_cnt
               FROM e WHERE name IN ({touches}) GROUP BY 1),
    vstat AS (SELECT name AS touch_event, count(*) AS valid_transform_cnt,
                     sum(dt_us // 1000) AS gap_ms_sum, sum(step) AS steps_sum
              FROM valid GROUP BY 1),
    jstat AS (SELECT user_id, jid, count(*) AS all_cnt FROM valid GROUP BY 1, 2),
    others AS (SELECT count(*) AS click_cnt,
                      coalesce(sum(CASE WHEN t.tv > 0 THEN t.tv ELSE 1.0 END), 0)
                        AS value
               FROM tgt t
               LEFT JOIN (SELECT DISTINCT user_id, jid FROM valid) v
                 USING (user_id, jid)
               WHERE v.user_id IS NULL)
"""


def _prelude(touches: str = "'click', 'view'", procedure_pred: str = "") -> str:
    return _PRELUDE.format(touches=touches, procedure_pred=procedure_pred)


_COUNTS_TAIL = """
    SELECT c.touch_event, c.click_cnt,
           coalesce(v.valid_transform_cnt, 0) AS valid_transform_cnt,
           round(coalesce(x.value, 0), 4)     AS value,
           CAST(coalesce(v.gap_ms_sum, 0) AS BIGINT) AS gap_ms_sum,
           CAST(coalesce(v.steps_sum, 0) AS BIGINT)  AS steps_sum
    FROM clicks c
    LEFT JOIN vstat v USING (touch_event)
    LEFT JOIN vals x USING (touch_event)
    UNION ALL
    SELECT '$other_conversions', o.click_cnt, 0, round(o.value, 4),
           CAST(0 AS BIGINT), CAST(0 AS BIGINT)
    FROM others o
"""


def _analysis_frame(spark, sf, **kw) -> DataFrame:
    out = attribution_analysis(
        _ev(spark, sf),
        target_event="purchase",
        touch_events=["click", "view"],
        back_time_ms=_BACK_3D_MS,
        other_transform=True,
        **kw,
    )
    return out.select(
        "touch_event",
        "click_cnt",
        "valid_transform_cnt",
        F.round("value", 4).alias("value"),
        "gap_ms_sum",
        "steps_sum",
    )


# --------------------------------------------------------------------------
# attributionAnalysis, mode 2 (count-proportional contribution).
# --------------------------------------------------------------------------
@register(
    "beh_attr_analysis_counts",
    oracle=_prelude()
    + """,
    jval AS (SELECT user_id, jid, name, max(tv) AS tv, count(*) AS cnt
             FROM valid GROUP BY 1, 2, 3),
    vals AS (SELECT j.name AS touch_event,
                    sum(CASE WHEN j.tv > 0 THEN j.tv * j.cnt / s.all_cnt
                        ELSE CAST(j.cnt AS DOUBLE) / s.all_cnt END) AS value
             FROM jval j JOIN jstat s USING (user_id, jid) GROUP BY 1)
    """
    + _COUNTS_TAIL,
)
def beh_attr_analysis_counts(spark: SparkSession, sf: str) -> DataFrame:
    return _analysis_frame(spark, sf, mode=2)


# --------------------------------------------------------------------------
# attributionAnalysis, mode 0: the EARLIEST valid touch takes the whole
# conversion (calculateContribution scans valid_events from the end).
# --------------------------------------------------------------------------
@register(
    "beh_attr_analysis_first",
    oracle=_prelude()
    + """,
    jfirst AS (SELECT user_id, jid, min_by(name, rn) AS touch_event,
                      max(tv) AS tv
               FROM valid GROUP BY 1, 2),
    vals AS (SELECT touch_event,
                    sum(CASE WHEN tv > 0 THEN tv ELSE 1.0 END) AS value
             FROM jfirst GROUP BY 1)
    """
    + _COUNTS_TAIL,
)
def beh_attr_analysis_first(spark: SparkSession, sf: str) -> DataFrame:
    return _analysis_frame(spark, sf, mode=0)


# --------------------------------------------------------------------------
# attributionAnalysis, mode 4: time-decay 0.5^(Δms DIV t), normalized per
# journey.  Integer division — transform_time and t are UInt64 in the
# reference (AttributionAnalysis.h:570).
# --------------------------------------------------------------------------
@register(
    "beh_attr_analysis_decay",
    oracle=_prelude()
    + f""",
    wocc AS (SELECT *, power(0.5, CAST((dt_us // 1000) // {_T_6H_MS} AS DOUBLE))
                    AS w
             FROM valid),
    jw AS (SELECT user_id, jid, sum(w) AS tot FROM wocc GROUP BY 1, 2),
    vals AS (SELECT o.name AS touch_event,
                    sum(CASE WHEN o.tv > 0 THEN o.tv * o.w / j.tot
                        ELSE o.w / j.tot END) AS value
             FROM wocc o JOIN jw j USING (user_id, jid)
             WHERE j.tot > 0 GROUP BY 1)
    """
    + _COUNTS_TAIL,
)
def beh_attr_analysis_decay(spark: SparkSession, sf: str) -> DataFrame:
    return _analysis_frame(spark, sf, mode=4, t_ms=_T_6H_MS)


# --------------------------------------------------------------------------
# attributionAnalysis with a procedure event: 'click' touches convert only
# when a 'view' (procedure) happened between the click and the purchase
# (the backward scan accumulates procedure types before validating
# touches, AttributionAnalysis.h:448-475).
# --------------------------------------------------------------------------
@register(
    "beh_attr_analysis_procedure",
    oracle=_prelude(
        touches="'click'",
        procedure_pred="""
        AND EXISTS (SELECT 1 FROM e p
                    WHERE p.user_id = t.user_id AND p.name = 'view'
                      AND p.rn > c.rn AND p.rn < t.trn)""",
    )
    + """,
    jval AS (SELECT user_id, jid, name, max(tv) AS tv, count(*) AS cnt
             FROM valid GROUP BY 1, 2, 3),
    vals AS (SELECT j.name AS touch_event,
                    sum(CASE WHEN j.tv > 0 THEN j.tv * j.cnt / s.all_cnt
                        ELSE CAST(j.cnt AS DOUBLE) / s.all_cnt END) AS value
             FROM jval j JOIN jstat s USING (user_id, jid) GROUP BY 1)
    """
    + _COUNTS_TAIL,
)
def beh_attr_analysis_procedure(spark: SparkSession, sf: str) -> DataFrame:
    out = attribution_analysis(
        _ev(spark, sf),
        target_event="purchase",
        touch_events=["click"],
        procedure_events=["view"],
        back_time_ms=_BACK_3D_MS,
        mode=2,
        other_transform=True,
    )
    return out.select(
        "touch_event",
        "click_cnt",
        "valid_transform_cnt",
        F.round("value", 4).alias("value"),
        "gap_ms_sum",
        "steps_sum",
    )


# Distribution CTEs shared by fuse + correlation oracles (over `valid`).
_DIST = """,
    base AS (SELECT name AS touch_event, dt_us // 1000 AS g, step AS s
             FROM valid),
    tstat AS (SELECT touch_event, min(g) AS mn, max(g) AS mx
              FROM base GROUP BY 1),
    tb AS (SELECT b.touch_event,
                  ((b.g - t.mn) // ((t.mx - t.mn) // 10 + 1)) AS slot
           FROM base b JOIN tstat t USING (touch_event) WHERE b.g > 0),
    tslots AS (SELECT t.touch_event, r.range AS i, count(x.slot) AS c
               FROM tstat t CROSS JOIN range(10) r
               LEFT JOIN tb x ON x.touch_event = t.touch_event
                             AND x.slot = r.range
               GROUP BY 1, 2),
    tdist AS (SELECT touch_event,
                     string_agg(CAST(c AS VARCHAR), '|' ORDER BY i)
                       AS time_dist
              FROM tslots GROUP BY 1),
    sstat AS (SELECT touch_event, min(s) AS mn, max(s) AS mx
              FROM base GROUP BY 1),
    sb AS (SELECT b.touch_event,
                  ((b.s - t.mn) // ((t.mx - t.mn) // 10 + 1)) AS slot
           FROM base b JOIN sstat t USING (touch_event) WHERE b.s > 0),
    sslots AS (SELECT t.touch_event, r.range AS i, count(x.slot) AS c
               FROM sstat t CROSS JOIN range(10) r
               LEFT JOIN sb x ON x.touch_event = t.touch_event
                             AND x.slot = r.range
               GROUP BY 1, 2),
    sdist AS (SELECT touch_event,
                     string_agg(CAST(c AS VARCHAR), '|' ORDER BY i)
                       AS step_dist
              FROM sslots GROUP BY 1)
"""


# --------------------------------------------------------------------------
# attributionAnalysisFuse: ratio, contribution = value/total, 10-bucket
# time/step distributions (mode-2 stage-1).
# --------------------------------------------------------------------------
@register(
    "beh_attr_fuse",
    oracle=_prelude()
    + """,
    jval AS (SELECT user_id, jid, name, max(tv) AS tv, count(*) AS cnt
             FROM valid GROUP BY 1, 2, 3),
    vals AS (SELECT j.name AS touch_event,
                    sum(CASE WHEN j.tv > 0 THEN j.tv * j.cnt / s.all_cnt
                        ELSE CAST(j.cnt AS DOUBLE) / s.all_cnt END) AS value
             FROM jval j JOIN jstat s USING (user_id, jid) GROUP BY 1)
    """
    + _DIST
    + """,
    merged AS (
      SELECT c.touch_event, c.click_cnt,
             coalesce(v.valid_transform_cnt, 0) AS valid_transform_cnt,
             coalesce(x.value, 0) AS value
      FROM clicks c
      LEFT JOIN vstat v USING (touch_event)
      LEFT JOIN vals x USING (touch_event)
      UNION ALL
      SELECT '$other_conversions', o.click_cnt, 0, o.value FROM others o
    ),
    tot AS (SELECT sum(value) AS total_value FROM merged)
    SELECT m.touch_event, m.click_cnt, m.valid_transform_cnt,
           round(m.value, 4) AS value,
           round(CASE WHEN t.total_value > 0 AND m.click_cnt != 0
                 THEN CAST(m.valid_transform_cnt AS DOUBLE) / m.click_cnt
                 ELSE 0.0 END, 6) AS valid_transform_ratio,
           round(CASE WHEN t.total_value > 0
                 THEN m.value / t.total_value ELSE 0.0 END, 6)
             AS contribution,
           coalesce(td.time_dist, '0') AS time_dist,
           coalesce(sd.step_dist, '0') AS step_dist
    FROM merged m CROSS JOIN tot t
    LEFT JOIN tdist td USING (touch_event)
    LEFT JOIN sdist sd USING (touch_event)
    """,
)
def beh_attr_fuse(spark: SparkSession, sf: str) -> DataFrame:
    parts = attribution_analysis_partials(
        _ev(spark, sf),
        target_event="purchase",
        touch_events=["click", "view"],
        back_time_ms=_BACK_3D_MS,
        mode=2,
        other_transform=True,
    )
    out = attribution_analysis_fuse(parts)
    return out.select(
        "touch_event",
        "click_cnt",
        "valid_transform_cnt",
        F.round("value", 4).alias("value"),
        F.round("valid_transform_ratio", 6).alias("valid_transform_ratio"),
        F.round("contribution", 6).alias("contribution"),
        "time_dist",
        "step_dist",
    )


# --------------------------------------------------------------------------
# attributionCorrelation: per-touch Spearman over per-user (total, valid)
# feature pairs (users with any valid touch), reference tie-averaged-rank
# formula 1 - 6*sum(d^2)/(n*(n^2-1)); 0 when sum(valid) = 0 or n < 2.
# --------------------------------------------------------------------------
@register(
    "beh_attr_correlation",
    oracle=_prelude()
    + _DIST
    + """,
    uclick AS (SELECT user_id, name AS touch_event, count(*) AS total
               FROM e WHERE name IN ('click', 'view') GROUP BY 1, 2),
    uvalid AS (SELECT user_id, name AS touch_event, count(*) AS valid
               FROM valid GROUP BY 1, 2),
    upart AS (SELECT u.user_id, u.touch_event, u.total,
                     coalesce(v.valid, 0) AS valid
              FROM uclick u LEFT JOIN uvalid v USING (user_id, touch_event)),
    hv AS (SELECT DISTINCT user_id FROM valid),
    feats AS (SELECT p.* FROM upart p JOIN hv USING (user_id)),
    ranked AS (SELECT touch_event, valid,
                      rank() OVER (PARTITION BY touch_event ORDER BY total)
                        + (count(*) OVER (PARTITION BY touch_event, total) - 1)
                          / 2.0 AS rx,
                      rank() OVER (PARTITION BY touch_event ORDER BY valid)
                        + (count(*) OVER (PARTITION BY touch_event, valid) - 1)
                          / 2.0 AS ry
               FROM feats),
    corr AS (SELECT touch_event, count(*) AS n, sum(valid) AS sumy,
                    sum((rx - ry) * (rx - ry)) AS d2
             FROM ranked GROUP BY 1),
    jval AS (SELECT user_id, jid, name, max(tv) AS tv, count(*) AS cnt
             FROM valid GROUP BY 1, 2, 3),
    vals AS (SELECT j.name AS touch_event,
                    sum(CASE WHEN j.tv > 0 THEN j.tv * j.cnt / s.all_cnt
                        ELSE CAST(j.cnt AS DOUBLE) / s.all_cnt END) AS value
             FROM jval j JOIN jstat s USING (user_id, jid) GROUP BY 1)
    SELECT c.touch_event, c.click_cnt,
           coalesce(v.valid_transform_cnt, 0) AS valid_transform_cnt,
           round(coalesce(x.value, 0), 4) AS value,
           round(CASE WHEN coalesce(o.sumy, 0) = 0 OR o.n < 2 THEN 0.0
                 ELSE 1 - 6.0 * o.d2 / (o.n * (o.n * o.n - 1)) END, 6)
             AS correlation,
           round(CASE WHEN c.click_cnt != 0
                 THEN CAST(coalesce(v.valid_transform_cnt, 0) AS DOUBLE)
                      / c.click_cnt
                 ELSE 0.0 END, 6) AS valid_transform_ratio,
           coalesce(td.time_dist, '0') AS time_dist,
           coalesce(sd.step_dist, '0') AS step_dist
    FROM clicks c
    LEFT JOIN vstat v USING (touch_event)
    LEFT JOIN vals x USING (touch_event)
    LEFT JOIN corr o USING (touch_event)
    LEFT JOIN tdist td USING (touch_event)
    LEFT JOIN sdist sd USING (touch_event)
    """,
)
def beh_attr_correlation(spark: SparkSession, sf: str) -> DataFrame:
    parts = attribution_analysis_partials(
        _ev(spark, sf),
        target_event="purchase",
        touch_events=["click", "view"],
        back_time_ms=_BACK_3D_MS,
        mode=2,
        other_transform=False,
    )
    out = attribution_correlation(parts)
    return out.select(
        "touch_event",
        "click_cnt",
        "valid_transform_cnt",
        F.round("value", 4).alias("value"),
        F.round("correlation", 6).alias("correlation"),
        F.round("valid_transform_ratio", 6).alias("valid_transform_ratio"),
        "time_dist",
        "step_dist",
    )
