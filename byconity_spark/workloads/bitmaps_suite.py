"""Bitmap workload: audience-overlap analytics over events — build per-type
user bitmaps, then set algebra across types, hash-checked against DISTINCT
SQL equivalents (the bitmap encoding is internal; the exposed numbers are
exact set cardinalities, which DuckDB reproduces relationally)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from byconity_spark.engine.catalog import load_table
from byconity_spark.udafs.bitmaps import (
    bitmap_and_cardinality,
    bitmap_cardinality,
    bitmap_or_cardinality,
    group_bitmap,
)
from byconity_spark.workloads import register


@register(
    "bitmap_cardinality_by_type",
    oracle="""
    SELECT event_type, count(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type
    """,
)
def bitmap_cardinality_by_type(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    bm = group_bitmap(ev, ["event_type"], "user_id")
    return bm.select("event_type", bitmap_cardinality(F.col("bm")).alias("n_users"))


@register(
    "bitmap_audience_overlap",
    oracle="""
    WITH d AS (SELECT DISTINCT event_type, user_id FROM events)
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           count(*) AS overlap
    FROM d a JOIN d b ON a.user_id = b.user_id AND a.event_type < b.event_type
    GROUP BY 1, 2
    """,
)
def bitmap_audience_overlap(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    bm = group_bitmap(ev, ["event_type"], "user_id")
    a = bm.select(F.col("event_type").alias("type_a"), F.col("bm").alias("bm_a"))
    b = bm.select(F.col("event_type").alias("type_b"), F.col("bm").alias("bm_b"))
    pairs = a.join(b, F.col("type_a") < F.col("type_b"))
    return (
        pairs.select(
            "type_a",
            "type_b",
            bitmap_and_cardinality(F.col("bm_a"), F.col("bm_b")).alias("overlap"),
        )
        .filter(F.col("overlap") > 0)
    )


@register(
    "bitmap_union_reach",
    oracle="""
    SELECT count(DISTINCT user_id) AS reach
    FROM events WHERE event_type IN ('signup', 'purchase')
    """,
)
def bitmap_union_reach(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    bm = group_bitmap(ev, ["event_type"], "user_id")
    s = bm.filter(F.col("event_type") == "signup").select(F.col("bm").alias("bm_a"))
    p = bm.filter(F.col("event_type") == "purchase").select(F.col("bm").alias("bm_b"))
    return s.crossJoin(p).select(
        bitmap_or_cardinality(F.col("bm_a"), F.col("bm_b")).alias("reach")
    )


@register(
    "bitmap_state_merge_uniq",
    oracle="""
    SELECT event_type, count(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type
    """,
)
def bitmap_state_merge_uniq(spark: SparkSession, sf: str) -> DataFrame:
    """-State/-Merge combinator pair (registerAggregateFunctions.cpp
    -State/-Merge): build fine-grained per-(type, day) bitmap STATES, then
    re-aggregate the coarser per-type uniques by MERGING states — the
    AggregatingMergeTree incremental-rollup pattern.  The second pass
    shuffles only compressed roaring states, not raw user ids."""
    from byconity_spark.udafs.bitmaps import group_bitmap_merge

    ev = load_table(spark, sf, "events").withColumn("day", F.to_date("ts"))
    states = group_bitmap(ev, ["event_type", "day"], "user_id")
    merged = group_bitmap_merge(states.drop("day"), ["event_type"])
    return merged.select(
        "event_type", bitmap_cardinality(F.col("bm")).alias("n_users")
    )


# ------------------- BitmapCount expression over per-type user bitmaps
@register(
    "bitmap_expression_count",
    oracle="""
    WITH p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
    c AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
    v AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'view'),
    combined AS (
      SELECT user_id FROM p
      INTERSECT
      (SELECT user_id FROM c UNION SELECT user_id FROM v)
    )
    SELECT count(*) AS cardinality
    FROM (SELECT user_id FROM combined
          EXCEPT SELECT DISTINCT user_id FROM events WHERE event_type = 'signup')
    """,
)
def bitmap_expression_count(spark: SparkSession, sf: str) -> DataFrame:
    """BitmapCount('purchase&(click|view)~signup') — the reference's
    audience-expression aggregate (BitmapExpressionCalculation.h) over
    per-event-type user bitmaps built with group_bitmap."""
    from byconity_spark.udafs.bitmaps import bitmap_expression

    ev = load_table(spark, sf, "events")
    states = group_bitmap(ev, ["event_type"], "user_id").withColumnRenamed(
        "event_type", "tag"
    )
    out = bitmap_expression(states, "purchase&(click|view)~signup")
    return out.select(F.col("cardinality"))


# --------------------- bitmapMaxLevel: members kept at their highest level
@register(
    "bitmap_max_level",
    oracle="""
    WITH lv AS (
      SELECT user_id,
             CASE event_type WHEN 'purchase' THEN 3
                             WHEN 'click' THEN 2 ELSE 1 END AS level
      FROM events
    ),
    top AS (SELECT user_id, max(level) AS level FROM lv GROUP BY user_id),
    counts AS (SELECT level, count(*) AS cardinality FROM top GROUP BY level)
    SELECT l.range + 1 AS level, coalesce(c.cardinality, 0) AS cardinality
    FROM range(3) l LEFT JOIN counts c ON c.level = l.range + 1
    """,
)
def bitmap_max_level(spark: SparkSession, sf: str) -> DataFrame:
    """bitmapMaxLevel over engagement levels (view=1 < click=2 <
    purchase=3): each user counts only at their deepest level."""
    from byconity_spark.udafs.bitmaps import bitmap_max_level as bml

    ev = load_table(spark, sf, "events").withColumn(
        "level",
        F.when(F.col("event_type") == "purchase", 3)
        .when(F.col("event_type") == "click", 2)
        .otherwise(1),
    )
    states = group_bitmap(ev, ["level"], "user_id")
    return bml(states, "level", "bm")


# ----------------------- bitmapJoin (AND of per-slot audience bitmaps)
@register(
    "bitmap_join_slot_overlap",
    oracle="""
    WITH c AS (
      SELECT DISTINCT
             CAST(floor(epoch_us(CAST(ts AS TIMESTAMP)) / 86400000000) % 7
                  AS BIGINT) AS slot,
             user_id
      FROM events WHERE event_type = 'click'
    ),
    p AS (
      SELECT DISTINCT
             CAST(floor(epoch_us(CAST(ts AS TIMESTAMP)) / 86400000000) % 7
                  AS BIGINT) AS slot,
             user_id
      FROM events WHERE event_type = 'purchase'
    )
    SELECT slot, CAST(count(*) AS BIGINT) AS cardinality
    FROM (SELECT DISTINCT c.slot, c.user_id FROM c JOIN p USING (slot, user_id)) g
    GROUP BY slot
    """,
)
def bitmap_join_slot_overlap(spark: SparkSession, sf: str) -> DataFrame:
    """bitmapJoin (reference AggregateFunctionBitMapJoin.h:52-118): join
    per-slot click and purchase audience bitmaps on the slot key, AND the
    pairs, emit per-slot overlap cardinality.  The reference runs the join
    inside one aggregate on a sharded driver map (single node by design);
    here it is a Spark equi-join over compressed states — cluster-scaled."""
    from byconity_spark.udafs.bitmaps import bitmap_join, group_bitmap

    ev = load_table(spark, sf, "events").withColumn(
        "slot",
        (F.floor(F.unix_micros(F.col("ts")) / F.lit(86_400_000_000)) % 7).cast(
            "long"
        ),
    )
    clicks = group_bitmap(
        ev.filter(F.col("event_type") == "click"), ["slot"], "user_id"
    )
    purchases = group_bitmap(
        ev.filter(F.col("event_type") == "purchase"), ["slot"], "user_id"
    )
    out = bitmap_join(clicks, purchases, on=["slot"], logic_op="AND")
    return out.filter(F.col("cardinality") > 0).select("slot", "cardinality")


# ------------------- bitmapColumnDiff (day-over-day audience churn)
@register(
    "bitmap_column_diff_daily",
    oracle="""
    WITH d AS (
      SELECT DISTINCT
             CAST(floor(epoch_us(CAST(ts AS TIMESTAMP)) / 86400000000)
                  AS BIGINT) AS day,
             user_id
      FROM events WHERE event_type = 'click'
    ),
    days AS (SELECT DISTINCT day FROM d),
    ranked AS (
      SELECT day, row_number() OVER (ORDER BY day) AS r FROM days
    ),
    pairs AS (
      SELECT a.day AS day, b.day AS next_day
      FROM ranked a LEFT JOIN ranked b ON b.r = a.r + 1
    )
    SELECT p.day,
           CAST(coalesce(sum(CASE WHEN e.user_id IS NULL AND p.next_day IS NOT NULL
                             THEN 1 END), 0) AS BIGINT) AS cardinality
    FROM pairs p
    LEFT JOIN d s ON s.day = p.day
    LEFT JOIN d e ON e.day = p.next_day AND e.user_id = s.user_id
    GROUP BY p.day
    """,
)
def bitmap_column_diff_daily(spark: SparkSession, sf: str) -> DataFrame:
    """bitmapColumnDiff FORWARD step=1 over daily click-audience bitmaps:
    per day, how many users did NOT return the next day (churn)."""
    from byconity_spark.udafs.bitmaps import bitmap_column_diff, group_bitmap

    ev = load_table(spark, sf, "events").filter(
        F.col("event_type") == "click"
    ).withColumn(
        "day",
        F.floor(F.unix_micros(F.col("ts")) / F.lit(86_400_000_000)).cast("long"),
    )
    states = group_bitmap(ev, ["day"], "user_id")
    return bitmap_column_diff(states, "day", step=1, direction="forward")


# --------------------------------------------------------------------------
# BitMapColumn* logical folds (reference AggregateFunctionBitmapLogic.h:
# bitMapColumnAnd/Or/Xor/Cardinality): per-type user bitmaps AND/OR/XOR
# folded across all types — users in EVERY type, ANY type, an ODD number of
# types.  All three have exact COUNT-DISTINCT-style SQL oracles.
# --------------------------------------------------------------------------
@register(
    "bitmap_column_logic",
    oracle="""
    WITH per_user AS (
      SELECT user_id, count(DISTINCT event_type) AS n_types
      FROM events GROUP BY user_id
    ),
    n_all AS (SELECT count(DISTINCT event_type) AS t FROM events)
    SELECT CAST((SELECT count(*) FROM per_user, n_all
                 WHERE n_types = t) AS BIGINT)            AS in_all,
           CAST((SELECT count(*) FROM per_user) AS BIGINT) AS in_any,
           CAST((SELECT count(*) FROM per_user
                 WHERE n_types % 2 = 1) AS BIGINT)        AS in_odd
    """,
)
def bitmap_column_logic(spark: SparkSession, sf: str) -> DataFrame:
    from byconity_spark.udafs.bitmaps import (
        bitmap_cardinality, bitmap_column_fold, group_bitmap,
    )

    ev = load_table(spark, sf, "events").select("event_type", "user_id")
    states = group_bitmap(ev, ["event_type"], "user_id").withColumn(
        "g", F.lit(1)
    )

    def card(op: str, name: str) -> DataFrame:
        folded = bitmap_column_fold(states, ["g"], "bm", op)
        return folded.select(bitmap_cardinality(F.col("bm")).alias(name))

    return (
        card("and", "in_all")
        .crossJoin(card("or", "in_any"))
        .crossJoin(card("xor", "in_odd"))
    )
