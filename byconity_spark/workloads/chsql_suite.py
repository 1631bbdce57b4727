"""ClickHouse-dialect SQL frontend workload: queries written in CH SQL,
rewritten by byconity_spark.frontend and executed via spark.sql over the
registered engine views — the end-to-end compat surface."""

from __future__ import annotations

from byconity_spark.engine.localdf import local_df as _local_df

from pyspark.sql import DataFrame, SparkSession

from byconity_spark.engine.catalog import register_views
from byconity_spark.frontend import ch_sql
from byconity_spark.workloads import register


def _run(spark: SparkSession, sf: str, sql: str) -> DataFrame:
    register_views(spark, sf)
    return ch_sql(spark, sql)


@register(
    "chsql_hourly_activity",
    oracle="""
    SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour, event_type,
           count(*) FILTER (WHERE value > 100) AS n_big,
           count(DISTINCT user_id)             AS u,
           quantile_cont(value, 0.5)           AS p50,
           round(sum(value) FILTER (WHERE user_id % 2 = 0), 4) AS even_sum
    FROM events GROUP BY 1, 2
    """,
)
def chsql_hourly_activity(spark: SparkSession, sf: str) -> DataFrame:
    return _run(
        spark,
        sf,
        """
        SELECT toStartOfHour(ts) AS hour, event_type,
               countIf(value > 100) AS n_big,
               uniqExact(user_id) AS u,
               quantileExact(0.5)(value) AS p50,
               round(sumIf(value, user_id % 2 = 0), 4) AS even_sum
        FROM events GROUP BY hour, event_type
        """,
    )


@register(
    "chsql_order_buckets",
    oracle="""
    SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS INT) AS ym,
           CASE WHEN o_totalprice < 50000 THEN 'small'
                WHEN o_totalprice < 200000 THEN 'mid'
                ELSE 'big' END AS bucket,
           count(*) AS n, round(sum(o_totalprice), 2) AS total
    FROM orders GROUP BY 1, 2
    """,
)
def chsql_order_buckets(spark: SparkSession, sf: str) -> DataFrame:
    return _run(
        spark,
        sf,
        """
        SELECT toYYYYMM(o_orderdate) AS ym,
               multiIf(o_totalprice < 50000, 'small',
                       o_totalprice < 200000, 'mid', 'big') AS bucket,
               count() AS n, round(sum(o_totalprice), 2) AS total
        FROM orders GROUP BY ym, bucket
        """,
    )


@register(
    "chsql_limit_by",
    oracle="""
    SELECT user_id, event_type, n FROM (
      SELECT user_id, event_type, count(*) AS n,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY count(*) DESC, user_id) AS rn
      FROM events GROUP BY user_id, event_type
    ) WHERE rn <= 2
    """,
)
def chsql_limit_by(spark: SparkSession, sf: str) -> DataFrame:
    return _run(
        spark,
        sf,
        """
        SELECT user_id, event_type, count() AS n
        FROM events GROUP BY user_id, event_type
        ORDER BY n DESC, user_id LIMIT 2 BY event_type
        """,
    )


@register(
    "chsql_with_fill",
    oracle="""
    WITH hourly AS (
      SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour, count(*) AS n
      FROM events
      WHERE event_type = 'purchase' AND ts < TIMESTAMP '2024-01-08 00:00:00'
      GROUP BY 1
    )
    SELECT s.hour, h.n
    FROM (SELECT unnest(generate_series((SELECT min(hour) FROM hourly),
                                        (SELECT max(hour) FROM hourly),
                                        INTERVAL 1 HOUR)) AS hour) s
    LEFT JOIN hourly h ON s.hour = h.hour
    """,
)
def chsql_with_fill(spark: SparkSession, sf: str) -> DataFrame:
    """WITH FILL through the SQL frontend (FillingStep.h:24): filled rows
    carry NULL payloads — coalesce is the user's choice, as documented."""
    return _run(
        spark,
        sf,
        """
        SELECT hour, n FROM (
          SELECT toStartOfHour(ts) AS hour, count() AS n
          FROM events
          WHERE event_type = 'purchase' AND ts < toDateTime('2024-01-08 00:00:00')
          GROUP BY hour
        ) ORDER BY hour WITH FILL STEP INTERVAL 1 HOUR
        """,
    )


@register(
    "chsql_json_match",
    oracle="""
    SELECT CAST(props->>'$.k' AS BIGINT) AS k,
           count(*) FILTER (WHERE regexp_matches(event_type, 'click|view')) AS cv,
           count(*) AS n
    FROM events GROUP BY 1
    """,
)
def chsql_json_match(spark: SparkSession, sf: str) -> DataFrame:
    return _run(
        spark,
        sf,
        """
        SELECT JSONExtractInt(props, 'k') AS k,
               countIf(match(event_type, 'click|view')) AS cv,
               count() AS n
        FROM events GROUP BY k
        """,
    )


@register(
    "chsql_array_join_words",
    oracle="""
    SELECT w AS word, count(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
    WHERE length(w) >= 5
    GROUP BY w
    ORDER BY n DESC, word
    LIMIT 20
    """,
)
def chsql_array_join_words(spark: SparkSession, sf: str) -> DataFrame:
    """CH ARRAY JOIN clause (ArrayJoinStep.h:26) through the frontend:
    rewritten to LATERAL VIEW explode."""
    return _run(
        spark,
        sf,
        """
        SELECT w AS word, count() AS n
        FROM documents ARRAY JOIN splitByChar(' ', text) AS w
        WHERE lengthUTF8(w) >= 5
        GROUP BY w
        ORDER BY n DESC, word
        LIMIT 20
        """,
    )


@register(
    "chsql_numbers_squares",
    oracle="""
    SELECT CAST(n AS BIGINT) AS number, CAST(n * n AS BIGINT) AS sq
    FROM (SELECT unnest(range(10, 20)) AS n)
    """,
)
def chsql_numbers_squares(spark: SparkSession, sf: str) -> DataFrame:
    """numbers(start, count) table function -> range() rewrite."""
    return _run(
        spark,
        sf,
        "SELECT number, number * number AS sq FROM numbers(10, 10)",
    )


@register(
    "chsql_totals_by_status",
    oracle="""
    SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), ())
    """,
)
def chsql_totals_by_status(spark: SparkSession, sf: str) -> DataFrame:
    """CH WITH TOTALS (TotalsHavingStep.h:29) -> GROUPING SETS rewrite."""
    return _run(
        spark,
        sf,
        """
        SELECT o_orderstatus, count() AS n, round(sum(o_totalprice), 2) AS total
        FROM orders GROUP BY o_orderstatus WITH TOTALS
        """,
    )


@register(
    "chsql_asof",
    oracle="""
    WITH p AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
      FROM events WHERE event_type = 'purchase'
    ),
    c AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS click_ts, max(event_id) AS click_id
      FROM events WHERE event_type = 'click' GROUP BY user_id, CAST(ts AS TIMESTAMP)
    )
    SELECT p.event_id, p.user_id, p.ts, c.click_id, c.click_ts
    FROM p ASOF LEFT JOIN c
      ON p.user_id = c.user_id AND p.ts >= c.click_ts
    """,
)
def chsql_asof(spark: SparkSession, sf: str) -> DataFrame:
    """ASOF LEFT JOIN written in ClickHouse SQL, routed through the frontend
    to operators.joins.asof_join (reference strictness:
    ASTTablesInSelectQuery.h:123-132, RowRefs.h ASOF lookup)."""
    register_views(spark, sf)
    ch_sql(
        spark,
        """
        SELECT event_id, user_id, ts AS purchase_ts
        FROM events WHERE event_type = 'purchase'
        """,
    ).createOrReplaceTempView("purchases_v")
    ch_sql(
        spark,
        """
        SELECT user_id, ts AS click_ts, max(event_id) AS click_id
        FROM events WHERE event_type = 'click' GROUP BY user_id, ts
        """,
    ).createOrReplaceTempView("clicks_v")
    return ch_sql(
        spark,
        """
        SELECT p.event_id, p.user_id, p.purchase_ts AS ts,
               c.click_id, c.click_ts
        FROM purchases_v p ASOF LEFT JOIN clicks_v c
          ON p.user_id = c.user_id AND p.purchase_ts >= c.click_ts
        """,
    )


@register(
    "chsql_any_join",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
    FROM customer c
    LEFT JOIN (
      SELECT * FROM (
        SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderkey, o_orderdate, o_totalprice) AS rn
        FROM orders
      ) WHERE rn = 1
    ) o ON c.c_custkey = o.o_custkey
    WHERE c.c_mktsegment = 'MACHINERY'
    """,
)
def chsql_any_join(spark: SparkSession, sf: str) -> DataFrame:
    """ANY LEFT JOIN in ClickHouse SQL via the frontend -> any_join
    (first-match strictness made deterministic by the operator's prefer
    ordering over all right columns)."""
    register_views(spark, sf)
    ch_sql(
        spark,
        "SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice FROM orders",
    ).createOrReplaceTempView("orders_slim_v")
    return ch_sql(
        spark,
        """
        SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
        FROM customer c ANY LEFT JOIN orders_slim_v o ON c.c_custkey = o.o_custkey
        WHERE c.c_mktsegment = 'MACHINERY'
        """,
    )


@register(
    "chsql_fill_interpolate",
    oracle="""
    WITH base AS (
      SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
             round(sum(value), 4) AS total
      FROM events WHERE event_type IN ('purchase', 'signup')
      GROUP BY event_type, day
    ),
    bounds AS (
      SELECT event_type, min(day) AS lo, max(day) AS hi FROM base
      GROUP BY event_type
    ),
    spine AS (
      SELECT event_type,
             CAST(unnest(generate_series(CAST(lo AS TIMESTAMP),
                                         CAST(hi AS TIMESTAMP),
                                         INTERVAL 1 DAY)) AS DATE) AS day
      FROM bounds
    ),
    joined AS (
      SELECT s.event_type, s.day, base.total
      FROM spine s LEFT JOIN base USING (event_type, day)
    )
    SELECT event_type, day,
           last_value(total IGNORE NULLS) OVER (
             PARTITION BY event_type ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS total
    FROM joined
    """,
)
def chsql_fill_interpolate(spark: SparkSession, sf: str) -> DataFrame:
    """Grouped WITH FILL + INTERPOLATE carry-forward through the CH SQL
    frontend (reference FillingStep.h / FillingTransform.cpp INTERPOLATE):
    per-type daily spine, missing days carry the previous total."""
    return _run(
        spark,
        sf,
        """
        SELECT event_type, toDate(ts) AS day, round(sum(value), 4) AS total
        FROM events WHERE event_type IN ('purchase', 'signup')
        GROUP BY event_type, day
        ORDER BY event_type, day WITH FILL STEP INTERVAL 1 DAY INTERPOLATE (total)
        """,
    )


@register(
    "chsql_any_multi_join",
    oracle="""
    SELECT c.c_custkey, o.o_orderkey, n.n_name
    FROM customer c
    LEFT JOIN (
      SELECT * FROM (
        SELECT o_custkey, o_orderkey,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderkey) AS rn
        FROM orders
      ) WHERE rn = 1
    ) o ON c.c_custkey = o.o_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE c.c_custkey < 200
    """,
)
def chsql_any_multi_join(spark: SparkSession, sf: str) -> DataFrame:
    """Multi-join frontend routing: one ANY strict join materializes via
    the operator API, the trailing ordinary JOIN stays SQL against the
    materialized view (frontend/joins_sql.py extra_joins path)."""
    register_views(spark, sf)
    ch_sql(
        spark, "SELECT o_custkey, o_orderkey FROM orders"
    ).createOrReplaceTempView("orders_mj_v")
    return ch_sql(
        spark,
        """
        SELECT c.c_custkey, o.o_orderkey, n.n_name
        FROM customer c ANY LEFT JOIN orders_mj_v o ON c.c_custkey = o.o_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE c.c_custkey < 200
        """,
    )


# -------------------------------------------- windowFunnel SQL surface
@register(
    "chsql_window_funnel",
    oracle="""
    WITH e AS (SELECT user_id,
                      CAST(epoch(CAST(ts AS TIMESTAMP)) AS BIGINT) AS t,
                      event_type FROM events),
    l1 AS (SELECT DISTINCT user_id FROM e WHERE event_type = 'signup'),
    l2 AS (SELECT DISTINCT a.user_id
           FROM e a JOIN e b ON a.user_id = b.user_id
           WHERE a.event_type = 'signup' AND b.event_type = 'click'
             AND b.t > a.t AND b.t <= a.t + 604800),
    l3 AS (SELECT DISTINCT a.user_id
           FROM e a JOIN e b ON a.user_id = b.user_id
                    JOIN e c ON a.user_id = c.user_id
           WHERE a.event_type = 'signup' AND b.event_type = 'click'
             AND c.event_type = 'purchase'
             AND b.t > a.t AND c.t > b.t AND c.t <= a.t + 604800)
    SELECT u.user_id,
           CAST(CASE WHEN l3.user_id IS NOT NULL THEN 3
                WHEN l2.user_id IS NOT NULL THEN 2
                WHEN l1.user_id IS NOT NULL THEN 1
                ELSE 0 END AS INT) AS lvl
    FROM (SELECT DISTINCT user_id FROM e) u
    LEFT JOIN l1 ON u.user_id = l1.user_id
    LEFT JOIN l2 ON u.user_id = l2.user_id
    LEFT JOIN l3 ON u.user_id = l3.user_id
    """,
)
def chsql_window_funnel(spark: SparkSession, sf: str) -> DataFrame:
    """windowFunnel(w)(ts, conds...) straight from CH SQL — rewritten to a
    sorted-fold aggregate expression (frontend PARAMETRIC
    _window_funnel_sql) with ClickHouse's DEFAULT sliding-anchor
    semantics; oracle is the chain-EXISTENCE formulation (equivalent for
    default flags, see udafs/behavioral.funnel_level_sliding_core).
    Second granularity like ClickHouse DateTime; the events table has no
    same-user same-second ties at oracle scale, so strict > in the oracle
    equals scan-order-after in the fold."""
    return _run(
        spark,
        sf,
        "SELECT user_id, windowFunnel(604800)(ts, event_type = 'signup', "
        "event_type = 'click', event_type = 'purchase') AS lvl "
        "FROM events GROUP BY user_id",
    )


@register(
    "chsql_multi_array_join",
    oracle="""
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents
               WHERE doc_id < 40),
    z AS (SELECT doc_id, u.w AS word, u.i AS idx
          FROM d, LATERAL (SELECT unnest(ws) AS w,
                                  generate_subscripts(ws, 1) AS i) u)
    SELECT doc_id, CAST(idx AS BIGINT) AS idx, word
    FROM z WHERE length(word) >= 6
    """,
)
def chsql_multi_array_join(spark: SparkSession, sf: str) -> DataFrame:
    """Multi-array ARRAY JOIN zips positionally (ArrayJoinStep.h /
    ArrayJoinAction lock-step iteration): words paired with their 1-based
    positions via arrayEnumerate — rewritten to posexplode + aligned
    element_at lateral views."""
    return _run(
        spark,
        sf,
        """
        SELECT doc_id, idx, w AS word
        FROM documents
        ARRAY JOIN splitByChar(' ', text) AS w,
                   arrayEnumerate(splitByChar(' ', text)) AS idx
        WHERE doc_id < 40 AND lengthUTF8(w) >= 6
        """,
    )


@register(
    "chsql_compat_suite",
    oracle="""
    WITH b AS (SELECT (epoch_us(CAST(ts AS TIMESTAMP)) // 900000000)
                        * 900000000 AS bus,
                      user_id,
                      epoch_us(CAST(ts AS TIMESTAMP)) AS us
               FROM events)
    SELECT strftime(make_timestamp(bus), '%Y-%m-%d %H:%M') AS q15,
           count(DISTINCT user_id) AS uniq_users,
           count(*) AS n,
           count(*) // count(DISTINCT user_id) AS per_user,
           CAST(date_diff('hour', make_timestamp(min(us)),
                          make_timestamp(max(us))) AS BIGINT) AS span_hours
    FROM b GROUP BY q15
    """,
)
def chsql_compat_suite(spark: SparkSession, sf: str) -> DataFrame:
    """Round-5 drop-in-compat batch through the frontend: countDistinct,
    toStartOfFifteenMinutes, formatDateTime %-codes, dateDiff (CH
    boundary-crossing semantics, = DuckDB date_diff), intDivOrZero, and a
    trailing SETTINGS clause (stripped; CH runtime knobs map to Spark
    session confs)."""
    return _run(
        spark,
        sf,
        """
        SELECT formatDateTime(toStartOfFifteenMinutes(ts), '%Y-%m-%d %H:%M') AS q15,
               countDistinct(user_id) AS uniq_users,
               count() AS n,
               intDivOrZero(count(), countDistinct(user_id)) AS per_user,
               dateDiff('hour', min(ts), max(ts)) AS span_hours
        FROM events
        GROUP BY q15
        SETTINGS max_threads = 4
        """,
    )


@register(
    "chsql_round6_agg_suite",
    oracle="""
    WITH e AS (SELECT user_id,
                      CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS t,
                      event_type, value
               FROM events),
    iv AS (SELECT user_id, t AS s, t + 3600 AS e2 FROM e),
    o AS (SELECT *, max(e2) OVER (PARTITION BY user_id ORDER BY s
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING) AS pmax FROM iv),
    g AS (SELECT *, CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END
                      AS brk FROM o),
    isl AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY s)
                        AS gid FROM g),
    merged AS (SELECT user_id,
                      sum(mx - mn) AS ils
               FROM (SELECT user_id, gid, min(s) AS mn, max(e2) AS mx
                     FROM isl GROUP BY user_id, gid)
               GROUP BY user_id),
    agg AS (SELECT user_id,
                   count(DISTINCT CASE WHEN value > 50 THEN event_type END)
                     AS n_types_hi,
                   median(value) AS med,
                   CASE WHEN max(t) > min(t)
                        THEN (arg_max(value, t) - arg_min(value, t))
                               / (max(t) - min(t))
                        END AS br,
                   entropy(event_type) AS ent
            FROM e GROUP BY user_id)
    SELECT agg.user_id,
           CAST(n_types_hi AS BIGINT) AS n_types_hi,
           med,
           round(coalesce(br, 0.0), 9) AS br,
           round(ent, 9) AS ent,
           CAST(merged.ils AS DOUBLE) AS ils
    FROM agg JOIN merged ON agg.user_id = merged.user_id
    """,
)
def chsql_round6_agg_suite(spark: SparkSession, sf: str) -> DataFrame:
    """Round-6 frontend aggregate batch straight from CH SQL: generic
    countDistinctIf peel, medianExact, boundingRatio, entropy,
    intervalLengthSum (merged-interval union length)."""
    return _run(
        spark,
        sf,
        """
        SELECT user_id,
               countDistinctIf(event_type, value > 50) AS n_types_hi,
               medianExact(value) AS med,
               round(ifNull(boundingRatio(toUnixTimestamp(ts), value), 0.0), 9)
                 AS br,
               round(entropy(event_type), 9) AS ent,
               intervalLengthSum(toUnixTimestamp(ts),
                                 toUnixTimestamp(ts) + 3600) AS ils
        FROM events GROUP BY user_id
        """,
    )


@register(
    "chsql_distinct_on_ties",
    oracle="""
    WITH f AS (
      SELECT user_id, event_id, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY CAST(ts AS TIMESTAMP), event_id)
               AS rn
      FROM events
    ),
    firsts AS (SELECT user_id, event_id, value FROM f WHERE rn = 1),
    ranked AS (SELECT *, rank() OVER (ORDER BY value DESC) AS rk
               FROM firsts)
    SELECT user_id, event_id, value FROM ranked WHERE rk <= 25
    """,
)
def chsql_distinct_on_ties(spark: SparkSession, sf: str) -> DataFrame:
    """DISTINCT ON + LIMIT WITH TIES through the frontend: first event per
    user (by ts, event_id), then top-25 by value keeping ties."""
    return _run(
        spark,
        sf,
        """
        SELECT * FROM (
          SELECT DISTINCT ON (user_id) user_id, event_id, value
          FROM events ORDER BY user_id, ts, event_id
        ) ORDER BY value DESC LIMIT 25 WITH TIES
        """,
    )


@register(
    "chsql_sequence_match_count",
    oracle="""
    WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
                      event_type FROM events),
    f AS (SELECT user_id, event_type AS t,
                 lag(event_type) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS pt
          FROM e WHERE event_type IN ('signup', 'purchase')),
    m AS (SELECT user_id,
                 count(*) FILTER (WHERE t = 'purchase' AND pt = 'signup') AS n
          FROM f GROUP BY user_id),
    x AS (SELECT DISTINCT a.user_id
          FROM e a JOIN e b ON a.user_id = b.user_id
          WHERE a.event_type = 'signup' AND b.event_type = 'purchase'
            AND b.ts > a.ts)
    SELECT u.user_id,
           x.user_id IS NOT NULL AS matched,
           CAST(coalesce(m.n, 0) AS BIGINT) AS n_matches
    FROM (SELECT DISTINCT user_id FROM e) u
    LEFT JOIN m ON u.user_id = m.user_id
    LEFT JOIN x ON u.user_id = x.user_id
    """,
)
def chsql_sequence_match_count(spark: SparkSession, sf: str) -> DataFrame:
    """sequenceMatch / sequenceCount straight from CH SQL (parametric
    pattern rewritten to a sorted-fold subsequence walk; sequenceCount's
    non-overlapping greedy count equals the filtered-lag closed form the
    oracle uses)."""
    return _run(
        spark,
        sf,
        """
        SELECT user_id,
               sequenceMatch('(?1).*(?2)')(ts, event_type = 'signup',
                                           event_type = 'purchase') AS matched,
               sequenceCount('(?1)(?2)')(ts, event_type = 'signup',
                                         event_type = 'purchase') AS n_matches
        FROM events GROUP BY user_id
        """,
    )


@register(
    "chsql_batch5_suite",
    oracle="""
    SELECT o_orderkey AS okey,
           CAST(date_diff('day', DATE '1970-01-01',
                          CAST(o_orderdate AS DATE)) + 719528 AS BIGINT) AS tdays,
           printf('%02d:%02d:%02d', (o_orderkey % 90000) // 3600,
                  ((o_orderkey % 90000) // 60) % 60,
                  (o_orderkey % 90000) % 60)                            AS s2t,
           CAST(CASE WHEN o_orderpriority < '3-MEDIUM' THEN -1
                     WHEN o_orderpriority > '3-MEDIUM' THEN 1
                     ELSE 0 END AS INT)                                 AS scmp,
           CAST(CASE WHEN o_orderkey % 4 > 2 THEN 1
                     WHEN o_orderkey % 4 < 2 THEN 0
                     WHEN o_orderkey % 10 > 5 THEN 1
                     WHEN o_orderkey % 10 < 5 THEN 0
                     WHEN o_orderkey % 3 > 1 THEN 1 ELSE 0 END AS INT)  AS vcmp,
           round(sqrt((o_totalprice / 1000.0) * (o_totalprice / 1000.0)
                      + 9.0), 4)                                        AS l2,
           CAST(epoch_ms(o_orderdate) AS BIGINT)                        AS unix_ms,
           printf('%.2f', o_totalprice)                                 AS decs,
           CAST(CASE WHEN regexp_matches(o_orderpriority,
                '(^|[^A-Za-z0-9])HIGH($|[^A-Za-z0-9])') THEN 1 ELSE 0 END
                AS INT)                                                 AS tok
    FROM orders WHERE o_orderkey % 11 = 0
    """,
)
def chsql_batch5_suite(spark: SparkSession, sf: str) -> DataFrame:
    """Round-6 frontend batch 5 through ch_sql: MySQL date helpers
    (TO_DAYS/SEC_TO_TIME), STRCMP, numeric versionCompare, vector L2Norm,
    toUnixTimestamp64Milli, toDecimalString, hasToken (ASCII-non-alnum
    boundaries, matching HasTokenImpl.h)."""
    return _run(
        spark,
        sf,
        """
        SELECT o_orderkey AS okey,
               TO_DAYS(toDate(o_orderdate)) AS tdays,
               SEC_TO_TIME(o_orderkey % 90000) AS s2t,
               STRCMP(o_orderpriority, '3-MEDIUM') AS scmp,
               versionCompare(concat(toString(o_orderkey % 4), '.',
                                     toString(o_orderkey % 10), '.',
                                     toString(o_orderkey % 3)),
                              '2.5.1', '>') AS vcmp,
               round(L2Norm([o_totalprice / 1000.0, 3.0]), 4) AS l2,
               toUnixTimestamp64Milli(toDateTime(o_orderdate)) AS unix_ms,
               toDecimalString(o_totalprice, 2) AS decs,
               hasToken(o_orderpriority, 'HIGH') AS tok
        FROM orders WHERE o_orderkey % 11 = 0
        """,
    )


@register(
    "chsql_final_replacing",
    oracle="""
    WITH versions AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice, 1 AS v
      FROM orders WHERE o_orderkey % 9 = 0
      UNION ALL
      SELECT o_orderkey, 'U' AS o_orderstatus, o_totalprice * 2, 2 AS v
      FROM orders WHERE o_orderkey % 18 = 0
    ),
    latest AS (
      SELECT * FROM versions
      QUALIFY row_number() OVER (PARTITION BY o_orderkey ORDER BY v DESC) = 1
    )
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(o_totalprice), 2) AS total
    FROM latest GROUP BY o_orderstatus
    """,
)
def chsql_final_replacing(spark: SparkSession, sf: str) -> DataFrame:
    """SELECT ... FINAL over a registered replacing table: version-2
    updates (doubled totalprice, status 'U') must WIN over the base rows
    — real ReplacingMergeTree dedup-on-read, not a FINAL strip."""
    from pyspark.sql import functions as F

    from byconity_spark.engine.catalog import load_table
    from byconity_spark.frontend.sql import register_replacing_table

    register_views(spark, sf)
    base = load_table(spark, sf, "orders").filter(
        F.col("o_orderkey") % 9 == 0
    ).select("o_orderkey", "o_orderstatus", "o_totalprice", F.lit(1).alias("v"))
    updates = load_table(spark, sf, "orders").filter(
        F.col("o_orderkey") % 18 == 0
    ).select(
        "o_orderkey", F.lit("U").alias("o_orderstatus"),
        (F.col("o_totalprice") * 2).alias("o_totalprice"), F.lit(2).alias("v"),
    )
    base.unionByName(updates).createOrReplaceTempView("orders_versions")
    register_replacing_table("orders_versions", ["o_orderkey"], "v")
    return ch_sql(
        spark,
        """
        SELECT o_orderstatus,
               count(*) AS n,
               round(sum(o_totalprice), 2) AS total
        FROM orders_versions FINAL
        GROUP BY o_orderstatus
        """,
    )


@register(
    "chsql_system_tables",
    oracle="""
    WITH t(name, n_columns) AS (VALUES
      ('customer', 5), ('documents', 5), ('embeddings', 3), ('events', 6),
      ('lineitem', 11), ('nation', 3), ('orders', 6), ('part', 6),
      ('region', 2), ('supplier', 4))
    SELECT name, CAST(n_columns AS INT) AS n_columns,
           CAST((SELECT sum(n_columns) FROM t) AS BIGINT) AS total_cols
    FROM t
    """,
)
def chsql_system_tables(spark: SparkSession, sf: str) -> DataFrame:
    """system.tables / system.columns introspection through the CH-dialect
    frontend (StorageSystemTables.cpp analogue)."""
    from byconity_spark.engine.catalog import register_system_tables

    register_views(spark, sf)
    register_system_tables(spark)
    return ch_sql(
        spark,
        """
        SELECT t.name AS name, t.n_columns AS n_columns,
               (SELECT count(*) FROM system.columns) AS total_cols
        FROM system.tables t
        ORDER BY name
        """,
    )


@register(
    "chsql_ddl_roundtrip",
    oracle="""
    WITH base AS (
      SELECT o_orderstatus, o_totalprice FROM orders WHERE o_orderkey % 13 = 0
    ),
    extra AS (
      SELECT 'X' AS o_orderstatus, 42.5 AS o_totalprice
    ),
    allrows AS (SELECT * FROM base UNION ALL SELECT * FROM extra)
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(o_totalprice), 2) AS total
    FROM allrows GROUP BY o_orderstatus
    """,
)
def chsql_ddl_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """CREATE TABLE AS + INSERT INTO (SELECT and VALUES forms) through the
    frontend, then aggregate the session table."""
    register_views(spark, sf)
    ch_sql(spark, "DROP TABLE IF EXISTS ddl_orders_rt")
    ch_sql(
        spark,
        "CREATE TABLE ddl_orders_rt ENGINE = MergeTree AS "
        "SELECT o_orderstatus, o_totalprice FROM orders WHERE o_orderkey % 13 = 0",
    )
    ch_sql(spark, "INSERT INTO ddl_orders_rt VALUES ('X', 42.5)")
    return ch_sql(
        spark,
        """
        SELECT o_orderstatus, count(*) AS n,
               round(sum(o_totalprice), 2) AS total
        FROM ddl_orders_rt GROUP BY o_orderstatus
        """,
    )


def _chsql_geo_oracle() -> str:
    from byconity_spark.workloads.functions_suite import _s2_oracle_sql

    # the s2 walk is the heavy part — reuse the round-7 recursive-CTE
    # oracle and join the h3 formula columns onto it
    s2 = _s2_oracle_sql()
    return f"""
    WITH s2q AS ({s2})
    SELECT seed,
           printf('%x', {1 << 59} + ((seed % 5) + 1) * {1 << 52}
                        + ((seed * 7) % 122) * {1 << 45}
                        + {(1 << 45) - 1})            AS h3hex,
           printf('%x', {1 << 59} + (seed % 5) * {1 << 52}
                        + ((seed * 7) % 122) * {1 << 45}
                        + {(1 << 45) - 1})            AS parenthex,
           CAST((seed % 5) + 1 AS BIGINT)             AS res,
           CAST(2 + 120 * power(7, (seed % 5) + 1) AS BIGINT) AS numhex,
           s2_id
    FROM s2q ORDER BY seed
    """


@register("chsql_geo_suite", oracle=_chsql_geo_oracle())
def chsql_geo_suite(spark: SparkSession, sf: str) -> DataFrame:
    """Round-7 geo families through the SQL FRONTEND: the H3 names rewrite
    to pure Spark SQL (RULES batch at the bottom of frontend/sql.py) and
    geoToS2 resolves via the session-registered Arrow kernel
    (ensure_sql_kernels).  Both sides build the same all-sevens-digit
    index arithmetically from n_nationkey; the Spark side additionally
    round-trips it through stringToH3(h3ToString(...)) and derives the
    parent via h3ToParent — proving the frontend rewrites end-to-end."""
    h = ("({mode} + ((n_nationkey % 5) + 1) * {res_unit}"
         " + ((n_nationkey * 7) % 122) * {bc_unit} + {digits7})").format(
        mode=1 << 59, res_unit=1 << 52, bc_unit=1 << 45,
        digits7=(1 << 45) - 1,
    )
    return _run(
        spark,
        sf,
        f"""
        SELECT n_nationkey AS seed,
               h3ToString(stringToH3(h3ToString({h})))        AS h3hex,
               h3ToString(h3ToParent({h}, n_nationkey % 5))   AS parenthex,
               CAST(h3GetResolution({h}) AS BIGINT)           AS res,
               h3NumHexagons((n_nationkey % 5) + 1)           AS numhex,
               geoToS2((((n_nationkey * 137) % 360) - 180) + 0.5,
                       (((n_nationkey * 83) % 160) - 80) + 0.25) AS s2_id
        FROM nation ORDER BY seed
        """,
    )


def _chsql_lbs_oracle() -> str:
    hav = (
        "2*6371007.180918475*asin(sqrt(pow(sin(radians((48.85 - {LAT}))/2),2)"
        " + cos(radians({LAT}))*cos(radians(48.85))"
        "*pow(sin(radians((2.35 - {LON}))/2),2)))"
    )
    d1 = hav.format(LON="lon", LAT="lat")
    d2 = hav.format(LON="(lon + 1.5)", LAT="(lat - 1.0)")
    return f"""
    WITH pts AS (
      SELECT c_custkey,
             (((c_custkey * 7) % 360) - 180 + 0.25)::DOUBLE AS lon,
             ((c_custkey % 180) - 90 + 0.5)::DOUBLE         AS lat
      FROM customer
    )
    SELECT c_custkey,
      CASE WHEN {d1} <= 3000000.0
             OR (lon + 1.5 >= -180 AND lon + 1.5 <= 180
                 AND lat - 1.0 >= -90 AND lat - 1.0 <= 90
                 AND {d2} <= 3000000.0)
           THEN 1 ELSE 0 END AS in_bc
    FROM pts ORDER BY c_custkey
    """


@register("chsql_lbs_circle", oracle=_chsql_lbs_oracle())
def chsql_lbs_circle(spark: SparkSession, sf: str) -> DataFrame:
    """inBusinessCircle through the SQL FRONTEND (the RULES batch at the
    bottom of frontend/sql.py emits the same haversine OR-chain SQL the
    Column API builds — greatCircleDistance.cpp:346-489).  The point array
    carries a NULL and an out-of-range entry so the frontend's skip
    rewrite is value-checked; the oracle only credits the valid points."""
    return _run(
        spark,
        sf,
        """
        SELECT c_custkey,
               inBusinessCircle(3000000.0, 2.35, 48.85,
                 [(((c_custkey * 7) % 360) - 180 + 0.25) + 0.0,
                  (((c_custkey * 7) % 360) - 180 + 0.25) + 1.5,
                  NULL, 200.0],
                 [((c_custkey % 180) - 90 + 0.5) + 0.0,
                  ((c_custkey % 180) - 90 + 0.5) - 1.0,
                  ((c_custkey % 180) - 90 + 0.5) + 0.0, 95.0]) AS in_bc
        FROM customer ORDER BY c_custkey
        """,
    )


@register(
    "chsql_mutation_ddl",
    oracle="""
    WITH base AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice
      FROM orders WHERE o_orderkey % 11 = 0
    ),
    after_delete AS (
      SELECT * FROM base WHERE NOT (o_orderstatus = 'F')
    ),
    after_update AS (
      SELECT o_orderkey, o_orderstatus,
             CASE WHEN o_totalprice > 100000.0
                  THEN o_totalprice * 0.9 ELSE o_totalprice END AS o_totalprice
      FROM after_delete
    )
    SELECT o_orderstatus, count(*) AS n,
           round(sum(o_totalprice), 2) AS total
    FROM after_update GROUP BY o_orderstatus
    """,
)
def chsql_mutation_ddl(spark: SparkSession, sf: str) -> DataFrame:
    """Mutation DDL lifecycle through the frontend (reference
    ASTAlterQuery.h / MutationCommands.h): CREATE AS -> ALTER DELETE ->
    ALTER UPDATE -> RENAME, then aggregate the renamed table.  The oracle
    replays the same mutations as plain SQL stages."""
    register_views(spark, sf)
    ch_sql(spark, "DROP TABLE IF EXISTS mut_orders")
    ch_sql(spark, "DROP TABLE IF EXISTS mut_orders_final")
    ch_sql(
        spark,
        "CREATE TABLE mut_orders ENGINE = MergeTree AS "
        "SELECT o_orderkey, o_orderstatus, o_totalprice "
        "FROM orders WHERE o_orderkey % 11 = 0",
    )
    ch_sql(spark, "ALTER TABLE mut_orders DELETE WHERE o_orderstatus = 'F'")
    ch_sql(
        spark,
        "ALTER TABLE mut_orders UPDATE o_totalprice = o_totalprice * 0.9 "
        "WHERE o_totalprice > 100000.0",
    )
    ch_sql(spark, "RENAME TABLE mut_orders TO mut_orders_final")
    return ch_sql(
        spark,
        """
        SELECT o_orderstatus, count(*) AS n,
               round(sum(o_totalprice), 2) AS total
        FROM mut_orders_final GROUP BY o_orderstatus
        """,
    )


@register(
    "chsql_system_parts",
    oracle="""
    SELECT 'customer' AS tbl, (SELECT count(*) FROM customer) AS n_rows
    UNION ALL
    SELECT 'lineitem', (SELECT count(*) FROM lineitem)
    UNION ALL
    SELECT 'orders', (SELECT count(*) FROM orders)
    UNION ALL
    SELECT 'documents', (SELECT count(*) FROM documents)
    UNION ALL
    SELECT 'embeddings', (SELECT count(*) FROM embeddings)
    """,
)
def chsql_system_parts(spark: SparkSession, sf: str) -> DataFrame:
    """system.parts introspection (StorageSystemParts.cpp analogue —
    parquet files as parts, rows from footer metadata with NO data scan):
    summing the per-part footer row counts must equal the true table
    counts the oracle computes by scanning."""
    register_views(spark, sf)
    return ch_sql(
        spark,
        """
        SELECT table AS tbl, sum(rows) AS n_rows
        FROM system.parts
        WHERE table IN ('customer', 'lineitem', 'orders',
                        'documents', 'embeddings')
        GROUP BY table
        """,
    )


@register(
    "chsql_limits_suite",
    oracle="""
    SELECT 'break_rows' AS probe, CAST(50 AS BIGINT) AS value
    UNION ALL
    SELECT 'break_sum', (SELECT CAST(sum(l_orderkey) AS BIGINT) FROM
        (SELECT l_orderkey FROM lineitem
         ORDER BY l_orderkey, l_linenumber LIMIT 50) t)
    UNION ALL SELECT 'result_throw_raised', 1
    UNION ALL SELECT 'read_throw_raised', 1
    UNION ALL SELECT 'read_ok_count',
        (SELECT CAST(count(*) AS BIGINT) FROM nation)
    UNION ALL SELECT 'readonly_blocked_ddl', 1
    UNION ALL SELECT 'readonly_blocks_set', 1
    UNION ALL SELECT 'readonly2_set_ok', 1
    UNION ALL SELECT 'readonly2_blocked_ddl', 1
    UNION ALL SELECT 'timeout_ok_count',
        (SELECT CAST(count(*) AS BIGINT) FROM region)
    """,
)
def chsql_limits_suite(spark: SparkSession, sf: str) -> DataFrame:
    """Query-limit settings end-to-end (reference Settings.h:574-660 +
    SettingQuotaAndLimitsStep.h): max_result_rows with break/throw
    overflow modes, the pre-execution footer estimate behind
    max_rows_to_read, the three-state readonly contract, and a generous
    max_execution_time pass.  Every probe runs through the SQL frontend;
    expected-raise probes record 1 only when the documented error fires."""
    from byconity_spark.engine.limits import (
        LimitExceeded, ReadonlyError, session_limits,
    )

    register_views(spark, sf)
    session_limits.reset()
    rows: list[tuple[str, int]] = []
    try:
        brk = ch_sql(
            spark,
            """
            SELECT l_orderkey, l_linenumber FROM lineitem
            ORDER BY l_orderkey, l_linenumber
            SETTINGS max_result_rows = 50, result_overflow_mode = 'break'
            """,
        ).collect()
        rows.append(("break_rows", len(brk)))
        rows.append(("break_sum", int(sum(r[0] for r in brk))))

        try:
            ch_sql(
                spark,
                "SELECT l_orderkey FROM lineitem SETTINGS max_result_rows = 10",
            )
            rows.append(("result_throw_raised", 0))
        except LimitExceeded:
            rows.append(("result_throw_raised", 1))

        try:
            ch_sql(
                spark,
                "SELECT count(*) FROM lineitem SETTINGS max_rows_to_read = 10",
            )
            rows.append(("read_throw_raised", 0))
        except LimitExceeded:
            rows.append(("read_throw_raised", 1))

        ok = ch_sql(
            spark,
            "SELECT count(*) AS n FROM nation "
            "SETTINGS max_rows_to_read = 1000000000",
        ).collect()
        rows.append(("read_ok_count", int(ok[0][0])))

        ch_sql(spark, "SET readonly = 1")
        try:
            ch_sql(spark, "CREATE TABLE ro_probe (x Int64)")
            rows.append(("readonly_blocked_ddl", 0))
        except ReadonlyError:
            rows.append(("readonly_blocked_ddl", 1))
        try:
            ch_sql(spark, "SET max_result_rows = 5")
            rows.append(("readonly_blocks_set", 0))
        except ReadonlyError:
            rows.append(("readonly_blocks_set", 1))

        session_limits.reset()
        ch_sql(spark, "SET readonly = 2")
        try:
            ch_sql(spark, "SET max_result_rows = 5")
            rows.append(("readonly2_set_ok", 1))
        except ReadonlyError:
            rows.append(("readonly2_set_ok", 0))
        try:
            ch_sql(spark, "CREATE TABLE ro_probe2 (x Int64)")
            rows.append(("readonly2_blocked_ddl", 0))
        except ReadonlyError:
            rows.append(("readonly2_blocked_ddl", 1))
        session_limits.reset()

        tok = ch_sql(
            spark,
            "SELECT count(*) AS n FROM region SETTINGS max_execution_time = 300",
        ).collect()
        rows.append(("timeout_ok_count", int(tok[0][0])))
    finally:
        session_limits.reset()
    return _local_df(spark, rows, "probe string, value bigint")


@register(
    "chsql_quota_process_suite",
    oracle="""
    SELECT 'nation_rows' AS probe,
           (SELECT CAST(count(*) AS BIGINT) FROM nation) AS value
    UNION ALL SELECT 'usage_used', CAST(2 AS BIGINT)
    UNION ALL SELECT 'usage_max', 4
    UNION ALL SELECT 'processes_self', 1
    UNION ALL SELECT 'quota_exceeded', 1
    UNION ALL SELECT 'kill_not_found', 1
    """,
)
def chsql_quota_process_suite(spark: SparkSession, sf: str) -> DataFrame:
    """Quotas + process list end-to-end (reference Access/Quota.h,
    InterpreterCreateQuotaQuery.cpp, ProcessList.h): CREATE QUOTA with a
    windowed query budget, per-statement consumption visible through
    system.quota_usage, self-visibility in system.processes, the
    QUOTA_EXPIRED raise, and KILL QUERY's CancellationCode for an unknown
    query id.  The quota is dropped via the engine API in ``finally`` so
    an exhausted budget can never leak into later statements."""
    from byconity_spark.engine.limits import QuotaExceeded, quotas

    register_views(spark, sf)
    rows: list[tuple[str, int]] = []
    quotas.drop("wl_q")
    try:
        ch_sql(spark, "CREATE QUOTA wl_q FOR INTERVAL 1 HOUR MAX queries = 4")
        n = ch_sql(spark, "SELECT count(*) AS n FROM nation").collect()  # 1
        rows.append(("nation_rows", int(n[0][0])))
        usage = ch_sql(  # statement 2 — charged before the view renders
            spark,
            "SELECT used, max_value FROM system.quota_usage "
            "WHERE quota_name = 'wl_q' AND metric = 'queries'",
        ).collect()
        rows.append(("usage_used", int(usage[0][0])))
        rows.append(("usage_max", int(usage[0][1])))
        p = ch_sql(  # statement 3 — sees itself registered
            spark, "SELECT count(*) AS c FROM system.processes"
        ).collect()
        rows.append(("processes_self", int(p[0][0])))
        ch_sql(spark, "SELECT 1 AS one FROM system.one")  # statement 4
        try:
            ch_sql(spark, "SELECT 1 AS one FROM system.one")  # 5 — over
            rows.append(("quota_exceeded", 0))
        except QuotaExceeded:
            rows.append(("quota_exceeded", 1))
    finally:
        quotas.drop("wl_q")
    k = ch_sql(spark, "KILL QUERY WHERE query_id = 'no_such_query'").collect()
    rows.append(("kill_not_found", 1 if k[0][1] == "NotFound" else 0))
    return _local_df(spark, rows, "probe string, value bigint")


@register(
    "chsql_stats_ddl",
    oracle="""
    SELECT 'orders_row_count' AS item,
           CAST((SELECT count(*) FROM orders) AS VARCHAR) AS value
    UNION ALL SELECT 'custkey_nulls',
        CAST((SELECT count(*) FILTER (WHERE o_custkey IS NULL) FROM orders)
             AS VARCHAR)
    UNION ALL SELECT 'custkey_min',
        CAST((SELECT min(o_custkey) FROM orders) AS VARCHAR)
    UNION ALL SELECT 'custkey_max',
        CAST((SELECT max(o_custkey) FROM orders) AS VARCHAR)
    UNION ALL SELECT 'orderkey_min',
        CAST((SELECT min(o_orderkey) FROM orders) AS VARCHAR)
    UNION ALL SELECT 'session_tbl_rows',
        CAST((SELECT count(*) FROM nation WHERE n_regionkey = 1) AS VARCHAR)
    UNION ALL SELECT 'after_drop_rows', '0'
    """,
)
def chsql_stats_ddl(spark: SparkSession, sf: str) -> DataFrame:
    """ByConity stats DDL end-to-end (reference ASTStatsQuery.h /
    ParserStatsQuery.cpp / StatisticsCollector.h): CREATE STATS runs the
    real distributed collection pass (row count, per-column NDV sketch,
    min/max, nulls, NdvBuckets histograms) and feeds Catalyst CBO for
    path-backed tables; SHOW STATS / SHOW COLUMN_STATS expose it; DROP
    STATS forgets it.  Exact fields (row count, nulls, min/max) are
    oracle-checked; the NDV sketch is approximate by design (reference
    uses KLL/HLL sketches) and is covered by unit tests instead."""
    from byconity_spark.engine.stats import _STATS_REGISTRY

    register_views(spark, sf)
    rows: list[tuple[str, str]] = []
    try:
        created = ch_sql(
            spark, "CREATE STATS orders (o_orderkey, o_custkey)"
        ).collect()
        # reference CREATE STATS output: (table_name, column_count,
        # row_count_or_error); SHOW STATS: the 9-column formatted block
        rows.append(("orders_row_count", created[0][2]))
        cstats = {
            r[0]: r for r in
            ch_sql(spark, "SHOW STATS orders").collect()
        }
        rows.append(("custkey_nulls", cstats["orders.o_custkey"][3]))
        rows.append(("custkey_min", cstats["orders.o_custkey"][5]))
        rows.append(("custkey_max", cstats["orders.o_custkey"][6]))
        rows.append(("orderkey_min", cstats["orders.o_orderkey"][5]))

        ch_sql(spark, "DROP TABLE IF EXISTS stats_probe_t")
        ch_sql(
            spark,
            "CREATE TABLE stats_probe_t AS SELECT * FROM nation "
            "WHERE n_regionkey = 1",
        )
        ch_sql(spark, "CREATE STATS stats_probe_t")
        shown = ch_sql(spark, "SHOW STATS stats_probe_t").collect()
        # row 0 is the `t.*` line; its count column is the row count
        rows.append(("session_tbl_rows", shown[0][2]))

        ch_sql(spark, "DROP STATS stats_probe_t")
        after = ch_sql(spark, "SHOW STATS stats_probe_t").collect()
        rows.append(("after_drop_rows", str(len(after))))
    finally:
        from byconity_spark.engine.stats import drop_display_stats
        _STATS_REGISTRY.pop("orders", None)
        _STATS_REGISTRY.pop("stats_probe_t", None)
        drop_display_stats("orders")
        drop_display_stats("stats_probe_t")
        ch_sql(spark, "DROP TABLE IF EXISTS stats_probe_t")
    return _local_df(spark, rows, "item string, value string")


@register(
    "chsql_resource_group_suite",
    oracle="""
    SELECT 'sysview_mcq' AS probe, CAST(1 AS BIGINT) AS value
    UNION ALL SELECT 'routed_count',
        (SELECT CAST(count(*) AS BIGINT) FROM nation)
    UNION ALL SELECT 'blocked_not_enough', 1
    UNION ALL SELECT 'queued_then_ran', 1
    UNION ALL SELECT 'counters_drained', 1
    """,
)
def chsql_resource_group_suite(spark: SparkSession, sf: str) -> DataFrame:
    """Resource-group admission end-to-end (reference
    src/ResourceGroup/IResourceGroup.cpp::run, StorageSystemResourceGroups):
    CREATE RESOURCE GROUP + SET resource_group routing, a routed statement
    under capacity, RESOURCE_NOT_ENOUGH when a concurrent statement holds
    the only slot of a zero-queue group, queue-then-run when one queue slot
    exists, and drained running/queued counters afterwards."""
    import threading
    import time as _t

    from byconity_spark.engine.resource_groups import (
        ResourceNotEnough, resource_groups,
    )

    register_views(spark, sf)

    def _sleep(x):
        _t.sleep(0.25)
        return int(x)

    spark.udf.register("py_sleep_rgwl", _sleep, "bigint")
    rows: list[tuple[str, int]] = []
    resource_groups.clear()
    try:
        ch_sql(
            spark,
            "CREATE RESOURCE GROUP rg_wl MAX_CONCURRENT_QUERIES 1 "
            "MAX_QUEUED 1 MAX_QUEUED_WAITING_MS 60000",
        )
        mcq = ch_sql(
            spark,
            "SELECT max_concurrent_queries FROM system.resource_groups "
            "WHERE name = 'rg_wl'",
        ).collect()[0][0]
        rows.append(("sysview_mcq", int(mcq)))

        ch_sql(spark, "SET resource_group = 'rg_wl'")
        n = ch_sql(spark, "SELECT count(*) AS n FROM nation").collect()[0][0]
        rows.append(("routed_count", int(n)))
        ch_sql(spark, "SET resource_group = ''")

        # hold the single slot from a thread (eager via the result-limit
        # probe), then: a zero-queue group rejects, a one-queue group queues
        ch_sql(
            spark,
            "CREATE RESOURCE GROUP rg_wl0 MAX_CONCURRENT_QUERIES 1 "
            "MAX_QUEUED 0",
        )

        def hold(group: str, state: dict) -> None:
            resource_groups.set_current(group)
            try:
                ch_sql(
                    spark,
                    "SELECT number AS s FROM numbers(96) "
                    "WHERE py_sleep_rgwl(number) >= 0 "
                    "SETTINGS max_result_rows = 1000",
                )
            except BaseException as exc:  # noqa: BLE001 — surfaced below
                state["exc"] = exc

        st0: dict = {}
        t0 = threading.Thread(target=hold, args=("rg_wl0", st0), daemon=True)
        t0.start()
        deadline = _t.time() + 20
        while _t.time() < deadline and (
            resource_groups._groups["rg_wl0"].running < 1
        ):
            _t.sleep(0.05)
        resource_groups.set_current("rg_wl0")
        try:
            ch_sql(spark, "SELECT 1 AS one FROM system.one")
            rows.append(("blocked_not_enough", 0))
        except ResourceNotEnough:
            rows.append(("blocked_not_enough", 1))
        resource_groups.set_current(None)
        t0.join(timeout=60)

        st1: dict = {}
        t1 = threading.Thread(target=hold, args=("rg_wl", st1), daemon=True)
        t1.start()
        deadline = _t.time() + 20
        while _t.time() < deadline and (
            resource_groups._groups["rg_wl"].running < 1
        ):
            _t.sleep(0.05)
        resource_groups.set_current("rg_wl")
        # queues behind the holder, runs when it finishes (<60 s budget)
        got = ch_sql(spark, "SELECT count(*) AS n FROM region").collect()
        rows.append(("queued_then_ran", 1 if got[0][0] >= 0 else 0))
        resource_groups.set_current(None)
        t1.join(timeout=60)

        g = resource_groups._groups["rg_wl"]
        rows.append(
            ("counters_drained", 1 if g.running == 0 and g.queued == 0 else 0)
        )
    finally:
        resource_groups.set_current(None)
        resource_groups.clear()
    return _local_df(spark, rows, "probe string, value bigint")


@register(
    "chsql_backup_restore",
    oracle="""
    WITH src AS (SELECT count(*) AS n FROM nation WHERE n_regionkey IN (0, 3))
    SELECT 'backup_rows' AS probe, CAST(n AS BIGINT) AS value FROM src
    UNION ALL SELECT 'restored_rows', CAST(n AS BIGINT) FROM src
    UNION ALL SELECT 'appended_rows', CAST(2 * n AS BIGINT) FROM src
    UNION ALL SELECT 'incompat_raises', 1
    UNION ALL SELECT 'missing_raises', 1
    """,
)
def chsql_backup_restore(spark: SparkSession, sf: str) -> DataFrame:
    """BACKUP / RESTORE end-to-end (reference ASTBackupQuery.h:14-27,
    BackupsWorker.cpp): parquet-snapshot backup of a session table,
    restore-as-create after DROP, restore-into-existing APPEND (the
    documented duplication), schema-incompatibility and missing-entry
    errors.  The snapshot is one distributed parquet write — nothing
    touches the driver, so the statement scales with the cluster."""
    from byconity_spark.engine.backups import BackupError

    register_views(spark, sf)
    rows: list[tuple[str, int]] = []
    try:
        ch_sql(spark, "DROP TABLE IF EXISTS bkwl_src")
        ch_sql(
            spark,
            "CREATE TABLE bkwl_src AS SELECT n_nationkey, n_name, "
            "n_regionkey FROM nation WHERE n_regionkey IN (0, 3)",
        )
        b = ch_sql(
            spark, "BACKUP TABLE bkwl_src TO Disk('backups', 'wl_rt')"
        ).collect()
        rows.append(("backup_rows", int(b[0][1])))
        ch_sql(spark, "DROP TABLE bkwl_src")
        r = ch_sql(
            spark,
            "RESTORE TABLE bkwl_src FROM Disk('backups', 'wl_rt')",
        ).collect()
        rows.append(("restored_rows", int(r[0][1])))
        ch_sql(
            spark, "RESTORE TABLE bkwl_src FROM Disk('backups', 'wl_rt')"
        )
        n2 = ch_sql(
            spark, "SELECT count(*) AS n FROM bkwl_src"
        ).collect()[0][0]
        rows.append(("appended_rows", int(n2)))

        ch_sql(spark, "DROP TABLE IF EXISTS bkwl_other")
        ch_sql(
            spark,
            "CREATE TABLE bkwl_other AS SELECT r_regionkey FROM region",
        )
        try:
            ch_sql(
                spark,
                "RESTORE TABLE bkwl_src AS bkwl_other "
                "FROM Disk('backups', 'wl_rt')",
            )
            rows.append(("incompat_raises", 0))
        except BackupError:
            rows.append(("incompat_raises", 1))
        try:
            ch_sql(
                spark,
                "RESTORE TABLE ghost FROM Disk('backups', 'nowhere_wl')",
            )
            rows.append(("missing_raises", 0))
        except BackupError:
            rows.append(("missing_raises", 1))
    finally:
        ch_sql(spark, "DROP TABLE IF EXISTS bkwl_src")
        ch_sql(spark, "DROP TABLE IF EXISTS bkwl_other")
    return _local_df(spark, rows, "probe string, value bigint")


@register(
    "chsql_advisor_suite",
    oracle="""
    SELECT 'OrderByKeyAdvisor' AS advisor, 'orders' AS subject,
           'o_orderdate' AS value
    UNION ALL SELECT 'OrderByKeyBenefit', 'orders', '2'
    UNION ALL SELECT 'OrderByKeyAdvisor', 'customer', 'c_custkey'
    UNION ALL SELECT 'PartitionKeyAdvisor', 'orders', 'o_custkey'
    UNION ALL SELECT 'PartitionKeyAdvisor', 'customer', 'c_custkey'
    UNION ALL SELECT 'DataTypeAdvisor', 'orders.o_orderkey',
        (SELECT CASE WHEN max(o_orderkey) <= 255 THEN 'UInt8'
                     WHEN max(o_orderkey) <= 65535 THEN 'UInt16'
                     WHEN max(o_orderkey) <= 4294967295 THEN 'UInt32'
                     ELSE 'none' END FROM orders)
    UNION ALL SELECT 'DataTypeAdvisor', 'orders.o_custkey',
        (SELECT CASE WHEN max(o_custkey) <= 255 THEN 'UInt8'
                     WHEN max(o_custkey) <= 65535 THEN 'UInt16'
                     WHEN max(o_custkey) <= 4294967295 THEN 'UInt32'
                     ELSE 'none' END FROM orders)
    UNION ALL SELECT 'DataTypeAdvisor', 'orders.o_orderstatus',
        'LowCardinality(String)'
    UNION ALL SELECT 'MaterializedViewAdvisor', 'lineitem', '2'
    """,
)
def chsql_advisor_suite(spark: SparkSession, sf: str) -> DataFrame:
    """Workload advisor end-to-end (reference src/Advisor — ColumnUsage.h
    taxonomy, OrderByKeyAdvise.cpp frequency ranking, PartitionKeyAdvise
    equi-join keys, DataTypeAdvise integer narrowing + LowCardinality,
    MaterializedViewAdvise repeated-signature detection) over a fixed
    five-query workload.  The integer-narrowing advises are data-derived
    (max-value driven), so the oracle recomputes them per scale factor."""
    from byconity_spark.engine.advisor import analyze_workload
    from byconity_spark.engine.stats import _STATS_REGISTRY

    register_views(spark, sf)
    workload = [
        "SELECT o_orderstatus, count() AS n FROM orders "
        "WHERE o_orderdate >= '1995-01-01' GROUP BY o_orderstatus",
        "SELECT o_orderpriority, count() AS n FROM orders "
        "WHERE o_orderdate >= '1995-01-01' AND o_totalprice > 1000 "
        "GROUP BY o_orderpriority",
        "SELECT c.c_mktsegment, sum(o.o_totalprice) AS s FROM orders o "
        "JOIN customer c ON o.o_custkey = c.c_custkey "
        "GROUP BY c.c_mktsegment",
        "SELECT l_returnflag, sum(l_quantity) AS s FROM lineitem "
        "GROUP BY l_returnflag",
        "SELECT l_returnflag, sum(l_quantity) AS s FROM lineitem "
        "GROUP BY l_returnflag",
    ]
    rows: list[tuple[str, str, str]] = []
    try:
        ch_sql(
            spark,
            "CREATE STATS orders (o_orderkey, o_custkey, o_orderstatus)",
        )
        advises = analyze_workload(spark, workload)
        for a in advises:
            if a.advisor == "OrderByKeyAdvisor":
                rows.append((a.advisor, a.table, a.optimized_value))
                if a.table == "orders":
                    rows.append(
                        ("OrderByKeyBenefit", a.table, str(int(a.benefit)))
                    )
            elif a.advisor == "PartitionKeyAdvisor":
                rows.append((a.advisor, a.table, a.optimized_value))
            elif a.advisor == "DataTypeAdvisor":
                rows.append(
                    (a.advisor, f"{a.table}.{a.column}", a.optimized_value)
                )
            elif a.advisor == "MaterializedViewAdvisor":
                rows.append((a.advisor, a.table, str(int(a.benefit))))
    finally:
        _STATS_REGISTRY.pop("orders", None)
    return _local_df(spark, rows, "advisor string, subject string, value string")


@register(
    "chsql_dictionary_sql",
    oracle="""
    SELECT n_name AS nname, CAST(count(*) AS BIGINT) AS n
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def chsql_dictionary_sql(spark: SparkSession, sf: str) -> DataFrame:
    """SQL-side dictionary lookups (reference src/Dictionaries/ +
    FunctionsExternalDictionaries.h): CREATE DICTIONARY over the nation
    table, then dictGet/dictHas in a statement.  The rewrite emits
    aggregated correlated scalar subqueries; Catalyst de-correlates them
    into a left join whose small side broadcasts under AQE — the identical
    physical plan the Column API builds explicitly, so the pattern holds
    at any scale."""
    from byconity_spark.frontend.sql import _SESSION_DICTIONARIES

    register_views(spark, sf)
    try:
        ch_sql(
            spark,
            "CREATE DICTIONARY wl_nation_dict PRIMARY KEY n_nationkey "
            "SOURCE(CLICKHOUSE(TABLE 'nation')) LAYOUT(HASHED()) "
            "LIFETIME(300)",
        )
        return ch_sql(
            spark,
            """
            SELECT nname, count(*) AS n FROM (
              SELECT dictGet('wl_nation_dict', 'n_name', c_nationkey)
                     AS nname
              FROM customer
              WHERE dictHas('wl_nation_dict', c_nationkey)
            ) GROUP BY nname
            """,
        )
    finally:
        _SESSION_DICTIONARIES.pop("wl_nation_dict", None)


@register(
    "chsql_rbac_suite",
    oracle="""
    SELECT 'alice_permissive' AS stage,
           CAST(count(*) AS BIGINT) AS n
    FROM orders WHERE o_orderstatus = 'F'
    UNION ALL
    SELECT 'alice_mixed',
           CAST(count(*) AS BIGINT)
    FROM orders
    WHERE o_orderstatus = 'F' AND o_orderpriority LIKE '1%'
    UNION ALL
    SELECT 'customer_denied', CAST(1 AS BIGINT)
    """,
)
def chsql_rbac_suite(spark: SparkSession, sf: str) -> DataFrame:
    """RBAC + row policies end-to-end (reference src/Access/:
    ContextAccess.cpp grant checks + RowPolicyCache.cpp condition mixing).
    Row-policy enforcement is a view swap whose predicate Catalyst pushes
    into the parquet scan — at 100 TB the policy filter prunes row groups
    like any WHERE clause, so secured reads cost the same as filtered
    reads."""
    from byconity_spark.engine.access import AccessDeniedError, access_control

    register_views(spark, sf)
    access_control.reset()
    try:
        ch_sql(spark, "CREATE ROLE analyst")
        ch_sql(spark, "CREATE USER alice")
        ch_sql(spark, "GRANT analyst TO alice")
        ch_sql(spark, "GRANT SELECT ON orders TO analyst")
        ch_sql(
            spark,
            "CREATE ROW POLICY rbac_perm ON orders FOR SELECT "
            "USING o_orderstatus = 'F' TO analyst",
        )
        ch_sql(spark, "SET SESSION USER alice")
        n_perm = ch_sql(
            spark, "SELECT count(*) AS n FROM orders"
        ).collect()[0][0]
        ch_sql(spark, "SET SESSION USER default")
        ch_sql(
            spark,
            "CREATE ROW POLICY rbac_restr ON orders AS RESTRICTIVE "
            "USING o_orderpriority LIKE '1%' TO analyst",
        )
        ch_sql(spark, "SET SESSION USER alice")
        n_mixed = ch_sql(
            spark, "SELECT count(*) AS n FROM orders"
        ).collect()[0][0]
        try:
            ch_sql(spark, "SELECT count(*) AS n FROM customer")
            denied = 0
        except AccessDeniedError:
            denied = 1
        rows = [
            ("alice_permissive", int(n_perm)),
            ("alice_mixed", int(n_mixed)),
            ("customer_denied", denied),
        ]
    finally:
        access_control.reset()
    return _local_df(spark, rows, "stage string, n bigint")


@register(
    "chsql_transaction_suite",
    oracle="""
    SELECT 'created' AS stage, CAST(count(*) AS BIGINT) AS n
    FROM nation WHERE n_regionkey = 0
    UNION ALL
    SELECT 'read_your_writes', CAST(count(*) AS BIGINT)
    FROM nation WHERE n_regionkey IN (0, 1)
    UNION ALL
    SELECT 'after_rollback', CAST(count(*) AS BIGINT)
    FROM nation WHERE n_regionkey = 0
    UNION ALL
    SELECT 'after_commit', CAST(count(*) AS BIGINT)
    FROM nation WHERE n_regionkey IN (0, 2)
    """,
)
def chsql_transaction_suite(spark: SparkSession, sf: str) -> DataFrame:
    """BEGIN / COMMIT / ROLLBACK over session tables (reference
    src/Parsers/ASTTransaction.h, src/Transaction/ CnchTransaction).
    Rollback restores pre-image LOGICAL PLANS, not data copies — nothing
    is collected, so transaction bookkeeping is O(tables touched), never
    O(rows), at any scale."""
    from byconity_spark.engine.transactions import transactions

    register_views(spark, sf)
    transactions.reset()

    def count() -> int:
        return int(
            ch_sql(spark, "SELECT count(*) AS n FROM wl_txn_t").collect()[0][0]
        )

    try:
        ch_sql(
            spark,
            "CREATE TABLE wl_txn_t AS SELECT n_nationkey AS k FROM nation "
            "WHERE n_regionkey = 0",
        )
        rows = [("created", count())]
        ch_sql(spark, "BEGIN TRANSACTION")
        ch_sql(
            spark,
            "INSERT INTO wl_txn_t SELECT n_nationkey FROM nation "
            "WHERE n_regionkey = 1",
        )
        rows.append(("read_your_writes", count()))
        ch_sql(spark, "ROLLBACK")
        rows.append(("after_rollback", count()))
        ch_sql(spark, "BEGIN")
        ch_sql(
            spark,
            "INSERT INTO wl_txn_t SELECT n_nationkey FROM nation "
            "WHERE n_regionkey = 2",
        )
        ch_sql(spark, "COMMIT")
        rows.append(("after_commit", count()))
    finally:
        transactions.reset()
        ch_sql(spark, "DROP TABLE IF EXISTS wl_txn_t")
    return _local_df(spark, rows, "stage string, n bigint")


@register(
    "chsql_insert_format",
    oracle="""
    SELECT CAST(k AS INTEGER) AS k, v, CAST(x AS DOUBLE) AS x
    FROM (VALUES (1, 'a', 1.5), (2, 'b', NULL), (3, 'c', 2.5),
                 (4, 'd', 3.25), (5, 'e', NULL), (6, 'f', 4.0))
         AS t(k, v, x)
    """,
)
def chsql_insert_format(spark: SparkSession, sf: str) -> DataFrame:
    """Inline INSERT ... FORMAT row-input formats (reference src/Formats/:
    JSONEachRow, CSV, TSVWithNames subset+reorder, Values).  Inline
    payloads are client-typed text — parsing them on the driver is the
    reference's model too (the server parses the statement body); bulk
    data goes through the distributed source readers instead."""
    register_views(spark, sf)
    ch_sql(spark, "DROP TABLE IF EXISTS wl_fmt_t")
    try:
        ch_sql(spark, "CREATE TABLE wl_fmt_t (k Int32, v String, x Float64)")
        ch_sql(
            spark,
            "INSERT INTO wl_fmt_t FORMAT JSONEachRow "
            '{"k": 1, "v": "a", "x": 1.5}\n{"k": 2, "v": "b", "x": null}',
        )
        ch_sql(spark, "INSERT INTO wl_fmt_t FORMAT CSV 3,c,2.5\n4,d,3.25")
        ch_sql(
            spark,
            "INSERT INTO wl_fmt_t (v, k) FORMAT TSVWithNames v\tk\ne\t5",
        )
        ch_sql(spark, "INSERT INTO wl_fmt_t FORMAT Values (6, 'f', 4.0)")
        out = ch_sql(spark, "SELECT k, v, x FROM wl_fmt_t")
        # materialize before the view is dropped (the view swap chain
        # underneath is lazy plans over inline literals — tiny)
        rows = out.collect()
        return _local_df(spark, rows, out.schema)
    finally:
        ch_sql(spark, "DROP TABLE IF EXISTS wl_fmt_t")


@register(
    "chsql_view_exchange",
    oracle="""
    SELECT 'a_after_exchange' AS stage, CAST(count(*) AS BIGINT) AS n
    FROM nation WHERE n_regionkey IN (1, 2)
    UNION ALL
    SELECT 'b_after_exchange', CAST(count(*) AS BIGINT)
    FROM nation WHERE n_regionkey = 0
    UNION ALL
    SELECT 'view_rows', CAST(count(DISTINCT n_regionkey) AS BIGINT)
    FROM nation WHERE n_regionkey IN (1, 2)
    """,
)
def chsql_view_exchange(spark: SparkSession, sf: str) -> DataFrame:
    """EXCHANGE TABLES atomic pair swap (reference ASTRenameQuery.h:54) +
    CREATE VIEW (ASTCreateQuery is_ordinary_view).  Both are catalog
    operations over logical plans — O(1) regardless of data volume."""
    register_views(spark, sf)
    for t in ("wl_ex_a", "wl_ex_b"):
        ch_sql(spark, f"DROP TABLE IF EXISTS {t}")
    try:
        ch_sql(
            spark,
            "CREATE TABLE wl_ex_a AS SELECT * FROM nation "
            "WHERE n_regionkey = 0",
        )
        ch_sql(
            spark,
            "CREATE TABLE wl_ex_b AS SELECT * FROM nation "
            "WHERE n_regionkey IN (1, 2)",
        )
        ch_sql(spark, "EXCHANGE TABLES wl_ex_a AND wl_ex_b")
        ch_sql(
            spark,
            "CREATE VIEW wl_ex_v AS SELECT n_regionkey, count(*) AS c "
            "FROM wl_ex_a GROUP BY n_regionkey",
        )
        rows = [
            ("a_after_exchange", int(
                ch_sql(spark, "SELECT count(*) AS n FROM wl_ex_a")
                .collect()[0][0])),
            ("b_after_exchange", int(
                ch_sql(spark, "SELECT count(*) AS n FROM wl_ex_b")
                .collect()[0][0])),
            ("view_rows", int(
                ch_sql(spark, "SELECT count(*) AS n FROM wl_ex_v")
                .collect()[0][0])),
        ]
    finally:
        for t in ("wl_ex_a", "wl_ex_b"):
            ch_sql(spark, f"DROP TABLE IF EXISTS {t}")
        ch_sql(spark, "DROP VIEW IF EXISTS wl_ex_v")
    return _local_df(spark, rows, "stage string, n bigint")


@register(
    "chsql_partition_ops",
    oracle="""
    SELECT 'after_drop' AS stage, CAST(count(*) AS BIGINT) AS n
    FROM nation WHERE n_regionkey <> 0
    UNION ALL
    SELECT 'after_detach', CAST(count(*) AS BIGINT)
    FROM nation WHERE n_regionkey NOT IN (0, 3)
    UNION ALL
    SELECT 'after_attach', CAST(count(*) AS BIGINT)
    FROM nation WHERE n_regionkey <> 0
    UNION ALL
    SELECT 'after_replace', CAST(count(*) AS BIGINT)
    FROM nation WHERE n_regionkey <> 0
    UNION ALL
    SELECT 'replaced_min',
           CAST(100 + min(n_nationkey) AS BIGINT)
    FROM nation WHERE n_regionkey = 1
    """,
)
def chsql_partition_ops(spark: SparkSession, sf: str) -> DataFrame:
    """MergeTree partition commands (reference ASTAlterQuery
    DROP/DETACH/ATTACH/REPLACE PARTITION; MergeTreePartition.h).  Every
    command is partition-predicate plan algebra — the predicate pushes to
    the scan and nothing moves through the driver, so partition management
    stays O(1) at 100 TB exactly like the reference's part-catalog ops."""
    from byconity_spark.frontend.sql import _DETACHED_PARTS

    register_views(spark, sf)
    for t in ("wl_pt", "wl_pt_src"):
        ch_sql(spark, f"DROP TABLE IF EXISTS {t}")

    def count() -> int:
        return int(
            ch_sql(spark, "SELECT count(*) AS n FROM wl_pt").collect()[0][0]
        )

    try:
        ch_sql(
            spark,
            "CREATE TABLE wl_pt PARTITION BY n_regionkey AS "
            "SELECT * FROM nation",
        )
        ch_sql(spark, "ALTER TABLE wl_pt DROP PARTITION 0")
        rows = [("after_drop", count())]
        ch_sql(spark, "ALTER TABLE wl_pt DETACH PARTITION 3")
        rows.append(("after_detach", count()))
        ch_sql(spark, "ALTER TABLE wl_pt ATTACH PARTITION 3")
        rows.append(("after_attach", count()))
        ch_sql(
            spark,
            "CREATE TABLE wl_pt_src PARTITION BY n_regionkey AS "
            "SELECT n_nationkey + 100 AS n_nationkey, n_name, n_regionkey "
            "FROM nation WHERE n_regionkey = 1",
        )
        ch_sql(spark, "ALTER TABLE wl_pt REPLACE PARTITION 1 FROM wl_pt_src")
        rows.append(("after_replace", count()))
        rows.append(
            ("replaced_min", int(
                ch_sql(
                    spark,
                    "SELECT min(n_nationkey) AS m FROM wl_pt "
                    "WHERE n_regionkey = 1",
                ).collect()[0][0]
            ))
        )
    finally:
        for t in ("wl_pt", "wl_pt_src"):
            ch_sql(spark, f"DROP TABLE IF EXISTS {t}")
        _DETACHED_PARTS.clear()
    return _local_df(spark, rows, "stage string, n bigint")


@register(
    "chsql_projection_rewrite",
    oracle="""
    SELECT o_orderstatus,
           CAST(count(o_custkey) AS BIGINT) AS n,
           min(o_totalprice) AS mn,
           max(o_totalprice) AS mx
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def chsql_projection_rewrite(spark: SparkSession, sf: str) -> DataFrame:
    """MergeTree projection + automatic aggregate rewrite (reference
    ASTProjectionDeclaration.h / optimizeUseAggregateProjection.cpp /
    MaterializedViewRewriter.h).  The statement is answered by
    RE-AGGREGATING the materialized rollup (count via sum of counts, min
    of mins, max of maxes — exact under re-aggregation, so the projection
    path itself is what the oracle validates).  The fact table is scanned
    once at materialization; at 100 TB every matching query after that
    reads the rollup, smaller by the group-by reduction factor."""
    from byconity_spark.engine.projections import projections

    register_views(spark, sf)
    projections.clear()
    ch_sql(spark, "DROP TABLE IF EXISTS wl_pj")
    try:
        ch_sql(
            spark,
            "CREATE TABLE wl_pj AS SELECT o_orderstatus, o_totalprice, "
            "o_custkey FROM orders",
        )
        ch_sql(
            spark,
            "ALTER TABLE wl_pj ADD PROJECTION agg_status ("
            "SELECT o_orderstatus, count(o_custkey) AS n, "
            "min(o_totalprice) AS mn, max(o_totalprice) AS mx "
            "GROUP BY o_orderstatus)",
        )
        q = (
            "SELECT o_orderstatus, count(o_custkey) AS n, "
            "min(o_totalprice) AS mn, max(o_totalprice) AS mx "
            "FROM wl_pj GROUP BY o_orderstatus"
        )
        assert projections.try_rewrite(spark, q) is not None
        out = ch_sql(spark, q)  # answered from the projection
        rows = out.collect()
        return _local_df(spark, rows, out.schema)
    finally:
        projections.clear()
        ch_sql(spark, "DROP TABLE IF EXISTS wl_pj")


@register(
    "chsql_star_modifiers",
    oracle="""
    SELECT n_nationkey, n_regionkey * 10 AS n_regionkey
    FROM nation WHERE n_nationkey < 5
    """,
)
def chsql_star_modifiers(spark: SparkSession, sf: str) -> DataFrame:
    """CH star modifiers * EXCEPT / REPLACE (reference ASTColumnsMatcher.h,
    TranslateQualifiedNamesVisitor transformers): expansion against the
    table schema happens before the string rewrite, so the emitted plan is
    a plain projection — column pruning and pushdown see ordinary columns."""
    return _run(
        spark,
        sf,
        "SELECT * EXCEPT (n_name) REPLACE(n_regionkey * 10 AS n_regionkey) "
        "FROM nation WHERE n_nationkey < 5",
    )


@register(
    "chsql_databases",
    oracle="""
    SELECT 'total' AS stage, CAST(count(*) AS BIGINT) AS n FROM nation
    UNION ALL
    SELECT 'joined', CAST(count(*) AS BIGINT) FROM (
        SELECT n_regionkey FROM nation GROUP BY n_regionkey
    ) t JOIN region ON n_regionkey = r_regionkey
    """,
)
def chsql_databases(spark: SparkSession, sf: str) -> DataFrame:
    """Session databases (reference InterpreterCreateQuery database
    branch, DatabaseCatalog.h): CREATE DATABASE, qualified db.table,
    USE-scoped resolution with fall-through to default.  Namespacing is
    pure name resolution — plans are identical to unqualified ones."""
    from byconity_spark.frontend.sql import _CURRENT_DATABASE

    register_views(spark, sf)
    ch_sql(spark, "DROP DATABASE IF EXISTS wl_db")
    try:
        ch_sql(spark, "CREATE DATABASE wl_db")
        ch_sql(
            spark,
            "CREATE TABLE wl_db.rollup AS SELECT n_regionkey, "
            "count(*) AS c FROM nation GROUP BY n_regionkey",
        )
        ch_sql(spark, "USE wl_db")
        total = int(
            ch_sql(spark, "SELECT sum(c) AS n FROM rollup").collect()[0][0]
        )
        joined = int(
            ch_sql(
                spark,
                "SELECT count(*) AS n FROM rollup "
                "JOIN region ON n_regionkey = r_regionkey",
            ).collect()[0][0]
        )
        rows = [("total", total), ("joined", joined)]
    finally:
        _CURRENT_DATABASE[0] = "default"
        ch_sql(spark, "DROP DATABASE IF EXISTS wl_db")
    return _local_df(spark, rows, "stage string, n bigint")


@register(
    "chsql_ttl_sweep",
    oracle="""
    SELECT 'kept' AS stage, CAST(count(*) AS BIGINT) AS n
    FROM events
    WHERE NOT (ts + INTERVAL 10 DAY <= TIMESTAMP '2024-01-25 00:00:00')
    UNION ALL
    SELECT 'total', CAST(count(*) AS BIGINT) FROM events
    """,
)
def chsql_ttl_sweep(spark: SparkSession, sf: str) -> DataFrame:
    """Row TTL swept at merge time (reference TTLDescription.h,
    TTLBlockInputStream.h), with the clock pinned for reproducibility.
    The expiry filter is plan algebra pushed into the scan — a TTL sweep
    at 100 TB costs one filtered rewrite of the expiring parts, exactly
    the reference's merge-time model."""
    from byconity_spark.frontend.sql import _TTL_NOW

    register_views(spark, sf)
    ch_sql(spark, "DROP TABLE IF EXISTS wl_ttl")
    try:
        ch_sql(
            spark,
            "CREATE TABLE wl_ttl TTL ts + INTERVAL 10 DAY AS "
            "SELECT event_id, ts FROM events",
        )
        total = int(
            ch_sql(spark, "SELECT count(*) AS n FROM wl_ttl").collect()[0][0]
        )
        ch_sql(spark, "SET ttl_now = '2024-01-25 00:00:00'")
        ch_sql(spark, "OPTIMIZE TABLE wl_ttl FINAL")
        kept = int(
            ch_sql(spark, "SELECT count(*) AS n FROM wl_ttl").collect()[0][0]
        )
        rows = [("kept", kept), ("total", total)]
    finally:
        _TTL_NOW[0] = None
        ch_sql(spark, "DROP TABLE IF EXISTS wl_ttl")
    return _local_df(spark, rows, "stage string, n bigint")


@register(
    "chsql_top_collate",
    oracle="""
    SELECT n_nationkey AS k, n_name AS v
    FROM nation ORDER BY n_name, n_nationkey LIMIT 5
    """,
)
def chsql_top_collate(spark: SparkSession, sf: str) -> DataFrame:
    """SELECT TOP n (ParserSelectQuery TOP branch) + ORDER BY ... COLLATE
    (Collator.h → Spark 4 ICU collations; binary-equal on this ASCII
    data, so the oracle pins exact values)."""
    return _run(
        spark,
        sf,
        "SELECT TOP 5 n_nationkey AS k, n_name AS v FROM nation "
        "ORDER BY n_name COLLATE 'en', n_nationkey",
    )


@register(
    "chsql_mv_sql",
    oracle="""
    SELECT 'initial' AS stage, CAST(count(*) AS BIGINT) AS n FROM nation
    UNION ALL
    SELECT 'after_insert', CAST(count(*) + 1 AS BIGINT) FROM nation
    """,
)
def chsql_mv_sql(spark: SparkSession, sf: str) -> DataFrame:
    """SQL-surface materialized view with refresh-on-stale (reference
    StorageMaterializedView.h): a statement touching a stale MV
    re-materializes it first, keyed on source-table versions.  The
    refresh is the SELECT itself — a distributed job, never driver
    work."""
    from byconity_spark.frontend.sql import _SESSION_MVS

    register_views(spark, sf)
    ch_sql(spark, "DROP TABLE IF EXISTS wl_mv_src")
    try:
        ch_sql(
            spark,
            "CREATE TABLE wl_mv_src AS SELECT n_regionkey AS r FROM nation",
        )
        ch_sql(
            spark,
            "CREATE MATERIALIZED VIEW wl_mv AS "
            "SELECT count(*) AS c FROM wl_mv_src",
        )
        initial = int(
            ch_sql(spark, "SELECT c FROM wl_mv").collect()[0][0]
        )
        ch_sql(spark, "INSERT INTO wl_mv_src VALUES (9)")
        after = int(ch_sql(spark, "SELECT c FROM wl_mv").collect()[0][0])
        rows = [("initial", initial), ("after_insert", after)]
    finally:
        _SESSION_MVS.pop("wl_mv", None)
        spark.catalog.dropTempView("wl_mv")
        ch_sql(spark, "DROP TABLE IF EXISTS wl_mv_src")
    return _local_df(spark, rows, "stage string, n bigint")


@register(
    "chsql_file_function",
    oracle="""
    SELECT n_regionkey, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(n_nationkey) AS BIGINT) AS key_sum
    FROM nation GROUP BY n_regionkey
    """,
)
def chsql_file_function(spark: SparkSession, sf: str) -> DataFrame:
    """file() table function (reference TableFunctionFile.cpp): export
    nation via INTO OUTFILE, read it back with file() and the DECLARED
    structure (never inference — at 100 TB inference means a listing +
    sampling pass), aggregate.  Proves the serializer/reader pair
    value-exact."""
    import shutil
    import tempfile

    register_views(spark, sf)
    base = tempfile.mkdtemp(prefix="bspark_wl_file_")
    try:
        path = f"{base}/nation.tsv"
        ch_sql(
            spark,
            "SELECT n_nationkey, n_regionkey FROM nation "
            f"INTO OUTFILE '{path}'",
        )
        out = ch_sql(
            spark,
            f"SELECT n_regionkey, count(*) AS n, sum(n_nationkey) AS "
            f"key_sum FROM file('{path}', 'TSV', "
            "'n_nationkey Int32, n_regionkey Int32') GROUP BY n_regionkey",
        )
        # materialize before the temp file goes away (the read is lazy)
        rows = out.collect()
        return _local_df(spark, rows, out.schema)
    finally:
        shutil.rmtree(base, ignore_errors=True)


@register(
    "chsql_rocksdb_upsert",
    oracle="""
    SELECT CAST(k AS BIGINT) AS k, v FROM (
      SELECT n_nationkey AS k, n_name AS v FROM nation
      WHERE n_nationkey NOT IN (0, 5)
      UNION ALL
      SELECT * FROM (VALUES (0, 'X0'), (5, 'X5'), (99, 'NEW')) t(k, v)
    ) ORDER BY k
    """,
)
def chsql_rocksdb_upsert(spark: SparkSession, sf: str) -> DataFrame:
    """EmbeddedRocksDB key-value engine (reference
    src/Storages/RocksDB/StorageEmbeddedRocksDB.cpp via
    registerStorages.cpp): INSERT upserts by PRIMARY KEY — the second
    batch REPLACES rows 0 and 5 and adds 99; reads are always
    deduplicated, no FINAL.  The upsert compiles to one key-shuffled
    anti-join + union (rocksdb Put cost class)."""
    register_views(spark, sf)
    ch_sql(spark, "DROP TABLE IF EXISTS kv_upsert_wl")
    ch_sql(
        spark,
        "CREATE TABLE kv_upsert_wl ENGINE = EmbeddedRocksDB "
        "PRIMARY KEY k AS SELECT CAST(n_nationkey AS BIGINT) AS k, "
        "n_name AS v FROM nation",
    )
    ch_sql(
        spark,
        "INSERT INTO kv_upsert_wl VALUES (0, 'X0'), (5, 'X5'), (99, 'NEW')",
    )
    out = ch_sql(spark, "SELECT k, v FROM kv_upsert_wl ORDER BY k")
    rows = out.collect()
    ch_sql(spark, "DROP TABLE IF EXISTS kv_upsert_wl")
    return _local_df(spark, rows, out.schema)


@register(
    "chsql_any_right_join",
    oracle="""
    SELECT r.r_name AS rname, m.nname
    FROM region r
    LEFT JOIN (SELECT n_regionkey, min(n_name) AS nname
               FROM nation GROUP BY n_regionkey) m
      ON r.r_regionkey = m.n_regionkey
    ORDER BY rname
    """,
)
def chsql_any_right_join(spark: SparkSession, sf: str) -> DataFrame:
    """ANY RIGHT JOIN (ASTTablesInSelectQuery.h:127 — strictness binds to
    the OTHER side, so every right row survives with at most one left
    match; this engine's deterministic pick is the first left row under
    payload ordering = min(n_name) here).  GLOBAL-prefixed strict joins
    strip the locality modifier the same way (frontend/joins_sql.py)."""
    register_views(spark, sf)
    return ch_sql(
        spark,
        "SELECT r.r_name AS rname, n.n_name AS nname "
        "FROM (SELECT n_regionkey, n_name FROM nation) AS n "
        "GLOBAL ANY RIGHT JOIN region AS r "
        "ON n.n_regionkey = r.r_regionkey ORDER BY rname",
    )
