"""Function-registry workload: family-packed queries where every projected
column goes through the CH-name registry (byconity_spark/functions), checked
against hand-written DuckDB equivalents.

One registered query per family ≈ one row in CORRECTNESS per ~10 functions;
the per-name unit coverage lives in tests/test_functions_registry.py.

Reference families: src/Functions/DateTimeTransforms.h (date), concat.cpp /
position / splitByChar (string), FunctionsRound.cpp / intDiv (math),
multiIf.cpp (conditional), src/Functions/array/ (arrays + lambdas),
FunctionsJSON.cpp (JSON over events.props), FunctionsHashing.cpp +
src/Functions/URL/ (hash/URL).
"""

from __future__ import annotations

from byconity_spark.engine.localdf import local_df as _local_df

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import Window as _W
from pyspark.sql import functions as F

from byconity_spark.engine.catalog import load_table
from byconity_spark.functions import ch
from byconity_spark.workloads import register
from byconity_spark.workloads._arrays import arr_str


def _t(spark: SparkSession, sf: str, name: str) -> DataFrame:
    return load_table(spark, sf, name)


@register(
    "fn_date_suite",
    oracle="""
    SELECT event_id,
           year(t)                          AS y,
           month(t)                         AS mo,
           day(t)                           AS d,
           hour(t)                          AS h,
           isodow(t)                        AS dow,
           CAST(date_trunc('day', t) AS TIMESTAMP)   AS day_start,
           date_trunc('hour', t)                     AS hour_start,
           CAST(date_trunc('month', t) AS TIMESTAMP) AS month_start,
           CAST(year(t) * 100 + month(t) AS INT)  AS yyyymm,
           CAST(t AS DATE)                  AS d_date,
           date_diff('day', TIMESTAMP '2024-01-01 00:00:00', t) AS days_since,
           t + INTERVAL 3 DAY               AS plus3d,
           CAST(epoch(date_trunc('second', t)) AS BIGINT) AS unix_sec
    FROM (SELECT event_id, CAST(ts AS TIMESTAMP) AS t FROM events)
    """,
)
def fn_date_suite(spark: SparkSession, sf: str) -> DataFrame:
    ev = _t(spark, sf, "events")
    t = F.col("ts")
    return ev.select(
        "event_id",
        ch("toYear", t).cast("long").alias("y"),
        ch("toMonth", t).cast("long").alias("mo"),
        ch("toDayOfMonth", t).cast("long").alias("d"),
        ch("toHour", t).cast("long").alias("h"),
        ch("toDayOfWeek", t).cast("long").alias("dow"),
        ch("toStartOfDay", t).alias("day_start"),
        ch("toStartOfHour", t).alias("hour_start"),
        ch("toStartOfMonth", t).alias("month_start"),
        ch("toYYYYMM", t).alias("yyyymm"),
        ch("toDate", t).alias("d_date"),
        ch("dateDiff", "day", F.lit("2024-01-01").cast("date"), t).alias("days_since"),
        ch("addDays", t, 3).alias("plus3d"),
        ch("toUnixTimestamp", t).alias("unix_sec"),
    )


@register(
    "fn_string_suite",
    oracle="""
    SELECT doc_id,
           length(text)                       AS len,
           upper(lang)                        AS lang_up,
           substring(text, 1, 12)             AS head,
           strpos(text, 'data')               AS pos_data,
           starts_with(text, 'the')           AS starts_the,
           (text LIKE '%join%')               AS has_join,
           replace(lang, 'e', 'E')            AS lang_repl,
           len(string_split(text, ' '))       AS n_tokens,
           concat(lang, '-', source)          AS lang_src,
           lpad(lang, 6, '_')                 AS lang_pad,
           reverse(source)                    AS src_rev,
           trim(concat('  ', lang, '  '))     AS lang_trim
    FROM documents
    """,
)
def fn_string_suite(spark: SparkSession, sf: str) -> DataFrame:
    doc = _t(spark, sf, "documents")
    txt = F.col("text")
    return doc.select(
        "doc_id",
        ch("length", txt).cast("long").alias("len"),
        ch("upper", F.col("lang")).alias("lang_up"),
        ch("substring", txt, 1, 12).alias("head"),
        ch("position", txt, "data").cast("long").alias("pos_data"),
        ch("startsWith", txt, "the").alias("starts_the"),
        ch("like", txt, "%join%").alias("has_join"),
        ch("replaceAll", F.col("lang"), "e", "E").alias("lang_repl"),
        F.size(ch("splitByChar", " ", txt)).cast("long").alias("n_tokens"),
        ch("concat", F.col("lang"), F.lit("-"), F.col("source")).alias("lang_src"),
        ch("leftPad", F.col("lang"), 6, "_").alias("lang_pad"),
        ch("reverse", F.col("source")).alias("src_rev"),
        ch("trimBoth", F.concat(F.lit("  "), F.col("lang"), F.lit("  "))).alias(
            "lang_trim"
        ),
    )


@register(
    "fn_math_cond_suite",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(l_discount - 0.05)                    AS ad,
           CAST(floor(l_extendedprice) AS BIGINT)    AS fl,
           CAST(ceil(l_extendedprice) AS BIGINT)     AS ce,
           sqrt(l_quantity)                          AS sq,
           round(exp(l_discount), 6)                 AS ex,
           round(ln(l_extendedprice), 6)             AS lg,
           pow(l_quantity, 2)                        AS p2,
           l_orderkey // 7                           AS idiv,
           l_orderkey % 7                            AS imod,
           greatest(l_quantity, 25.0)                AS gt,
           least(l_quantity, 25.0)                   AS lt,
           CASE WHEN l_quantity < 10 THEN 'low'
                WHEN l_quantity < 30 THEN 'mid'
                ELSE 'high' END                      AS bucket,
           CASE WHEN l_returnflag = 'R' THEN l_extendedprice ELSE 0.0 END AS ret_price,
           coalesce(nullif(l_returnflag, 'N'), 'none') AS flag_or_none
    FROM lineitem
    WHERE l_shipdate >= DATE '1998-06-01'
    """,
)
def fn_math_cond_suite(spark: SparkSession, sf: str) -> DataFrame:
    li = _t(spark, sf, "lineitem").filter(
        F.col("l_shipdate") >= F.lit("1998-06-01").cast("date")
    )
    q = F.col("l_quantity")
    ep = F.col("l_extendedprice")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        ch("abs", F.col("l_discount") - 0.05).alias("ad"),
        ch("floor", ep).alias("fl"),
        ch("ceil", ep).alias("ce"),
        ch("sqrt", q).alias("sq"),
        ch("round", ch("exp", F.col("l_discount")), 6).alias("ex"),
        ch("round", ch("ln", ep), 6).alias("lg"),
        ch("pow", q, F.lit(2.0)).alias("p2"),
        ch("intDiv", F.col("l_orderkey"), F.lit(7)).alias("idiv"),
        ch("modulo", F.col("l_orderkey"), F.lit(7)).alias("imod"),
        ch("greatest", q, F.lit(25.0)).alias("gt"),
        ch("least", q, F.lit(25.0)).alias("lt"),
        ch(
            "multiIf",
            q < 10,
            F.lit("low"),
            q < 30,
            F.lit("mid"),
            F.lit("high"),
        ).alias("bucket"),
        ch("if", F.col("l_returnflag") == "R", ep, F.lit(0.0)).alias("ret_price"),
        ch("ifNull", ch("nullIf", F.col("l_returnflag"), F.lit("N")), F.lit("none")).alias(
            "flag_or_none"
        ),
    )


@register(
    "fn_array_suite",
    oracle="""
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS arr FROM documents)
    SELECT doc_id,
           len(arr)                                       AS n,
           arr[1]                                         AS first_tok,
           list_contains(arr, 'data')                     AS has_data,
           CAST(coalesce(list_position(arr, 'data'), 0) AS BIGINT) AS idx_data,
           array_to_string(arr[1:5], '|')                 AS head5,
           len(list_distinct(arr))                        AS n_uniq,
           list_sort(list_distinct(arr))[1]               AS min_tok,
           len(list_filter(arr, x -> length(x) > 4))      AS n_long,
           array_to_string(list_transform(arr[1:3], x -> upper(x)), '|') AS up3,
           CAST(list_aggregate(list_transform(arr, x -> length(x)), 'sum') AS BIGINT) AS sum_lens,
           list_max(list_transform(arr, x -> length(x)))  AS max_len
    FROM d
    """,
)
def fn_array_suite(spark: SparkSession, sf: str) -> DataFrame:
    doc = _t(spark, sf, "documents")
    d = doc.select("doc_id", ch("splitByChar", " ", F.col("text")).alias("arr"))
    arr = F.col("arr")
    return d.select(
        "doc_id",
        F.size(arr).cast("long").alias("n"),
        ch("arrayElement", arr, F.lit(1)).alias("first_tok"),
        ch("has", arr, F.lit("data")).alias("has_data"),
        ch("indexOf", arr, F.lit("data")).alias("idx_data"),
        ch("arrayStringConcat", ch("arraySlice", arr, 1, 5), "|").alias("head5"),
        F.size(ch("arrayDistinct", arr)).cast("long").alias("n_uniq"),
        ch("arrayElement", ch("arraySort", ch("arrayDistinct", arr)), F.lit(1)).alias(
            "min_tok"
        ),
        ch("arrayCount", lambda x: F.length(x) > 4, arr).cast("long").alias("n_long"),
        arr_str(ch("arrayMap", lambda x: F.upper(x), ch("arraySlice", arr, 1, 3))).alias("up3"),
        ch("arraySum", ch("arrayMap", lambda x: F.length(x), arr))
        .cast("long")
        .alias("sum_lens"),
        ch("arrayMax", ch("arrayMap", lambda x: F.length(x), arr)).cast("long").alias("max_len"),
    )


@register(
    "fn_json_suite",
    oracle="""
    SELECT event_id,
           CAST(props->>'$.k' AS BIGINT)         AS k_int,
           props->>'$.k'                          AS k_str,
           (json_extract(props, '$.k') IS NOT NULL)       AS has_k,
           (json_extract(props, '$.missing') IS NOT NULL) AS has_missing,
           -- nested-path expectations computed straight from the columns the
           -- Spark side serializes into its nested JSON document
           user_id                                AS u_id,
           event_type                             AS u_type,
           value                                  AS v1,
           value * 2                              AS v2,
           CAST(2 AS BIGINT)                      AS n_vals,
           array_to_string(['id', 't'], '|')      AS u_keys
    FROM events
    """,
)
def fn_json_suite(spark: SparkSession, sf: str) -> DataFrame:
    """Flat visitParam-style paths plus nested multi-key JSONExtract
    (reference src/Functions/FunctionsJSON.cpp multi-key form,
    src/Functions/JSONPath/): the nested document is built in-plan with
    to_json, then decoded with ONE from_json pass — the Spark-idiomatic
    equivalent of the reference's multi-key JSONExtract (each of which
    re-parses the document; the per-path JSONExtract* functions stay
    exercised on the short `props` column and in tests/test_json_paths.py).
    Doubles round-trip exactly through JSON shortest-repr."""
    ev = _t(spark, sf, "events")
    p = F.col("props")
    nested = F.to_json(
        F.struct(
            F.struct(
                F.col("user_id").alias("id"), F.col("event_type").alias("t")
            ).alias("u"),
            F.array(F.col("value"), F.col("value") * 2).alias("vals"),
        )
    )
    doc = F.from_json(nested, "u map<string,string>, vals array<double>")
    return ev.select(
        "event_id",
        ch("JSONExtractInt", p, "k").alias("k_int"),
        ch("JSONExtractString", p, "k").alias("k_str"),
        ch("JSONHas", p, "k").alias("has_k"),
        ch("JSONHas", p, "missing").alias("has_missing"),
        doc["u"]["id"].cast("long").alias("u_id"),
        doc["u"]["t"].alias("u_type"),
        F.element_at(doc["vals"], 1).alias("v1"),
        F.element_at(doc["vals"], 2).alias("v2"),
        F.size(doc["vals"]).cast("long").alias("n_vals"),
        arr_str(F.map_keys(doc["u"])).alias("u_keys"),
    )


@register(
    "fn_hash_url_suite",
    oracle="""
    WITH d AS (
      SELECT doc_id, text, lang, source,
             concat('https://', source, '.example.com/docs/', lang,
                    '?q=', lang, '&n=', CAST(n_chars AS VARCHAR)) AS url
      FROM documents
    )
    SELECT doc_id,
           md5(text)                                        AS h_md5,
           sha256(text)                                     AS h_sha,
           lower(to_base64(encode(lang)))                   AS b64,
           regexp_extract(url, '^([a-z]+):', 1)             AS proto,
           regexp_extract(url, '://([^/]+)', 1)             AS host,
           regexp_extract(url, '://[^/]+(/[^?#]*)', 1)      AS upath,
           regexp_extract(url, '\\?(.*)$', 1)               AS qstring,
           regexp_extract(url, '[?&]q=([^&#]*)', 1)         AS param_q,
           regexp_replace(url, '\\?.*$', '')                AS no_query,
           'com'                                            AS tld
    FROM d
    """,
)
def fn_hash_url_suite(spark: SparkSession, sf: str) -> DataFrame:
    doc = _t(spark, sf, "documents")
    d = doc.select(
        "doc_id",
        "text",
        "lang",
        F.concat(
            F.lit("https://"),
            F.col("source"),
            F.lit(".example.com/docs/"),
            F.col("lang"),
            F.lit("?q="),
            F.col("lang"),
            F.lit("&n="),
            F.col("n_chars").cast("string"),
        ).alias("url"),
    )
    u = F.col("url")
    return d.select(
        "doc_id",
        ch("MD5", F.col("text")).alias("h_md5"),
        ch("SHA256", F.col("text")).alias("h_sha"),
        F.lower(ch("base64Encode", F.col("lang"))).alias("b64"),
        ch("protocol", u).alias("proto"),
        ch("domain", u).alias("host"),
        ch("path", u).alias("upath"),
        ch("queryString", u).alias("qstring"),
        ch("extractURLParameter", u, "q").alias("param_q"),
        ch("cutQueryString", u).alias("no_query"),
        ch("topLevelDomain", u).alias("tld"),
    )


@register(
    "fn_geo_suite",
    oracle="""
    WITH pts AS (
      SELECT c_custkey, c_mktsegment,
             ((c_custkey % 180) - 90 + 0.5)::DOUBLE        AS lat,
             (((c_custkey * 7) % 360) - 180 + 0.25)::DOUBLE AS lon
      FROM customer
    ),
    d AS (
      SELECT c_mktsegment,
             2.0 * 6371000.0 * asin(sqrt(
               pow(sin(radians(48.85 - lat) / 2), 2)
               + cos(radians(lat)) * cos(radians(48.85))
                 * pow(sin(radians(2.35 - lon) / 2), 2)
             )) AS dist_m
      FROM pts
    )
    SELECT c_mktsegment,
           round(avg(dist_m), 3) AS avg_dist_m,
           round(max(dist_m), 3) AS max_dist_m
    FROM d GROUP BY c_mktsegment
    """,
)
def fn_geo_suite(spark: SparkSession, sf: str) -> DataFrame:
    """greatCircleDistance (registry, haversine on the 6371 km sphere) from
    synthesized per-customer coordinates to Paris, aggregated by segment.
    Ref src/Functions/greatCircleDistance.cpp."""
    from byconity_spark.functions.registry import ch

    c = _t(spark, sf, "customer")
    lat = ((F.col("c_custkey") % 180) - 90 + F.lit(0.5)).cast("double")
    lon = (((F.col("c_custkey") * 7) % 360) - 180 + F.lit(0.25)).cast("double")
    dist = ch("greatCircleDistance", lon, lat, F.lit(2.35), F.lit(48.85))
    return (
        c.select("c_mktsegment", dist.alias("dist_m"))
        .groupBy("c_mktsegment")
        .agg(
            F.round(F.avg("dist_m"), 3).alias("avg_dist_m"),
            F.round(F.max("dist_m"), 3).alias("max_dist_m"),
        )
    )


@register(
    "fn_breadth_suite",
    oracle="""
    WITH d AS (SELECT doc_id, text, string_split(text, ' ') AS arr FROM documents)
    SELECT doc_id,
           len(list_distinct(arr))                                  AS n_uniq,
           array_to_string(arr[2:], '|')                            AS tail_toks,
           coalesce(list_position(list_transform(arr, x -> length(x) > 4), true), 0)
                                                                    AS first_long_idx,
           list_filter(arr, x -> length(x) > 4)[-1]                 AS last_long,
           upper(text[1:1]) || text[2:]                             AS cap,
           ascii(text)                                              AS first_code,
           len(regexp_extract_all(text, '[aeiou]+', 0))             AS n_vowel_runs,
           regexp_extract(text, '([a-z]+)', 1)                      AS first_word,
           array_to_string(list_filter(string_split_regex(text, '[^A-Za-z]+'),
                                       x -> x != ''), '|')          AS alpha_toks,
           concat_ws('-', doc_id, length(text))                     AS tagged,
           CASE WHEN length(text) >= 36000 THEN 36000
                WHEN length(text) >= 18000 THEN 18000
                WHEN length(text) >= 7200  THEN 7200
                WHEN length(text) >= 3600  THEN 3600
                WHEN length(text) >= 1800  THEN 1800
                WHEN length(text) >= 600   THEN 600
                WHEN length(text) >= 300   THEN 300
                WHEN length(text) >= 240   THEN 240
                WHEN length(text) >= 180   THEN 180
                WHEN length(text) >= 120   THEN 120
                WHEN length(text) >= 60    THEN 60
                WHEN length(text) >= 30    THEN 30
                WHEN length(text) >= 10    THEN 10
                WHEN length(text) >= 1     THEN 1
                ELSE 0 END                                          AS dur_bucket
    FROM d
    """,
)
def fn_breadth_suite(spark: SparkSession, sf: str) -> DataFrame:
    """Round-4 scalar breadth: arrayUniq/PopFront/FirstIndex/arrayLast,
    initcap-style capitalization, ascii, extractAll/countMatches/
    regexpExtract, alphaTokens, concatWithSeparator, roundDuration
    (reference src/Functions/array/*, FunctionsStringSearch*,
    FunctionsRound.cpp roundDuration)."""
    doc = _t(spark, sf, "documents")
    d = doc.select(
        "doc_id", "text", ch("splitByChar", " ", F.col("text")).alias("arr")
    )
    arr, txt = F.col("arr"), F.col("text")
    long_tok = lambda x: F.length(x) > 4  # noqa: E731
    return d.select(
        "doc_id",
        ch("arrayUniq", arr).alias("n_uniq"),
        arr_str(ch("arrayPopFront", arr)).alias("tail_toks"),
        ch("arrayFirstIndex", long_tok, arr).alias("first_long_idx"),
        ch("arrayLast", long_tok, arr).alias("last_long"),
        F.concat(F.upper(F.substring(txt, 1, 1)), F.substring(txt, 2, 1 << 30)).alias("cap"),
        ch("ascii", txt).cast("bigint").alias("first_code"),
        F.size(ch("extractAll", txt, "[aeiou]+")).cast("long").alias("n_vowel_runs"),
        ch("regexpExtract", txt, "([a-z]+)", 1).alias("first_word"),
        arr_str(ch("alphaTokens", txt)).alias("alpha_toks"),
        ch("concatWithSeparator", "-", F.col("doc_id").cast("string"),
           F.length(txt).cast("string")).alias("tagged"),
        ch("roundDuration", F.length(txt)).alias("dur_bucket"),
    )


# ------------------------------------------- -Map combinators + enum/UUID
# sumMap/minMap/maxMap single-map combinator form (reference
# AggregateFunctionMap.h), arrayEnumerateDense, UUID string<->num
# roundtrip (FunctionsCodingUUID.cpp).
@register(
    "fn_map_combinator_suite",
    oracle="""
    WITH s AS (SELECT user_id % 10 AS bucket, event_type AS k,
                      sum(value) AS sv, min(value) AS nv, max(value) AS xv
               FROM events GROUP BY 1, 2)
    SELECT bucket,
           string_agg(k || ':' || printf('%.4f', sv), '|' ORDER BY k) AS sum_map,
           string_agg(k || ':' || printf('%.4f', nv), '|' ORDER BY k) AS min_map,
           string_agg(k || ':' || printf('%.4f', xv), '|' ORDER BY k) AS max_map
    FROM s GROUP BY bucket
    """,
)
def fn_map_combinator_suite(spark: SparkSession, sf: str) -> DataFrame:
    from byconity_spark.functions.registry import ch_agg

    ev = _t(spark, sf, "events")
    m = F.create_map(F.col("event_type"), F.col("value"))
    rows = ev.select((F.col("user_id") % 10).alias("bucket"), m.alias("m"))

    def ser(mcol: Column) -> Column:
        return F.array_join(
            F.transform(
                F.array_sort(F.map_entries(mcol)),
                lambda e: F.concat(
                    e["key"], F.lit(":"), F.format_string("%.4f", e["value"])
                ),
            ),
            "|",
        )

    return rows.groupBy("bucket").agg(
        ser(ch_agg("sumMap", F.col("m"))).alias("sum_map"),
        ser(ch_agg("minMap", F.col("m"))).alias("min_map"),
        ser(ch_agg("maxMap", F.col("m"))).alias("max_map"),
    )


@register(
    "fn_enum_uuid_suite",
    oracle="""
    WITH b AS (SELECT event_id, user_id % 5 AS u5, event_id % 5 AS e5,
                      md5(props) AS h
               FROM events)
    SELECT event_id,
           '1|' || (CASE WHEN e5 = u5 THEN 1 ELSE 2 END) || '|1' AS dense,
           substr(h, 1, 8) || '-' || substr(h, 9, 4) || '-' ||
           substr(h, 13, 4) || '-' || substr(h, 17, 4) || '-' ||
           substr(h, 21, 12)                                    AS uuid_rt
    FROM b
    """,
)
def fn_enum_uuid_suite(spark: SparkSession, sf: str) -> DataFrame:
    from byconity_spark.functions.registry import ch
    from byconity_spark.workloads._arrays import arr_str

    ev = _t(spark, sf, "events")
    u5 = (F.col("user_id") % 5).cast("int")
    e5 = (F.col("event_id") % 5).cast("int")
    arr = F.array(u5, e5, u5)
    h = F.md5(F.col("props"))
    uuid_str = F.concat_ws(
        "-",
        F.substring(h, 1, 8), F.substring(h, 9, 4), F.substring(h, 13, 4),
        F.substring(h, 17, 4), F.substring(h, 21, 12),
    )
    return ev.select(
        "event_id",
        arr_str(ch("arrayEnumerateDense", arr)).alias("dense"),
        ch("UUIDNumToString", ch("UUIDStringToNum", uuid_str)).alias("uuid_rt"),
    )


# ------------------------------------------- breadth 2: time-slot / age /
# snowflake / mapAdd / rotate / hasSubstr / bar surface, one row per event
@register(
    "fn_breadth2_suite",
    oracle="""
    WITH b AS (SELECT event_id, user_id, value, CAST(ts AS TIMESTAMP) AS t,
                      event_type FROM events)
    SELECT event_id,
           CAST(to_timestamp(floor(epoch(t) / 600) * 600) AS TIMESTAMP)   AS ten_min,
           CAST(to_timestamp(floor(epoch(t) / 1800) * 1800) AS TIMESTAMP) AS slot30,
           CAST(floor(epoch(t) / 3600) AS BIGINT)          AS rel_hour,
           CAST(floor((epoch(t) - epoch(TIMESTAMP '2024-01-01')) / 86400)
                AS BIGINT)                                 AS age_days,
           CAST(date_trunc('second', t) AS TIMESTAMP)      AS snow_rt,
           array_to_string(['b','c','a'][1 + (event_id % 3):] ||
                           ['b','c','a'][:(event_id % 3)], '|') AS rot,
           (user_id % 5 = 0)                               AS has_sub,
           repeat('*', CAST(floor(least(greatest(value / 50.0, 0), 8)) AS INTEGER)) AS sbar
    FROM b
    """,
)
def fn_breadth2_suite(spark: SparkSession, sf: str) -> DataFrame:
    """Round-4 scalar breadth: toStartOfTenMinutes, timeSlot,
    toRelativeHourNum, age, snowflake round-trip, arrayRotateLeft,
    hasSubstr, and a simplified bar (the unicode eighth-block bar is
    pytest-covered; the oracle uses an ASCII stand-in with the same
    width math)."""
    ev = _t(spark, sf, "events")
    t = F.col("ts")
    arr = F.array(F.lit("b"), F.lit("c"), F.lit("a"))
    sub = F.when(
        F.col("user_id") % 5 == 0,
        F.array(F.lit("b"), F.lit("c")),
    ).otherwise(F.array(F.lit("x")))
    # hasSubstr(['b','c','a'], ['b','c']) is True; ['x'] never occurs
    return ev.select(
        "event_id",
        ch("toStartOfTenMinutes", t).alias("ten_min"),
        ch("timeSlot", t).alias("slot30"),
        ch("toRelativeHourNum", t).alias("rel_hour"),
        ch("age", "day", F.lit("2024-01-01").cast("timestamp"), t).alias("age_days"),
        ch("snowflakeToDateTime", ch("dateTimeToSnowflake", F.date_trunc("second", t))
           ).alias("snow_rt"),
        arr_str(ch("arrayRotateLeft", arr, F.col("event_id") % 3)).alias("rot"),
        ch("hasSubstr", arr, sub).alias("has_sub"),
        F.repeat(
            F.lit("*"),
            F.floor(
                F.least(
                    F.greatest(F.col("value") / 50.0, F.lit(0.0)), F.lit(8.0)
                )
            ).cast("int"),
        ).alias("sbar"),
    )


# ----------------------------------------------------- IPv4 coding suite
# (src/Functions/FunctionsCodingIP.cpp: IPv4NumToString, IPv4StringToNum,
# IPv4NumToStringClassC, isIPv4String, IPv4CIDRToRange).  IPs synthesized
# from (user_id, event_id) so both engines derive identical 10.x.y.z
# addresses; the CIDR struct is flattened to scalar lower/upper columns.
@register(
    "fn_ipv4_suite",
    oracle="""
    WITH e AS (
      SELECT DISTINCT
             167772160 + (user_id % 200) * 65536 + (event_id % 256) AS ip
      FROM events WHERE user_id < 60),
    s AS (SELECT ip,
                 printf('%d.%d.%d.%d', ip // 16777216, (ip // 65536) % 256,
                        (ip // 256) % 256, ip % 256) AS ip_str
          FROM e)
    SELECT ip, ip_str,
           printf('%d.%d.%d.xxx', ip // 16777216, (ip // 65536) % 256,
                  (ip // 256) % 256)       AS class_c,
           ip                              AS roundtrip,
           true                            AS is_valid,
           false                           AS is_valid_oct999,
           (ip // 256) * 256               AS cidr24_lo,
           (ip // 256) * 256 + 255        AS cidr24_hi,
           (ip // 65536) * 65536           AS cidr16_lo,
           (ip // 65536) * 65536 + 65535  AS cidr16_hi
    FROM s
    """,
)
def fn_ipv4_suite(spark: SparkSession, sf: str) -> DataFrame:
    ev = _t(spark, sf, "events").filter(F.col("user_id") < 60)
    ips = ev.select(
        (
            F.lit(167772160)
            + (F.col("user_id") % 200) * 65536
            + (F.col("event_id") % 256)
        ).alias("ip")
    ).distinct()
    ip = F.col("ip")
    ip_str = ch("IPv4NumToString", ip)
    cidr24 = ch("IPv4CIDRToRange", ip, 24)
    cidr16 = ch("IPv4CIDRToRange", ip, 16)
    return ips.select(
        ip,
        ip_str.alias("ip_str"),
        ch("IPv4NumToStringClassC", ip).alias("class_c"),
        ch("IPv4StringToNum", ip_str).alias("roundtrip"),
        ch("isIPv4String", ip_str).alias("is_valid"),
        ch("isIPv4String", F.concat(F.lit("999."), F.substring_index(ip_str, ".", -3)))
        .alias("is_valid_oct999"),
        cidr24.getField("lower").alias("cidr24_lo"),
        cidr24.getField("upper").alias("cidr24_hi"),
        cidr16.getField("lower").alias("cidr16_lo"),
        cidr16.getField("upper").alias("cidr16_hi"),
    )


# ------------------------------------------- IPv6 + base58 codec suite
# (FunctionsCodingIP.cpp IPv6NumToString/StringToNum/isIPv6String;
# base58Encode.cpp).  IPv6 strings are built from (user_id, event_id) with
# a single zero run, so DuckDB reproduces the RFC 5952 canonical form with
# printf; base58 is verified VALUE-exactly — the oracle performs the bignum
# base-58 division of the same 8-byte integer via unrolled 58^k powers,
# with '1'-padding for leading zero bytes.
@register(
    "fn_ipv6_base58_suite",
    oracle="""
    WITH e AS (SELECT DISTINCT user_id, event_id FROM events WHERE user_id < 10),
    s AS (SELECT user_id, event_id,
                 user_id + 1 AS h1, (event_id % 65535) + 1 AS h2,
                 user_id * 4294967296 + event_id AS n
          FROM e)
    SELECT user_id, event_id,
           printf('2001:db8::%x:%x', h1, h2)  AS ipv6_canon,
           upper('20010db8' || repeat('0', 16) || printf('%04x%04x', h1, h2))
                                              AS ipv6_hex,
           true                               AS is_valid,
           false                              AS is_invalid,
           repeat('1', CAST((16 - length(ltrim(printf('%016x', n), '0'))) // 2 AS INTEGER))
             || ltrim(substr('123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz', CAST((n // 430804206899405824) % 58 AS INTEGER) + 1, 1) || substr('123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz', CAST((n // 7427658739644928) % 58 AS INTEGER) + 1, 1) || substr('123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz', CAST((n // 128063081718016) % 58 AS INTEGER) + 1, 1) || substr('123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz', CAST((n // 2207984167552) % 58 AS INTEGER) + 1, 1) || substr('123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz', CAST((n // 38068692544) % 58 AS INTEGER) + 1, 1) || substr('123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz', CAST((n // 656356768) % 58 AS INTEGER) + 1, 1) || substr('123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz', CAST((n // 11316496) % 58 AS INTEGER) + 1, 1) || substr('123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz', CAST((n // 195112) % 58 AS INTEGER) + 1, 1) || substr('123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz', CAST((n // 3364) % 58 AS INTEGER) + 1, 1) || substr('123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz', CAST((n // 58) % 58 AS INTEGER) + 1, 1) || substr('123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz', CAST((n // 1) % 58 AS INTEGER) + 1, 1), '1')          AS b58,
           true                               AS b58_roundtrip
    FROM s
    """,
)
def fn_ipv6_base58_suite(spark: SparkSession, sf: str) -> DataFrame:
    ev = _t(spark, sf, "events").filter(F.col("user_id") < 10)
    ids = ev.select("user_id", "event_id").distinct()
    h1 = F.col("user_id") + 1
    h2 = (F.col("event_id") % 65535) + 1
    n = F.col("user_id").cast("long") * 4294967296 + F.col("event_id")
    full = F.format_string("2001:db8:0:0:0:0:%x:%x", h1, h2)
    packed = ch("IPv6StringToNum", full)
    bytes8 = F.unhex(F.lpad(F.hex(n), 16, "0"))
    b58 = ch("base58Encode", bytes8)
    return ids.select(
        "user_id",
        "event_id",
        ch("IPv6NumToString", packed).alias("ipv6_canon"),
        F.hex(packed).alias("ipv6_hex"),
        ch("isIPv6String", full).alias("is_valid"),
        ch("isIPv6String", F.lit("2001::db8::1")).alias("is_invalid"),
        b58.alias("b58"),
        (ch("base58Decode", b58) == bytes8).alias("b58_roundtrip"),
    )


# ------------------------- conversion Or-variants / codecs / case-expr
# (FunctionsConversion.h try-parse forms, bitmaskToList.cpp,
# caseWithExpression.cpp, URL decodeURLComponent)
@register(
    "fn_conv_suite",
    oracle="""
    WITH d AS (SELECT DISTINCT user_id AS k FROM events WHERE user_id < 200)
    SELECT k,
           try_cast(CAST(k AS VARCHAR) AS BIGINT)        AS i_ok,
           try_cast('x' || CAST(k AS VARCHAR) AS BIGINT) AS i_bad,
           coalesce(try_cast(CASE WHEN k % 2 = 0 THEN '1.5' ELSE 'bad' END
                             AS DOUBLE), 0.0)            AS f_zero,
           try_cast('2024-03-15' AS DATE)                AS d_ok,
           coalesce(array_to_string(list_filter(list_transform(range(0, 63),
             i -> CASE WHEN (((k % 64) >> CAST(i AS INTEGER)) & 1) = 1
                  THEN CAST((CAST(1 AS BIGINT) << CAST(i AS INTEGER)) AS VARCHAR)
                  END), x -> x IS NOT NULL), ','), '')   AS bml,
           CASE k % 3 WHEN 0 THEN 'zero' WHEN 1 THEN 'one'
                ELSE 'many' END                          AS cwe,
           replace(replace('a%20b%26' || CAST(k AS VARCHAR), '%20', ' '),
                   '%26', '&')                           AS urld
    FROM d
    """,
)
def fn_conv_suite(spark: SparkSession, sf: str) -> DataFrame:
    ev = _t(spark, sf, "events").filter(F.col("user_id") < 200)
    d = ev.select(F.col("user_id").alias("k")).distinct()
    k = F.col("k")
    ks = k.cast("string")
    return d.select(
        k,
        ch("toInt64OrNull", ks).alias("i_ok"),
        ch("toInt64OrNull", F.concat(F.lit("x"), ks)).alias("i_bad"),
        ch(
            "toFloat64OrZero",
            F.when(k % 2 == 0, F.lit("1.5")).otherwise(F.lit("bad")),
        ).alias("f_zero"),
        ch("toDateOrNull", F.lit("2024-03-15")).alias("d_ok"),
        ch("bitmaskToList", k % 64).alias("bml"),
        ch("caseWithExpression", k % 3, 0, F.lit("zero"), 1, F.lit("one"),
           F.lit("many")).alias("cwe"),
        ch("decodeURLComponent", F.concat(F.lit("a%20b%26"), ks)).alias("urld"),
    )


# ------------------- string distances (FunctionsStringDistance.cpp:
# editDistance, byteHammingDistance, stringJaccardIndex).  Pairs = cross
# of distinct event types (bounded alphabet); hamming compares rpad-equal
# strings (DuckDB's hamming requires equal lengths, CH adds the length
# delta — padding makes both agree).
@register(
    "fn_strdist_suite",
    oracle="""
    WITH t AS (SELECT DISTINCT event_type AS s FROM events)
    SELECT a.s AS s1, b.s AS s2,
           levenshtein(a.s, b.s) AS lev,
           CAST(hamming(rpad(a.s, 10, '#'), rpad(b.s, 10, '#')) AS BIGINT)
             AS ham10,
           round(jaccard(a.s, b.s), 6) AS jac,
           round(jaro_winkler_similarity(a.s, b.s), 6) AS jw
    FROM t a CROSS JOIN t b
    """,
)
def fn_strdist_suite(spark: SparkSession, sf: str) -> DataFrame:
    ev = _t(spark, sf, "events")
    t = ev.select(F.col("event_type").alias("s")).distinct()
    a = t.select(F.col("s").alias("s1"))
    b = t.select(F.col("s").alias("s2"))
    pairs = a.crossJoin(b)
    return pairs.select(
        "s1",
        "s2",
        ch("editDistance", F.col("s1"), F.col("s2")).cast("long").alias("lev"),
        ch(
            "byteHammingDistance",
            F.rpad(F.col("s1"), 10, "#"),
            F.rpad(F.col("s2"), 10, "#"),
        ).alias("ham10"),
        F.round(ch("stringJaccardIndex", F.col("s1"), F.col("s2")), 6).alias("jac"),
        F.round(ch("jaroWinklerSimilarity", F.col("s1"), F.col("s2")), 6).alias("jw"),
    )


# ------------------- round-5 exact-name parity suite (multiSearch family,
# numeric conversion variants, XML codecs, countMatches, vector norms —
# the name sweep diffed against the reference's registered names)
@register(
    "fn_parity_suite",
    oracle="""
    WITH d AS (SELECT DISTINCT user_id, event_type, value FROM events
               WHERE user_id < 30)
    SELECT user_id, event_type, round(value, 4) AS value,
           (contains(event_type, 'ick') OR contains(event_type, 'chase'))
             AS msa,
           CAST(CASE WHEN contains(event_type, 'view') THEN 1
                     WHEN contains(event_type, 'ick') THEN 2
                     WHEN contains(event_type, 'chase') THEN 3
                     ELSE 0 END AS BIGINT) AS msi,
           CAST(user_id % 200 AS SMALLINT) + 1 AS u8,
           try_cast(event_type AS SMALLINT)    AS i16n,
           round(5 * value * value, 4)         AS l2sq,
           replace(replace(event_type || '<' || CAST(user_id AS VARCHAR) || '>',
                   '<', '&lt;'), '>', '&gt;')  AS xml,
           CAST(length(regexp_replace(event_type, '[^aeiou]', '', 'g'))
                AS INTEGER)                    AS vowels
    FROM d
    """,
)
def fn_parity_suite(spark: SparkSession, sf: str) -> DataFrame:
    ev = _t(spark, sf, "events").filter(F.col("user_id") < 30)
    d = ev.select("user_id", "event_type", "value").distinct()
    et = F.col("event_type")
    return d.select(
        "user_id",
        "event_type",
        F.round("value", 4).alias("value"),
        ch("multiSearchAny", et, ["ick", "chase"]).alias("msa"),
        ch("multiSearchFirstIndex", et, ["view", "ick", "chase"]).alias("msi"),
        (ch("toUInt8", (F.col("user_id") % 200).cast("string")) + 1).alias("u8"),
        ch("toInt16OrNull", et).alias("i16n"),
        F.round(
            ch("L2SquaredNorm", F.array(F.col("value"), 2 * F.col("value"))), 4
        ).alias("l2sq"),
        ch(
            "encodeXMLComponent",
            F.concat(et, F.lit("<"), F.col("user_id").cast("string"), F.lit(">")),
        ).alias("xml"),
        ch("countMatches", et, "[aeiou]").alias("vowels"),
    )


# ------------------------------------------- round-6 parity extension
# MySQL/date compat batch (registry_ext.py groups 1-2; reference
# IFunctionMySql wrappers, DateLUTImpl toRelative*Num, FunctionsConversion
# unix64 helpers, FunctionAppVersionCompare.h).
@register(
    "fn_mysql_time_suite",
    oracle="""
    SELECT o_orderkey AS okey,
           CAST((dayofweek(o_orderdate) + 6) % 7 AS BIGINT)      AS wd,
           CAST(dayofweek(o_orderdate) + 1 AS BIGINT)            AS dow_mysql,
           CAST(date_diff('day', DATE '1970-01-01',
                          CAST(o_orderdate AS DATE)) + 719528 AS BIGINT) AS tdays,
           CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS rel_month,
           CAST((date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
                 + 8 - isodow(o_orderdate)) // 7 AS BIGINT)      AS rel_week,
           CAST(year(o_orderdate) * 10000000000
                + month(o_orderdate) * 100000000
                + day(o_orderdate) * 1000000
                + hour(o_orderdate) * 10000
                + minute(o_orderdate) * 100
                + second(o_orderdate) AS BIGINT)                 AS ymdhms,
           CAST(day(o_orderdate) * 100 + hour(o_orderdate) AS BIGINT) AS day_hour,
           CAST(hour(o_orderdate) * 3600 + minute(o_orderdate) * 60
                + second(o_orderdate) AS BIGINT)                 AS t2s,
           printf('%02d:%02d:%02d', (o_orderkey % 90000) // 3600,
                  ((o_orderkey % 90000) // 60) % 60,
                  (o_orderkey % 90000) % 60)                     AS s2t,
           CAST(epoch_ms(o_orderdate) AS BIGINT)                 AS unix_ms,
           strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')            AS adaptive,
           CAST(CASE WHEN o_orderkey % 4 > 2 THEN 1
                     WHEN o_orderkey % 4 < 2 THEN 0
                     WHEN o_orderkey % 10 > 5 THEN 1
                     WHEN o_orderkey % 10 < 5 THEN 0
                     WHEN o_orderkey % 3 > 1 THEN 1 ELSE 0 END AS INT) AS vcmp,
           CAST(CASE WHEN o_orderpriority < '3-MEDIUM' THEN -1
                     WHEN o_orderpriority > '3-MEDIUM' THEN 1
                     ELSE 0 END AS INT)                          AS scmp,
           CAST(CASE o_orderstatus WHEN 'O' THEN 1 WHEN 'F' THEN 2
                WHEN 'P' THEN 3 ELSE 0 END AS BIGINT)            AS fis,
           printf('%.2f', o_totalprice)                          AS decs,
           strftime(o_orderdate, '%Y-%m-%d')                     AS pdt
    FROM orders WHERE o_orderkey % 7 = 0
    """,
)
def fn_mysql_time_suite(spark: SparkSession, sf: str) -> DataFrame:
    od = _t(spark, sf, "orders").filter(F.col("o_orderkey") % 7 == 0)
    d = F.col("o_orderdate")
    k = F.col("o_orderkey")
    ver = F.concat_ws(".", (k % 4).cast("string"), (k % 10).cast("string"),
                      (k % 3).cast("string"))
    return od.select(
        k.alias("okey"),
        ch("WEEKDAY", d).cast("long").alias("wd"),
        ch("DAYOFWEEK", d).cast("long").alias("dow_mysql"),
        ch("to_days", d).alias("tdays"),
        ch("toRelativeMonthNum", d).alias("rel_month"),
        ch("toRelativeWeekNum", d).alias("rel_week"),
        ch("toYYYYMMDDhhmmss", d).alias("ymdhms"),
        ch("toDayHour", d).alias("day_hour"),
        ch("time_to_sec", d).alias("t2s"),
        ch("sec_to_time", k % 90000).alias("s2t"),
        ch("toUnixTimestamp64Milli", d).alias("unix_ms"),
        F.date_format(ch("FROM_UNIXTIME_ADAPTIVE", F.unix_timestamp(d)),
                      "yyyy-MM-dd HH:mm:ss").alias("adaptive"),
        ch("versionCompare", ver, F.lit("2.5.1"), ">").alias("vcmp"),
        ch("strcmp", F.col("o_orderpriority"), F.lit("3-MEDIUM")).cast("int")
        .alias("scmp"),
        ch("find_in_set", F.col("o_orderstatus"), F.lit("O,F,P")).alias("fis"),
        ch("toDecimalString", F.col("o_totalprice"), 2).alias("decs"),
        F.date_format(
            ch("parseDateTime", ch("formatDateTime", d, "%Y-%m-%d"), "%Y-%m-%d"),
            "yyyy-MM-dd",
        ).alias("pdt"),
    )


# Vector norm/distance family (registry_ext batch 2; reference
# array/arrayNorm.cpp + arrayDistance.cpp kernels) + mortonEncode
# (mortonEncode.cpp, bit layout pinned by mortonEncode(1,2,3)=53).
@register(
    "fn_vector_suite",
    oracle="""
    WITH e AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS a,
             list_reverse(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS b
      FROM embeddings WHERE vec_id % 13 = 0
    )
    SELECT vec_id,
           round(sqrt(list_sum(list_transform(a, x -> x * x))), 4)   AS l2,
           round(list_sum(list_transform(a, x -> abs(x))), 4)        AS l1,
           round(list_max(list_transform(a, x -> abs(x))), 4)        AS linf,
           round(list_sum(list_transform(range(1, len(a) + 1),
                                         i -> a[i] * b[i])), 4)      AS dot,
           round(1.0 - list_sum(list_transform(range(1, len(a) + 1),
                                               i -> a[i] * b[i]))
                 / (sqrt(list_sum(list_transform(a, x -> x * x)))
                    * sqrt(list_sum(list_transform(b, x -> x * x)))), 6) AS cosd,
           round(a[1] / sqrt(list_sum(list_transform(a, x -> x * x))), 6) AS n2_first,
           CAST(list_sum(list_transform(range(0, 10),
                i -> (((o_x >> i) & 1) << (2 * i))
                     | (((o_y >> i) & 1) << (2 * i + 1)))) AS BIGINT) AS morton
    FROM (SELECT *, vec_id % 1024 AS o_x, (vec_id * 7) % 1024 AS o_y FROM e)
    """,
)
def fn_vector_suite(spark: SparkSession, sf: str) -> DataFrame:
    em = _t(spark, sf, "embeddings").filter(F.col("vec_id") % 13 == 0)
    a = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    b = F.reverse(a)
    return em.select(
        "vec_id",
        F.round(ch("L2Norm", a), 4).alias("l2"),
        F.round(ch("L1Norm", a), 4).alias("l1"),
        F.round(ch("LinfNorm", a), 4).alias("linf"),
        F.round(ch("dotProduct", a, b), 4).alias("dot"),
        F.round(ch("cosineDistance", a, b), 6).alias("cosd"),
        F.round(
            F.try_element_at(ch("normalizeL2", a), F.lit(1)), 6
        ).alias("n2_first"),
        ch("mortonEncode", F.col("vec_id") % 1024, (F.col("vec_id") * 7) % 1024)
        .alias("morton"),
    )


# ---------------------------------------------------------------------------
# round-7 geo-index suites (functions/geo_index.py)
# ---------------------------------------------------------------------------

def _h3_oracle_sql() -> str:
    """DuckDB recomputation of the H3 bit layout from the same integer
    seeds: both engines construct the index arithmetically; Spark then
    RE-EXTRACTS every property from the BITS via the registry functions
    while the oracle derives them from the construction formulas — a
    genuine cross-check of the bit math."""
    digit = "CASE WHEN {r} <= res THEN (seed + {r}) % 7 ELSE 7 END"
    h_terms = " + ".join(
        f"(({digit.format(r=r)}) * {1 << (45 - 3 * r)})" for r in range(1, 16)
    )
    # first nonzero digit among d1..d_res (NULL if all zero)
    lead = "coalesce(" + ", ".join(
        f"nullif(CASE WHEN {r} <= res THEN (seed + {r}) % 7 END, 0)"
        for r in range(1, 6)
    ) + ")"
    import math

    from byconity_spark.functions.geo_index import _H3_EARTH_R_KM

    # EXACTLY the constant _h3_hex_area_km2 folds into its plan, so the
    # floor() on both sides sees bit-identical doubles
    sphere_over_120 = (
        4.0 * math.pi * _H3_EARTH_R_KM * _H3_EARTH_R_KM / 120.0
    )
    return f"""
    WITH s AS (
      SELECT CAST(n_nationkey AS BIGINT) AS seed,
             CAST((n_nationkey % 5) + 1 AS BIGINT)   AS res,
             CAST((n_nationkey * 7) % 122 AS BIGINT) AS bc
      FROM nation
    ),
    hx AS (
      SELECT seed, res, bc,
             {1 << 59} + res * {1 << 52} + bc * {1 << 45} + {h_terms} AS h,
             ({lead}) AS lead,
             bc IN (4,14,24,38,49,58,63,72,83,97,107,117) AS pent_bc
      FROM s
    ),
    p AS (
      SELECT seed, res, bc, h, lead, pent_bc,
             (pent_bc AND lead IS NULL)                         AS pent,
             NOT (pent_bc AND lead = 1)                         AS valid
      FROM hx
    )
    SELECT seed,
           printf('%x', h)                                      AS h3_hex,
           CAST(res AS BIGINT)                                  AS res_out,
           CAST(bc AS BIGINT)                                   AS bc_out,
           CAST(CASE WHEN valid THEN 1 ELSE 0 END AS BIGINT)    AS valid,
           CAST(CASE WHEN pent THEN 1 ELSE 0 END AS BIGINT)     AS pent,
           CAST(res % 2 AS BIGINT)                              AS class3,
           printf('%x', (h | (({1 << 45} / power(8, res - 1))::BIGINT - 1))
                        - (res * {1 << 52}) + ((res - 1) * {1 << 52}))
                                                                AS parent_hex,
           CAST(CASE WHEN pent THEN 6 ELSE 7 END AS BIGINT)     AS nkids,
           CAST(CASE WHEN pent THEN 5 ELSE 6 END AS BIGINT)     AS nedges,
           CAST(2 + 120 * power(7, res) AS BIGINT)              AS numhex,
           CAST(floor({sphere_over_120!r} / power(7, res) * 1000) AS BIGINT)
                                                                AS area_milli,
           CAST(1 AS BIGINT)                                    AS origin_ok,
           CAST(CASE WHEN valid THEN 1 ELSE 0 END AS BIGINT)    AS edge_valid
    FROM p ORDER BY seed
    """


@register("fn_h3_suite", oracle=_h3_oracle_sql())
def fn_h3_suite(spark: SparkSession, sf: str) -> DataFrame:
    """H3 index-math family (src/Functions/h3*.cpp; geo_index.py): both
    sides construct the same indexes arithmetically from n_nationkey; the
    Spark side re-derives resolution / base cell / validity / pentagon
    rule / parent / children / edge counts from the BITS via the registry
    while the oracle derives them from the construction formulas."""
    n = _t(spark, sf, "nation")
    seed = F.col("n_nationkey").cast("long")
    res = (seed % 5 + 1).cast("int")
    bc = (seed * 7) % 122
    h = F.lit(1 << 59) + res.cast("long") * F.lit(1 << 52) + bc * F.lit(1 << 45)
    for r in range(1, 16):
        d = F.when(F.lit(r) <= res, (seed + r) % 7).otherwise(F.lit(7))
        h = h + d * F.lit(1 << (45 - 3 * r))
    h = h.cast("long")
    df = n.select(
        seed.alias("seed"), res.alias("__res"), h.alias("__h")
    )
    hh = F.col("__h")
    first_edge = F.element_at(
        ch("h3GetUnidirectionalEdgesFromHexagon", hh), 1
    )
    return df.select(
        "seed",
        ch("h3ToString", hh).alias("h3_hex"),
        ch("h3GetResolution", hh).cast("long").alias("res_out"),
        ch("h3GetBaseCell", hh).cast("long").alias("bc_out"),
        ch("h3IsValid", hh).cast("long").alias("valid"),
        ch("h3IsPentagon", hh).cast("long").alias("pent"),
        ch("h3IsResClassIII", hh).cast("long").alias("class3"),
        ch("h3ToString",
           ch("h3ToParent", hh, F.col("__res") - 1)).alias("parent_hex"),
        F.size(ch("h3ToChildren", hh, F.col("__res") + 1))
        .cast("long").alias("nkids"),
        F.size(ch("h3GetUnidirectionalEdgesFromHexagon", hh))
        .cast("long").alias("nedges"),
        ch("h3NumHexagons", F.col("__res")).alias("numhex"),
        F.floor(ch("h3HexAreaKm2", F.col("__res")) * 1000)
        .cast("long").alias("area_milli"),
        (ch("h3GetOriginIndexFromUnidirectionalEdge", first_edge) == hh)
        .cast("long").alias("origin_ok"),
        ch("h3UnidirectionalEdgeIsValid", first_edge)
        .cast("long").alias("edge_valid"),
    ).orderBy("seed")


def _s2_oracle_sql() -> str:
    """DuckDB re-implementation of the full S2 leaf-cell pipeline — cube
    face, quadratic st<->uv, and the 30-level Hilbert walk as a recursive
    CTE over the same canonical tables (independent second
    implementation, not a shared code path)."""
    from byconity_spark.functions.geo_index import _IJ_TO_POS

    arms = " ".join(
        f"WHEN orient = {o} AND ijb = {ij} THEN {int(_IJ_TO_POS[o, ij])}"
        for o in range(4) for ij in range(4)
    )
    return f"""
    WITH RECURSIVE pts AS (
      SELECT n_nationkey AS seed,
             ((((n_nationkey * 137) % 360) - 180) + 0.5)::DOUBLE AS lon,
             ((((n_nationkey * 83) % 160) - 80) + 0.25)::DOUBLE  AS lat
      FROM nation
    ),
    xyz AS (
      SELECT seed,
             cos(radians(lat)) * cos(radians(lon)) AS x,
             cos(radians(lat)) * sin(radians(lon)) AS y,
             sin(radians(lat))                     AS z
      FROM pts
    ),
    fc AS (
      SELECT seed, x, y, z,
        CASE WHEN abs(x) >= abs(y) AND abs(x) >= abs(z)
               THEN CASE WHEN x < 0 THEN 3 ELSE 0 END
             WHEN abs(y) >= abs(z)
               THEN CASE WHEN y < 0 THEN 4 ELSE 1 END
             ELSE CASE WHEN z < 0 THEN 5 ELSE 2 END END AS face
      FROM xyz
    ),
    uv AS (
      SELECT seed, face,
        CASE face WHEN 0 THEN y/x WHEN 1 THEN -x/y WHEN 2 THEN -x/z
                  WHEN 3 THEN z/x WHEN 4 THEN z/y ELSE -y/z END AS u,
        CASE face WHEN 0 THEN z/x WHEN 1 THEN z/y WHEN 2 THEN -y/z
                  WHEN 3 THEN y/x WHEN 4 THEN -x/y ELSE -x/z END AS v
      FROM fc
    ),
    ij AS (
      SELECT seed, face,
        CAST(least(greatest(floor(1073741824 * (
          CASE WHEN u >= 0 THEN 0.5 * sqrt(1 + 3 * u)
               ELSE 1 - 0.5 * sqrt(1 - 3 * u) END)), 0), 1073741823)
          AS BIGINT) AS i,
        CAST(least(greatest(floor(1073741824 * (
          CASE WHEN v >= 0 THEN 0.5 * sqrt(1 + 3 * v)
               ELSE 1 - 0.5 * sqrt(1 - 3 * v) END)), 0), 1073741823)
          AS BIGINT) AS j
      FROM uv
    ),
    walk AS (
      SELECT seed, face, i, j, 0 AS lvl, face % 2 AS orient,
             CAST(0 AS BIGINT) AS pos
      FROM ij
      UNION ALL
      SELECT seed, face, i, j, lvl + 1,
             xor(orient, CASE p WHEN 0 THEN 1 WHEN 3 THEN 3 ELSE 0 END),
             pos * 4 + p
      FROM (
        SELECT *, CASE {arms} END AS p
        FROM (
          SELECT *, ((i >> (29 - lvl)) & 1) * 2 + ((j >> (29 - lvl)) & 1)
                      AS ijb
          FROM walk WHERE lvl < 30
        ) t1
      ) t2
    ),
    leaf AS (
      SELECT seed,
        CAST(CASE WHEN hid >= 9223372036854775808::HUGEINT
                  THEN hid - 18446744073709551616::HUGEINT ELSE hid END
             AS BIGINT) AS s2_id
      FROM (
        SELECT seed,
               face::HUGEINT * 2305843009213693952::HUGEINT
                 + pos::HUGEINT * 2 + 1 AS hid
        FROM walk WHERE lvl = 30
      ) t3
    )
    SELECT seed, s2_id,
           ((s2_id & -1099511627776) | 1099511627776) AS parent10,
           CAST(1 AS BIGINT) AS isect_parent,
           CAST(0 AS BIGINT) AS isect_next
    FROM leaf ORDER BY seed
    """


@register("fn_s2_suite", oracle=_s2_oracle_sql())
def fn_s2_suite(spark: SparkSession, sf: str) -> DataFrame:
    """S2 cell-id family (src/Functions/geoToS2.cpp, s2*.cpp;
    geo_index.py): per-nation synthetic coordinates -> leaf cell id.  The
    oracle recomputes the ENTIRE pipeline (cube face, quadratic
    projection, 30-level Hilbert walk) as a DuckDB recursive CTE — an
    independent second implementation of the spec.  parent10 is the
    level-10 ancestor by lsb bit math; the intersect flags exercise
    s2CellsIntersect against the parent (true) and the next seed's
    distant cell (false)."""
    n = _t(spark, sf, "nation")
    seed = F.col("n_nationkey").cast("long")
    lon = (((seed * 137) % 360) - 180 + F.lit(0.5)).cast("double")
    lat = (((seed * 83) % 160) - 80 + F.lit(0.25)).cast("double")
    lsb10 = 1 << 40
    df = n.select(
        seed.alias("seed"),
        ch("geoToS2", lon, lat).alias("s2_id"),
    )
    parent10 = (
        F.col("s2_id").bitwiseAND(F.lit(-lsb10)).bitwiseOR(F.lit(lsb10))
    )
    w = df.select(
        "seed", "s2_id", parent10.alias("parent10"),
        F.lead("s2_id", 1).over(_W.orderBy("seed")).alias("__next"),
    )
    return w.select(
        "seed", "s2_id", "parent10",
        ch("s2CellsIntersect", F.col("s2_id"), F.col("parent10"))
        .cast("long").alias("isect_parent"),
        F.coalesce(
            ch("s2CellsIntersect", F.col("s2_id"), F.col("__next"))
            .cast("long"),
            F.lit(0),
        ).alias("isect_next"),
    ).orderBy("seed")


@register(
    "fn_round7_suite",
    oracle="""
    WITH d AS (
      SELECT doc_id, text,
             lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS norm
      FROM documents
    ),
    t AS (
      SELECT doc_id, text, string_split(norm, ' ') AS toks,
             'https://www.ex' || doc_id || '.com/p?a=' || doc_id || '&b=2'
               AS url,
             (doc_id % 23) AS hh, (doc_id % 59) AS mm
      FROM d
    ),
    sc AS (
      SELECT *,
        len(list_filter(toks, w -> w IN ('the','and','of','a','in','to','is')))
          AS s_en,
        len(list_filter(toks, w -> w IN ('el','la','de','que','y','los')))
          AS s_es,
        len(list_filter(toks, w -> w IN ('der','die','das','und','ist','ein')))
          AS s_de,
        len(list_filter(toks, w -> w IN ('le','la','et','les','des','une')))
          AS s_fr,
        len(list_filter(tone_toks, w -> w IN
          ('good','great','excellent','love','happy','best','wonderful',
           'amazing','nice','perfect','awesome','fantastic','enjoy',
           'beautiful','win','success','improve','like'))) AS s_pos,
        len(list_filter(tone_toks, w -> w IN
          ('bad','terrible','hate','awful','worst','horrible','poor','fail',
           'sad','angry','wrong','broken','ugly','lose','problem','annoy',
           'disappoint'))) AS s_neg,
        len(tone_toks) AS n_tone
      FROM (SELECT *, regexp_extract_all(lower(text), '[a-z'']+') AS tone_toks
            FROM t) tt
    )
    SELECT doc_id,
           CASE WHEN s_en + s_es + s_de + s_fr = 0 THEN 'un'
                WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
                WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
                WHEN s_de >= s_fr THEN 'de' ELSE 'fr' END AS lang_det,
           CAST(floor(greatest(-1.0, least(1.0,
             (s_pos - s_neg) / greatest(n_tone, 1)::DOUBLE * 5.0))
             * 1000) AS BIGINT)                            AS tone_m,
           CASE WHEN regexp_matches(text, '^[\\x00-\\x7F]*$')
                THEN 'US-ASCII' ELSE 'UTF-8' END            AS charset,
           substr(nfc_normalize('e' || chr(769) || text), 1, 1) AS nfc_prefix,
           regexp_extract(url,
             '^(?:[a-zA-Z][a-zA-Z0-9+.-]*:)?//([^/?#]*)', 1) AS net,
           array_to_string(list_transform(
             string_split(regexp_extract(url, '\\?(.*)$', 1), '&'),
             kv -> string_split(kv, '=')[1]), ',')          AS pnames,
           CAST(hh * 3600 + mm * 60 AS DOUBLE)              AS delta_s,
           lpad(CAST(doc_id AS VARCHAR), 8, '0')            AS padded,
           printf('%o', length(text))                       AS oct_len,
           ascii(substr(text, 1, 1))                        AS first_code,
           CAST(length(text) AS BIGINT)                     AS nchars,
           substr(text, 1, 2) || '<>' || substr(text, 5, 5)  AS spliced
    FROM sc ORDER BY doc_id
    """,
)
def fn_round7_suite(spark: SparkSession, sf: str) -> DataFrame:
    """Round-7 parity batch end-to-end (registry_ext7.py): language /
    tonality / charset heuristics, NFC normalization, netloc + URL-param
    names, parseTimeDelta, and the Spark-dialect + MySQL alias names —
    every projected column re-derived independently in DuckDB."""
    d = _t(spark, sf, "documents")
    text = F.col("text")
    url = F.concat(
        F.lit("https://www.ex"), F.col("doc_id"),
        F.lit(".com/p?a="), F.col("doc_id"), F.lit("&b=2"),
    )
    hh, mm = F.col("doc_id") % 23, F.col("doc_id") % 59
    delta_str = F.concat(hh, F.lit("h "), mm, F.lit("m"))
    return d.select(
        "doc_id",
        ch("detectLanguage", text).alias("lang_det"),
        F.floor(ch("detectTonality", text) * 1000)
        .cast("long").alias("tone_m"),
        ch("detectCharset", text).alias("charset"),
        F.substring(
            ch("normalizeUTF8NFC",
               F.concat(F.lit("e"), F.lit("́"), text)), 1, 1
        ).alias("nfc_prefix"),
        ch("netloc", url).alias("net"),
        F.concat_ws(",", ch("extractURLParameterNames", url)).alias("pnames"),
        ch("parseTimeDelta", delta_str).alias("delta_s"),
        ch("lpad", F.col("doc_id").cast("string"), 8, "0").alias("padded"),
        ch("oct", F.length(text)).alias("oct_len"),
        ch("ord", F.substring(text, 1, 1)).cast("int").alias("first_code"),
        ch("CHAR_LENGTH", text).alias("nchars"),
        ch("insert", F.substring(text, 1, 9), F.lit(3), F.lit(2),
           F.lit("<>")).alias("spliced"),
    ).orderBy("doc_id")


@register(
    "agg_round7_suite",
    oracle="""
    WITH e AS (
      SELECT event_type,
             user_id % 100 AS dur, user_id % 7 AS depth, user_id % 2 AS jmp,
             user_id % 5 AS pos, CAST(event_id AS BIGINT) AS v
      FROM events WHERE user_id < 60
    ),
    slot AS (
      SELECT event_type, pos, max(v) AS mv FROM e GROUP BY event_type, pos
    ),
    ins AS (
      SELECT event_type, array_to_string(
        [coalesce(max(CASE WHEN pos = 0 THEN mv END), -1),
         coalesce(max(CASE WHEN pos = 1 THEN mv END), -1),
         coalesce(max(CASE WHEN pos = 2 THEN mv END), -1),
         coalesce(max(CASE WHEN pos = 3 THEN mv END), -1),
         coalesce(max(CASE WHEN pos = 4 THEN mv END), -1)], '|') AS slots
      FROM slot GROUP BY event_type
    )
    SELECT m.event_type,
           m.session_cnt, m.total_dur, m.total_depth, m.total_jump,
           i.slots
    FROM (
      SELECT event_type,
             count(*)                     AS session_cnt,
             CAST(sum(dur) AS BIGINT)     AS total_dur,
             CAST(sum(depth) AS BIGINT)   AS total_depth,
             CAST(sum(jmp) AS BIGINT)     AS total_jump
      FROM e GROUP BY event_type
    ) m JOIN ins i USING (event_type)
    ORDER BY m.event_type
    """,
)
def agg_round7_suite(spark: SparkSession, sf: str) -> DataFrame:
    """sumMetric (AggregateFunctionSessionSplit.h:678 — tuple-in,
    counters-tuple-out) + parametric groupArrayInsertAt driven through
    ch_agg by NAME, against a conditional-aggregate DuckDB oracle.  The
    InsertAt slots use max-per-slot (the deterministic keeper) so the
    distributed collect order cannot change the answer."""
    from byconity_spark.functions import ch_agg
    from byconity_spark.workloads._arrays import arr_str

    ev = _t(spark, sf, "events").filter(F.col("user_id") < 60)
    e = ev.select(
        "event_type",
        (F.col("user_id") % 100).alias("dur"),
        (F.col("user_id") % 7).alias("depth"),
        (F.col("user_id") % 2).alias("jmp"),
        (F.col("user_id") % 5).cast("int").alias("pos"),
        F.col("event_id").cast("long").alias("v"),
    )
    metric = e.groupBy("event_type").agg(
        ch_agg("sumMetric", F.col("dur"), F.col("depth"), F.col("jmp"))
        .alias("m")
    )
    slots = e.groupBy("event_type", "pos").agg(F.max("v").alias("mv"))
    ins = slots.groupBy("event_type").agg(
        arr_str(
            ch_agg("groupArrayInsertAt", -1, 5)(F.col("mv"), F.col("pos"))
        ).alias("slots")
    )
    return (
        metric.join(ins, "event_type")
        .select(
            "event_type",
            F.col("m.session_cnt").alias("session_cnt"),
            F.col("m.total_dur").alias("total_dur"),
            F.col("m.total_depth").alias("total_depth"),
            F.col("m.total_jump").alias("total_jump"),
            "slots",
        )
        .orderBy("event_type")
    )


@register(
    "fn_round7b_suite",
    oracle="""
    WITH o AS (
      SELECT o_orderkey AS k, o_custkey, o_totalprice, o_orderdate
      FROM orders WHERE o_orderkey < 2000
    )
    SELECT k,
           (k % 10) // 4                                    AS hr,
           k % 8                                            AS bkt,
           least((k % 16) // 4, 3)                          AS bktr,
           CAST(len(list_filter([1000, 5000, 20000],
                b -> b <= floor(o_totalprice))) AS BIGINT)  AS bbs,
           CAST(len(list_filter([15, 17, 30, 44, 200],
                b -> (k % 250) >= b)) AS BIGINT)            AS iv,
           CASE k % 4 WHEN 0 THEN 'OK' WHEN 1 THEN 'UNKNOWN_TABLE'
                WHEN 2 THEN '' ELSE 'TABLE_ALREADY_EXISTS' END AS ec,
           'm' || (k % 3)                                   AS mc,
           'k' || k                                         AS mk,
           strftime(o_orderdate, '%Y%m%d')                  AS pid,
           o_custkey || '-' || (k % 5)                      AS pid2,
           CAST(CAST(o_orderdate AS TIMESTAMP)
                + INTERVAL 1 DAY + INTERVAL 2 HOUR AS VARCHAR) AS ati,
           strftime(CAST(o_orderdate AS TIMESTAMP)
                + INTERVAL 2 HOUR, '%H:%M:%S')              AS tt,
           '5.7.0'                                          AS gv,
           CAST(floor(o_totalprice) AS BIGINT)              AS cast_i64,
           ((k % 5) + (k % 7)) || '|' ||
             ((k % 7) + (k % 11) + (k % 13))                AS arr_sums
    FROM o ORDER BY k
    """,
)
def fn_round7b_suite(spark: SparkSession, sf: str) -> DataFrame:
    """Round-7 second-pass parity batch end-to-end (registry_ext7b.py):
    sharding math (hashRange hashRange.cpp:29, bucket FunctionBucket.h:34,
    bucket_bounds_search), MySQL INTERVAL, errorCodeToName, the ByteMap
    implicit-name helpers (MapHelpers.cpp), partitionId
    (MergeTreePartition.cpp:283), interval-tuple arithmetic, toTimeType,
    globalVariable, the CAST alias, and arrayReduceInRanges — every
    column re-derived independently in DuckDB."""
    o = _t(spark, sf, "orders").filter(F.col("o_orderkey") < 2000)
    k = F.col("o_orderkey")
    impl_name = F.concat(
        F.lit("__m"), (k % 3).cast("string"),
        F.lit("__'k"), k.cast("string"), F.lit("'.bin"),
    )
    ts = F.col("o_orderdate").cast("timestamp")
    code = (
        F.when(k % 4 == 0, 0)
        .when(k % 4 == 1, 60)
        .when(k % 4 == 2, 999999)
        .otherwise(57)
    )
    red = ch(
        "arrayReduceInRanges", "sum",
        F.array(F.array(F.lit(1), F.lit(2)), F.array(F.lit(2), F.lit(3))),
        F.array(k % 5, k % 7, k % 11, k % 13),
    )
    return o.select(
        k.alias("k"),
        ch("hashRange", k, 10, 3).alias("hr"),
        ch("bucket", k, 8).alias("bkt"),
        ch("bucket", k, 4, 1, 16).alias("bktr"),
        ch(
            "bucket_bounds_search",
            F.array(F.lit(1000), F.lit(5000), F.lit(20000)),
            F.floor(F.col("o_totalprice")),
        ).cast("long").alias("bbs"),
        ch("interval", k % 250, 15, 17, 30, 44, 200)
        .cast("long").alias("iv"),
        ch("errorCodeToName", code).alias("ec"),
        ch("extractMapColumn", impl_name).alias("mc"),
        ch("extractMapKey", impl_name).alias("mk"),
        ch("partitionId", F.col("o_orderdate")).alias("pid"),
        ch("partitionId", F.col("o_custkey"), k % 5).alias("pid2"),
        ch("addTupleOfIntervals", ts, "1 DAY", "2 HOUR")
        .cast("string").alias("ati"),
        ch("toTimeType", ts + F.expr("INTERVAL 2 HOUR")).alias("tt"),
        ch("globalVariable", "version").alias("gv"),
        ch("CAST", F.col("o_totalprice"), "Int64").alias("cast_i64"),
        F.concat_ws(
            "|",
            F.transform(red, lambda x: x.cast("long").cast("string")),
        ).alias("arr_sums"),
    ).orderBy("k")


@register(
    "fn_textsearch_suite",
    oracle="""
    WITH d AS (
      SELECT doc_id, text, lang,
             regexp_extract_all(lower(text), '[a-z0-9_]+') AS toks
      FROM documents
    )
    SELECT doc_id,
           CAST(CASE WHEN list_contains(toks, 'the')
                       OR list_contains(toks, 'data')
                THEN 1 ELSE 0 END AS BIGINT)                 AS ts_or,
           CAST(CASE WHEN list_contains(toks, 'data')
                      AND NOT list_contains(toks, 'qwertyzz')
                THEN 1 ELSE 0 END AS BIGINT)                 AS ts_andnot,
           'AND(VAL(a), OR(VAL(b), NOT(VAL(c))))'            AS q_render,
           CAST(CASE WHEN len(list_intersect(toks, ['data', 'model'])) > 0
                THEN 1 ELSE 0 END AS BIGINT)                 AS set_check,
           coalesce(array_to_string(
             list_filter(toks, t -> list_contains(['data', 'model'], t)),
             '|'), '')                                       AS set_get,
           coalesce(list_filter(toks,
             t -> list_contains(['data', 'model'], t))[1], '') AS set_any,
           'a=' || doc_id || ',b=' || lang                   AS tnv
    FROM d ORDER BY doc_id
    """,
)
def fn_textsearch_suite(spark: SparkSession, sf: str) -> DataFrame:
    """Text-search query pair (Common/TextSreachQuery.h, tsquery.cpp) and
    array-set probes (arraySetCheck/Get/GetAny arraySetCheck.cpp:23) over
    the documents corpus, plus tupleToNameValuePairs — the textSearch
    evaluation here is the REAL boolean fold (the reference's scalar is an
    index placeholder, DOCUMENTED superset)."""
    d = _t(spark, sf, "documents")
    toks = F.expr("regexp_extract_all(lower(text), '[a-z0-9_]+', 0)")
    sset = F.array(F.lit("data"), F.lit("model"))
    tup = F.named_struct(
        F.lit("a"), F.col("doc_id").cast("string"),
        F.lit("b"), F.col("lang"),
    )
    return d.select(
        "doc_id",
        ch("textSearch", F.col("text"), "the | data")
        .cast("long").alias("ts_or"),
        ch("textSearch", F.col("text"), "data & !qwertyzz")
        .cast("long").alias("ts_andnot"),
        ch("toTextSearchQuery", F.lit("a & (b | !c)")).alias("q_render"),
        ch("arraySetCheck", toks, sset).cast("long").alias("set_check"),
        F.concat_ws("|", ch("arraySetGet", toks, sset)).alias("set_get"),
        F.coalesce(ch("arraySetGetAny", toks, sset), F.lit(""))
        .alias("set_any"),
        F.concat_ws(
            ",",
            F.transform(
                ch("tupleToNameValuePairs", tup),
                lambda e: F.concat(e["key"], F.lit("="), e["value"]),
            ),
        ).alias("tnv"),
    ).orderBy("doc_id")


@register(
    "fn_bayes_ab",
    oracle="""
    WITH counts AS (
      SELECT event_type, count(*) AS x,
             sum(CASE WHEN value > 50 THEN 1 ELSE 0 END) AS y
      FROM events WHERE user_id < 200 AND event_type IN ('click', 'view')
      GROUP BY event_type
    ),
    p AS (
      SELECT
        (SELECT x FROM counts WHERE event_type = 'click') AS cx,
        (SELECT y FROM counts WHERE event_type = 'click') AS cy,
        (SELECT x FROM counts WHERE event_type = 'view') AS vx,
        (SELECT y FROM counts WHERE event_type = 'view') AS vy
    ),
    ab AS (
      SELECT cx, cy, vx, vy,
             1.0 + vy AS av, 1.0 + vx - vy AS bv,
             1.0 + cy AS ac, 1.0 + cx - cy AS bc
      FROM p
    ),
    prob AS (
      SELECT cx, cy, vx, vy,
             sum(exp(
               (lgamma(ac + i) + lgamma(bv + bc) - lgamma(ac + i + bv + bc))
               - ln(bv + i)
               - (lgamma(1 + i) + lgamma(bv) - lgamma(1 + i + bv))
               - (lgamma(ac) + lgamma(bc) - lgamma(ac + bc))
             )) AS pv
      FROM ab CROSS JOIN generate_series(0, 2000000) t(i)
      WHERE i <= CAST(av AS BIGINT) - 1
      GROUP BY cx, cy, vx, vy
    )
    SELECT CAST(cx AS BIGINT) AS control_x, CAST(cy AS BIGINT) AS control_y,
           CAST(vx AS BIGINT) AS variant_x, CAST(vy AS BIGINT) AS variant_y,
           CAST(floor(pv * 10000 + 0.5) AS BIGINT)       AS v_beats_ctl_4dp,
           CAST(floor((1 - pv) * 10000 + 0.5) AS BIGINT) AS c_best_4dp,
           CAST(floor(pv * 10000 + 0.5) AS BIGINT)       AS v_best_4dp
    FROM prob
    """,
)
def fn_bayes_ab(spark: SparkSession, sf: str) -> DataFrame:
    """bayesAB (abtesting.cpp) certified cross-engine: conversion counts
    come from the events table, the win probability is the EXACT
    closed-form Beta race integral (the reference Monte-Carlo-samples it —
    DOCUMENTED METHOD DEVIATION), and DuckDB re-derives the same sum with
    lgamma + generate_series.  The 2-row count collect is driver-side by
    design (aggregate-to-literal, like the stats-collection paths)."""
    ev = _t(spark, sf, "events").filter(
        (F.col("user_id") < 200)
        & F.col("event_type").isin("click", "view")
    )
    agg = ev.groupBy("event_type").agg(
        F.count("*").alias("x"),
        F.sum(F.when(F.col("value") > 50, 1).otherwise(0)).alias("y"),
    )
    rows = {r["event_type"]: (int(r["x"]), int(r["y"])) for r in agg.collect()}
    cx, cy = rows["click"]
    vx, vy = rows["view"]
    col = ch("bayesAB", "beta", 1, ["click", "view"], [cx, vx], [cy, vy])

    def dp4(path: str):
        return F.floor(
            F.get_json_object(col, path).cast("double") * 10000 + F.lit(0.5)
        ).cast("long")

    return spark.range(1).select(
        F.lit(cx).cast("long").alias("control_x"),
        F.lit(cy).cast("long").alias("control_y"),
        F.lit(vx).cast("long").alias("variant_x"),
        F.lit(vy).cast("long").alias("variant_y"),
        dp4("$.data[1].beats_control").alias("v_beats_ctl_4dp"),
        dp4("$.data[0].to_be_best").alias("c_best_4dp"),
        dp4("$.data[1].to_be_best").alias("v_best_4dp"),
    )


# --------------------------------------------------------------- BLAKE3
@register(
    "fn_blake3_vectors",
    oracle="""
    SELECT * FROM (VALUES
      ('test_1', '0c673da1ef75d2daa895483138340f041881ea975d57c1435d487f454a111b74'),
      ('test_2', '007ed777b7a1cba08d37bda339efabb42fa460d953070779903125b0f4d5fb5f'),
      ('test_3', 'e25232688e2a4d3a55174decb33815a27b2a92dc8839e3cda456105c259bb071'),
      ('',       'af1349b9f5f9a1a6a0404dea36dcc9499bcb25c9adc112b7cc9a93cae41f3262')
    ) AS t(input, digest) ORDER BY input
    """,
)
def fn_blake3_vectors(spark: SparkSession, sf: str) -> DataFrame:
    """BLAKE3 (FunctionsHashing.h) against EXTERNAL ground truth only: the
    reference repo's own expected digests
    (tests/queries/0_stateless/02456_BLAKE3_hash_function_test.reference)
    plus the published empty-input digest — never this repo's output fed
    back to itself.  Multi-block/multi-chunk tree shapes are exercised
    spec-faithfully in tests/test_registry_ext7b.py."""
    rows = _local_df(spark, 
        [("test_1",), ("test_2",), ("test_3",), ("",)], "input string"
    )
    return rows.select("input", ch("BLAKE3", F.col("input")).alias("digest")).orderBy(
        "input"
    )


_LBS_HAV = (
    "2*6371007.180918475*asin(sqrt(pow(sin(radians(({PLAT} - {LAT}))/2),2)"
    " + cos(radians({LAT}))*cos(radians({PLAT}))"
    "*pow(sin(radians(({PLON} - {LON}))/2),2)))"
)
_LBS_D2 = (
    "(pow((radians({PLON}) - radians(lon)) * 6370996.81"
    " * cos((radians(lat) + radians({PLAT}))/2), 2)"
    " + pow((radians({PLAT}) - radians(lat)) * 6370996.81, 2))"
)
# longlatOffset (addressFilter.cpp:38-45): corner constants — the SQL text
# mirrors the Python float op order in geo_filters._lbs_bbox exactly
_LBS_BOX = (
    "{PLON} + {D}*sin(pi()/4*5)/(6371.393*1000.0*cos(radians({PLAT}))*2*pi())*360 AS {P}_x0, "
    "{PLAT} + {D}*cos(pi()/4*5)/(6371.393*1000.0*2*pi())*360 AS {P}_y0, "
    "{PLON} + {D}*sin(pi()/4)/(6371.393*1000.0*cos(radians({PLAT}))*2*pi())*360 AS {P}_x1, "
    "{PLAT} + {D}*cos(pi()/4)/(6371.393*1000.0*2*pi())*360 AS {P}_y1"
)


def _lbs_oracle_sql() -> str:
    hav = _LBS_HAV
    d_p1 = hav.format(PLON="2.35", PLAT="48.85", LON="lon", LAT="lat")
    d_p2 = hav.format(PLON="2.35", PLAT="48.85", LON="lon2", LAT="lat2")
    d_n1 = hav.format(PLON="(-74.0)", PLAT="40.7", LON="lon", LAT="lat")
    d_n2 = hav.format(PLON="(-74.0)", PLAT="40.7", LON="lon2", LAT="lat2")
    box = ", ".join([
        _LBS_BOX.format(PLON="2.35", PLAT="48.85",
                        D="(2000000.0*sqrt(2))", P="pm"),
        _LBS_BOX.format(PLON="(-74.0)", PLAT="40.7",
                        D="(2000000.0*sqrt(2))", P="nm"),
        _LBS_BOX.format(PLON="2.35", PLAT="48.85",
                        D="(2000000.0*sqrt(2))", P="po"),
        _LBS_BOX.format(PLON="2.35", PLAT="48.85", D="2000000.0", P="pi"),
        _LBS_BOX.format(PLON="139.69", PLAT="35.68",
                        D="(3000000.0*sqrt(2))", P="to"),
        _LBS_BOX.format(PLON="139.69", PLAT="35.68", D="3000000.0", P="ti"),
    ])
    d2_p = _LBS_D2.format(PLON="2.35", PLAT="48.85")
    d2_n = _LBS_D2.format(PLON="(-74.0)", PLAT="40.7")
    d2_t = _LBS_D2.format(PLON="139.69", PLAT="35.68")
    return f"""
    WITH pts AS (
      SELECT c_custkey, c_nationkey,
             (((c_custkey * 7) % 360) - 180 + 0.25)::DOUBLE AS lon,
             ((c_custkey % 180) - 90 + 0.5)::DOUBLE         AS lat
      FROM customer
    ),
    c2 AS (
      SELECT *, lon + 1.5 AS lon2, lat - 1.0 AS lat2,
             (lon + 1.5 >= -180 AND lon + 1.5 <= 180
              AND lat - 1.0 >= -90 AND lat - 1.0 <= 90) AS v2
      FROM pts
    ),
    k AS (SELECT {box}),
    d AS (
      SELECT c2.*, k.*,
             {d_p1} AS dp1, {d_p2} AS dp2,
             {d_n1} AS dn1, {d_n2} AS dn2,
             {d2_p} AS q2p, {d2_n} AS q2n, {d2_t} AS q2t
      FROM c2, k
    )
    SELECT c_custkey,
      CASE WHEN dp1 <= 3000000.0 OR (v2 AND dp2 <= 3000000.0)
           THEN 1 ELSE 0 END AS in_bc,
      CASE WHEN dp1 <= 3000000.0 OR (v2 AND dp2 <= 3000000.0)
             OR dn1 <= 4000000.0 OR (v2 AND dn2 <= 4000000.0)
           THEN 1 ELSE 0 END AS in_bc2,
      CASE WHEN (lon >= pm_x0 AND lon <= pm_x1 AND lat >= pm_y0
                 AND lat <= pm_y1 AND q2p <= 2000000.0*2000000.0)
             OR (lon >= nm_x0 AND lon <= nm_x1 AND lat >= nm_y0
                 AND lat <= nm_y1 AND q2n <= 2000000.0*2000000.0)
           THEN 1 ELSE 0 END AS maf,
      CASE WHEN (lon >= pi_x0 AND lon <= pi_x1 AND lat >= pi_y0 AND lat <= pi_y1)
             OR (lon >= po_x0 AND lon <= po_x1 AND lat >= po_y0
                 AND lat <= po_y1 AND q2p <= 2000000.0*2000000.0)
             OR (lon >= ti_x0 AND lon <= ti_x1 AND lat >= ti_y0 AND lat <= ti_y1)
             OR (lon >= to_x0 AND lon <= to_x1 AND lat >= to_y0
                 AND lat <= to_y1 AND q2t <= 3000000.0*3000000.0)
           THEN 1 ELSE 0 END AS mamdf,
      concat_ws('|', c_nationkey::VARCHAR, c_nationkey::VARCHAR,
                c_nationkey::VARCHAR, c_nationkey::VARCHAR) AS rep_tags
    FROM d
    """


@register("fn_lbs_filter_suite", oracle=_lbs_oracle_sql())
def fn_lbs_filter_suite(spark: SparkSession, sf: str) -> DataFrame:
    """LBS geo-filter family (functions/geo_filters.py): inBusinessCircle /
    inBusinessCircle2 (greatCircleDistance.cpp:346-495 — any array point in
    a haversine circle, NULL/out-of-range points skipped), multiAddressFilter
    / multiAddressMultiDistanceFilter (addressFilter.cpp:68-300 — bbox
    prefilter + equirectangular distance, inner-box short-circuit), and the
    replicate array internal (replicate.h:14).  The point arrays carry one
    NULL and one out-of-range entry on purpose — the oracle only credits the
    two valid candidates, so skip semantics are value-checked."""
    c = _t(spark, sf, "customer")
    lon = (((F.col("c_custkey") * 7) % 360) - 180 + F.lit(0.25)).cast("double")
    lat = ((F.col("c_custkey") % 180) - 90 + F.lit(0.5)).cast("double")
    lon_arr = F.array(lon, lon + 1.5, F.lit(None).cast("double"), F.lit(200.0))
    lat_arr = F.array(lat, lat - 1.0, lat, F.lit(95.0))
    return c.select(
        "c_custkey",
        ch("inBusinessCircle", 3000000.0, 2.35, 48.85, lon_arr, lat_arr)
        .alias("in_bc"),
        ch("inBusinessCircle2", lon_arr, lat_arr,
           3000000.0, 2.35, 48.85, 4000000.0, -74.0, 40.7).alias("in_bc2"),
        ch("multiAddressFilter", lon, lat, 2000000.0,
           2.35, 48.85, -74.0, 40.7).alias("maf"),
        ch("multiAddressMultiDistanceFilter", lon, lat,
           2000000.0, 2.35, 48.85, 3000000.0, 139.69, 35.68).alias("mamdf"),
        arr_str(ch("replicate", F.col("c_nationkey"), lon_arr))
        .alias("rep_tags"),
    )


@register(
    "fn_hash_exact_vectors",
    oracle="""
    SELECT CAST(-7286425919675154353 AS BIGINT) AS city_empty,
           CAST(-5067632665394241483 AS BIGINT) AS city_u32,
           CAST(1599722731594796935 AS BIGINT) AS city_ipv6,
           CAST(3151614220437955012 AS BIGINT) AS city_multi,
           CAST(-6728778887698311270 AS BIGINT) AS sip_u32,
           CAST(5715546585361069049 AS BIGINT) AS ih64_ipv4,
           CAST(3152671896 AS BIGINT) AS ih32_ipv4,
           CAST(1452224150530656417 AS BIGINT) AS hmd5_u32,
           CAST(96354 AS BIGINT) AS hive_abc
    """,
)
def fn_hash_exact_vectors(spark: SparkSession, sf: str) -> DataFrame:
    """strict_hash_compat exact hashes (functions/hash_exact.py) against
    EXTERNAL ground truth: the reference's own test outputs
    (4_cnch_stateless/00751_hashing_ints.reference, 00259_hashing_tuples,
    0_stateless/02184_hash_functions_and_ip_types.reference) — the oracle
    is those published numbers as signed BIGINT, never this engine's own
    output fed back.  Covers cityHash64 string/numeric/multi-arg combine,
    sipHash64, intHash64/intHash32, halfMD5 and hiveHash."""
    from byconity_spark.functions.registry import set_strict_hash_compat

    row = _local_df(spark, 
        [("", "abc", 123456, 0x01020304)], "s string, t string, v int, ip int"
    )
    set_strict_hash_compat(True)
    try:
        out = row.select(
            ch("cityHash64", F.col("s")).alias("city_empty"),
            ch("cityHash64", F.col("v")).alias("city_u32"),
            ch("cityHash64",
               F.unhex(F.lit("fe8000000000000000625afffed1daf0")))
            .alias("city_ipv6"),
            ch("cityHash64", F.lit(1).cast("tinyint"),
               F.lit(2).cast("tinyint"), F.col("s")).alias("city_multi"),
            ch("sipHash64", F.col("v")).alias("sip_u32"),
            ch("intHash64", F.col("ip")).alias("ih64_ipv4"),
            ch("intHash32", F.col("ip")).alias("ih32_ipv4"),
            ch("halfMD5", F.col("v")).alias("hmd5_u32"),
            ch("hiveHash", F.col("t")).alias("hive_abc"),
        )
    finally:
        set_strict_hash_compat(False)
    return out
