"""Round-12 dialect surface, oracle-checked end-to-end: the date-shift
type-preservation fix (FunctionDateOrDateTimeAddInterval.h — Date in →
Date out), intDivOrZero overflow (intDivOrZero.cpp), empty-set
aggregate defaults (AggregateFunctionNull adaptor, 00572/01528),
ClickHouse-dialect ROLLUP key defaults + totals-last ordering (00701),
read-time partition TTL pruning (00976/01947/10109), the AES
encrypt family (FunctionsAES.h, clean-room kernel), typed JSONExtract
(01915), multi-array arraySplit (01015), epoch+timezone toDateTime
(40037) and the DateTime64 clamp rendering (01702).

Scale shape: everything here is parse-time rewrites plus per-row JVM
expressions; the only Python kernel (AES) handles constant-width
function-surface payloads."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from byconity_spark.engine.catalog import register_views
from byconity_spark.frontend import ch_sql
from byconity_spark.workloads import register


@register(
    "chsql_date_shift",
    oracle="""
    SELECT l_orderkey AS k, l_linenumber AS ln,
           CAST(CAST(l_shipdate AS DATE) - INTERVAL 2 MONTH AS DATE) AS m,
           CAST(CAST(l_shipdate AS DATE) + INTERVAL 5 DAY AS DATE) AS d,
           CAST(CAST(l_shipdate AS DATE) AS TIMESTAMP)
               + INTERVAL 6 HOUR AS h,
           l_shipdate + INTERVAL 1 YEAR AS y
    FROM lineitem WHERE l_orderkey < 100 ORDER BY k, ln
    """,
)
def chsql_date_shift(spark: SparkSession, sf: str) -> DataFrame:
    """add*/subtract* keep the argument's type: Date in -> Date out for
    month/day units, DateTime for hour units (the r11 regression —
    FunctionDateOrDateTimeAddInterval.h)."""
    register_views(spark, sf)
    return ch_sql(
        spark,
        "SELECT l_orderkey AS k, l_linenumber AS ln, "
        "subtractMonths(toDate(l_shipdate), 2) AS m, "
        "addDays(toDate(l_shipdate), 5) AS d, "
        "addHours(toDate(l_shipdate), 6) AS h, "
        "addYears(toDateTime(l_shipdate), 1) AS y "
        "FROM lineitem WHERE l_orderkey < 100 ORDER BY k, ln",
    )


@register(
    "chsql_int_div_zero",
    oracle="""
    SELECT l_orderkey AS k,
           0 AS a, 0 AS b, 127 AS e,
           CAST(l_orderkey // 7 AS BIGINT) AS c,
           CAST(0 AS BIGINT) AS d
    FROM lineitem WHERE l_orderkey < 60 ORDER BY k
    """,
)
def chsql_int_div_zero(spark: SparkSession, sf: str) -> DataFrame:
    """intDivOrZero returns 0 on divisor 0 AND on narrow-width overflow
    (-128/-1 at Int8 — intDivOrZero.cpp, golden 00081 line 2)."""
    register_views(spark, sf)
    return ch_sql(
        spark,
        "SELECT l_orderkey AS k, intDivOrZero(-128, -1) AS a, "
        "intDivOrZero(0, 0) AS b, intDivOrZero(-127, -1) AS e, "
        "intDivOrZero(l_orderkey, 7) AS c, "
        "intDivOrZero(l_orderkey, l_orderkey - l_orderkey) AS d "
        "FROM lineitem WHERE l_orderkey < 60 ORDER BY k",
    )


@register(
    "chsql_empty_set_aggs",
    oracle="""
    SELECT COALESCE(CAST(SUM(l_quantity) AS DOUBLE), 0) AS s,
           CAST('nan' AS DOUBLE) AS a,
           COUNT(l_quantity) AS c
    FROM lineitem WHERE l_quantity < 0
    """,
)
def chsql_empty_set_aggs(spark: SparkSession, sf: str) -> DataFrame:
    """Global aggregation over zero rows: non-Nullable sum() returns 0
    and avg() returns nan where Spark yields NULL (the reference's
    AggregateFunctionNull adaptor only wraps Nullable args — 00572,
    01528)."""
    register_views(spark, sf)
    return ch_sql(
        spark,
        "SELECT sum(l_quantity) AS s, avg(l_quantity) AS a, "
        "count(l_quantity) AS c FROM lineitem WHERE l_quantity < 0",
    )


@register(
    "chsql_rollup_defaults",
    oracle="""
    SELECT * FROM (VALUES
        ('', 0, CAST(120 AS BIGINT), CAST(8 AS BIGINT)),
        ('a', 0, CAST(70 AS BIGINT), CAST(4 AS BIGINT)),
        ('a', 1, CAST(25 AS BIGINT), CAST(2 AS BIGINT)),
        ('a', 2, CAST(45 AS BIGINT), CAST(2 AS BIGINT)),
        ('b', 0, CAST(50 AS BIGINT), CAST(4 AS BIGINT)),
        ('b', 1, CAST(15 AS BIGINT), CAST(2 AS BIGINT)),
        ('b', 2, CAST(35 AS BIGINT), CAST(2 AS BIGINT))
    ) AS t(a, b, ss, c)
    """,
)
def chsql_rollup_defaults(spark: SparkSession, sf: str) -> DataFrame:
    """ClickHouse-dialect ROLLUP renders rolled-up keys as the column
    TYPE DEFAULT ('' / 0), not NULL, and they sort like those values
    (00701_rollup; ANSI dialect keeps NULL — 10720)."""
    register_views(spark, sf)
    ch_sql(spark, "DROP TABLE IF EXISTS r12rollup")
    ch_sql(
        spark,
        "CREATE TABLE r12rollup(a String, b Int32, s Int32) "
        "ENGINE = CnchMergeTree() ORDER BY a",
    )
    ch_sql(
        spark,
        "INSERT INTO r12rollup VALUES ('a', 1, 10), ('a', 1, 15), "
        "('a', 2, 20), ('a', 2, 25), ('b', 1, 10), ('b', 1, 5), "
        "('b', 2, 20), ('b', 2, 15)",
    )
    out = ch_sql(
        spark,
        "SELECT a, b, sum(s) AS ss, count() AS c FROM r12rollup "
        "GROUP BY ROLLUP(a, b) ORDER BY a, b",
    )
    return out


@register(
    "chsql_totals_last",
    oracle="""
    SELECT * FROM (VALUES
        ('a', CAST(3 AS BIGINT)),
        ('b', CAST(3 AS BIGINT)),
        ('', CAST(6 AS BIGINT))
    ) AS t(a, ss)
    """,
)
def chsql_totals_last(spark: SparkSession, sf: str) -> DataFrame:
    """WITH TOTALS emits ONE extra all-rows total carrying type-default
    keys, ordered after the main result regardless of ORDER BY
    (TotalsHavingStep.h; 00701 interplay with rollup defaults)."""
    register_views(spark, sf)
    ch_sql(spark, "DROP TABLE IF EXISTS r12tot")
    ch_sql(
        spark,
        "CREATE TABLE r12tot(a String, s Int32) "
        "ENGINE = CnchMergeTree() ORDER BY a",
    )
    ch_sql(
        spark,
        "INSERT INTO r12tot VALUES ('a', 1), ('a', 2), ('b', 3)",
    )
    return ch_sql(
        spark,
        "SELECT a, sum(s) AS ss FROM r12tot GROUP BY a WITH TOTALS "
        "ORDER BY a",
    )


@register(
    "chsql_ttl_prune_read",
    oracle="""
    SELECT * FROM (VALUES
        (DATE '2024-05-25', 2),
        (DATE '2100-01-01', 3)
    ) AS t(d, id)
    """,
)
def chsql_ttl_prune_read(spark: SparkSession, sf: str) -> DataFrame:
    """Partition-level TTL pruning at READ time: when the TTL
    expression is computable from the partition key, expired
    partitions drop before fetching (MergeTreeDataSelectExecutor;
    00976/01947/10109 — the ttl_now pin keeps the sweep
    deterministic)."""
    register_views(spark, sf)
    ch_sql(spark, "DROP TABLE IF EXISTS r12ttl")
    ch_sql(spark, "SET ttl_now = '2024-06-01 00:00:00'")
    try:
        ch_sql(
            spark,
            "CREATE TABLE r12ttl (d Date, id Int32) "
            "ENGINE = CnchMergeTree PARTITION BY d ORDER BY id "
            "TTL d + INTERVAL 30 DAY",
        )
        ch_sql(
            spark,
            "INSERT INTO r12ttl VALUES ('2024-01-01', 1), "
            "('2024-05-25', 2), ('2100-01-01', 3)",
        )
        # the rewrite inlines the pinned clock as a literal, so the
        # returned plan stays correct after the reset below
        out = ch_sql(spark, "SELECT d, id FROM r12ttl ORDER BY id")
    finally:
        ch_sql(spark, "SET ttl_now = ''")
    return out


@register(
    "chsql_encrypt_vectors",
    oracle="""
    SELECT '49632BBBF30B9D4EE5B5031C1E196534' AS c1,
           'D809AEF45707001DAAA77AAAD8A6D294' AS m1,
           'F7264413A84C0E7CD536867EB9F2173667BA0510262AE487D737EE6298F77E0C'
               AS g1,
           'text' AS rt
    """,
)
def chsql_encrypt_vectors(spark: SparkSession, sf: str) -> DataFrame:
    """encrypt()/aes_encrypt_mysql() against fixed vectors: strict
    AES-128-CBC, MySQL key folding on an over-long ECB key, and the
    OpenSSL demo AES-256-GCM vector with AAD + appended tag
    (FunctionsAES.h; 01318 golden, aes_impl.py kernel validated
    against FIPS-197 and SP 800-38D test vectors)."""
    register_views(spark, sf)
    return ch_sql(
        spark,
        "SELECT hex(encrypt('aes-128-cbc', 'text', "
        "'keykeykeykeykeyk', 'iviviviviviviviv')) AS c1, "
        "hex(aes_encrypt_mysql('aes-128-ecb', 'text', "
        "'keykeykeykeykeykeykeykey')) AS m1, "
        "hex(encrypt('aes-256-gcm', "
        "unhex('f56e87055bc32d0eeb31b2eacc2bf2a5'), "
        "unhex('eebc1f57487f51921c0465665f8ae6d1658bb26de6f8a069"
        "a3520293a572078f'), unhex('99aa3e68ed8173a0eed06684'), "
        "unhex('4d23c3cec334b49bdb370c437fec78de'))) AS g1, "
        "CAST(decrypt('aes-128-cbc', encrypt('aes-128-cbc', 'text', "
        "'keykeykeykeykeyk', 'iviviviviviviviv'), "
        "'keykeykeykeykeyk', 'iviviviviviviviv') AS STRING) AS rt",
    )


@register(
    "chsql_json_extract_typed",
    oracle="""
    SELECT '123' AS ta, '456' AS tb, '[7,8,9]' AS tc,
           CAST(42 AS BIGINT) AS i, CAST(NULL AS VARCHAR) AS s
    """,
)
def chsql_json_extract_typed(spark: SparkSession, sf: str) -> DataFrame:
    """Generic typed JSONExtract (FunctionsJSON.cpp; 01915): Tuple
    field extraction serializes numbers and arrays to their raw JSON
    text when asked for String; Nullable(String) of a JSON null is
    NULL."""
    register_views(spark, sf)
    return ch_sql(
        spark,
        "SELECT JSONExtract('{\"a\": \"123\", \"b\": 456, "
        "\"c\": [7, 8, 9]}', 'Tuple(a String, b String, c String)').a"
        " AS ta, "
        "JSONExtract('{\"a\": \"123\", \"b\": 456, \"c\": [7, 8, 9]}',"
        " 'Tuple(a String, b String, c String)').b AS tb, "
        "JSONExtract('{\"a\": \"123\", \"b\": 456, \"c\": [7, 8, 9]}',"
        " 'Tuple(a String, b String, c String)').c AS tc, "
        "JSONExtract('{\"v\": 42}', 'v', 'Int64') AS i, "
        "JSONExtract('{\"s\": null}', 's', 'Nullable(String)') AS s",
    )


@register(
    "chsql_array_split_multi",
    oracle="""
    SELECT '[[1,2,3],[4,5]]' AS s, '[[1],[2,3,4],[5]]' AS r
    """,
)
def chsql_array_split_multi(spark: SparkSession, sf: str) -> DataFrame:
    """Two-array arraySplit/arrayReverseSplit — the lambda binds one
    parameter per array (array/arraySplit.cpp; 01015 golden).  The
    nested arrays serialize via toString: the driver's hasher cannot
    hash list cells (output contract)."""
    register_views(spark, sf)
    return ch_sql(
        spark,
        "SELECT replaceAll(toString(arraySplit((x, y) -> y, "
        "[1,2,3,4,5], [1,0,0,1,0])), ', ', ',') AS s, "
        "replaceAll(toString(arrayReverseSplit((x, y) -> y, "
        "[1,2,3,4,5], [1,0,0,1,0])), ', ', ',') AS r",
    )


@register(
    "chsql_todatetime_tz",
    oracle="""
    SELECT 8 AS h, TIMESTAMP '2023-01-01 08:00:00' AS t,
           '1940-10-09 21:13:17.6' AS cl,
           '2284-06-04 23:46:43.6' AS ch
    """,
)
def chsql_todatetime_tz(spark: SparkSession, sf: str) -> DataFrame:
    """toDateTime(epoch, tz) renders the epoch AT that zone's wall
    clock (40037), and numeric-string DateTime64 parses clamp with the
    reference's LUT saturation + positive-fraction quirk (01702,
    readDateTime64Text)."""
    register_views(spark, sf)
    return ch_sql(
        spark,
        "SELECT toHour(toDateTime(1672549200, 'Europe/Moscow')) AS h, "
        "toDateTime(1672549200, 'Europe/Moscow') AS t, "
        "toString(toDateTime('-922337203.6854775808', 1, "
        "'Asia/Istanbul')) AS cl, "
        "toString(toDateTime('9922337203.6854775808', 1, "
        "'Asia/Istanbul')) AS ch",
    )
