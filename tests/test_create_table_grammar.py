"""CREATE TABLE clause parser + SET acceptance + dialect tail
(round-8: the round-7 judge sweep showed the reference's own stateless
tests failing on `ORDER BY tuple()`, INDEX/ALIAS/SETTINGS clauses, SET of
real Settings.h names, the CH ternary, and inline expression aliases —
each shape here is lifted from a named sweep file)."""

from __future__ import annotations

import pytest

from byconity_spark.frontend import ch_sql
from byconity_spark.frontend.sql import (
    ChSqlError,
    _SESSION_SETTINGS,
    _SESSION_TABLE_INDEXES,
    _SESSION_TABLE_SETTINGS,
)


@pytest.fixture(autouse=True)
def _clean(spark):
    yield
    for t in ("g_ppl", "g_idx", "g_defs", "g_nst", "g_null", "g_ins",
              "mann_whitney_test", "memory_tbl"):
        ch_sql(spark, f"DROP TABLE IF EXISTS {t}")
    _SESSION_SETTINGS.clear()


def test_order_by_tuple_and_settings_tail(spark):
    """00116/0xxxx shapes: ORDER BY tuple() is the single most common DDL
    idiom in the reference's tests (245 files)."""
    ch_sql(spark, "CREATE TABLE g_ppl (id Int, dep String) "
                  "ENGINE = CnchMergeTree() ORDER BY tuple()")
    ch_sql(spark, "INSERT INTO g_ppl VALUES (1, 'x')")
    assert ch_sql(spark, "SELECT * FROM g_ppl").collect()[0][0] == 1
    # lowercase, no '=', SETTINGS tail (insub shape)
    ch_sql(spark, "create table g_ins (i int, j int) engine CnchMergeTree "
                  "order by i settings index_granularity = 1")
    assert _SESSION_TABLE_SETTINGS["g_ins"] == {"index_granularity": "1"}


def test_expression_keys_and_sample_by(spark):
    ch_sql(spark, "CREATE TABLE mann_whitney_test (left Float64, right "
                  "UInt8) ENGINE = CnchMergeTree order by tuple()")
    ch_sql(spark, "CREATE TABLE g_idx (uid UInt32, date Date, t Int64) "
                  "ENGINE = CnchMergeTree PARTITION BY date "
                  "PRIMARY KEY intHash32(uid) "
                  "ORDER BY (intHash32(uid), t) SAMPLE BY intHash32(uid)")
    ch_sql(spark, "INSERT INTO g_idx VALUES (1, '2024-01-01', 5)")
    assert ch_sql(spark, "SELECT t FROM g_idx").collect()[0][0] == 5


def test_index_declaration_in_column_list(spark):
    """01056_negative_with_bloom_filter shape."""
    ch_sql(spark, "CREATE TABLE g_idx (`int8` Int8, `int16` Int16, "
                  "INDEX idx (`int8`, `int16`) TYPE bloom_filter(0.01) "
                  "GRANULARITY 1) ENGINE = CnchMergeTree() ORDER BY `int8`")
    assert _SESSION_TABLE_INDEXES["g_idx"][0].name == "idx"
    ch_sql(spark, "INSERT INTO g_idx VALUES (-1, -300)")
    assert ch_sql(spark, "SELECT `int8` FROM g_idx").collect()[0][0] == -1


def test_default_materialized_alias_visibility(spark):
    """46012_deterministic / 01521_max_length_alias shapes: SELECT *
    shows ordinary + DEFAULT only; MATERIALIZED computes at INSERT;
    ALIAS computes on read."""
    ch_sql(spark, "CREATE TABLE g_defs (a Int32, b Int32 DEFAULT a * 2, "
                  "m Int64 MATERIALIZED a + 100, al ALIAS a + b) "
                  "ENGINE = CnchMergeTree ORDER BY a")
    ch_sql(spark, "INSERT INTO g_defs (a) VALUES (5)")
    ch_sql(spark, "INSERT INTO g_defs VALUES (1, 7)")
    star = ch_sql(spark, "SELECT * FROM g_defs ORDER BY a").collect()
    assert [tuple(r) for r in star] == [(1, 7), (5, 10)]  # no m, no al
    mat = ch_sql(spark, "SELECT a, m FROM g_defs ORDER BY a").collect()
    assert [tuple(r) for r in mat] == [(1, 101), (5, 105)]
    al = ch_sql(spark, "SELECT a, al FROM g_defs ORDER BY a").collect()
    assert [tuple(r) for r in al] == [(1, 8), (5, 15)]


def test_dotted_nested_and_composite_types(spark):
    """00013_create_table_with_arrays / dotted Nested names."""
    ch_sql(spark, "CREATE TABLE g_nst (`c.d` Array(Date), "
                  "t Tuple(String, UInt8), m Map(String, Int64), d Date) "
                  "ENGINE = CnchMergeTree PARTITION BY (toDate(d)) "
                  "ORDER BY d")
    st = spark.table("g_nst").schema.simpleString()
    assert "c.d:array<date>" in st and "map<string,bigint>" in st


def test_insert_column_subset_fills_type_defaults(spark):
    """00159_whitespace_in_columns_list shape: INSERT INTO t (x) — CH
    fills omitted columns with the TYPE default (0 / ''), not NULL."""
    ch_sql(spark, "CREATE TABLE memory_tbl (x UInt32, y String) "
                  "ENGINE = Memory")
    ch_sql(spark, "INSERT INTO memory_tbl (x) VALUES (2)")
    row = ch_sql(spark, "SELECT * FROM memory_tbl").collect()[0]
    assert (row["x"], row["y"]) == (2, "")


def test_null_engine_discards_inserts(spark):
    ch_sql(spark, "CREATE TABLE g_null (x Int64) ENGINE = Null")
    ch_sql(spark, "INSERT INTO g_null VALUES (1)")
    assert ch_sql(spark, "SELECT count(*) AS c FROM g_null").collect()[0][
        "c"] == 0


def test_set_accepts_reference_settings(spark):
    """enable_optimizer / dialect_type / max_block_size aborted reference
    tests on statement one (469 files contain SET)."""
    ch_sql(spark, "SET enable_optimizer = 0")
    ch_sql(spark, "SET dialect_type = 'ANSI', max_block_size = 65536")
    ch_sql(spark, "SET max_threads = 8")
    ch_sql(spark, "SET any_join_distinct_right_table_keys = 1")
    got = {
        r["name"]: r["value"]
        for r in ch_sql(spark, "SHOW SETTINGS LIKE '%'").collect()
    }
    assert got["dialect_type"] == "ANSI"
    assert got["enable_optimizer"] == "0"
    with pytest.raises(ChSqlError, match="unknown setting"):
        ch_sql(spark, "SET not_a_real_setting_name = 1")


def test_enforced_settings_keep_semantics(spark):
    """max_result_rows must still ENFORCE, not record-and-ignore."""
    ch_sql(spark, "SET max_result_rows = 2, result_overflow_mode = 'break'")
    try:
        got = ch_sql(spark, "SELECT number FROM numbers(100)").collect()
        assert len(got) == 2
    finally:
        ch_sql(spark, "SET max_result_rows = 0")


def test_ch_ternary_operator(spark):
    """00129_quantile_timing_weighted shape."""
    r = ch_sql(spark, "SELECT number AS t, number = 2 ? 10 : 1 AS w "
                      "FROM numbers(4)").collect()
    assert [x["w"] for x in r] == [1, 1, 10, 1]
    r = ch_sql(spark, "SELECT number = 0 ? 'a' : number = 1 ? 'b' : 'c' "
                      "AS x FROM numbers(3)").collect()
    assert [x["x"] for x in r] == ["a", "b", "c"]


def test_inline_expression_alias(spark):
    """00149_function_url_hash shape: an alias declared inside one call,
    referenced by a later expression."""
    r = ch_sql(spark, "select URLHash('http://ya.ru' as url) = "
                      "URLHash(appendTrailingCharIfAbsent(url, '/')) AS ok"
               ).collect()
    assert r[0]["ok"] is True
    # CAST's AS is untouched; subquery SELECT-item aliases are untouched
    r = ch_sql(spark, "SELECT CAST(3.9 AS Int64) AS c, v "
                      "FROM (SELECT 1 AS v)").collect()
    assert tuple(r[0]) == (3, 1)


def test_arrayjoin_inside_subquery(spark):
    """00451 / 00169 shapes, plus CH first-table ambiguity resolution and
    bare USING lists."""
    r = ch_sql(spark, "SELECT arr, element FROM (SELECT arrayJoin("
                      "[emptyArrayUInt8(), [1], [2, 3]]) AS arr) "
                      "LEFT ARRAY JOIN arr AS element").collect()
    assert len(r) == 4  # [] -> one NULL row, [1] -> 1, [2,3] -> 2
    r = ch_sql(spark, """SELECT key1, key2, table_1 FROM
        (SELECT arrayJoin([1, 2, 3]) AS key1, 0 AS key2, 999 AS table_1) js1
        ALL INNER JOIN
        (SELECT arrayJoin([1, 3, 2]) AS key1, 0 AS key2, 999 AS table_1) js2
        USING key2, key1""").collect()
    assert sorted(x["key1"] for x in r) == [1, 2, 3]


def test_tuple_column_values_insert(spark):
    """00520_tuple_values_interpreter: a single Tuple column's VALUES row
    is a tuple LITERAL, not a multi-column row."""
    ch_sql(spark, "DROP TABLE IF EXISTS g_tup")
    ch_sql(spark, "CREATE TABLE g_tup (t Tuple(Date, UInt32, UInt64)) "
                  "ENGINE = CnchMergeTree ORDER BY t")
    ch_sql(spark, "INSERT INTO g_tup VALUES "
                  "((concat('2000', '-01-01'), 12+3, 45+6))")
    ch_sql(spark, "INSERT INTO g_tup VALUES (('2000-01-01', 123, 456))")
    rows = ch_sql(spark, "SELECT * FROM g_tup ORDER BY t").collect()
    assert [tuple(r["t"]) for r in rows] == [
        (__import__("datetime").date(2000, 1, 1), 15, 51),
        (__import__("datetime").date(2000, 1, 1), 123, 456),
    ]
    ch_sql(spark, "DROP TABLE g_tup")


def test_insert_case_insensitive_columns(spark):
    """60104 mysql-dialect shape: column names resolve case-insensitively
    when no exact match exists."""
    ch_sql(spark, "CREATE TABLE g_ppl (event_date Date, event_type String)"
                  " ENGINE = CnchMergeTree ORDER BY tuple()")
    ch_sql(spark, "INSERT INTO g_ppl (EVENT_date, EVENT_TYPE) "
                  "VALUES ('2024-01-01', 'x')")
    r = ch_sql(spark, "SELECT * FROM g_ppl").collect()[0]
    assert str(r["event_date"]) == "2024-01-01" and r["event_type"] == "x"


def test_values_table_function_with_alias(spark):
    """00978_table_function_values_alias."""
    r = ch_sql(
        spark,
        r"SELECT x, s, z FROM VALUES('x UInt64, s String, "
        r"z ALIAS concat(toString(x), \': \', s)', "
        r"(1, 'hello'), (2, 'world'))",
    ).collect()
    assert [tuple(row) for row in r] == [
        (1, "hello", "1: hello"), (2, "world", "2: world"),
    ]


def test_ranking_frame_stripped_and_use_system(spark):
    r = ch_sql(spark, "SELECT rank() OVER (ORDER BY b ROWS BETWEEN "
                      "UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS r "
                      "FROM (SELECT 2 AS b)").collect()
    assert r[0]["r"] == 1
    ch_sql(spark, "USE system")
    try:
        assert ch_sql(spark, "SELECT dummy FROM one").collect()[0][
            "dummy"] == 0
    finally:
        ch_sql(spark, "USE default")


def test_parts_to_throw_insert_guard(spark):
    """Reference MergeTreeData::delayInsertOrThrowIfNeeded (error 252):
    a table opting in via SETTINGS parts_to_throw_insert rejects inserts
    once accumulated parts exceed the threshold; OPTIMIZE FINAL compacts
    (01603_insert_select_too_many_parts shape)."""
    ch_sql(spark, "DROP TABLE IF EXISTS g_parts")
    ch_sql(spark, "CREATE TABLE g_parts (d Date, x UInt64) "
                  "ENGINE = CnchMergeTree PARTITION BY d ORDER BY x "
                  "SETTINGS parts_to_throw_insert = 5")
    ch_sql(spark, "SET max_block_size = 1")
    try:
        ch_sql(spark, "INSERT INTO g_parts SELECT '2024-01-01', number "
                      "FROM numbers(10)")
        with pytest.raises(ChSqlError, match="TOO_MANY_PARTS"):
            ch_sql(spark, "INSERT INTO g_parts SELECT '2024-01-01', "
                          "number FROM numbers(10)")
        ch_sql(spark, "OPTIMIZE TABLE g_parts FINAL")
        ch_sql(spark, "INSERT INTO g_parts SELECT '2024-01-02', number "
                      "FROM numbers(3)")  # compacted: allowed again
    finally:
        ch_sql(spark, "SET max_block_size = 65409")
        ch_sql(spark, "DROP TABLE g_parts")


def test_gcd_rejects_float_literals(spark):
    """Reference gcd/lcm take integers only (ILLEGAL_TYPE_OF_ARGUMENT) —
    00515_gcd_lcm marks the float form serverError."""
    with pytest.raises(ChSqlError, match="ILLEGAL_TYPE_OF_ARGUMENT"):
        ch_sql(spark, "select gcd(1280.1, 1024.1)")
    r = ch_sql(spark, "SELECT gcd(12, 18) AS g, lcm(4, 6) AS l").collect()
    assert (r[0]["g"], r[0]["l"]) == (6, 12)


def test_misc_dialect_functions(spark):
    r = ch_sql(spark, "SELECT OCT(12) AS o, equals(1, 1) AS e, "
                      "intDiv(1, CAST(NULL, 'Nullable(Float32)')) AS i, "
                      "next_day('2019-09-09', 1) AS nd, "
                      "length(buildId()) >= 16 AS b").collect()[0]
    assert r["o"] == "14" and r["e"] is True and r["i"] is None
    # next_day renders at DateTime64(3) scale like the reference (02033)
    assert str(r["nd"]) == "2019-09-16 00:00:00.000" and r["b"] is True
