"""Pinned tests for the round-8 dialect batches 6-7: CH alias
visibility, UInt8 predicates, map storage semantics, GROUPS frames,
untuple, and the error-parity checks measured by tools/ref_sweep.py.

Reference files cited per test (tests/queries/4_cnch_stateless/)."""
from __future__ import annotations

import pytest

from byconity_spark.frontend import ch_sql
from byconity_spark.frontend.sql import ChSqlError


def _vals(df):
    return [tuple(r) for r in df.collect()]


# ------------------------------------------------------ alias visibility

def test_alias_in_where(spark):
    """40073_ansi_better_aliases: a SELECT alias is referenceable from
    WHERE/PREWHERE."""
    r = ch_sql(spark, "SELECT number + 1 AS p FROM numbers(5) WHERE p > 3 "
                      "ORDER BY p").collect()
    assert [x["p"] for x in r] == [4, 5]


def test_alias_prefers_source_column(spark):
    """40073: a real column of the same name wins over the alias."""
    r = ch_sql(spark, "SELECT number + 1 AS number FROM numbers(5) "
                      "WHERE number > 3").collect()
    assert [x["number"] for x in r] == [5]  # filter on SOURCE number=4


def test_sibling_alias_reference(spark):
    """00216_bit_test_function_family: select items reference earlier
    aliases."""
    r = ch_sql(spark, "SELECT number AS n, n * 2 AS d, d + 1 AS e "
                      "FROM numbers(3) ORDER BY n").collect()
    assert [x["e"] for x in r] == [1, 3, 5]


def test_variadic_logic_aliases_in_where(spark):
    """00552_logical_functions_ternary shape: alias + UInt8 AND."""
    r = ch_sql(spark, """
        SELECT xor(x1, x2) AS a, x1 and x2 AS b
        FROM (SELECT toUInt8(number % 2) AS x1,
                     toUInt8(number / 2 % 2) AS x2 FROM numbers(4))
        WHERE a OR b ORDER BY a, b
    """).collect()
    assert len(r) == 3


# ------------------------------------------------------ UInt8 predicates

def test_uint8_where_predicate(spark):
    """53014_inv_standard_token: hasTokens (UInt8) directly in WHERE."""
    r = ch_sql(spark, "SELECT s FROM (SELECT 'hello world' AS s) "
                      "WHERE hasToken(s, 'hello')").collect()
    assert len(r) == 1


def test_lambda_uint8_predicate(spark):
    """00206_empty_array_to_single: arrayFilter(x -> 0, ..)."""
    r = ch_sql(spark, "SELECT arrayFilter(x -> 0, [1, 2, 3]) AS a").collect()
    assert r[0]["a"] == []


def test_bit_test_returns_uint8(spark):
    """00216: bitTestAll(0, 0) = 0 must typecheck (UInt8, not Bool)."""
    r = ch_sql(spark, "SELECT bitTestAll(255, 0, 1) = 1 AS a, "
                      "bitTestAny(0, 0) = 0 AS b").collect()
    assert (r[0]["a"], r[0]["b"]) == (True, True)


# ------------------------------------------------------ map storage

@pytest.fixture()
def map_table(spark):
    ch_sql(spark, "DROP TABLE IF EXISTS t8b_maps")
    ch_sql(spark, "CREATE TABLE t8b_maps (n UInt8, "
                  "bm Map(String, String), km Map(String, String) KV) "
                  "Engine=CnchMergeTree ORDER BY n")
    ch_sql(spark, "insert into t8b_maps values "
                  "(1, {'k1': 'v1', 'k2': 'v2'}, {'a': 'b'})")
    yield "t8b_maps"
    ch_sql(spark, "DROP TABLE IF EXISTS t8b_maps")


def test_implicit_map_access(spark, map_table):
    """00745_merge_tree_map_data_type: col{'key'} form."""
    r = ch_sql(spark, "select bm{'k1'} AS v, bm{'zz'} AS m from t8b_maps"
               ).collect()
    assert (r[0]["v"], r[0]["m"]) == ("v1", None)


def test_get_map_keys_and_kv_rejection(spark, map_table):
    r = ch_sql(spark, "select getMapKeys(currentDatabase(0), 't8b_maps', "
                      "'bm') AS ks").collect()
    assert r[0]["ks"] == ["k1", "k2"]
    with pytest.raises(ChSqlError, match="KV map"):
        ch_sql(spark, "select getMapKeys(currentDatabase(0), 't8b_maps', "
                      "'km')")


def test_clear_map_key(spark, map_table):
    """00745_merge_tree_map_mutation_clear_map_key."""
    ch_sql(spark, "ALTER TABLE t8b_maps clear map key bm('k2')")
    r = ch_sql(spark, "select mapKeys(bm) AS ks from t8b_maps").collect()
    assert r[0]["ks"] == ["k1"]
    with pytest.raises(ChSqlError, match="ILLEGAL_COLUMN"):
        ch_sql(spark, "ALTER TABLE t8b_maps clear map key km('a')")


def test_map_access_without_key_guard(spark, map_table):
    with pytest.raises(ChSqlError, match="NOT_IMPLEMENTED \\(48\\)"):
        ch_sql(spark, "select * from t8b_maps "
                      "settings allow_map_access_without_key = 0")
    # keyed access stays allowed under the setting
    r = ch_sql(spark, "select bm['k1'] AS v from t8b_maps "
                      "settings allow_map_access_without_key = 0").collect()
    assert r[0]["v"] == "v1"


def test_byte_map_column_name_validity(spark):
    """00745_merge_tree_check_column_vadility (error 36)."""
    for ddl in (
        "CREATE TABLE t8b_bad (n UInt8, `__a` String) "
        "Engine=CnchMergeTree ORDER BY n",
        "CREATE TABLE t8b_bad (n UInt8, `a__a` Map(String, String)) "
        "Engine=CnchMergeTree ORDER BY n",
        "CREATE TABLE t8b_bad (n UInt8, a Map(String, Nullable(String))) "
        "Engine=CnchMergeTree ORDER BY n",
    ):
        with pytest.raises(ChSqlError, match="BAD_ARGUMENTS"):
            ch_sql(spark, ddl)


# ------------------------------------------------------ windows / untuple

def test_groups_frame_text_dialect(spark):
    """35414_window_groups_sum_2_preceding_current."""
    r = ch_sql(spark, """
        select a, sum(b) over (partition by a order by b
            groups BETWEEN 1 PRECEDING AND CURRENT ROW) as res
        FROM (SELECT 1 AS a, 10 AS b UNION ALL SELECT 1, 10
              UNION ALL SELECT 1, 20)
        order by a, res
    """).collect()
    # peers {10,10} then {20}: 20, 20, 40
    assert [x["res"] for x in r] == [20, 20, 40]


def test_untuple_literal(spark):
    """01803_untuple_subquery."""
    r = ch_sql(spark, "SELECT untuple(('a', 1)), 2 AS z").collect()
    assert tuple(r[0]) == ("a", 1, 2)


# ------------------------------------------------------ functions

def test_mann_whitney_sql(spark):
    """01560_mann_whitney: exact reference values u=223,
    p=0.5426959774289482."""
    vals = [(310,0),(195,0),(530,0),(155,0),(530,0),(245,0),(385,0),
            (450,0),(465,0),(545,0),(170,0),(180,0),(125,0),(180,0),
            (230,0),(75,0),(430,0),(480,0),(495,0),(295,0),(116,1),
            (171,1),(176,1),(421,1),(111,1),(326,1),(481,1),(111,1),
            (346,1),(441,1),(261,1),(411,1),(206,1),(521,1),(456,1),
            (446,1),(296,1),(51,1),(426,1),(261,1)]
    spark.createDataFrame(
        [(float(v), int(lab)) for v, lab in vals], "l double, r int"
    ).createOrReplaceTempView("t8b_mwu")
    r = ch_sql(spark, "SELECT mannWhitneyUTest(l, r) AS p FROM t8b_mwu"
               ).collect()
    u, p = r[0]["p"]["col1"], r[0]["p"]["col2"]
    assert u == 223.0
    assert abs(p - 0.5426959774289482) < 1e-12
    with pytest.raises(ChSqlError, match="BAD_ARGUMENTS"):
        ch_sql(spark, "SELECT mannWhitneyUTest('two-sided')(1, r) "
                      "FROM t8b_mwu")


def test_geohash_sql_roundtrip(spark):
    """00932_geohash_support."""
    r = ch_sql(spark, "select geohashEncode(-5.60302734375, "
                      "42.593994140625, 0) AS g").collect()
    assert r[0]["g"].startswith("ezs42")
    r2 = ch_sql(spark, "select round(geohashDecode('ezs42').1, 3) AS lon, "
                       "round(geohashDecode('ezs42').2, 3) AS lat").collect()
    assert (r2[0]["lon"], r2[0]["lat"]) == (-5.603, 42.605)
    with pytest.raises(ChSqlError, match="ILLEGAL_COLUMN"):
        ch_sql(spark, "select geohashEncode(1.0, 2.0, materialize(0))")


def test_urlhash_level_identity(spark):
    """00149_function_url_hash: URLHash(url, N) == URLHash of the N-th
    hierarchy entry, whole URL beyond depth."""
    r = ch_sql(spark, "select URLHash('http://ya.ru/a' as url, 1) = "
                      "URLHash(URLHierarchy(url)[2]) AS ok, "
                      "URLHash('' as u2, 1000) = URLHash(u2) AS ok2"
               ).collect()
    assert (r[0]["ok"], r[0]["ok2"]) == (True, True)


def test_from_unix_milli_error_parity(spark):
    """01277_fromUnixTimestampMilli error rows."""
    with pytest.raises(ChSqlError, match="\\(42\\)"):
        ch_sql(spark, "SELECT fromUnixTimestampMilli()")
    with pytest.raises(ChSqlError, match="\\(43\\)"):
        ch_sql(spark, "SELECT fromUnixTimestampMilli('abc')")
    with pytest.raises(ChSqlError, match="\\(69\\)"):
        ch_sql(spark, "SELECT fromUnixTimestampMilli(4299262262295) "
                      "SETTINGS adaptive_type_cast = 0")


# ------------------------------------------------------ statements

def test_in_table_and_detach_attach(spark):
    """00116_CnchMergeTree_set."""
    ch_sql(spark, "DROP TABLE IF EXISTS t8b_set")
    ch_sql(spark, "CREATE TABLE t8b_set (x String) "
                  "ENGINE = CnchMergeTree ORDER BY x")
    ch_sql(spark, "INSERT INTO t8b_set VALUES ('Hello'), ('World')")
    r = ch_sql(spark, "SELECT arrayJoin(['Hello', 'nope']) AS s "
                      "WHERE s IN t8b_set").collect()
    assert [x["s"] for x in r] == ["Hello"]
    ch_sql(spark, "DETACH TABLE t8b_set PERMANENTLY")
    ch_sql(spark, "ATTACH TABLE t8b_set")
    r2 = ch_sql(spark, "SELECT count() AS c FROM t8b_set").collect()
    assert r2[0]["c"] == 2
    ch_sql(spark, "DROP TABLE t8b_set")


def test_ingest_partition(spark):
    """00988_alter_ingest_partition_memory_efficient2 end state."""
    ch_sql(spark, "DROP TABLE IF EXISTS t8b_ing_t")
    ch_sql(spark, "DROP TABLE IF EXISTS t8b_ing_s")
    ch_sql(spark, "CREATE TABLE t8b_ing_t (p Date, id Int32, c1 String, "
                  "c3 String) ENGINE = CnchMergeTree PARTITION BY p "
                  "ORDER BY id")
    ch_sql(spark, "CREATE TABLE t8b_ing_s (p Date, id Int32, c1 String) "
                  "ENGINE = CnchMergeTree PARTITION BY p ORDER BY id")
    ch_sql(spark, "INSERT INTO t8b_ing_t VALUES "
                  "('2010-01-01', 1, 'c', 'e'), ('2010-01-01', 2, 'c', 'e')")
    ch_sql(spark, "INSERT INTO t8b_ing_s VALUES "
                  "('2010-01-01', 1, 'a'), ('2010-01-01', 9, 'a')")
    ch_sql(spark, "ALTER TABLE t8b_ing_t ingest partition '2010-01-01' "
                  "columns c1 key id from t8b_ing_s")
    rows = sorted(_vals(ch_sql(
        spark, "SELECT id, c1, c3 FROM t8b_ing_t")))
    assert rows == [(1, "a", "e"), (2, "c", "e"), (9, "a", "")]
    ch_sql(spark, "DROP TABLE t8b_ing_t")
    ch_sql(spark, "DROP TABLE t8b_ing_s")


def test_remote_loopback(spark):
    """01812: remote('127.1', system.one) on a single node is the table."""
    r = ch_sql(spark, "select * from remote('127.1', system.one)").collect()
    assert list(r[0]) == [0]


def test_vw_setting_validation(spark):
    """01001_alter_vw (error 5025)."""
    ch_sql(spark, "DROP TABLE IF EXISTS t8b_vw")
    ch_sql(spark, "CREATE TABLE t8b_vw (k Int32) "
                  "ENGINE = CnchMergeTree ORDER BY k")
    with pytest.raises(ChSqlError, match="5025"):
        ch_sql(spark, "ALTER TABLE t8b_vw MODIFY SETTING "
                      "cnch_vw_write = 'nope'")
    ch_sql(spark, "ALTER TABLE t8b_vw MODIFY SETTING "
                  "cnch_vw_write = 'vw_default'")
    ch_sql(spark, "DROP TABLE t8b_vw")


def test_ambiguous_self_join_352(spark):
    """01018_ambiguous_column."""
    with pytest.raises(ChSqlError, match="352"):
        ch_sql(spark, "select * from system.one cross join system.one")
    # one alias disambiguates
    r = ch_sql(spark, "select * from system.one cross join system.one r"
               ).collect()
    assert len(r) == 1


def test_dt64_nonconst_string_compare_43(spark):
    """01268_DateTime64_in_WHERE."""
    with pytest.raises(ChSqlError, match="\\(43\\)"):
        ch_sql(spark, "WITH '2020-02-05 14:34:12.333' as S, "
                      "toDateTime64(S, 3) as DT64 "
                      "SELECT DT64 = materialize(S)")
    r = ch_sql(spark, "WITH '2020-02-05 14:34:12.333' as S, "
                      "toDateTime64(S, 3) as DT64 SELECT DT64 = S AS ok"
               ).collect()
    assert r[0]["ok"] is True
