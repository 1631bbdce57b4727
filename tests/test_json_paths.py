"""Nested JSON paths: multi-key JSONExtract*, array indexing (1-based),
ArrayRaw/Keys/Length, and the SQL-frontend rewrite of the same."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from byconity_spark.frontend.sql import ChSqlError, rewrite_ch_sql
from byconity_spark.functions import ch

DOC = (
    '{"a": {"b": [10, 20, 30], "name": "x"}, '
    '"tags": ["p", "q"], "flag": true}'
)


@pytest.fixture()
def df(spark):
    return spark.createDataFrame([(DOC,)], "j string")


def test_multi_key_extract(df):
    r = df.select(
        ch("JSONExtractInt", F.col("j"), "a", "b", 2).alias("b2"),
        ch("JSONExtractString", F.col("j"), "a", "name").alias("nm"),
        ch("JSONExtractBool", F.col("j"), "flag").alias("fl"),
        ch("JSONExtractRaw", F.col("j"), "a", "b").alias("raw"),
    ).collect()[0]
    assert r.b2 == 20
    assert r.nm == "x"
    assert r.fl is True
    assert r.raw == "[10,20,30]"


def test_array_raw_keys_length(df):
    r = df.select(
        ch("JSONExtractArrayRaw", F.col("j"), "tags").alias("arr"),
        ch("JSONExtractKeys", F.col("j"), "a").alias("keys"),
        ch("JSONLength", F.col("j"), "a", "b").alias("blen"),
        ch("JSONLength", F.col("j"), "a").alias("alen"),
    ).collect()[0]
    assert r.arr == ["p", "q"]
    assert sorted(r.keys) == ["b", "name"]
    assert r.blen == 3
    assert r.alen == 2


def test_bad_index_raises(df):
    with pytest.raises(ValueError):
        df.select(ch("JSONExtractInt", F.col("j"), "a", "b", 0))


def test_frontend_multi_key_rewrite():
    out = rewrite_ch_sql("SELECT JSONExtractInt(j, 'a', 'b', 2) AS v FROM t")
    assert "get_json_object(j, '$.a.b[1]')" in out
    out = rewrite_ch_sql("SELECT JSONExtractString(j, 'a', 'name') AS v FROM t")
    assert "'$.a.name'" in out


def test_frontend_dynamic_key_still_works():
    out = rewrite_ch_sql("SELECT JSONExtractString(j, keycol) AS v FROM t")
    assert "concat('$.', keycol)" in out


def test_frontend_bad_index_raises():
    with pytest.raises(ChSqlError):
        rewrite_ch_sql("SELECT JSONExtractInt(j, 'a', 0) AS v FROM t")


def test_frontend_sql_end_to_end(spark, df):
    df.createOrReplaceTempView("jdoc")
    from byconity_spark.frontend import ch_sql

    r = ch_sql(
        spark,
        "SELECT JSONExtractInt(j, 'a', 'b', 3) AS v, JSONLength(j, 'tags') AS n FROM jdoc",
    ).collect()[0]
    assert r.v == 30
    assert r.n == 2
