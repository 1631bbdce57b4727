"""Inline INSERT ... FORMAT row-input formats and SELECT ... FORMAT
row-output serialization (reference src/Formats/ —
JSONEachRowRowInputFormat.cpp, CSVRowInputFormat.cpp,
TabSeparatedRowInputFormat.cpp, ValuesBlockInputFormat.cpp;
ASTQueryWithOutput format clause)."""

from __future__ import annotations

import json

import pytest

from byconity_spark.engine.catalog import register_views
from byconity_spark.frontend import ch_sql
from byconity_spark.frontend.sql import ChSqlError
from tests.conftest import SF_DIR


@pytest.fixture()
def table(spark):
    ch_sql(spark, "CREATE TABLE fmt_t (k Int32, v String, x Float64)")
    yield "fmt_t"
    ch_sql(spark, "DROP TABLE IF EXISTS fmt_t")


def _rows(spark):
    return [
        tuple(r)
        for r in ch_sql(
            spark, "SELECT k, v, x FROM fmt_t ORDER BY k"
        ).collect()
    ]


def test_jsoneachrow_insert(spark, table):
    ch_sql(
        spark,
        'INSERT INTO fmt_t FORMAT JSONEachRow {"k": 1, "v": "a", "x": 1.5}\n'
        '{"k": 2, "v": "b", "x": null}',
    )
    assert _rows(spark) == [(1, "a", 1.5), (2, "b", None)]


def test_csv_and_tsv_insert(spark, table):
    ch_sql(spark, "INSERT INTO fmt_t FORMAT CSV 3,c,2.5\n4,d,3.25")
    ch_sql(spark, "INSERT INTO fmt_t FORMAT TabSeparated 5\te\t\\N")
    assert _rows(spark) == [
        (3, "c", 2.5), (4, "d", 3.25), (5, "e", None),
    ]


def test_withnames_reorders_and_fills_null(spark, table):
    ch_sql(
        spark,
        "INSERT INTO fmt_t (v, k) FORMAT CSVWithNames v,k\nf,6",
    )
    assert _rows(spark) == [(6, "f", None)]


def test_values_format_and_errors(spark, table):
    ch_sql(spark, "INSERT INTO fmt_t FORMAT Values (7, 'g', 0.5)")
    assert _rows(spark) == [(7, "g", 0.5)]
    with pytest.raises(ChSqlError, match="unsupported format"):
        ch_sql(spark, "INSERT INTO fmt_t FORMAT Protobuf xx")
    with pytest.raises(ChSqlError, match="unknown column"):
        ch_sql(spark, "INSERT INTO fmt_t (nope) FORMAT CSV 1")


def test_select_format_output(spark):
    register_views(spark, SF_DIR)
    lines = ch_sql(
        spark,
        "SELECT n_nationkey AS k, n_name AS v FROM nation "
        "WHERE n_nationkey < 2 ORDER BY k FORMAT JSONEachRow",
    ).collect()
    want = ch_sql(
        spark,
        "SELECT n_nationkey AS k, n_name AS v FROM nation "
        "WHERE n_nationkey < 2 ORDER BY k",
    ).collect()
    parsed = [json.loads(r[0]) for r in lines]
    assert parsed == [{"k": r[0], "v": r[1]} for r in want]
    csv_lines = ch_sql(
        spark,
        "SELECT n_nationkey, n_name FROM nation WHERE n_nationkey = 0 "
        "FORMAT CSV",
    ).collect()
    assert csv_lines[0][0] == f"0,{want[0][1]}"
    tsv = ch_sql(
        spark,
        "SELECT n_nationkey, n_name FROM nation WHERE n_nationkey = 0 "
        "FORMAT TSV",
    ).collect()
    assert tsv[0][0] == f"0\t{want[0][1]}"
