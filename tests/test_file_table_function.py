"""file('path', 'Format'[, 'structure']) table function (reference
src/TableFunctions/TableFunctionFile.cpp over StorageFile)."""

from __future__ import annotations

import tempfile

import pytest

from byconity_spark.engine.catalog import register_views
from byconity_spark.frontend import ch_sql
from byconity_spark.frontend.sql import ChSqlError
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def base(spark):
    d = tempfile.mkdtemp(prefix="bspark_tf_file_")
    with open(f"{d}/t.csv", "w") as f:
        f.write("1,a\n2,b\n3,c\n")
    with open(f"{d}/t.jsonl", "w") as f:
        f.write('{"k": 10, "v": "x"}\n{"k": 20, "v": null}\n')
    return d


def test_file_csv_with_structure(spark, base):
    rows = ch_sql(
        spark,
        f"SELECT k, v FROM file('{base}/t.csv', 'CSV', 'k Int32, v String') "
        "ORDER BY k",
    ).collect()
    assert [tuple(r) for r in rows] == [(1, "a"), (2, "b"), (3, "c")]


def test_file_jsoneachrow_join(spark, base):
    register_views(spark, SF_DIR)
    rows = ch_sql(
        spark,
        "SELECT f.k, n.n_name FROM "
        f"file('{base}/t.jsonl', 'JSONEachRow', 'k Int64, v String') AS f "
        "JOIN nation n ON f.k = n.n_nationkey * 10 ORDER BY f.k",
    ).collect()
    assert [r[0] for r in rows] == [10, 20]


def test_file_parquet_self_describing(spark, base):
    n = ch_sql(
        spark,
        f"SELECT count(*) AS n FROM file('{SF_DIR}/nation.parquet', "
        "'Parquet')",
    ).collect()[0][0]
    assert n == 25


def test_file_text_requires_structure(spark, base):
    with pytest.raises(ChSqlError, match="requires the column"):
        ch_sql(spark, f"SELECT * FROM file('{base}/t.csv', 'CSV')")
    with pytest.raises(ChSqlError, match="unsupported format"):
        ch_sql(
            spark,
            f"SELECT * FROM file('{base}/t.csv', 'Native', 'k Int32')",
        )


def test_merge_table_function(spark):
    """merge('regex') over session tables (TableFunctionMerge.cpp);
    robust to registry entries whose temp view is gone (other code may
    drop views without unregistering)."""
    from byconity_spark.frontend.sql import _SESSION_TABLE_ENGINES

    _SESSION_TABLE_ENGINES.setdefault("mrg_ghost", "MergeTree")
    ch_sql(spark, "CREATE TABLE mrg_a (k Int32, a String)")
    ch_sql(spark, "CREATE TABLE mrg_b (k Int32, b String)")
    ch_sql(spark, "INSERT INTO mrg_a VALUES (1, 'x')")
    ch_sql(spark, "INSERT INTO mrg_b VALUES (2, 'y'), (3, 'z')")
    try:
        rows = ch_sql(
            spark,
            "SELECT _table, k, a, b FROM merge('mrg_.*') ORDER BY k",
        ).collect()
        assert [tuple(r) for r in rows] == [
            ("mrg_a", 1, "x", None),
            ("mrg_b", 2, None, "y"),
            ("mrg_b", 3, None, "z"),
        ]
        with pytest.raises(ChSqlError, match="no table matches"):
            ch_sql(spark, "SELECT * FROM merge('nope_.*')")
    finally:
        ch_sql(spark, "DROP TABLE IF EXISTS mrg_a")
        ch_sql(spark, "DROP TABLE IF EXISTS mrg_b")
        _SESSION_TABLE_ENGINES.pop("mrg_ghost", None)


def test_url_table_function_file_scheme(spark, tmp_path):
    """url() (TableFunctionURL.cpp): file:// resolves through the file()
    machinery with the declared structure."""
    p = tmp_path / "kv.csv"
    p.write_text("1,a\n2,b\n")
    got = ch_sql(
        spark,
        f"SELECT sum(k) AS s, count(*) AS n FROM "
        f"url('file://{p}', 'CSV', 'k Int64, v String')",
    ).collect()[0]
    assert (got["s"], got["n"]) == (3, 2)


def test_url_table_function_bad_scheme_and_no_network(spark):
    import pytest as pt

    from byconity_spark.frontend.sql import ChSqlError

    with pt.raises(ChSqlError, match="unsupported scheme"):
        ch_sql(spark, "SELECT * FROM url('ftp://x/y', 'CSV', 'k Int64')")
    with pt.raises(ChSqlError, match="cannot fetch"):
        ch_sql(
            spark,
            "SELECT * FROM url('http://127.0.0.1:1/none.csv', 'CSV', "
            "'k Int64')",
        )


def test_describe_over_file_function(spark, tmp_path):
    """DESCRIBE file(...) prints the declared CH types (the file() call
    rewrites to its backing view before DDL dispatch, so the normal
    DESCRIBE path serves it)."""
    p = tmp_path / "kv2.csv"
    p.write_text("1,a\n")
    rows = ch_sql(
        spark,
        f"DESCRIBE file('{p}', 'CSV', 'k Int64, v String')",
    ).collect()
    assert [tuple(r) for r in rows] == [("k", "Int64"), ("v", "String")]
