"""CH star modifiers — * EXCEPT / APPLY / REPLACE and COLUMNS('re')
(reference ASTColumnsMatcher.h, TranslateQualifiedNamesVisitor
transformers)."""

from __future__ import annotations

import pytest

from byconity_spark.engine.catalog import register_views
from byconity_spark.frontend import ch_sql
from byconity_spark.frontend.sql import ChSqlError
from tests.conftest import SF_DIR


@pytest.fixture(autouse=True)
def _views(spark):
    register_views(spark, SF_DIR)


def test_apply_with_except(spark):
    df = ch_sql(spark, "SELECT * EXCEPT (n_name) APPLY(max) FROM nation")
    assert df.columns == ["max(n_nationkey)", "max(n_regionkey)"]
    assert df.collect()[0][:2] == (24, 4)


def test_columns_regex_apply(spark):
    df = ch_sql(spark, "SELECT COLUMNS('key') APPLY(count) FROM nation")
    assert df.columns == ["count(n_nationkey)", "count(n_regionkey)"]
    assert df.collect()[0][:2] == (25, 25)


def test_replace_keeps_position_and_name(spark):
    rows = ch_sql(
        spark,
        "SELECT * REPLACE(n_regionkey * 10 AS n_regionkey) FROM nation "
        "WHERE n_nationkey = 7",
    ).collect()
    df_cols = ch_sql(spark, "SELECT * FROM nation").columns
    assert [
        f.name
        for f in ch_sql(
            spark,
            "SELECT * REPLACE(n_regionkey * 10 AS n_regionkey) FROM nation",
        ).schema.fields
    ] == df_cols
    base = ch_sql(
        spark, "SELECT n_regionkey FROM nation WHERE n_nationkey = 7"
    ).collect()[0][0]
    assert rows[0]["n_regionkey"] == base * 10


def test_bad_replace_raises(spark):
    with pytest.raises(ChSqlError, match="REPLACE"):
        ch_sql(spark, "SELECT * REPLACE(n_name AS no_such) FROM nation")
