"""SELECT TOP n, ORDER BY ... COLLATE, INTO OUTFILE (reference
ParserSelectQuery TOP branch, Collator.h, ASTQueryWithOutput out_file)."""

from __future__ import annotations

import os
import tempfile

import pytest

from byconity_spark.engine.catalog import register_views
from byconity_spark.frontend import ch_sql
from byconity_spark.frontend.sql import ChSqlError
from tests.conftest import SF_DIR


@pytest.fixture(autouse=True)
def _views(spark):
    register_views(spark, SF_DIR)


def test_select_top(spark):
    rows = ch_sql(
        spark,
        "SELECT TOP 3 n_nationkey FROM nation ORDER BY n_nationkey",
    ).collect()
    assert [r[0] for r in rows] == [0, 1, 2]


def test_order_by_collate(spark):
    rows = ch_sql(
        spark,
        "SELECT n_name FROM nation ORDER BY n_name COLLATE 'en' LIMIT 3",
    ).collect()
    plain = ch_sql(
        spark, "SELECT n_name FROM nation ORDER BY n_name LIMIT 3"
    ).collect()
    assert [r[0] for r in rows] == [r[0] for r in plain]  # ASCII data


def test_into_outfile_roundtrip(spark):
    base = tempfile.mkdtemp(prefix="bspark_outfile_")
    tsv = f"{base}/out.tsv"
    out = ch_sql(
        spark,
        "SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 3 "
        f"ORDER BY n_nationkey INTO OUTFILE '{tsv}'",
    ).collect()
    assert out[0][1] == 3 and os.path.exists(tsv)
    lines = open(tsv).read().splitlines()
    assert len(lines) == 3 and lines[0].startswith("0\t")
    jpath = f"{base}/out.jsonl"
    ch_sql(
        spark,
        "SELECT n_nationkey AS k FROM nation WHERE n_nationkey = 5 "
        f"INTO OUTFILE '{jpath}' FORMAT JSONEachRow",
    ).collect()
    assert open(jpath).read().strip() == '{"k":5}'
    with pytest.raises(ChSqlError, match="unsupported format"):
        ch_sql(
            spark,
            f"SELECT 1 FROM system.one INTO OUTFILE '{base}/x' "
            "FORMAT Protobuf",
        )
