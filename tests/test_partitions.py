"""MergeTree partition commands over session tables (reference
ASTAlterQuery DROP/DETACH/ATTACH/REPLACE PARTITION, MergeTreePartition.h
partition-id = PARTITION BY expression value)."""

from __future__ import annotations

import pytest

from byconity_spark.engine.catalog import register_views
from byconity_spark.frontend import ch_sql
from byconity_spark.frontend.sql import (
    _DETACHED_PARTS,
    _SESSION_TABLE_PARTITIONS,
    ChSqlError,
)
from tests.conftest import SF_DIR


@pytest.fixture(autouse=True)
def _clean(spark):
    yield
    for t in ("pt_t", "pt_src"):
        ch_sql(spark, f"DROP TABLE IF EXISTS {t}")
    _DETACHED_PARTS.clear()


def _mk(spark):
    register_views(spark, SF_DIR)
    ch_sql(
        spark,
        "CREATE TABLE pt_t ENGINE = MergeTree PARTITION BY n_regionkey "
        "ORDER BY n_nationkey AS SELECT * FROM nation",
    )


def _count(spark, t="pt_t"):
    return ch_sql(spark, f"SELECT count(*) AS n FROM {t}").collect()[0][0]


def test_drop_partition(spark):
    _mk(spark)
    assert _SESSION_TABLE_PARTITIONS["pt_t"] == "n_regionkey"
    ch_sql(spark, "ALTER TABLE pt_t DROP PARTITION 0")
    assert _count(spark) == 20
    keys = ch_sql(
        spark, "SELECT collect_set(n_regionkey) AS s FROM pt_t"
    ).collect()[0][0]
    assert sorted(keys) == [1, 2, 3, 4]


def test_detach_attach_roundtrip(spark):
    _mk(spark)
    ch_sql(spark, "ALTER TABLE pt_t DETACH PARTITION 3")
    assert _count(spark) == 20
    rows = ch_sql(
        spark,
        "SELECT table, partition_id, rows FROM system.detached_parts",
    ).collect()
    assert rows == [("pt_t", "3", 5)]
    ch_sql(spark, "ALTER TABLE pt_t ATTACH PARTITION 3")
    assert _count(spark) == 25
    # re-ATTACH with nothing detached is a NO-OP in the reference (it
    # attaches whatever sits in the detached dir — nothing; 10054)
    st = ch_sql(spark, "ALTER TABLE pt_t ATTACH PARTITION 3").collect()[0]
    assert st["status"] == "attached_nothing"
    assert _count(spark) == 25


def test_attach_and_replace_from(spark):
    _mk(spark)
    ch_sql(
        spark,
        "CREATE TABLE pt_src PARTITION BY n_regionkey AS "
        "SELECT n_nationkey + 100 AS n_nationkey, n_name, n_regionkey "
        "FROM nation WHERE n_regionkey = 1",
    )
    ch_sql(spark, "ALTER TABLE pt_t REPLACE PARTITION 1 FROM pt_src")
    assert _count(spark) == 25
    mn = ch_sql(
        spark,
        "SELECT min(n_nationkey) AS m FROM pt_t WHERE n_regionkey = 1",
    ).collect()[0][0]
    assert mn >= 100  # the original partition-1 rows were replaced
    ch_sql(spark, "ALTER TABLE pt_t ATTACH PARTITION 1 FROM pt_src")
    assert _count(spark) == 30  # ATTACH FROM appends, REPLACE swaps


def test_partition_expression_and_errors(spark):
    register_views(spark, SF_DIR)
    ch_sql(
        spark,
        "CREATE TABLE pt_t PARTITION BY intDiv(n_nationkey, 10) AS "
        "SELECT * FROM nation",
    )
    ch_sql(spark, "ALTER TABLE pt_t DROP PARTITION 2")
    assert _count(spark) == 20  # nations 20..24 dropped
    ch_sql(spark, "DROP TABLE pt_t")
    ch_sql(spark, "CREATE TABLE pt_t AS SELECT * FROM nation")
    with pytest.raises(ChSqlError, match="NOT_A_PARTITIONED_TABLE"):
        ch_sql(spark, "ALTER TABLE pt_t DROP PARTITION 0")
