"""EmbeddedRocksDB key-value engine analogue (reference
src/Storages/RocksDB/StorageEmbeddedRocksDB.cpp, registerStorages.cpp):
PRIMARY KEY table with rocksdb-Put UPSERT semantics on INSERT."""

from __future__ import annotations

import pytest

from byconity_spark.engine.catalog import register_views
from byconity_spark.frontend import ch_sql
from byconity_spark.frontend.sql import _ROCKSDB_KEYS, ChSqlError
from tests.conftest import SF_DIR


@pytest.fixture(autouse=True)
def _clean(spark):
    yield
    ch_sql(spark, "DROP TABLE IF EXISTS kv_t")
    assert "kv_t" not in _ROCKSDB_KEYS


def test_primary_key_required(spark):
    with pytest.raises(ChSqlError, match="PRIMARY KEY is required"):
        ch_sql(
            spark,
            "CREATE TABLE kv_t (k Int64, v String) "
            "ENGINE = EmbeddedRocksDB",
        )


def test_insert_is_upsert(spark):
    ch_sql(
        spark,
        "CREATE TABLE kv_t (k Int64, v String) "
        "ENGINE = EmbeddedRocksDB PRIMARY KEY k",
    )
    assert _ROCKSDB_KEYS["kv_t"] == ["k"]
    ch_sql(spark, "INSERT INTO kv_t VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    ch_sql(spark, "INSERT INTO kv_t VALUES (2, 'B'), (4, 'd')")
    got = {
        r["k"]: r["v"]
        for r in ch_sql(spark, "SELECT k, v FROM kv_t").collect()
    }
    assert got == {1: "a", 2: "B", 3: "c", 4: "d"}


def test_upsert_via_format_insert(spark):
    ch_sql(
        spark,
        "CREATE TABLE kv_t (k Int64, v String) "
        "ENGINE = EmbeddedRocksDB PRIMARY KEY k",
    )
    ch_sql(spark, "INSERT INTO kv_t VALUES (1, 'a')")
    ch_sql(
        spark,
        'INSERT INTO kv_t FORMAT JSONEachRow {"k": 1, "v": "A"}\n'
        '{"k": 9, "v": "z"}',
    )
    got = {
        r["k"]: r["v"]
        for r in ch_sql(spark, "SELECT k, v FROM kv_t").collect()
    }
    assert got == {1: "A", 9: "z"}


def test_ctas_form_and_point_lookup(spark):
    register_views(spark, SF_DIR)
    ch_sql(
        spark,
        "CREATE TABLE kv_t ENGINE = EmbeddedRocksDB PRIMARY KEY n_nationkey "
        "AS SELECT n_nationkey, n_name FROM nation",
    )
    ch_sql(spark, "INSERT INTO kv_t VALUES (0, 'RENAMED')")
    assert (
        ch_sql(
            spark, "SELECT n_name FROM kv_t WHERE n_nationkey = 0"
        ).collect()[0][0]
        == "RENAMED"
    )
    assert ch_sql(spark, "SELECT count(*) AS n FROM kv_t").collect()[0][0] == 25


def test_show_create_echoes_primary_key(spark):
    ch_sql(
        spark,
        "CREATE TABLE kv_t (k Int64, v String) "
        "ENGINE = EmbeddedRocksDB PRIMARY KEY k",
    )
    stmt = ch_sql(spark, "SHOW CREATE TABLE kv_t").collect()[0]["statement"]
    assert "ENGINE = EmbeddedRocksDB" in stmt and "PRIMARY KEY k" in stmt


def test_rollback_restores_rocksdb_registration(spark):
    from byconity_spark.engine.transactions import transactions

    transactions.reset()
    ch_sql(
        spark,
        "CREATE TABLE kv_t (k Int64, v String) "
        "ENGINE = EmbeddedRocksDB PRIMARY KEY k",
    )
    ch_sql(spark, "INSERT INTO kv_t VALUES (1, 'a')")
    ch_sql(spark, "BEGIN TRANSACTION")
    ch_sql(spark, "DROP TABLE kv_t")
    assert "kv_t" not in _ROCKSDB_KEYS
    ch_sql(spark, "ROLLBACK")
    assert _ROCKSDB_KEYS.get("kv_t") == ["k"]
    ch_sql(spark, "INSERT INTO kv_t VALUES (1, 'A')")  # still an upsert
    got = {
        r["k"]: r["v"]
        for r in ch_sql(spark, "SELECT k, v FROM kv_t").collect()
    }
    assert got == {1: "A"}
