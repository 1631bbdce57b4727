"""Write-path unit tests: upsert semantics, partitioned layout, catalog
schema enforcement."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from byconity_spark.engine.write import create_table_as, insert_into, read_back, upsert_by_key


def test_upsert_latest_version_wins(spark):
    base = spark.createDataFrame(
        [(1, "a", 0), (2, "b", 0), (3, "c", 5)], "k long, v string, version int"
    )
    updates = spark.createDataFrame(
        [(2, "B", 1), (3, "old", 1), (4, "d", 1)], "k long, v string, version int"
    )
    out = {r.k: (r.v, r.version) for r in upsert_by_key(base, updates, ["k"], "version").collect()}
    # k=3: base has HIGHER version -> base wins; k=2: update wins; k=4: new
    assert out == {1: ("a", 0), 2: ("B", 1), 3: ("c", 5), 4: ("d", 1)}


def test_upsert_tie_prefers_updates(spark):
    base = spark.createDataFrame([(1, "old", 7)], "k long, v string, version int")
    updates = spark.createDataFrame([(1, "new", 7)], "k long, v string, version int")
    out = upsert_by_key(base, updates, ["k"], "version").collect()
    assert out[0].v == "new"


def test_ctas_partition_layout(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "x", 1.0), (2, "y", 2.0), (3, "x", 3.0)], "id long, part string, v double"
    )
    path = str(tmp_path / "t")
    create_table_as(df, path, partition_by=["part"], sort_by=["id"])
    assert sorted(
        d for d in os.listdir(path) if d.startswith("part=")
    ) == ["part=x", "part=y"]
    back = read_back(spark, path)
    assert back.count() == 3
    # append then re-read
    insert_into(
        spark.createDataFrame([(4, "z", 4.0)], "id long, part string, v double"),
        path,
        partition_by=["part"],
    )
    assert read_back(spark, path).count() == 4


def test_bucketed_tables_join_without_shuffle(spark):
    """Two tables bucketed identically on the join key must join with NO
    Exchange (the co-located join that replaces a 100 TB shuffle)."""
    import contextlib
    import io

    from pyspark.sql import functions as F

    from byconity_spark.engine.write import create_bucketed_table

    a = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("va")
    )
    b = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("vb")
    )
    create_bucketed_table(a, "bt_a", 4, ["k"], sort_cols=["k"])
    create_bucketed_table(b, "bt_b", 4, ["k"], sort_cols=["k"])
    # merge hint: broadcast would win on this tiny fixture and hide the
    # bucketing effect we are asserting
    joined = spark.table("bt_a").hint("merge").join(spark.table("bt_b"), "k")

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        joined.explain("formatted")
    plan = buf.getvalue()
    assert "Exchange hashpartitioning" not in plan, "bucketed join still shuffles"
    assert "SortMergeJoin" in plan
    assert joined.count() == 1000
    spark.sql("DROP TABLE IF EXISTS bt_a")
    spark.sql("DROP TABLE IF EXISTS bt_b")


def test_catalog_schema_enforced(spark, tmp_path):
    """A drifted parquet file (string where the catalog declares timestamp)
    must fail at read, not be silently inferred (ADVICE r01 item 1)."""
    from pyspark.sql import types as T

    bad = spark.createDataFrame([("not-a-ts", 1)], "ts string, x long")
    path = str(tmp_path / "drifted")
    bad.write.parquet(path)
    declared = T.StructType(
        [T.StructField("ts", T.TimestampType()), T.StructField("x", T.LongType())]
    )
    with pytest.raises(Exception):
        spark.read.schema(declared).parquet(path).collect()
