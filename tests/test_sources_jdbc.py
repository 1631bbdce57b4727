"""JDBC source path (reference src/Storages/registerStorages.cpp:67-147):
real write + partitioned read through embedded Derby, the JDBC backend
bundled with Spark's jars."""

from __future__ import annotations

import pytest

from byconity_spark.engine.sources import (
    DERBY_DRIVER,
    derby_memory_url,
    jdbc_table,
    jdbc_write,
)


def _derby_available(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(DERBY_DRIVER)
        return True
    except Exception:
        return False


def test_jdbc_roundtrip_partitioned(spark):
    if not _derby_available(spark):
        pytest.skip("no Derby driver on the Spark classpath")
    df = spark.range(1000).selectExpr(
        "id", "id % 13 as k", "cast(id * 0.5 as double) as v"
    )
    url = derby_memory_url("bspark_test")
    jdbc_write(df, url, "rt", driver=DERBY_DRIVER)
    back = jdbc_table(
        spark, url, "rt", driver=DERBY_DRIVER,
        partition_column="id", lower_bound=0, upper_bound=1000,
        num_partitions=4,
    )
    # the partition trio must fan the scan out to parallel range queries
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == 1000
    s = back.agg({"v": "sum"}).collect()[0][0]
    assert abs(s - sum(i * 0.5 for i in range(1000))) < 1e-6


def test_generate_random_and_null_sink(spark):
    """generateRandom (reference TableFunctionGenerateRandom): seeded,
    reproducible, schema-driven; StorageNull discards writes."""
    from byconity_spark.engine.tables import generate_random, null_sink

    df1 = generate_random(spark, "a bigint, b string, c double, d date", 1000, seed=7)
    df2 = generate_random(spark, "a bigint, b string, c double, d date", 1000, seed=7)
    assert df1.columns == ["a", "b", "c", "d"]
    assert df1.count() == 1000
    # same seed -> identical content
    assert df1.exceptAll(df2).count() == 0
    # different seed -> different content
    df3 = generate_random(spark, "a bigint, b string, c double, d date", 1000, seed=8)
    assert df1.exceptAll(df3).count() > 0
    null_sink(df1)  # must execute without materializing anywhere


def test_merge_tables_schema_alignment(spark):
    from byconity_spark.engine.tables import merge_tables
    import pytest as _p

    t1 = spark.createDataFrame([(1, "x")], "a int, b string")
    t2 = spark.createDataFrame([(2, 5.0)], "a int, c double")
    m = merge_tables(spark, {"t1": t1, "t2": t2}, "t[0-9]", with_table_col=True)
    rows = {r._table: r for r in m.collect()}
    assert set(m.columns) == {"a", "b", "c", "_table"}
    assert rows["t1"].c is None and rows["t2"].b is None
    with _p.raises(ValueError):
        merge_tables(spark, {"t1": t1}, "zzz")
