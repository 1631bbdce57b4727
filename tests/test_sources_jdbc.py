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
