"""External source builders beyond files: JDBC (MySQL/PostgreSQL table
engines in the reference — src/Storages/registerStorages.cpp:33-103).

No database or JDBC driver jar ships in this container, so these builders
configure the reader without connecting; the partitioned-read options are
the part that matters at scale (parallel range scans instead of one
connection streaming the whole table)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def jdbc_table(
    spark: SparkSession,
    url: str,
    table: str,
    user: str,
    password: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    fetch_size: int = 10_000,
) -> DataFrame:
    """Configured JDBC read.  Always pass the partition_column trio for any
    table of size — otherwise Spark reads through ONE connection."""
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("user", user)
        .option("password", password)
        .option("fetchsize", str(fetch_size))
    )
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    return reader.load()
