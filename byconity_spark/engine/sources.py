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
    user: str = "",
    password: str = "",
    driver: str | None = None,
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
        .option("fetchsize", str(fetch_size))
    )
    if user:
        reader = reader.option("user", user).option("password", password)
    if driver:
        reader = reader.option("driver", driver)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    return reader.load()


def derby_memory_url(name: str) -> str:
    """Embedded Derby in-memory JDBC URL — the only JDBC backend bundled
    with Spark's jars, used to exercise the real JDBC read/write path in a
    single-JVM deployment.  On a cluster, substitute a server URL
    (jdbc:mysql://..., jdbc:postgresql://...) — the reader options are
    identical (reference src/Storages/registerStorages.cpp:67-147 registers
    the MySQL/PostgreSQL/JDBC table engines this maps to)."""
    return f"jdbc:derby:memory:{name};create=true"


DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def jdbc_write(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "overwrite",
    driver: str | None = None,
    batch_size: int = 10_000,
) -> None:
    """Configured JDBC write.  batchsize batches INSERTs per round trip;
    at scale also repartition the frame to bound concurrent connections
    (one per task)."""
    props = {"batchsize": str(batch_size)}
    if driver:
        props["driver"] = driver
    df.write.jdbc(url, table, mode=mode, properties=props)


def hive_external_table(
    spark: SparkSession,
    base_path: str,
    partition_types: dict[str, str] | None = None,
    data_schema=None,
    file_format: str = "parquet",
) -> DataFrame:
    """Hive-LAYOUT external table reader (reference src/Storages/Hive/
    StorageCnchHive.h + registerStorages.cpp:33-103 CnchHive): reads a
    directory tree some other system laid out as
    ``base/part_col=value/.../files`` WITHOUT a metastore — Spark's
    partition discovery under ``basePath`` recovers the partition columns
    from the directory names, and ``partition_types`` casts them from the
    discovered string/inferred type to the table's declared types (the
    metastore's job in real Hive).

    A filter on a partition column prunes whole directory subtrees before
    any file is opened (PartitionFilters in the scan plan, the MergeTree
    partition-prune analogue) — at 100 TB this is the difference between
    listing one subtree and scanning the lake.

    ``data_schema`` (optional StructType) pins the NON-partition columns,
    skipping footer-based inference across thousands of files."""
    reader = spark.read.option("basePath", base_path)
    if data_schema is not None:
        reader = reader.schema(data_schema)
    df = getattr(reader, file_format)(base_path)
    from pyspark.sql import functions as F

    for col, dtype in (partition_types or {}).items():
        if col not in df.columns:
            raise ValueError(
                f"hive_external_table: partition column {col!r} not found in "
                f"discovered layout; got {df.columns}"
            )
        df = df.withColumn(col, F.col(col).cast(dtype))
    return df
