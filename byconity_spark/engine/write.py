"""Table writes: CTAS, INSERT-append, unique-key upsert.

Reference: TableWriteStep.h:9 / TableFinishStep.h:13 (INSERT SELECT),
MergeTreeDataWriter partition+sort-on-write (src/Storages/MergeTree/
MergeTreeDataWriter.h:82), unique-key upsert semantics
(src/Storages/UniqueKeyIndex.h:25, MergeTreeSettings.h:444).

Spark-first mapping:
  * MergeTree PARTITION BY + ORDER BY  ->  parquet partitionBy +
    sortWithinPartitions on write: the sorted layout gives parquet row-group
    min/max pruning the same role as the primary-key mark index.
  * unique-key table -> dedup-on-write: row_number over key ORDER BY version
    DESC keeps the latest row per key (one shuffle on the key).
  * transactional commit -> Spark's file-committer atomicity per write job
    (we do not rebuild MVCC; see SURVEY §3.2).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def create_table_as(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """CTAS to partitioned (+ optionally sorted-within-partition) parquet."""
    out = df
    if sort_by:
        out = out.sortWithinPartitions(*sort_by)
    writer = out.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def create_bucketed_table(
    df: DataFrame,
    name: str,
    n_buckets: int,
    bucket_cols: list[str],
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """CLUSTER BY analogue (reference: bucket-level keys
    MergeTreeSettings.h:453, BUCKET_REPARTITION ExchangeMode.h:34): a
    catalog table bucketed on the join/agg key.  Two tables bucketed the
    same way join WITHOUT a shuffle — the 100 TB co-located join strategy
    (verified by tests/test_writes.py: the join plan has no Exchange)."""
    if mode == "overwrite":
        # a previous session's managed-table directory survives the
        # in-memory catalog — clear both catalog entry and location
        spark = df.sparkSession
        spark.sql(f"DROP TABLE IF EXISTS `{name}`")
        warehouse = spark.conf.get("spark.sql.warehouse.dir", "")
        if warehouse.startswith("file:"):
            warehouse = warehouse[len("file:") :]
        loc = os.path.join(warehouse, name.lower())
        if warehouse and os.path.isdir(loc):
            shutil.rmtree(loc, ignore_errors=True)
    writer = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(name)


def insert_into(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """INSERT INTO semantics: append new files to an existing parquet table."""
    writer = df.write.mode("append")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def upsert_by_key(
    base: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    version_col: str,
) -> DataFrame:
    """Unique-key upsert: latest version per key wins (ties broken toward
    the updates side via a stable source marker).  One shuffle on the key —
    the same cost profile as the reference's bucket-level unique index."""
    tagged = base.withColumn("__src", F.lit(0)).unionByName(
        updates.withColumn("__src", F.lit(1))
    )
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(version_col).desc(), F.col("__src").desc()
    )
    return (
        tagged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__src")
    )


def read_back(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
