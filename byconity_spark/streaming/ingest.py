"""Streaming ingestion sources.

Reference: src/Storages/Kafka/StorageCnchKafka.h (continuous Kafka consume),
CnchKafkaConsumeManager.h:36 (scheduling), exactly-once offset commit
src/Transaction/ICnchTransaction.h:119 (setKafkaTpl).

Spark mapping: Structured Streaming gives the same exactly-once contract by
construction — offsets live in the checkpoint and commit atomically with the
sink's epoch (file-sink manifest / idempotent foreachBatch), so a replayed
batch lands on the same offsets.  No transaction manager to rebuild.

The Kafka connector jar is not present in this container, so
``kafka_stream`` builds the reader but the first ``load()`` raises — the
file-based source below exercises the identical downstream pipeline
(schema'd source -> watermark -> windowed agg -> sink) and is what the
tests drive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from byconity_spark.engine.catalog import TABLES, _nano_cols, _physical_schema


def kafka_stream(
    spark: SparkSession,
    brokers: str,
    topic: str,
    value_schema: T.StructType,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """Kafka source -> parsed value columns.  Requires the
    spark-sql-kafka connector on the classpath (not bundled here)."""
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return raw.select(
        F.from_json(F.col("value").cast("string"), value_schema).alias("v")
    ).select("v.*")


def events_file_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """The events table as a file stream (the Kafka-shaped fixture source):
    same schema handling as the batch catalog, including the nanosecond
    timestamp conversion."""
    nano = _nano_cols(sf_dir, "events")
    reader = spark.readStream.schema(_physical_schema("events", nano))
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    df = reader.option("pathGlobFilter", "events.parquet").parquet(sf_dir)
    for col in nano:
        df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    return df.select(*[f.name for f in TABLES["events"].fields])


def parquet_dir_stream(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """Generic schema'd parquet directory stream (new files = new batches)."""
    return spark.readStream.schema(schema).parquet(path)
