"""Streaming tests: exactly-once incremental file ingestion (checkpoint
resume), watermark late-data handling, MV full + partition refresh."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from byconity_spark.streaming import MaterializedView, parquet_dir_stream


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, "id long, v string").coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_incremental_ingest_exactly_once(spark, tmp_path):
    """New files are picked up incrementally across restarts; the checkpoint
    guarantees each input file lands in the sink exactly once."""
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    _write_batch(spark, src, [(1, "a"), (2, "b")])

    def run_once():
        stream = parquet_dir_stream(
            spark, src, spark.read.parquet(src).schema
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    assert spark.read.parquet(sink).count() == 2

    _write_batch(spark, src, [(3, "c")])
    run_once()  # restart from checkpoint: only the new file is processed
    out = spark.read.parquet(sink)
    assert out.count() == 3
    assert sorted(r.id for r in out.collect()) == [1, 2, 3]


def test_watermark_drops_late_rows(spark, tmp_path):
    """Append-mode windowed aggregation finalizes windows once the watermark
    passes; a record arriving behind the watermark is dropped."""
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def batch(rows):
        spark.createDataFrame(rows, "ts string, k string").withColumn(
            "ts", F.col("ts").cast("timestamp")
        ).coalesce(1).write.mode("append").parquet(src)

    batch([("2024-01-01 10:05:00", "a"), ("2024-01-01 13:00:00", "b")])

    def run_once():
        stream = parquet_dir_stream(spark, src, spark.read.parquet(src).schema)
        agg = (
            stream.withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").alias("start"), "n")
        )
        q = (
            agg.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    # watermark advanced to 12:00 -> the 10:00 window finalized with n=1
    first = {(r.start.isoformat(), r.n) for r in spark.read.parquet(sink).collect()}
    assert ("2024-01-01T10:00:00", 1) in first

    # a record 2h behind the watermark targets the finalized 10:00 window
    batch([("2024-01-01 10:20:00", "late")])
    run_once()
    final = [r for r in spark.read.parquet(sink).collect() if r.start.hour == 10]
    assert all(r.n == 1 for r in final)  # late row never re-opens the window


def test_mv_full_and_partition_refresh(spark, tmp_path):
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(1, "x", 10.0), (2, "y", 20.0), (3, "x", 30.0)], "id long, part string, v double"
    ).write.parquet(src)

    mv = MaterializedView(
        name="totals_by_part",
        build=lambda s: s.read.parquet(src).groupBy("part").agg(F.sum("v").alias("total")),
        target_path=str(tmp_path / "mv"),
        partition_by=["part"],
    )
    mv.refresh_full(spark)
    assert {(r.part, r.total) for r in mv.read(spark).collect()} == {
        ("x", 40.0),
        ("y", 20.0),
    }

    # source gains a row in partition x; refresh ONLY x
    spark.createDataFrame([(4, "x", 5.0)], "id long, part string, v double").write.mode(
        "append"
    ).parquet(src)
    mv.refresh_partitions(spark, ["x"])
    assert {(r.part, r.total) for r in mv.read(spark).collect()} == {
        ("x", 45.0),
        ("y", 20.0),
    }
    # partition dirs exist (y untouched by the partial refresh)
    assert sorted(
        d for d in os.listdir(mv.target_path) if d.startswith("part=")
    ) == ["part=x", "part=y"]


# ------------------------------------------------------- stateful operator

def test_stateful_sessionize_across_batches(spark, tmp_path):
    """State must survive micro-batches: batch 2 (second file, processed in
    a later trigger via maxFilesPerTrigger=1) extends the session batch 1
    left open, and only closed sessions are ever emitted."""
    import datetime as dt
    import time
    from byconity_spark.streaming.stateful import stateful_sessionize

    src = tmp_path / "src"
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()
    t0 = dt.datetime(2024, 1, 1, 8, 0, 0)

    def mk(rows):
        return spark.createDataFrame(
            rows, "user_id long, ts timestamp, value double"
        )

    # file 1: session A (2 events), then a new session opens at +2h
    mk([
        (1, t0, 1.0),
        (1, t0 + dt.timedelta(minutes=10), 2.0),
        (1, t0 + dt.timedelta(hours=2), 4.0),
    ]).coalesce(1).write.parquet(str(src / "b1"))
    time.sleep(1.1)  # distinct mtimes -> deterministic file order
    # file 2: +2h05 extends the OPEN session; +5h closes it
    mk([
        (1, t0 + dt.timedelta(hours=2, minutes=5), 8.0),
        (1, t0 + dt.timedelta(hours=5), 16.0),
    ]).coalesce(1).write.parquet(str(src / "b2"))

    schema = mk([]).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .parquet(str(src / "b*"))
    )
    q = (
        stateful_sessionize(stream, gap_us=1_800_000_000)
        .writeStream.format("memory")
        .queryName("ss_batches")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = sorted(spark.table("ss_batches").collect(), key=lambda r: r.session_start)
    assert len(out) == 2  # session at +5h stays open -> not emitted
    assert out[0].n_events == 2 and out[0].sum_value == 3.0
    assert out[1].n_events == 2 and out[1].sum_value == 12.0  # 4 + 8
    assert out[1].session_start == t0 + dt.timedelta(hours=2)


def test_fan_out_sinks(spark, tmp_path):
    """foreachBatch multi-sink: both sinks receive every batch exactly once."""
    import pyspark.sql.functions as F
    from byconity_spark.streaming.stateful import fan_out_sinks
    from byconity_spark.streaming import parquet_dir_stream

    src = tmp_path / "src"
    spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("k")
    ).write.parquet(str(src))
    schema = spark.read.parquet(str(src)).schema
    stream = parquet_dir_stream(spark, str(src), schema)
    sinks = {"raw": str(tmp_path / "raw"), "evens": str(tmp_path / "evens")}
    q = fan_out_sinks(
        stream,
        sinks,
        checkpoint=str(tmp_path / "ckpt"),
        transforms={"evens": lambda df: df.filter(F.col("id") % 2 == 0)},
    )
    q.awaitTermination()
    assert spark.read.parquet(sinks["raw"]).count() == 100
    assert spark.read.parquet(sinks["evens"]).count() == 50


def test_stateful_sessionize_idle_flush(spark, tmp_path):
    """EventTimeTimeout: a user with no successor events is flushed once the
    watermark (advanced by OTHER users' events) passes last_event + gap."""
    import datetime as dt
    import time
    from byconity_spark.streaming.stateful import stateful_sessionize

    src = tmp_path / "src"
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()
    t0 = dt.datetime(2024, 1, 1, 8, 0, 0)

    def mk(rows):
        return spark.createDataFrame(
            rows, "user_id long, ts timestamp, value double"
        )

    # file 1: user 1 session (2 events), never seen again
    mk([
        (1, t0, 1.0),
        (1, t0 + dt.timedelta(minutes=10), 2.0),
    ]).coalesce(1).write.parquet(str(src / "b1"))
    time.sleep(1.1)
    # file 2: user 2 at +6h pushes the watermark far past user 1's gap
    mk([
        (2, t0 + dt.timedelta(hours=6), 5.0),
    ]).coalesce(1).write.parquet(str(src / "b2"))

    schema = mk([]).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .parquet(str(src / "b*"))
    )
    q = (
        stateful_sessionize(stream, gap_us=1_800_000_000, idle_flush=True)
        .writeStream.format("memory")
        .queryName("ss_idle")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = sorted(spark.table("ss_idle").collect(), key=lambda r: r.user_id)
    # user 1's open session was idle-flushed; user 2's stays open (watermark
    # never passed its gap)
    assert len(out) == 1
    assert out[0].user_id == 1
    assert out[0].n_events == 2 and out[0].sum_value == 3.0


def test_kafka_stream_builder_guarded(spark):
    """Kafka ingest (reference src/Storages/Kafka/StorageCnchKafka.h): the
    builder must construct a valid reader; with the connector on the
    classpath a real read starts, without it load() raises the documented
    missing-data-source error — never a silent pass."""
    import pytest as _p
    from byconity_spark.streaming.ingest import kafka_stream

    def connector_present() -> bool:
        try:
            spark._jvm.java.lang.Class.forName(
                "org.apache.spark.sql.kafka010.KafkaSourceProvider"
            )
            return True
        except Exception:
            return False

    from pyspark.sql import types as T

    schema = T.StructType([T.StructField("x", T.LongType())])
    if connector_present():  # pragma: no cover - container lacks the jar
        df = kafka_stream(spark, brokers="localhost:9092", topic="t", value_schema=schema)
        assert df.isStreaming
    else:
        with _p.raises(Exception, match="(?i)kafka|data.?source"):
            kafka_stream(spark, brokers="localhost:9092", topic="t", value_schema=schema)
