"""Streaming workload: the events file-stream (Kafka-shaped source) driven
end-to-end through watermarked window aggregations into a memory sink, then
hash-checked against batch SQL oracles — streaming results must equal the
batch answer on the same data (availableNow processes everything).
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from byconity_spark.streaming import (
    AggMaterializedView,
    events_file_stream,
    hourly_counts,
    session_windows,
)
from byconity_spark.workloads import register


# per-process record of the last run's micro-batch work time per query name:
# {workload_name: seconds actually spent in addBatch}.  bench.py reads this
# to split real processing cost from availableNow startup overhead.
LAST_BATCH_SECONDS: dict[str, float] = {}


def _stream_session(spark: SparkSession) -> SparkSession:
    """Session clone with few shuffle partitions for the STATEFUL stream
    queries: every stateful operator allocates state stores per shuffle
    partition, and at fixture scale the store setup dominates the batch.
    A real deployment sizes partitions to state volume instead."""
    s2 = spark.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "8")
    return s2



def _run_to_memory(
    agg: DataFrame, mode: str = "complete", metric_name: str | None = None
) -> DataFrame:
    name = f"mv_{uuid.uuid4().hex[:10]}"
    ckpt = tempfile.mkdtemp(prefix="bspark_ckpt_")
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if metric_name is not None:
        batch_ms = 0.0
        for prog in q.recentProgress:
            batch_ms += float((prog.get("durationMs") or {}).get("addBatch", 0))
        LAST_BATCH_SECONDS[metric_name] = round(batch_ms / 1000.0, 4)
    return agg.sparkSession.table(name)


@register(
    "stream_hourly_counts",
    oracle="""
    SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
           event_type, count(*) AS n
    FROM events GROUP BY 1, 2
    """,
)
def stream_hourly_counts(spark: SparkSession, sf: str) -> DataFrame:
    spark = _stream_session(spark)
    stream = events_file_stream(spark, sf)
    return _run_to_memory(hourly_counts(stream), metric_name="stream_hourly_counts")


@register(
    "mv_rollup_rewrite",
    oracle="""
    SELECT o_orderstatus,
           count(*)          AS n_orders,
           round(sum(o_totalprice), 2) AS total,
           max(o_totalprice) AS biggest
    FROM orders GROUP BY o_orderstatus
    """,
)
def mv_rollup_rewrite(spark: SparkSession, sf: str) -> DataFrame:
    """Build an MV grouped by (status, priority), then answer the
    status-only query purely from the MV via rollup re-aggregation."""
    import hashlib

    from byconity_spark.engine.catalog import load_table

    tag = hashlib.md5(sf.encode()).hexdigest()[:8]
    mv = AggMaterializedView(
        name="orders_by_status_priority",
        source=lambda s: load_table(s, sf, "orders"),
        dims=["o_orderstatus", "o_orderpriority"],
        measures={
            "n_orders": ("count", "*"),
            "total": ("sum", "o_totalprice"),
            "biggest": ("max", "o_totalprice"),
        },
        target_path=f"/tmp/byconity_spark_mv/orders_sp_{tag}",
    )
    mv.refresh(spark)
    out = mv.answer(spark, ["o_orderstatus"], ["n_orders", "total", "biggest"])
    # round the re-aggregated double sum: partial-sum order differs between
    # engines by a few ulp, the contract is exact-to-cents
    return out.withColumn("total", F.round("total", 2))


@register(
    "stream_session_windows",
    oracle="""
    WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
    f AS (SELECT user_id, ts, value,
                 CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                      THEN 1 ELSE 0 END AS brk
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    s AS (SELECT user_id, ts, value,
                 sum(brk) OVER (PARTITION BY user_id ORDER BY ts, value
                                ROWS UNBOUNDED PRECEDING) AS sid
          FROM f)
    SELECT user_id,
           min(ts)                        AS session_start,
           max(ts) + INTERVAL 30 MINUTE   AS session_end,
           count(*)                       AS n_events,
           round(sum(value), 4)           AS sum_value
    FROM s GROUP BY user_id, sid
    """,
)
def stream_session_windows(spark: SparkSession, sf: str) -> DataFrame:
    spark = _stream_session(spark)
    stream = events_file_stream(spark, sf)
    out = _run_to_memory(
        session_windows(stream, gap="30 minutes"),
        metric_name="stream_session_windows",
    )
    # session sums of doubles are summation-order sensitive across engines
    return out.withColumn("sum_value", F.round("sum_value", 4))


@register(
    "stream_stateful_sessions",
    oracle="""
    WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
    f AS (SELECT user_id, event_id, ts, value,
                 CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                      THEN 1 ELSE 0 END AS brk
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    s AS (SELECT user_id, ts, value,
                 sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS sid
          FROM f),
    agg AS (SELECT user_id, sid,
                   min(ts)    AS session_start,
                   max(ts)    AS session_end,
                   count(*)   AS n_events,
                   round(sum(value), 4) AS sum_value
            FROM s GROUP BY user_id, sid)
    SELECT user_id, session_start, session_end, n_events, sum_value
    FROM agg
    QUALIFY sid < max(sid) OVER (PARTITION BY user_id)
    """,
)
def stream_stateful_sessions(spark: SparkSession, sf: str) -> DataFrame:
    """applyInPandasWithState sessionization: emits every CLOSED session
    (each user's final, still-open session stays in state — the oracle
    drops each user's last session to mirror the contract)."""
    from byconity_spark.streaming.stateful import stateful_sessionize

    spark = _stream_session(spark)
    stream = events_file_stream(spark, sf)
    out = _run_to_memory(
        stateful_sessionize(stream), mode="append",
        metric_name="stream_stateful_sessions",
    )
    return out.withColumn("sum_value", F.round("sum_value", 4))


@register(
    "stream_dedup_ingest",
    oracle="""
    WITH d AS (
      SELECT DISTINCT event_id FROM events
    )
    SELECT count(*) AS n_unique FROM d
    """,
)
def stream_dedup_ingest(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming ingest deduplication (the reference's dedup-on-ingest /
    ReplacingMergeTree semantics, src/Storages/MergeTree replacing merge):
    the stream UNIONS the source with itself (every row duplicated), then
    dropDuplicatesWithinWatermark('event_id') restores exactly-once rows.
    State is bounded by the watermark horizon — the Structured Streaming
    shape that survives unbounded streams."""
    spark = _stream_session(spark)
    s1 = events_file_stream(spark, sf)
    s2 = events_file_stream(spark, sf)
    doubled = s1.unionByName(s2)
    deduped = (
        doubled.withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    counted = deduped.groupBy().agg(F.count(F.lit(1)).alias("n_unique"))
    return _run_to_memory(counted, metric_name="stream_dedup_ingest")


# ---------------------------------------------- stream-stream interval join
# Spark-native bonus surface (the reference is ingestion-centric with no
# event-time join algebra — SURVEY §2.11): watermarked click->purchase
# interval join; availableNow drains the fixture in one batch, so the
# result equals the batch interval join the oracle runs.
@register(
    "stream_stream_join",
    oracle="""
    SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
           (epoch_us(CAST(p.ts AS TIMESTAMP))
            - epoch_us(CAST(c.ts AS TIMESTAMP))) // 1000000 AS gap_s
    FROM events c JOIN events p ON c.user_id = p.user_id
    WHERE c.event_type = 'click' AND p.event_type = 'purchase'
      AND CAST(p.ts AS TIMESTAMP) >= CAST(c.ts AS TIMESTAMP)
      AND CAST(p.ts AS TIMESTAMP) <= CAST(c.ts AS TIMESTAMP) + INTERVAL 30 MINUTE
    """,
)
def stream_stream_join(spark: SparkSession, sf: str) -> DataFrame:
    spark = _stream_session(spark)
    s = events_file_stream(spark, sf)
    clicks = (
        s.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    purchases = (
        s.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("user_id"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        F.expr(
            "c_user = user_id AND purchase_ts >= click_ts "
            "AND purchase_ts <= click_ts + interval 30 minutes"
        ),
    ).select(
        "user_id",
        "click_id",
        "purchase_id",
        (
            (F.unix_micros("purchase_ts") - F.unix_micros("click_ts"))
            / F.lit(1_000_000)
        )
        .cast("long")
        .alias("gap_s"),
    )
    return _run_to_memory(
        joined, mode="append", metric_name="stream_stream_join"
    )


@register(
    "stream_mv_to_table",
    oracle="""
    SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
           event_type, count(*) AS n, round(sum(value), 4) AS total
    FROM events GROUP BY 1, 2
    """,
)
def stream_mv_to_table(spark: SparkSession, sf: str) -> DataFrame:
    """ByConity's ``MATERIALIZED VIEW ... TO table`` shape (reference
    StorageMaterializedView: the MV continuously maintains a physical
    target table): streaming rollup -> foreachBatch overwrite of a parquet
    target -> the QUERY then reads the TARGET TABLE, not the stream.
    Restart-safe: the overwrite is idempotent per epoch, so a replayed
    batch converges to the same table."""
    spark2 = _stream_session(spark)
    stream = events_file_stream(spark2, sf)
    agg = stream.groupBy(
        F.to_date("ts").alias("day"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total")
    )
    target = tempfile.mkdtemp(prefix="bspark_mvt_")
    ckpt = tempfile.mkdtemp(prefix="bspark_ckpt_")

    def write_batch(df: DataFrame, epoch_id: int) -> None:
        df.write.mode("overwrite").parquet(target)

    q = (
        agg.writeStream.foreachBatch(write_batch)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    batch_ms = 0.0
    for prog in q.recentProgress:
        batch_ms += float((prog.get("durationMs") or {}).get("addBatch", 0))
    LAST_BATCH_SECONDS["stream_mv_to_table"] = round(batch_ms / 1000.0, 4)
    return spark2.read.parquet(target)


@register(
    "stream_topk_trending",
    oracle="""
    WITH c AS (SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
                      event_type, count(*) AS n
               FROM events GROUP BY 1, 2)
    SELECT hour, event_type, n, CAST(rnk AS INTEGER) AS rnk
    FROM (SELECT hour, event_type, n,
                 row_number() OVER (PARTITION BY hour
                                    ORDER BY n DESC, event_type) AS rnk
          FROM c)
    WHERE rnk <= 2
    """,
)
def stream_topk_trending(spark: SparkSession, sf: str) -> DataFrame:
    """Trending top-K: a STREAMING windowed count feeds a batch rank over
    the materialized aggregate (the LiveView pattern — continuous counts,
    rank computed at read time; ranks inside the streaming query itself
    would need complete-mode re-emission of every window)."""
    from pyspark.sql import Window

    spark2 = _stream_session(spark)
    stream = events_file_stream(spark2, sf)
    agg = stream.groupBy(
        F.window("ts", "1 hour").alias("w"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    counts = _run_to_memory(agg, metric_name="stream_topk_trending").select(
        F.col("w.start").alias("hour"), "event_type", "n"
    )
    rk = Window.partitionBy("hour").orderBy(F.desc("n"), F.asc("event_type"))
    return (
        counts.withColumn("rnk", F.row_number().over(rk))
        .filter(F.col("rnk") <= 2)
        .select("hour", "event_type", "n", "rnk")
    )


# --------------------------------------------------------------------------
# Watermark late-data DROP proof (reference: streaming ingestion discards
# events older than the consumer's high-water mark; Spark analogue:
# withWatermark + append-mode windowed aggregation).  TWO sequential
# checkpointed availableNow runs against the same parquet sink (the
# exactly-once restart pattern): run 1 drains the recent half and advances
# the checkpointed watermark to max(ts) - 1h; run 2 feeds rows >3 days
# older — every one lands in an already-finalized window and MUST be
# dropped.  The persistent sink therefore holds ONLY run-1 days whose
# window end the watermark passed — an exact SQL oracle.
# --------------------------------------------------------------------------
@register(
    "stream_watermark_late_drop",
    oracle="""
    SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day,
           count(*) AS n
    FROM events
    WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-08 00:00:00'
      AND date_trunc('day', CAST(ts AS TIMESTAMP)) < TIMESTAMP '2024-01-30 00:00:00'
    GROUP BY 1
    """,
)
def stream_watermark_late_drop(spark: SparkSession, sf: str) -> DataFrame:
    import hashlib
    import os
    import shutil

    from byconity_spark.engine.catalog import load_table

    spark = _stream_session(spark)
    tag = hashlib.md5(sf.encode()).hexdigest()[:8]
    base = f"/tmp/byconity_spark_wm_{tag}"
    feed, out, ckpt = f"{base}/feed", f"{base}/out", f"{base}/ckpt"
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(feed, exist_ok=True)

    ev = load_table(spark, sf, "events").select("ts", "event_id")
    recent = ev.filter(F.col("ts") >= F.lit("2024-01-08").cast("timestamp"))
    late = ev.filter(F.col("ts") < F.lit("2024-01-05").cast("timestamp"))

    def land(df, name: str) -> None:
        tmp = f"{base}/_stage_{name}"
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        shutil.move(os.path.join(tmp, part), os.path.join(feed, name))
        shutil.rmtree(tmp, ignore_errors=True)

    def drain(metric: bool) -> None:
        stream = spark.readStream.schema("ts timestamp, event_id long").parquet(feed)
        agg = (
            stream.withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 day").alias("w"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").alias("day"), "n")
        )
        q = (
            agg.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        if metric:
            batch_ms = 0.0
            for prog in q.recentProgress:
                batch_ms += float((prog.get("durationMs") or {}).get("addBatch", 0))
            LAST_BATCH_SECONDS["stream_watermark_late_drop"] = round(
                batch_ms / 1000.0, 4
            )

    land(recent, "0_recent.parquet")
    drain(metric=False)
    land(late, "1_late.parquet")
    drain(metric=True)
    return spark.read.parquet(out)
