"""Write-path workload: CTAS round-trip and unique-key upsert round-trip,
both verified against SQL oracles computed directly on the source tables —
proving write + read-back preserves content exactly.

Write targets live under /tmp (unique per scale factor) and are overwritten
on every run, so repeated correctness/bench runs are idempotent.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from byconity_spark.engine.catalog import load_table
from byconity_spark.engine.write import create_table_as, read_back, upsert_by_key
from byconity_spark.workloads import register


def _tmp(sf: str, tag: str) -> str:
    h = hashlib.md5(sf.encode()).hexdigest()[:8]
    return f"/tmp/byconity_spark_writes/{tag}_{h}"


# ------------------------------------------------------ CTAS round-trip
@register(
    "write_ctas_roundtrip",
    oracle="""
    SELECT l_returnflag, count(*) AS n, sum(l_quantity) AS qty,
           min(CAST(l_shipdate AS DATE)) AS first_ship
    FROM lineitem
    WHERE l_shipdate >= DATE '1997-06-01'
    GROUP BY l_returnflag
    """,
)
def write_ctas_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem").filter(
        F.col("l_shipdate") >= F.lit("1997-06-01").cast("date")
    )
    path = _tmp(sf, "ctas_lineitem")
    # partition by the low-cardinality flag, sort within partitions by
    # shipdate (MergeTree PARTITION BY + ORDER BY analogue)
    create_table_as(li, path, partition_by=["l_returnflag"], sort_by=["l_shipdate"])
    back = read_back(spark, path)
    return back.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("l_quantity").alias("qty"),
        F.min(F.col("l_shipdate").cast("date")).alias("first_ship"),
    )


# --------------------------------------------- unique-key upsert round-trip
@register(
    "write_upsert_roundtrip",
    oracle="""
    WITH base AS (
      SELECT o_orderkey, o_totalprice, 0 AS version FROM orders
    ),
    updates AS (
      SELECT o_orderkey, o_totalprice * 1.1 AS o_totalprice, 1 AS version
      FROM orders WHERE o_orderkey % 3 = 0
    ),
    merged AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY o_orderkey
                                     ORDER BY version DESC) AS rn
        FROM (SELECT * FROM base UNION ALL SELECT * FROM updates)
      ) WHERE rn = 1
    )
    SELECT count(*) AS n_rows,
           sum(o_totalprice) AS total,
           count(*) FILTER (WHERE version = 1) AS n_updated
    FROM merged
    """,
)
def write_upsert_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    base = o.select("o_orderkey", "o_totalprice", F.lit(0).alias("version"))
    updates = (
        o.filter(F.col("o_orderkey") % 3 == 0)
        .select(
            "o_orderkey",
            (F.col("o_totalprice") * 1.1).alias("o_totalprice"),
            F.lit(1).alias("version"),
        )
    )
    merged = upsert_by_key(base, updates, key_cols=["o_orderkey"], version_col="version")
    path = _tmp(sf, "upsert_orders")
    create_table_as(merged, path)
    back = read_back(spark, path)
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("o_totalprice").alias("total"),
        F.count(F.when(F.col("version") == 1, 1)).alias("n_updated"),
    )
