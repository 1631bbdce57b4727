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
    SELECT l_returnflag, count(*) AS n, round(sum(l_quantity), 2) AS qty,
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
        F.round(F.sum("l_quantity"), 2).alias("qty"),
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
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total,
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
        F.sum(F.col("o_totalprice").cast("decimal(18,4)")).cast("double").alias("total"),
        F.count(F.when(F.col("version") == 1, 1)).alias("n_updated"),
    )


# ------------------------------------------------- mutation round-trip
@register(
    "write_mutation_roundtrip",
    oracle="""
    -- post-mutation state, stated relationally: DELETE the 1998 high
    -- quantities, then UPDATE discounts on RETURN rows
    WITH after_delete AS (
      SELECT * FROM lineitem
      WHERE NOT (l_quantity > 45 AND l_shipdate >= DATE '1998-01-01')
    ),
    after_update AS (
      SELECT l_returnflag,
             CASE WHEN l_returnflag = 'R' THEN 0.0 ELSE l_discount END AS l_discount,
             l_extendedprice
      FROM after_delete
    )
    SELECT l_returnflag, count(*) AS n,
           round(sum(l_discount), 4) AS disc, CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS price
    FROM after_update GROUP BY l_returnflag
    """,
)
def write_mutation_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """ALTER TABLE DELETE + UPDATE mutations (engine/write.py:delete_where/
    update_where; reference MutationCommands.h): copy lineitem out
    partitioned by returnflag, mutate, read back and aggregate."""
    from byconity_spark.engine.write import delete_where, update_where

    li = load_table(spark, sf, "lineitem").select(
        "l_returnflag", "l_quantity", "l_shipdate", "l_discount", "l_extendedprice"
    )
    path = _tmp(sf, "mut_lineitem")
    create_table_as(li, path, partition_by=["l_returnflag"])
    delete_where(
        spark,
        path,
        "l_quantity > 45 AND l_shipdate >= DATE '1998-01-01'",
        partition_by=["l_returnflag"],
    )
    update_where(
        spark,
        path,
        "l_returnflag = 'R'",
        {"l_discount": "0.0"},
        partition_by=["l_returnflag"],
    )
    back = read_back(spark, path)
    return back.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_discount"), 4).alias("disc"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).cast("double").alias("price"),
    )


# ----------------------------------------- OPTIMIZE (small-file compaction)
@register(
    "write_optimize_compaction",
    oracle="""
    SELECT o_orderstatus, count(*) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
    FROM orders GROUP BY o_orderstatus
    """,
)
def write_optimize_compaction(spark: SparkSession, sf: str) -> DataFrame:
    """Write orders fragmented into many small files, OPTIMIZE-compact them,
    and prove the data survives byte-exactly (MergeTree background-merge
    analogue; reference MergeTreeDataMergerMutator.h)."""
    from byconity_spark.engine.write import optimize_table

    o = load_table(spark, sf, "orders")
    path = _tmp(sf, "optimize_orders")
    # fragment: 64 tiny files
    o.repartition(64).write.mode("overwrite").parquet(path)
    report = optimize_table(spark, path, target_file_mb=128, sort_by=["o_orderkey"])
    assert report["files_after"] < report["files_before"], report
    back = read_back(spark, path)
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,4)")).cast("double").alias("total"),
    )


@register(
    "write_optimize_dedup",
    oracle="""
    SELECT o_orderstatus, count(*) AS n
    FROM (SELECT DISTINCT * FROM orders) GROUP BY o_orderstatus
    """,
)
def write_optimize_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """OPTIMIZE TABLE ... DEDUPLICATE (reference ParserOptimizeQuery.cpp,
    ReplacingMergeTree merge-time dedup): write orders DOUBLED, compact
    with deduplicate=True, and prove exactly one copy survives."""
    from byconity_spark.engine.write import optimize_table

    o = load_table(spark, sf, "orders")
    path = _tmp(sf, "optimize_dedup_orders")
    o.unionByName(o).repartition(16).write.mode("overwrite").parquet(path)
    optimize_table(spark, path, deduplicate=True)
    back = read_back(spark, path)
    return back.groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n"))


# ------------------------------------------- schema evolution round-trip
@register(
    "write_schema_evolution",
    oracle="""
    SELECT o_orderstatus,
           count(*) AS n,
           count(CASE WHEN o_orderkey % 4 != 0 THEN 1 END) AS with_clerk,
           CAST(sum(CASE WHEN o_orderpriority = '1-URGENT'
                    THEN 1 ELSE 0 END) AS BIGINT) AS urgent
    FROM orders WHERE o_orderkey % 2 = 0
    GROUP BY o_orderstatus
    """,
)
def write_schema_evolution(spark: SparkSession, sf: str) -> DataFrame:
    """Schema evolution on the write path (reference: MergeTree ALTER ADD
    COLUMN — old parts serve NULL/default for the new column): v1 parts
    are written WITHOUT o_clerk, v2 parts add it; a mergeSchema read serves
    both generations, old rows surfacing NULL for the added column.  The
    oracle checks exactly that: count(o_clerk) counts only v2 rows."""
    o = load_table(spark, sf, "orders").filter(F.col("o_orderkey") % 2 == 0)
    v1 = o.filter(F.col("o_orderkey") % 4 == 0).select(
        "o_orderkey", "o_orderstatus", "o_orderpriority"
    )
    v2 = o.filter(F.col("o_orderkey") % 4 != 0).select(
        "o_orderkey",
        "o_orderstatus",
        "o_orderpriority",
        F.concat(F.lit("Clerk#"), (F.col("o_custkey") % 100).cast("string")).alias(
            "o_clerk"
        ),
    )
    path = _tmp(sf, "evolve")
    v1.write.mode("overwrite").parquet(path)
    v2.write.mode("append").parquet(path)
    back = spark.read.option("mergeSchema", "true").parquet(path)
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.count("o_clerk").alias("with_clerk"),
        F.sum((F.col("o_orderpriority") == "1-URGENT").cast("long")).alias("urgent"),
    )


# --------------------------------------------- partition pruning proof
@register(
    "write_partition_prune",
    oracle="""
    SELECT o_orderpriority, count(*) AS n,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority
    """,
)
def write_partition_prune(spark: SparkSession, sf: str) -> DataFrame:
    """Partition-pruned read of a hive-partitioned CTAS target: the filter
    on the PARTITION column must become a PartitionFilters entry (directory
    pruning — only the o_orderstatus=F subtree is listed/read, the
    MergeTree partition-pruning analogue).  Plan pinned by
    tests/test_plan_contracts.py."""
    o = load_table(spark, sf, "orders")
    path = _tmp(sf, "prune")
    create_table_as(
        o.select("o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice"),
        path,
        partition_by=["o_orderstatus"],
    )
    back = read_back(spark, path).filter(F.col("o_orderstatus") == "F")
    return back.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


# --------------------------------------------------------------------------
# Bucketed co-located join (reference bucket tables: CLUSTER BY keys,
# MergeTreeSettings.h:453 / BUCKET_REPARTITION ExchangeMode.h:34): two
# tables bucketed on the same key join WITHOUT an exchange on either side
# (plan pinned in tests/test_writes.py); this query certifies the VALUES
# coming back from the bucketed files against a plain-SQL oracle.
# --------------------------------------------------------------------------
@register(
    "write_bucketed_join",
    oracle="""
    SELECT c.c_mktsegment AS segment,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(o.o_totalprice), 2) AS total
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_orderkey % 5 = 0
    GROUP BY c.c_mktsegment
    """,
)
def write_bucketed_join(spark: SparkSession, sf: str) -> DataFrame:
    from byconity_spark.engine.write import create_bucketed_table

    tag = hashlib.md5(sf.encode()).hexdigest()[:8]
    o = load_table(spark, sf, "orders").filter(F.col("o_orderkey") % 5 == 0)
    c = load_table(spark, sf, "customer")
    create_bucketed_table(o, f"bjoin_orders_{tag}", 8, ["o_custkey"],
                          sort_cols=["o_custkey"])
    create_bucketed_table(c, f"bjoin_customer_{tag}", 8, ["c_custkey"],
                          sort_cols=["c_custkey"])
    ot = spark.table(f"bjoin_orders_{tag}")
    ct = spark.table(f"bjoin_customer_{tag}")
    joined = ot.join(ct, ot.o_custkey == ct.c_custkey)
    return joined.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )
