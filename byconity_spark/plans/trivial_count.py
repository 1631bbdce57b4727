"""Trivial count: answer count(*) from parquet footer metadata without
scanning data — ByConity's OptimizeTrivialCount rewrite
(src/Optimizer/Rewriter/OptimizeTrivialCount.h,
src/QueryPlan/ReadStorageRowCountStep.h:13).

Spark does NOT do this for count(*) over parquet (it runs a scan with an
empty schema); reading footers via pyarrow.dataset touches metadata only —
O(#files) driver-side work, zero executor data movement.  At 100 TB the
footer pass is the same listing the scan planner already performs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def trivial_count(spark: SparkSession, path: str) -> DataFrame:
    import pyarrow.dataset as ds

    from byconity_spark.engine.localdf import local_df

    n = ds.dataset(path, format="parquet").count_rows()
    return local_df(spark, [(n,)], "n_rows bigint")


def table_row_count(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return trivial_count(spark, f"{sf_dir}/{table}.parquet")
