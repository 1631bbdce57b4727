"""Table/column statistics + cost-based optimization (ANALYZE TABLE).

ByConity's optimizer estimates cardinalities from collected statistics and
reorders joins accordingly (reference: src/Optimizer/CardinalityEstimate/
CardinalityEstimator.h, src/Statistics/StatisticsCollector.h, join-order
enumeration in src/Optimizer/JoinOrderUtils.h).  Spark's analogue is the
Catalyst CBO: ``ANALYZE TABLE ... COMPUTE STATISTICS [FOR COLUMNS ...]``
populates row counts / NDVs in the catalog, and with ``spark.sql.cbo.*``
enabled the optimizer picks the cheapest join order instead of the
syntactic one.

Scale notes: statistics collection is itself a distributed scan-aggregate
(one pass per ANALYZE), so it parallelizes like any query; at 100 TB you
run it once per ingest batch, not per query.  Plans over un-analyzed
tables silently fall back to size-in-bytes heuristics + AQE runtime
statistics — CBO here is additive, never required for correctness.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

CBO_CONFS = {
    "spark.sql.cbo.enabled": "true",
    "spark.sql.cbo.joinReorder.enabled": "true",
    "spark.sql.cbo.planStats.enabled": "true",
}

# join keys worth NDV stats per engine table (TPC-H-ish schema)
_KEY_COLUMNS = {
    "customer": "c_custkey, c_nationkey",
    "orders": "o_orderkey, o_custkey",
    "lineitem": "l_orderkey, l_partkey, l_suppkey",
    "supplier": "s_suppkey, s_nationkey",
    "part": "p_partkey",
    "nation": "n_nationkey, n_regionkey",
    "region": "r_regionkey",
}


def enable_cbo(spark: SparkSession) -> None:
    for k, v in CBO_CONFS.items():
        spark.conf.set(k, v)


def register_stats_tables(
    spark: SparkSession,
    sf_dir: str,
    tables: list[str],
    prefix: str = "cbo_",
    column_stats: bool = True,
) -> list[str]:
    """Expose parquet files as external catalog tables and ANALYZE them so
    the CBO has row counts (+ per-column NDV/min/max for join keys).

    Idempotent per (session, sf_dir): re-registering the same location is a
    cheap no-op apart from the ANALYZE scan.  Returns the catalog names.
    """
    enable_cbo(spark)
    names = []
    for t in tables:
        name = f"{prefix}{t}"
        loc = f"{sf_dir}/{t}.parquet"
        if spark.catalog.tableExists(name):
            # re-point if a different scale factor was registered before
            spark.sql(f"DROP TABLE IF EXISTS {name}")
        spark.sql(f"CREATE TABLE {name} USING parquet LOCATION '{loc}'")
        spark.sql(f"ANALYZE TABLE {name} COMPUTE STATISTICS")
        if column_stats and t in _KEY_COLUMNS:
            spark.sql(
                f"ANALYZE TABLE {name} COMPUTE STATISTICS "
                f"FOR COLUMNS {_KEY_COLUMNS[t]}"
            )
        names.append(name)
    return names


def table_row_stats(spark: SparkSession, name: str) -> int | None:
    """Row count recorded in the catalog by ANALYZE (None if absent)."""
    for row in spark.sql(f"DESC EXTENDED {name}").collect():
        if row.col_name == "Statistics" and "rows" in row.data_type:
            return int(row.data_type.split(",")[1].strip().split(" ")[0])
    return None
