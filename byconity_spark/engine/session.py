"""SparkSession factory tuned for OLAP workloads.

ByConity gets its performance from vectorized execution, partition/PK
pruning, partial aggregation pushed below exchanges, and a CBO picking
broadcast-vs-repartition joins (reference: src/Optimizer/PlanOptimizer.cpp,
src/Interpreters/Aggregator.cpp).  On Spark all of those are Catalyst /
Tungsten features that just need the right session configuration; this module
is the single place where we turn them on.

Scale notes (100 TB target):
  * AQE is enabled so shuffle partition counts, skew-join splitting and
    broadcast demotion/promotion are decided from *runtime* statistics, which
    is what survives a 1000x scale-up — static tuning does not.
  * ``spark.sql.shuffle.partitions`` is only the pre-AQE upper bound; on a
    real cluster set it to ~2-3x total cores, AQE coalesces down.
  * Arrow is enabled for every Python<->JVM hop so the pandas-UDF kernels
    (funnel/bitmap/minhash) move columnar batches, not pickled rows.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(app_name: str = "byconity-spark", extra_conf: dict | None = None) -> SparkSession:
    """Build (or fetch) the session with OLAP-grade defaults."""
    cpus = _default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        # --- adaptive execution: runtime re-planning (replaces ByConity's
        # cost-based exchange placement, src/Optimizer/Rewriter/AddExchange.h)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.localShuffleReader.enabled", "true")
        # --- shuffle sizing: upper bound; AQE coalesces. 2x cores locally.
        .config("spark.sql.shuffle.partitions", str(max(32, cpus)))
        .config("spark.default.parallelism", str(max(32, cpus)))
        # --- scan-level pushdown (ByConity PushIntoTableScanRules.h analogue)
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushDown", "true")
        .config("spark.sql.parquet.recordLevelFilter.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "128m")
        # --- python/JVM transport: Arrow everywhere
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "50000")
        # --- deterministic timestamps: match the DuckDB oracle (naive UTC)
        .config("spark.sql.session.timeZone", "UTC")
        # --- nanosecond parquet timestamps (events.ts is TIMESTAMP(NANOS)):
        # Spark has no ns timestamp type; read the physical INT64 as long and
        # the catalog converts to microsecond TimestampType (floor division,
        # same truncation DuckDB applies casting TIMESTAMP_NS -> TIMESTAMP)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # --- broadcast threshold: dims (region/nation/supplier/part) always
        # broadcast; AQE may promote larger sides at runtime
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        # --- JVM heap: local mode folds driver+executors into ONE JVM whose
        # default 1g heap cannot hold a 64m-compressed broadcast build
        # (found by tools/scale_probe.py at sf1: q18/minhash OOM'd in
        # BroadcastExchange).  Applies only when this factory launches the
        # JVM; on a real cluster the submit config owns these.
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
        )
        .config("spark.driver.maxResultSize", "4g")
        # --- runtime (bloom) filters, ByConity AddRuntimeFilters.h analogue
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        # --- cost-based optimizer: join reorder from ANALYZE statistics
        # (ByConity CardinalityEstimator.h analogue; see engine/stats.py)
        .config("spark.sql.cbo.enabled", "true")
        .config("spark.sql.cbo.joinReorder.enabled", "true")
        .config("spark.sql.cbo.planStats.enabled", "true")
        # --- bucketed (CLUSTER BY) tables live under /tmp, not the repo
        .config("spark.sql.warehouse.dir", "/tmp/byconity_spark_warehouse")
        # --- keep the StateStore maintenance thread from firing during/after
        # shutdown: its "SparkEnv not active" stacktrace used to land in
        # stderr AFTER bench.py's JSON line, corrupting the bench artifact.
        # Local runs are short; snapshot maintenance adds nothing here.
        .config("spark.sql.streaming.stateStore.maintenanceInterval", "1h")
        # quiet progress bars in benchmark output
        .config("spark.ui.showConsoleProgress", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
