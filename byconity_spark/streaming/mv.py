"""Materialized views: full + partition-level refresh over parquet targets.

Reference: StorageMaterializedView.h:37 (MV), refresh API :129-168,
RefreshSchedule.h (async partition-based refresh), PartitionTransformer.h.

Spark mapping: an MV is (build_fn, target_path, partition column).  Full
refresh = overwrite CTAS; partition refresh = dynamic partition overwrite of
only the requested partitions (the executor never touches other partition
dirs — same cost profile as the reference's partition-based refresh)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass
class MaterializedView:
    name: str
    build: Callable[[SparkSession], DataFrame]  # the MV SELECT
    target_path: str
    partition_by: list[str] | None = None

    def refresh_full(self, spark: SparkSession) -> None:
        df = self.build(spark)
        writer = df.write.mode("overwrite")
        if self.partition_by:
            writer = writer.partitionBy(*self.partition_by)
        writer.parquet(self.target_path)

    def refresh_partitions(self, spark: SparkSession, values: list) -> None:
        """Rebuild only the given partition values (dynamic overwrite)."""
        if not self.partition_by:
            raise ValueError("partition refresh requires partition_by")
        col = self.partition_by[0]
        df = self.build(spark).filter(f"`{col}` IN ({_sql_list(values)})")
        (
            df.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(*self.partition_by)
            .parquet(self.target_path)
        )

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.target_path)


@dataclass
class AggMaterializedView:
    """Aggregate MV with ROLLUP REWRITE (reference:
    src/Optimizer/Rewriter/MaterializedViewRewriter.h — the query-rewrite
    capability Catalyst lacks): the MV stores measures grouped by ``dims``;
    any query grouping by a SUBSET of dims with the same measures is
    answered by RE-AGGREGATING THE MV (sum of sums, sum of counts, min of
    mins, max of maxes; avg = re-derived from sum+count) — never touching
    the fact table.  At 100 TB that turns a fact scan into an MV scan that
    is smaller by the rollup factor."""

    name: str
    source: Callable[[SparkSession], DataFrame]
    dims: list[str]
    #: measure name -> (op, source column); op in {sum, count, min, max}
    measures: dict[str, tuple[str, str]]
    target_path: str

    _REAGG = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}

    def refresh(self, spark: SparkSession) -> None:
        from pyspark.sql import functions as F

        src = self.source(spark)
        aggs = []
        for out, (op, col) in self.measures.items():
            fn = getattr(F, op)
            aggs.append(
                (fn(F.lit(1)) if op == "count" and col == "*" else fn(col)).alias(out)
            )
        src.groupBy(*self.dims).agg(*aggs).write.mode("overwrite").parquet(
            self.target_path
        )

    def answer(
        self, spark: SparkSession, group_cols: list[str], measure_names: list[str]
    ) -> DataFrame:
        """Answer GROUP BY group_cols ⊆ dims with the requested measures
        from the MV alone."""
        from pyspark.sql import functions as F

        missing = set(group_cols) - set(self.dims)
        if missing:
            raise ValueError(f"MV {self.name} cannot answer: dims {missing} not stored")
        mv = spark.read.parquet(self.target_path)
        aggs = []
        for mname in measure_names:
            op, _ = self.measures[mname]
            aggs.append(getattr(F, self._REAGG[op])(mname).alias(mname))
        return mv.groupBy(*group_cols).agg(*aggs)


def _sql_list(values: list) -> str:
    out = []
    for v in values:
        if isinstance(v, str):
            escaped = v.replace("'", "''")
            out.append(f"'{escaped}'")
        else:
            out.append(str(v))
    return ", ".join(out)
