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


def _sql_list(values: list) -> str:
    out = []
    for v in values:
        if isinstance(v, str):
            escaped = v.replace("'", "''")
            out.append(f"'{escaped}'")
        else:
            out.append(str(v))
    return ", ".join(out)
