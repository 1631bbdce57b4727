"""Extremes rows: ClickHouse ``SET extremes=1`` emits min/max rows for the
numeric result columns alongside the result (reference:
src/QueryPlan/ExtremesStep.h:22).

Spark mapping: one extra single-pass aggregate producing two tagged rows —
computed map-side-partial like any min/max, no extra scan of the result."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def extremes(df: DataFrame, numeric_cols: list[str]) -> DataFrame:
    """Two rows tagged row_type='min'/'max' holding per-column extremes."""
    agg = df.agg(
        *[F.min(c).alias(f"__lo_{c}") for c in numeric_cols],
        *[F.max(c).alias(f"__hi_{c}") for c in numeric_cols],
    )
    lo = agg.select(
        F.lit("min").alias("row_type"),
        *[F.col(f"__lo_{c}").alias(c) for c in numeric_cols],
    )
    hi = agg.select(
        F.lit("max").alias("row_type"),
        *[F.col(f"__hi_{c}").alias(c) for c in numeric_cols],
    )
    return lo.unionByName(hi)
