"""Ordering-related operators: WITH FILL gap-filling and WITH TIES.

Reference: ORDER BY ... WITH FILL — src/QueryPlan/FillingStep.h:24,
src/Processors/Transforms/FillingTransform.h; LIMIT WITH TIES —
src/QueryPlan/LimitStep.h:25.

Scale notes: the fill spine is generated distributively with ``F.sequence``
over the (tiny, 1-row) bounds aggregate and joined back — never a driver
loop. For very long ranges the spine explodes into at most
(range/step) rows, which partitions like any other table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fill_time_series(
    df: DataFrame,
    ts_col: str,
    step_expr: str = "interval 1 hour",
    fill_values: dict[str, object] | None = None,
    group_keys: list[str] | None = None,
) -> DataFrame:
    """ORDER BY ts WITH FILL STEP <step>: densify a time axis between the
    observed min and max, left-joining real rows and filling gaps.

    With ``group_keys``, densifies per group (cross join of per-group bounds
    with the spine).
    """
    keys = group_keys or []
    bounds = (
        df.groupBy(*keys).agg(
            F.min(ts_col).alias("__lo"), F.max(ts_col).alias("__hi")
        )
        if keys
        else df.agg(F.min(ts_col).alias("__lo"), F.max(ts_col).alias("__hi"))
    )
    spine = bounds.select(
        *keys,
        F.explode(
            F.sequence(F.col("__lo"), F.col("__hi"), F.expr(step_expr))
        ).alias(ts_col),
    )
    out = spine.join(df, on=[*keys, ts_col], how="left")
    if fill_values:
        out = out.fillna(fill_values)
    return out


def limit_with_ties(df: DataFrame, order: list[Column], n: int) -> DataFrame:
    """LIMIT n WITH TIES: rank()<=n keeps peers of the n-th row."""
    from pyspark.sql import Window

    w = Window.orderBy(*order)
    return df.withColumn("__rk", F.rank().over(w)).filter(F.col("__rk") <= n).drop("__rk")
