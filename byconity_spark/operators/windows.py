"""Window-frame operators Spark lacks natively.

GROUPS frames (reference: WindowTransform.cpp frame-type GROUPS,
src/Processors/Transforms/WindowTransform.cpp) count frame bounds in PEER
GROUPS (distinct sort-key values) rather than rows or value range.  Spark
supports only ROWS and RANGE — but a GROUPS frame is exactly a RANGE frame
over ``dense_rank``: every peer group collapses to one integer, so
``RANGE BETWEEN p PRECEDING AND f FOLLOWING`` on that integer includes
precisely the rows whose group distance is within [-p, +f].

Scale: one extra window pass (the dense_rank) over the same partitioning —
no additional shuffle; both windows sort once per partition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F

GROUP_COL = "__peer_group"


def with_groups_frame(
    df: DataFrame,
    partition_by: list[str],
    order_by: str,
    preceding: int,
    following: int,
) -> tuple[DataFrame, WindowSpec]:
    """Attach a peer-group index and return (df, window) where aggregates
    over the window see a ``GROUPS BETWEEN preceding PRECEDING AND
    following FOLLOWING`` frame.  Drop ``GROUP_COL`` after aggregating."""
    w_rank = Window.partitionBy(*partition_by).orderBy(order_by)
    staged = df.withColumn(GROUP_COL, F.dense_rank().over(w_rank))
    frame = (
        Window.partitionBy(*partition_by)
        .orderBy(GROUP_COL)
        .rangeBetween(-preceding, following)
    )
    return staged, frame


def groups_frame_agg(
    df: DataFrame,
    partition_by: list[str],
    order_by: str,
    aggs: dict[str, Column],
    preceding: int = 1,
    following: int = 1,
) -> DataFrame:
    """df + one output column per (alias -> aggregate Column) evaluated over
    the GROUPS frame."""
    staged, frame = with_groups_frame(df, partition_by, order_by, preceding, following)
    for alias, agg in aggs.items():
        staged = staged.withColumn(alias, agg.over(frame))
    return staged.drop(GROUP_COL)
