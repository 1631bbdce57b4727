"""Aggregation shapes Spark lacks as single calls.

  * with_totals — ClickHouse ``GROUP BY ... WITH TOTALS``
    (reference: src/QueryPlan/TotalsHavingStep.h:29, parser
    src/Parsers/ParserSelectQuery.cpp:215).
  * limit_by   — ClickHouse ``LIMIT n BY key`` (src/QueryPlan/LimitByStep.h:23).

Scale notes: with_totals reuses Spark's Expand (same machinery as rollup), so
the grand-total row is computed in the same single aggregation pass — no
second scan, no driver-side union. limit_by is the window-rank formulation
Catalyst rewrites into a partial top-N below the shuffle (Spark 3.5
InferWindowGroupLimit — the same optimization as ByConity's
FilterWindowToPartitionTopN.h).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def with_totals(df: DataFrame, keys: list[str], aggs: list[Column]) -> DataFrame:
    """GROUP BY keys WITH TOTALS: grouped rows plus one grand-total row
    (keys NULL), computed in one pass via rollup + grouping_id filter."""
    gid = F.grouping_id(*[F.col(k) for k in keys])
    full = 0  # all keys present
    total = (1 << len(keys)) - 1  # all keys rolled up
    return (
        df.rollup(*keys)
        .agg(*aggs, gid.alias("__gid"))
        .filter(F.col("__gid").isin(full, total))
        .drop("__gid")
    )


def limit_by(
    df: DataFrame, keys: list[str], order: list[Column], n: int, offset: int = 0
) -> DataFrame:
    """LIMIT n [OFFSET m] BY keys — top-n rows per key group."""
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") > offset) & (F.col("__rn") <= offset + n))
        .drop("__rn")
    )


def sum_map(
    df: DataFrame, group_cols: list[str], key_col: str, val_col: str
) -> DataFrame:
    """ClickHouse ``sumMap(key, value)``: per group, sum values by key and
    return parallel key-sorted arrays (reference:
    AggregateFunctionSumMap; SURVEY §2.4 arrays/containers family).

    Plan: groupBy(group, key) partial-aggregates map-side, then one
    collect per group — the per-group state is bounded by key cardinality,
    never by row count."""
    per_key = df.groupBy(*group_cols, key_col).agg(F.sum(val_col).alias("__v"))
    pairs = per_key.select(
        *group_cols, F.struct(F.col(key_col).alias("k"), F.col("__v").alias("v")).alias("__kv")
    )
    return (
        pairs.groupBy(*group_cols)
        .agg(F.sort_array(F.collect_list("__kv")).alias("__kvs"))
        .select(
            *group_cols,
            F.col("__kvs.k").alias("sum_map_keys"),
            F.col("__kvs.v").alias("sum_map_values"),
        )
    )


def merge_stream_stack(
    df: DataFrame,
    group_cols: list[str],
    stack_col: str,
) -> DataFrame:
    """MergeStreamStack (reference AggregateFunctionStackGraph.h
    MergeSteamStackData): merge array<struct<k, v>> stack curves by
    element-wise SUM of values, requiring identical key vectors — the
    "combine per-stream stacked graphs into one" step.

    Scale shape: posexplode + groupBy(group, k) partial-sums map-side
    (unlike collect-then-fold, this combines before the shuffle), then one
    bounded collect_list per group rebuilds the ordered curve.  Key
    mismatch surfaces as differing per-key row counts, checked with one
    aggregate rather than the reference's per-merge exception."""
    n_rows = df.groupBy(*group_cols).count().withColumnRenamed("count", "__n")
    exploded = df.select(
        *group_cols, F.explode(F.col(stack_col)).alias("__cell")
    ).select(*group_cols, F.col("__cell.k").alias("__k"), F.col("__cell.v").alias("__v"))
    summed = exploded.groupBy(*group_cols, "__k").agg(
        F.sum("__v").alias("__v"), F.count(F.lit(1)).alias("__cnt")
    )
    checked = summed.join(n_rows, group_cols)
    bad = checked.filter(F.col("__cnt") != F.col("__n"))
    # contract check (cheap: runs over the tiny per-key aggregate)
    if bad.limit(1).count() > 0:
        raise ValueError(
            "MergeStreamStack requires identical key vectors across merged rows"
        )
    return (
        checked.select(
            *group_cols, F.struct(F.col("__k").alias("k"), F.col("__v").alias("v")).alias("__kv")
        )
        .groupBy(*group_cols)
        .agg(F.sort_array(F.collect_list("__kv")).alias(stack_col))
    )
