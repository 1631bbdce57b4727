"""Special table engines / table functions beyond file formats.

Reference: src/Storages/registerStorages.cpp (StorageMerge, StorageNull,
StorageJoin, StorageGenerateRandom), src/TableFunctions/TableFunctionMerge,
TableFunctionGenerateRandom, src/Functions/FunctionJoinGet.h.

Spark-first mappings:
  * merge(pattern)      -> unionByName over the catalog tables whose name
                           matches the regex (schema-aligned, missing
                           columns NULL) — one plan, predicate pushdown
                           reaches every branch scan.
  * generateRandom      -> spark.range + seeded column generators; fully
                           distributed, reproducible per (seed, n).
  * joinGet             -> broadcast lookup against a keyed dim frame (the
                           StorageJoin engine's read side).
  * null_sink           -> format("noop") write: discards rows (StorageNull).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def merge_tables(
    spark: SparkSession,
    tables: dict[str, DataFrame],
    pattern: str,
    with_table_col: bool = False,
) -> DataFrame:
    """merge('pattern'): union every table whose name matches the regex.
    Columns are aligned by NAME with missing ones NULL (the StorageMerge
    contract); `_table` virtual column optional, as in the reference."""
    rx = re.compile(pattern)
    picked = {n: df for n, df in tables.items() if rx.fullmatch(n)}
    if not picked:
        raise ValueError(f"merge: no table matches {pattern!r}")
    all_cols: list[str] = []
    for df in picked.values():
        for c in df.columns:
            if c not in all_cols:
                all_cols.append(c)
    out = None
    for name, df in picked.items():
        aligned = df.select(
            *[
                F.col(c) if c in df.columns else F.lit(None).alias(c)
                for c in all_cols
            ]
        )
        if with_table_col:
            aligned = aligned.withColumn("_table", F.lit(name))
        out = aligned if out is None else out.unionByName(aligned)
    return out


_RAND_GEN = {
    "bigint": lambda seed: (F.rand(seed) * (1 << 40)).cast("long"),
    "int": lambda seed: (F.rand(seed) * (1 << 31)).cast("int"),
    "double": lambda seed: F.rand(seed) * 1000.0,
    "string": lambda seed: F.concat(
        F.lit("s"), ((F.rand(seed) * 100000).cast("long")).cast("string")
    ),
    "boolean": lambda seed: F.rand(seed) > 0.5,
    "date": lambda seed: F.date_add(
        F.lit("2024-01-01").cast("date"), (F.rand(seed) * 365).cast("int")
    ),
    "timestamp": lambda seed: F.timestamp_seconds(
        F.lit(1_704_067_200) + (F.rand(seed) * 31_536_000).cast("long")
    ),
}


def generate_random(
    spark: SparkSession,
    schema: str,
    n_rows: int,
    seed: int = 42,
    num_partitions: int | None = None,
) -> DataFrame:
    """generateRandom('a Int64, b String', seed)(n): distributed synthetic
    rows.  Reproducible for a fixed (schema, n, seed, partitioning); each
    column draws from an independent seed stream."""
    struct = T.StructType.fromDDL(schema)
    base = (
        spark.range(n_rows, numPartitions=num_partitions)
        if num_partitions
        else spark.range(n_rows)
    )
    cols = []
    for i, field in enumerate(struct.fields):
        t = field.dataType.simpleString()
        gen = _RAND_GEN.get(t)
        if gen is None:
            raise ValueError(f"generateRandom: unsupported type {t!r}")
        cols.append(gen(seed + i * 1000003).alias(field.name))
    return base.select(*cols)


def join_get(
    df: DataFrame,
    join_table: DataFrame,
    value_col: str,
    key_expr: Column,
    key_col: str | None = None,
    default=None,
) -> DataFrame:
    """joinGet('join_table', 'value', key) (reference
    src/Functions/FunctionJoinGet.h over a StorageJoin engine table): fetch
    `value_col` from the keyed table for each row's key, default on miss.
    The join table is a pre-keyed dim — broadcast by hint; ANY-join
    semantics (one row per key assumed, first wins deterministically by
    value order)."""
    key_col = key_col or join_table.columns[0]
    dim = (
        join_table.groupBy(key_col)
        .agg(F.min(value_col).alias("__jv"))
        .withColumnRenamed(key_col, "__jk")
    )
    out = df.withColumn("__jk", key_expr).join(
        F.broadcast(dim), "__jk", "left"
    )
    val = F.col("__jv")
    if default is not None:
        val = F.coalesce(val, F.lit(default))
    return out.withColumn(f"joinGet_{value_col}", val).drop("__jk", "__jv")


def null_sink(df: DataFrame) -> None:
    """StorageNull write side: execute the plan, discard every row."""
    df.write.format("noop").mode("overwrite").save()
