"""Bitmap aggregate family — ByConity's audience-analytics workhorse.

Reference: BitMap64 type (src/DataTypes/DataTypeBitMap64.h:25,
src/Columns/ColumnBitMap64.h), aggregates
src/AggregateFunctions/AggregateFunctionGroupBitmap.h, scalar algebra
src/Functions/FunctionsBitmap.cpp (bitmapAnd/Or/Xor/Cardinality/Contains/
ToArray/SubsetInRange).

Encoding: a bitmap is a BinaryType column holding a SORTED, DE-DUPLICATED
int64 array (numpy little-endian bytes).  The reference uses CRoaring; the
container here has no roaring library, so the encoding is the portable
sorted-set form — same semantics, O(n) set algebra via numpy merge ops, and
a single swap point (`_encode`/`_decode`) to drop in roaring later.

Scale: bitmap state is bounded by the per-group member count; build is one
shuffle on the group keys with partial pre-aggregation impossible for raw
ids — so for 100 TB builds, pre-bucket ids (e.g. by id range) and OR the
bucket bitmaps, exactly the reference's BitMap64 sharding guidance
(SURVEY §7 hard parts)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _encode(a: np.ndarray) -> bytes:
    return np.asarray(a, dtype="<i8").tobytes()


def _decode(b: bytes | None) -> np.ndarray:
    if b is None or len(b) == 0:
        return np.empty(0, dtype="<i8")
    return np.frombuffer(b, dtype="<i8")


def group_bitmap(
    df: DataFrame, group_cols: list[str], value_col: str
) -> DataFrame:
    """groupBitmapState: per group, the bitmap of distinct values
    (reference AggregateFunctionGroupBitmap.h)."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        keys = {c: [pdf[c].iloc[0]] for c in group_cols}
        vals = np.unique(pdf[value_col].dropna().to_numpy(dtype=np.int64))
        keys["bm"] = [_encode(vals)]
        return pd.DataFrame(keys)

    key_schema = ", ".join(
        f"{c} {df.schema[c].dataType.simpleString()}" for c in group_cols
    )
    return (
        df.select(*group_cols, value_col)
        .groupBy(*group_cols)
        .applyInPandas(kernel, schema=f"{key_schema}, bm binary")
    )


def _binary_op(op: str):
    @F.pandas_udf(T.BinaryType())
    def f(a: pd.Series, b: pd.Series) -> pd.Series:
        out = []
        for x, y in zip(a, b):
            xa, ya = _decode(x), _decode(y)
            if op == "and":
                r = np.intersect1d(xa, ya)
            elif op == "or":
                r = np.union1d(xa, ya)
            elif op == "xor":
                r = np.setxor1d(xa, ya)
            else:  # andnot
                r = np.setdiff1d(xa, ya)
            out.append(_encode(r))
        return pd.Series(out)

    return f


bitmap_and: Column = _binary_op("and")
bitmap_or: Column = _binary_op("or")
bitmap_xor: Column = _binary_op("xor")
bitmap_andnot: Column = _binary_op("andnot")


@F.pandas_udf(T.LongType())
def bitmap_cardinality(a: pd.Series) -> pd.Series:
    return a.map(lambda b: len(_decode(b)))


@F.pandas_udf(T.LongType())
def bitmap_and_cardinality(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series(
        [len(np.intersect1d(_decode(x), _decode(y))) for x, y in zip(a, b)]
    )


@F.pandas_udf(T.LongType())
def bitmap_or_cardinality(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series([len(np.union1d(_decode(x), _decode(y))) for x, y in zip(a, b)])


def bitmap_contains(bm: Column, value: int) -> Column:
    @F.pandas_udf(T.BooleanType())
    def f(a: pd.Series) -> pd.Series:
        return a.map(lambda b: bool(np.isin(value, _decode(b))))

    return f(bm)


@F.pandas_udf(T.ArrayType(T.LongType()))
def bitmap_to_array(a: pd.Series) -> pd.Series:
    return a.map(lambda b: _decode(b).tolist())


def bitmap_subset_in_range(bm: Column, lo: int, hi: int) -> Column:
    """bitmapSubsetInRange: members in [lo, hi)."""

    @F.pandas_udf(T.BinaryType())
    def f(a: pd.Series) -> pd.Series:
        def g(b):
            v = _decode(b)
            return _encode(v[(v >= lo) & (v < hi)])

        return a.map(g)

    return f(bm)
