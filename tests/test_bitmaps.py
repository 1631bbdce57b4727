"""Bitmap algebra unit tests (set semantics over the binary encoding)."""

from __future__ import annotations

from pyspark.sql import functions as F

from byconity_spark.udafs.bitmaps import (
    bitmap_and,
    bitmap_andnot,
    bitmap_cardinality,
    bitmap_contains,
    bitmap_subset_in_range,
    bitmap_to_array,
    bitmap_xor,
    group_bitmap,
)


def test_bitmap_build_and_algebra(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("a", 2), ("a", 5), ("b", 2), ("b", 3), ("b", 5)],
        "g string, v long",
    )
    bm = group_bitmap(df, ["g"], "v")
    wide = (
        bm.filter(F.col("g") == "a")
        .select(F.col("bm").alias("bm_a"))
        .crossJoin(bm.filter(F.col("g") == "b").select(F.col("bm").alias("bm_b")))
    )
    r = wide.select(
        bitmap_to_array(F.col("bm_a")).alias("arr_a"),
        bitmap_cardinality(F.col("bm_a")).alias("card_a"),
        bitmap_to_array(bitmap_and(F.col("bm_a"), F.col("bm_b"))).alias("and_ab"),
        bitmap_to_array(bitmap_xor(F.col("bm_a"), F.col("bm_b"))).alias("xor_ab"),
        bitmap_to_array(bitmap_andnot(F.col("bm_a"), F.col("bm_b"))).alias("diff_ab"),
        bitmap_contains(F.col("bm_a"), 5).alias("has5"),
        bitmap_contains(F.col("bm_a"), 9).alias("has9"),
        bitmap_to_array(bitmap_subset_in_range(F.col("bm_a"), 2, 5)).alias("rng"),
    ).collect()[0]
    assert r.arr_a == [1, 2, 5] and r.card_a == 3
    assert r.and_ab == [2, 5]
    assert r.xor_ab == [1, 3]
    assert r.diff_ab == [1]
    assert r.has5 is True and r.has9 is False
    assert r.rng == [2]


def test_bitmap_empty(spark):
    df = spark.createDataFrame([("a", 1)], "g string, v long")
    bm = group_bitmap(df, ["g"], "v")
    r = bm.select(
        bitmap_cardinality(bitmap_subset_in_range(F.col("bm"), 100, 200)).alias("n")
    ).collect()[0]
    assert r.n == 0


def test_roaring_codec_roundtrip_and_compression():
    """Roaring layout: exact round-trip on hostile shapes, dense ranges
    compress far below 8 B/value, and no input ever beats the plain-array
    fallback ceiling."""
    import numpy as np
    from byconity_spark.udafs.bitmaps import _MAGIC, _MAGIC_PLAIN, _encode, _decode

    rng = np.random.default_rng(7)
    cases = [
        np.empty(0, dtype=np.int64),
        np.array([0], dtype=np.int64),
        np.array([-1], dtype=np.int64),
        np.array([-(2**40), -70000, -1, 0, 1, 65535, 65536, 2**40], dtype=np.int64),
        np.arange(5_000_000, 5_300_000, dtype=np.int64),  # bitset containers
        np.unique(rng.integers(-(2**40), 2**40, 5000)),   # plain fallback
        np.unique(rng.integers(0, 10_000_000, 50_000)),   # mixed containers
    ]
    for a in cases:
        a = np.unique(a)
        enc = _encode(a)
        assert np.array_equal(_decode(enc), a)
        assert len(enc) <= 1 + 8 * a.size  # never worse than plain
        if a.size:
            assert enc[0] in (_MAGIC, _MAGIC_PLAIN)
    dense = np.arange(0, 200_000, dtype=np.int64)
    assert len(_encode(dense)) < dense.size  # ~1 bit/value, << 8 B/value
    sparse = np.unique(rng.integers(-(2**40), 2**40, 5000))
    assert _encode(sparse)[0] == _MAGIC_PLAIN


# ----------------------------------------------- expression calculation

def test_bitmap_expr_parser():
    from byconity_spark.udafs.bitmaps import BitmapExprError, _parse_bitmap_expr

    assert _parse_bitmap_expr("a&b") == [("tag", "a"), ("tag", "b"), "&"]
    # reference semantics: ALL operators reduce left-to-right with EQUAL
    # precedence (AggregateBitmapExpressionCommon.h subExpression), so
    # a|b&c is (a|b)&c
    assert _parse_bitmap_expr("a|b&c") == [
        ("tag", "a"), ("tag", "b"), "|", ("tag", "c"), "&",
    ]
    assert _parse_bitmap_expr("(a|b)&c") == [
        ("tag", "a"), ("tag", "b"), "|", ("tag", "c"), "&",
    ]
    # ',' is a union alias
    assert _parse_bitmap_expr("a,b") == [("tag", "a"), ("tag", "b"), ","]
    import pytest as _pytest

    with _pytest.raises(BitmapExprError):
        _parse_bitmap_expr("a&(b")
    with _pytest.raises(BitmapExprError):
        _parse_bitmap_expr("a b")


def test_bitmap_expression_end_to_end(spark):
    from byconity_spark.udafs.bitmaps import bitmap_expression, group_bitmap
    from pyspark.sql import functions as F

    rows = [("a", i) for i in range(10)] + [("b", i) for i in range(5, 15)] + [
        ("c", i) for i in (3, 7, 99)
    ]
    df = spark.createDataFrame(rows, "tag string, uid long")
    states = group_bitmap(df, ["tag"], "uid").withColumnRenamed("bm", "bm")
    out = bitmap_expression(states, "a&b~c", tag_col="tag", bm_col="bm")
    [r] = out.collect()
    # a&b = {5..9}; minus c{3,7,99} -> {5,6,8,9}
    assert r.cardinality == 4


def test_bitmap_join_ops_and_left(spark):
    """bitmapJoin semantics (reference AggregateFunctionBitMapJoin.h):
    AND/OR/XOR/ANDNOT/RANDNOT kernels and LEFT join vs empty right."""
    from byconity_spark.udafs.bitmaps import bitmap_join, group_bitmap

    left = spark.createDataFrame(
        [("k1", i) for i in range(10)] + [("k2", i) for i in range(5)],
        "k string, uid long",
    )
    right = spark.createDataFrame(
        [("k1", i) for i in range(5, 15)], "k string, uid long"
    )
    ls, rs = group_bitmap(left, ["k"], "uid"), group_bitmap(right, ["k"], "uid")

    def card(op, how="inner"):
        return {
            r.k: r.cardinality
            for r in bitmap_join(ls, rs, ["k"], logic_op=op, how=how).collect()
        }

    assert card("AND") == {"k1": 5}           # {5..9}
    assert card("OR") == {"k1": 15}           # {0..14}
    assert card("XOR") == {"k1": 10}          # {0..4, 10..14}
    assert card("ANDNOT") == {"k1": 5}        # {0..4}
    assert card("RANDNOT") == {"k1": 5}       # {10..14}
    # LEFT: k2 has no right side -> empty bitmap partner
    got = card("ANDNOT", how="left")
    assert got == {"k1": 5, "k2": 5}          # k2 keeps all 5
    assert card("AND", how="left")["k2"] == 0

    import pytest as _p
    with _p.raises(ValueError):
        bitmap_join(ls, rs, ["k"], logic_op="NAND")


def test_bitmap_scalar_breadth(spark):
    """bitmapMin/Max, HasAll/HasAny, xor/andnot cardinality, transform,
    subsetLimit, subBitmap, emptyBitmap (FunctionsBitmap.cpp surface)."""
    from pyspark.sql import functions as F

    from byconity_spark.udafs.bitmaps import (
        bitmap_andnot_cardinality,
        bitmap_cardinality,
        bitmap_has_all,
        bitmap_has_any,
        bitmap_max,
        bitmap_min,
        bitmap_subset_limit,
        bitmap_to_array,
        bitmap_transform,
        bitmap_xor_cardinality,
        empty_bitmap,
        group_bitmap,
    )

    df = spark.createDataFrame(
        [(1, v) for v in [1, 3, 5, 7, 9]] + [(2, v) for v in [3, 4]],
        "g int, v long",
    )
    bms = group_bitmap(df, ["g"], "v")  # (g, bm)
    a = bms.filter("g = 1").select(F.col("bm").alias("a"))
    b = bms.filter("g = 2").select(F.col("bm").alias("b"))
    row = a.crossJoin(b).select(
        bitmap_min(F.col("a")).alias("mn"),
        bitmap_max(F.col("a")).alias("mx"),
        bitmap_has_all(F.col("a"), F.col("b")).alias("all_ab"),
        bitmap_has_any(F.col("a"), F.col("b")).alias("any_ab"),
        bitmap_xor_cardinality(F.col("a"), F.col("b")).alias("xc"),
        bitmap_andnot_cardinality(F.col("a"), F.col("b")).alias("ac"),
        bitmap_to_array(
            bitmap_transform(F.col("a"), [1, 3], [100, 300])
        ).alias("tr"),
        bitmap_to_array(bitmap_subset_limit(F.col("a"), 3, 2)).alias("sl"),
        bitmap_cardinality(empty_bitmap()).alias("ec"),
    ).first()
    assert (row.mn, row.mx) == (1, 9)
    assert row.all_ab is False and row.any_ab is True
    assert row.xc == 5  # {1,5,7,9,4}
    assert row.ac == 4  # {1,5,7,9}
    assert row.tr == [5, 7, 9, 100, 300]
    assert row.sl == [3, 5]
    assert row.ec == 0


# ------------------------------------------ BitMapColumn* folds (round 6)
def test_bitmap_column_folds(spark):
    import pandas as pd
    from pyspark.sql import functions as F
    from byconity_spark.udafs.bitmaps import (
        group_bitmap, bitmap_column_fold, bitmap_column_cardinality,
        bitmap_column_has, bitmap_to_array,
    )
    rows = pd.DataFrame({
        "g": ["a"] * 3 + ["b"] * 3,
        "tag": ["t1", "t1", "t2", "t1", "t2", "t2"],
        "m": [1, 2, 2, 10, 10, 11],
    })
    df = spark.createDataFrame(rows)
    states = group_bitmap(df, ["g", "tag"], "m")  # (a,t1)={1,2} (a,t2)={2} ...
    ored = bitmap_column_fold(states, ["g"], "bm", "or")
    anded = bitmap_column_fold(states, ["g"], "bm", "and")
    got_or = {r["g"]: sorted(r["arr"]) for r in
              ored.select("g", bitmap_to_array(F.col("bm")).alias("arr")).collect()}
    got_and = {r["g"]: sorted(r["arr"]) for r in
               anded.select("g", bitmap_to_array(F.col("bm")).alias("arr")).collect()}
    assert got_or == {"a": [1, 2], "b": [10, 11]}
    assert got_and == {"a": [2], "b": [10]}
    card = {r["g"]: r["cardinality"]
            for r in bitmap_column_cardinality(states, ["g"]).collect()}
    assert card == {"a": 2, "b": 2}
    has = {r["g"]: r["has"]
           for r in bitmap_column_has(states, ["g"], "bm", 1).collect()}
    assert has == {"a": 1, "b": 0}
