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
