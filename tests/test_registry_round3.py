"""Round-3 scalar registry additions: bitwise, gcd/lcm, array editing,
transform remap, IPv4, formatReadableSize."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from byconity_spark.functions import ch


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0].v


def test_bitwise(spark):
    a, b = F.lit(0b1100), F.lit(0b1010)
    assert _one(spark, ch("bitAnd", a, b)) == 0b1000
    assert _one(spark, ch("bitOr", a, b)) == 0b1110
    assert _one(spark, ch("bitXor", a, b)) == 0b0110
    assert _one(spark, ch("bitNot", F.lit(0))) == -1
    assert _one(spark, ch("bitShiftLeft", F.lit(3), 4)) == 48
    assert _one(spark, ch("bitShiftRight", F.lit(48), 4)) == 3
    assert _one(spark, ch("bitCount", F.lit(255))) == 8
    assert _one(spark, ch("bitTest", F.lit(5), 0)) == 1
    assert _one(spark, ch("bitTest", F.lit(5), 1)) == 0


@pytest.mark.parametrize(
    "a,b,g",
    [(12, 18, 6), (7, 13, 1), (0, 5, 5), (5, 0, 5), (-12, 18, 6), (270, 192, 6)],
)
def test_gcd_lcm(spark, a, b, g):
    assert _one(spark, ch("gcd", F.lit(a), F.lit(b))) == g
    if a and b:
        assert _one(spark, ch("lcm", F.lit(a), F.lit(b))) == abs(a * b) // g


def test_gcd_fibonacci_worst_case(spark):
    # consecutive Fibonacci numbers maximize Euclid step count
    fa, fb = 7540113804746346429, 4660046610375530309  # F(92), F(91)
    assert _one(spark, ch("gcd", F.lit(fa), F.lit(fb))) == 1


def test_array_editing(spark):
    arr = F.array(F.lit(1), F.lit(1), F.lit(2), F.lit(2), F.lit(1))
    assert _one(spark, ch("arrayCompact", arr)) == [1, 2, 1]
    assert _one(spark, ch("arrayPushBack", arr, F.lit(9))) == [1, 1, 2, 2, 1, 9]
    assert _one(spark, ch("arrayPushFront", arr, F.lit(9))) == [9, 1, 1, 2, 2, 1]
    assert _one(spark, ch("arrayPopBack", arr)) == [1, 1, 2, 2]
    assert _one(spark, ch("arrayResize", arr, F.lit(3))) == [1, 1, 2]
    assert _one(spark, ch("arrayResize", arr, F.lit(7), F.lit(0))) == [1, 1, 2, 2, 1, 0, 0]
    assert _one(spark, ch("countEqual", arr, F.lit(2))) == 2
    assert _one(spark, ch("indexOfAll", arr, F.lit(1))) == [1, 2, 5]
    assert _one(spark, ch("arrayEnumerateUniq", arr)) == [1, 2, 1, 2, 3]


def test_transform_remap(spark):
    out = ch(
        "transform",
        F.lit("b"),
        F.array(F.lit("a"), F.lit("b")),
        F.array(F.lit(1), F.lit(2)),
        F.lit(0),
    )
    assert _one(spark, out) == 2
    miss = ch(
        "transform",
        F.lit("z"),
        F.array(F.lit("a"), F.lit("b")),
        F.array(F.lit(1), F.lit(2)),
        F.lit(0),
    )
    assert _one(spark, miss) == 0


def test_ipv4(spark):
    n = 3232235777  # 192.168.1.1
    assert _one(spark, ch("IPv4NumToString", F.lit(n))) == "192.168.1.1"
    assert _one(spark, ch("IPv4StringToNum", F.lit("192.168.1.1"))) == n


def test_format_readable_size(spark):
    assert _one(spark, ch("formatReadableSize", F.lit(1024))) == "1.00 KiB"
    assert _one(spark, ch("formatReadableSize", F.lit(1536))) == "1.50 KiB"
    assert _one(spark, ch("formatReadableSize", F.lit(10))) == "10.00 B"
    assert _one(spark, ch("formatReadableSize", F.lit(5 * 1024**3))) == "5.00 GiB"


def test_misc(spark):
    assert _one(spark, ch("log1p", F.lit(0.0))) == 0.0
    assert _one(spark, ch("roundToExp2", F.lit(100))) == 64
    assert _one(spark, ch("isFinite", F.lit(1.5))) is True
    assert _one(spark, ch("isInfinite", F.lit(float("inf")))) is True
    assert _one(spark, ch("bin", F.lit(5))) == "101"
    assert _one(spark, ch("space", F.lit(3))) == "   "
    assert _one(
        spark, ch("roundDown", F.lit(7), F.array(F.lit(1), F.lit(5), F.lit(10)))
    ) == 5


def test_ndv_buckets_histogram_selectivity(spark, tmp_path):
    """NdvBuckets (reference src/Statistics/StatsNdvBuckets.h): the
    histogram beats the uniform span fraction on skewed data."""
    import os

    import byconity_spark.engine.stats as S

    pdf_dir = str(tmp_path / "sfx")
    os.makedirs(pdf_dir, exist_ok=True)
    # 90% of mass at small values, tail to 1000
    rows = [(i, float(i % 10)) for i in range(900)] + [
        (900 + i, float(1000 - i)) for i in range(100)
    ]
    spark.createDataFrame(rows, "id long, v double").write.mode(
        "overwrite"
    ).parquet(f"{pdf_dir}/skew.parquet")
    old = S.STATS_DIR
    S.STATS_DIR = str(tmp_path / "stats")
    try:
        st = S.analyze_table(spark, pdf_dir, "skew", refresh=True)
        cs = st.columns["v"]
        assert cs.buckets and len(cs.buckets) == S.N_BUCKETS
        assert sum(c for c, _ in cs.buckets) == 1000
        # v <= 125 captures the 900-row cluster; uniform span fraction
        # would claim ~12.5%
        est = S.estimate_rows(st, [("v", "<=", 125.0)])
        assert est > 800, est
        # bucket NDVs are populated and bounded by counts
        assert all(n <= c or c == 0 for c, n in cs.buckets)
    finally:
        S.STATS_DIR = old


def test_mann_whitney_partition_invariance(spark):
    """The distributed distinct-value rank decomposition must be exact
    under any partitioning (offsets + local prefixes == global ranks)."""
    from byconity_spark.udafs.behavioral import mann_whitney_u
    from pyspark.sql import functions as F

    df = spark.range(0, 2000).select(
        ((F.col("id") * 37) % 101).cast("double").alias("v"),
        (F.col("id") % 3 == 0).alias("lab"),
    )

    def run(d):
        r = mann_whitney_u(d, [], "v", F.col("lab")).first()
        return (round(r.u_stat, 6), round(r.z_score, 6))

    assert run(df) == run(df.repartition(17)) == run(df.coalesce(1))


def test_ndv_buckets_extend_equi_height(spark, tmp_path):
    """NdvBucketsExtend (StatsNdvBucketsExtend.h): equi-height bounds give
    accurate range selectivity on skewed data where even the equi-width
    histogram concentrates in one cell."""
    import os

    import byconity_spark.engine.stats as S

    pdf_dir = str(tmp_path / "sfy")
    os.makedirs(pdf_dir, exist_ok=True)
    rows = [(i, float(i % 10)) for i in range(990)] + [
        (990 + i, 1e6 + i) for i in range(10)
    ]
    spark.createDataFrame(rows, "id long, v double").write.mode(
        "overwrite"
    ).parquet(f"{pdf_dir}/skew2.parquet")
    old = S.STATS_DIR
    S.STATS_DIR = str(tmp_path / "stats")
    try:
        st = S.analyze_table(spark, pdf_dir, "skew2", refresh=True)
        cs = st.columns["v"]
        assert cs.bounds and len(cs.bounds) == S.N_BUCKETS
        assert cs.bounds == sorted(cs.bounds)
        # v <= 50 covers the 990-row cluster (99%); the quantile bounds
        # resolve it to within one bucket (>= 7/8), while the equi-width
        # span fraction would estimate ~0.04% (50 / 1e6 of the range)
        est = S.estimate_rows(st, [("v", "<=", 50.0)])
        assert est > 800, est
        cs.bounds = None  # force the equi-width path for comparison
        est_width = S.estimate_rows(st, [("v", "<=", 50.0)])
        assert est_width < 100 < est, (est_width, est)
    finally:
        S.STATS_DIR = old
