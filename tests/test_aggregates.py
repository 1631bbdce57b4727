"""Bounds tests for the APPROXIMATE aggregate variants (different sketches
than DuckDB, so no hash oracle — instead assert error bounds vs exact)."""

from __future__ import annotations

from pyspark.sql import functions as F

from byconity_spark.engine.catalog import load_table
from byconity_spark.functions import ch
from tests.conftest import SF_DIR


def test_uniq_approx_within_bounds(spark):
    ev = load_table(spark, SF_DIR, "events")
    r = ev.agg(
        ch("uniq", F.col("user_id")).alias("approx"),
        ch("uniqExact", F.col("user_id")).alias("exact"),
    ).collect()[0]
    assert abs(r.approx - r.exact) <= max(2, 0.05 * r.exact)


def test_quantile_approx_close_to_exact(spark):
    ev = load_table(spark, SF_DIR, "events")
    r = ev.agg(
        ch("quantile", 0.5, F.col("value")).alias("approx"),
        ch("quantileExact", 0.5, F.col("value")).alias("exact"),
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
    ).collect()[0]
    assert abs(r.approx - r.exact) <= 0.05 * (r.hi - r.lo)


def test_quantiles_exact_vector(spark):
    df = spark.createDataFrame([(float(i),) for i in range(1, 101)], "v double")
    r = df.agg(ch("quantilesExact", [0.25, 0.5, 0.75], F.col("v")).alias("qs")).collect()[0]
    assert r.qs == [25.75, 50.5, 75.25]


def test_stack_combinator_cumulative(spark):
    """-Stack (reference AggregateFunctionStackGraph.h): cell i = nested
    agg over [start, start+(i+1)*step) — the cumulative resample."""
    from byconity_spark.functions import ch
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(k, float(k)) for k in range(10)], "k long, v double"
    )
    [row] = df.agg(ch("sumStack", 0, 9, 3, F.col("v"), F.col("k")).alias("s")).collect()
    cells = [(c.k, c.v) for c in row.s]
    assert cells == [(0, 3.0), (3, 15.0), (6, 36.0)]  # prefix sums of 0..2, 0..5, 0..8
    # count form (no value column)
    [row] = df.agg(ch("countStack", 0, 9, 3, F.col("k")).alias("s")).collect()
    assert [(c.k, c.v) for c in row.s] == [(0, 3), (3, 6), (6, 9)]


def test_merge_stream_stack_contract(spark):
    """MergeStreamStack: element-wise sum with identical keys; mismatched
    key vectors raise (reference throws BAD_ARGUMENTS)."""
    from byconity_spark.operators.aggregates import merge_stream_stack
    from pyspark.sql import functions as F
    import pytest as _p

    def stack(pairs):
        return [{"k": k, "v": float(v)} for k, v in pairs]

    ok = spark.createDataFrame(
        [("g", stack([(0, 1), (3, 2)])), ("g", stack([(0, 10), (3, 20)]))],
        "g string, curve array<struct<k: long, v: double>>",
    )
    [row] = merge_stream_stack(ok, ["g"], "curve").collect()
    assert [(c.k, c.v) for c in row.curve] == [(0, 11.0), (3, 22.0)]

    bad = spark.createDataFrame(
        [("g", stack([(0, 1)])), ("g", stack([(0, 1), (3, 2)]))],
        "g string, curve array<struct<k: long, v: double>>",
    )
    with _p.raises(ValueError):
        merge_stream_stack(bad, ["g"], "curve")
