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
