"""Focused contract tests for elementwise_centroids (r12): per-group means
must match a numpy reference to float64 round-off across multi-partition
layouts, and be deterministic across reruns.  Pins the posexplode shape's
values so any future rewrite (a partial-sum version was measured 4x slower
at sf1 this round and rejected) must preserve them."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from byconity_spark.llm.similarity import elementwise_centroids


@pytest.fixture(scope="module")
def frame(spark):
    rng = np.random.RandomState(7)
    rows = [
        (int(i % 3), [float(x) for x in rng.uniform(-1, 1, 8)]) for i in range(40)
    ]
    return (
        spark.createDataFrame(rows, "label int, embedding array<double>")
        .repartition(5)
        .persist()
    )


def test_centroids_match_numpy(spark, frame):
    expect = {}
    for r in frame.collect():
        n, s = expect.get(r.label, (0, np.zeros(8)))
        expect[r.label] = (n + 1, s + np.array(r.embedding))
    got = {r.label: np.array(r.centroid) for r in elementwise_centroids(frame).collect()}
    assert set(got) == set(expect)
    for k, (n, s) in expect.items():
        assert np.max(np.abs(got[k] - s / n)) < 1e-12


def test_centroids_deterministic(spark, frame):
    new1 = {r.label: np.array(r.centroid) for r in elementwise_centroids(frame).collect()}
    new2 = {r.label: np.array(r.centroid) for r in elementwise_centroids(frame).collect()}
    assert set(new1) == set(new2)
    for k in new1:
        # determinism must be exact, not just close
        assert np.array_equal(new1[k], new2[k])


def test_centroids_single_partition_and_custom_cols(spark):
    df = spark.createDataFrame(
        [("a", [1.0, 2.0]), ("a", [3.0, 4.0]), ("b", [10.0, 20.0])],
        "g string, v array<double>",
    ).coalesce(1)
    got = {
        r.g: list(r.centroid)
        for r in elementwise_centroids(df, group_col="g", vec_col="v").collect()
    }
    assert got == {"a": [2.0, 3.0], "b": [10.0, 20.0]}
