"""HLL -State/-Merge sketch properties: estimate accuracy, merge
associativity (split-build-merge == whole-build), and idempotence."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from byconity_spark.udafs.sketches import (
    HLL_M,
    _estimate,
    _registers_from_hashes,
    uniq_estimate,
    uniq_merge,
    uniq_state,
)


def _hashes(seed: int, n: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(-(2**63), 2**63 - 1, size=n, dtype=np.int64)


@pytest.mark.parametrize("n", [100, 5_000, 200_000])
def test_estimate_within_5_sigma(n):
    regs = _registers_from_hashes(_hashes(7, n))
    est = _estimate(regs)
    sigma = 1.04 / np.sqrt(HLL_M)
    assert abs(est - n) <= max(5 * sigma * n, 3), (est, n)


def test_merge_equals_whole_build():
    h = _hashes(11, 50_000)
    whole = _registers_from_hashes(h)
    a = _registers_from_hashes(h[:20_000])
    b = _registers_from_hashes(h[20_000:])
    merged = np.maximum(a, b)
    assert np.array_equal(whole, merged)


def test_merge_idempotent():
    regs = _registers_from_hashes(_hashes(13, 10_000))
    assert np.array_equal(np.maximum(regs, regs), regs)


def test_state_merge_dataframe_roundtrip(spark):
    df = spark.range(0, 20_000).select(
        (F.col("id") % 4).alias("g"),
        (F.col("id") % 3000).alias("v"),
    )
    states = uniq_state(df, ["g"], "v")
    merged = uniq_merge(states.withColumn("all", F.lit(1)).drop("g"), ["all"])
    [row] = merged.select(uniq_estimate(F.col("uniq_state")).alias("est")).collect()
    assert abs(row.est - 3000) / 3000 < 0.05


# ------------------------------------------------------------------ theta

from byconity_spark.udafs.sketches import (  # noqa: E402
    THETA_K,
    _theta_estimate,
    _theta_from_hashes,
    _theta_merge_arrays,
)


@pytest.mark.parametrize("n", [100, 1000, 100_000])
def test_theta_estimate_accuracy(n):
    h = _hashes(23, n)
    state = np.frombuffer(_theta_from_hashes(h), dtype=np.uint64)
    est = _theta_estimate(state)
    if n < THETA_K:
        assert est == len(np.unique(h))  # exact below k
    else:
        assert abs(est - n) <= 5 / np.sqrt(THETA_K) * n


def test_theta_merge_equals_whole():
    h = _hashes(29, 50_000)
    whole = _theta_from_hashes(h)
    a = np.frombuffer(_theta_from_hashes(h[:20_000]), dtype=np.uint64)
    b = np.frombuffer(_theta_from_hashes(h[20_000:]), dtype=np.uint64)
    # merge of halves must equal the whole-build sketch EXACTLY: the k
    # smallest of the union of per-half k-smallest = global k smallest
    assert _theta_merge_arrays([a, b]) == whole


def test_uniq_state_skips_nulls(spark):
    """ClickHouse uniq ignores NULL values; xxhash64(NULL) returning the
    seed must not leak one phantom distinct (ADVICE r03)."""
    from byconity_spark.udafs.sketches import uniq_estimate, uniq_merge, uniq_state

    rows = [(1, "a"), (1, "b"), (1, None), (2, None), (2, None)]
    df = spark.createDataFrame(rows, "g int, v string")
    est = (
        uniq_merge(uniq_state(df, ["g"], "v"), ["g"])
        .select("g", uniq_estimate("uniq_state").alias("u"))
        .collect()
    )
    got = {r.g: r.u for r in est}
    assert got[1] == 2  # 'a','b' — NULL not counted
    assert got[2] == 0  # all-NULL group counts zero


def test_adaptive_histogram_invariants(spark):
    """histogram(n) (reference AggregateFunctionHistogram.h): bin count
    <= n, total weight preserved, weighted mean preserved, means sorted."""
    import numpy as np
    from byconity_spark.udafs.sketches import (
        adaptive_histogram,
        adaptive_histogram_core,
    )

    rng = np.random.default_rng(3)
    vals = rng.normal(50, 10, 5000)
    bins = adaptive_histogram_core(vals, np.ones(len(vals)), 10)
    assert len(bins) == 10
    assert abs(sum(w for _, w in bins) - 5000) < 1e-6
    assert abs(sum(m * w for m, w in bins) - vals.sum()) < 1e-4 * abs(vals.sum())
    means = [m for m, _ in bins]
    assert means == sorted(means)

    df = spark.createDataFrame(
        [(int(i % 3), float(v)) for i, v in enumerate(vals[:3000])], "g int, v double"
    )
    out = adaptive_histogram(df, ["g"], "v", max_bins=8).collect()
    assert len(out) == 3
    for r in out:
        assert r.n_bins <= 8
        assert abs(sum(float(x) for x in r.bin_weights.split("|")) - 1000) < 1e-6


# ------------------------------------------- theta set algebra (round 6)
def test_theta_set_algebra_exact_small(spark):
    """Below THETA_K nothing is discarded (theta=1.0), so union/intersect/
    not are EXACT set operations on the distinct hash sets."""
    import pandas as pd
    from pyspark.sql import functions as F
    from byconity_spark.udafs.sketches import (
        theta_state, theta_union_col, theta_intersect_col, theta_not_col,
        theta_set_estimate,
    )
    df = spark.createDataFrame(pd.DataFrame({
        "g": ["a"] * 60 + ["b"] * 60,
        "v": [f"x{i}" for i in range(60)] + [f"x{i}" for i in range(40, 100)],
    }))
    states = theta_state(df, ["g"], "v")
    wide = (states.filter(F.col("g") == "a").select(F.col("theta_state").alias("sa"))
            .crossJoin(states.filter(F.col("g") == "b")
                       .select(F.col("theta_state").alias("sb"))))
    row = wide.select(
        theta_set_estimate(theta_union_col(F.col("sa"), F.col("sb"))).alias("u"),
        theta_set_estimate(theta_intersect_col(F.col("sa"), F.col("sb"))).alias("i"),
        theta_set_estimate(theta_not_col(F.col("sa"), F.col("sb"))).alias("d"),
    ).collect()[0]
    assert row["u"] == 100   # |A ∪ B|
    assert row["i"] == 20    # |{x40..x59}|
    assert row["d"] == 40    # |A \ B|


def test_theta_set_algebra_estimates_at_scale(spark):
    """Above THETA_K the ops carry an explicit theta; estimates stay within
    the documented ~1/sqrt(k) band."""
    from pyspark.sql import functions as F
    from byconity_spark.udafs.sketches import (
        theta_state, theta_union_col, theta_intersect_col, theta_set_estimate,
    )
    n = 20_000
    df = spark.range(n).select(
        F.when(F.col("id") < n // 2, "a").otherwise("b").alias("g"),
        # 25% overlap between the two halves
        F.concat(F.lit("v"), (F.col("id") % int(n * 0.625)).cast("string")).alias("v"),
    )
    states = theta_state(df, ["g"], "v")
    wide = (states.filter(F.col("g") == "a").select(F.col("theta_state").alias("sa"))
            .crossJoin(states.filter(F.col("g") == "b")
                       .select(F.col("theta_state").alias("sb"))))
    row = wide.select(
        theta_set_estimate(theta_union_col(F.col("sa"), F.col("sb"))).alias("u"),
        theta_set_estimate(theta_intersect_col(F.col("sa"), F.col("sb"))).alias("i"),
    ).collect()[0]
    true_union = int(n * 0.625)
    assert abs(row["u"] - true_union) / true_union < 0.15
    assert row["i"] > 0


def test_uniq_theta_names_registered():
    from byconity_spark.functions.registry import registered_names
    names = set(registered_names()["scalar"])
    assert {"uniqThetaUnion", "uniqThetaIntersect", "uniqThetaNot"} <= names
