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
