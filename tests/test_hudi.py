"""Hudi COW snapshot/time-travel reader (engine/hudi.py) — reference
registerStorages.cpp:33-103 CnchHudi via the Hive connector; layout per
the public Hudi table spec."""

from __future__ import annotations

import shutil

import pandas as pd
import pytest
from pyspark.sql import functions as F

from byconity_spark.engine.hudi import (
    hudi_completed_instants,
    hudi_cow_table,
    hudi_snapshot_files,
    write_cow_file,
)

C1, C2, C3 = "20240101000000000", "20240102000000000", "20240103000000000"


@pytest.fixture
def cow(tmp_path):
    base = str(tmp_path / "cow")
    shutil.rmtree(base, ignore_errors=True)
    rows = pd.DataFrame({"k": [1, 2, 3], "name": ["a", "b", "c"]})
    # commit 1: two file groups across two partitions
    write_cow_file(base, "r=0", "fg-0", C1, rows.assign(v=1))
    write_cow_file(base, "r=1", "fg-1", C1, rows.assign(v=1))
    # commit 2 rewrites fg-0 only
    write_cow_file(base, "r=0", "fg-0", C2, rows.assign(v=2))
    # inflight commit 3 touches fg-1 — must stay invisible
    write_cow_file(base, "r=1", "fg-1", C3, rows.assign(v=9), complete=False)
    return base


def test_timeline_excludes_inflight(cow):
    assert hudi_completed_instants(cow) == [C1, C2]


def test_snapshot_picks_latest_slice_per_group(cow):
    files = hudi_snapshot_files(cow)
    assert len(files) == 2
    assert any(f"fg-0_0-0-0_{C2}" in f for f in files)
    assert any(f"fg-1_0-0-0_{C1}" in f for f in files)


def test_snapshot_read_values(spark, cow):
    df = hudi_cow_table(spark, cow, partition_types={"r": "int"})
    got = {
        (row["r"], row["k"]): (row["v"], row["_hoodie_commit_time"])
        for row in df.collect()
    }
    assert len(got) == 6
    assert got[(0, 1)] == (2, C2)  # rewritten slice wins
    assert got[(1, 1)] == (1, C1)  # untouched group keeps commit-1 slice


def test_time_travel(spark, cow):
    df = hudi_cow_table(spark, cow, as_of=C1, partition_types={"r": "int"})
    vs = {row["v"] for row in df.collect()}
    assert vs == {1}
    with pytest.raises(ValueError, match="no completed file slices"):
        hudi_cow_table(spark, cow, as_of="20230101000000000")


def test_not_a_hudi_table(tmp_path):
    with pytest.raises(ValueError, match="no .hoodie timeline"):
        hudi_completed_instants(str(tmp_path))


def test_partition_filter_prunes_directories(spark, cow):
    """A filter on the discovered partition column must reach
    PartitionFilters — subtree pruning before any footer is opened."""
    df = hudi_cow_table(spark, cow, partition_types={"r": "int"}).filter(
        F.col("r") == 0
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    parts = plan.split("PartitionFilters")
    assert len(parts) > 1, "no PartitionFilters on the hudi scan"
    assert "r" in parts[1][:200]
