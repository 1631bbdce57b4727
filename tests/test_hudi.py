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
    write_replacecommit_file,
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


C4 = "20240104000000000"


def test_replacecommit_retires_old_file_groups(spark, cow):
    """Round-8 advisory regression: a clustering replacecommit rewrites
    file groups under NEW fileIds — the retired groups must vanish from
    the snapshot or every clustered row is returned twice."""
    rows = pd.DataFrame({"k": [1, 2, 3], "name": ["a", "b", "c"]})
    # cluster partition r=0: new group fg-c replaces fg-0
    write_replacecommit_file(
        cow, "r=0", "fg-c", C4, rows.assign(v=4),
        replaces={"r=0": ["fg-0"]},
    )
    files = hudi_snapshot_files(cow)
    assert any(f"fg-c_0-0-0_{C4}" in f for f in files)
    assert not any("fg-0_" in f for f in files)  # retired group gone
    df = hudi_cow_table(spark, cow, partition_types={"r": "int"})
    got = {(row["r"], row["k"]): row["v"] for row in df.collect()}
    assert len(got) == 6  # no duplicate rows
    assert got[(0, 1)] == 4 and got[(1, 1)] == 1


def test_replacecommit_time_travel_before_keeps_old_groups(spark, cow):
    rows = pd.DataFrame({"k": [1], "name": ["a"]})
    write_replacecommit_file(
        cow, "r=0", "fg-c", C4, rows.assign(v=4),
        replaces={"r=0": ["fg-0"]},
    )
    # read pinned BEFORE the replacecommit: fg-0 still visible
    files = hudi_snapshot_files(cow, as_of=C2)
    assert any(f"fg-0_0-0-0_{C2}" in f for f in files)
    assert not any("fg-c_" in f for f in files)


def test_inflight_replacecommit_is_invisible(cow):
    rows = pd.DataFrame({"k": [1], "name": ["a"]})
    write_replacecommit_file(
        cow, "r=0", "fg-c", C4, rows.assign(v=4),
        replaces={"r=0": ["fg-0"]}, complete=False,
    )
    files = hudi_snapshot_files(cow)
    # neither the new group nor the retirement applies
    assert any(f"fg-0_0-0-0_{C2}" in f for f in files)
    assert not any("fg-c_" in f for f in files)


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
