"""Token skip index + file-level scan pruning (reference
MergeTreeIndexFullText.h tokenbf_v1 / MergeTreeIndexInverted.h, consumed
by MergeTreeDataSelectExecutor granule skipping)."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from byconity_spark.engine.skip_index import (
    _has_token_cond,
    build_token_index,
    pruned_token_scan,
)
from pyspark.sql import functions as F
from tests.conftest import SF_DIR


@pytest.fixture()
def layout(spark):
    """documents re-laid-out as 32 files + its token index."""
    base = tempfile.mkdtemp(prefix="bspark_skipidx_")
    data, idx = f"{base}/docs", f"{base}/idx"
    (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .repartition(32, "doc_id")
        .write.mode("overwrite")
        .parquet(data)
    )
    build_token_index(spark, data, "text", idx)
    yield data, idx
    shutil.rmtree(base, ignore_errors=True)


def test_pruned_scan_is_exact_and_prunes(spark, layout):
    data, idx = layout
    df, scanned, total = pruned_token_scan(spark, data, "text", "dup", idx)
    got = sorted(r[0] for r in df.select("doc_id").collect())
    want = sorted(
        r[0]
        for r in spark.read.parquet(data)
        .where(_has_token_cond(F.col("text"), "dup"))
        .select("doc_id")
        .collect()
    )
    assert got == want and len(got) > 0
    # 'dup' occurs in <=26 documents -> at most 26 of the 32 files can
    # contain it; the index must have skipped the rest
    assert scanned < total
    assert total == 32


def test_token_bounded_not_substring(spark, layout):
    data, idx = layout
    # 'qu' is a substring of 'query' in most docs but never a bounded
    # token -> the exact predicate returns nothing
    df, scanned, _ = pruned_token_scan(spark, data, "text", "qu", idx)
    assert df.count() == 0 and scanned == 0


def test_missing_token_scans_nothing(spark, layout):
    data, idx = layout
    df, scanned, total = pruned_token_scan(
        spark, data, "text", "zzznotoken", idx
    )
    assert df.count() == 0 and scanned == 0 and total == 32
