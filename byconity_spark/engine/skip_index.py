"""Token skip index with file-level scan pruning.

Reference: MergeTree secondary "data skipping" indexes —
``src/Storages/MergeTree/MergeTreeIndexFullText.h`` (tokenbf_v1 /
ngrambf_v1 bloom filters per granule) and ``MergeTreeIndexInverted.h``
(token → granule posting lists), consumed by
``MergeTreeDataSelectExecutor`` to drop granules before reading them.

Parquet has no granule-index hook, so the Spark-native translation works
at the FILE level, which is exactly the unit a 1000-executor cluster
schedules scans by:

* ``build_token_index`` — one distributed pass over the table: tag each
  row with ``input_file_name()``, tokenize the indexed column (alnum runs,
  lower-cased — the reference's tokenbf tokenizer splits on
  non-alphanumerics), and store the DISTINCT (file, token) pairs as a
  parquet posting-list table.  This is the inverted-index layout
  (exact, not a bloom) — still tiny relative to data (tokens × files,
  deduplicated) and itself a distributed dataset.
* ``pruned_token_scan`` — given a search token, read the posting list
  (filter pushes down on the token column), collect ONLY the matching
  file names (O(files) driver data, never rows), and scan just those
  files with the exact predicate re-applied.  Like the reference, the
  index only PRUNES; the residual filter keeps results exact, so a stale
  or lossy index can cost time, never correctness.

At 100 TB with, say, 100k files, a selective token turns a full scan into
a handful of file reads — the same win granule skipping gives MergeTree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# reference tokenbf tokenizer: maximal runs of [a-zA-Z0-9] (bytes in CH;
# unicode-alnum here, documented)
_TOKEN_RE = "[^a-zA-Z0-9]+"


def _has_token_cond(col, token: str):
    """Exact hasToken() predicate (reference FunctionsStringSearch
    hasToken): the token appears bounded by non-alphanumerics."""
    pat = f"(^|[^a-zA-Z0-9]){token}([^a-zA-Z0-9]|$)"
    return F.lower(col).rlike(pat)


def build_token_index(
    spark: SparkSession,
    data_path: str,
    column: str,
    index_path: str,
) -> int:
    """One distributed pass: (file, token) posting list → parquet at
    ``index_path``.  Returns the number of posting entries written."""
    df = spark.read.parquet(data_path)
    postings = (
        df.select(
            F.input_file_name().alias("file"),
            F.explode(
                F.split(F.lower(F.col(column)), _TOKEN_RE)
            ).alias("token"),
        )
        .where(F.col("token") != "")
        .distinct()
    )
    postings.write.mode("overwrite").parquet(index_path)
    return spark.read.parquet(index_path).count()


def pruned_token_scan(
    spark: SparkSession,
    data_path: str,
    column: str,
    token: str,
    index_path: str,
) -> tuple[DataFrame, int, int]:
    """Scan only the files whose posting list contains ``token``; the
    exact predicate is re-applied on top (index = pruning only).
    Returns (dataframe, files_scanned, files_total)."""
    token = token.lower()
    idx = spark.read.parquet(index_path)
    files = [
        r[0]
        for r in idx.where(F.col("token") == token)
        .select("file")
        .distinct()
        .collect()
    ]
    total = idx.select("file").distinct().count()
    if not files:
        empty = spark.read.parquet(data_path).where(F.lit(False))
        return empty, 0, total
    df = spark.read.parquet(*files).where(
        _has_token_cond(F.col(column), token)
    )
    return df, len(files), total
