"""Table writes: CTAS, INSERT-append, unique-key upsert.

Reference: TableWriteStep.h:9 / TableFinishStep.h:13 (INSERT SELECT),
MergeTreeDataWriter partition+sort-on-write (src/Storages/MergeTree/
MergeTreeDataWriter.h:82), unique-key upsert semantics
(src/Storages/UniqueKeyIndex.h:25, MergeTreeSettings.h:444).

Spark-first mapping:
  * MergeTree PARTITION BY + ORDER BY  ->  parquet partitionBy +
    sortWithinPartitions on write: the sorted layout gives parquet row-group
    min/max pruning the same role as the primary-key mark index.
  * unique-key table -> dedup-on-write: row_number over key ORDER BY version
    DESC keeps the latest row per key (one shuffle on the key).
  * transactional commit -> Spark's file-committer atomicity per write job
    (we do not rebuild MVCC; see SURVEY §3.2).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def create_table_as(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """CTAS to partitioned (+ optionally sorted-within-partition) parquet."""
    out = df
    if sort_by:
        out = out.sortWithinPartitions(*sort_by)
    writer = out.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def create_bucketed_table(
    df: DataFrame,
    name: str,
    n_buckets: int,
    bucket_cols: list[str],
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """CLUSTER BY analogue (reference: bucket-level keys
    MergeTreeSettings.h:453, BUCKET_REPARTITION ExchangeMode.h:34): a
    catalog table bucketed on the join/agg key.  Two tables bucketed the
    same way join WITHOUT a shuffle — the 100 TB co-located join strategy
    (verified by tests/test_writes.py: the join plan has no Exchange)."""
    if mode == "overwrite":
        # a previous session's managed-table directory survives the
        # in-memory catalog — clear both catalog entry and location
        spark = df.sparkSession
        spark.sql(f"DROP TABLE IF EXISTS `{name}`")
        warehouse = spark.conf.get("spark.sql.warehouse.dir", "")
        if warehouse.startswith("file:"):
            warehouse = warehouse[len("file:") :]
        loc = os.path.join(warehouse, name.lower())
        if warehouse and os.path.isdir(loc):
            shutil.rmtree(loc, ignore_errors=True)
    writer = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(name)


def insert_into(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """INSERT INTO semantics: append new files to an existing parquet table."""
    writer = df.write.mode("append")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def upsert_by_key(
    base: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    version_col: str,
) -> DataFrame:
    """Unique-key upsert: latest version per key wins (ties broken toward
    the updates side via a stable source marker).  One shuffle on the key —
    the same cost profile as the reference's bucket-level unique index."""
    tagged = base.withColumn("__src", F.lit(0)).unionByName(
        updates.withColumn("__src", F.lit(1))
    )
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(version_col).desc(), F.col("__src").desc()
    )
    return (
        tagged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__src")
    )


def read_back(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def _partition_values(spark: SparkSession, path: str, cond: str, partition_by: list[str]):
    """Distinct partition tuples of rows MATCHING cond (the mutation's
    blast radius)."""
    return (
        spark.read.parquet(path)
        .filter(cond)
        .select(*partition_by)
        .distinct()
        .collect()
    )


def _overwrite_partitions(df: DataFrame, path: str, partition_by: list[str]) -> None:
    prev = df.sparkSession.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
    df.sparkSession.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        df.write.mode("overwrite").partitionBy(*partition_by).parquet(path)
    finally:
        df.sparkSession.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def delete_where(
    spark: SparkSession,
    path: str,
    cond: str,
    partition_by: list[str] | None = None,
) -> int:
    """ALTER TABLE ... DELETE WHERE cond (reference mutations,
    src/Storages/MutationCommands.h; ByConity executes these as async
    part rewrites).  Spark-first: rewrite ONLY the partitions that contain
    matching rows via dynamic partition overwrite — untouched partitions'
    files are never read or rewritten, so at 100 TB the cost scales with
    the mutation's blast radius, not the table size.  Unpartitioned
    tables fall back to a full rewrite (same as a CH table with one part).
    Returns the number of rows deleted."""
    df = spark.read.parquet(path)
    if partition_by:
        # ONE pass computes the deleted-row count AND the blast radius
        # (per-partition conditional counts) — previously a full-scan
        # count plus a second full-scan distinct (guide §1.2)
        per = (
            df.groupBy(*partition_by)
            .agg(F.count(F.when(F.expr(cond), 1)).alias("__hits"))
            .collect()
        )
        n_del = int(sum(r["__hits"] for r in per))
        if n_del == 0:
            return 0
        hit = [r for r in per if r["__hits"] > 0]
        hit_filter = F.lit(False)
        for row in hit:
            m = F.lit(True)
            for c in partition_by:
                m = m & (F.col(c) == F.lit(row[c]))
            hit_filter = hit_filter | m
        kept = df.filter(hit_filter).filter(f"NOT ({cond})")
        _overwrite_partitions(kept, path, partition_by)
    else:
        n_del = df.filter(cond).count()
        if n_del == 0:
            return 0
        # full rewrite: stage then swap (parquet can't overwrite its own
        # input; the staging write completes before the source is removed)
        kept = df.filter(f"NOT ({cond})")
        kept.write.mode("overwrite").parquet(path + ".__mutating")
        shutil.rmtree(path)
        os.rename(path + ".__mutating", path)
    return n_del


def update_where(
    spark: SparkSession,
    path: str,
    cond: str,
    assignments: dict[str, str],
    partition_by: list[str] | None = None,
) -> int:
    """ALTER TABLE ... UPDATE col = expr WHERE cond — same partition-scoped
    rewrite as delete_where; non-matching rows in touched partitions are
    rewritten unchanged.  Updating a partition column is rejected (it
    would move rows across partitions — a CH mutation can't either).
    Returns the number of rows updated."""
    if partition_by and set(assignments) & set(partition_by):
        raise ValueError("cannot UPDATE a partition column")
    df = spark.read.parquet(path)

    def apply_updates(d: DataFrame) -> DataFrame:
        for col, expr in assignments.items():
            d = d.withColumn(
                col, F.when(F.expr(cond), F.expr(expr)).otherwise(F.col(col))
            )
        return d

    if partition_by:
        # same fused count+blast-radius pass as delete_where
        per = (
            df.groupBy(*partition_by)
            .agg(F.count(F.when(F.expr(cond), 1)).alias("__hits"))
            .collect()
        )
        n_hit = int(sum(r["__hits"] for r in per))
        if n_hit == 0:
            return 0
        hit = [r for r in per if r["__hits"] > 0]
        hit_filter = F.lit(False)
        for row in hit:
            m = F.lit(True)
            for c in partition_by:
                m = m & (F.col(c) == F.lit(row[c]))
            hit_filter = hit_filter | m
        _overwrite_partitions(apply_updates(df.filter(hit_filter)), path, partition_by)
    else:
        n_hit = df.filter(cond).count()
        if n_hit == 0:
            return 0
        apply_updates(df).write.mode("overwrite").parquet(path + ".__mutating")
        shutil.rmtree(path)
        os.rename(path + ".__mutating", path)
    return n_hit


def optimize_table(
    spark: SparkSession,
    path: str,
    target_file_mb: int = 128,
    sort_by: list[str] | None = None,
    partition_by: list[str] | None = None,
    deduplicate: bool = False,
    dedup_by: list[str] | None = None,
    zorder_by: list[str] | None = None,
    n_output_files: int | None = None,
) -> dict:
    """OPTIMIZE TABLE ... FINAL analogue (reference MergeTree background
    merges, src/Storages/MergeTree/MergeTreeDataMergerMutator.h;
    StorageSystemParts 'active parts'): compact a parquet table's small
    files into ~target_file_mb outputs, optionally re-sorting within
    partitions so row-group min/max pruning stays effective after many
    small appends.

    The repartition count derives from the CURRENT on-disk byte size — the
    one metadata listing the scan planner performs anyway.  Returns a
    {files_before, files_after, bytes} report.

    Swap protocol: write to a staging dir, rename the live dir away, rename
    staging in.  A failed staging write cleans up the staging dir; a failure
    between the two renames restores the old dir.  The window between the
    renames is NOT atomic (two rename syscalls) — a hard crash exactly
    there leaves `<path>.__optimize_old` to be restored manually; a real
    deployment puts both dirs on one filesystem so each rename itself is
    atomic.
    """
    before = [
        os.path.join(dp, f)
        for dp, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    ]
    total_bytes = sum(os.path.getsize(f) for f in before)
    n_files = n_output_files or max(
        1, round(total_bytes / (target_file_mb * 1024 * 1024))
    )

    df = spark.read.parquet(path)
    # OPTIMIZE ... DEDUPLICATE [BY cols] (reference
    # src/Parsers/ParserOptimizeQuery.cpp, ReplacingMergeTree merge-time
    # dedup): drop full-row duplicates, or keep ONE arbitrary-but-
    # deterministic row per dedup_by key (min by the remaining columns)
    if deduplicate:
        if dedup_by:
            others = [c for c in df.columns if c not in dedup_by]
            if others:
                df = df.groupBy(*dedup_by).agg(
                    F.min(F.struct(*others)).alias("__rest")
                ).select(*dedup_by, "__rest.*")
            else:
                df = df.distinct()
        else:
            df = df.distinct()
    staging = path.rstrip("/") + ".__optimize_tmp"
    if zorder_by:
        # Z-ORDER clustering: quantize each dimension to 21 bits over its
        # [min, max] span and bit-interleave into one long, then
        # range-partition + sort on it.  Multi-dimensional locality makes
        # parquet row-group min/max pruning effective on EVERY zorder
        # column (the Spark-side realization of the reference's minmax
        # skip indexes, src/Storages/MergeTree/MergeTreeIndexMinMax.h —
        # which only help when the data is clustered on those columns).
        out = df.repartitionByRange(
            n_files, _zorder_key(df, zorder_by)
        ).sortWithinPartitions(_zorder_key(df, zorder_by))
    else:
        out = df.repartition(n_files)
    if sort_by:
        out = out.sortWithinPartitions(*sort_by)
    writer = out.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    try:
        writer.parquet(staging)
    except BaseException:
        shutil.rmtree(staging, ignore_errors=True)
        raise

    old = path.rstrip("/") + ".__optimize_old"
    os.rename(path, old)
    try:
        os.rename(staging, path)
    except BaseException:
        os.rename(old, path)  # restore the live table
        shutil.rmtree(staging, ignore_errors=True)
        raise
    shutil.rmtree(old)
    after = [
        os.path.join(dp, f)
        for dp, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    ]
    return {
        "files_before": len(before),
        "files_after": len(after),
        "bytes": total_bytes,
    }


def _zorder_key(df: DataFrame, cols: list[str], bits: int = 21) -> Column:
    """Interleaved Morton code over up to 3 numeric columns, each
    quantized to `bits` levels over its observed [min, max] span (one tiny
    stats aggregate).  Constant-size Column expression — bits x dims
    shift/mask terms, no UDF."""
    if not 1 <= len(cols) <= 3:
        raise ValueError("zorder_by supports 1-3 columns")
    stats = df.agg(
        *[F.min(c).alias(f"mn_{c}") for c in cols],
        *[F.max(c).alias(f"mx_{c}") for c in cols],
    ).collect()[0]
    levels = (1 << bits) - 1
    qcols = []
    for c in cols:
        mn = float(stats[f"mn_{c}"])
        mx = float(stats[f"mx_{c}"])
        span = max(mx - mn, 1e-12)
        qcols.append(
            F.least(
                F.lit(levels),
                F.floor(
                    (F.col(c).cast("double") - F.lit(mn))
                    / F.lit(span)
                    * F.lit(levels)
                ).cast("long"),
            )
        )
    z = F.lit(0).cast("long")
    nd = len(qcols)
    for b in range(bits):
        for i, q in enumerate(qcols):
            bit = F.shiftrightunsigned(q, b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * nd + i))
    return z
