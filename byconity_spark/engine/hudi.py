"""Hudi Copy-on-Write snapshot/time-travel reader (spec-level, no jars).

Reference: the reference registers a CnchHudi storage engine
(src/Storages/registerStorages.cpp:33-103, src/Storages/Hive/ — Hudi
tables surface through the Hive connector with a HudiDirectoryLister).
This module implements the same capability Spark-first against the PUBLIC
Hudi COW table spec (https://hudi.apache.org/tech-specs/):

* timeline — ``<base>/.hoodie/<instant>.commit`` marks instant COMPLETED;
  ``*.inflight`` / ``*.requested`` are in-progress and must be invisible;
* data files — ``<partition-dirs>/<fileId>_<writeToken>_<instant>.parquet``;
  all files with one fileId form a FILE GROUP; a COW commit rewrites a
  whole file slice, so the snapshot view of a group is exactly ONE file:
  the one with the greatest completed instant ≤ the read instant;
* time travel — the same resolution with the read instant pinned.

Scale: slice resolution is file-NAME parsing over a driver-side listing —
the identical metadata cost every jar-based Hudi reader pays without the
metadata table — and is O(#files) string work; the data read itself is a
plain distributed parquet scan with ``basePath`` partition discovery, so
partition-column filters prune directory subtrees (PartitionFilters)
before any footer is opened.  MOR tables (log-file merge) are NOT
implemented — documented out of scope; the reference's own Hudi support
is COW-snapshot via the Hive connector as well.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession

_DATA_FILE = re.compile(
    r"^(?P<file_id>.+?)_(?P<token>[^_]+)_(?P<instant>\d+)\.parquet$"
)


def hudi_completed_instants(base_path: str) -> list[str]:
    """Sorted completed commit instants from the ``.hoodie`` timeline."""
    tl = os.path.join(base_path, ".hoodie")
    if not os.path.isdir(tl):
        raise ValueError(f"not a Hudi table (no .hoodie timeline): {base_path}")
    out = []
    for name in os.listdir(tl):
        m = re.match(r"^(\d+)\.(commit|replacecommit)$", name)
        if m:
            out.append(m.group(1))
    return sorted(out)


def hudi_replaced_file_groups(
    base_path: str, completed: set
) -> set:
    """(partition, fileId) groups retired by completed replacecommits
    (clustering / insert-overwrite).  The spec stores them in the
    replacecommit metadata's ``partitionToReplaceFileIds``; a reader that
    keeps serving those groups returns every clustered row TWICE (round-8
    advisory).  Unreadable metadata raises — silently keeping the groups
    would be a silent duplicate."""
    import json

    tl = os.path.join(base_path, ".hoodie")
    replaced: set = set()
    for name in os.listdir(tl):
        m = re.match(r"^(\d+)\.replacecommit$", name)
        if not m or m.group(1) not in completed:
            continue
        fp = os.path.join(tl, name)
        try:
            with open(fp) as fh:
                meta = json.load(fh) or {}
            part_map = meta.get("partitionToReplaceFileIds", {})
        except (OSError, ValueError) as exc:
            raise ValueError(
                f"hudi: unreadable replacecommit metadata {fp}: {exc}"
            ) from exc
        for part, file_ids in part_map.items():
            rel = part if part else "."  # spec uses '' for unpartitioned
            for fid in file_ids:
                replaced.add((rel, fid))
    return replaced


def hudi_snapshot_files(base_path: str, as_of: str | None = None) -> list[str]:
    """The one winning file per file group at the read instant."""
    completed = set(hudi_completed_instants(base_path))
    if as_of is not None:
        completed = {i for i in completed if i <= as_of}
    if not completed:
        return []
    replaced = hudi_replaced_file_groups(base_path, completed)
    best: dict[tuple, tuple] = {}  # (partition, file_id) -> (instant, path)
    for root, dirs, files in os.walk(base_path):
        dirs[:] = [d for d in dirs if d != ".hoodie"]
        rel = os.path.relpath(root, base_path)
        for f in files:
            m = _DATA_FILE.match(f)
            if not m or m.group("instant") not in completed:
                continue  # non-data file, or inflight/filtered-out instant
            key = (rel, m.group("file_id"))
            if key in replaced:
                continue  # group retired by a completed replacecommit
            cand = (m.group("instant"), os.path.join(root, f))
            if key not in best or cand[0] > best[key][0]:
                best[key] = cand
    return sorted(path for _, path in best.values())


def hudi_cow_table(
    spark: SparkSession,
    base_path: str,
    data_schema=None,
    as_of: str | None = None,
    partition_types: dict[str, str] | None = None,
) -> DataFrame:
    """Snapshot (or time-travel, with ``as_of``) read of a Hudi COW table.

    ``data_schema`` pins the non-partition columns (skips footer
    inference); ``partition_types`` casts dir-discovered partition columns
    to declared types, exactly like ``hive_external_table``."""
    files = hudi_snapshot_files(base_path, as_of=as_of)
    if not files:
        raise ValueError(
            f"hudi_cow_table: no completed file slices at "
            f"instant {as_of or 'latest'} under {base_path}"
        )
    reader = spark.read.option("basePath", base_path)
    if data_schema is not None:
        reader = reader.schema(data_schema)
    df = reader.parquet(*files)
    from pyspark.sql import functions as F

    for col, dtype in (partition_types or {}).items():
        if col not in df.columns:
            raise ValueError(
                f"hudi_cow_table: partition column {col!r} not found; "
                f"got {df.columns}"
            )
        df = df.withColumn(col, F.col(col).cast(dtype))
    return df


# ---------------------------------------------------------------------------
# COW layout writer — test/demo fixture builder (the real producer is an
# external Hudi writer; this exists so the read path has a layout to read)
# ---------------------------------------------------------------------------

def write_cow_file(
    base_path: str,
    partition: str,
    file_id: str,
    instant: str,
    pdf,
    complete: bool = True,
) -> str:
    """Write one file slice + its timeline marker.  ``complete=False``
    leaves the instant inflight (``<instant>.commit.inflight``), which a
    correct reader must ignore."""
    part_dir = os.path.join(base_path, partition) if partition else base_path
    os.makedirs(part_dir, exist_ok=True)
    tl = os.path.join(base_path, ".hoodie")
    os.makedirs(tl, exist_ok=True)
    path = os.path.join(part_dir, f"{file_id}_0-0-0_{instant}.parquet")
    out = pdf.copy()
    out.insert(0, "_hoodie_commit_time", instant)
    out.to_parquet(path, index=False)
    marker = f"{instant}.commit" if complete else f"{instant}.commit.inflight"
    with open(os.path.join(tl, marker), "w") as fh:
        fh.write("{}")
    return path


def write_replacecommit_file(
    base_path: str,
    partition: str,
    file_id: str,
    instant: str,
    pdf,
    replaces: dict[str, list[str]],
    complete: bool = True,
) -> str:
    """Clustering/insert-overwrite fixture: writes the NEW file slice plus
    a ``<instant>.replacecommit`` whose metadata retires ``replaces``
    ({partition_path: [fileId, ...]}, '' = unpartitioned root)."""
    import json

    part_dir = os.path.join(base_path, partition) if partition else base_path
    os.makedirs(part_dir, exist_ok=True)
    tl = os.path.join(base_path, ".hoodie")
    os.makedirs(tl, exist_ok=True)
    path = os.path.join(part_dir, f"{file_id}_0-0-0_{instant}.parquet")
    out = pdf.copy()
    out.insert(0, "_hoodie_commit_time", instant)
    out.to_parquet(path, index=False)
    marker = (
        f"{instant}.replacecommit"
        if complete
        else f"{instant}.replacecommit.inflight"
    )
    with open(os.path.join(tl, marker), "w") as fh:
        json.dump({"partitionToReplaceFileIds": replaces}, fh)
    return path
