"""BACKUP / RESTORE — session analogue of the reference's backup subsystem
(``src/Parsers/ASTBackupQuery.h``, ``src/Backups/BackupsWorker.cpp``,
``BackupEntriesCollector.h``, status model ``BackupStatus.h``).

Statement shapes (ASTBackupQuery.h:14-27):

    BACKUP TABLE t [AS name_in_backup] TO Disk('<disk>', '<path>')
    RESTORE TABLE name_in_backup [AS t] FROM Disk('<disk>', '<path>')

Reference semantics kept:

* RESTORE never drops data — it creates the target table, or APPENDS when
  the table already exists (ASTBackupQuery.h:26 documents the possible
  duplication), and throws when the existing schema is incompatible.
* ``AS`` renames on the way in (BACKUP) or out (RESTORE).

The storage model is Spark-first: a backup entry is a distributed parquet
write of the table's current rows plus a JSON manifest (the
BackupEntriesCollector metadata analogue: schema, source name, row count);
restore is a parquet scan.  Nothing materializes on the driver, so the
same statements hold at cluster scale — a 100 TB BACKUP is exactly one
distributed write.  The CH ``Disk('name')`` indirection maps to a
directory per disk name under ``SPARK_GRAFT_BACKUP_ROOT``."""

from __future__ import annotations

import json
import os
import time

BACKUP_ROOT = os.environ.get(
    "SPARK_GRAFT_BACKUP_ROOT", "/tmp/byconity_spark_backups"
)

# system.backups rows (reference StorageSystemBackups / BackupStatus.h):
# (id, name, status, num_entries, start_time)
_BACKUP_LOG: list[tuple] = []
_SEQ = [0]


class BackupError(ValueError):
    """BACKUP_NOT_FOUND / CANNOT_RESTORE_TABLE and friends."""


def _entry_dir(disk: str, path: str, name: str) -> str:
    return os.path.join(BACKUP_ROOT, disk, path.strip("/"), name)


def backup_table(spark, table: str, disk: str, path: str,
                 as_name: str | None = None) -> int:
    """BACKUP TABLE — distributed parquet snapshot + manifest.  Returns
    the snapshotted row count."""
    name = as_name or table
    df = spark.table(table)
    dest = _entry_dir(disk, path, name)
    df.write.mode("overwrite").parquet(os.path.join(dest, "data.parquet"))
    n = spark.read.parquet(os.path.join(dest, "data.parquet")).count()
    manifest = {
        "source_table": table,
        "name_in_backup": name,
        "schema": df.schema.jsonValue(),
        "row_count": n,
        "created_at": time.time(),
    }
    with open(os.path.join(dest, "manifest.json"), "w") as fh:
        json.dump(manifest, fh)
    _SEQ[0] += 1
    _BACKUP_LOG.append(
        (f"b{_SEQ[0]}", f"Disk('{disk}', '{path}')/{name}",
         "BACKUP_CREATED", n, time.time())
    )
    return n


def restore_table(spark, name_in_backup: str, disk: str, path: str,
                  as_name: str | None = None) -> tuple[str, int, str]:
    """RESTORE TABLE — create-or-append, never drop (ASTBackupQuery.h:26).

    Returns (target_table, rows_restored, mode) with mode one of
    'created' | 'appended'."""
    target = as_name or name_in_backup
    dest = _entry_dir(disk, path, name_in_backup)
    data = os.path.join(dest, "data.parquet")
    if not os.path.exists(os.path.join(dest, "manifest.json")):
        raise BackupError(
            f"Backup entry {name_in_backup!r} not found in "
            f"Disk('{disk}', '{path}') (BACKUP_NOT_FOUND)"
        )
    restored = spark.read.parquet(data)
    n = restored.count()
    exists = True
    try:
        existing = spark.table(target)
    except Exception:
        exists = False
    if exists:
        if sorted(existing.columns) != sorted(restored.columns):
            raise BackupError(
                f"Cannot RESTORE into existing table {target!r}: "
                f"incompatible schema (existing {sorted(existing.columns)} "
                f"vs backup {sorted(restored.columns)}) "
                "(CANNOT_RESTORE_TABLE)"
            )
        merged = existing.unionByName(restored.select(existing.columns))
        merged.createOrReplaceTempView(target)
        mode = "appended"
    else:
        restored.createOrReplaceTempView(target)
        mode = "created"
    from byconity_spark.engine.query_cache import query_cache
    query_cache.bump_table(target)
    _SEQ[0] += 1
    _BACKUP_LOG.append(
        (f"b{_SEQ[0]}", f"Disk('{disk}', '{path}')/{name_in_backup}",
         "RESTORED", n, time.time())
    )
    return target, n, mode


def backups_rows() -> list[tuple]:
    return list(_BACKUP_LOG)
