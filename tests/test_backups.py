"""BACKUP / RESTORE (engine/backups.py) — reference ASTBackupQuery.h
semantics: parquet-snapshot backup, create-or-append restore (never drop),
schema-incompatibility error, AS renames, system.backups log."""

from __future__ import annotations

import pytest

from byconity_spark.engine.backups import BackupError, _BACKUP_LOG
from byconity_spark.engine.catalog import register_views
from byconity_spark.engine.limits import ReadonlyError, session_limits
from byconity_spark.frontend import ch_sql
from tests.conftest import SF_DIR


@pytest.fixture(autouse=True)
def _clean(spark):
    session_limits.reset()
    yield
    session_limits.reset()
    for t in ("bk_src", "bk_rt", "bk_other"):
        spark.catalog.dropTempView(t)


def test_backup_restore_roundtrip(spark):
    register_views(spark, SF_DIR)
    ch_sql(
        spark,
        "CREATE TABLE bk_src AS SELECT n_nationkey, n_name FROM nation "
        "WHERE n_regionkey = 2",
    )
    n_src = spark.table("bk_src").count()
    out = ch_sql(
        spark, "BACKUP TABLE bk_src TO Disk('backups', 'rt1')"
    ).collect()
    assert out[0][1] == n_src and out[0][2] == "backup_created"

    ch_sql(spark, "DROP TABLE bk_src")
    res = ch_sql(
        spark, "RESTORE TABLE bk_src AS bk_rt FROM Disk('backups', 'rt1')"
    ).collect()
    assert res[0][0] == "bk_rt" and res[0][1] == n_src
    assert res[0][2] == "created"
    assert spark.table("bk_rt").count() == n_src

    # restore again into the existing table: appends, never drops
    res2 = ch_sql(
        spark, "RESTORE TABLE bk_src AS bk_rt FROM Disk('backups', 'rt1')"
    ).collect()
    assert res2[0][2] == "appended"
    assert spark.table("bk_rt").count() == 2 * n_src


def test_backup_as_rename(spark):
    register_views(spark, SF_DIR)
    ch_sql(spark, "CREATE TABLE bk_src AS SELECT r_regionkey FROM region")
    ch_sql(
        spark, "BACKUP TABLE bk_src AS renamed TO Disk('backups', 'rt2')"
    )
    res = ch_sql(
        spark, "RESTORE TABLE renamed AS bk_rt FROM Disk('backups', 'rt2')"
    ).collect()
    assert res[0][1] == 5


def test_restore_incompatible_schema(spark):
    register_views(spark, SF_DIR)
    ch_sql(spark, "CREATE TABLE bk_src AS SELECT n_nationkey FROM nation")
    ch_sql(spark, "BACKUP TABLE bk_src TO Disk('backups', 'rt3')")
    ch_sql(
        spark,
        "CREATE TABLE bk_other AS SELECT r_regionkey, r_name FROM region",
    )
    with pytest.raises(BackupError, match="CANNOT_RESTORE_TABLE"):
        ch_sql(
            spark,
            "RESTORE TABLE bk_src AS bk_other FROM Disk('backups', 'rt3')",
        )


def test_restore_missing_entry(spark):
    with pytest.raises(BackupError, match="BACKUP_NOT_FOUND"):
        ch_sql(
            spark,
            "RESTORE TABLE no_such FROM Disk('backups', 'nowhere_at_all')",
        )


def test_readonly_blocks_restore_not_backup(spark):
    register_views(spark, SF_DIR)
    ch_sql(spark, "CREATE TABLE bk_src AS SELECT r_regionkey FROM region")
    ch_sql(spark, "SET readonly = 1")
    # BACKUP only reads engine data (the snapshot goes to an external disk)
    ch_sql(spark, "BACKUP TABLE bk_src TO Disk('backups', 'rt4')")
    with pytest.raises(ReadonlyError):
        ch_sql(spark, "RESTORE TABLE bk_src FROM Disk('backups', 'rt4')")
    session_limits.reset()


def test_system_backups_log(spark):
    register_views(spark, SF_DIR)
    before = len(_BACKUP_LOG)
    ch_sql(spark, "CREATE TABLE bk_src AS SELECT r_regionkey FROM region")
    ch_sql(spark, "BACKUP TABLE bk_src TO Disk('backups', 'rt5')")
    rows = ch_sql(
        spark,
        "SELECT status, num_entries FROM system.backups",
    ).collect()
    assert len(rows) == before + 1
    assert ("BACKUP_CREATED", 5) in {(r[0], r[1]) for r in rows}
