"""Hive-metastore catalog e2e (reference src/Storages/Hive/ CnchHive reads
tables registered in a Hive metastore; registerStorages.cpp:33-103).

Spark's hive catalog must be chosen at SESSION CREATION
(spark.sql.catalogImplementation is frozen afterwards), so this runs in a
SUBPROCESS with its own JVM: create a hive-enabled session, CREATE TABLE
(managed, metastore-backed), insert, re-open a second session against the
same metastore, and read the table back — the metastore round-trip the
reference's CnchHive storage performs."""

import os
import subprocess
import sys
import textwrap

import pytest

_HIVE_JARS = any(
    f.startswith("hive-metastore")
    for f in os.listdir(
        os.path.join(os.path.dirname(os.path.dirname(__import__("pyspark").__file__)),
                     "pyspark", "jars")
    )
)

SCRIPT = textwrap.dedent(
    """
    import sys, os, tempfile
    work = tempfile.mkdtemp(prefix="hive_ms_")
    os.chdir(work)  # derby metastore_db lands here
    from pyspark.sql import SparkSession

    def session(name):
        return (
            SparkSession.builder.master("local[2]").appName(name)
            .config("spark.sql.catalogImplementation", "hive")
            .config("spark.sql.warehouse.dir", os.path.join(work, "warehouse"))
            .config("javax.jdo.option.ConnectionURL",
                    f"jdbc:derby:;databaseName={work}/metastore_db;create=true")
            .config("spark.ui.enabled", "false")
            .enableHiveSupport().getOrCreate()
        )

    s1 = session("writer")
    assert s1.conf.get("spark.sql.catalogImplementation") == "hive"
    s1.sql("CREATE TABLE hive_demo (k INT, v STRING) USING PARQUET")
    s1.sql("INSERT INTO hive_demo VALUES (1, 'a'), (2, 'b')")
    n1 = s1.sql("SELECT count(*) c FROM hive_demo").collect()[0][0]
    assert n1 == 2, n1
    s1.stop()

    # second session, same metastore: table must be discoverable by name
    s2 = session("reader")
    rows = sorted(
        (r.k, r.v) for r in s2.sql("SELECT k, v FROM hive_demo").collect()
    )
    assert rows == [(1, "a"), (2, "b")], rows
    tables = [t.name for t in s2.catalog.listTables()]
    assert "hive_demo" in tables, tables
    s2.stop()
    print("HIVE_METASTORE_OK")
    """
)


@pytest.mark.skipif(not _HIVE_JARS, reason="spark-hive jars absent")
def test_hive_metastore_roundtrip_subprocess():
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT],
        capture_output=True, text=True, timeout=300,
        env={**os.environ, "PYSPARK_PYTHON": sys.executable},
    )
    assert "HIVE_METASTORE_OK" in proc.stdout, (
        proc.stdout[-2000:] + "\n---\n" + proc.stderr[-2000:]
    )
