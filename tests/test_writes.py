"""Write-path unit tests: upsert semantics, partitioned layout, catalog
schema enforcement."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from byconity_spark.engine.write import create_table_as, insert_into, read_back, upsert_by_key


def test_upsert_latest_version_wins(spark):
    base = spark.createDataFrame(
        [(1, "a", 0), (2, "b", 0), (3, "c", 5)], "k long, v string, version int"
    )
    updates = spark.createDataFrame(
        [(2, "B", 1), (3, "old", 1), (4, "d", 1)], "k long, v string, version int"
    )
    out = {r.k: (r.v, r.version) for r in upsert_by_key(base, updates, ["k"], "version").collect()}
    # k=3: base has HIGHER version -> base wins; k=2: update wins; k=4: new
    assert out == {1: ("a", 0), 2: ("B", 1), 3: ("c", 5), 4: ("d", 1)}


def test_upsert_tie_prefers_updates(spark):
    base = spark.createDataFrame([(1, "old", 7)], "k long, v string, version int")
    updates = spark.createDataFrame([(1, "new", 7)], "k long, v string, version int")
    out = upsert_by_key(base, updates, ["k"], "version").collect()
    assert out[0].v == "new"


def test_ctas_partition_layout(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "x", 1.0), (2, "y", 2.0), (3, "x", 3.0)], "id long, part string, v double"
    )
    path = str(tmp_path / "t")
    create_table_as(df, path, partition_by=["part"], sort_by=["id"])
    assert sorted(
        d for d in os.listdir(path) if d.startswith("part=")
    ) == ["part=x", "part=y"]
    back = read_back(spark, path)
    assert back.count() == 3
    # append then re-read
    insert_into(
        spark.createDataFrame([(4, "z", 4.0)], "id long, part string, v double"),
        path,
        partition_by=["part"],
    )
    assert read_back(spark, path).count() == 4


def test_bucketed_tables_join_without_shuffle(spark):
    """Two tables bucketed identically on the join key must join with NO
    Exchange (the co-located join that replaces a 100 TB shuffle)."""
    import contextlib
    import io

    from pyspark.sql import functions as F

    from byconity_spark.engine.write import create_bucketed_table

    a = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("va")
    )
    b = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("vb")
    )
    create_bucketed_table(a, "bt_a", 4, ["k"], sort_cols=["k"])
    create_bucketed_table(b, "bt_b", 4, ["k"], sort_cols=["k"])
    # merge hint: broadcast would win on this tiny fixture and hide the
    # bucketing effect we are asserting
    joined = spark.table("bt_a").hint("merge").join(spark.table("bt_b"), "k")

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        joined.explain("formatted")
    plan = buf.getvalue()
    assert "Exchange hashpartitioning" not in plan, "bucketed join still shuffles"
    assert "SortMergeJoin" in plan
    assert joined.count() == 1000
    spark.sql("DROP TABLE IF EXISTS bt_a")
    spark.sql("DROP TABLE IF EXISTS bt_b")


def test_catalog_schema_enforced(spark, tmp_path):
    """A drifted parquet file (string where the catalog declares timestamp)
    must fail at read, not be silently inferred (ADVICE r01 item 1)."""
    from pyspark.sql import types as T

    bad = spark.createDataFrame([("not-a-ts", 1)], "ts string, x long")
    path = str(tmp_path / "drifted")
    bad.write.parquet(path)
    declared = T.StructType(
        [T.StructField("ts", T.TimestampType()), T.StructField("x", T.LongType())]
    )
    with pytest.raises(Exception):
        spark.read.schema(declared).parquet(path).collect()


def test_delete_where_partition_scoped(spark, tmp_path):
    """DELETE rewrites only partitions containing matches; others' files
    must keep their original mtimes (proof of blast-radius scoping)."""
    import os
    import pyspark.sql.functions as F
    from byconity_spark.engine.write import delete_where

    p = str(tmp_path / "t")
    spark.range(100).select(
        "id", (F.col("id") % 4).alias("part"), (F.col("id") * 2.0).alias("v")
    ).write.partitionBy("part").parquet(p)

    def files(part):
        d = os.path.join(p, f"part={part}")
        return {
            f: os.path.getmtime(os.path.join(d, f))
            for f in os.listdir(d)
            if f.endswith(".parquet")
        }

    before = {k: files(k) for k in range(4)}
    # ids divisible by 20 all live in part=0 (20 % 4 == 0)
    n = delete_where(spark, p, "id % 20 = 0", partition_by=["part"])
    assert n == 5
    df = spark.read.parquet(p)
    assert df.count() == 95 and df.filter("id % 20 = 0").count() == 0
    assert files(1) == before[1] and files(2) == before[2] and files(3) == before[3]
    assert files(0) != before[0]


def test_update_where(spark, tmp_path):
    import pyspark.sql.functions as F
    from byconity_spark.engine.write import update_where

    p = str(tmp_path / "t")
    spark.range(20).select(
        "id", (F.col("id") % 2).alias("part"), F.lit(1.0).alias("v")
    ).write.partitionBy("part").parquet(p)
    n = update_where(spark, p, "id >= 10", {"v": "v * 10"}, partition_by=["part"])
    assert n == 10
    out = spark.read.parquet(p)
    assert out.filter("id >= 10").agg(F.sum("v")).collect()[0][0] == 100.0
    assert out.filter("id < 10").agg(F.sum("v")).collect()[0][0] == 10.0
    with pytest.raises(ValueError):
        update_where(spark, p, "id = 1", {"part": "0"}, partition_by=["part"])


def test_delete_where_unpartitioned_swap(spark, tmp_path):
    from byconity_spark.engine.write import delete_where

    p = str(tmp_path / "t")
    spark.range(50).write.parquet(p)
    assert delete_where(spark, p, "id >= 40") == 10
    assert spark.read.parquet(p).count() == 40
    assert delete_where(spark, p, "id >= 40") == 0


def test_optimize_zorder_clusters_both_dims(spark, tmp_path):
    """Z-ORDER compaction: per-file min/max spans shrink on BOTH cluster
    columns vs the unclustered layout, so parquet row-group pruning works
    on either predicate (MergeTreeIndexMinMax analogue)."""
    import pyarrow.parquet as pq
    import glob as g

    from byconity_spark.engine.write import optimize_table
    from byconity_spark.engine.catalog import load_table
    from tests.conftest import SF_DIR

    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    path = str(tmp_path / "zorder_li")
    li.repartition(8).write.mode("overwrite").parquet(path)

    def spans(p):
        tot = {"l_orderkey": 0.0, "l_partkey": 0.0}
        files = [f for f in g.glob(f"{p}/*.parquet")]
        for f in files:
            md = pq.ParquetFile(f).metadata
            for rg in range(md.num_row_groups):
                row = md.row_group(rg)
                for ci in range(row.num_columns):
                    col = row.column(ci)
                    name = col.path_in_schema
                    if name in tot and col.statistics is not None:
                        tot[name] += float(
                            col.statistics.max - col.statistics.min
                        )
        return tot, len(files)

    before, _ = spans(path)
    optimize_table(
        spark, path, zorder_by=["l_orderkey", "l_partkey"], n_output_files=8
    )
    after, n_after = spans(path)
    assert n_after >= 2  # multiple files so clustering is observable
    # both dimensions must tighten substantially (random layout spans the
    # full domain in every file)
    assert after["l_orderkey"] < before["l_orderkey"] * 0.7, (before, after)
    assert after["l_partkey"] < before["l_partkey"] * 0.7, (before, after)


def test_optimize_zorder_single_column(spark, tmp_path):
    from byconity_spark.engine.write import optimize_table
    from byconity_spark.engine.catalog import load_table
    from tests.conftest import SF_DIR

    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    path = str(tmp_path / "z1")
    li.repartition(4).write.mode("overwrite").parquet(path)
    before = spark.read.parquet(path).count()
    optimize_table(spark, path, zorder_by=["l_orderkey"], n_output_files=4)
    after = spark.read.parquet(path)
    assert after.count() == before
    # single-column zorder == plain clustering on that column
    import glob as g
    import pyarrow.parquet as pq

    spans = []
    for f in g.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            row = md.row_group(rg)
            for ci in range(row.num_columns):
                col = row.column(ci)
                if col.path_in_schema == "l_orderkey" and col.statistics:
                    spans.append(col.statistics.max - col.statistics.min)
    full = max(spans) if spans else 0
    assert len(spans) >= 2 and min(spans) < full
