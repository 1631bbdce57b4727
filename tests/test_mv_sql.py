"""SQL-surface materialized views (reference StorageMaterializedView.h,
InterpreterCreateQuery MV branch): refresh-on-stale against source table
versions; incremental insert-block refresh with full-re-run fallback
(round 7)."""

from __future__ import annotations

import pytest

from byconity_spark.engine.catalog import register_views
from byconity_spark.frontend import ch_sql
from byconity_spark.frontend.sql import _SESSION_MVS
from tests.conftest import SF_DIR


@pytest.fixture(autouse=True)
def _clean(spark):
    yield
    for v in ("mv_agg", "mv_over"):
        _SESSION_MVS.pop(v, None)
        spark.catalog.dropTempView(v)
    ch_sql(spark, "DROP TABLE IF EXISTS mv_src")


def test_mv_refreshes_after_source_insert(spark):
    register_views(spark, SF_DIR)
    ch_sql(
        spark,
        "CREATE TABLE mv_src AS SELECT n_regionkey AS r, n_nationkey AS k "
        "FROM nation",
    )
    ch_sql(
        spark,
        "CREATE MATERIALIZED VIEW mv_agg AS "
        "SELECT r, count(*) AS n FROM mv_src GROUP BY r",
    )
    before = {
        row[0]: row[1]
        for row in ch_sql(spark, "SELECT r, n FROM mv_agg").collect()
    }
    assert sum(before.values()) == 25
    ch_sql(spark, "INSERT INTO mv_src VALUES (9, 999)")
    after = {
        row[0]: row[1]
        for row in ch_sql(spark, "SELECT r, n FROM mv_agg").collect()
    }
    assert after.get(9) == 1 and sum(after.values()) == 26


def test_mv_on_mv_chain_refreshes(spark):
    register_views(spark, SF_DIR)
    ch_sql(spark, "CREATE TABLE mv_src AS SELECT 1 AS x")
    ch_sql(
        spark,
        "CREATE MATERIALIZED VIEW mv_agg AS "
        "SELECT count(*) AS n FROM mv_src",
    )
    ch_sql(
        spark,
        "CREATE MATERIALIZED VIEW mv_over AS "
        "SELECT n * 10 AS n10 FROM mv_agg",
    )
    assert ch_sql(spark, "SELECT n10 FROM mv_over").collect()[0][0] == 10
    ch_sql(spark, "INSERT INTO mv_src VALUES (2)")
    assert ch_sql(spark, "SELECT n10 FROM mv_over").collect()[0][0] == 20


def test_drop_view_covers_mv(spark):
    ch_sql(spark, "CREATE TABLE mv_src AS SELECT 1 AS x")
    ch_sql(
        spark,
        "CREATE MATERIALIZED VIEW mv_agg AS SELECT count(*) AS n FROM mv_src",
    )
    assert "mv_agg" in _SESSION_MVS
    assert ch_sql(spark, "DROP VIEW mv_agg").collect()[0][1] == "dropped"
    assert "mv_agg" not in _SESSION_MVS


@pytest.fixture
def inc_spy(monkeypatch):
    """Records whether each refresh took the incremental path."""
    import byconity_spark.frontend.sql as fe

    calls = []
    orig = fe._try_incremental_mv_refresh

    def spy(*a, **k):
        r = orig(*a, **k)
        calls.append(r)
        return r

    monkeypatch.setattr(fe, "_try_incremental_mv_refresh", spy)
    return calls


def _mk_src(spark):
    register_views(spark, SF_DIR)
    ch_sql(
        spark,
        "CREATE TABLE mv_src AS SELECT n_regionkey AS r, "
        "CAST(n_nationkey AS BIGINT) AS k FROM nation",
    )


def test_incremental_refresh_aggregate_merge(spark, inc_spy):
    """Insert-block refresh (StorageMaterializedView.h:129-168): an
    append-only staleness on a splittable aggregate MV merges the rollup
    with the transformed delta — no full-source re-run."""
    _mk_src(spark)
    ch_sql(
        spark,
        "CREATE MATERIALIZED VIEW mv_agg AS "
        "SELECT r, count(*) AS n, sum(k) AS s FROM mv_src GROUP BY r",
    )
    ch_sql(spark, "INSERT INTO mv_src VALUES (0, 1000)")
    ch_sql(spark, "INSERT INTO mv_src VALUES (9, 2000)")
    rows = {
        row["r"]: (row["n"], row["s"])
        for row in ch_sql(spark, "SELECT r, n, s FROM mv_agg").collect()
    }
    assert inc_spy == [True], "refresh did not take the incremental path"
    assert rows[9] == (1, 2000)  # brand-new group appears
    assert rows[0][0] == 6  # 5 region-0 nations + the inserted row
    assert rows[0][1] == sum(
        r[0] for r in ch_sql(
            spark, "SELECT k FROM mv_src WHERE r = 0"
        ).collect()
    )


def test_incremental_refresh_projection_append(spark, inc_spy):
    _mk_src(spark)
    ch_sql(
        spark,
        "CREATE MATERIALIZED VIEW mv_over AS "
        "SELECT k, r FROM mv_src WHERE r < 2",
    )
    ch_sql(spark, "INSERT INTO mv_src VALUES (1, 777)")
    ch_sql(spark, "INSERT INTO mv_src VALUES (4, 888)")  # filtered out
    got = {row["k"] for row in ch_sql(spark, "SELECT k FROM mv_over").collect()}
    assert inc_spy == [True]
    assert 777 in got and 888 not in got
    assert len(got) == 11  # 10 nations with r<2 + the one new row


def test_non_append_write_falls_back_to_full(spark, inc_spy):
    """A mutation bumps the source version without a delta-log entry —
    coverage breaks and the refresh must take the full path (and still be
    correct)."""
    _mk_src(spark)
    ch_sql(
        spark,
        "CREATE MATERIALIZED VIEW mv_agg AS "
        "SELECT r, count(*) AS n FROM mv_src GROUP BY r",
    )
    ch_sql(spark, "INSERT INTO mv_src VALUES (0, 1000)")
    ch_sql(spark, "ALTER TABLE mv_src DELETE WHERE k = 1000")
    rows = {
        row["r"]: row["n"]
        for row in ch_sql(spark, "SELECT r, n FROM mv_agg").collect()
    }
    assert inc_spy == [False]
    assert rows[0] == 5  # inserted row deleted again


def test_avg_is_not_mergeable_full_path(spark, inc_spy):
    _mk_src(spark)
    ch_sql(
        spark,
        "CREATE MATERIALIZED VIEW mv_agg AS "
        "SELECT r, avg(k) AS a FROM mv_src GROUP BY r",
    )
    ch_sql(spark, "INSERT INTO mv_src VALUES (0, 100)")
    got = {
        row["r"]: row["a"]
        for row in ch_sql(spark, "SELECT r, a FROM mv_agg").collect()
    }
    assert inc_spy == [False]
    want = {
        row["r"]: row["a"]
        for row in ch_sql(
            spark, "SELECT r, avg(k) AS a FROM mv_src GROUP BY r"
        ).collect()
    }
    assert got == want


def test_count_distinct_is_not_mergeable_full_path(spark, inc_spy):
    """Round-8 advisory regression: count(DISTINCT x)/sum(DISTINCT x)
    matched the splittable-aggregate regex and the merge path SUMMED the
    per-refresh partials, double-counting any distinct value present in
    both the old rollup and an inserted block.  Must take the full path."""
    _mk_src(spark)
    ch_sql(
        spark,
        "CREATE MATERIALIZED VIEW mv_agg AS "
        "SELECT r, count(DISTINCT k) AS d, sum(DISTINCT k) AS sd "
        "FROM mv_src GROUP BY r",
    )
    # k=0 already exists in region 0 (ALGERIA) — re-inserting it must not
    # bump the distinct count or the distinct sum
    ch_sql(spark, "INSERT INTO mv_src VALUES (0, 0)")
    got = {
        row["r"]: (row["d"], row["sd"])
        for row in ch_sql(spark, "SELECT r, d, sd FROM mv_agg").collect()
    }
    assert inc_spy == [False]
    want = {
        row["r"]: (row["d"], row["sd"])
        for row in ch_sql(
            spark,
            "SELECT r, count(DISTINCT k) AS d, sum(DISTINCT k) AS sd "
            "FROM mv_src GROUP BY r",
        ).collect()
    }
    assert got == want
    assert got[0][0] == 5  # still 5 distinct keys in region 0


def test_mv_read_is_rollup_scan_not_source_rerun(spark):
    """MVs are materialized: reading one scans the rollup parquet, it does
    not re-execute the defining SELECT over the source (the reference's
    target-table cost model)."""
    _mk_src(spark)
    ch_sql(
        spark,
        "CREATE MATERIALIZED VIEW mv_agg AS "
        "SELECT r, count(*) AS n FROM mv_src GROUP BY r",
    )
    plan = spark.table("mv_agg")._jdf.queryExecution().executedPlan().toString()
    assert "bspark_mv_" in plan  # rollup parquet location
    assert "HashAggregate" not in plan.split("bspark_mv_")[0]
