"""RBAC + row policies (engine/access.py + frontend statements) —
reference src/Access/ (ContextAccess.cpp grant checks, RowPolicyCache.cpp
condition mixing, RowPolicy.h policy model)."""

from __future__ import annotations

import pytest

from byconity_spark.engine.access import AccessDeniedError, access_control
from byconity_spark.engine.catalog import register_views
from byconity_spark.frontend import ch_sql
from tests.conftest import SF_DIR


@pytest.fixture(autouse=True)
def _clean():
    access_control.reset()
    yield
    access_control.reset()


def _setup(spark):
    register_views(spark, SF_DIR)
    ch_sql(spark, "CREATE ROLE analyst")
    ch_sql(spark, "CREATE USER alice")
    ch_sql(spark, "GRANT analyst TO alice")
    ch_sql(spark, "GRANT SELECT ON orders TO analyst")


def test_row_policy_filters_rows(spark):
    _setup(spark)
    ch_sql(
        spark,
        "CREATE ROW POLICY f_only ON orders FOR SELECT "
        "USING o_orderstatus = 'F' TO analyst",
    )
    want = ch_sql(
        spark, "SELECT count(*) AS n FROM orders WHERE o_orderstatus = 'F'"
    ).collect()[0][0]
    ch_sql(spark, "SET SESSION USER alice")
    got = ch_sql(spark, "SELECT count(*) AS n FROM orders").collect()[0][0]
    assert got == want
    # distinct probe: only 'F' rows are visible at all
    stats = ch_sql(
        spark, "SELECT collect_set(o_orderstatus) AS s FROM orders"
    ).collect()[0][0]
    assert stats == ["F"]
    ch_sql(spark, "SET SESSION USER default")
    assert ch_sql(spark, "SELECT count(*) AS n FROM orders").collect()[0][
        0
    ] > want  # default user is not covered by the TO clause


def test_restrictive_mixes_with_permissive(spark):
    _setup(spark)
    ch_sql(
        spark,
        "CREATE ROW POLICY perm ON orders USING o_orderstatus = 'F' "
        "TO analyst",
    )
    ch_sql(
        spark,
        "CREATE ROW POLICY restr ON orders AS RESTRICTIVE "
        "USING o_orderpriority LIKE '1%' TO analyst",
    )
    want = ch_sql(
        spark,
        "SELECT count(*) AS n FROM orders WHERE o_orderstatus = 'F' "
        "AND o_orderpriority LIKE '1%'",
    ).collect()[0][0]
    ch_sql(spark, "SET SESSION USER alice")
    assert (
        ch_sql(spark, "SELECT count(*) AS n FROM orders").collect()[0][0]
        == want
    )


def test_restrictive_only_sees_nothing(spark):
    # RowPolicyCache.cpp:58 — OR() over zero permissive conditions is FALSE
    _setup(spark)
    ch_sql(
        spark,
        "CREATE ROW POLICY restr ON orders AS RESTRICTIVE "
        "USING o_orderpriority LIKE '1%' TO analyst",
    )
    ch_sql(spark, "SET SESSION USER alice")
    assert (
        ch_sql(spark, "SELECT count(*) AS n FROM orders").collect()[0][0] == 0
    )


def test_policy_to_all_covers_default_user(spark):
    register_views(spark, SF_DIR)
    ch_sql(
        spark,
        "CREATE ROW POLICY everyone ON nation USING n_regionkey = 0 TO ALL",
    )
    assert (
        ch_sql(spark, "SELECT count(*) AS n FROM nation").collect()[0][0] == 5
    )
    ch_sql(spark, "DROP ROW POLICY everyone ON nation")
    assert (
        ch_sql(spark, "SELECT count(*) AS n FROM nation").collect()[0][0] == 25
    )


def test_no_grant_is_access_denied(spark):
    _setup(spark)
    ch_sql(spark, "SET SESSION USER alice")
    with pytest.raises(AccessDeniedError, match="ACCESS_DENIED"):
        ch_sql(spark, "SELECT count(*) FROM customer")


def test_column_grant_projects(spark):
    _setup(spark)
    ch_sql(spark, "GRANT SELECT(n_nationkey, n_name) ON nation TO alice")
    ch_sql(spark, "SET SESSION USER alice")
    assert (
        ch_sql(spark, "SELECT count(n_name) AS n FROM nation").collect()[0][0]
        == 25
    )
    with pytest.raises(Exception):  # ungranted column fails analysis
        ch_sql(spark, "SELECT n_regionkey FROM nation").collect()


def test_system_views_and_unknown_user(spark):
    _setup(spark)
    ch_sql(
        spark,
        "CREATE ROW POLICY p1 ON orders USING o_orderstatus = 'F' TO analyst",
    )
    rows = ch_sql(
        spark,
        "SELECT name, table, kind, apply_to FROM system.row_policies",
    ).collect()
    assert rows[0][:4] == ("p1", "orders", "permissive", "analyst")
    users = ch_sql(spark, "SELECT name, granted_roles FROM system.users").collect()
    assert users == [("alice", "analyst")]
    grants = ch_sql(
        spark, "SELECT principal, table, columns FROM system.grants"
    ).collect()
    assert ("analyst", "orders", "*") in [tuple(r) for r in grants]
    with pytest.raises(Exception, match="UNKNOWN_USER"):
        ch_sql(spark, "SET SESSION USER nobody")
