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


def test_projection_rewrite_respects_row_policy(spark):
    """ADVICE r6 (high): the projection rewrite replaced ``FROM t`` with
    ``FROM __proj_t_p`` BEFORE access enforcement saw ``t`` — a
    policy-restricted user got full, unfiltered aggregates from the
    rollup.  Any restriction on a referenced table now disables the
    rewrite; the statement runs on the policy-filtered base table."""
    from byconity_spark.engine.projections import projections

    projections.clear()
    _setup(spark)
    try:
        ch_sql(
            spark,
            "CREATE TABLE acc_pj AS SELECT o_orderstatus, o_totalprice "
            "FROM orders",
        )
        ch_sql(
            spark,
            "ALTER TABLE acc_pj ADD PROJECTION by_st ("
            "SELECT o_orderstatus, sum(o_totalprice) AS rev "
            "GROUP BY o_orderstatus)",
        )
        q = (
            "SELECT o_orderstatus, sum(o_totalprice) AS rev FROM acc_pj "
            "GROUP BY o_orderstatus"
        )
        assert len(ch_sql(spark, q).collect()) > 1  # materializes rollup
        ch_sql(spark, "GRANT SELECT ON acc_pj TO analyst")
        ch_sql(
            spark,
            "CREATE ROW POLICY only_f ON acc_pj FOR SELECT "
            "USING o_orderstatus = 'F' TO analyst",
        )
        ch_sql(spark, "SET SESSION USER alice")
        rows = ch_sql(spark, q).collect()
        assert [r[0] for r in rows] == ["F"]
        ch_sql(spark, "SET SESSION USER default")
        # unrestricted default user still gets the projection-backed answer
        assert len(ch_sql(spark, q).collect()) > 1
    finally:
        access_control.reset()
        projections.clear()
        ch_sql(spark, "DROP TABLE IF EXISTS acc_pj")


def test_projection_rewrite_no_grant_denied(spark):
    """A user with NO SELECT grant must be denied even when the statement
    matches a projection (the rewrite used to hide the table from the
    grant check)."""
    from byconity_spark.engine.projections import projections

    projections.clear()
    _setup(spark)
    try:
        ch_sql(
            spark,
            "CREATE TABLE acc_pj2 AS SELECT o_orderstatus, o_totalprice "
            "FROM orders",
        )
        ch_sql(
            spark,
            "ALTER TABLE acc_pj2 ADD PROJECTION by_st ("
            "SELECT o_orderstatus, sum(o_totalprice) AS rev "
            "GROUP BY o_orderstatus)",
        )
        ch_sql(spark, "SET SESSION USER alice")  # no grant on acc_pj2
        with pytest.raises(AccessDeniedError, match="ACCESS_DENIED"):
            ch_sql(
                spark,
                "SELECT o_orderstatus, sum(o_totalprice) AS rev FROM "
                "acc_pj2 GROUP BY o_orderstatus",
            )
    finally:
        access_control.reset()
        projections.clear()
        ch_sql(spark, "DROP TABLE IF EXISTS acc_pj2")


def test_literal_table_name_not_access_checked(spark):
    """ADVICE r6 (low): a string literal sharing a catalog table's name
    ('customer') must not trigger a grant check on that table."""
    _setup(spark)
    ch_sql(spark, "SET SESSION USER alice")
    got = ch_sql(
        spark, "SELECT 'customer' AS lbl, count(*) AS n FROM orders"
    ).collect()
    assert got[0][0] == "customer" and got[0][1] > 0


def test_mv_refresh_uses_owner_semantics(spark):
    """ADVICE r6 (medium): a policy-restricted user's query must NOT
    repopulate a shared MV with policy-filtered rows — refresh runs with
    access enforcement suspended (owner semantics,
    StorageMaterializedView)."""
    from byconity_spark.frontend.sql import _SESSION_MVS

    _setup(spark)
    try:
        ch_sql(
            spark,
            "CREATE TABLE acc_src AS SELECT n_regionkey AS r, "
            "n_nationkey AS k FROM nation",
        )
        ch_sql(
            spark,
            "CREATE MATERIALIZED VIEW acc_mv AS "
            "SELECT r, count(*) AS n FROM acc_src GROUP BY r",
        )
        ch_sql(spark, "GRANT SELECT ON acc_src TO analyst")
        ch_sql(spark, "GRANT SELECT ON acc_mv TO analyst")
        ch_sql(
            spark,
            "CREATE ROW POLICY r0 ON acc_src USING r = 0 TO analyst",
        )
        ch_sql(spark, "INSERT INTO acc_src VALUES (9, 999)")  # MV now stale
        ch_sql(spark, "SET SESSION USER alice")
        rows = {
            r[0]: r[1]
            for r in ch_sql(spark, "SELECT r, n FROM acc_mv").collect()
        }
        # the refresh alice triggered ran as owner: every region present
        assert sum(rows.values()) == 26 and 9 in rows
        ch_sql(spark, "SET SESSION USER default")
        rows2 = {
            r[0]: r[1]
            for r in ch_sql(spark, "SELECT r, n FROM acc_mv").collect()
        }
        assert sum(rows2.values()) == 26
        # alice's direct reads of the SOURCE are still policy-filtered
        ch_sql(spark, "SET SESSION USER alice")
        assert (
            ch_sql(spark, "SELECT count(*) AS n FROM acc_src").collect()[0][0]
            == 5
        )
    finally:
        access_control.reset()
        _SESSION_MVS.pop("acc_mv", None)
        spark.catalog.dropTempView("acc_mv")
        ch_sql(spark, "DROP TABLE IF EXISTS acc_src")
