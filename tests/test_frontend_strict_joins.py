"""Frontend ASOF/ANY JOIN routing: the SQL surface must produce the same
frames as the operator API, and unsupported shapes must raise ChSqlError."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from byconity_spark.engine.catalog import register_views
from byconity_spark.frontend import ch_sql
from byconity_spark.frontend.sql import ChSqlError
from tests.conftest import SF_DIR


@pytest.fixture()
def views(spark):
    register_views(spark, SF_DIR)
    return spark


def test_asof_forward_strict(views):
    """Forward ASOF (l.t < r.t flavor via <=): next click at-or-after signup."""
    views.sql(
        "SELECT event_id, user_id, ts AS signup_ts FROM events "
        "WHERE event_type = 'signup'"
    ).createOrReplaceTempView("signups_v")
    views.sql(
        "SELECT user_id, ts AS click_ts, max(event_id) AS click_id FROM events "
        "WHERE event_type = 'click' GROUP BY user_id, ts"
    ).createOrReplaceTempView("clicks_fwd_v")
    out = ch_sql(
        views,
        """
        SELECT s.event_id, s.user_id, s.signup_ts, c.click_id, c.click_ts
        FROM signups_v s ASOF LEFT JOIN clicks_fwd_v c
          ON s.user_id = c.user_id AND s.signup_ts <= c.click_ts
        """,
    )
    rows = out.collect()
    assert len(rows) == views.table("signups_v").count()
    matched = [r for r in rows if r.click_ts is not None]
    assert matched, "expected at least one forward match"
    assert all(r.click_ts >= r.signup_ts for r in matched)


def test_asof_using_last_column_is_inequality(views):
    """ClickHouse ASOF JOIN USING(k, t): the LAST column is the >=
    inequality, the rest equi keys."""
    views.sql(
        "SELECT user_id, ts, event_id AS purchase_id FROM events "
        "WHERE event_type = 'purchase'"
    ).createOrReplaceTempView("asof_u_purch_v")
    views.sql(
        "SELECT user_id, ts, max(event_id) AS click_id FROM events "
        "WHERE event_type = 'click' GROUP BY user_id, ts"
    ).createOrReplaceTempView("asof_u_click_v")
    out = ch_sql(
        views,
        """
        SELECT p.purchase_id, p.user_id, c.click_id
        FROM asof_u_purch_v p ASOF LEFT JOIN asof_u_click_v c USING (user_id, ts)
        """,
    )
    rows = out.collect()
    assert len(rows) == views.table("asof_u_purch_v").count()
    assert any(r.click_id is not None for r in rows)

    # single-column USING cannot express ASOF (no equi key left)
    with pytest.raises(ChSqlError):
        ch_sql(
            views,
            "SELECT p.purchase_id FROM asof_u_purch_v p "
            "ASOF JOIN asof_u_click_v c USING (ts)",
        )


def test_any_inner_join(views):
    out = ch_sql(
        views,
        """
        SELECT c.c_custkey, o.o_orderkey
        FROM customer c ANY INNER JOIN orders o ON c.c_custkey = o.o_custkey
        """,
    )
    counts = out.groupBy("c_custkey").count().agg(F.max("count")).collect()[0][0]
    assert counts == 1  # at most one right row per key


def test_unsupported_shape_raises(views):
    with pytest.raises(ChSqlError):
        ch_sql(
            views,
            "SELECT * FROM (SELECT 1 AS x) a ASOF JOIN (SELECT 2 AS y) b "
            "ON a.x = b.y AND a.x >= b.y",
        )


def test_plain_sql_not_intercepted(views):
    # 'any'-free, asof-free SQL goes down the normal rewrite path
    out = ch_sql(views, "SELECT count() AS n FROM nation")
    assert out.collect()[0].n == 25


def test_asof_with_subquery_sides(views):
    """Subquery sides route through ch_sql and register as views before the
    strict-join parse."""
    out = ch_sql(
        views,
        """
        SELECT p.event_id, p.user_id, c.click_ts
        FROM (SELECT event_id, user_id, ts AS purchase_ts FROM events
              WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (SELECT user_id, ts AS click_ts,
                               max(event_id) AS click_id
                        FROM events WHERE event_type = 'click'
                        GROUP BY user_id, ts) c
          ON p.user_id = c.user_id AND p.purchase_ts >= c.click_ts
        """,
    )
    rows = out.collect()
    n_purchases = views.sql(
        "SELECT count(*) n FROM events WHERE event_type = 'purchase'"
    ).collect()[0].n
    assert len(rows) == n_purchases
    matched = [r for r in rows if r.click_ts is not None]
    assert matched


def test_any_with_subquery_right_side(views):
    out = ch_sql(
        views,
        """
        SELECT c.c_custkey, o.o_orderkey
        FROM customer c ANY LEFT JOIN
             (SELECT o_custkey, o_orderkey FROM orders) o
          ON c.c_custkey = o.o_custkey
        """,
    )
    from pyspark.sql import functions as F

    assert out.groupBy("c_custkey").count().agg(F.max("count")).collect()[0][0] == 1


def test_strict_join_followed_by_ordinary_join(views):
    """Multi-join: one ANY JOIN plus a following ordinary JOIN — the strict
    pair materializes, the trailing join stays SQL."""
    out = ch_sql(
        views,
        """
        SELECT c.c_custkey, o.o_orderkey, n.n_name
        FROM customer c ANY INNER JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE c.c_custkey < 50
        """,
    )
    rows = out.collect()
    assert rows and all(r.n_name is not None for r in rows)
    per_cust = {}
    for r in rows:
        per_cust.setdefault(r.c_custkey, set()).add(r.o_orderkey)
    assert all(len(v) == 1 for v in per_cust.values())  # ANY semantics held
