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


def test_strict_join_with_left_chain(views):
    """Strict join whose LEFT side is a textual join chain: the chain
    materializes first, then the ANY join anchors on it."""
    out = ch_sql(
        views,
        """
        SELECT n.n_name, c.c_custkey, o.o_orderkey
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        ANY JOIN orders o ON c.c_custkey = o.o_custkey
        ORDER BY c.c_custkey
        """,
    )
    rows = out.collect()
    buyers = views.sql(
        "SELECT count(DISTINCT o_custkey) AS n FROM orders "
        "WHERE o_custkey IN (SELECT c_custkey FROM customer)"
    ).first().n
    assert len(rows) == buyers
    assert len({r.c_custkey for r in rows}) == len(rows)  # ANY: one per key


def test_two_strict_joins_in_one_query(views):
    """Two ASOF joins resolve recursively."""
    views.sql(
        "SELECT user_id, ts AS signup_ts FROM events WHERE event_type='signup'"
    ).createOrReplaceTempView("ms_signup_v")
    views.sql(
        "SELECT user_id, ts AS click_ts, max(event_id) AS click_id "
        "FROM events WHERE event_type='click' GROUP BY user_id, ts"
    ).createOrReplaceTempView("ms_click_v")
    views.sql(
        "SELECT user_id, ts AS purch_ts, max(event_id) AS purch_id "
        "FROM events WHERE event_type='purchase' GROUP BY user_id, ts"
    ).createOrReplaceTempView("ms_purch_v")
    out = ch_sql(
        views,
        """
        SELECT s.user_id, s.signup_ts, c.click_ts, p.purch_ts
        FROM ms_signup_v s
        ASOF LEFT JOIN ms_click_v c
          ON s.user_id = c.user_id AND s.signup_ts <= c.click_ts
        ASOF LEFT JOIN ms_purch_v p
          ON s.user_id = p.user_id AND s.signup_ts <= p.purch_ts
        """,
    )
    rows = out.collect()
    assert len(rows) == views.table("ms_signup_v").count()
    m1 = [r for r in rows if r.click_ts is not None]
    m2 = [r for r in rows if r.purch_ts is not None]
    assert m1 and m2
    assert all(r.click_ts >= r.signup_ts for r in m1)
    assert all(r.purch_ts >= r.signup_ts for r in m2)


def test_chain_then_asof_with_aggregate(views):
    """Chain-left ASOF with GROUP BY over the mixed frame."""
    views.sql(
        "SELECT user_id, ts AS click_ts, max(event_id) AS click_id "
        "FROM events WHERE event_type='click' GROUP BY user_id, ts"
    ).createOrReplaceTempView("ca_click_v")
    views.sql(
        "SELECT user_id, event_id, ts AS purch_ts "
        "FROM events WHERE event_type='purchase'"
    ).createOrReplaceTempView("ca_purch_v")
    views.sql(
        "SELECT DISTINCT user_id, user_id % 5 AS cohort FROM events"
    ).createOrReplaceTempView("ca_user_v")
    out = ch_sql(
        views,
        """
        SELECT u.cohort, count() AS n_matched
        FROM ca_purch_v p JOIN ca_user_v u ON p.user_id = u.user_id
        ASOF JOIN ca_click_v c
          ON p.user_id = c.user_id AND p.purch_ts >= c.click_ts
        GROUP BY u.cohort
        ORDER BY u.cohort
        """,
    )
    rows = out.collect()
    assert rows and all(r.n_matched > 0 for r in rows)


def test_any_right_join_keeps_all_right_rows(spark):
    """ANY RIGHT JOIN: every right row, at most one left match (the
    smallest under payload order)."""
    from byconity_spark.engine.catalog import register_views
    from tests.conftest import SF_DIR

    register_views(spark, SF_DIR)
    rows = ch_sql(
        spark,
        "SELECT r.r_name AS rname, n.n_name AS nname "
        "FROM (SELECT n_regionkey, n_name FROM nation) AS n "
        "ANY RIGHT JOIN region AS r ON n.n_regionkey = r.r_regionkey "
        "ORDER BY rname",
    ).collect()
    assert len(rows) == 5  # all regions survive
    assert all(r["nname"] is not None for r in rows)


def test_global_prefix_strips_on_strict_joins(spark):
    from byconity_spark.engine.catalog import register_views
    from tests.conftest import SF_DIR

    register_views(spark, SF_DIR)
    n = ch_sql(
        spark,
        "SELECT count(*) AS n FROM orders AS o GLOBAL ANY INNER JOIN "
        "customer AS c ON o.o_custkey = c.c_custkey",
    ).collect()[0][0]
    assert n > 0


def test_asof_right_join_rejected(spark):
    import pytest as _pt

    from byconity_spark.engine.catalog import register_views
    from tests.conftest import SF_DIR

    register_views(spark, SF_DIR)
    with _pt.raises(ChSqlError, match="ASOF RIGHT"):
        ch_sql(
            spark,
            "SELECT 1 FROM events AS a ASOF RIGHT JOIN events AS b "
            "USING (user_id, ts)",
        )
