"""SQL-side dictionaries (frontend CREATE DICTIONARY + dictGet rewrites) —
reference src/Dictionaries/ + FunctionsExternalDictionaries.h.  The
rewrite emits aggregated correlated scalar subqueries that Catalyst
de-correlates into (broadcastable) left joins."""

from __future__ import annotations

import pytest

from byconity_spark.engine.catalog import register_views
from byconity_spark.frontend import ch_sql
from byconity_spark.frontend.sql import _SESSION_DICTIONARIES, ChSqlError
from tests.conftest import SF_DIR


@pytest.fixture(autouse=True)
def _clean():
    _SESSION_DICTIONARIES.clear()
    yield
    _SESSION_DICTIONARIES.clear()


def _mkdict(spark):
    register_views(spark, SF_DIR)
    ch_sql(
        spark,
        "CREATE DICTIONARY nation_dict PRIMARY KEY n_nationkey "
        "SOURCE(CLICKHOUSE(TABLE 'nation')) LAYOUT(HASHED()) LIFETIME(300)",
    )


def test_dict_get_matches_join(spark):
    _mkdict(spark)
    got = ch_sql(
        spark,
        "SELECT dictGet('nation_dict', 'n_name', c_nationkey) AS nname "
        "FROM customer",
    ).collect()
    want = ch_sql(
        spark,
        "SELECT n_name AS nname FROM customer "
        "JOIN nation ON c_nationkey = n_nationkey",
    ).collect()
    assert sorted(r[0] for r in got) == sorted(r[0] for r in want)


def test_dict_has_and_or_default(spark):
    _mkdict(spark)
    row = ch_sql(
        spark,
        "SELECT dictHas('nation_dict', 3) AS h, "
        "dictHas('nation_dict', 9999) AS h2, "
        "dictGetOrDefault('nation_dict', 'n_name', 9999, 'none') AS d, "
        "dictGetOrNull('nation_dict', 'n_name', 9999) AS nn "
        "FROM system.one",
    ).collect()[0]
    assert row[0] is True and row[1] is False
    assert row[2] == "none" and row[3] is None


def test_unknown_dictionary_raises(spark):
    register_views(spark, SF_DIR)
    with pytest.raises(ChSqlError, match="unknown dictionary"):
        ch_sql(spark, "SELECT dictGet('ghost', 'x', 1) FROM system.one")


def test_drop_and_system_view(spark):
    _mkdict(spark)
    rows = ch_sql(
        spark,
        "SELECT name, source_table, key, layout, lifetime_seconds "
        "FROM system.dictionaries",
    ).collect()
    assert rows[0][:5] == ("nation_dict", "nation", "n_nationkey",
                           "HASHED", 300)
    out = ch_sql(spark, "DROP DICTIONARY nation_dict").collect()
    assert out[0][1] == "dropped"
    assert ch_sql(
        spark, "SELECT count(*) AS c FROM system.dictionaries"
    ).collect()[0][0] == 0


def test_create_requires_existing_source(spark):
    with pytest.raises(Exception):
        ch_sql(
            spark,
            "CREATE DICTIONARY bad PRIMARY KEY k "
            "SOURCE(CLICKHOUSE(TABLE 'no_such_table_xyz'))",
        )
    assert "bad" not in _SESSION_DICTIONARIES
