"""Round-8 frontend surface, oracle-checked end-to-end: the clause-aware
CREATE TABLE grammar (ORDER BY tuple(), INDEX declarations,
DEFAULT/MATERIALIZED/ALIAS columns), SET acceptance of reference
Settings.h names, and the dialect tail the reference's own stateless
tests exercise (ternary, variadic xor, NULL-safe intDiv, inline
expression aliases, comparison function forms, replaceRegexpOne backrefs,
VALUES table function).  Reference: ParserCreateQuery.cpp,
src/Core/Settings.h, TableFunctionValues.cpp, the 4_cnch_stateless test
corpus measured by tools/ref_sweep.py."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from byconity_spark.engine.catalog import register_views
from byconity_spark.frontend import ch_sql
from byconity_spark.workloads import register


@register(
    "chsql_create_grammar",
    oracle="""
    SELECT * FROM (VALUES
        (CAST(1 AS INTEGER), CAST(10 AS BIGINT), CAST(101 AS BIGINT),
         CAST(11 AS BIGINT)),
        (CAST(2 AS INTEGER), CAST(20 AS BIGINT), CAST(102 AS BIGINT),
         CAST(22 AS BIGINT)),
        (CAST(3 AS INTEGER), CAST(7 AS BIGINT),  CAST(103 AS BIGINT),
         CAST(10 AS BIGINT))
    ) AS t(a, b, m, al) ORDER BY a
    """,
)
def chsql_create_grammar(spark: SparkSession, sf: str) -> DataFrame:
    """The reference's real DDL idioms end-to-end: ORDER BY tuple() (the
    most common tail in its own tests — 245 files), an INDEX declaration
    in the column list, a SETTINGS tail, DEFAULT filled at INSERT,
    MATERIALIZED computed at INSERT and hidden from SELECT *, ALIAS
    computed on read."""
    register_views(spark, sf)
    ch_sql(spark, "DROP TABLE IF EXISTS g8_grammar")
    ch_sql(
        spark,
        "CREATE TABLE g8_grammar (a Int32, b Int64 DEFAULT a * 10, "
        "m Int64 MATERIALIZED a + 100, al ALIAS a + b, "
        "INDEX ix (a) TYPE minmax GRANULARITY 1) "
        "ENGINE = CnchMergeTree() ORDER BY tuple() "
        "SETTINGS index_granularity = 8192",
    )
    ch_sql(spark, "INSERT INTO g8_grammar (a) VALUES (1), (2)")
    ch_sql(spark, "INSERT INTO g8_grammar VALUES (3, 7)")
    star = ch_sql(spark, "SELECT * FROM g8_grammar")
    assert set(star.columns) == {"a", "b"}, "SELECT * must hide m/al"
    return ch_sql(
        spark, "SELECT a, b, m, al FROM g8_grammar ORDER BY a"
    )


@register(
    "chsql_dialect8_suite",
    oracle="""
    SELECT n_nationkey AS k,
           CAST(CASE WHEN n_nationkey > 12 THEN 1 ELSE 0 END AS BIGINT)
               AS tern,
           CAST((n_nationkey % 2 = 1) != (n_regionkey % 2 = 1) AS BIGINT)
               AS xr,
           n_nationkey // 3 AS idv,
           CAST(NULL AS BIGINT) AS idn,
           printf('%o', n_nationkey + 8) AS oc,
           regexp_replace(n_name, '(A)', '[\\1]') AS rro,
           CAST(n_regionkey = 2 AS BIGINT) AS eq,
           CAST(length(n_name) + length(n_name) AS BIGINT) AS inas
    FROM nation ORDER BY k
    """,
)
def chsql_dialect8_suite(spark: SparkSession, sf: str) -> DataFrame:
    """Dialect tail from the reference-test sweep: CH ternary, variadic
    xor, truncating NULL-safe intDiv, OCT, replaceRegexpOne with a user
    capture group + \\1 backref (anchored-lazy-prefix rewrite), equals()
    function form, inline expression alias reused later in the item."""
    register_views(spark, sf)
    return ch_sql(
        spark,
        """
        SELECT n_nationkey AS k,
               toInt64(n_nationkey > 12 ? 1 : 0) AS tern,
               toInt64(xor(n_nationkey % 2 = 1, n_regionkey % 2 = 1)) AS xr,
               intDiv(n_nationkey, 3) AS idv,
               intDiv(n_nationkey, CAST(NULL, 'Nullable(Int64)')) AS idn,
               OCT(n_nationkey + 8) AS oc,
               replaceRegexpOne(n_name, '(A)', '[\\\\1]') AS rro,
               toInt64(equals(n_regionkey, 2)) AS eq,
               toInt64(length(n_name AS nm) + length(nm)) AS inas
        FROM nation ORDER BY k
        """,
    )


@register(
    "chsql_values_tf",
    oracle="""
    SELECT * FROM (VALUES
        (CAST(1 AS BIGINT), 'hello', '1: hello'),
        (CAST(2 AS BIGINT), 'world', '2: world')
    ) AS t(x, s, z) ORDER BY x
    """,
)
def chsql_values_tf(spark: SparkSession, sf: str) -> DataFrame:
    """VALUES('structure', ...) table function with an ALIAS column
    (TableFunctionValues.cpp; reference test 00978)."""
    register_views(spark, sf)
    return ch_sql(
        spark,
        r"SELECT x, s, z FROM VALUES('x UInt64, s String, "
        r"z ALIAS concat(toString(x), \': \', s)', "
        r"(1, 'hello'), (2, 'world')) ORDER BY x",
    )


@register(
    "chsql_set_settings",
    oracle="""
    SELECT * FROM (VALUES
        ('dialect_type', 'ANSI', 1),
        ('enable_optimizer', '0', 1)
    ) AS t(name, value, changed) ORDER BY name
    """,
)
def chsql_set_settings(spark: SparkSession, sf: str) -> DataFrame:
    """SET of reference Settings.h names is accepted and recorded
    (BaseSettings::set contract — unknown names still error), surfaced
    via SHOW SETTINGS.  The settings are restored afterwards so a
    lingering dialect_type=ANSI cannot flip ClickHouse-dialect
    semantics (rollup/totals key defaults) for queries that happen to
    run later in the same session."""
    from byconity_spark.frontend.sql import _SESSION_SETTINGS

    register_views(spark, sf)
    saved = {
        k: _SESSION_SETTINGS.get(k)
        for k in ("dialect_type", "enable_optimizer")
    }
    try:
        ch_sql(spark, "SET dialect_type = 'ANSI', enable_optimizer = 0")
        df = ch_sql(spark, "SHOW SETTINGS LIKE '%optimizer%'").unionByName(
            ch_sql(spark, "SHOW SETTINGS LIKE 'dialect%'")
        )
        # SHOW SETTINGS materializes from the registry eagerly, so the
        # restore below cannot change the returned rows
        return df.orderBy("name").selectExpr(
            "name", "value", "CAST(changed AS INT) AS changed"
        )
    finally:
        for k, v in saved.items():
            if v is None:
                _SESSION_SETTINGS.pop(k, None)
            else:
                _SESSION_SETTINGS[k] = v
