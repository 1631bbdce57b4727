"""Round-11 dialect surface, oracle-checked end-to-end: the infix
MOD/DIV operator family (reference ParserExpression operator table,
01638_div_mod_ambiguities — MySQL-compat operators that evaluate
left-to-right) across every clause position the r10 verdict flagged.
Scale shape: pure parse-time rewrites — the executed plans are ordinary
filtered/grouped scans with pushdown, nothing survives to runtime."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from byconity_spark.engine.catalog import register_views
from byconity_spark.frontend import ch_sql
from byconity_spark.workloads import register


@register(
    "chsql_infix_mod",
    oracle="""
    SELECT l_orderkey % 7 AS bucket,
           count(*) AS cnt,
           CAST(sum(CAST(l_quantity AS BIGINT) % 5) AS BIGINT) AS qmod,
           CAST(min((l_orderkey // 10) % 3) AS BIGINT) AS divmod
    FROM lineitem
    WHERE l_orderkey % 2 = 1
    GROUP BY l_orderkey % 7
    ORDER BY bucket
    """,
)
def chsql_infix_mod(spark: SparkSession, sf: str) -> DataFrame:
    """Infix ``MOD`` in WHERE / GROUP BY / aggregate-argument /
    DIV-chained positions plus a user alias — the full r10-regression
    matrix in one statement (reference 01638; MySQL dialect ops)."""
    register_views(spark, sf)
    return ch_sql(
        spark,
        "SELECT l_orderkey MOD 7 AS bucket, count(*) AS cnt, "
        "sum(toInt64(l_quantity) MOD 5) AS qmod, "
        "toInt64(min(l_orderkey DIV 10 MOD 3)) AS divmod "
        "FROM lineitem WHERE l_orderkey MOD 2 = 1 "
        "GROUP BY l_orderkey MOD 7 ORDER BY bucket",
    )
