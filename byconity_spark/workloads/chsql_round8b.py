"""Round-8 batch-6/7 dialect surface, oracle-checked end-to-end: CH
alias visibility in WHERE, GROUPS window frames, untuple, INGEST
PARTITION, BYTE-map operations (implicit access, CLEAR MAP KEY,
getMapKeys), Mann-Whitney U, and the scalar tail the reference's own
stateless tests exercise.  Reference: ExpressionAnalyzer alias
resolution, WindowTransform.cpp GROUPS frames, src/Functions/untuple,
MemoryEfficientIngestColumn.h, MergeTree map implicit columns,
AggregateFunctionMannWhitney.h — measured by tools/ref_sweep.py."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from byconity_spark.engine.catalog import register_views
from byconity_spark.frontend import ch_sql
from byconity_spark.workloads import register


@register(
    "chsql_alias_where",
    oracle="""
    SELECT l_orderkey AS k, l_quantity + 1 AS q1
    FROM lineitem
    WHERE l_quantity + 1 > 50 AND l_returnflag = 'R'
    ORDER BY k, q1
    """,
)
def chsql_alias_where(spark: SparkSession, sf: str) -> DataFrame:
    """SELECT-list alias referenced from WHERE (reference
    ExpressionAnalyzer alias visibility; 40073_ansi_better_aliases) —
    DuckDB disallows it, so the oracle inlines the expression.
    Scale shape: the substitution happens at ANALYSIS time; the executed
    plan is the same single filtered scan with pushdown."""
    register_views(spark, sf)
    return ch_sql(
        spark,
        "SELECT l_orderkey AS k, l_quantity + 1 AS q1 FROM lineitem "
        "WHERE q1 > 50 AND l_returnflag = 'R' ORDER BY k, q1",
    )


@register(
    "chsql_groups_frame",
    oracle="""
    WITH r AS (
        SELECT o_custkey AS c, o_totalprice AS p,
               dense_rank() OVER (PARTITION BY o_custkey
                   ORDER BY o_custkey + o_totalprice) AS dr
        FROM orders WHERE o_custkey < 200
    )
    SELECT c, p,
           sum(p) OVER (PARTITION BY c ORDER BY dr
               RANGE BETWEEN 1 PRECEDING AND CURRENT ROW) AS g
    FROM r ORDER BY c, p, g
    """,
)
def chsql_groups_frame(spark: SparkSession, sf: str) -> DataFrame:
    """GROUPS window frame in the TEXT dialect (WindowTransform.cpp
    supports GROUPS; Spark lacks it — the frontend rewrites to a RANGE
    frame over dense_rank; DuckDB lacks GROUPS too, so the oracle is
    the same peer-group definition written independently).  Scale shape: one extra window column over the SAME
    partitioning — no additional shuffle."""
    register_views(spark, sf)
    return ch_sql(
        spark,
        "SELECT o_custkey AS c, o_totalprice AS p, "
        "sum(o_totalprice) OVER (PARTITION BY o_custkey "
        "ORDER BY o_custkey + o_totalprice "
        "GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW) AS g "
        "FROM orders WHERE o_custkey < 200 ORDER BY c, p, g",
    )


@register(
    "chsql_untuple",
    oracle="""
    SELECT r_regionkey AS rk, r_name AS a, r_regionkey * 2 AS b, 'x' AS c
    FROM region ORDER BY rk
    """,
)
def chsql_untuple(spark: SparkSession, sf: str) -> DataFrame:
    """untuple((..)) splices tuple elements into the select list
    (src/Functions/untuple; 01803_untuple_subquery)."""
    register_views(spark, sf)
    return ch_sql(
        spark,
        "SELECT r_regionkey AS rk, "
        "untuple((r_name, r_regionkey * 2)), 'x' AS c "
        "FROM region ORDER BY rk",
    ).toDF("rk", "a", "b", "c")


@register(
    "chsql_ingest_partition",
    oracle="""
    WITH tgt AS (
        SELECT CAST(l_orderkey AS INTEGER) AS id,
               min('old-' || l_returnflag) AS c1,
               min(CAST(l_quantity AS BIGINT)) AS keep
        FROM lineitem WHERE l_orderkey < 100 AND l_linenumber = 1
        GROUP BY l_orderkey
    ),
    src AS (
        SELECT CAST(l_orderkey AS INTEGER) AS id,
               min('new-' || l_linestatus) AS c1
        FROM lineitem WHERE l_orderkey < 60 AND l_linenumber = 1
        GROUP BY l_orderkey
    )
    SELECT t.id, coalesce(s.c1, t.c1) AS c1, t.keep
    FROM tgt t LEFT JOIN src s USING (id)
    ORDER BY id
    """,
)
def chsql_ingest_partition(spark: SparkSession, sf: str) -> DataFrame:
    """ALTER TABLE .. INGEST PARTITION columns/key/from (reference
    MemoryEfficientIngestColumn.h): matched keys take the ingested
    column.  Scale shape: ONE key-hash shuffle for the left join — the
    reference's memory_efficient_* knob bounds a hashtable the shuffle
    join never needs."""
    register_views(spark, sf)
    ch_sql(spark, "DROP TABLE IF EXISTS ing8_t")
    ch_sql(spark, "DROP TABLE IF EXISTS ing8_s")
    ch_sql(spark, "CREATE TABLE ing8_t (p Date, id Int32, c1 String, "
                  "keep Int64) ENGINE = CnchMergeTree PARTITION BY p "
                  "ORDER BY id")
    ch_sql(spark, "CREATE TABLE ing8_s (p Date, id Int32, c1 String) "
                  "ENGINE = CnchMergeTree PARTITION BY p ORDER BY id")
    ch_sql(spark, "INSERT INTO ing8_t SELECT '2020-01-01', "
                  "CAST(l_orderkey AS Int32), "
                  "min(concat('old-', l_returnflag)), "
                  "min(CAST(l_quantity AS Int64)) FROM lineitem "
                  "WHERE l_orderkey < 100 AND l_linenumber = 1 "
                  "GROUP BY l_orderkey")
    ch_sql(spark, "INSERT INTO ing8_s SELECT '2020-01-01', "
                  "CAST(l_orderkey AS Int32), "
                  "min(concat('new-', l_linestatus)) FROM lineitem "
                  "WHERE l_orderkey < 60 AND l_linenumber = 1 "
                  "GROUP BY l_orderkey")
    ch_sql(spark, "ALTER TABLE ing8_t ingest partition '2020-01-01' "
                  "columns c1 key id from ing8_s")
    return ch_sql(spark, "SELECT id, c1, keep FROM ing8_t ORDER BY id")


@register(
    "chsql_map_byte_ops",
    oracle="""
    SELECT * FROM (VALUES
        (1, 'v1', '', 'k1|k3', 'k1|k2|k3'),
        (2, NULL, 'w2', 'k2', 'k1|k2|k3')
    ) AS t(n, k1v, k2v, ks, gk) ORDER BY n
    """,
)
def chsql_map_byte_ops(spark: SparkSession, sf: str) -> DataFrame:
    """BYTE-map surface: implicit `m{'k'}` access, CLEAR MAP KEY
    mutation, getMapKeys introspection (reference MergeTree map implicit
    columns; 00745_merge_tree_map* tests).  getMapKeys is a scalar
    subquery over ONE distributed map_keys pass."""
    register_views(spark, sf)
    ch_sql(spark, "DROP TABLE IF EXISTS map8_t")
    ch_sql(spark, "CREATE TABLE map8_t (n UInt8, m Map(String, String)) "
                  "Engine=CnchMergeTree ORDER BY n")
    ch_sql(spark, "insert into map8_t values "
                  "(1, {'k1': 'v1', 'kz': 'vz', 'k3': 'v3'}), "
                  "(2, {'k2': 'w2'})")
    ch_sql(spark, "ALTER TABLE map8_t clear map key m('kz')")
    # arrays serialized to '|'-joined strings: the driver hasher contract
    # (COVERAGE.md round-4) forbids raw ARRAY output columns
    return ch_sql(
        spark,
        "select n, m{'k1'} AS k1v, m['k2'] AS k2v, "
        "arrayStringConcat(arraySort(mapKeys(m)), '|') AS ks, "
        "arrayStringConcat(getMapKeys(currentDatabase(0), 'map8_t', 'm'), "
        "'|') AS gk from map8_t order by n",
    )


@register(
    "chsql_mann_whitney",
    oracle="""
    WITH ranked AS (
        SELECT CAST(value AS DOUBLE) AS v,
               CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS lab,
               rank() OVER (ORDER BY CAST(value AS DOUBLE)) AS rmin,
               count(*) OVER (PARTITION BY CAST(value AS DOUBLE)) AS t
        FROM events WHERE event_type IN ('click', 'purchase')
          AND event_id < 3000 AND value IS NOT NULL
    ),
    agg AS (
        SELECT sum(CASE WHEN lab = 0 THEN rmin + (t - 1) / 2.0 END) AS r1,
               sum(CASE WHEN lab = 0 THEN 1 ELSE 0 END) AS n1,
               sum(CASE WHEN lab = 1 THEN 1 ELSE 0 END) AS n2
        FROM ranked
    )
    SELECT r1 - n1 * (n1 + 1) / 2.0 AS u
    FROM agg
    """,
)
def chsql_mann_whitney(spark: SparkSession, sf: str) -> DataFrame:
    """mannWhitneyUTest in the SQL dialect (reference
    AggregateFunctionMannWhitney.h; 01560_mann_whitney) — the U
    statistic cross-checked against DuckDB's windowed average-rank
    formulation.  The operator path (udafs/behavioral.mann_whitney_u)
    is the shuffle-parallel form; this kernel is the per-group Arrow
    path the SQL surface uses."""
    register_views(spark, sf)
    return ch_sql(
        spark,
        "SELECT mannWhitneyUTest(CAST(value AS Float64), "
        "if(event_type = 'click', 0, 1)).1 AS u "
        "FROM events WHERE event_type IN ('click', 'purchase') "
        "AND event_id < 3000 AND value IS NOT NULL",
    )


@register(
    "chsql_dialect8b_suite",
    oracle="""
    SELECT
        1 AS bt,
        CAST('nan' AS DOUBLE) AS rsd,
        CAST(42.0 AS DOUBLE) AS aod,
        'ezs42' AS gh,
        '2022-01-01 01:02:03.000' AS at,
        CAST(0 AS INTEGER) AS oor,
        CAST('Infinity' AS DOUBLE) AS pinf,
        -8033055131586094827 AS wrapped,
        CAST(60 AS BIGINT) AS smerge
    """,
)
def chsql_dialect8b_suite(spark: SparkSession, sf: str) -> DataFrame:
    """Scalar tail from the sweep: UInt8-typed bitTestAll comparisons,
    arrayReduce stddevSampOrNull on a singleton, avgOrDefaultIf chains,
    geohashEncode, TIME-literal ADDTIME, out-of-range subscripts (type
    default, not ANSI error), inf literals, Int64 literal overflow wrap,
    sumState/sumMerge roundtrip."""
    register_views(spark, sf)
    return ch_sql(
        spark,
        "SELECT "
        "bitTestAll(255, 0, 1, 2) AS bt, "
        "arrayReduce('stddevSampOrNull', [1]) AS rsd, "
        "avgOrDefaultIf(x, x > 40) AS aod, "
        "geohashEncode(-5.60302734375, 42.593994140625, 5) AS gh, "
        "ADDTIME(DATE '2022-01-01', '01:02:03') AS at, "
        "[1, 2, 3][10] AS oor, "
        "inf AS pinf, "
        "CAST(10413688942123456789 AS Int64) AS wrapped, "
        "sumMerge(st) AS smerge "
        "FROM (SELECT CAST(42 AS DOUBLE) AS x, sumState(n) AS st "
        "      FROM (SELECT 10 AS n UNION ALL SELECT 20 "
        "            UNION ALL SELECT 30) GROUP BY 1)",
    )
