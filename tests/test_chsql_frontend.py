"""Unit tests for the ClickHouse-SQL -> Spark-SQL rewriter (pure string
transforms, no Spark needed except the execution smoke test)."""

from __future__ import annotations

import pytest

from byconity_spark.frontend import rewrite_ch_sql
from byconity_spark.frontend.sql import ChSqlError, ch_sql


def test_simple_renames():
    assert rewrite_ch_sql("SELECT toYear(ts), uniq(u) FROM t") == (
        "SELECT year(ts), approx_count_distinct(u) FROM t"
    )


def test_nested_rewrites():
    out = rewrite_ch_sql("SELECT toYYYYMM(toStartOfMonth(ts)) FROM t")
    assert out == (
        "SELECT CAST(year(date_trunc('month', ts)) * 100 + "
        "month(date_trunc('month', ts)) AS INT) FROM t"
    )


def test_combinator_templates():
    assert rewrite_ch_sql("sumIf(v, c > 1)") == "sum(CASE WHEN c > 1 THEN v END)"
    assert rewrite_ch_sql("countIf(flag)") == "count_if(flag)"
    assert rewrite_ch_sql("uniqExact(a, b)") == "count(DISTINCT a, b)"
    assert rewrite_ch_sql("count()") == "count(*)"
    assert rewrite_ch_sql("count(*)") == "count(*)"


def test_parametric_aggregates():
    assert rewrite_ch_sql("quantile(0.9)(value)") == "percentile_approx(value, 0.9)"
    assert rewrite_ch_sql("quantileExact(0.5)(v)") == "percentile(v, 0.5)"


def test_json_path_building():
    assert (
        rewrite_ch_sql("JSONExtractInt(props, 'k')")
        == "CAST(get_json_object(props, '$.k') AS BIGINT)"
    )
    assert (
        rewrite_ch_sql("JSONExtractString(props, keycol)")
        == "get_json_object(props, concat('$.', keycol))"
    )


def test_strings_and_keywords_untouched():
    # function names inside string literals must not be rewritten
    assert (
        rewrite_ch_sql("SELECT 'toYear(x)' AS s, toYear(d) FROM t")
        == "SELECT 'toYear(x)' AS s, year(d) FROM t"
    )
    # quantified comparison ANY is not a function call
    sql = "SELECT * FROM t WHERE x > ANY (SELECT v FROM s)"
    assert rewrite_ch_sql(sql) == sql


def test_multi_if_chain():
    # conditions coerce through CAST(... AS BOOLEAN): CH allows UInt8
    # conditions (multiIf(0, 'a', 1, 'b', 'c') in the reference's tests)
    assert (
        rewrite_ch_sql("multiIf(a > 1, 'x', b > 2, 'y', 'z')")
        == "CASE WHEN CAST(a > 1 AS BOOLEAN) THEN 'x' "
           "WHEN CAST(b > 2 AS BOOLEAN) THEN 'y' ELSE 'z' END"
    )


def test_limit_by_clause_rewrite():
    out = rewrite_ch_sql(
        "SELECT k, v FROM t ORDER BY v DESC, k LIMIT 2 BY k LIMIT 10"
    )
    assert "row_number() OVER (PARTITION BY k ORDER BY v DESC NULLS FIRST, k NULLS LAST)" in out
    assert "__rn <= 2" in out
    assert out.strip().endswith("LIMIT 10")
    # no top-level LIMIT BY -> untouched (except the CH NULLS placement)
    plain = "SELECT k FROM t ORDER BY k LIMIT 5"
    assert rewrite_ch_sql(plain) == (
        "SELECT k FROM t ORDER BY k NULLS LAST LIMIT 5"
    )
    # LIMIT BY inside a subquery is not (yet) rewritten at this level
    sub = "SELECT * FROM (SELECT 1) WHERE x IN (SELECT k FROM t)"
    assert rewrite_ch_sql(sub) == sub


def test_unbalanced_raises():
    with pytest.raises(ChSqlError):
        rewrite_ch_sql("SELECT toYear(ts FROM t")


def test_execution_end_to_end(spark):
    df = spark.createDataFrame(
        [("2024-03-15 10:00:00", 5.0), ("2024-03-15 11:30:00", 150.0)],
        "ts string, v double",
    ).selectExpr("CAST(ts AS TIMESTAMP) AS ts", "v")
    df.createOrReplaceTempView("t_ch")
    from byconity_spark.frontend import ch_sql

    out = ch_sql(
        spark,
        "SELECT toStartOfDay(ts) AS d, countIf(v > 100) AS big, count() AS n "
        "FROM t_ch GROUP BY d",
    ).collect()
    assert out[0].big == 1 and out[0].n == 2


def test_date_diff_boundary_vs_age(spark):
    # 23:00 -> next day 01:00: 2 h elapsed, ONE day boundary crossed.
    # CH dateDiff counts the crossing (=1); CH age counts complete days (=0).
    spark.createDataFrame(
        [("2024-01-01 23:00:00", "2024-01-02 01:00:00")], "a string, b string"
    ).selectExpr(
        "CAST(a AS TIMESTAMP) AS a", "CAST(b AS TIMESTAMP) AS b"
    ).createOrReplaceTempView("t_dd")
    from byconity_spark.frontend import ch_sql

    row = ch_sql(
        spark,
        "SELECT dateDiff('day', a, b) AS dd, age('day', a, b) AS ag, "
        "dateDiff('hour', a, b) AS dh, dateDiff('month', a, b) AS dm, "
        "dateDiff('year', a, b) AS dy FROM t_dd",
    ).collect()[0]
    assert (row.dd, row.ag, row.dh, row.dm, row.dy) == (1, 0, 2, 0, 0)
    # and the SQL path must agree with the Column-API registry._date_diff
    from byconity_spark.functions.registry import SCALAR
    from pyspark.sql import functions as F

    col_row = (
        spark.table("t_dd")
        .select(SCALAR["dateDiff"]("day", F.col("a"), F.col("b")).alias("dd"))
        .collect()[0]
    )
    assert col_row.dd == row.dd


# ------------------------------------------------------------- new clauses

def test_format_clause_stripped():
    assert rewrite_ch_sql("SELECT 1 FROM t FORMAT JSONEachRow") == "SELECT 1 FROM t"
    assert rewrite_ch_sql("SELECT 1 FROM t FORMAT CSV;") == "SELECT 1 FROM t"
    # FORMAT mid-identifier or as function arg must survive
    assert "date_format" in rewrite_ch_sql("SELECT date_format(ts, 'yyyy') FROM t")


def test_sample_rewrite():
    assert (
        rewrite_ch_sql("SELECT count() FROM lineitem SAMPLE 0.1")
        == "SELECT count(*) FROM lineitem TABLESAMPLE (10 PERCENT)"
    )
    # SAMPLE n (rows form) maps to TABLESAMPLE (n ROWS) since r8
    assert (
        rewrite_ch_sql("SELECT 1 FROM t SAMPLE 1000")
        == "SELECT 1 FROM t TABLESAMPLE (1000 ROWS)"
    )


def test_asof_join_detected():
    with pytest.raises(ChSqlError, match="asof_join"):
        rewrite_ch_sql("SELECT * FROM a ASOF JOIN b ON a.k = b.k AND a.t >= b.t")


def test_subquery_limit_by():
    out = rewrite_ch_sql(
        "SELECT sum(n) FROM (SELECT g, v AS n FROM t ORDER BY v DESC LIMIT 2 BY g)"
    )
    assert "row_number() OVER (PARTITION BY g ORDER BY v DESC NULLS FIRST)" in out
    assert "__rn <= 2" in out


def test_with_fill_rewrite():
    out = rewrite_ch_sql(
        "SELECT h, n FROM (SELECT k AS h, count() AS n FROM t GROUP BY k) "
        "ORDER BY h WITH FILL STEP 2"
    )
    # r11: the spine is type-generic (floats can be fill keys, 01614)
    assert "explode(transform(sequence(0, " in out
    assert "__k * (2)" in out
    assert "LEFT JOIN" in out and "USING (h)" in out
    out2 = rewrite_ch_sql("SELECT k, v FROM t ORDER BY k WITH FILL FROM 0 TO 10")
    assert "transform(sequence(0, " in out2 and "WHERE k < 10" in out2
    # DESC and grouped multi-key fills are supported since round 3
    out3 = rewrite_ch_sql("SELECT k FROM t ORDER BY k DESC WITH FILL")
    assert "(__hi) - __k * (1)" in out3
    out4 = rewrite_ch_sql("SELECT a, b FROM t ORDER BY a, b WITH FILL")
    assert "GROUP BY a" in out4 and "USING (a, b)" in out4


def test_with_fill_executes(spark):
    from byconity_spark.frontend import ch_sql

    spark.range(0, 10, 3).createOrReplaceTempView("__fill_t")
    rows = ch_sql(
        spark,
        "SELECT id, id * 10 AS v FROM __fill_t ORDER BY id WITH FILL",
    ).collect()
    assert [r.id for r in rows] == list(range(10))
    assert [r.v for r in rows] == [0, None, None, 30, None, None, 60, None, None, 90]


def test_sample_executes(spark):
    from byconity_spark.frontend import ch_sql

    spark.range(0, 10_000).createOrReplaceTempView("__sample_t")
    n = ch_sql(spark, "SELECT count() AS n FROM __sample_t SAMPLE 0.1").collect()[0].n
    assert 200 < n < 3000  # TABLESAMPLE is approximate


def test_prewhere_rewrite():
    from byconity_spark.frontend.sql import rewrite_ch_sql

    out = rewrite_ch_sql("SELECT a FROM t PREWHERE x > 1")
    assert "PREWHERE" not in out.upper() and "WHERE x > 1" in out
    merged = rewrite_ch_sql(
        "SELECT a FROM t PREWHERE x > 1 WHERE y < 2 GROUP BY a"
    )
    assert "WHERE (x > 1) AND (y < 2)" in merged and "GROUP BY a" in merged
    # PREWHERE inside a subquery stays scoped to that subquery
    nested = rewrite_ch_sql("SELECT * FROM (SELECT a FROM t PREWHERE b = 3)")
    assert "WHERE b = 3" in nested


def test_final_and_global_strip():
    from byconity_spark.frontend.sql import rewrite_ch_sql

    assert (
        rewrite_ch_sql("SELECT a FROM t FINAL WHERE x = 1")
        == "SELECT a FROM t WHERE x = 1"
    )
    assert "FINAL" not in rewrite_ch_sql("SELECT a FROM t AS u FINAL JOIN s ON 1=1")
    # a column actually named final survives
    assert "final" in rewrite_ch_sql("SELECT final FROM t")
    assert (
        rewrite_ch_sql("SELECT a FROM t WHERE a GLOBAL IN (SELECT a FROM s)")
        == "SELECT a FROM t WHERE a IN (SELECT a FROM s)"
    )
    assert (
        rewrite_ch_sql("SELECT * FROM t GLOBAL LEFT JOIN s ON t.a = s.a")
        == "SELECT * FROM t LEFT JOIN s ON t.a = s.a"
    )
    # ANY-strictness joins raise with a pointer at the operator API
    from byconity_spark.frontend.sql import ChSqlError

    with pytest.raises(ChSqlError):
        rewrite_ch_sql("SELECT * FROM t ANY LEFT JOIN s ON t.a = s.a")
    assert "GLOBAL NOT IN" not in rewrite_ch_sql(
        "SELECT a FROM t WHERE a GLOBAL NOT IN (1, 2)"
    )


def test_prewhere_executes(spark):
    from byconity_spark.frontend import ch_sql

    spark.range(0, 100).createOrReplaceTempView("__pw_t")
    n = ch_sql(
        spark, "SELECT count() AS n FROM __pw_t PREWHERE id >= 50 WHERE id < 60"
    ).collect()[0].n
    assert n == 10


def test_array_join_rewrite():
    from byconity_spark.frontend.sql import ChSqlError, rewrite_ch_sql

    out = rewrite_ch_sql("SELECT a, x FROM t ARRAY JOIN arr AS x WHERE x > 1")
    assert "LATERAL VIEW explode(arr) __aj1 AS x" in out and "WHERE x > 1" in out
    left = rewrite_ch_sql("SELECT x FROM t LEFT ARRAY JOIN arr AS x")
    assert "LATERAL VIEW OUTER explode(arr)" in left and " LEFT " not in left
    with pytest.raises(ChSqlError):
        rewrite_ch_sql("SELECT x FROM t ARRAY JOIN arr")  # no AS
    # multi-array zip: positional pairing via posexplode + aligned element_at
    z = rewrite_ch_sql("SELECT x, y FROM t ARRAY JOIN a AS x, b AS y")
    assert "posexplode(a)" in z and "__ajpos1, x" in z
    # try_element_at: session is ANSI-on, strict element_at would raise
    # INVALID_ARRAY_INDEX on a shorter second array instead of NULL-padding
    assert "try_element_at(b, __ajpos1 + 1)" in z and "AS y" in z


def test_multi_array_join_zips_positionally(spark):
    from byconity_spark.frontend import ch_sql

    spark.sql(
        "SELECT 1 AS id, array('a', 'b') AS xs, array(10, 20) AS ys "
        "UNION ALL SELECT 2, array('c'), array(30)"
    ).createOrReplaceTempView("__maj_t")
    rows = ch_sql(
        spark,
        "SELECT id, x, y FROM __maj_t ARRAY JOIN xs AS x, ys AS y ORDER BY id, x",
    ).collect()
    assert [(r.id, r.x, r.y) for r in rows] == [(1, "a", 10), (1, "b", 20), (2, "c", 30)]
    # shorter SECOND array NULL-pads (ANSI-safe try_element_at) instead of
    # crashing with INVALID_ARRAY_INDEX
    spark.sql(
        "SELECT 1 AS id, array('a', 'b', 'c') AS xs, array(10) AS ys"
    ).createOrReplaceTempView("__maj_short")
    rows = ch_sql(
        spark,
        "SELECT id, x, y FROM __maj_short ARRAY JOIN xs AS x, ys AS y ORDER BY x",
    ).collect()
    assert [(r.x, r.y) for r in rows] == [("a", 10), ("b", None), ("c", None)]


def test_round6_probe_batch_executes(spark):
    """Round-6 gap batch from the 101-idiom frontend probe: every name had
    a Column-API registry entry but no SQL rewrite rule."""
    from byconity_spark.frontend import ch_sql

    spark.sql(
        "SELECT 10 AS v, CAST('2024-03-15 10:00:00' AS TIMESTAMP) AS ts, "
        "array(1,2,3) AS arr, map('a', 1) AS m"
    ).createOrReplaceTempView("__p6")
    r = ch_sql(
        spark,
        "SELECT negate(v) AS ng, toMonday(ts) AS mo, mapKeys(m) AS mk, "
        "toYYYYMMDD(ts) AS ymd, toWeek(ts) AS wk, "
        "toRelativeDayNum(ts) AS rd, isFinite(v) AS fi, isNaN(v) AS nn, "
        "transform(v, [10, 20], ['ten', 'twenty'], 'other') AS tr, "
        "arrayFirst(x -> x > 1, arr) AS af, arrayCount(x -> x > 1, arr) AS ac, "
        "arrayAll(x -> x > 0, arr) AS aa, "
        "size(timeSlots(ts, toUInt32(3600))) AS nslots, "
        "rowNumberInAllBlocks() AS rn "
        "FROM __p6",
    ).collect()[0]
    assert r.ng == -10
    assert str(r.mo) == "2024-03-11"  # Monday of that week, DATE type
    assert r.mk == ["a"]
    assert r.ymd == 20240315
    assert r.rd == 19797  # days since epoch for 2024-03-15 10:00 UTC
    assert r.fi is True and r.nn is False
    assert r.tr == "ten"
    assert (r.af, r.ac, r.aa) == (2, 2, True)
    assert r.nslots == 3  # 10:00, 10:30, 11:00 slots cover [t, t+3600]
    assert r.rn == 0


@pytest.fixture()
def probe2(spark):
    spark.sql(
        "SELECT 1 AS id, 1 AS g, 10.0 AS v, 'a' AS s "
        "UNION ALL SELECT 2, 1, 20.0, 'b' "
        "UNION ALL SELECT 3, 2, 30.0, 'a' "
        "UNION ALL SELECT 4, 2, 20.0, 'c'"
    ).createOrReplaceTempView("__pr2")
    return "__pr2"


def test_generic_combinator_peel(spark, probe2):
    from byconity_spark.frontend import ch_sql

    r = ch_sql(
        spark,
        "SELECT sumOrNull(v) AS so, countDistinctIf(s, v > 15) AS cd, "
        "anyIf(s, v > 25) AS ai, groupArrayIf(s, g = 1) AS ga, "
        "countOrNull(CASE WHEN v > 100 THEN v END) AS cn, "
        "varPopIf(v, g = 2) AS vp FROM __pr2",
    ).collect()[0]
    assert r.so == 80.0
    assert r.cd == 3  # v>15 keeps (b, a, c) -> 3 distinct
    assert r.ai == "a"
    assert sorted(r.ga) == ["a", "b"]
    assert r.cn is None
    assert r.vp == 25.0  # var_pop of {30, 20}


def test_round6_agg_batch_values(spark, probe2):
    from byconity_spark.frontend import ch_sql

    r = ch_sql(
        spark,
        "SELECT medianExact(v) AS me, avgWeighted(v, id) AS aw, "
        "sumCount(v) AS sc, boundingRatio(id, v) AS br, "
        "skewPop(v) AS sk, kurtPop(v) AS ku, entropy(s) AS en, "
        "intervalLengthSum(id, id + 2) AS ils, "
        "simpleLinearRegression(id, v) AS slr, "
        "any(v) IS NOT NULL AS av FROM __pr2",
    ).collect()[0]
    assert r.me == 20.0
    # sum(v*id)/sum(id) = (10+40+90+80)/10
    assert r.aw == 22.0
    assert (r.sc["sum"], r.sc["count"]) == (80.0, 4)
    # leftmost (1,10), rightmost (4,20): slope (20-10)/(4-1)
    assert abs(r.br - 10.0 / 3) < 1e-12
    import math

    vals = [10.0, 20.0, 30.0, 20.0]
    mean = sum(vals) / 4
    m2 = sum((x - mean) ** 2 for x in vals) / 4
    m3 = sum((x - mean) ** 3 for x in vals) / 4
    m4 = sum((x - mean) ** 4 for x in vals) / 4
    assert abs(r.sk - m3 / m2**1.5) < 1e-9
    assert abs(r.ku - m4 / m2**2) < 1e-9
    # s values: a×2, b, c -> H = -(1/2 log 1/2 + 1/4 log 1/4 ×2) = 1.5 bits
    assert abs(r.en - 1.5) < 1e-12
    # intervals [1,3),[2,4),[3,5),[4,6) merge to [1,6) -> 5
    assert r.ils == 5.0
    assert abs(r.slr["k"] - 4.0) < 1e-9  # regr_slope of v on id
    assert r.av is True


def test_sum_map_and_parametric_batch(spark, probe2):
    from byconity_spark.frontend import ch_sql

    r = ch_sql(
        spark,
        "SELECT sumMap(map(s, v)) AS sm, maxMap(map(s, v)) AS mm, "
        "quantileExactIf(0.5)(v, g = 1) AS qi, "
        "topKWeighted(2)(s, v) AS tw FROM __pr2",
    ).collect()[0]
    assert r.sm == {"a": 40.0, "b": 20.0, "c": 20.0}
    assert r.mm == {"a": 30.0, "b": 20.0, "c": 20.0}
    assert r.qi == 15.0
    assert r.tw == ["a", "b"]  # weights a=40, b=20, c=20 -> tie broken by key


def test_round6_probe3_values(spark):
    from byconity_spark.frontend import ch_sql

    spark.sql(
        "SELECT 'Hello World' AS s, "
        "'https://u:p@sub.ex.org:8080/a/b?x=1&y=2#f' AS u, "
        "CAST('2024-03-15 10:30:45' AS TIMESTAMP) AS ts, "
        "array(3.0, 1.0, 2.0) AS arr"
    ).createOrReplaceTempView("__p6b")
    r = ch_sql(
        spark,
        "SELECT editDistance('abc', 'abd') AS ed, "
        "port(u) AS po, protocol(u) AS pr, fragment(u) AS fr, "
        "topLevelDomain(u) AS tld, "
        "extractURLParameterNames(u) AS pn, "
        "URLPathHierarchy(u) AS ph, "
        "toISOYear(ts) AS iy, toModifiedJulianDay('2024-03-15') AS mjd, "
        "makeDate(2024, 3, 15) AS md, "
        "arrayCompact(array(1, 1, 2, 2, 1)) AS ac, "
        "arrayPopBack(arr) AS apb, arrayRotateLeft(arr, 1) AS arl, "
        "arrayResize(arr, 5, 0.0) AS ars, "
        "arrayFold((acc, x) -> acc + x, arr, 0.0) AS af, "
        "arrayReduce('max', arr) AS ar, "
        "roundBankers(2.5) AS rb, roundBankers(3.5) AS rb2, "
        "roundDown(3.14159, [1.0, 2.0, 3.0, 4.0]) AS rd, "
        "gcd(12, 18) AS g, lcm(4, 6) AS l, "
        "round(erf(1.0), 5) AS e1, "
        "bitTest(5, 0) AS bt0, bitTest(5, 1) AS bt1, "
        "parseTimeDelta('1h 30m') AS ptd, "
        "IPv4StringToNum('192.168.1.1') AS ip, "
        "isIPv4String('1.2.3.400') AS bad4, isIPv4String('1.2.3.4') AS ok4, "
        "format('{} and {}', 'a', 'b') AS fm, "
        "stringJaccardIndex('abc', 'abd') AS sj, "
        "truncate(3.789, 2) AS tr "
        "FROM __p6b",
    ).collect()[0]
    assert r.ed == 1
    assert (r.po, r.pr, r.fr, r.tld) == (8080, "https", "f", "org")
    assert r.pn == ["x", "y"]
    assert r.ph == ["/a/", "/a/b"]
    assert (r.iy, r.mjd) == (2024, 60384)
    assert str(r.md) == "2024-03-15"
    assert r.ac == [1, 2, 1]
    assert r.apb == [3.0, 1.0]
    assert r.arl == [1.0, 2.0, 3.0]
    assert r.ars == [3.0, 1.0, 2.0, 0.0, 0.0]
    assert r.af == 6.0
    assert r.ar == 3.0
    assert (r.rb, r.rb2) == (2.0, 4.0)  # half-even
    assert r.rd == 3.0
    assert (r.g, r.l) == (6, 12)
    assert abs(r.e1 - 0.8427) < 1e-3
    assert (r.bt0, r.bt1) == (1, 0)
    assert r.ptd == 5400.0
    assert r.ip == 3232235777
    assert (r.bad4, r.ok4) == (False, True)
    assert r.fm == "a and b"
    # chars {a,b,c} vs {a,b,d}: |∩|=2, |∪|=4
    assert r.sj == 0.5
    assert abs(r.tr - 3.78) < 1e-12


def test_sequence_match_count_sql(spark):
    from byconity_spark.frontend import ch_sql

    spark.sql(
        "SELECT 1 AS u, 1 AS t, 'A' AS e UNION ALL SELECT 1, 2, 'X' "
        "UNION ALL SELECT 1, 3, 'B' UNION ALL SELECT 1, 4, 'A' "
        "UNION ALL SELECT 1, 5, 'B' UNION ALL SELECT 2, 1, 'B'"
    ).selectExpr(
        "u", "timestamp_seconds(t) AS ts", "e"
    ).createOrReplaceTempView("__sm_t")
    rows = ch_sql(
        spark,
        "SELECT u, sequenceMatch('(?1).*(?2)')(ts, e = 'A', e = 'B') AS m, "
        "sequenceCount('(?1)(?2)')(ts, e = 'A', e = 'B') AS n "
        "FROM __sm_t GROUP BY u ORDER BY u",
    ).collect()
    assert [(r.u, r.m, r.n) for r in rows] == [(1, True, 2), (2, False, 0)]
    with pytest.raises(ChSqlError):
        rewrite_ch_sql(
            "SELECT sequenceMatch('(?1)(?t<10)(?2)')(ts, a, b) FROM t"
        )


def test_round6_probe4_query_idioms(spark, probe2):
    from byconity_spark.frontend import ch_sql

    # scalar WITH aliases (CH form: WITH <expr> AS name)
    rows = ch_sql(
        spark, "WITH 2 AS lim SELECT id FROM __pr2 WHERE id < lim"
    ).collect()
    assert [r.id for r in rows] == [1]
    rows = ch_sql(
        spark,
        "WITH (SELECT max(v) FROM __pr2) AS mx "
        "SELECT id FROM __pr2 WHERE v = mx",
    ).collect()
    assert [r.id for r in rows] == [3]
    # CH type names in casts, all three syntaxes
    r = ch_sql(
        spark,
        "SELECT CAST(v AS Int64) AS c1, CAST(v, 'Int32') AS c2, "
        "v::UInt64 AS c3, accurateCastOrNull(s, 'Int64') AS c4, "
        "CAST(v AS Nullable(Float64)) AS c5 FROM __pr2 WHERE id = 1",
    ).collect()[0]
    assert (r.c1, r.c2, r.c3, r.c4, r.c5) == (10, 10, 10, None, 10.0)
    # LIMIT offset, limit
    rows = ch_sql(
        spark, "SELECT id FROM __pr2 ORDER BY id LIMIT 1, 2"
    ).collect()
    assert [r.id for r in rows] == [2, 3]
    # tuple positional access + parametric groupArray
    r = ch_sql(
        spark,
        "SELECT tuple(id, v).2 AS second, tupleElement(tuple(id, v), 1) "
        "AS first FROM __pr2 WHERE id = 1",
    ).collect()[0]
    assert (r.second, r.first) == (10.0, 1)
    r = ch_sql(
        spark,
        "SELECT size(groupArray(2)(s)) AS n2, size(groupArray(s)) AS nall "
        "FROM __pr2",
    ).collect()[0]
    assert (r.n2, r.nall) == (2, 4)


def test_limit_with_ties_and_distinct_on(spark, probe2):
    from byconity_spark.frontend import ch_sql

    rows = ch_sql(
        spark, "SELECT s, v FROM __pr2 ORDER BY v LIMIT 2 WITH TIES"
    ).collect()
    # v sorted: 10, 20, 20, 30 — rank ties at 20 keep BOTH 20s
    assert sorted((r.s, r.v) for r in rows) == [("a", 10.0), ("b", 20.0), ("c", 20.0)]
    rows = ch_sql(
        spark, "SELECT DISTINCT ON (g) g, id, v FROM __pr2 ORDER BY g, id"
    ).collect()
    assert sorted((r.g, r.id) for r in rows) == [(1, 1), (2, 3)]


def test_lead_lag_in_frame_sql(spark, probe2):
    from byconity_spark.frontend import ch_sql

    rows = ch_sql(
        spark,
        "SELECT id, leadInFrame(v) OVER (PARTITION BY g ORDER BY id "
        "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS lf, "
        "lagInFrame(v, 1, -1.0) OVER (PARTITION BY g ORDER BY id) AS lg "
        "FROM __pr2 ORDER BY id",
    ).collect()
    assert [(r.id, r.lf, r.lg) for r in rows] == [
        (1, 20.0, -1.0), (2, None, 10.0), (3, 20.0, -1.0), (4, None, 30.0),
    ]
    with pytest.raises(ChSqlError):
        rewrite_ch_sql(
            "SELECT leadInFrame(v) OVER (ORDER BY id "
            "ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING) FROM t"
        )


def test_semi_anti_left_join_word_order(spark):
    # CH puts strictness FIRST (SEMI LEFT JOIN); Spark wants LEFT SEMI JOIN
    out = rewrite_ch_sql("SELECT a FROM t SEMI LEFT JOIN u ON t.k = u.k")
    assert "LEFT SEMI JOIN" in out
    out = rewrite_ch_sql("SELECT a FROM t GLOBAL ANTI LEFT JOIN u ON t.k = u.k")
    assert "LEFT ANTI JOIN" in out and "GLOBAL" not in out
    with pytest.raises(ChSqlError):
        rewrite_ch_sql("SELECT a FROM t SEMI RIGHT JOIN u ON t.k = u.k")
    # executes end-to-end
    from byconity_spark.frontend import ch_sql

    spark.sql("SELECT 1 AS k UNION ALL SELECT 2").createOrReplaceTempView("__sj_t")
    spark.sql("SELECT 1 AS k").createOrReplaceTempView("__sj_u")
    rows = ch_sql(
        spark,
        "SELECT k FROM __sj_t SEMI LEFT JOIN __sj_u ON __sj_t.k = __sj_u.k",
    ).collect()
    assert [r.k for r in rows] == [1]


def test_window_funnel_sql_is_sliding_anchor(spark):
    from byconity_spark.frontend import ch_sql

    # first A's window misses B; the second A re-anchors (CH default
    # sliding semantics) and the chain completes -> level 3
    spark.createDataFrame(
        [(1, 0, "A"), (1, 200, "A"), (1, 250, "B"), (1, 260, "C")],
        "user_id long, sec long, et string",
    ).selectExpr(
        "user_id", "timestamp_seconds(sec) AS ts", "et"
    ).createOrReplaceTempView("__wf_t")
    rows = ch_sql(
        spark,
        "SELECT user_id, windowFunnel(100)(ts, et = 'A', et = 'B', et = 'C') "
        "AS lvl FROM __wf_t GROUP BY user_id",
    ).collect()
    assert rows[0].lvl == 3
    # mode params are not supported in the SQL rewrite — explicit error
    with pytest.raises(ChSqlError):
        rewrite_ch_sql(
            "SELECT windowFunnel(100, 'strict_order')(ts, a, b) FROM t"
        )


def test_numbers_rewrite(spark):
    from byconity_spark.frontend import ch_sql
    from byconity_spark.frontend.sql import rewrite_ch_sql

    assert "range(5)" in rewrite_ch_sql("SELECT number FROM numbers(5)")
    rows = ch_sql(spark, "SELECT sum(number) AS s FROM numbers(3, 4)").collect()
    assert rows[0].s == 3 + 4 + 5 + 6


def test_array_join_executes(spark):
    from byconity_spark.frontend import ch_sql

    spark.sql(
        "SELECT 1 AS id, array('a','b') AS arr "
        "UNION ALL SELECT 2, array() "
    ).createOrReplaceTempView("__aj_t")
    rows = ch_sql(
        spark, "SELECT id, x FROM __aj_t LEFT ARRAY JOIN arr AS x ORDER BY id, x"
    ).collect()
    assert [(r.id, r.x) for r in rows] == [(1, "a"), (1, "b"), (2, None)]


def test_with_totals_rewrite():
    from byconity_spark.frontend.sql import ChSqlError, rewrite_ch_sql

    out = rewrite_ch_sql("SELECT a, count() FROM t GROUP BY a WITH TOTALS")
    # totals row rides a UNION ALL branch with a __tot sort marker so
    # it renders LAST even when rollup defaults sort first (00701)
    assert "WITH TOTALS" not in out and "__tot" in out
    assert "GROUPING SETS (())" in out
    # WITH CUBE / ROLLUP pass through
    assert "WITH ROLLUP" in rewrite_ch_sql("SELECT a FROM t GROUP BY a WITH ROLLUP")
    with pytest.raises(ChSqlError):
        rewrite_ch_sql("SELECT count() FROM t WITH TOTALS")


def test_conversion_and_search_rules(spark):
    from byconity_spark.frontend import ch_sql

    r = ch_sql(
        spark,
        """
        SELECT toDate32('2024-03-05') AS d,
               toDecimal32('1.25', 2) AS dec,
               materialize(7) AS m,
               toTypeName(toFloat64(1.5)) AS tn,
               multiSearchAny('hello world', array('xyz', 'wor')) AS ms,
               multiSearchAllPositions('hello', array('l', 'zz')) AS mp,
               formatDateTimeInJodaSyntax(toDateTime('2024-03-05 10:00:00'),
                                          'yyyy-MM') AS joda
        """,
    ).collect()[0]
    import datetime as dt
    from decimal import Decimal

    assert r.d == dt.date(2024, 3, 5)
    assert r.dec == Decimal("1.25")
    # toTypeName prints CH type names since r9 (reference toTypeName.cpp)
    assert r.m == 7 and r.tn == "Float64"
    assert r.ms is True and list(r.mp) == [3, 0]
    assert r.joda == "2024-03"


def test_round3_rule_additions(spark):
    from byconity_spark.frontend import ch_sql

    r = ch_sql(
        spark,
        "SELECT bitAnd(12, 10) AS a, bitXor(12, 10) AS x, bitCount(255) AS c, "
        "arraySum(array(1, 2, 3)) AS s, arrayMax(array(1, 9, 3)) AS m, "
        "countEqual(array(1, 2, 1), 1) AS ce, "
        "IPv4NumToString(3232235777) AS ip, "
        "base64Decode(base64Encode('hi')) AS b",
    ).collect()[0]
    assert (r.a, r.x, r.c) == (8, 6, 8)
    assert r.s == 6.0 and r.m == 9 and r.ce == 2
    assert r.ip == "192.168.1.1"
    assert r.b == "hi"


def test_limit_by_with_offset(spark):
    """ClickHouse LIMIT off, n BY key and LIMIT n OFFSET off BY key."""
    from byconity_spark.engine.catalog import register_views
    from byconity_spark.frontend import ch_sql
    from tests.conftest import SF_DIR

    views = spark
    register_views(views, SF_DIR)
    base = (
        "SELECT o_custkey, o_orderkey FROM orders "
        "ORDER BY o_orderkey LIMIT 1, 2 BY o_custkey LIMIT 10"
    )
    out = ch_sql(views, base).collect()
    assert len(out) == 10
    # per customer the FIRST order is skipped: compare against the window form
    alt = views.sql(
        "SELECT o_custkey, o_orderkey FROM ("
        " SELECT o_custkey, o_orderkey, row_number() OVER"
        "  (PARTITION BY o_custkey ORDER BY o_orderkey) rn FROM orders)"
        " WHERE rn > 1 AND rn <= 3 ORDER BY o_orderkey LIMIT 10"
    ).collect()
    assert [(r.o_custkey, r.o_orderkey) for r in out] == [
        (r.o_custkey, r.o_orderkey) for r in alt
    ]
    out2 = ch_sql(
        views,
        "SELECT o_custkey, o_orderkey FROM orders "
        "ORDER BY o_orderkey LIMIT 2 OFFSET 1 BY o_custkey LIMIT 10",
    ).collect()
    assert [(r.o_custkey, r.o_orderkey) for r in out2] == [
        (r.o_custkey, r.o_orderkey) for r in out
    ]


def test_retention_sql_rewrite(spark):
    from byconity_spark.engine.catalog import register_views
    from byconity_spark.frontend import ch_sql
    from tests.conftest import SF_DIR

    register_views(spark, SF_DIR)
    out = ch_sql(
        spark,
        "SELECT user_id, retention(event_type='signup', "
        "event_type='purchase') AS r FROM events GROUP BY user_id",
    )
    rows = out.collect()
    assert rows and all(len(r.r) == 2 for r in rows)
    # r2 can only fire when r1 fired
    assert all(r.r[1] <= r.r[0] for r in rows)


def test_array_literals_and_one_based_subscripts():
    out = rewrite_ch_sql(
        "SELECT [1,2,3] AS a, x[1] AS e, [[1],[2]] AS n, 'lit[4]' AS s"
    )
    assert "array(1,2,3)" in out
    assert "element_at(x, 1)" in out
    assert "array(array(1),array(2))" in out
    assert "'lit[4]'" in out


def test_subscript_chains_and_calls():
    out = rewrite_ch_sql("SELECT split(s, ' ')[1], m['k'], arr[-1] FROM t")
    assert "element_at(split(s, ' '), 1)" in out
    assert "element_at(m, 'k')" in out
    assert "element_at(arr, -1)" in out


def test_tuple_range_rules():
    out = rewrite_ch_sql("SELECT tuple(1, 'a'), range(3), range(2, 5)")
    assert "struct(1 AS col1, 'a' AS col2)" in out
    assert "sequence(0, 3 - 1)" in out
    assert "sequence(2, 5 - 1)" in out


def test_settings_clause_stripped():
    from byconity_spark.frontend.sql import rewrite_ch_sql

    out = rewrite_ch_sql(
        "SELECT count() FROM t SETTINGS max_threads = 8, "
        "max_memory_usage = '10G' FORMAT JSON"
    )
    assert "SETTINGS" not in out and "FORMAT" not in out
    # a column named 'settings' or mid-query text must not be eaten
    keep = rewrite_ch_sql("SELECT settings FROM t WHERE settings = 1")
    assert "settings" in keep.lower()


def test_round5_compat_rules():
    assert (
        rewrite_ch_sql("SELECT countDistinct(u, v) FROM t")
        == "SELECT count(DISTINCT u, v) FROM t"
    )
    # dateDiff = boundary crossings (CH DiffType::DateDiff), NOT complete
    # elapsed units — so it must NOT be timestampdiff
    ddiff = rewrite_ch_sql("SELECT dateDiff('day', a, b) FROM t")
    assert "date_trunc('day'" in ddiff and "timestampdiff" not in ddiff
    # age() IS complete elapsed units = Spark timestampdiff
    assert "timestampdiff(DAY, a, b)" in rewrite_ch_sql(
        "SELECT age('day', a, b) FROM t"
    )
    assert "date_format(ts, 'yyyy-MM-dd HH:mm')" in rewrite_ch_sql(
        "SELECT formatDateTime(ts, '%Y-%m-%d %H:%M') FROM t"
    )
    assert "div 900" in rewrite_ch_sql("SELECT toStartOfFifteenMinutes(ts) FROM t")
    assert "div 300" in rewrite_ch_sql(
        "SELECT toStartOfInterval(ts, INTERVAL 5 MINUTE) FROM t"
    )
    assert "percentile_approx(v, array(0.5, 0.9))" in rewrite_ch_sql(
        "SELECT quantiles(0.5, 0.9)(v) FROM t"
    )
    assert rewrite_ch_sql("SELECT uniqCombined(14)(u) FROM t") == (
        "SELECT approx_count_distinct(u) FROM t"
    )
    assert "CASE a WHEN 1 THEN 'x' ELSE 'y' END" in rewrite_ch_sql(
        "SELECT caseWithExpression(a, 1, 'x', 'y') FROM t"
    )
    with pytest.raises(ChSqlError):
        rewrite_ch_sql("SELECT dateDiff('fortnight', a, b) FROM t")
    with pytest.raises(ChSqlError):
        rewrite_ch_sql("SELECT formatDateTime(ts, fmtcol) FROM t")


def test_round5_compat_rules_batch2(spark):
    """The batch-2 rules EXECUTE correctly (not just rewrite)."""
    from byconity_spark.frontend import ch_sql

    got = ch_sql(
        spark,
        "SELECT arraySort(x -> -x, [3,1,2]) AS a,"
        "       countSubstrings('ababab', 'ab') AS c,"
        "       splitByString('--', 'a--b--c') AS s,"
        "       toInt64OrNull('12x') AS bad,"
        "       toFloat64OrZero('2.5') AS v,"
        "       arrayCumSum([1,2,3]) AS cs,"
        "       bitmaskToList(50) AS bl,"
        "       uniqExactIf(x, x > 1) AS u "
        "FROM (SELECT explode(array(1,2,2,3)) AS x)",
    ).collect()[0]
    assert got.a == [3, 2, 1]
    assert got.c == 3
    assert got.s == ["a", "b", "c"]
    assert got.bad is None and got.v == 2.5
    assert got.cs == [1.0, 3.0, 6.0]
    assert got.bl == "2,16,32"
    assert got.u == 2


# ---------------------------------------------------------------- batch 5
import pytest as _pt

_BATCH5 = [
    ("SELECT TO_DAYS(toDate('1970-01-02')) AS v", 719529),
    ("SELECT CAST(FROM_DAYS(719529) AS STRING) AS v", "1970-01-02"),
    ("SELECT SEC_TO_TIME(3661) AS v", "01:01:01"),
    ("SELECT TIME_TO_SEC('01:01:01') AS v", 3661),
    ("SELECT TIME_TO_SEC(toDateTime('2024-03-15 14:30:45')) AS v", 52245),
    ("SELECT YEARWEEK(toDate('2024-03-15')) AS v", 202411),
    ("SELECT STRCMP('a','b') AS v", -1),
    ("SELECT MAKE_SET(5,'x','y','z') AS v", "x,z"),
    ("SELECT FROM_BASE64(TO_BASE64('hi')) AS v", "hi"),
    ("SELECT INET_ATON('1.2.3.4') AS v", 16909060),
    ("SELECT INET_NTOA(16909060) AS v", "1.2.3.4"),
    ("SELECT versionCompare('1.2.10','1.2.9','>') AS v", 1),
    ("SELECT javaHash('hello world') AS v", 1794106052),
    ("SELECT L2Norm([3.0,4.0]) AS v", 5.0),
    ("SELECT L1Distance([3.0,4.0],[1.0,2.0]) AS v", 4.0),
    ("SELECT dotProduct([1.0,2.0],[3.0,4.0]) AS v", 11.0),
    ("SELECT CAST(normalizeL2([3.0,4.0]) AS STRING) AS v", "[0.6, 0.8]"),
    ("SELECT tupleHammingDistance([1,2,3],[1,5,3]) AS v", 1),
    ("SELECT hasToken('the quick fox', 'quick') AS v", 1),
    ("SELECT hasToken('the quick fox', 'qui') AS v", 0),
    ("SELECT multiMatchAnyIndex('abc', ['x','b.']) AS v", 2),
    ("SELECT CAST(multiMatchAllIndices('abc', ['a','x','b.']) AS STRING) AS v",
     "[1, 3]"),
    ("SELECT CAST(splitByWhitespace(' a  b ') AS STRING) AS v", "[a, b]"),
    ("SELECT CAST(arrayFill(x -> x > 0, [1,0,5,0]) AS STRING) AS v",
     "[1, 1, 5, 5]"),
    ("SELECT CAST(arraySplit(x -> x > 3, [1,2,4,5,1]) AS STRING) AS v",
     "[[1, 2], [4], [5, 1]]"),
    ("SELECT CAST(arrayReverseSplit(x -> x > 3, [1,4,2,5,1]) AS STRING) AS v",
     "[[1, 4], [2, 5], [1]]"),
    ("SELECT toUnixTimestamp64Milli(toDateTime('2024-03-15 14:30:45')) AS v",
     1710513045000),
    ("SELECT CAST(fromUnixTimestamp64Nano(1710513045123456789) AS STRING) AS v",
     # literal args fold EXACTLY (nanosecond digits like the reference;
     # 01277 golden) — non-literal args keep the microsecond Spark path
     "2024-03-15 14:30:45.123456789"),
    ("SELECT CAST(parseDateTimeBestEffortUS('03/15/2024') AS STRING) AS v",
     "2024-03-15 00:00:00"),
    ("SELECT toDecimalString(3.14159, 2) AS v", "3.14"),
    ("SELECT deltaSumTimestamp(number % 5, number) AS v FROM numbers(10)", 8.0),
    ("SELECT medianExactLow(number) AS v FROM numbers(10)", 4),
    ("SELECT medianExactHigh(number) AS v FROM numbers(10)", 5),
    ("SELECT GROUP_CONCAT(number) AS v FROM numbers(3)", "0,1,2"),
    # MySQL STD/VARIANCE are POPULATION forms — Spark alone would resolve
    # these names to the sample forms (silent wrong answers without rules)
    ("SELECT round(STD(number), 4) AS v FROM numbers(10)", 2.8723),
    ("SELECT round(VARIANCE(number), 4) AS v FROM numbers(10)", 8.25),
    # topK ranks by FREQUENCY (was: sorted-distinct slice)
    ("SELECT CAST(topK(1)(CASE WHEN number < 7 THEN 9 ELSE number END) AS STRING)"
     " AS v FROM numbers(10)", "[9]"),
]


@_pt.mark.parametrize("sql,want", _BATCH5, ids=[q[0][7:40] for q in _BATCH5])
def test_frontend_batch5(spark, sql, want):
    from byconity_spark.frontend.sql import ch_sql
    got = ch_sql(spark, sql).collect()[0][0]
    if isinstance(want, float):
        assert got == _pt.approx(want, abs=1e-6)
    else:
        assert got == want


def test_final_replacing_dedup_on_read(spark):
    """FINAL over a registered replacing table collapses to the
    max-version row per key; unregistered tables keep the strip."""
    from byconity_spark.frontend.sql import ch_sql, register_replacing_table
    import pandas as pd
    spark.createDataFrame(pd.DataFrame({
        "k": [1, 1, 2], "val": ["old", "new", "only"], "v": [1, 2, 1],
    })).createOrReplaceTempView("repl_demo")
    register_replacing_table("repl_demo", ["k"], "v")
    rows = sorted(
        (r.k, r.val) for r in ch_sql(
            spark, "SELECT k, val FROM repl_demo FINAL"
        ).collect()
    )
    assert rows == [(1, "new"), (2, "only")]
    # unregistered table: FINAL still strips cleanly
    spark.createDataFrame([(1,)], "x int").createOrReplaceTempView("plain_demo")
    assert ch_sql(spark, "SELECT x FROM plain_demo FINAL").collect()[0][0] == 1


def test_ddl_create_insert_optimize_roundtrip(spark):
    """CREATE TABLE AS / INSERT INTO / OPTIMIZE FINAL / DROP through
    ch_sql (Interpreter{Create,Insert,Optimize,Drop}Query surfaces)."""
    from byconity_spark.frontend.sql import ch_sql
    ch_sql(spark, "DROP TABLE IF EXISTS ddl_demo")
    r = ch_sql(spark,
               "CREATE TABLE ddl_demo ENGINE = ReplacingMergeTree(v) "
               "ORDER BY k AS SELECT 1 AS k, 'old' AS val, 1 AS v")
    assert r.collect()[0]["status"] == "created"
    ch_sql(spark, "INSERT INTO ddl_demo SELECT 1 AS k, 'new' AS val, 2 AS v")
    ch_sql(spark, "INSERT INTO ddl_demo VALUES (2, 'only', 1)")
    # FINAL view collapses to max version per key
    rows = sorted((r.k, r.val) for r in ch_sql(
        spark, "SELECT k, val FROM ddl_demo FINAL").collect())
    assert rows == [(1, "new"), (2, "only")]
    # OPTIMIZE FINAL physically collapses the view
    assert ch_sql(spark, "OPTIMIZE TABLE ddl_demo FINAL") \
        .collect()[0]["status"] == "optimized_final"
    assert ch_sql(spark, "SELECT count(*) AS n FROM ddl_demo") \
        .collect()[0]["n"] == 2
    assert ch_sql(spark, "DROP TABLE ddl_demo").collect()[0]["status"] == "dropped"


def test_ddl_bare_create_with_ch_types(spark):
    """Column-list CREATE TABLE translates CH types (UInt64/DateTime/
    Decimal64) and supports VALUES inserts + SHOW CREATE TABLE."""
    from byconity_spark.frontend.sql import ch_sql
    ch_sql(spark, "DROP TABLE IF EXISTS bare_demo")
    ch_sql(spark, "CREATE TABLE bare_demo (k UInt64, name String, "
                  "amt Decimal64(4)) ENGINE = MergeTree ORDER BY k")
    assert ch_sql(spark, "SELECT count(*) AS n FROM bare_demo") \
        .collect()[0]["n"] == 0
    ch_sql(spark, "INSERT INTO bare_demo VALUES (1, 'a', 1.5)")
    row = ch_sql(spark, "SELECT * FROM bare_demo").collect()[0]
    assert (row.k, row.name, float(row.amt)) == (1, "a", 1.5)
    # SHOW CREATE echoes the ORIGINAL CH declaration since r9
    # (InterpreterShowCreateQuery prints CH types, not engine types)
    row2 = ch_sql(spark, "SHOW CREATE TABLE bare_demo").collect()[0]
    stmt = row2["statement"]
    assert "`k` UInt64" in stmt and "Decimal64(4)" in stmt
    assert "ORDER BY k" in stmt


def test_describe_prints_ch_type_names(spark):
    from byconity_spark.frontend.sql import ch_sql
    from byconity_spark.engine.catalog import register_views
    from tests.conftest import SF_DIR
    register_views(spark, SF_DIR)
    rows = {r["name"]: r["type"]
            for r in ch_sql(spark, "DESCRIBE TABLE embeddings").collect()}
    assert rows["vec_id"] == "Int64"
    assert rows["embedding"] == "Array(Float32)"
    assert rows["label"] == "Int32"


def test_sample_keyed_deterministic(spark):
    """SAMPLE on a table with a registered SAMPLE BY key is a fixed slice
    of the key's hash space — identical rows on every run; SAMPLE with
    OFFSET selects a DISJOINT slice."""
    from byconity_spark.frontend.sql import ch_sql, register_sample_key
    from byconity_spark.engine.catalog import register_views
    from tests.conftest import SF_DIR
    register_views(spark, SF_DIR)
    register_sample_key("lineitem", "l_orderkey")
    q = "SELECT l_orderkey, l_linenumber FROM lineitem SAMPLE 0.1"
    a = sorted(map(tuple, ch_sql(spark, q).collect()))
    b = sorted(map(tuple, ch_sql(spark, q).collect()))
    assert a == b and len(a) > 0
    off = sorted(map(tuple, ch_sql(
        spark, "SELECT l_orderkey, l_linenumber FROM lineitem "
               "SAMPLE 0.1 OFFSET 0.5").collect()))
    assert off and not (set(r[0] for r in a) & set(r[0] for r in off))


# ------------------------------------------------ round-7 geo SQL surface

def test_chsql_h3_rules(spark):
    from byconity_spark.frontend.sql import ch_sql

    r = ch_sql(spark, "SELECT h3GetResolution(stringToH3('8928308280fffff')) AS r").collect()[0]
    assert r["r"] == 9
    p = ch_sql(spark, "SELECT h3ToString(h3ToParent(stringToH3('8928308280fffff'), 8)) AS p").collect()[0]
    assert p["p"] == "8828308281fffff"  # published h3 quickstart anchor
    n = ch_sql(spark, "SELECT h3NumHexagons(2) AS n").collect()[0]
    assert n["n"] == 2 + 120 * 49
    assert ch_sql(spark, "SELECT stringToH3('nope') AS z").collect()[0]["z"] == 0


def test_chsql_geo_kernels_registered(spark):
    from byconity_spark.frontend.sql import ch_sql

    rows = ch_sql(spark, """
        SELECT geoToS2(10.5, 47.3) AS id,
               s2CellsIntersect(geoToS2(1.0, 2.0), geoToS2(1.0, 2.0)) AS s,
               stem('en', 'relational') AS st,
               parseTimeDelta('2h 5m') AS d,
               normalizeUTF8NFKC('ﬁ') AS n
    """).collect()[0]
    assert rows["id"] != 0 and rows["s"] is True
    assert rows["st"] == "relat"
    assert rows["d"] == 7500.0
    assert rows["n"] == "fi"


def test_arrayjoin_scalar_call(spark):
    from byconity_spark.frontend.sql import ch_sql

    # scalar arrayJoin multiplies rows like the ARRAY JOIN clause
    # (src/Functions/array/arrayJoin.cpp)
    spark.range(1).selectExpr("array(10, 20, 30) AS arr").createOrReplaceTempView(
        "__ajfn_t"
    )
    rows = ch_sql(
        spark, "SELECT arrayJoin(arr) AS v FROM __ajfn_t ORDER BY v"
    ).collect()
    assert [r.v for r in rows] == [10, 20, 30]
    # identical calls share one explode (CH common-subexpression rule)
    rows2 = ch_sql(
        spark,
        "SELECT arrayJoin(arr) AS a, arrayJoin(arr) * 2 AS b "
        "FROM __ajfn_t ORDER BY a",
    ).collect()
    assert [(r.a, r.b) for r in rows2] == [(10, 20), (20, 40), (30, 60)]
    # distinct expressions multiply (cartesian)
    rows3 = ch_sql(
        spark,
        "SELECT arrayJoin(array(1, 2)) AS a, arrayJoin(array(10, 20)) AS b "
        "FROM __ajfn_t",
    ).collect()
    assert len(rows3) == 4


def test_mutation_ddl_truncate_and_rename(spark):
    ch_sql(spark, "DROP TABLE IF EXISTS __mut_t")
    ch_sql(spark, "DROP TABLE IF EXISTS __mut_renamed")
    ch_sql(spark, "CREATE TABLE __mut_t ENGINE = MergeTree AS "
                  "SELECT 1 AS k, 10.0 AS v")
    ch_sql(spark, "INSERT INTO __mut_t VALUES (2, 20.0), (3, 30.0)")
    # ALTER DELETE removes matching rows only
    ch_sql(spark, "ALTER TABLE __mut_t DELETE WHERE k = 2")
    assert ch_sql(spark, "SELECT count(*) AS n FROM __mut_t"
                  ).collect()[0]["n"] == 2
    # ALTER UPDATE rewrites matching rows, leaves the rest
    ch_sql(spark, "ALTER TABLE __mut_t UPDATE v = v + 1 WHERE k = 3")
    vals = {r.k: r.v for r in ch_sql(spark, "SELECT k, v FROM __mut_t").collect()}
    assert vals == {1: 10.0, 3: 31.0}
    # RENAME moves the view and its engine registration
    ch_sql(spark, "RENAME TABLE __mut_t TO __mut_renamed")
    assert ch_sql(spark, "SELECT count(*) AS n FROM __mut_renamed"
                  ).collect()[0]["n"] == 2
    # TRUNCATE empties but keeps the schema
    ch_sql(spark, "TRUNCATE TABLE __mut_renamed")
    out = ch_sql(spark, "SELECT * FROM __mut_renamed")
    assert out.count() == 0 and out.columns == ["k", "v"]
    ch_sql(spark, "DROP TABLE __mut_renamed")


def test_mutation_ddl_invalidates_query_cache(spark):
    from byconity_spark.engine.query_cache import query_cache

    query_cache.clear()
    ch_sql(spark, "DROP TABLE IF EXISTS __mut_qc")
    ch_sql(spark, "CREATE TABLE __mut_qc ENGINE = MergeTree AS SELECT 5 AS k")
    q = "SELECT count(*) AS n FROM __mut_qc SETTINGS use_query_cache = 1"
    assert ch_sql(spark, q).collect()[0]["n"] == 1
    ch_sql(spark, "ALTER TABLE __mut_qc DELETE WHERE k = 5")
    # the mutation bumped the table version -> cached entry is stale
    assert ch_sql(spark, q).collect()[0]["n"] == 0
    query_cache.clear()
    ch_sql(spark, "DROP TABLE __mut_qc")


def test_alter_column_ddl(spark):
    ch_sql(spark, "DROP TABLE IF EXISTS __col_t")
    ch_sql(spark, "CREATE TABLE __col_t ENGINE = MergeTree AS "
                  "SELECT 1 AS k UNION ALL SELECT 2 AS k")
    # ADD COLUMN with the CH numeric default (0) and with an expression
    ch_sql(spark, "ALTER TABLE __col_t ADD COLUMN score Float64")
    ch_sql(spark, "ALTER TABLE __col_t ADD COLUMN label String DEFAULT "
                  "concat('k=', toString(k))")
    rows = {r.k: r for r in ch_sql(spark, "SELECT * FROM __col_t").collect()}
    assert rows[1]["score"] == 0.0 and rows[2]["label"] == "k=2"
    # RENAME COLUMN then DROP COLUMN
    ch_sql(spark, "ALTER TABLE __col_t RENAME COLUMN score TO s2")
    ch_sql(spark, "ALTER TABLE __col_t DROP COLUMN label")
    out = ch_sql(spark, "SELECT * FROM __col_t")
    assert out.columns == ["k", "s2"]
    with pytest.raises(ChSqlError):
        ch_sql(spark, "ALTER TABLE __col_t ADD COLUMN k Int64")
    ch_sql(spark, "DROP TABLE __col_t")


def test_system_metrics_counters(spark):
    from byconity_spark.engine.query_cache import query_cache

    query_cache.clear()
    ch_sql(spark, "SELECT 77 AS v SETTINGS use_query_cache = 1")
    ch_sql(spark, "SELECT 77 AS v SETTINGS use_query_cache = 1")
    rows = {r.metric: r.value for r in ch_sql(
        spark, "SELECT metric, value FROM system.metrics").collect()}
    assert rows["QueryCacheHits"] == 1.0
    assert rows["QueryCacheStores"] == 1.0
    assert rows["QueryCacheEntries"] == 1.0
    assert rows["QueryLogEntries"] >= 2.0
    assert rows["ShufflePartitions"] > 0
    query_cache.clear()


def test_alter_modify_column_type(spark):
    ch_sql(spark, "DROP TABLE IF EXISTS __modc_t")
    ch_sql(spark, "CREATE TABLE __modc_t ENGINE = MergeTree AS "
                  "SELECT 1 AS k, 2.9 AS v")
    ch_sql(spark, "ALTER TABLE __modc_t MODIFY COLUMN v Int64")
    row = ch_sql(spark, "SELECT v FROM __modc_t").collect()[0]
    assert row["v"] == 2  # CAST truncates like CH toInt64
    assert dict(ch_sql(spark, "SELECT * FROM __modc_t").dtypes)["v"] == "bigint"
    with pytest.raises(ChSqlError):
        ch_sql(spark, "ALTER TABLE __modc_t MODIFY COLUMN missing Int64")
    ch_sql(spark, "DROP TABLE __modc_t")


def test_group_by_all_order_by_all(spark):
    """CH GROUP BY ALL / ORDER BY ALL (ParserSelectQuery group_by_all):
    Spark 4 resolves both natively with the same semantics — pinned so a
    rewrite regression can't silently break them."""
    from byconity_spark.engine.catalog import register_views
    from tests.conftest import SF_DIR

    register_views(spark, SF_DIR)
    rows = ch_sql(
        spark,
        "SELECT n_regionkey, count(*) AS n FROM nation "
        "GROUP BY ALL ORDER BY ALL",
    ).collect()
    assert [tuple(r) for r in rows] == [(i, 5) for i in range(5)]


def test_if_multiif_accept_uint8_conditions(spark):
    """CH treats UInt8 as boolean in if()/multiIf() — the reference's own
    stateless tests call if(1, ...) and multiIf(0, ...)."""
    r = ch_sql(
        spark,
        "SELECT if(1, 'y', 'n') AS a, multiIf(0, 'a', 1, 'b', 'c') AS b",
    ).collect()[0]
    assert (r["a"], r["b"]) == ("y", "b")


def test_stable_stats_and_group_concat(spark):
    """Stable-summation aggregate names (AggregateFunctionStatistics.cpp)
    and groupConcat — both parametric (sep)(x) and plain forms — resolve
    in the SQL dialect (found sweeping the reference's stateless tests)."""
    spark.createDataFrame(
        [(1.0, 2.0, "a"), (2.0, 1.0, "b"), (3.0, 4.0, "c")],
        "x double, y double, s string",
    ).createOrReplaceTempView("t_stb")
    r = ch_sql(
        spark,
        "SELECT round(corrStable(x, y), 4) AS c, "
        "round(varSampStable(x), 4) AS v, "
        "groupConcat(',')(s) AS g1, groupConcat(s) AS g2 FROM t_stb",
    ).collect()[0]
    assert r["c"] == 0.6547 and r["v"] == 1.0
    assert r["g1"] == "a,b,c" and r["g2"] == "abc"


def test_arrayjoin_function_without_from(spark):
    """SELECT arrayJoin([...]) with no FROM multiplies the implicit
    one-row relation, like CH's system.one."""
    rows = ch_sql(spark, "SELECT arrayJoin([1, 2, 3]) AS a").collect()
    assert [r["a"] for r in rows] == [1, 2, 3]


def test_position_start_and_array_predicates(spark):
    """position() 3-arg keeps CH's (haystack, needle, start) arg order —
    Spark's locate is (needle, haystack, start); hasAll/hasAny/toDecimal64
    resolve in the SQL dialect (reference-test sweep findings)."""
    r = ch_sql(
        spark,
        "SELECT position('hello world hello', 'hello', 5) AS p, "
        "hasAll([1,2,3], [1,3]) AS ha, hasAny([1,2], [3,2]) AS hn, "
        "hasAll([1,2], [1,9]) AS ha2, "
        "CAST(toDecimal64('3.14159', 2) AS STRING) AS d",
    ).collect()[0]
    assert (r["p"], r["ha"], r["hn"], r["ha2"], r["d"]) == (
        13, True, True, False, "3.14",
    )


def test_relative_nums_and_round_variants(spark):
    """toRelative*Num / replaceRegexpOne / bitRotateLeft / roundToExp2 /
    roundDown / roundBankers in the SQL dialect (reference-test sweep)."""
    r = ch_sql(
        spark,
        "SELECT toRelativeDayNum(toDateTime('2024-01-02 00:00:00')) AS d, "
        "replaceRegexpOne('a1b2', '[0-9]', 'x') AS o, "
        "bitRotateLeft(1, 3) AS rl, roundToExp2(100) AS e, "
        "roundDown(7, [2, 5, 10]) AS rd, roundBankers(2.5) AS b",
    ).collect()[0]
    assert (r["d"], r["o"], r["rl"], r["e"], r["rd"], r["b"]) == (
        19724, "axb2", 8, 64, 5, 2.0,
    )


def test_replace_regexp_one_groups_backrefs_multiline(spark):
    """Round-8 advisory regression: the old SQL rewrite wrapped the user
    pattern as group 1 and appended (.*)$ — a user capture group shifted
    the numbering ('aXb' instead of 'aXc'), CH \\N backrefs weren't
    translated, and a newline after the match made it a silent no-op."""
    r = ch_sql(
        spark,
        "SELECT replaceRegexpOne('abc', '(b)', 'X') AS g, "
        "replaceRegexpOne('abc', '(b)', '[\\\\1]') AS br, "
        "replaceRegexpOne('a1b\nc2d', '[0-9]', 'x') AS ml, "
        "replaceRegexpOne('aXbXc', 'X', '-') AS one",
    ).collect()[0]
    assert r["g"] == "aXc"          # user group doesn't break numbering
    assert r["br"] == "a[b]c"       # CH \1 backref → matched text
    assert r["ml"] == "axb\nc2d"    # newline after match: still replaces
    assert r["one"] == "a-bXc"      # first occurrence only


def test_multiarray_lambdas_and_json_fastpath(spark):
    """arrayMap over TWO arrays must zip (a bare transform would feed
    Spark's (element, index) pair into the lambda — silent wrong values);
    arrayFilter multi-array rejects loudly; arrayEnumerateUniq /
    arrayDifference / visitParam* / simpleJSON* / ngramDistance resolve."""
    r = ch_sql(
        spark,
        "SELECT arrayMap((x, y) -> x + y, [1,2], [10,20]) AS m, "
        "arrayEnumerateUniq([1,1,2]) AS u, arrayDifference([1,4,9]) AS d, "
        "visitParamExtractInt('{\"a\":42}', 'a') AS v, "
        "simpleJSONHas('{\"s\":1}', 's') AS h, "
        "ngramDistance('abc', 'abc') AS nd",
    ).collect()[0]
    assert r["m"] == [11, 22] and r["u"] == [1, 2, 1]
    assert r["d"] == [0, 3, 5] and r["v"] == 42 and r["h"] is True
    assert r["nd"] == 0.0
    with pytest.raises(ChSqlError, match="arrayFilter with multiple"):
        ch_sql(spark, "SELECT arrayFilter((x, y) -> x > y, [1], [2])")


def test_ansi_safe_division_and_conversion_family(spark):
    """CH divide() is IEEE Float64 division — /0 yields ±inf (nan for
    0/0), never Spark-ANSI's DIVIDE_BY_ZERO; moduloOrZero guards the
    zero branch; to*OrNull/OrZero cover every signed/unsigned width;
    emptyArray<Type>() and arrayWithConstant resolve."""
    r = ch_sql(
        spark,
        "SELECT divide(1, 0) AS pinf, divide(-1, 0) AS ninf, "
        "isNaN(divide(0, 0)) AS nn, divide(6, 3) AS ok, "
        "moduloOrZero(5, 0) AS mz, intDivOrZero(5, 0) AS dz, "
        "toUInt64OrNull('xyz') AS cn, toInt16OrZero('bad') AS cz, "
        "emptyArrayInt64() AS ea, arrayWithConstant(2, 'x') AS ac, "
        "ifNotFinite(divide(1, 0), 99) AS nf",
    ).collect()[0]
    assert r["pinf"] == float("inf") and r["ninf"] == float("-inf")
    assert r["nn"] is True and r["ok"] == 2.0
    assert (r["mz"], r["dz"], r["cn"], r["cz"]) == (0, 0, None, 0)
    assert r["ea"] == [] and r["ac"] == ["x", "x"] and r["nf"] == 99.0


def test_url_family_sql(spark):
    """URL family in the SQL dialect mirrors the Column registry, incl.
    the two-label public-suffix rule."""
    r = ch_sql(
        spark,
        "SELECT domain('https://sub.example.com/x') AS d, "
        "protocol('https://a.co/x') AS p, "
        "cutToFirstSignificantSubdomain('https://sub.example.com/x') AS c, "
        "cutToFirstSignificantSubdomain('https://a.b.co.uk/x') AS cu, "
        "domainWithoutWWW('https://www.ex.com') AS w",
    ).collect()[0]
    assert tuple(r) == (
        "sub.example.com", "https", "example.com", "b.co.uk", "ex.com",
    )


def test_subtract_family_and_yyyymmddhhmmss(spark):
    r = ch_sql(
        spark,
        "SELECT subtractMonths(toDate('2024-03-15'), 2) AS m, "
        "subtractYears(toDate('2024-03-15'), 1) AS y, "
        "toLastDayOfMonth(toDate('2024-02-10')) AS l, "
        "toYYYYMMDDhhmmss(toDateTime('2024-01-02 03:04:05')) AS t",
    ).collect()[0]
    import datetime as dt
    assert r["m"] == dt.date(2024, 1, 15) and r["y"] == dt.date(2023, 3, 15)
    assert r["l"] == dt.date(2024, 2, 29) and r["t"] == 20240102030405


def test_array_combinators_sql(spark):
    """-Array combinators (AggregateFunctionArray.h) + arrayProduct in
    the SQL dialect."""
    r = ch_sql(
        spark,
        "SELECT arrayProduct([2,3,4]) AS p, sumArray(arr) AS s, "
        "minArray(arr) AS mn, maxArray(arr) AS mx, avgArray(arr) AS av, "
        "countArray(arr) AS c "
        "FROM (SELECT [1, 2] AS arr UNION ALL SELECT [3, 4])",
    ).collect()[0]
    assert tuple(r) == (24.0, 10.0, 1, 4, 2.5, 4)


def test_string_aliases_and_snowflake(spark):
    r = ch_sql(
        spark,
        "SELECT substringIndex('a.b.c', '.', 2) AS s, mid('hello', 2, 3) "
        "AS m, initcapUTF8('hello world') AS i, "
        "regexpExtract('a1b2', '([0-9])', 1) AS r, "
        "snowflakeToDateTime(dateTimeToSnowflake("
        "toDateTime('2024-01-01 00:00:00'))) AS rt",
    ).collect()[0]
    import datetime as dt
    assert (r["s"], r["m"], r["i"], r["r"]) == ("a.b", "ell", "Hello World", "1")
    assert r["rt"] == dt.datetime(2024, 1, 1, 0, 0)
