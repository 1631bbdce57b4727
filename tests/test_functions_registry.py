"""Unit tests for the CH function-name registry and combinator engine."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from byconity_spark.functions import UnknownFunctionError, ch, ch_agg


@pytest.fixture(scope="module")
def tbl(spark):
    return spark.createDataFrame(
        [
            (1, 10.0, "a", True),
            (2, -3.0, "b", False),
            (3, 7.0, "a", True),
            (4, None, "b", False),
        ],
        "id long, x double, grp string, flag boolean",
    )


def _one(df):
    return df.collect()[0]


# ------------------------------------------------------------- combinators
def test_sum_if(tbl):
    r = _one(tbl.agg(ch("sumIf", F.col("x"), F.col("flag")).alias("s")))
    assert r.s == 17.0


def test_count_if(tbl):
    r = _one(tbl.agg(ch("countIf", F.col("flag")).alias("c")))
    assert r.c == 2


def test_avg_if_ignores_nonmatching(tbl):
    r = _one(tbl.agg(ch("avgIf", F.col("x"), F.col("grp") == "b").alias("a")))
    assert r.a == -3.0  # NULL x row excluded by avg's null handling


def test_min_max_if(tbl):
    r = _one(
        tbl.agg(
            ch("minIf", F.col("x"), F.col("flag")).alias("lo"),
            ch("maxIf", F.col("x"), F.col("flag")).alias("hi"),
        )
    )
    assert (r.lo, r.hi) == (7.0, 10.0)


def test_sum_distinct(spark):
    df = spark.createDataFrame([(1.0,), (1.0,), (2.0,)], "v double")
    r = _one(df.agg(ch("sumDistinct", F.col("v")).alias("s")))
    assert r.s == 3.0


def test_count_or_null_empty(spark):
    df = spark.createDataFrame([], "v double")
    r = _one(df.agg(ch("countOrNull", F.col("v")).alias("c")))
    assert r.c is None


def test_sum_array_combinator(spark):
    df = spark.createDataFrame([([1.0, 2.0],), ([3.0],)], "arr array<double>")
    r = _one(df.agg(ch("sumArray", F.col("arr")).alias("s")))
    assert r.s == 6.0


def test_unknown_function_raises():
    with pytest.raises(UnknownFunctionError):
        ch("definitelyNotAFunction", F.lit(1))
    with pytest.raises(UnknownFunctionError):
        ch_agg("medianArray", F.lit(1))


# ------------------------------------------------------------- agg aliases
def test_arg_min_max_uniq(tbl):
    r = _one(
        tbl.agg(
            ch("argMax", F.col("grp"), F.col("x")).alias("am"),
            ch("uniqExact", F.col("grp")).alias("u"),
            ch("median", F.col("x")).alias("med"),
        )
    )
    assert r.am == "a" and r.u == 2 and r.med == 7.0


def test_group_array_sorted(tbl):
    r = _one(tbl.agg(F.sort_array(ch("groupArray", F.col("grp"))).alias("g")))
    assert r.g == ["a", "a", "b", "b"]


def test_quarter_week_year_arithmetic_keeps_time(spark):
    # add/subtractQuarters/Weeks/Years must use INTERVAL arithmetic so a
    # DateTime input keeps its time-of-day (add_months/date_sub return DATE)
    df = (
        spark.createDataFrame([("2024-03-15 13:45:30",)], "t string")
        .withColumn("t", F.col("t").cast("timestamp"))
    )
    out = df.select(
        ch("addQuarters", F.col("t"), 1).alias("aq"),
        ch("subtractQuarters", F.col("t"), 1).alias("sq"),
        ch("subtractWeeks", F.col("t"), 2).alias("sw"),
        ch("subtractYears", F.col("t"), 1).alias("sy"),
    )
    assert all(f.dataType.typeName() == "timestamp" for f in out.schema.fields)
    r = _one(out.select(*[F.col(c).cast("string").alias(c) for c in out.columns]))
    assert r.aq == "2024-06-15 13:45:30"
    assert r.sq == "2023-12-15 13:45:30"
    assert r.sw == "2024-03-01 13:45:30"
    assert r.sy == "2023-03-15 13:45:30"


# ------------------------------------------------------------ scalar spot
def test_scalar_functions_roundtrip(spark):
    df = spark.createDataFrame([("Hello World", "2024-03-15 13:45:30")], "s string, t string")
    df = df.withColumn("t", F.col("t").cast("timestamp"))
    r = _one(
        df.select(
            ch("lower", F.col("s")).alias("lo"),
            ch("position", F.col("s"), "World").alias("pos"),
            ch("toYYYYMM", F.col("t")).alias("ym"),
            ch("toDayOfWeek", F.col("t")).alias("dow"),  # 2024-03-15 = Friday
            ch("toStartOfFifteenMinutes", F.col("t")).cast("string").alias("q15"),
            ch("multiIf", F.lit(False), F.lit(1), F.lit(True), F.lit(2), F.lit(3)).alias(
                "mi"
            ),
            ch("intDiv", F.lit(17), F.lit(5)).alias("idv"),
            ch("moduloOrZero", F.lit(17), F.lit(0)).alias("mz"),
            ch("replaceOne", F.col("s"), "l", "L").alias("r1"),
            ch("arrayElement", F.split(F.col("s"), " "), F.lit(-1)).alias("lastw"),
        )
    )
    assert r.lo == "hello world"
    assert r.pos == 7
    assert r.ym == 202403
    assert r.dow == 5
    assert r.q15 == "2024-03-15 13:45:00"
    assert r.mi == 2
    assert r.idv == 3
    assert r.mz == 0
    assert r.r1 == "HeLlo World"
    assert r.lastw == "World"


def test_array_cumsum_difference_ngram(spark):
    df = spark.createDataFrame(
        [([1.0, 2.0, 3.0], "hello world", "hello wxrld")],
        "arr array<double>, a string, b string",
    )
    r = _one(
        df.select(
            ch("arrayCumSum", F.col("arr")).alias("cs"),
            ch("arrayDifference", F.col("arr")).alias("ad"),
            ch("ngramDistance", F.col("a"), F.col("a")).alias("same"),
            ch("ngramDistance", F.col("a"), F.col("b")).alias("near"),
        )
    )
    assert r.cs == [1.0, 3.0, 6.0]
    assert r.ad == [0.0, 1.0, 1.0]
    assert r.same == 0.0
    assert 0.0 < r.near < 1.0


def test_json_and_url(spark):
    df = spark.createDataFrame(
        [('{"k": 42, "s": "hi"}', "https://ex.org/a/b?x=1&y=2#frag")],
        "j string, u string",
    )
    r = _one(
        df.select(
            ch("JSONExtractInt", F.col("j"), "k").alias("k"),
            ch("JSONExtractString", F.col("j"), "s").alias("s"),
            ch("JSONHas", F.col("j"), "zz").alias("h"),
            ch("domain", F.col("u")).alias("d"),
            ch("path", F.col("u")).alias("p"),
            ch("extractURLParameter", F.col("u"), "y").alias("y"),
            ch("cutQueryString", F.col("u")).alias("cq"),
        )
    )
    assert (r.k, r.s, r.h) == (42, "hi", False)
    assert (r.d, r.p, r.y, r.cq) == ("ex.org", "/a/b", "2", "https://ex.org/a/b")


def test_round4_breadth_batch(spark):
    """Round-4 scalar additions: erf, roundAge, bitRotateLeft,
    arrayCumSumNonNegative, multiSearchAny, countSubstrings, dateName."""
    from byconity_spark.functions import ch
    from pyspark.sql import functions as F
    import math

    df = spark.createDataFrame([("abcabca", 30, 5)], "s string, age long, x long")
    r = df.select(
        ch("countSubstrings", F.col("s"), "abc").alias("n_abc"),
        ch("multiSearchAny", F.col("s"), ["zz", "bca"]).alias("any_hit"),
        ch("multiSearchAny", F.col("s"), ["zz", "yy"]).alias("no_hit"),
        ch("roundAge", F.col("age")).alias("age_b"),
        ch("bitRotateLeft", F.col("x"), 2).alias("rot"),
        ch("erf", F.lit(1.0)).alias("erf1"),
        ch("erf", F.lit(-1.0)).alias("erfm1"),
        ch("arrayCumSumNonNegative", F.array(F.lit(1.0), F.lit(-5.0), F.lit(3.0))).alias("cs"),
        ch("dateName", "weekday", F.lit("2024-01-01").cast("date")).alias("wd"),
        ch("toLastDayOfMonth", F.lit("2024-02-10").cast("date")).alias("eom"),
    ).collect()[0]
    assert r.n_abc == 2
    assert r.any_hit is True and r.no_hit is False
    assert r.age_b == 25
    assert r.rot == 20
    assert abs(r.erf1 - math.erf(1.0)) < 1e-6
    assert abs(r.erfm1 - math.erf(-1.0)) < 1e-6
    assert r.cs == [1.0, 0.0, 3.0]
    assert r.wd == "Monday"
    assert str(r.eom) == "2024-02-29"


def test_geohash_encode_golden(spark):
    """Public geohash test vectors (geohash.org reference values)."""
    from byconity_spark.functions.registry import ch
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            (-5.60302, 42.593385, "ezs42"),
            (10.40744, 57.64911, "u4pruydqqvj"),
            (139.691711, 35.689487, "xn774c06"),
        ],
        "lng double, lat double, expect string",
    )
    rows = df.select(
        ch("geohashEncode", F.col("lng"), F.col("lat")).alias("gh"), "expect"
    ).collect()
    for r in rows:
        assert r.gh.startswith(r.expect), (r.gh, r.expect)


def test_map_combinators_and_simple_state(spark):
    from byconity_spark.functions.registry import ch_agg
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, {"a": 1.0, "b": 2.0}), (1, {"b": 3.0, "c": 4.0})],
        "g int, m map<string,double>",
    )
    r = df.groupBy("g").agg(
        ch_agg("sumMap", F.col("m")).alias("sm"),
        ch_agg("minMap", F.col("m")).alias("nm"),
        ch_agg("maxMap", F.col("m")).alias("xm"),
        ch_agg("sumSimpleState", F.lit(2)).alias("ss"),
        ch_agg("countOrDefault", F.lit(1)).alias("cd"),
    ).first()
    assert dict(r.sm) == {"a": 1.0, "b": 5.0, "c": 4.0}
    assert dict(r.nm) == {"a": 1.0, "b": 2.0, "c": 4.0}
    assert dict(r.xm) == {"a": 1.0, "b": 3.0, "c": 4.0}
    assert r.ss == 4 and r.cd == 2


def test_enumerate_dense_and_uuid(spark):
    from byconity_spark.functions.registry import ch
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [([10, 20, 10, 30], "f47ac10b-58cc-4372-a567-0e02b2c3d479")],
        "arr array<int>, u string",
    )
    r = df.select(
        ch("arrayEnumerateDense", F.col("arr")).alias("d"),
        ch("UUIDNumToString", ch("UUIDStringToNum", F.col("u"))).alias("rt"),
        ch("mapUpdate",
           F.create_map(F.lit("a"), F.lit(1), F.lit("b"), F.lit(2)),
           F.create_map(F.lit("b"), F.lit(9))).alias("mu"),
    ).first()
    assert r.d == [1, 2, 1, 3]
    assert r.rt == "f47ac10b-58cc-4372-a567-0e02b2c3d479"
    assert dict(r.mu) == {"a": 1, "b": 9}


def test_breadth2_scalars(spark):
    from byconity_spark.functions.registry import ch
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1,)], "id int")
    r = df.select(
        ch("bar", F.lit(5.0), 0, 10, 4).alias("bar"),
        ch("formatReadableQuantity", F.lit(1234567.0)).alias("frq"),
        ch("pointInPolygon", F.lit(0.5), F.lit(0.5),
           [(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0)]).alias("inside"),
        ch("pointInPolygon", F.lit(2.0), F.lit(0.5),
           [(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0)]).alias("outside"),
        ch("mapAdd",
           F.create_map(F.lit("a"), F.lit(1.0), F.lit("b"), F.lit(2.0)),
           F.create_map(F.lit("b"), F.lit(3.0))).alias("madd"),
        ch("firstSignificantSubdomain",
           F.lit("https://news.example.com.cn/path")).alias("fss"),
        ch("domainWithoutWWW", F.lit("https://www.example.org/x")).alias("dww"),
        ch("mapPopulateSeries",
           F.create_map(F.lit(1), F.lit(10).cast("long"),
                        F.lit(4), F.lit(40).cast("long"))).alias("mps"),
        ch("tryBase64Decode", F.lit("aGk=")).alias("b64ok"),
        ch("tryBase64Decode", F.lit("!!!bad")).alias("b64bad"),
    ).first()
    assert r.bar == "██"
    assert r.frq == "1.23 million"
    assert r.inside is True and r.outside is False
    assert dict(r.madd) == {"a": 1.0, "b": 5.0}
    assert r.fss == "example"
    assert r.dww == "example.org"
    assert dict(r.mps) == {1: 10, 2: 0, 3: 0, 4: 40}
    assert r.b64ok == "hi" and r.b64bad is None


def test_running_difference_and_neighbor(spark):
    from byconity_spark.functions.registry import ch
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, 10.0), (2, 13.0), (3, 11.0)], "o int, v double"
    )
    rows = (
        df.select(
            "o",
            ch("runningDifference", F.col("v"), F.col("o")).alias("rd"),
            ch("neighbor", F.col("v"), 1, F.col("o")).alias("nx"),
        )
        .orderBy("o")
        .collect()
    )
    assert [r.rd for r in rows] == [None, 3.0, -2.0]
    assert [r.nx for r in rows] == [13.0, 11.0, None]


def test_array_auc_and_compact(spark):
    from byconity_spark.functions.registry import ch
    from pyspark.sql import functions as F
    import math

    df = spark.createDataFrame(
        [([0.1, 0.4, 0.35, 0.8], [0, 0, 1, 1], [1, 1, 2, 2, 1])],
        "s array<double>, l array<int>, c array<int>",
    )
    r = df.select(
        ch("arrayAUC", F.col("s"), F.col("l")).alias("auc"),
        ch("arrayAUC", F.col("s"), F.array(F.lit(1), F.lit(1), F.lit(1), F.lit(1))).alias("deg"),
        ch("arrayCompact", F.col("c")).alias("cc"),
    ).first()
    # reference example: scores (0.1,-),(0.35,+),(0.4,-),(0.8,+) -> AUC 0.75
    assert abs(r.auc - 0.75) < 1e-9
    assert math.isnan(r.deg)
    assert r.cc == [1, 2, 1]


def test_sum_map_filtered(spark):
    from byconity_spark.functions.registry import ch_agg
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, {"a": 1.0, "b": 2.0}), (1, {"b": 3.0, "c": 4.0})],
        "g int, m map<string,double>",
    )
    r = df.groupBy("g").agg(
        ch_agg("sumMapFiltered", ["b", "c"], F.col("m")).alias("s"),
        ch_agg("maxMapFiltered", ["b"], F.col("m")).alias("x"),
    ).first()
    assert dict(r.s) == {"b": 5.0, "c": 4.0}
    assert dict(r.x) == {"b": 3.0}


def test_vector_math_and_breadth3(spark):
    from byconity_spark.functions.registry import ch
    from pyspark.sql import functions as F
    import datetime as dt

    df = spark.createDataFrame(
        [([1.0, 2.0, 3.0], [4.0, 5.0, 6.0], dt.date(2021, 1, 1))],
        "a array<double>, b array<double>, d date",
    )
    r = df.select(
        ch("dotProduct", F.col("a"), F.col("b")).alias("dp"),
        ch("L1Norm", F.col("a")).alias("l1"),
        ch("L2Distance", F.col("a"), F.col("b")).alias("l2d"),
        ch("cosineDistance", F.col("a"), F.col("b")).alias("cd"),
        ch("toISOYear", F.col("d")).alias("iso"),
        ch("dateSub", "day", 1, F.col("d")).alias("dm"),
        ch("arrayFold", lambda acc, x: acc + x, F.col("a"), F.lit(0.0)).alias("fold"),
        ch("intExp2", F.lit(10)).alias("e2"),
        ch("nanToNull", F.lit(float("nan"))).alias("nn"),
    ).first()
    assert r.dp == 32.0 and r.l1 == 6.0
    assert abs(r.l2d - 27 ** 0.5) < 1e-12
    assert 0 < r.cd < 0.03  # nearly-parallel vectors
    assert r.iso == 2020
    assert str(r.dm) == "2020-12-31"
    assert r.fold == 6.0 and r.e2 == 1024 and r.nn is None


def test_ngram_hash_family(spark):
    """ngramSimHash/ngramMinHash/wordShingle* (FunctionsStringHash.cpp):
    near-duplicate strings land near in hamming space; identical strings
    collide exactly; the MinHash tuple detects one-word edits via the
    unchanged half."""
    from byconity_spark.functions.registry import ch
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(
            "the quick brown fox jumps over the lazy dog",
            "the quick brown fox jumps over the lazy cat",
            "completely different text about databases",
        )],
        "a string, b string, c string",
    )
    r = df.select(
        ch("ngramSimHash", F.col("a")).alias("sa"),
        ch("ngramSimHash", F.col("a")).alias("sa2"),
        ch("ngramSimHash", F.col("b")).alias("sb"),
        ch("ngramSimHash", F.col("c")).alias("sc"),
        ch("ngramMinHash", F.col("a")).alias("ma"),
        ch("ngramMinHash", F.col("b")).alias("mb"),
        ch("wordShingleSimHash", F.col("a")).alias("wa"),
        ch("wordShingleSimHash", F.col("b")).alias("wb"),
    ).first()

    def ham(x, y):
        return bin((x ^ y) & ((1 << 64) - 1)).count("1")

    assert r.sa == r.sa2
    assert ham(r.sa, r.sb) < ham(r.sa, r.sc)
    assert ham(r.wa, r.wb) < 64
    # one-word tail edit: the LOW-hash half of the minhash tuple usually
    # survives — assert the tuple is not totally destroyed
    assert (r.ma.h1 == r.mb.h1) or (r.ma.h2 == r.mb.h2) or ham(r.sa, r.sb) <= 10


def test_value_divergent_hash_warns_then_strict_raises(spark):
    import warnings

    import pytest as _pytest

    from byconity_spark.functions import registry as reg

    reg._warned_hashes.discard("cityHash64")
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        ch("cityHash64", F.lit("x"))
        assert any("value-divergent" in str(w.message) for w in caught)
    # warned once per name only
    with warnings.catch_warnings(record=True) as caught2:
        warnings.simplefilter("always")
        ch("cityHash64", F.lit("x"))
        assert not caught2
    reg.set_strict_hash_compat(True)
    try:
        # names WITH an exact port resolve to it instead of raising (r7)
        col = ch("sipHash128", F.lit("x"))
        assert col is not None
        # names WITHOUT an exact port still raise
        with _pytest.raises(ValueError, match="no exact port"):
            ch("farmFingerprint64", F.lit("x"))
        # value-stable names stay usable in strict mode
        ch("xxHash64", F.lit("x"))
    finally:
        reg.set_strict_hash_compat(False)
