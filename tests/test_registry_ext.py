"""Round-6 parity extension batches (registry_ext.py): MySQL aliases,
conversion variants, parseDateTime family, unix64 helpers, reinterpretAs*,
version compare, exact javaHash, IN functional forms."""

import warnings

import pytest
from pyspark.sql import functions as F

from byconity_spark.functions.registry import ch, registered_names


@pytest.fixture(scope="module")
def df(spark):
    return spark.range(1).select(
        F.lit("2024-03-15 14:30:45").cast("timestamp").alias("ts"),
        F.lit("hello world").alias("s"),
    )


def _one(df, col):
    return df.select(col.alias("v")).collect()[0][0]


CASES = [
    # MySQL date/time compat (reference IFunctionMySql wrappers)
    ("WEEKDAY", lambda: ch("WEEKDAY", F.col("ts")), 4),  # Friday, Monday=0
    ("DAYOFWEEK", lambda: ch("DAYOFWEEK", F.col("ts")), 6),  # MySQL Sunday=1
    ("to_days epoch anchor", lambda: ch("to_days", F.lit("1970-01-01")), 719528),
    ("from_days roundtrip", lambda: ch("from_days", F.lit(719528)).cast("string"),
     "1970-01-01"),
    ("sec_to_time", lambda: ch("sec_to_time", F.lit(3661)), "01:01:01"),
    ("time_to_sec on time string", lambda: ch("time_to_sec", F.lit("01:01:01")), 3661),
    ("time_to_sec on datetime", lambda: ch("time_to_sec", F.col("ts")), 52245),
    ("toDayHour", lambda: ch("toDayHour", F.col("ts")), 1514),
    ("toDaySecond", lambda: ch("toDaySecond", F.col("ts")), 15143045),
    ("convertDayHourToHour", lambda: ch("convertDayHourToHour", F.lit(1514)), 374),
    ("convertDaySecondToSecond",
     lambda: ch("convertDaySecondToSecond", F.lit(15143045)),
     15 * 86400 + 14 * 3600 + 30 * 60 + 45),
    ("toRelativeMonthNum", lambda: ch("toRelativeMonthNum", F.col("ts")), 24291),
    ("toRelativeWeekNum first Monday",
     lambda: ch("toRelativeWeekNum", F.lit("1970-01-05").cast("date")), 1),
    ("toYYYYMMDDhhmmss", lambda: ch("toYYYYMMDDhhmmss", F.col("ts")), 20240315143045),
    # version compare (FunctionAppVersionCompare.h)
    ("versionCompare numeric not lexicographic",
     lambda: ch("versionCompare", F.lit("1.2.10"), F.lit("1.2.9"), ">"), 1),
    ("versionCompare missing parts are zero",
     lambda: ch("versionCompare", F.lit("1.2"), F.lit("1.2.0"), "=="), 1),
    ("versionCompare max_length",
     lambda: ch("versionCompare", F.lit("1.2.9"), F.lit("1.2.4"), "==", 2), 1),
    # javaHash is EXACT (Java String.hashCode)
    ("javaHash hello", lambda: ch("javaHash", F.lit("hello")), 99162322),
    ("javaHash hello world", lambda: ch("javaHash", F.lit("hello world")), 1794106052),
    ("javaHash empty", lambda: ch("javaHash", F.lit("")), 0),
    # misc scalars
    ("strcmp", lambda: ch("strcmp", F.lit("a"), F.lit("b")), -1),
    ("sigmoid(0)", lambda: F.round(ch("sigmoid", F.lit(0.0)), 4), 0.5),
    ("xor odd parity", lambda: ch("xor", F.lit(1), F.lit(0), F.lit(1)), 0),
    ("find_in_set", lambda: ch("find_in_set", F.lit("b"), F.lit("a,b,c")), 2),
    ("make_set bits 1|4", lambda: ch("make_set", F.lit(5), "x", "y", "z"), "x,z"),
    ("JSON_UNQUOTE", lambda: ch("JSON_UNQUOTE", F.lit('"ab\\"c"')), 'ab"c'),
    ("conv hex", lambda: ch("conv", F.lit("ff"), 16, 10), "255"),
    ("toDecimalString", lambda: ch("toDecimalString", F.lit(3.14159), 2), "3.14"),
    ("throwIf false returns 0", lambda: ch("throwIf", F.lit(False), "boom"), 0),
    ("replaceRegexpOne first occurrence only",
     lambda: ch("replaceRegexpOne", F.lit("aXbXc"), "X", "-"), "a-bXc"),
    ("lgamma(5)=ln(24)", lambda: F.round(ch("lgamma", F.lit(5.0)), 6), 3.178054),
    ("min2", lambda: ch("min2", F.lit(3), F.lit(7)), 3),
    ("width_bucket", lambda: ch("width_bucket", F.lit(5.0), F.lit(0.0),
                                F.lit(10.0), F.lit(5)), 3),
    ("basename", lambda: ch("basename", F.lit("/a/b/c.txt")), "c.txt"),
    ("caseWithExpr", lambda: ch("caseWithExpr", F.lit(2), 1, "one", 2, "two", "?"),
     "two"),
    # conversion variants
    ("toDateOrZero saturates", lambda: ch("toDateOrZero", F.lit("bogus")).cast("string"),
     "1970-01-01"),
    ("toDateTime64OrNull", lambda: ch("toDateTime64OrNull", F.lit("bogus")), None),
    ("toUUIDOrZero", lambda: ch("toUUIDOrZero", F.lit(None).cast("string")),
     "00000000-0000-0000-0000-000000000000"),
    # parseDateTime family
    ("parseDateTime MySQL fmt",
     lambda: ch("parseDateTime", F.lit("2024-03-15"), "%Y-%m-%d").cast("string"),
     "2024-03-15 00:00:00"),
    ("parseDateTimeBestEffortUS month-first",
     lambda: ch("parseDateTimeBestEffortUS", F.lit("03/15/2024")).cast("string"),
     "2024-03-15 00:00:00"),
    ("parseFloat64OrZeroMySql prefix", lambda:
     ch("parseFloat64OrZeroMySql", F.lit("3.5abc")), 3.5),
    ("parseFloat64OrZeroMySql garbage", lambda:
     ch("parseFloat64OrZeroMySql", F.lit("abc")), 0.0),
    # unix64 helpers (session tz is UTC in tests)
    ("toUnixTimestamp64Milli", lambda: ch("toUnixTimestamp64Milli", F.col("ts")),
     1710513045000),
    ("fromUnixTimestamp64Nano floor",
     lambda: ch("fromUnixTimestamp64Nano", F.lit(1710513045123456789)).cast("string"),
     "2024-03-15 14:30:45.123456"),
    ("FROM_UNIXTIME_ADAPTIVE ms",
     lambda: ch("FROM_UNIXTIME_ADAPTIVE", F.lit(1710513045000)).cast("string"),
     "2024-03-15 14:30:45"),
    ("FROM_UNIXTIME_ADAPTIVE s",
     lambda: ch("FROM_UNIXTIME_ADAPTIVE", F.lit(1710513045)).cast("string"),
     "2024-03-15 14:30:45"),
    ("snowflake roundtrip",
     lambda: ch("snowflakeToDateTime64",
                ch("dateTime64ToSnowflake", F.col("ts"))).cast("string"),
     "2024-03-15 14:30:45"),
    ("UUIDToUInt64High",
     lambda: ch("UUIDToUInt64High", F.lit("00000000-0000-0001-0000-000000000002")), 1),
    ("UUIDToUInt64Low",
     lambda: ch("UUIDToUInt64Low", F.lit("00000000-0000-0001-0000-000000000002")), 2),
    # reinterpretAs* (little-endian raw bytes)
    ("reinterpretAsUInt32 of 'abc'", lambda: ch("reinterpretAsUInt32", F.lit("abc")),
     0x636261),
    ("reinterpretAsString of 0x636261",
     lambda: ch("reinterpretAsString", F.lit(0x636261)), "abc"),
    ("reinterpretAsUInt64 two's complement wrap",
     lambda: ch("reinterpretAsUInt64", F.lit(-1)), -1),
    ("reinterpretAsFloat64 of 1.0 bits",
     lambda: ch("reinterpretAsFloat64", F.lit(4607182418800017408)), 1.0),
    # arrays tail
    ("arrayLastIndex", lambda: ch("arrayLastIndex", lambda x: x > 1,
                                  F.array(F.lit(1), F.lit(2), F.lit(3), F.lit(0))), 3),
    ("arrayFirstOrNull empty match", lambda: ch(
        "arrayFirstOrNull", lambda x: x > 10, F.array(F.lit(1))), None),
    ("bitmaskToArray", lambda: ch("bitmaskToArray", F.lit(10)).cast("string"),
     "[2, 8]"),
    ("arrayWithConstant", lambda: ch("arrayWithConstant", F.lit(3), F.lit(7))
     .cast("string"), "[7, 7, 7]"),
    # IN functional forms
    ("nullIn finds NULL", lambda: ch("nullIn", F.lit(None).cast("int"), 1, None, 3),
     True),
    ("notIn", lambda: ch("notIn", F.lit(5), 1, 2, 3), True),
]


@pytest.mark.parametrize("name,build,want", CASES, ids=[c[0] for c in CASES])
def test_ext_scalar(df, name, build, want):
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        got = _one(df, build())
    if isinstance(want, float):
        assert got == pytest.approx(want, abs=1e-6), name
    else:
        assert got == want, name


def test_throwIf_raises(df):
    from py4j.protocol import Py4JJavaError
    with pytest.raises(Exception) as ei:
        _one(df, ch("throwIf", F.lit(True), "boom!"))
    assert "boom" in str(ei.value)


def test_jump_consistent_hash_properties(spark):
    # all outputs in [0, buckets); stable across calls
    d = spark.range(200)
    out1 = [r[0] for r in d.select(ch("jumpConsistentHash", F.col("id"), 16)
                                   .alias("b")).collect()]
    out2 = [r[0] for r in d.select(ch("jumpConsistentHash", F.col("id"), 16)
                                   .alias("b")).collect()]
    assert out1 == out2
    assert all(0 <= b < 16 for b in out1)
    assert len(set(out1)) > 4  # spreads


def test_new_hash_standins_warn_and_strict(df):
    from byconity_spark.functions.registry import set_strict_hash_compat
    with warnings.catch_warnings(record=True):
        warnings.simplefilter("always")
        _one(df, ch("murmurHash3_64", F.col("s")))
    set_strict_hash_compat(True)
    try:
        with pytest.raises(ValueError):
            ch("wyHash64", F.col("s"))
    finally:
        set_strict_hash_compat(False)


def test_registered_name_count_floor():
    names = registered_names()
    assert len(names["scalar"]) >= 950


# ---------------------------------------------------------------- batch 2
@pytest.fixture(scope="module")
def vdf(spark):
    return spark.range(1).select(
        F.array(F.lit(3.0), F.lit(4.0)).alias("a"),
        F.array(F.lit(1.0), F.lit(2.0)).alias("b"),
        F.lit("the quick brown fox").alias("s"),
    )


CASES2 = [
    ("L2Norm 3-4-5", lambda: ch("L2Norm", F.col("a")), 5.0),
    ("L1Distance", lambda: ch("L1Distance", F.col("a"), F.col("b")), 4.0),
    ("dotProduct", lambda: ch("dotProduct", F.col("a"), F.col("b")), 11.0),
    ("cosineDistance self = 0",
     lambda: F.round(ch("cosineDistance", F.col("a"), F.col("a")), 9), 0.0),
    ("normalizeL2", lambda: ch("normalizeL2", F.col("a")).cast("string"),
     "[0.6, 0.8]"),
    ("tupleHammingDistance", lambda: ch("tupleHammingDistance", F.col("a"),
                                        F.col("b")), 2),
    # the reference identity mortonEncode(1,2,3)=53 pins the bit layout
    ("mortonEncode(1,2,3)", lambda: ch("mortonEncode", F.lit(1), F.lit(2),
                                       F.lit(3)), 53),
    ("morton roundtrip", lambda: ch(
        "mortonDecode", 2, ch("mortonEncode", F.lit(12345), F.lit(67890))
    ).cast("string"), "[12345, 67890]"),
    ("hasToken word", lambda: ch("hasToken", F.col("s"), "quick"), 1),
    ("hasToken sub-word misses", lambda: ch("hasToken", F.col("s"), "qui"), 0),
    ("hasTokens phrase", lambda: ch("hasTokens", F.col("s"), "quick brown"), 1),
    ("hasTokenOrNull separator needle",
     lambda: ch("hasTokenOrNull", F.col("s"), "qu ick"), None),
    ("hasTokenBySeperator", lambda: ch("hasTokenBySeperator", F.lit("a|b|c"),
                                       "b", "|"), True),
    ("multiMatchAnyIndex", lambda: ch("multiMatchAnyIndex", F.col("s"),
                                      ["xyz", "qu.ck"]), 2),
    ("multiMatchAllIndices", lambda: ch("multiMatchAllIndices", F.col("s"),
                                        ["fox", "qu.ck", "zzz"]).cast("string"),
     "[1, 2]"),
    ("arrayFill carries forward", lambda: ch(
        "arrayFill", lambda x: x > 0,
        F.array(F.lit(1), F.lit(0), F.lit(0), F.lit(5), F.lit(0))
    ).cast("string"), "[1, 1, 1, 5, 5]"),
    ("arrayFill keeps leading", lambda: ch(
        "arrayFill", lambda x: x > 0, F.array(F.lit(0), F.lit(2))
    ).cast("string"), "[0, 2]"),
    ("arraySplit cuts before", lambda: ch(
        "arraySplit", lambda x: x > 3,
        F.array(F.lit(1), F.lit(2), F.lit(4), F.lit(5), F.lit(1))
    ).cast("string"), "[[1, 2], [4], [5, 1]]"),
    ("arrayReverseSplit cuts after", lambda: ch(
        "arrayReverseSplit", lambda x: x > 3,
        F.array(F.lit(1), F.lit(4), F.lit(2), F.lit(5), F.lit(1))
    ).cast("string"), "[[1, 4], [2, 5], [1]]"),
    ("URLHierarchy", lambda: ch(
        "URLHierarchy", F.lit("https://example.com/browse/CONV-6788")
    ).cast("string"),
     "[https://example.com/, https://example.com/browse/,"
     " https://example.com/browse/CONV-6788]"),
    ("URLPathHierarchy", lambda: ch(
        "URLPathHierarchy", F.lit("https://example.com/browse/CONV-6788")
    ).cast("string"), "[/browse/, /browse/CONV-6788]"),
    ("cutURLParameter", lambda: ch("cutURLParameter",
                                   F.lit("http://x.com/?a=1&b=2&c=3"), "b"),
     "http://x.com/?a=1&c=3"),
    ("decodeURLFormComponent plus", lambda: ch("decodeURLFormComponent",
                                               F.lit("a+b%21")), "a b!"),
    ("port", lambda: ch("port", F.lit("http://x.com:8080/a")), 8080),
    ("MAC roundtrip", lambda: ch("MACStringToNum",
                                 ch("MACNumToString", F.lit(123456789))),
     123456789),
    ("MACStringToOUI", lambda: ch("MACStringToOUI", F.lit("12:34:56:78:9a:bc")),
     0x123456),
    ("isIPAddressInRange hit", lambda: ch("isIPAddressInRange",
                                          F.lit("192.168.1.77"),
                                          F.lit("192.168.0.0/16")), 1),
    ("isIPAddressInRange miss", lambda: ch("isIPAddressInRange",
                                           F.lit("192.169.1.77"),
                                           F.lit("192.168.0.0/16")), 0),
    ("IPv4ToIPv6 mapped form", lambda: ch("IPv4ToIPv6", F.lit("1.2.3.4")),
     "::ffff:1.2.3.4"),
]


@pytest.mark.parametrize("name,build,want", CASES2, ids=[c[0] for c in CASES2])
def test_ext_batch2(vdf, name, build, want):
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        got = _one(vdf, build())
    if isinstance(want, float):
        assert got == pytest.approx(want, abs=1e-6), name
    else:
        assert got == want, name


def test_proportions_ztest_closed_form(vdf):
    """z/p must match the closed-form two-proportion z-test (ztest.cpp)."""
    import math
    from statistics import NormalDist
    px, py = 10 / 100, 11 / 101
    se = math.sqrt(px * (1 - px) / 100 + py * (1 - py) / 101)
    z = (px - py) / se
    p = 2 * (1 - NormalDist().cdf(abs(z)))
    row = _one(vdf, ch("proportionsZTest", F.lit(10), F.lit(11), F.lit(100),
                       F.lit(101), 0.95, "unpooled"))
    assert row["z_statistic"] == pytest.approx(z, abs=1e-9)
    assert row["p_value"] == pytest.approx(p, abs=1e-6)  # erf polynomial tol
    assert row["confidence_interval_low"] < row["confidence_interval_high"]


def test_min_sample_size_conversion_formula(vdf):
    """(Z_{1-a/2}·sqrt(2·p̄q̄) + Z_pow·sqrt(p1q1+p2q2))²/mde² (minSampleSize.cpp)."""
    import math
    from statistics import NormalDist
    nd = NormalDist()
    p1, mde, power, alpha = 0.25, 0.03, 0.80, 0.05
    p2 = p1 + mde
    p_bar = (p1 + p2) / 2
    want = (nd.inv_cdf(1 - alpha / 2) * math.sqrt(2 * p_bar * (1 - p_bar))
            + nd.inv_cdf(power) * math.sqrt(p1 * (1 - p1) + p2 * (1 - p2))) ** 2 \
        / mde ** 2
    row = _one(vdf, ch("minSampleSizeConversion", F.lit(0.25), mde, power, alpha))
    assert row["minimum_sample_size"] == pytest.approx(want, rel=1e-9)
    assert row["detect_range_lower"] == pytest.approx(0.22)
    assert row["detect_range_upper"] == pytest.approx(0.28)


# ---------------------------------------------------------------- batch 3
@pytest.fixture(scope="module")
def adf(spark):
    import pandas as pd
    return spark.createDataFrame(pd.DataFrame({
        "x": [1.0, 2.0, 3.0, 4.0, 5.0, 100.0, 2.0, 2.0],
        "y": [2.0, 4.0, 6.0, 8.0, 10.0, 1.0, 5.0, 5.0],
        "g": [0, 0, 0, 0, 1, 1, 1, 1],
        "ts": [1, 2, 3, 4, 5, 6, 7, 8],
    }))


def _agg1(df, col):
    return df.agg(col.alias("v")).collect()[0][0]


def test_agg_aliases_and_medians(adf):
    from byconity_spark.functions.registry import ch_agg
    import math
    xs = [1.0, 2.0, 3.0, 4.0, 5.0, 100.0, 2.0, 2.0]
    mean = sum(xs) / len(xs)
    std_pop = math.sqrt(sum((v - mean) ** 2 for v in xs) / len(xs))
    assert _agg1(adf, ch_agg("STD", F.col("x"))) == pytest.approx(std_pop)
    assert _agg1(adf, ch_agg("first_value", F.col("x"))) == 1.0
    assert _agg1(adf, ch_agg("anyHeavy", F.col("x"))) == 2.0  # exact mode
    assert _agg1(adf, ch_agg("medianExactLow", F.col("x"))) == 2.0
    assert _agg1(adf, ch_agg("medianExactHigh", F.col("x"))) == 3.0
    assert _agg1(adf, ch_agg("topK", 2, F.col("x"))) == ["2.0", "1.0"]


def test_agg_delta_sum_timestamp(adf):
    from byconity_spark.functions.registry import ch_agg
    # x in ts order: 1,2,3,4,5,100,2,2 → positive increments 1+1+1+1+95 = 99
    assert _agg1(adf, ch_agg("deltaSumTimestamp", F.col("x"), F.col("ts"))) == 99.0


def test_agg_rank_corr_exact_spearman(adf):
    """rankCorr must equal Pearson-of-average-tie-ranks, computed by hand."""
    import math
    from byconity_spark.functions.registry import ch_agg
    x = [1, 2, 3, 4, 5, 100, 2, 2]
    y = [2, 4, 6, 8, 10, 1, 5, 5]

    def ranks(v):
        return [sum(1 for u in v if u < w) + (sum(1 for u in v if u == w) + 1) / 2
                for w in v]

    rx, ry = ranks(x), ranks(y)
    n = len(x)
    ma, mb = sum(rx) / n, sum(ry) / n
    cov = sum((p - ma) * (q - mb) for p, q in zip(rx, ry)) / n
    va = sum((p - ma) ** 2 for p in rx) / n
    vb = sum((q - mb) ** 2 for q in ry) / n
    want = cov / math.sqrt(va * vb)
    assert _agg1(adf, ch_agg("rankCorr", F.col("x"), F.col("y"))) == \
        pytest.approx(want, abs=1e-12)


def test_agg_mann_whitney_u_exact(adf):
    """U statistic pinned by hand: group0=[1,2,3,4], group1=[5,100,2,2] →
    rank-sum R1=15, U1=5."""
    from byconity_spark.functions.registry import ch_agg
    row = _agg1(adf, ch_agg("mannWhitneyUTest", F.col("x"), F.col("g")))
    assert row["u_statistic"] == 5.0
    assert 0.0 < row["p_value"] <= 1.0


def test_agg_welch_t_exact_statistic(adf):
    import statistics
    import math
    from byconity_spark.functions.registry import ch_agg
    g0, g1 = [1.0, 2.0, 3.0, 4.0], [5.0, 100.0, 2.0, 2.0]
    t = (statistics.mean(g0) - statistics.mean(g1)) / math.sqrt(
        statistics.variance(g0) / 4 + statistics.variance(g1) / 4)
    row = _agg1(adf, ch_agg("welchTTest", F.col("x"), F.col("g")))
    assert row["t_statistic"] == pytest.approx(t, abs=1e-12)


def test_agg_mapped_arrays(spark):
    import pandas as pd
    from byconity_spark.functions.registry import ch_agg
    df = spark.createDataFrame(pd.DataFrame({
        "k": [["a", "b"], ["b"], ["a"]],
        "v": [[1.0, 2.0], [3.0], [5.0]],
    }))
    row = _agg1(df, ch_agg("sumMappedArrays", F.col("k"), F.col("v")))
    assert dict(zip(row["keys"], row["values"])) == {"a": 6.0, "b": 5.0}
    row = _agg1(df, ch_agg("maxMappedArrays", F.col("k"), F.col("v")))
    assert dict(zip(row["keys"], row["values"])) == {"a": 5.0, "b": 3.0}


def test_agg_moving_sum_windowed(adf):
    from byconity_spark.functions.registry import ch_agg
    got = _agg1(adf, ch_agg("groupArrayMovingSum", F.col("x"), 3))
    assert got == [1.0, 3.0, 5.0, 6.0, 7.0, 9.0, 12.0, 109.0]


# ------------------------------------------------------- name inventory
def test_name_inventory_pointers_resolve():
    """Every operator-surface pointer of form module:function must resolve
    to a real attribute — the inventory is a parity index, not a wish list."""
    import importlib
    from byconity_spark.functions.name_inventory import inventory

    inv = inventory()
    assert len(inv) > 1200
    checked = 0
    for name, (surface, ptr) in inv.items():
        if surface != "operator" or ":" not in ptr:
            continue
        mod_path, _, fn = ptr.partition(":")
        fn = fn.split(" ")[0].split("(")[0]
        if not fn.isidentifier():
            continue
        mod = importlib.import_module(f"byconity_spark.{mod_path}")
        assert hasattr(mod, fn), f"{name} -> {ptr}"
        checked += 1
    assert checked >= 60


def test_group_array_sample_and_histogram(spark):
    from byconity_spark.functions.registry import ch_agg
    d = spark.range(100).select((F.col("id") % 10).alias("x"))
    samp = d.agg(ch_agg("groupArraySample", 5, F.col("x")).alias("s")) \
        .collect()[0][0]
    assert len(samp) == 5
    samp2 = d.agg(ch_agg("groupArraySample", 5, F.col("x")).alias("s")) \
        .collect()[0][0]
    assert samp == samp2  # deterministic
    hist = d.agg(ch_agg("histogram", 4, F.col("x")).alias("h")).collect()[0][0]
    assert len(hist) == 4


def test_sparkpartition_exact_biginteger_semantics(spark):
    """Replicates hiveIntHash.cpp's UNBOUNDED BigInteger mix by hand for a
    few values — the multiplies must NOT wrap to 64 bits."""
    K0, K1 = 18397679294719823053, 14181476777654086739

    def ref(x, n):
        x ^= x >> 33
        x *= K0
        x ^= x >> 33
        x *= K1
        x ^= x >> 33
        return abs(x % n)

    d = spark.createDataFrame([(1,), (123456789,), (2**40 + 7,)], "v long")
    got = [r[0] for r in d.select(ch("sparkpartition", F.col("v"), 32)
                                  .alias("b")).collect()]
    assert got == [ref(1, 32), ref(123456789, 32), ref(2**40 + 7, 32)]
    assert all(0 <= b < 32 for b in got)


def test_batch8_scalars(spark):
    d = spark.range(1)

    def one(col):
        return d.select(col.alias("v")).collect()[0][0]

    got = one(ch("extractAllGroups", F.lit("a1 b2 c3"), r"([a-z])(\d)")
              .cast("string"))
    assert got == "[[a, b, c], [1, 2, 3]]"
    # reference separator rules: last printed unit joins with " and "
    # (formatReadableTimeDelta.cpp processUnit; 01511 golden)
    assert one(ch("formatReadableTimeDelta", F.lit(3723))) == \
        "1 hour, 2 minutes and 3 seconds"
    assert one(ch("formatReadableTimeDelta", F.lit(0))) == "0 seconds"
    assert one(ch("formatReadableTimeDelta", F.lit(14256000.0))) == \
        "5 months, 12 days and 12 hours"
    assert one(ch("pointInEllipses", F.lit(0.5), F.lit(0.0),
                  0.0, 0.0, 1.0, 1.0)) == 1
    assert one(ch("pointInEllipses", F.lit(2.0), F.lit(0.0),
                  0.0, 0.0, 1.0, 1.0)) == 0
    merged = one(ch("jsonMergePatch", F.lit('{"a":1,"b":{"x":1}}'),
                    F.lit('{"b":{"y":2},"a":null}')))
    import json
    assert json.loads(merged) == {"b": {"x": 1, "y": 2}}
