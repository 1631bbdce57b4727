"""Round-7 parity batch (functions/registry_ext7.py): Spark-dialect and
MySQL aliases, unicode normal forms, unicodeToUTF8 prefix semantics, the
Porter stemmer, NLP heuristics, URL tail, and the new aggregates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from byconity_spark.functions import ch, ch_agg


def _val(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


# ------------------------------------------------------------- aliases

def test_spark_dialect_aliases(spark):
    arr = F.array(F.lit(3), F.lit(1), F.lit(3), F.lit(2))
    assert sorted(_val(spark, ch("array_distinct", arr))) == [1, 2, 3]
    assert _val(spark, ch("array_max", arr)) == 3
    assert _val(spark, ch("array_min", arr)) == 1
    assert _val(spark, ch("array_position", arr, F.lit(2))) == 4
    assert _val(spark, ch("array_join", arr, "|")) == "3|1|3|2"
    assert _val(spark, ch("concat_ws", "-", F.lit("a"), F.lit("b"))) == "a-b"
    assert _val(spark, ch("lpad", F.lit("7"), 3, "0")) == "007"
    assert _val(spark, ch("rpad", F.lit("7"), 3, "0")) == "700"
    assert _val(spark, ch("slice", arr, 2, 2)) == [1, 3]
    assert _val(spark, ch("size", arr)) == 4
    assert _val(spark, ch("flatten",
                          F.array(F.array(F.lit(1)), F.array(F.lit(2))))) \
        == [1, 2]
    assert _val(spark, ch("oct", F.lit(8))) == "10"
    assert _val(spark, ch("ord", F.lit("A"))) == 65
    assert _val(spark, ch("hmod", F.lit(-7), F.lit(3))) == 2
    m = _val(spark, ch("split_to_map", F.lit("a:1,b:2"), ",", ":"))
    assert m == {"a": "1", "b": "2"}
    assert len(_val(spark, ch("shuffle", arr))) == 4


def test_mysql_wrappers(spark):
    ts = F.lit("2024-03-05 14:30:45").cast("timestamp")
    assert _val(spark, ch("YEAR", ts)) == 2024
    assert _val(spark, ch("QUARTER", ts)) == 1
    assert _val(spark, ch("DAY", ts)) == 5
    assert _val(spark, ch("HOUR", ts)) == 14
    assert _val(spark, ch("CHAR_LENGTH", F.lit("héllo"))) == 5
    assert _val(spark, ch("insert", F.lit("Quadratic"), F.lit(3), F.lit(4),
                          F.lit("What"))) == "QuWhattic"
    assert _val(spark, ch("is_uuid",
                          F.lit("123e4567-e89b-12d3-a456-426614174000")))
    assert not _val(spark, ch("is_uuid", F.lit("nope")))
    assert str(_val(spark, ch("DATE", ts))) == "2024-03-05"


def test_date_tail(spark):
    assert str(_val(spark, ch("makeDate", F.lit(2024), F.lit(2),
                              F.lit(29)))) == "2024-02-29"
    mdt = _val(spark, ch("makeDateTime", F.lit(2024), F.lit(2), F.lit(29),
                         F.lit(13), F.lit(7), F.lit(9)))
    assert (mdt.hour, mdt.minute, mdt.second) == (13, 7, 9)
    ts = F.lit("2024-03-05 14:30:45").cast("timestamp")
    r = _val(spark, ch("subtractHours", ts, 3))
    assert (r.hour, r.minute) == (11, 30)  # timestamp stays timestamp
    t = _val(spark, ch("toTime", ts))
    assert (t.year, t.month, t.day, t.hour) == (1970, 1, 2, 14)
    assert _val(spark, ch("fromUnixTimestampInJodaSyntax",
                          F.lit(0), "yyyy-MM-dd")) == "1970-01-01"


def test_bits_and_misc(spark):
    assert _val(spark, ch("bit_count", F.lit(255))) == 8
    rot = _val(spark, ch("bitRotateRight", F.lit(1), F.lit(1)))
    assert rot == -(1 << 63)  # bit 0 rotates into bit 63 (signed pattern)
    assert _val(spark, ch("bitRotateRight", F.lit(256), F.lit(8))) == 1
    assert _val(spark, ch("unbin", F.lit("0100000101000010"))) == "AB"
    assert _val(spark, ch("log_with_base", 2, F.lit(8.0))) == \
        pytest.approx(3.0)
    assert _val(spark, ch("parseTimeDelta", F.lit("1h 30m"))) == 5400.0
    assert _val(spark, ch("parseTimeDelta", F.lit("2 days"))) == 172800.0
    assert _val(spark, ch("isZeroOrNull", F.lit(0)))
    assert _val(spark, ch("isZeroOrNull", F.lit(None).cast("int")))
    assert not _val(spark, ch("isZeroOrNull", F.lit(3)))
    assert _val(spark, ch("toTypeName", F.lit(1).cast("bigint"))) == "Int64"
    assert _val(spark, ch("toTypeName", F.lit("x"))) == "String"
    frd = _val(spark, ch("formatReadableDecimalSize", F.lit(1500000)))
    assert frd == "1.50 MB"
    assert _val(spark, ch("materialize", F.lit(42))) == 42


def test_url_tail(spark):
    u = F.lit("https://user@www.example.com:8080/p/a?x=1&y=2#frag")
    assert _val(spark, ch("netloc", u)) == "user@www.example.com:8080"
    assert _val(spark, ch("cutWWW", u)) == \
        "https://user@example.com:8080/p/a?x=1&y=2#frag"
    assert _val(spark, ch("extractURLParameters", u)) == ["x=1", "y=2"]
    assert _val(spark, ch("extractURLParameterNames", u)) == ["x", "y"]
    assert _val(spark, ch("extractURLParameters", F.lit("http://a.b/c"))) \
        == []


# ------------------------------------------------------------- unicode

def test_unicode_normal_forms(spark):
    composed = "é"            # U+00E9
    decomposed = "é"    # e + combining acute
    assert _val(spark, ch("normalizeUTF8NFC", F.lit(decomposed))) == composed
    assert _val(spark, ch("normalizeUTF8NFD", F.lit(composed))) == decomposed
    assert _val(spark, ch("normalizeUTF8NFKC", F.lit("ﬁ"))) == "fi"


def test_unicode_to_utf8(spark):
    # unicodeToUTF8.cpp examples, verbatim
    assert _val(spark, ch("unicodeToUTF8",
                          F.lit(r"中文"))) == "中文"
    assert _val(spark, ch("unicodeToUTF8",
                          F.lit(r"中文test"))) == "中文test"
    assert _val(spark, ch("unicodeToUTF8",
                          F.lit(r"test中文"))) == r"test中文"
    assert _val(spark, ch("unicodeToUTF8All",
                          F.lit(r"test中文"))) == "test中文"


def test_convert_charset(spark):
    assert _val(spark, ch("convertCharset", F.lit("héllo"), "utf-8",
                          "latin-1")) == "héllo"
    with pytest.raises(Exception):
        ch("convertCharset", F.lit("x"), "utf-8", "no-such-charset")


# ----------------------------------------------------------------- NLP

def test_porter_stem(spark):
    df = spark.createDataFrame(
        [("caresses",), ("ponies",), ("running",), ("relational",),
         ("rational",), ("happiness",), ("adjustable",), ("cats",)],
        "w string",
    )
    got = {r["w"]: r["s"] for r in
           df.select("w", ch("stem", "en", F.col("w")).alias("s")).collect()}
    # canonical Porter-1980 fixtures
    assert got["caresses"] == "caress"
    assert got["ponies"] == "poni"
    assert got["running"] == "run"
    assert got["relational"] == "relat"
    assert got["rational"] == "ration"
    assert got["cats"] == "cat"


def test_nlp_heuristics(spark):
    assert _val(spark, ch("detectCharset", F.lit("plain"))) == "US-ASCII"
    assert _val(spark, ch("detectCharset", F.lit("héllo"))) == "UTF-8"
    assert _val(spark, ch("detectLanguage", F.lit(
        "the cat and the dog in a house"))) == "en"
    assert _val(spark, ch("detectLanguage", F.lit("zzz qqq"))) == "un"
    assert _val(spark, ch("detectLanguageUnknown", F.lit("zzz"))) == "un"
    mix = _val(spark, ch("detectLanguageMixed", F.lit(
        "the cat and el perro de la casa")))
    assert mix["en"] > 0 and mix["es"] > 0
    assert _val(spark, ch("detectTonality", F.lit(
        "this is a great wonderful happy thing"))) > 0
    assert _val(spark, ch("detectTonality", F.lit(
        "terrible awful bad broken"))) < 0
    assert _val(spark, ch("detectProgrammingLanguage", F.lit(
        "def foo():\n    import os\n    print(x)"))) == "python"
    assert _val(spark, ch("detectProgrammingLanguage", F.lit(
        "SELECT a FROM t WHERE b GROUP BY c"))) == "sql"
    with pytest.raises(Exception, match="dictionaries"):
        ch("lemmatize", "en", F.lit("x"))
    with pytest.raises(Exception, match="dictionaries"):
        ch("synonyms", "en", F.lit("x"))


# ------------------------------------------------------------ aggregates

def test_sum_metric(spark):
    df = spark.createDataFrame(
        [(10, 3, 1), (20, 4, 0), (5, 1, 1)], "dur int, depth int, jmp int"
    )
    r = df.agg(ch_agg("sumMetric", F.col("dur"), F.col("depth"),
                      F.col("jmp")).alias("m")).collect()[0]["m"]
    assert (r["session_cnt"], r["total_dur"], r["total_depth"],
            r["total_jump"]) == (3, 35, 8, 2)


def test_delta_sum(spark):
    df = spark.createDataFrame([(1, 1.0), (1, 3.0), (1, 2.0), (1, 5.0)],
                               "g int, v double").coalesce(1)
    r = df.groupBy("g").agg(
        ch_agg("deltaSum", F.col("v")).alias("d")).collect()[0]["d"]
    assert r == pytest.approx(5.0)  # (3-1) + (5-2)


def test_agg_throw(spark):
    with pytest.raises(Exception, match="thrown exception successfully"):
        ch_agg("aggThrow", F.lit(1.0))


def test_group_array_insert_at(spark):
    df = spark.createDataFrame(
        [(1, "a", 0), (1, "c", 2), (1, "e", 4)], "g int, v string, p int"
    )
    agg = ch_agg("groupArrayInsertAt", "-", 5)(F.col("v"), F.col("p"))
    r = df.groupBy("g").agg(agg.alias("a")).collect()[0]["a"]
    assert r == ["a", "-", "c", "-", "e"]


def test_v2_bitmap_aliases():
    from byconity_spark.functions.registry import AGG

    for name in ("BitmapCountV2", "BitmapExtractV2"):
        base = name[:-2]
        if base in AGG:
            assert name in AGG


# ------------------------------------------------- second-pass additions

def test_ipv6_cidr_and_cut(spark):
    ip = ch("IPv6StringToNum", F.lit("2001:db8::1"))
    r = _val(spark, ch("IPv6CIDRToRange", ip, 32))
    import ipaddress
    lo = ipaddress.IPv6Address(bytes(r["lower"]))
    hi = ipaddress.IPv6Address(bytes(r["upper"]))
    assert str(lo) == "2001:db8::"
    assert str(hi) == "2001:db8:ffff:ffff:ffff:ffff:ffff:ffff"
    cut = _val(spark, ch("cutIPv6", ip, 10, 0))
    assert cut == "2001:db8::"


def test_try_base58(spark):
    enc = _val(spark, ch("base58Encode", F.lit("hello")))
    assert _val(spark, ch("tryBase58Decode", F.lit(enc))) == "hello"
    assert _val(spark, ch("tryBase58Decode", F.lit("0OIl"))) is None


def test_typed_defaults_and_empty_array(spark):
    assert _val(spark, ch("defaultValueOfTypeName", "Int64")) == 0
    assert _val(spark, ch("defaultValueOfTypeName", "String")) == ""
    assert _val(spark, ch("defaultValueOfTypeName", "Nullable(Int64)")) is None
    one = _val(spark, ch("emptyArrayToSingle",
                         F.array().cast("array<int>")))
    assert len(one) == 1  # [NULL] — documented deviation from CH's [0]
    keep = _val(spark, ch("emptyArrayToSingle", F.array(F.lit(7))))
    assert keep == [7]


def test_running_forms(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, 5.0), (3, 7.0)], "o int, v double")
    rows = df.select(
        "o",
        ch("runningAccumulate", F.col("v"), F.col("o")).alias("acc"),
        ch("runningDifferenceStartingWithFirstValue", F.col("v"),
           F.col("o")).alias("dstart"),
    ).orderBy("o").collect()
    assert [r["acc"] for r in rows] == [10.0, 15.0, 22.0]
    assert [r["dstart"] for r in rows] == [10.0, -5.0, 2.0]


def test_bitmap_build_roundtrip(spark):
    bm = ch("bitmapBuild", F.array(F.lit(3), F.lit(1), F.lit(3)))
    assert sorted(_val(spark, ch("bitmapToArray", bm))) == [1, 3]
    assert _val(spark, ch("bitmapCardinality", bm)) == 2
    assert _val(spark, ch("bitmapCardinality",
                          ch("arrayToBitmap",
                             F.array().cast("array<long>")))) == 0


def test_bitmap_expression_with_date(spark):
    from byconity_spark.udafs.bitmaps import (
        bitmap_expression_with_date,
        group_bitmap,
    )

    df = spark.createDataFrame(
        [(20240101, "a", 1), (20240101, "a", 2), (20240101, "b", 2),
         (20240102, "a", 3)],
        "p_date int, tag string, uid long",
    )
    states = group_bitmap(df, ["p_date", "tag"], "uid")
    out = bitmap_expression_with_date(
        states, "20240101_a & 20240101_b").collect()[0]
    assert out["cardinality"] == 1
    out2 = bitmap_expression_with_date(
        states, "20240101_a | 20240102_a").collect()[0]
    assert out2["cardinality"] == 3


def test_region_unknown_id(spark):
    from byconity_spark.operators.geobase import (
        region_to_population,
        region_to_type,
    )

    regions = spark.createDataFrame(
        [(1, 0, 1, 0), (2, 1, 3, 50)],
        "id long, parent_id long, type int, population long",
    )
    df = spark.createDataFrame([(2,), (99,)], "k long")
    rows = {r["k"]: r for r in
            region_to_type(df, regions, "k", "continent", out_col="cont")
            .collect()}
    assert rows[2]["cont"] == 1
    assert rows[99]["cont"] == 0  # unknown region -> 0, like the reference
