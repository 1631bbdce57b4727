"""Unit tests for the round-5 pipeline operators: PII redaction, TF-IDF,
hash sampling, contamination screening, int8 quantization, IPv6/base58
codecs, and the frame-respecting lag/lead windows."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from byconity_spark.functions import ch
from byconity_spark.functions.registry import (
    _b58_decode_str,
    _b58_encode_bytes,
)
from tests.conftest import SF_DIR


# --------------------------------------------------------------- base58
def test_base58_known_vectors():
    # public reference vectors (Bitcoin alphabet)
    assert _b58_encode_bytes(b"Hello World!") == "2NEpo7TZRRrLZSi2U"
    assert _b58_encode_bytes(b"") == ""
    assert _b58_encode_bytes(b"\x00") == "1"
    assert _b58_encode_bytes(b"\x00\x01") == "12"
    for payload in [b"Hello World!", b"\x00\x00abc", b"\xff\xfe", b"x"]:
        assert _b58_decode_str(_b58_encode_bytes(payload)) == payload


def test_base58_column(spark):
    df = spark.createDataFrame([("Hello World!",)], "s string")
    out = df.select(
        ch("base58Encode", F.col("s")).alias("e")
    ).collect()[0]
    assert out.e == "2NEpo7TZRRrLZSi2U"


# ----------------------------------------------------------------- IPv6
def test_ipv6_canonicalization(spark):
    df = spark.createDataFrame(
        [("2001:0db8:0000:0000:0000:0000:0000:0001",), ("::ffff:1.2.3.4",)],
        "s string",
    )
    rows = df.select(
        ch("IPv6NumToString", ch("IPv6StringToNum", F.col("s"))).alias("c"),
        ch("isIPv6String", F.col("s")).alias("ok"),
        ch("isIPv6String", F.lit("2001::db8::1")).alias("bad"),
    ).collect()
    assert rows[0].c == "2001:db8::1"
    assert all(r.ok for r in rows)
    assert not any(r.bad for r in rows)


# ----------------------------------------------------------- PII redaction
def test_pii_redact_counts(spark):
    from byconity_spark.llm.text import pii_redact

    df = spark.createDataFrame(
        [
            (1, "mail a@b.org and c.d@e.co.uk from 10.0.0.1 tel +155 555 0100"),
            (2, "clean text with no pii at all"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in pii_redact(df).collect()}
    assert out[1].n_emails == 2 and out[1].n_ipv4s == 1 and out[1].n_phones == 1
    assert "<EMAIL>" in out[1].redacted and "<IP>" in out[1].redacted
    assert "<PHONE>" in out[1].redacted
    assert "@" not in out[1].redacted
    assert out[2].n_emails == 0 and out[2].redacted == df.collect()[1].text


# ----------------------------------------------------------------- TF-IDF
def test_tfidf_ranks_discriminative_terms(spark):
    from byconity_spark.llm.text import tfidf_top_terms

    df = spark.createDataFrame(
        [
            (1, "common common common zebra zebra unique1"),
            (2, "common common giraffe giraffe unique2"),
            (3, "common common llama llama unique3"),
        ],
        "doc_id long, text string",
    )
    out = tfidf_top_terms(df, top_k=1, min_len=4)
    top = {r.doc_id: r.term for r in out.collect()}
    # 'common' appears everywhere (idf = 0) -> the doc-specific repeated
    # term must win
    assert top == {1: "zebra", 2: "giraffe", 3: "llama"}


# ------------------------------------------------------------- sampling
def test_hash_sample_deterministic_and_unbiased(spark):
    from byconity_spark.engine.catalog import load_table
    from byconity_spark.llm.text import hash_sample

    docs = load_table(spark, SF_DIR, "documents")
    n = docs.count()
    a = hash_sample(docs, rate_pct=20).collect()
    b = hash_sample(docs, rate_pct=20).collect()
    assert sorted(r.doc_id for r in a) == sorted(r.doc_id for r in b)
    # 20% +- generous binomial slack
    assert 0.10 * n <= len(a) <= 0.30 * n
    assert all(r.bucket < 20 for r in a)


# -------------------------------------------------------- contamination
def test_contamination_flags_planted_overlap(spark):
    from byconity_spark.llm.text import contamination_screen

    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta eta theta iota kappa")],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [
            # contains the benchmark 8-gram run
            (1, "x alpha beta gamma delta epsilon zeta eta theta y"),
            (2, "totally different words with no overlap whatsoever here now"),
        ],
        "doc_id long, text string",
    )
    out = contamination_screen(docs, bench, n=8).collect()
    assert [(r.doc_id, r.bench_id) for r in out] == [(1, 100)]
    assert out[0].shared_grams == 1


# ----------------------------------------------------- int8 quantization
def test_quantize_int8_bounds(spark):
    from byconity_spark.engine.catalog import load_table
    from byconity_spark.llm.similarity import quantize_int8

    emb = load_table(spark, SF_DIR, "embeddings").limit(50)
    rows = quantize_int8(emb).collect()
    assert len(rows) == 50
    for r in rows:
        qs = [int(x) for x in r.q_vec.split("|")]
        assert all(-127 <= q <= 127 for q in qs)
        # per-element error <= scale/2 -> mse_ppm <= (scale/2)^2 * 1e6
        assert r.recon_mse_ppm <= (r.scale / 2) ** 2 * 1e6 * 1.001 + 1e-9


# ------------------------------------------------- frame-respecting lag
def test_lag_in_frame_clips_to_frame(spark):
    from byconity_spark.operators.windows import lag_in_frame, lead_in_frame

    df = spark.createDataFrame(
        [(1, i, float(10 * i)) for i in range(5)],
        "g long, seq long, v double",
    )
    out = df.select(
        "seq",
        lag_in_frame("v", 1, ["g"], ["seq"], preceding=1).alias("lag1"),
        lag_in_frame("v", 2, ["g"], ["seq"], preceding=1).alias("lag2_clipped"),
        lead_in_frame("v", 1, ["g"], ["seq"], following=1).alias("lead1"),
        lead_in_frame("v", 2, ["g"], ["seq"], following=1).alias("lead2_clipped"),
    ).orderBy("seq").collect()
    assert [r.lag1 for r in out] == [None, 0.0, 10.0, 20.0, 30.0]
    # offset 2 never fits in a 1-PRECEDING frame
    assert all(r.lag2_clipped is None for r in out)
    assert [r.lead1 for r in out] == [10.0, 20.0, 30.0, 40.0, None]
    assert all(r.lead2_clipped is None for r in out)


# ------------------------------------------------- round-5 registry names
def test_moment_aggregates_known_values(spark):
    import math

    df = spark.createDataFrame([(float(v),) for v in [1, 2, 2, 3, 7]], "v double")
    row = df.agg(
        ch("skewPop", F.col("v")).alias("sp"),
        ch("skewSamp", F.col("v")).alias("ss"),
        ch("kurtPop", F.col("v")).alias("kp"),
        ch("kurtSamp", F.col("v")).alias("ks"),
    ).collect()[0]
    vals = [1, 2, 2, 3, 7]
    n = len(vals)
    mean = sum(vals) / n
    m2 = sum((x - mean) ** 2 for x in vals) / n
    m3 = sum((x - mean) ** 3 for x in vals) / n
    m4 = sum((x - mean) ** 4 for x in vals) / n
    sv = n / (n - 1) * m2
    assert math.isclose(row.sp, m3 / m2**1.5, rel_tol=1e-9)
    assert math.isclose(row.ss, m3 / sv**1.5, rel_tol=1e-9)
    assert math.isclose(row.kp, m4 / m2**2, rel_tol=1e-9)
    assert math.isclose(row.ks, m4 / sv**2, rel_tol=1e-9)


def test_string_distances(spark):
    df = spark.createDataFrame(
        [("kitten", "sitting"), ("abcde", "abcde"), ("abc", "abd")],
        "a string, b string",
    )
    rows = df.select(
        ch("editDistance", F.col("a"), F.col("b")).alias("lev"),
        ch("byteHammingDistance", F.col("a"), F.col("b")).alias("ham"),
        F.round(ch("jaroWinklerSimilarity", F.col("a"), F.col("b")), 6).alias("jw"),
        F.round(ch("stringJaccardIndex", F.col("a"), F.col("b")), 6).alias("jac"),
    ).collect()
    assert rows[0].lev == 3          # kitten -> sitting
    assert rows[1].lev == 0 and rows[1].jw == 1.0 and rows[1].jac == 1.0
    # hamming: abc vs abd differs in 1 position, equal length
    assert rows[2].ham == 1
    # kitten/sitting: common length 6, 2 mismatches + 1 length delta
    assert rows[0].ham == 3


def test_conversion_or_variants(spark):
    df = spark.createDataFrame([("42", "bad")], "good string, bad string")
    row = df.select(
        ch("toInt64OrNull", F.col("good")).alias("a"),
        ch("toInt64OrNull", F.col("bad")).alias("b"),
        ch("toFloat64OrZero", F.col("bad")).alias("c"),
        ch("toDateOrNull", F.lit("2024-02-29")).alias("d"),
        ch("toDateOrNull", F.lit("2023-02-29")).alias("e"),
    ).collect()[0]
    assert row.a == 42 and row.b is None and row.c == 0.0
    assert str(row.d) == "2024-02-29" and row.e is None


def test_first_significant_subdomain(spark):
    df = spark.createDataFrame(
        [
            ("https://news.example.co.uk/path",),
            ("https://www.example.com/x",),
            ("http://localhost/",),
        ],
        "u string",
    )
    rows = df.select(
        ch("firstSignificantSubdomain", F.col("u")).alias("fsd"),
        ch("cutToFirstSignificantSubdomain", F.col("u")).alias("cut"),
        ch("domainWithoutWWW", F.col("u")).alias("nw"),
    ).collect()
    assert rows[0].fsd == "example" and rows[0].cut == "example.co.uk"
    assert rows[1].fsd == "example" and rows[1].cut == "example.com"
    assert rows[1].nw == "example.com"
    assert rows[2].fsd == "localhost" and rows[2].cut == "localhost"


def test_json_tail_functions(spark):
    df = spark.createDataFrame(
        [('{"a": 5, "b": "x", "c": [1,2], "d": {"e": 1}, "f": 2.5, "g": true}',),
         ("not json",)],
        "j string",
    )
    rows = df.select(
        ch("JSONType", F.col("j"), "a").alias("ta"),
        ch("JSONType", F.col("j"), "b").alias("tb"),
        ch("JSONType", F.col("j"), "c").alias("tc"),
        ch("JSONType", F.col("j"), "d").alias("td"),
        ch("JSONType", F.col("j"), "f").alias("tf"),
        ch("JSONType", F.col("j"), "g").alias("tg"),
        ch("isValidJSON", F.col("j")).alias("ok"),
        ch("simpleJSONExtractInt", F.col("j"), "a").alias("ia"),
        ch("visitParamHas", F.col("j"), "b").alias("hb"),
        ch("toJSONString", F.struct(F.lit(1).alias("x"))).alias("tj"),
    ).collect()
    good, bad = rows
    assert (good.ta, good.tb, good.tc, good.td, good.tf, good.tg) == (
        "Int64", "String", "Array", "Object", "Double", "Bool"
    )
    assert good.ok and good.ia == 5 and good.hb and good.tj == '{"x":1}'
    assert not bad.ok and bad.ia is None and not bad.hb


def test_parity_sweep_vectors(spark):
    """Spot-check the round-5 exact-name parity batch."""
    df = spark.createDataFrame(
        [("2024-03-15 10:30:45.123456", "Hello World hello", "-7")],
        "ts string, s string, istr string",
    ).withColumn("t", F.col("ts").cast("timestamp"))
    r = df.select(
        ch("toInt16OrNull", F.col("istr")).alias("i16"),
        ch("toInt64OrDefault", F.lit("x"), 9).alias("dflt"),
        ch("multiSearchAny", F.col("s"), ["xyz", "World"]).alias("msa"),
        ch("multiSearchFirstIndex", F.col("s"), ["xyz", "World", "Hello"]).alias("msi"),
        ch("multiSearchFirstPosition", F.col("s"), ["World", "Hello"]).alias("msp"),
        ch("SHA1", F.lit("abc")).alias("sha1"),
        ch("factorial", F.lit(5)).alias("fact"),
        ch("countDigits", F.lit(-1234)).alias("cd"),
        ch("dayname", F.col("t")).alias("dn"),
        ch("addMilliseconds", F.col("t"), 500).alias("ams"),
        ch("toStartOfMillisecond", F.col("t")).alias("tsm"),
        ch("toStartOfISOYear", F.lit("2021-01-01").cast("date")).alias("isoy"),
        ch("countMatches", F.col("s"), "l+").alias("cm"),
        ch("encodeXMLComponent", F.lit('a<b>&"c"')).alias("xml"),
        ch("decodeXMLComponent", F.lit("a&lt;b&gt;&amp;")).alias("unxml"),
        ch("L2SquaredNorm", F.array(F.lit(3.0), F.lit(4.0))).alias("l2sq"),
        ch("LpNorm", F.array(F.lit(3.0), F.lit(4.0)), 2).alias("lp2"),
        ch("bitTestAny", F.lit(5), 1, 2).alias("bta"),
        ch("bitPositionsToArray", F.lit(5)).alias("bpa"),
    ).collect()[0]
    assert r.i16 == -7 and r.dflt == 9
    assert r.msa and r.msi == 2 and r.msp == 1
    assert r.sha1 == "a9993e364706816aba3e25717850c26c9cd0d89d"
    assert r.fact == 120 and r.cd == 4
    assert r.dn == "Friday"
    assert r.ams.microsecond == 623456
    assert r.tsm.microsecond == 123000
    assert str(r.isoy) == "2019-12-30"  # ISO year 2020 starts Mon 2019-12-30
    assert r.cm == 3
    assert r.xml == "a&lt;b&gt;&amp;&quot;c&quot;" and r.unxml == 'a<b>&'
    assert r.l2sq == 25.0 and r.lp2 == 5.0
    assert r.bta and r.bpa == [0, 2]


def test_aes_and_mysql_compat(spark):
    df = spark.createDataFrame(
        [("secret data", '{"a": 2.5, "b": true}',
          "<html><script>x=1</script><p>Hello <b>World</b></p></html>")],
        "s string, j string, h string",
    )
    enc = ch("encrypt", "aes-128-ecb", F.col("s"), "0123456789abcdef")
    r = df.select(
        ch("decrypt", "aes-128-ecb", enc, "0123456789abcdef").alias("rt"),
        ch("tryDecrypt", "aes-128-ecb", enc, "WRONGKEYWRONGKEY").alias("bad"),
        ch("simpleJSONExtractFloat", F.col("j"), "a").alias("f"),
        ch("simpleJSONExtractBool", F.col("j"), "b").alias("b"),
        ch("ELT", 2, F.lit("x"), F.lit("y"), F.lit("z")).alias("elt"),
        ch("field", F.lit("y"), F.lit("x"), F.lit("y")).alias("fld"),
        ch("extractTextFromHTML", F.col("h")).alias("txt"),
    ).collect()[0]
    assert r.rt == "secret data" and r.bad is None
    assert r.f == 2.5 and r.b is True
    assert r.elt == "y" and r.fld == 2
    assert r.txt == "Hello World"


def test_bigint_and_mysql_compat(spark):
    from decimal import Decimal

    r = spark.range(1).select(
        ch("toInt128", F.lit("123456789012345678901234567890")).alias("i128"),
        ch("toUInt256OrNull", F.lit("bad")).alias("nul"),
        ch("toInt128OrZero", F.lit("x")).alias("z"),
        ch("makedate", 2024, 75).alias("md"),
        ch("DATE_FORMAT_MYSQL", F.lit("2024-03-15").cast("date"), "%Y/%m/%d").alias("dfm"),
        ch("export_set", 5, "Y", "N", ",", 4).alias("es"),
    ).collect()[0]
    assert r.i128 == Decimal("123456789012345678901234567890")
    assert r.nul is None and r.z == Decimal(0)
    assert str(r.md) == "2024-03-15"
    assert r.dfm == "2024/03/15"
    assert r.es == "Y,N,Y,N"
