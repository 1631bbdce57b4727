"""Round-7 second-pass parity batch (functions/registry_ext7b.py):
sharding math, ByteMap name helpers, partitionId, MySQL globals/AES,
errorCodeToName, array-set probes, topoFindDown, bitSlice, hashid, MD4,
exact bayesAB, restricted multiFuzzyMatch*, text-search query pair."""

from __future__ import annotations

import json
import math
import os

import pytest
from pyspark.sql import functions as F

from byconity_spark.functions import ch
from byconity_spark.functions.registry_ext7b import (
    _bit_slice_py,
    _hashids_encode,
    _HASHID_ALPHABET,
    _md4_bytes,
    _mysql_fold_key,
    _prob_beta_beats,
    _prob_gamma_less,
    _ts_parse,
    _ts_render,
)


def _val(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


# ---------------------------------------------------------- sharding math

def test_hash_range(spark):
    # hashRange.cpp: (id % slots) / ceil(slots / shards)
    assert _val(spark, ch("hashRange", F.lit(37), 10, 3)) == 1  # 7 // 4
    assert _val(spark, ch("hashRange", F.lit(99), 10, 3)) == 2  # 9 // 4
    assert _val(spark, ch("hashRange", F.lit(3), 10, 3)) == 0


def test_bucket(spark):
    assert _val(spark, ch("bucket", F.lit(37), 8)) == 5
    # with range: split 16 -> ratio 4; (37 % 16) // 4 = 1
    assert _val(spark, ch("bucket", F.lit(37), 4, 1, 16)) == 1
    # clamp to last bucket
    assert _val(spark, ch("bucket", F.lit(15), 2, 1, 4)) == 1


def test_bucket_bounds_search(spark):
    bounds = F.array(F.lit(10), F.lit(20), F.lit(30))
    assert _val(spark, ch("bucket_bounds_search", bounds, F.lit(25))) == 2
    assert _val(spark, ch("bucket_bounds_search", bounds, F.lit(5))) == 0
    assert _val(spark, ch("bucket_bounds_search", bounds, F.lit(30))) == 3


# ------------------------------------------------------- ByteMap helpers

def test_extract_map_column_key(spark):
    assert _val(spark, ch("extractMapColumn", F.lit("__col__'k1'.bin"))) \
        == "col"
    assert _val(spark, ch("extractMapKey", F.lit("__col__'k1'.bin"))) == "k1"
    assert _val(spark, ch("extractMapColumn", F.lit("__m__123.bin"))) == "m"
    assert _val(spark, ch("extractMapKey", F.lit("__m__123.bin"))) == "123"
    assert _val(spark, ch("extractMapColumn", F.lit("short"))) == ""
    assert _val(spark, ch("extractMapKey", F.lit("nope.bin"))) == ""


def test_partition_id(spark):
    import datetime

    assert _val(spark, ch("partitionId", F.lit(20240101))) == "20240101"
    assert _val(spark, ch("partitionId", F.lit(1), F.lit(2))) == "1-2"
    assert _val(
        spark, ch("partitionId", F.lit(datetime.date(2024, 3, 7)))
    ) == "20240307"
    # non-integral -> 32-hex hash path (documented md5 stand-in)
    got = _val(spark, ch("partitionId", F.lit("abc")))
    assert len(got) == 32 and all(c in "0123456789abcdef" for c in got)


# ------------------------------------------------------------- MySQL-isms

def test_global_variable(spark):
    assert _val(spark, ch("globalVariable", "version")) == "5.7.0"
    assert _val(spark, ch("globalVariable", "wait_timeout")) == 28800
    assert _val(spark, ch("globalVariable", "no_such_thing")) == 0


def test_mysql_interval(spark):
    # MySQL docs: INTERVAL(23, 1, 15, 17, 30, 44, 200) = 3
    assert _val(
        spark, ch("interval", F.lit(23), 1, 15, 17, 30, 44, 200)
    ) == 3
    assert _val(spark, ch("interval", F.lit(10), 20, 30)) == 0
    assert _val(
        spark, ch("interval", F.lit(None).cast("int"), 20, 30)
    ) == -1


def test_mysql_key_fold():
    # key shorter than 16 bytes: zero-padded
    assert _mysql_fold_key("key", 16) == b"key" + bytes(13)
    # longer key XOR-wraps
    folded = _mysql_fold_key("0123456789abcdef0", 16)
    assert folded[0] == ord("0") ^ ord("0")
    assert folded[1] == ord("1")


def test_aes_mysql_roundtrip(spark):
    enc = ch("aes_encrypt_mysql", "aes-128-ecb", F.lit("secret"), "mykey")
    dec = ch("aes_decrypt_mysql", "aes-128-ecb", enc, "mykey")
    assert _val(spark, dec.cast("string")) == "secret"
    with pytest.raises(ValueError):
        ch("aes_encrypt_mysql", "aes-128-cbc", F.lit("x"), "k")


def test_error_code_to_name(spark):
    assert _val(spark, ch("errorCodeToName", F.lit(60))) == "UNKNOWN_TABLE"
    assert _val(spark, ch("errorCodeToName", F.lit(0))) == "OK"
    assert _val(spark, ch("errorCodeToName", F.lit(999999))) == ""


# -------------------------------------------------------- array-set probes

def test_array_set_probes(spark):
    arr = F.array(F.lit(1), F.lit(5), F.lit(3))
    sset = F.array(F.lit(3), F.lit(9))
    assert _val(spark, ch("arraySetCheck", arr, sset)) is True
    assert _val(
        spark, ch("arraySetCheck", arr, sset, arr, F.array(F.lit(99)))
    ) is False
    assert _val(spark, ch("arraySetGet", arr, sset)) == [3]
    assert _val(spark, ch("arraySetGetAny", arr, sset)) == 3
    assert _val(spark, ch("arraySetGetAny", arr, F.array(F.lit(99)))) is None


def test_array_reduce_in_ranges(spark):
    arr = F.array(*[F.lit(v) for v in [1, 2, 3, 4, 5]])
    ranges = F.array(
        F.array(F.lit(1), F.lit(2)), F.array(F.lit(2), F.lit(3))
    )
    assert _val(spark, ch("arrayReduceInRanges", "sum", ranges, arr)) \
        == [3.0, 9.0]
    assert _val(spark, ch("arrayReduceInRanges", "max", ranges, arr)) \
        == [2, 4]
    assert _val(spark, ch("arrayReduceInRanges", "count", ranges, arr)) \
        == [2, 3]


# ------------------------------------------------------------ topoFindDown

def _topo_reference(hits, levels):
    # direct transcription of the FunctionTopoFindDown.cpp double loop
    out, j, n = [], 0, len(hits)
    while j < n:
        hit_level = 0
        while j < n:
            if hits[j]:
                hit_level = levels[j]
                out.append(1)
                j += 1
                break
            out.append(0)
            j += 1
        while j < n:
            if levels[j] <= hit_level:
                break
            out.append(1)
            j += 1
    return out


@pytest.mark.parametrize(
    "hits,levels",
    [
        ([0, 1, 0, 0, 0, 1, 0], [1, 2, 3, 4, 2, 1, 5]),
        ([1, 0, 0], [1, 2, 3]),
        ([0, 0, 0], [5, 5, 5]),
        ([1, 1, 1], [3, 2, 1]),
        ([0, 1, 0, 1, 0], [2, 2, 2, 3, 4]),
    ],
)
def test_topo_find_down(spark, hits, levels):
    col = ch(
        "topoFindDown",
        F.array(*[F.lit(h) for h in hits]),
        F.array(*[F.lit(v) for v in levels]),
    )
    assert _val(spark, col) == _topo_reference(hits, levels)


# --------------------------------------------------------- conversion tail

def test_cast_and_intervals(spark):
    assert _val(spark, ch("CAST", F.lit("5"), "Int64")) == 5
    got = _val(
        spark,
        (F.lit("2024-01-31 10:00:00").cast("timestamp")
         + ch("toInterval", 2, "week")),
    )
    assert str(got).startswith("2024-02-14 10:00:00")
    got2 = _val(
        spark,
        ch(
            "addTupleOfIntervals",
            F.lit("2024-01-01 00:30:00").cast("timestamp"),
            "1 DAY", "2 HOUR",
        ),
    )
    assert str(got2).startswith("2024-01-02 02:30:00")
    got3 = _val(
        spark,
        ch(
            "subtractTupleOfIntervals",
            F.lit("2024-01-02 02:30:00").cast("timestamp"),
            "1 DAY", "2 HOUR",
        ),
    )
    assert str(got3).startswith("2024-01-01 00:30:00")
    assert _val(
        spark,
        ch("toTimeType", F.lit("2024-01-01 13:45:09").cast("timestamp")),
    ) == "13:45:09"


def test_tuple_to_name_value_pairs(spark):
    t = F.named_struct(
        F.lit("a"), F.lit(1), F.lit("b"), F.lit(2)
    )
    got = _val(spark, ch("tupleToNameValuePairs", t))
    assert [(r["key"], r["value"]) for r in got] == [("a", "1"), ("b", "2")]


# ------------------------------------------------------- filesystem / file

def test_filesystem_probes(spark):
    cap = _val(spark, ch("filesystemCapacity"))
    free = _val(spark, ch("filesystemFree"))
    avail = _val(spark, ch("filesystemAvailable"))
    assert cap >= free >= avail >= 0


def test_file_reads_user_files(spark, tmp_path):
    from byconity_spark.functions import registry_ext7b as mod

    old = mod.USER_FILES_PATH
    mod.USER_FILES_PATH = str(tmp_path)
    try:
        (tmp_path / "hello.txt").write_text("hi there")
        assert _val(spark, ch("file", "hello.txt")) == "hi there"
        with pytest.raises(ValueError):
            ch("file", "../escape.txt")
    finally:
        mod.USER_FILES_PATH = old


def test_log_trace(spark):
    assert _val(spark, ch("logTrace", F.lit("msg"))) == 0


# ---------------------------------------------------------------- bitSlice

def test_bit_slice_py_vectors():
    data = b"\xff\x00"
    assert _bit_slice_py(data, 1, 4) == b"\xf0"
    assert _bit_slice_py(data, 5, 8) == b"\xf0"
    assert _bit_slice_py(data, 1) == b"\xff\x00"
    assert _bit_slice_py(data, 9) == b"\x00"
    assert _bit_slice_py(data, -4) == b"\x00"
    assert _bit_slice_py(data, -12, 8) == b"\xf0"
    assert _bit_slice_py(data, 1, -2) == b"\xff\x00"  # 14 bits, zero-padded
    assert _bit_slice_py(data, 1, 0) == b""
    assert _bit_slice_py(data, -100) == b"\xff\x00"  # past-start clamp
    assert _bit_slice_py(b"\xab", 2, 4) == b"\x50"  # 0101 -> 0101_0000
    with pytest.raises(ValueError):
        _bit_slice_py(data, 0)


def test_bit_slice_spark(spark):
    got = _val(spark, ch("bitSlice", F.lit(b"\xff\x00"), F.lit(5), F.lit(8)))
    assert bytes(got) == b"\xf0"


# ------------------------------------------------------------------ hashid

def test_hashid_known_vector():
    # the published hashids.org example: salt 'this is my salt',
    # 12345 -> 'NkK9'
    assert _hashids_encode(12345, "this is my salt", 0, _HASHID_ALPHABET) \
        == "NkK9"


def test_hashid_spark(spark):
    got = _val(spark, ch("hashid", F.lit(12345), "this is my salt"))
    assert got == "NkK9"
    # min-length padding pads deterministically and keeps length
    padded = _val(
        spark, ch("hashid", F.lit(12345), "this is my salt", 8)
    )
    assert len(padded) == 8 and "NkK9" in padded


# --------------------------------------------------------------------- MD4

def test_md4_rfc_vectors():
    # RFC 1320 appendix test suite
    assert _md4_bytes(b"").hex() == "31d6cfe0d16ae931b73c59d7e0c089c0"
    assert _md4_bytes(b"a").hex() == "bde52cb31de33e46245e05fbdbd6fb24"
    assert _md4_bytes(b"abc").hex() == "a448017aaf21d8525fc10ae87aa6729d"
    assert _md4_bytes(b"message digest").hex() \
        == "d9130a8164549fe818874806e1c7014b"
    assert _md4_bytes(b"abcdefghijklmnopqrstuvwxyz").hex() \
        == "d79e1c308aa5bbcdeea8ed63df412da9"


def test_md4_spark(spark):
    assert _val(spark, ch("MD4", F.lit("abc"))) \
        == "a448017aaf21d8525fc10ae87aa6729d"


# ----------------------------------------------------------------- bayesAB

def _beta_beats_numeric(a1, b1, a2, b2):
    import numpy as np

    xs = np.linspace(1e-9, 1 - 1e-9, 40001)
    lpdf = (
        (a2 - 1) * np.log(xs)
        + (b2 - 1) * np.log1p(-xs)
        - (math.lgamma(a2) + math.lgamma(b2) - math.lgamma(a2 + b2))
    )
    pdf2 = np.exp(lpdf)
    cdf2 = np.concatenate(
        [[0.0], np.cumsum((pdf2[1:] + pdf2[:-1]) / 2 * np.diff(xs))]
    )
    lpdf1 = (
        (a1 - 1) * np.log(xs)
        + (b1 - 1) * np.log1p(-xs)
        - (math.lgamma(a1) + math.lgamma(b1) - math.lgamma(a1 + b1))
    )
    pdf1 = np.exp(lpdf1)
    integrand = pdf1 * cdf2
    return float(
        np.sum((integrand[1:] + integrand[:-1]) / 2 * np.diff(xs))
    )


def test_prob_beta_beats_matches_numeric():
    for (a1, b1, a2, b2) in [(6, 96, 11, 91), (3, 3, 2, 5), (21, 81, 16, 86)]:
        exact = _prob_beta_beats(a1, b1, a2, b2)
        num = _beta_beats_numeric(a1, b1, a2, b2)
        assert abs(exact - num) < 1e-4, (a1, b1, a2, b2, exact, num)


def test_prob_gamma_less_sanity():
    # same shape, bigger scale => stochastically larger => P(G1<G2) > 0.5
    assert _prob_gamma_less(5, 1.0, 5, 2.0) > 0.5
    assert abs(
        _prob_gamma_less(5, 1.0, 5, 1.0) - 0.5
    ) < 1e-12


def test_bayes_ab_output(spark):
    col = ch(
        "bayesAB", "beta", 1,
        ["control", "variant"], [100, 90], [10, 20],
    )
    payload = json.loads(_val(spark, col))
    rows = payload["data"]
    assert [r["variant_name"] for r in rows] == ["control", "variant"]
    assert rows[0]["beats_control"] == 0.0
    # variant converts 20/90 vs 10/100 -> clearly better
    assert rows[1]["beats_control"] > 0.9
    assert abs(rows[0]["to_be_best"] + rows[1]["to_be_best"] - 1.0) < 1e-6
    # lower-is-better flips the race
    col2 = ch(
        "bayesAB", "beta", 0,
        ["control", "variant"], [100, 90], [10, 20],
    )
    rows2 = json.loads(_val(spark, col2))["data"]
    assert abs(rows2[1]["beats_control"] - (1 - rows[1]["beats_control"])) \
        < 1e-9
    # gamma path runs and orders sensibly
    col3 = ch(
        "bayesAB", "gamma", 1,
        ["control", "variant"], [100, 100], [0.5, 0.6],
    )
    rows3 = json.loads(_val(spark, col3))["data"]
    assert 0.0 <= rows3[1]["beats_control"] <= 1.0


# -------------------------------------------------------- multiFuzzyMatch*

def test_multi_fuzzy_match(spark):
    hay = F.lit("hello world")
    assert _val(
        spark, ch("multiFuzzyMatchAny", hay, 1, ["wrld"])
    ) is True
    assert _val(
        spark, ch("multiFuzzyMatchAny", hay, 0, ["wrld"])
    ) is False
    assert _val(
        spark, ch("multiFuzzyMatchAnyIndex", hay, 1, ["zzz", "wrld"])
    ) == 2
    assert _val(
        spark,
        ch("multiFuzzyMatchAllIndices", hay, 2, ["wrld", "zzzzzz", "helo"]),
    ) == [1, 3]
    with pytest.raises(NotImplementedError):
        ch("multiFuzzyMatchAny", hay, 1, ["wo.ld"])


# ------------------------------------------------------------- text search

def test_ts_parse_render():
    assert _ts_render(_ts_parse("a & (b | !c)")) \
        == "AND(VAL(a), OR(VAL(b), NOT(VAL(c))))"
    assert _ts_render(_ts_parse("'big data' & spark")) \
        == "AND(VAL(big data), VAL(spark))"
    with pytest.raises(ValueError):
        _ts_parse("a & (b")


def test_text_search(spark):
    doc = F.lit("Apache Spark runs big data workloads")
    assert _val(spark, ch("textSearch", doc, "spark & 'big data'")) is True
    assert _val(spark, ch("textSearch", doc, "spark & !flink")) is True
    assert _val(spark, ch("textSearch", doc, "flink | presto")) is False
    assert _val(
        spark, ch("toTextSearchQuery", F.lit("a | b"))
    ) == "OR(VAL(a), VAL(b))"


# -------------------------------------- finalize/initializeAggregation

def test_initialize_finalize_uniq(spark):
    st = ch("initializeAggregation", "uniqState", F.lit("user_42"))
    assert _val(spark, ch("finalizeAggregation", st)) == 1
    st_null = ch(
        "initializeAggregation", "uniqState", F.lit(None).cast("string")
    )
    assert _val(spark, ch("finalizeAggregation", st_null)) == 0
    st_t = ch("initializeAggregation", "uniqThetaState", F.lit(7))
    assert _val(spark, ch("finalizeAggregation", st_t, "uniqTheta")) == 1
    assert _val(
        spark,
        ch("finalizeAggregation",
           ch("initializeAggregation", "sumState", F.lit(5)), "sum"),
    ) == 5
    assert _val(
        spark,
        ch("finalizeAggregation",
           ch("initializeAggregation", "countState", F.lit("x")), "count"),
    ) == 1


# ---------------------------------------------------- runningConcurrency

def test_running_concurrency(spark):
    from byconity_spark.operators.windows import running_concurrency

    rows = [
        (1, 0, 10),
        (1, 5, 15),   # overlaps first -> 2
        (1, 10, 20),  # first ends exactly at 10 -> purged -> 2
        (1, 30, 40),  # isolated -> 1
        (2, 0, 100),  # other partition
    ]
    df = spark.createDataFrame(rows, "u int, b int, e int")
    got = {
        (r["u"], r["b"]): r["concurrency"]
        for r in running_concurrency(
            df, "b", "e", partition_by=["u"]
        ).collect()
    }
    assert got == {
        (1, 0): 1, (1, 5): 2, (1, 10): 2, (1, 30): 1, (2, 0): 1,
    }


def test_get_map_keys(spark):
    spark.range(1).selectExpr(
        "map('k1', 1, 'k2', 2) AS m"
    ).union(
        spark.range(1).selectExpr("map('k3', 3, 'k1', 9) AS m")
    ).createOrReplaceTempView("__gmk_t")
    assert _val(
        spark, ch("getMapKeys", "default", "__gmk_t", "m")
    ) == ["k1", "k2", "k3"]


# --------------------------------------------------------------- BLAKE3
def test_blake3_reference_vectors():
    # ground truth = the reference's own test expectations
    # (02456_BLAKE3_hash_function_test.reference) + published empty digest
    from byconity_spark.functions.blake3_impl import blake3_digest

    assert (
        blake3_digest(b"test_1").hex()
        == "0c673da1ef75d2daa895483138340f041881ea975d57c1435d487f454a111b74"
    )
    assert (
        blake3_digest(b"test_2").hex()
        == "007ed777b7a1cba08d37bda339efabb42fa460d953070779903125b0f4d5fb5f"
    )
    assert (
        blake3_digest(b"test_3").hex()
        == "e25232688e2a4d3a55174decb33815a27b2a92dc8839e3cda456105c259bb071"
    )
    assert (
        blake3_digest(b"").hex()
        == "af1349b9f5f9a1a6a0404dea36dcc9499bcb25c9adc112b7cc9a93cae41f3262"
    )


def test_blake3_tree_shapes():
    # spec structure invariants the vectors can't reach: exact chunk/block
    # boundaries must hash like their just-below/above neighbours (i.e. no
    # crash, stable, distinct), and a 2-chunk input must differ from the
    # concatenated-CV-free single-chunk interpretation
    from byconity_spark.functions.blake3_impl import blake3_digest

    outs = {
        n: blake3_digest(b"x" * n).hex()
        for n in (63, 64, 65, 1023, 1024, 1025, 2048, 2049, 5000)
    }
    assert len(set(outs.values())) == len(outs)  # all distinct
    for v in outs.values():
        assert len(v) == 64
    # determinism
    assert blake3_digest(b"x" * 2049).hex() == outs[2049]


def test_blake3_column_nulls(spark):
    from byconity_spark.functions import ch

    df = spark.createDataFrame(
        [("test_1",), (None,)], "s string"
    ).select(ch("BLAKE3", F.col("s")).alias("h"))
    rows = {r.h for r in df.collect()}
    assert (
        "0c673da1ef75d2daa895483138340f041881ea975d57c1435d487f454a111b74"
        in rows
    )
    assert None in rows
