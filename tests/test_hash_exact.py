"""Reference-exact hash functions (functions/hash_exact.py) behind
strict_hash_compat.  Every vector comes from the reference's OWN test
outputs:

* tests/queries/4_cnch_stateless/00751_hashing_ints.reference
* tests/queries/4_cnch_stateless/00259_hashing_tuples.reference
* tests/queries/4_cnch_stateless/00324_hashing_enums.reference
* tests/queries/4_cnch_stateless/00422_hash_function_constexpr (k2 anchor)
* tests/queries/0_stateless/02184_hash_functions_and_ip_types.reference
"""

from __future__ import annotations

import ipaddress
import struct

import pytest
from pyspark.sql import functions as F

from byconity_spark.functions.hash_exact import (
    city64_values,
    city_hash_64,
    half_md5,
    half_md5_values,
    hash128to64,
    hive_hash,
    int_hash_32,
    int_hash_64,
    sip64_values,
    sip_hash_64,
    url_hash,
)
from byconity_spark.functions.registry import ch, set_strict_hash_compat

IPV4 = 0x01020304  # toIPv4('1.2.3.4')
IPV6 = ipaddress.IPv6Address("fe80::62:5aff:fed1:daf0").packed


def test_cityhash64_string_vectors():
    # empty string = k2 (00422 family; CityHash64 spec)
    assert city_hash_64(b"") == 11160318154034397263
    # 16-byte FixedString path — cityHash64(toIPv6(...)) from 02184
    assert city_hash_64(IPV6) == 1599722731594796935


def test_cityhash64_numeric_vectors():
    # 00751: cityHash64(123456) — UInt32 literal through IntHash64Impl
    assert city64_values([123456], [4]) == 13379111408315310133
    # 02184: cityHash64(toIPv4('1.2.3.4'))
    assert city64_values([IPV4], [4]) == 5715546585361069049


def test_cityhash64_combine_vectors():
    # 00259: cityHash64(1, 2, '') with UInt8 literals
    assert city64_values([1, 2, ""], [1, 1, 0]) == 3151614220437955012
    # 00324: cityHash64(1, 1)
    assert city64_values([1, 1], [1, 1]) == 2963573356302499406
    # tuple flattening is the same combine chain
    assert hash128to64(
        hash128to64(int_hash_64(1), int_hash_64(2)), city_hash_64(b"")
    ) == 3151614220437955012


def test_siphash64_vectors():
    # 00751: sipHash64(123456); 02184: sipHash64(toIPv4)
    assert sip_hash_64(struct.pack("<I", 123456)) == 11717965186011240346
    assert sip_hash_64(struct.pack("<I", IPV4)) == 10711397536826262068
    assert sip64_values([123456], [4]) == 11717965186011240346


def test_int_hash_vectors():
    # 02184: intHash64/intHash32(toIPv4('1.2.3.4'))
    assert int_hash_64(IPV4) == 5715546585361069049
    assert int_hash_32(IPV4) == 3152671896


def test_halfmd5_vectors():
    # 00751: halfMD5(123456); 02184: halfMD5(toIPv4)
    assert half_md5(struct.pack("<I", 123456)) == 1452224150530656417
    assert half_md5_values([123456], [4]) == 1452224150530656417
    assert half_md5(struct.pack("<I", IPV4)) == 14356538739656272800


def test_urlhash_trims_one_trailing_char():
    # URLHashImpl: URLHash(x) == URLHash(x + '/') (00149 invariant)
    assert url_hash(b"http://ya.ru") == url_hash(b"http://ya.ru/")
    assert url_hash(b"http://ya.ru") == url_hash(b"http://ya.ru?")
    assert url_hash(b"http://ya.ru") == url_hash(b"http://ya.ru#")
    assert url_hash(b"http://ya.ru/") != url_hash(b"http://ya.ru//")
    assert url_hash(b"abc") == city_hash_64(b"abc")


def test_hivehash_java_anchor():
    # Java String.hashCode anchors (public): "abc" = 96354, "" = 0
    assert hive_hash(b"abc") == 96354
    assert hive_hash(b"") == 0


def test_long_input_paths_stable():
    # 17-32 / 33-64 / >64 byte branches (transcription-verified against
    # contrib/cityhash102/src/city.cc): distinct, deterministic, and
    # sensitive to every byte
    for n in (17, 32, 33, 64, 65, 128, 200):
        a = city_hash_64(b"x" * n)
        b = city_hash_64(b"x" * (n - 1) + b"y")
        assert a != b
        assert a == city_hash_64(b"x" * n)


def _to_signed(u):
    return u - (1 << 64) if u >= (1 << 63) else u


@pytest.fixture
def strict():
    set_strict_hash_compat(True)
    yield
    set_strict_hash_compat(False)


def test_strict_mode_spark_columns(spark, strict):
    df = spark.createDataFrame(
        [("", 123456), ("abc", 1)], "s string, v int"
    )
    got = df.select(
        ch("cityHash64", F.col("s")).alias("cs"),
        ch("cityHash64", F.col("v")).alias("cv"),
        ch("sipHash64", F.col("v")).alias("sv"),
        ch("intHash32", F.col("v")).alias("i32"),
        ch("hiveHash", F.col("s")).alias("hh"),
    ).collect()
    assert got[0]["cs"] == _to_signed(11160318154034397263)
    assert got[0]["cv"] == _to_signed(13379111408315310133)
    assert got[0]["sv"] == _to_signed(11717965186011240346)
    assert got[1]["cs"] == _to_signed(city_hash_64(b"abc"))
    assert got[1]["hh"] == 96354
    assert got[0]["i32"] == int_hash_32(
        int.from_bytes(struct.pack("<i", 123456), "little")
    )


def test_strict_mode_multiarg_and_null(spark, strict):
    df = spark.createDataFrame([(1, 2, ""), (None, 2, "")], "a int, b int, s string")
    got = df.select(
        ch("cityHash64", F.col("a").cast("tinyint"),
           F.col("b").cast("tinyint"), F.col("s")).alias("h")
    ).collect()
    assert got[0]["h"] == _to_signed(3151614220437955012)
    assert got[1]["h"] is None


def test_strict_mode_null_in_same_arrow_batch(spark, strict):
    """Round-8 advisory regression: Arrow→pandas used to widen a nullable
    int batch to float64, so a NULL row ANYWHERE in the batch silently
    changed every other row's hash (8-byte double encoding instead of the
    declared tinyint).  coalesce(1) forces the null into the SAME batch as
    the probe row — the old pandas_udf path fails this, arrow_udf passes."""
    df = spark.createDataFrame(
        [(1, 2, ""), (None, 2, ""), (7, 1, "z")], "a int, b int, s string"
    ).coalesce(1)
    got = df.select(
        ch("cityHash64", F.col("a").cast("tinyint"),
           F.col("b").cast("tinyint"), F.col("s")).alias("h"),
        ch("sipHash64", F.col("a").cast("tinyint")).alias("s64"),
        ch("intHash64", F.col("a").cast("tinyint")).alias("i64"),
    ).collect()
    assert got[0]["h"] == _to_signed(3151614220437955012)
    assert got[1]["h"] is None and got[1]["s64"] is None and got[1]["i64"] is None
    assert got[0]["s64"] == _to_signed(sip64_values([1], [1]))
    assert got[0]["i64"] == _to_signed(int_hash_64(1))


def test_strict_mode_float32_width_and_nan(spark, strict):
    """Float32 must hash its DECLARED 4-byte layout (np.float32 failed the
    old isinstance(v, float) check and was int()-truncated); Float32 NaN is
    a VALUE hashed by bit pattern, not a NULL; real NULL stays NULL."""
    df = spark.createDataFrame(
        [(1.5,), (float("nan"),), (None,)], "f float"
    ).coalesce(1)
    got = df.select(ch("cityHash64", F.col("f")).alias("h")).collect()
    exp = _to_signed(
        int_hash_64(int.from_bytes(struct.pack("<f", 1.5), "little"))
    )
    assert got[0]["h"] == exp
    assert got[1]["h"] is not None  # NaN hashes, never raises
    assert got[2]["h"] is None
    # and float64 packs 8 bytes — different from the float32 encoding
    got8 = (
        spark.createDataFrame([(1.5,)], "f double")
        .select(ch("cityHash64", F.col("f")).alias("h"))
        .collect()[0]["h"]
    )
    assert got8 == _to_signed(
        int_hash_64(int.from_bytes(struct.pack("<d", 1.5), "little"))
    )
    assert got8 != exp


def test_strict_mode_raises_without_exact_port(spark, strict):
    df = spark.createDataFrame([("x",)], "s string")
    with pytest.raises(ValueError, match="no exact port"):
        df.select(ch("farmFingerprint64", F.col("s")))


def test_default_mode_stays_fast_xxhash(spark):
    set_strict_hash_compat(False)
    df = spark.createDataFrame([("abc",)], "s string")
    got = df.select(
        ch("cityHash64", F.col("s")).alias("h"),
        F.xxhash64(F.col("s")).alias("x"),
    ).collect()[0]
    assert got["h"] == got["x"]


def test_siphash128_vectors(spark, strict):
    from byconity_spark.functions.hash_exact import sip_hash_128

    # 02184: hex(sipHash128(toIPv4('1.2.3.4')))
    assert (
        sip_hash_128(struct.pack("<I", IPV4)).hex().upper()
        == "DBB6A76B92B59789EFB42185DC32311D"
    )
    df = spark.createDataFrame([(0x01020304,)], "ip int")
    got = df.select(ch("sipHash128", F.col("ip")).alias("h")).collect()[0]["h"]
    assert got == "dbb6a76b92b59789efb42185dc32311d"


def test_city64_np_matches_scalar():
    """The vectorized CityHash64 batch kernel must be bit-identical to the
    scalar reference walk for every length class (0, 1-3, 4-8, 9-16,
    17-32, 33-64, >64 fallback) and for None cells."""
    import random

    from byconity_spark.functions.hash_exact import (
        _city64_np_batch, _to_signed64, city_hash_64,
    )

    rng = random.Random(99)
    batch = [None]
    for n in list(range(0, 70)) + [100, 255, 1024]:
        for _ in range(8):
            batch.append(bytes(rng.randrange(256) for _ in range(n)))
    batch.append(None)
    got = _city64_np_batch(batch)
    for b, g in zip(batch, got):
        if b is None:
            assert g is None
        else:
            assert g == _to_signed64(city_hash_64(b)), (len(b), b[:16])
