"""Typed dictGet variants (FunctionsExternalDictionaries.cpp name family)."""

import pytest
from pyspark.sql import functions as F

from byconity_spark.operators.dictionary import (
    dict_get_typed, dict_get_or_null, dict_has, dict_typed_names,
)


@pytest.fixture(scope="module")
def fixtures(spark):
    facts = spark.createDataFrame(
        [(1,), (2,), (9,)], "k long"
    )
    dictionary = spark.createDataFrame(
        [(1, "alpha", 10.5), (2, "beta", 20.5)], "k long, name string, score double"
    )
    return facts, dictionary


def test_dict_get_typed_cast_and_miss(fixtures):
    facts, d = fixtures
    out = dict_get_typed("Int64", facts, d, "k", "score").orderBy("k").collect()
    assert [r["score"] for r in out] == [10, 20, None]  # cast long + NULL miss
    assert dict(out[0].asDict())["score"] == 10


def test_dict_get_typed_or_default(fixtures):
    facts, d = fixtures
    out = dict_get_typed("String", facts, d, "k", "name", default="?") \
        .orderBy("k").collect()
    assert [r["name"] for r in out] == ["alpha", "beta", "?"]


def test_dict_has(fixtures):
    facts, d = fixtures
    out = dict_has(facts, d, "k").orderBy("k").collect()
    assert [r["has"] for r in out] == [1, 1, 0]


def test_dict_get_or_null_is_plain_probe(fixtures):
    facts, d = fixtures
    out = dict_get_or_null(facts, d, "k", ["name"]).orderBy("k").collect()
    assert [r["name"] for r in out] == ["alpha", "beta", None]


def test_typed_name_inventory_covers_reference_pairs():
    names = dict_typed_names()
    # every typed getter has its OrDefault twin
    for t in ("Int64", "UInt32", "Float64", "String", "Date", "DateTime",
              "UUID", "Decimal64", "IPv4"):
        assert f"dictGet{t}" in names and f"dictGet{t}OrDefault" in names
    assert "dictHas" in names and "dictGetOrNull" in names


def test_dict_probe_stays_broadcast(fixtures, spark):
    facts, d = fixtures
    plan = dict_get_typed("Int64", facts, d, "k", "score") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # fact side must never shuffle
