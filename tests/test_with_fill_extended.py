"""Extended WITH FILL surface: grouped (multi-key) fill, DESC, explicit
bounds cross-product, and INTERPOLATE carry-forward."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from byconity_spark.frontend import ch_sql
from byconity_spark.frontend.sql import ChSqlError, rewrite_ch_sql


@pytest.fixture()
def tbl(spark):
    df = spark.createDataFrame(
        [
            ("a", 1, 10.0),
            ("a", 4, 40.0),
            ("b", 2, 20.0),
            ("b", 3, 30.0),
        ],
        "g string, k int, v double",
    )
    df.createOrReplaceTempView("fill_t")
    return spark


def test_grouped_fill(tbl):
    out = ch_sql(
        tbl,
        "SELECT g, k, v FROM fill_t ORDER BY g, k WITH FILL",
    ).collect()
    got = [(r.g, r.k, r.v) for r in out]
    assert got == [
        ("a", 1, 10.0), ("a", 2, None), ("a", 3, None), ("a", 4, 40.0),
        ("b", 2, 20.0), ("b", 3, 30.0),
    ]


def test_desc_fill_with_bounds(tbl):
    out = ch_sql(
        tbl,
        "SELECT k, v FROM fill_t WHERE g = 'b' ORDER BY k DESC WITH FILL FROM 5 TO 0",
    ).collect()
    assert [r.k for r in out] == [5, 4, 3, 2, 1]
    assert [r.v for r in out] == [None, None, 30.0, 20.0, None]


def test_interpolate_carry_forward(tbl):
    out = ch_sql(
        tbl,
        "SELECT g, k, v FROM fill_t ORDER BY g, k WITH FILL INTERPOLATE (v)",
    ).collect()
    got = [(r.g, r.k, r.v) for r in out]
    assert got == [
        ("a", 1, 10.0), ("a", 2, 10.0), ("a", 3, 10.0), ("a", 4, 40.0),
        ("b", 2, 20.0), ("b", 3, 30.0),
    ]


def test_two_fill_keys_cross_product(tbl):
    out = ch_sql(
        tbl,
        "SELECT g, k, v FROM fill_t "
        "ORDER BY g, k WITH FILL FROM 1 TO 3 , v WITH FILL FROM 0 TO 2",
    )
    # spine = groups {a,b} x k in [1,2] x v in [0,1]; original rows that
    # don't land on spine points still appear via the left join keys
    rows = out.collect()
    ks = {(r.g, r.k, r.v) for r in rows}
    assert ("a", 1, 0.0) in ks and ("a", 2, 1.0) in ks and ("b", 1, 0.0) in ks


def test_computed_interpolate_raises(tbl):
    with pytest.raises(ChSqlError):
        rewrite_ch_sql(
            "SELECT k, v FROM fill_t ORDER BY k WITH FILL INTERPOLATE (v AS v + 1)"
        )


def test_plain_key_after_fill_raises(tbl):
    with pytest.raises(ChSqlError):
        rewrite_ch_sql("SELECT g, k FROM fill_t ORDER BY k WITH FILL, g")
