"""Edge-case unit tests for the custom operators (NULL semantics, tie and
direction handling, error paths) — the cases the sf-data oracle queries
can't reach."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from byconity_spark.operators.joins import any_join, asof_join, quantified_compare


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


# ---------------------------------------------------------------- ASOF join
def test_asof_backward_exact_and_strict(spark):
    left = _df(spark, [(1, 10), (1, 20), (2, 5)], "k int, t int")
    right = _df(spark, [(1, 10, "a"), (1, 15, "b"), (2, 50, "c")], "k int, t int, v string")

    exact = asof_join(left, right, on="k", left_time="t", right_time="t")
    got = {(r.k, r.t): r.v for r in exact.collect()}
    assert got == {(1, 10): "a", (1, 20): "b", (2, 5): None}

    strict = asof_join(
        left, right, on="k", left_time="t", right_time="t", allow_exact_matches=False
    )
    got = {(r.k, r.t): r.v for r in strict.collect()}
    assert got == {(1, 10): None, (1, 20): "b", (2, 5): None}


def test_asof_forward(spark):
    left = _df(spark, [(1, 10), (1, 20)], "k int, t int")
    right = _df(spark, [(1, 12, "x"), (1, 25, "y")], "k int, t int, v string")
    fwd = asof_join(left, right, on="k", left_time="t", right_time="t", direction="forward")
    got = {(r.k, r.t): r.v for r in fwd.collect()}
    assert got == {(1, 10): "x", (1, 20): "y"}


def test_asof_payload_collision_raises(spark):
    left = _df(spark, [(1, 10, "z")], "k int, t int, v string")
    right = _df(spark, [(1, 5, "a")], "k int, t int, v string")
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right, on="k", left_time="t", right_time="t")


# ----------------------------------------------------------------- ANY join
def test_any_join_keys_only_right(spark):
    left = _df(spark, [(1, "a"), (2, "b")], "k int, v string")
    right = _df(spark, [(1,), (1,), (3,)], "k int")
    out = any_join(left, right, on="k", how="inner")
    assert [(r.k, r.v) for r in out.collect()] == [(1, "a")]


def test_any_join_prefers_ordering(spark):
    left = _df(spark, [(1, "a")], "k int, v string")
    right = _df(spark, [(1, 30), (1, 10), (1, 20)], "k int, w int")
    out = any_join(left, right, on="k", prefer=[F.col("w").desc()])
    assert out.collect()[0].w == 30


# ------------------------------------------------------------- salted join
def test_salted_join_equivalence(spark):
    from byconity_spark.operators.joins import salted_join

    left = _df(
        spark,
        [(i, 1 if i < 90 else i) for i in range(100)],  # key 1 is hot
        "id int, k int",
    )
    right = _df(spark, [(1, "hot"), (95, "cold")], "k int, v string")
    plain = {(r.id, r.v) for r in left.join(right, "k", "inner").collect()}
    salted = {
        (r.id, r.v)
        for r in salted_join(left, right, "k", salt_from="id", n_salts=4).collect()
    }
    assert salted == plain

    plain_left = {
        (r.id, r.v) for r in left.join(right, "k", "left").collect()
    }
    salted_left = {
        (r.id, r.v)
        for r in salted_join(left, right, "k", salt_from="id", n_salts=4, how="left").collect()
    }
    assert salted_left == plain_left


# ----------------------------------------------- quantified comparison NULLs
@pytest.mark.parametrize(
    "sub_rows,op,quant,expected_keys",
    [
        # x > ALL {5, 7}: only x=9 qualifies
        ([(5,), (7,)], ">", "ALL", {9}),
        # x > ALL {} (empty): vacuously true for all rows incl. NULL x?
        # NULL x with empty S: SQL says TRUE (no comparison performed).
        ([], ">", "ALL", {9, 6, 3, None}),
        # x > ALL {5, NULL}: UNKNOWN for every x -> empty
        ([(5,), (None,)], ">", "ALL", set()),
        # x > ANY {5, NULL}: true iff x > 5 (NULL never helps)
        ([(5,), (None,)], ">", "ANY", {9, 6}),
        # x > ANY {NULL}: no non-null -> empty
        ([(None,)], ">", "ANY", set()),
        # x < ANY {5, NULL}: x=3 only
        ([(5,), (None,)], "<", "ANY", {3}),
    ],
)
def test_quantified_null_semantics(spark, sub_rows, op, quant, expected_keys):
    from pyspark.sql import types as T

    df = _df(spark, [(9,), (6,), (3,), (None,)], "x int")
    schema = T.StructType([T.StructField("s", T.IntegerType())])
    sub = spark.createDataFrame(sub_rows, schema)
    out = quantified_compare(df, F.col("x"), sub, "s", op, quant)
    assert {r.x for r in out.collect()} == expected_keys


def test_quantified_matches_duckdb_with_nulls(duck, spark):
    """Cross-check the three-valued logic against DuckDB's native ALL/ANY."""
    df = _df(spark, [(9,), (6,), (3,), (None,)], "x int")
    sub = _df(spark, [(5,), (None,)], "s int")
    ours = sorted(
        r.x for r in quantified_compare(df, F.col("x"), sub, "s", ">", "ANY").collect()
    )
    theirs = sorted(
        r[0]
        for r in duck.sql(
            """
            WITH t(x) AS (VALUES (9),(6),(3),(NULL)),
                 s(v) AS (VALUES (5),(NULL))
            SELECT x FROM t WHERE x > ANY (SELECT v FROM s)
            """
        ).fetchall()
    )
    assert ours == theirs
