"""local_df (engine/localdf.py): LocalRelation-backed tiny frames must be
indistinguishable from spark.createDataFrame — schema (incl. nullability)
and values — while collapsing collect() to a no-job LocalRelation."""

from __future__ import annotations

import datetime
import math

from byconity_spark.engine.localdf import local_df


def _canon(rows):
    return [
        tuple("nan" if isinstance(x, float) and math.isnan(x) else x for x in r)
        for r in rows
    ]


CASES = [
    ([("a", 1), (None, None), ("it's", -5)], "x string, y bigint"),
    (
        [(1.5,), (float("nan"),), (float("inf"),), (1e-17,), (None,)],
        "v double",
    ),
    ([(True, 3), (False, None)], "b boolean, n int"),
    (
        [(datetime.date(2024, 1, 2), datetime.datetime(2024, 1, 2, 3, 4, 5))],
        "d date, t timestamp",
    ),
    ([], "x string, y bigint"),
    ([("back\\slash",), ("new\nline",), ("quote'q",)], "s string"),
    ([("%s %d {}",), ("`tick` ;--",)], "s string"),
]


def test_local_df_matches_create_dataframe(spark):
    for rows, ddl in CASES:
        a = spark.createDataFrame(rows, ddl)
        b = local_df(spark, rows, ddl)
        assert a.schema == b.schema, (ddl, a.schema, b.schema)
        assert _canon(a.collect()) == _canon(b.collect()), (ddl,)


def test_local_df_falls_back_on_complex(spark):
    # nested complex cell → fast path must bail to createDataFrame
    rows = [([[1], [2]],)]
    df = local_df(spark, rows, "a array<array<int>>")
    assert df.collect()[0][0] == [[1], [2]]


def test_local_df_array_and_map(spark):
    cases = [
        ([([1, 2],), ([],), (None,)], "a array<int>"),
        ([(["x", None],)], "a array<string>"),
        (
            [({"k1": "v1", "k2": "v2"},), ({},)],
            "m map<string,string>",
        ),
        ([({"k": 1.5},)], "m map<string,double>"),
    ]
    for rows, ddl in cases:
        a = spark.createDataFrame(rows, ddl)
        b = local_df(spark, rows, ddl)
        assert a.schema == b.schema, (ddl, a.schema, b.schema)
        assert a.collect() == b.collect(), (ddl,)


def test_local_df_structtype_schema(spark):
    from pyspark.sql import types as T

    sch = T.StructType(
        [
            T.StructField("x", T.StringType()),
            T.StructField("y", T.LongType()),
        ]
    )
    a = spark.createDataFrame([("p", 7)], sch)
    b = local_df(spark, [("p", 7)], sch)
    assert a.schema == b.schema
    assert a.collect() == b.collect()
