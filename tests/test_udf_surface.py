"""UDF/UDAF registry surface (SURVEY §2.12): user extensibility via
spark.udf.register for SQL-callable functions — strictly richer than the
reference's compile-time-only FunctionFactory — plus formatDateTime codes."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from byconity_spark.functions import ch


def test_register_python_udf_sql_callable(spark):
    spark.udf.register("my_tag", lambda s: f"tag:{s}", T.StringType())
    out = spark.sql("SELECT my_tag('x') AS t").collect()[0]
    assert out.t == "tag:x"


def test_register_pandas_udf_sql_callable(spark):
    @F.pandas_udf(T.DoubleType())
    def double_it(v: pd.Series) -> pd.Series:
        return v * 2

    spark.udf.register("double_it", double_it)
    df = spark.createDataFrame([(1.5,), (2.0,)], "v double")
    df.createOrReplaceTempView("t_udf")
    rows = spark.sql("SELECT double_it(v) AS d FROM t_udf ORDER BY d").collect()
    assert [r.d for r in rows] == [3.0, 4.0]


def test_format_date_time_codes(spark):
    df = spark.createDataFrame([("2024-03-15 13:45:30",)], "t string").withColumn(
        "t", F.col("t").cast("timestamp")
    )
    r = df.select(
        ch("formatDateTime", F.col("t"), "%Y-%m-%d").alias("a"),
        ch("formatDateTime", F.col("t"), "%d/%m/%Y %H:%M:%S").alias("b"),
        ch("formatDateTime", F.col("t"), "%F %T").alias("c"),
        ch("formatDateTime", F.col("t"), "year=%Y pct=%%").alias("d"),
    ).collect()[0]
    assert r.a == "2024-03-15"
    assert r.b == "15/03/2024 13:45:30"
    assert r.c == "2024-03-15 13:45:30"
    assert r.d == "year=2024 pct=%"
