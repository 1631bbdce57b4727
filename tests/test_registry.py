

def test_single_value_or_null_and_linreg(spark):
    import pyspark.sql.functions as F
    from byconity_spark.functions.registry import AGG

    df = spark.createDataFrame(
        [("a", 1.0, 2.0), ("a", 2.0, 4.0), ("a", 3.0, 6.0), ("b", 5.0, 5.0)],
        "g string, x double, y double",
    )
    svn = df.groupBy("g").agg(
        AGG["singleValueOrNull"](F.col("g")).alias("sv")
    ).collect()
    assert {r.g: r.sv for r in svn} == {"a": "a", "b": "b"}
    mixed = df.groupBy().agg(AGG["singleValueOrNull"](F.col("g")).alias("sv"))
    assert mixed.collect()[0].sv is None
    # y = 2x exactly
    lr = (
        df.filter("g = 'a'")
        .groupBy("g")
        .agg(AGG["simpleLinearRegression"](F.col("x"), F.col("y")).alias("kb"))
        .collect()[0]
        .kb
    )
    assert abs(lr.k - 2.0) < 1e-12 and abs(lr.b) < 1e-12
