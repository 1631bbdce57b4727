"""Driver-contract guards over every registered query's OUTPUT SCHEMA.

The verification driver canonicalizes result cells with a pandas hash table,
which raises ``TypeError: unhashable type: 'list'`` on array/map cells (seen
in CORRECTNESS_r03: 5 otherwise-correct queries erred).  Registered queries
must therefore serialize complex columns to strings — enforced here so the
regression can never reach the driver again.
"""

from __future__ import annotations

import pytest
from pyspark.sql.types import ArrayType, MapType, StructType

from byconity_spark.workloads import all_queries
from tests.conftest import SF_DIR


def _complex_fields(schema):
    return [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]


def test_no_complex_output_columns(spark):
    """Every registered query must emit only scalar columns."""
    offenders = {}
    for name, qd in all_queries().items():
        df = qd.builder(spark, SF_DIR)
        bad = _complex_fields(df.schema)
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "array/map/struct output columns break the driver's hasher; "
        f"serialize them with workloads._arrays helpers: {offenders}"
    )


def test_oracle_column_names_align(spark, duck):
    """Column NAMES must match between each Spark builder and its oracle —
    the driver sorts columns by name before hashing values."""
    mismatched = {}
    for name, qd in all_queries().items():
        if qd.oracle is None:
            continue
        s_cols = sorted(qd.builder(spark, SF_DIR).columns)
        d_cols = sorted(duck.sql(f"SELECT * FROM ({qd.oracle}) LIMIT 0").columns)
        if s_cols != d_cols:
            mismatched[name] = {"spark": s_cols, "duck": d_cols}
    assert not mismatched, f"column-name drift: {mismatched}"


def test_oracle_dtype_contract(spark, duck):
    """The driver's value hash is DTYPE-EXACT: Spark int64 `2674` vs DuckDB
    float64 `2674.0` hash-mismatches even though the values are equal (all 5
    CORRECTNESS_r04 fails were this class).  Enforce per column:
      - no DecimalType in any Spark output (renders '1013.70' vs '1013.7');
      - never int-on-one-engine / float-on-the-other (DuckDB HUGEINT sums
        and DECIMAL aggregates fetch to pandas as float64 — CAST them).
    """
    import pandas as pd
    from pyspark.sql.types import (
        ByteType, DecimalType, DoubleType, FloatType, IntegerType, LongType,
        ShortType,
    )

    def spark_kind(dt):
        if isinstance(dt, (ByteType, ShortType, IntegerType, LongType)):
            return "int"
        if isinstance(dt, (FloatType, DoubleType)):
            return "float"
        return None

    def pandas_kind(dtype):
        if pd.api.types.is_bool_dtype(dtype):
            return None
        if pd.api.types.is_integer_dtype(dtype):
            return "int"
        if pd.api.types.is_float_dtype(dtype):
            return "float"
        return None

    offenders = {}
    for name, qd in all_queries().items():
        sdf = qd.builder(spark, SF_DIR)
        decimals = [
            f.name for f in sdf.schema.fields
            if isinstance(f.dataType, DecimalType)
        ]
        if decimals:
            offenders[name] = {"decimal_columns": decimals}
            continue
        if qd.oracle is None:
            continue
        duck_dtypes = duck.sql(f"SELECT * FROM ({qd.oracle}) LIMIT 0").df().dtypes
        skinds = {f.name.lower(): spark_kind(f.dataType) for f in sdf.schema.fields}
        bad = {}
        for col, ddtype in duck_dtypes.items():
            sk, dk = skinds.get(col.lower()), pandas_kind(ddtype)
            if sk and dk and sk != dk:
                bad[col] = f"spark={sk} duck={dk}"
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "int-vs-float render drift between engines (the driver hash is "
        f"dtype-exact — CAST to BIGINT/DOUBLE on both sides): {offenders}"
    )
