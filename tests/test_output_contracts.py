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
