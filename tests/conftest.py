"""Shared test fixtures: one SparkSession per test run and a DuckDB-oracle
comparison helper mirroring the driver's t2 check (columns sorted by name,
rows order-insensitive, floats rounded)."""

from __future__ import annotations

import math
import os
from datetime import date, datetime

import duckdb
import pytest

# Default to sf0.01 — the scale the verification driver certifies at.
# Use BSPARK_TEST_SF_DIR=/root/testdata/sf0.001 for a faster smoke run.
SF_DIR = os.environ.get("BSPARK_TEST_SF_DIR", "/root/testdata/sf0.01")
TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@pytest.fixture(scope="session")
def spark():
    from byconity_spark import get_spark

    spark = get_spark(app_name="byconity-spark-tests")
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.sql(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{SF_DIR}/{name}.parquet')"
        )
    yield con
    con.close()


def _canon_value(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0:
            return 0.0
        # round to 9 significant digits (driver rounds floats)
        return float(f"{v:.9g}")
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon_value(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _canon_value(x)) for k, x in v.items()))
    try:  # Decimal and numpy scalars
        import decimal

        if isinstance(v, decimal.Decimal):
            return _canon_value(float(v))
    except Exception:
        pass
    return v


def canonicalize(columns, rows):
    """Sort columns by name, canonicalize values, sort rows."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        out.append(tuple(_canon_value(row[i]) for i in order))
    out.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return [columns[i] for i in order], out


def assert_matches_oracle(spark_df, duck_con, oracle: str, name: str = "query"):
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = duck_con.sql(oracle)
    d_cols = list(rel.columns)
    d_rows = rel.fetchall()

    assert sorted(s_cols) == sorted(d_cols), (
        f"{name}: column mismatch spark={sorted(s_cols)} duck={sorted(d_cols)}"
    )
    _, s_canon = canonicalize(s_cols, s_rows)
    _, d_canon = canonicalize(d_cols, d_rows)
    assert len(s_canon) == len(d_canon), (
        f"{name}: row count spark={len(s_canon)} duck={len(d_canon)}"
    )
    for i, (a, b) in enumerate(zip(s_canon, d_canon)):
        assert a == b, f"{name}: row {i} differs\n  spark={a}\n  duck ={b}"
