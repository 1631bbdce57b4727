"""Golden-oracle tests: every registered workload query with an oracle is run
through Spark AND DuckDB on the same parquet and hash-compared — the same
pattern as the reference's SQL+.reference corpus
(/root/reference/tests/queries/4_cnch_stateless/) with DuckDB as the oracle.
"""

from __future__ import annotations

import pytest

from byconity_spark.workloads import all_queries
from tests.conftest import SF_DIR, assert_matches_oracle

QUERIES = all_queries()
WITH_ORACLE = sorted(n for n, q in QUERIES.items() if q.oracle is not None)
ROWS_ONLY = sorted(n for n, q in QUERIES.items() if q.oracle is None)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_query_matches_oracle(spark, duck, name):
    qd = QUERIES[name]
    df = qd.builder(spark, SF_DIR)
    assert_matches_oracle(df, duck, qd.oracle, name)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs(spark, name):
    qd = QUERIES[name]
    df = qd.builder(spark, SF_DIR)
    n = df.count()
    assert n >= 0
    assert len(df.schema.fields) > 0
