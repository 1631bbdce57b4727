"""Workload registry: every operator from SURVEY.md §2 that we claim as done
has one entry here — a PySpark builder plus (where SQL-expressible) an
equivalent ANSI-SQL oracle that DuckDB runs on the same parquet tables.

The driver compares row-count + schema + order-insensitive value hash, with
columns sorted by NAME — so the Spark builder and the oracle MUST alias every
computed column identically, and timestamp outputs are normalized to
date/strings on both sides.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QueryDef:
    """One correctness-checked query: Spark builder + DuckDB oracle SQL."""

    builder: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]  # None → non-SQL-expressible, rows-only check


_REGISTRY: dict[str, QueryDef] = {}


def register(name: str, oracle: Optional[str] = None):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        _REGISTRY[name] = QueryDef(fn, oracle)
        return fn

    return deco


def all_queries() -> dict[str, QueryDef]:
    # Import side-effect populates the registry.  ORDER MATTERS: the
    # verification driver caps its oracle run at the first N registered
    # queries, so the families with the least prior driver signal register
    # FIRST (behavioral, bitmaps, LLM pipeline, windows, functions, CH-SQL,
    # writes, streaming) and the already-proven TPC-H/relational suites last.
    from byconity_spark.workloads import (  # noqa: F401
        behavioral,
        bitmaps_suite,
        llm_pipeline,
        windows,
        functions_suite,
        chsql_suite,
        aggregates_suite,
        writes,
        sources_suite,
        streaming_suite,
        setops_grouping,
        tpch,
        tpch_extra,
        relational,
    )

    return dict(_REGISTRY)
