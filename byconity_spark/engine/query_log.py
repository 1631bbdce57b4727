"""Session query log.

Reference: src/Interpreters/QueryLog.h (system.query_log) — every executed
statement is recorded with its event time, kind, status, duration and
query-cache usage (the reference's QueryCache::Usage enum:
Unknown/None/Write/Read).

Scope honesty: Spark DataFrames are lazy, so the logged duration covers
statement REWRITE + PLAN BUILD, not cluster execution (the reference logs
wall execution; execution timing here lives in bench.py / the Spark UI).
Only top-level statements are logged — internal recursion (EXPLAIN bodies,
CTAS/INSERT inner SELECTs) matches the reference's is_initial_query=1 rows.
"""

from __future__ import annotations

from byconity_spark.engine.localdf import local_df as _local_df

import datetime
import re
import threading
from collections import deque

from pyspark.sql import DataFrame, SparkSession

_KIND_RE = [
    (re.compile(r"^\s*EXPLAIN\b", re.IGNORECASE), "Explain"),
    (re.compile(r"^\s*(SELECT|WITH)\b", re.IGNORECASE), "Select"),
    (re.compile(r"^\s*CREATE\b", re.IGNORECASE), "Create"),
    (re.compile(r"^\s*INSERT\b", re.IGNORECASE), "Insert"),
    (re.compile(r"^\s*DROP\b", re.IGNORECASE), "Drop"),
    (re.compile(r"^\s*OPTIMIZE\b", re.IGNORECASE), "Optimize"),
    (re.compile(r"^\s*(DESCRIBE|DESC)\b", re.IGNORECASE), "Describe"),
    (re.compile(r"^\s*SHOW\b", re.IGNORECASE), "Show"),
]


def _kind(sql: str) -> str:
    for pat, kind in _KIND_RE:
        if pat.match(sql):
            return kind
    return "Other"


class QueryLog:
    def __init__(self, max_entries: int = 10_000) -> None:
        self._entries: deque = deque(maxlen=max_entries)
        self._lock = threading.Lock()
        self._tls = threading.local()

    # -- cache-usage annotation (QueryCache::Usage) --------------------------
    def note_cache_usage(self, usage: str) -> None:
        """Called by the frontend's cache branch ('Read' on a hit, 'Write'
        on a store) for the statement currently being built."""
        self._tls.cache_usage = usage

    def take_cache_usage(self) -> str:
        u = getattr(self._tls, "cache_usage", "None")
        self._tls.cache_usage = "None"
        return u

    # -- recording ------------------------------------------------------------
    def record(self, query: str, status: str, duration_ms: float,
               cache_usage: str = "None", exception: str = "") -> None:
        with self._lock:
            self._entries.append((
                datetime.datetime.now(),
                query,
                _kind(query),
                status,
                float(duration_ms),
                cache_usage,
                exception,
            ))

    def clear(self) -> None:
        with self._lock:
            self._entries.clear()

    def entries_df(self, spark: SparkSession) -> DataFrame:
        with self._lock:
            rows = list(self._entries)
        df = _local_df(spark, 
            rows,
            "event_time timestamp, query string, query_kind string, "
            "status string, duration_ms double, cache_usage string, "
            "exception string",
        )
        # StorageSystemQueryLog.cpp surface columns the reference's own
        # tests filter on
        # type derives from status: failed statements are the reference's
        # ExceptionBeforeStart / ExceptionWhileProcessing rows, so a
        # `type = 'QueryFinish'` filter must exclude them (QueryLog.h
        # QUERY_FINISH vs EXCEPTION_* event types)
        return df.selectExpr(
            "*",
            "'default' AS current_database",
            "CAST(event_time AS DATE) AS event_date",
            "CASE WHEN status LIKE 'Exception%' THEN status "
            "ELSE 'QueryFinish' END AS type",
        )


query_log = QueryLog()
