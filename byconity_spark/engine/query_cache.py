"""Session query-result cache.

Reference: src/Interpreters/Cache/QueryCache.h — the entry key is the
normalized statement (the reference hashes the AST so case variants of the
same query share an entry; we key on the rewritten Spark SQL text, which
the frontend produces deterministically from the CH statement), entries
carry a TTL (Settings.h `query_cache_ttl`, default 60 s), a transactional
invalidation stamp (`cnch_txn` in the reference; here a per-table data
version bumped by the session DDL surface), and results of queries that
call non-deterministic functions are not cached
(QueryCache.cpp astContainsNonDeterministicFunctions).

Spark-first design: an entry holds a PERSISTED DataFrame
(MEMORY_AND_DISK), so a hit re-serves from InMemoryTableScan — the
distributed analogue of the reference's stored result chunks.  Blocks
live on the executors (not the driver), spill to disk, and Spark's block
manager can evict them under memory pressure, which bounds worst-case
memory the way `query_cache_max_size_in_bytes` does; the explicit entry
cap (`query_cache_max_entries`, LRU) bounds entry count on top.

Settings analogues (Settings.h:1155-1187):
  enabled            <- use_query_cache (also per-statement via
                        ``SETTINGS use_query_cache = 1``)
  writes_enabled     <- enable_writes_to_query_cache
  reads_enabled      <- enable_reads_from_query_cache
  ttl                <- query_cache_ttl (seconds)
  max_entries        <- query_cache_max_entries
  min_query_runs     <- query_cache_min_query_runs

Introspection: ``system.query_cache`` (StorageSystemQueryCache.cpp) is
served by ``entries_df()`` through the SQL frontend.
"""

from __future__ import annotations

from byconity_spark.engine.localdf import local_df as _local_df

import hashlib
import re
import threading
import time

from pyspark.sql import DataFrame, SparkSession

# QueryCache.cpp astContainsNonDeterministicFunctions: results that depend
# on the call time or RNG never enter the cache.  Both the CH names and
# their Spark rewrites are listed — the probe runs on the rewritten text.
_NONDETERMINISTIC_RE = re.compile(
    r"\b(now|now64|today|yesterday|rand|rand32|rand64|randCanonical|"
    r"randomString|randomPrintableASCII|generateUUIDv4|uuid|"
    r"current_timestamp|current_date|current_time|unix_timestamp|"
    r"random|shuffle|monotonically_increasing_id)\s*\(",
    re.IGNORECASE,
)


def contains_nondeterministic(norm_sql: str) -> bool:
    return bool(_NONDETERMINISTIC_RE.search(norm_sql))


def normalize_key(sql: str) -> str:
    """Case-fold outside single-quoted literals and collapse whitespace, so
    keyword/identifier case variants of one statement share a cache entry —
    the text analogue of the reference hashing the AST instead of the query
    string (QueryCache.h:48).  Spark resolves identifiers case-insensitively
    by default, so folding identifiers cannot conflate distinct queries."""
    out: list[str] = []
    i, n = 0, len(sql)
    while i < n:
        c = sql[i]
        if c == "'":
            j = i + 1
            while j < n:
                if sql[j] == "\\":
                    j += 2
                    continue
                if sql[j] == "'":
                    j += 1
                    break
                j += 1
            out.append(sql[i:j])
            i = j
            continue
        out.append(c.lower())
        i += 1
    return re.sub(r"\s+", " ", "".join(out)).strip()


class _Entry:
    __slots__ = ("df", "expires_at", "versions", "hits", "created_at")

    def __init__(self, df: DataFrame, expires_at: float,
                 versions: dict[str, int]):
        self.df = df
        self.expires_at = expires_at
        self.versions = versions
        self.hits = 0
        self.created_at = time.time()


class QueryCache:
    def __init__(self) -> None:
        self.enabled = False
        self.writes_enabled = True
        self.reads_enabled = True
        self.ttl = 60.0
        self.max_entries = 64
        self.min_query_runs = 0
        self._entries: dict[str, _Entry] = {}  # insertion order = LRU order
        self._runs: dict[str, int] = {}
        self._versions: dict[str, int] = {}
        self._lock = threading.RLock()
        self.stats = {"hits": 0, "misses": 0, "stores": 0,
                      "evictions": 0, "stale_drops": 0}

    # -- configuration -----------------------------------------------------
    def configure(self, **kw) -> "QueryCache":
        for k, v in kw.items():
            if not hasattr(self, k) or k.startswith("_"):
                raise ValueError(f"unknown query-cache setting {k!r}")
            setattr(self, k, v)
        return self

    # -- transactional invalidation (cnch_txn analogue) ---------------------
    def table_version(self, name: str) -> int:
        return self._versions.get(name.lower(), 0)

    def bump_table(self, name: str) -> None:
        """Called by the session DDL surface on INSERT / DROP / OPTIMIZE /
        re-CREATE: any cached query that read this table goes stale."""
        with self._lock:
            key = name.lower()
            self._versions[key] = self._versions.get(key, 0) + 1

    def _deps(self, norm_sql: str) -> dict[str, int]:
        """Version stamps of every MUTABLE (session-DDL) table the
        statement references.  Base parquet views are immutable within a
        session, so only registered session tables carry versions."""
        from byconity_spark.frontend.sql import _SESSION_TABLE_ENGINES

        toks = set(re.findall(r"\b[A-Za-z_]\w*\b", norm_sql.lower()))
        return {
            t.lower(): self.table_version(t)
            for t in _SESSION_TABLE_ENGINES
            if t.lower() in toks
        }

    # -- read / write --------------------------------------------------------
    def lookup(self, norm_sql: str) -> DataFrame | None:
        norm_sql = normalize_key(norm_sql)
        with self._lock:
            e = self._entries.get(norm_sql)
            if e is None:
                self.stats["misses"] += 1
                return None
            stale = time.time() >= e.expires_at or any(
                self.table_version(t) != v for t, v in e.versions.items()
            )
            if stale:
                self.stats["stale_drops"] += 1
                self.stats["misses"] += 1
                self._drop(norm_sql)
                return None
            e.hits += 1
            self.stats["hits"] += 1
            # LRU refresh: re-insert at the tail
            del self._entries[norm_sql]
            self._entries[norm_sql] = e
            return e.df

    def store(self, norm_sql: str, df: DataFrame) -> DataFrame:
        norm_sql = normalize_key(norm_sql)
        with self._lock:
            self._runs[norm_sql] = self._runs.get(norm_sql, 0) + 1
            if self._runs[norm_sql] < max(0, self.min_query_runs):
                return df
            if contains_nondeterministic(norm_sql):
                return df
            while len(self._entries) >= max(1, self.max_entries):
                oldest = next(iter(self._entries))
                self._drop(oldest)
                self.stats["evictions"] += 1
            cached = df.persist()
            self._entries[norm_sql] = _Entry(
                cached, time.time() + self.ttl, self._deps(norm_sql)
            )
            self.stats["stores"] += 1
            return cached

    def _drop(self, key: str) -> None:
        e = self._entries.pop(key, None)
        if e is not None:
            try:
                e.df.unpersist()
            except Exception:
                pass  # session may already be gone

    def clear(self) -> None:
        with self._lock:
            for key in list(self._entries):
                self._drop(key)
            self._runs.clear()
            self.stats = {k: 0 for k in self.stats}

    # -- system.query_cache (StorageSystemQueryCache.cpp) --------------------
    def entries_df(self, spark: SparkSession) -> DataFrame:
        now = time.time()
        with self._lock:
            rows = [
                (
                    key,
                    hashlib.md5(key.encode()).hexdigest(),
                    e.hits,
                    bool(now >= e.expires_at or any(
                        self.table_version(t) != v
                        for t, v in e.versions.items()
                    )),
                    float(e.expires_at - now),
                )
                for key, e in self._entries.items()
            ]
        return _local_df(spark, 
            rows,
            "query string, key_hash string, hits bigint, stale boolean, "
            "expires_in double",
        )


query_cache = QueryCache()
