"""Interactive transactions (reference src/Parsers/ASTTransaction.h,
src/Interpreters/InterpreterBeginQuery.h, src/Transaction/).

The reference exposes ``BEGIN [TRANSACTION]`` / ``COMMIT`` / ``ROLLBACK`` /
``SHOW STATEMENTS`` over CnchTransaction (TSO-ordered multi-statement
transactions on server tables).  The session analogue here covers the
frontend's session tables: write statements executed inside an open
transaction snapshot the target view's pre-image lazily (first touch per
table); ROLLBACK restores every pre-image, COMMIT discards them.

Semantics delivered:
* read-your-writes — statements in the transaction see prior writes
  (they applied to the session views immediately);
* atomic rollback — ROLLBACK undoes every table the transaction touched,
  including CREATE (view dropped) and DROP (view restored);
* ``SHOW STATEMENTS`` lists the open transaction's statements, like the
  reference AST node of the same name.

Scale note: a snapshot is one analyzed DataFrame (a logical plan), not
data — nothing is collected or copied; rollback is a view re-registration.
Deviation (documented): parquet-backed writes through engine/write.py are
NOT transactional — the reference scopes CnchTransaction to its own part
catalog, which session temp views stand in for here.
"""

from __future__ import annotations


class TransactionError(RuntimeError):
    """reference ErrorCodes::INVALID_TRANSACTION."""


class TransactionManager:
    def __init__(self) -> None:
        self._txn: dict | None = None
        self._next_id = 1

    @property
    def open(self) -> bool:
        return self._txn is not None

    @property
    def txn_id(self) -> int | None:
        return self._txn["id"] if self._txn else None

    def begin(self) -> int:
        if self._txn is not None:
            raise TransactionError(
                "INVALID_TRANSACTION: a transaction is already active "
                f"(id {self._txn['id']})"
            )
        self._txn = {"id": self._next_id, "snapshot": {}, "statements": []}
        self._next_id += 1
        return self._txn["id"]

    def record_statement(self, sql: str) -> None:
        if self._txn is not None:
            self._txn["statements"].append(sql.strip())

    def statements(self) -> list:
        if self._txn is None:
            raise TransactionError(
                "INVALID_TRANSACTION: no active transaction"
            )
        return list(self._txn["statements"])

    def snapshot_table(
        self, spark, name: str, engines: dict, replacing: dict,
        extras: dict | None = None,
    ) -> None:
        """Record ``name``'s pre-image once per transaction (lazy, first
        write wins — later writes to the same table roll back to the state
        at transaction start, not to intermediate states).

        ``extras`` maps label -> a live session-metadata dict keyed by
        table name (PARTITION BY exprs, TTLs, MV definitions, projection
        registries).  Their per-table values are snapshotted too, so
        ``BEGIN; DROP TABLE t; ROLLBACK`` restores a partitioned table's
        PARTITION BY / TTL / projections, not just its rows."""
        if self._txn is None or name in self._txn["snapshot"]:
            return
        try:
            pre_image = spark.table(name)
        except Exception:
            pre_image = None  # table did not exist at first touch
        import copy

        extra_vals = {}
        for label, d in (extras or {}).items():
            v = d.get(name)
            # one-level copy: the per-table value may itself be a mutable
            # dict (projection registry) that DROP/ALTER mutates in place
            extra_vals[label] = copy.copy(v) if isinstance(v, dict) else v
        self._txn["snapshot"][name] = (
            pre_image,
            engines.get(name),
            replacing.get(name),
            extra_vals,
        )

    def commit(self) -> int:
        if self._txn is None:
            raise TransactionError(
                "INVALID_TRANSACTION: no active transaction to COMMIT"
            )
        txn_id = self._txn["id"]
        self._txn = None  # writes already live in the session views
        return txn_id

    def rollback(
        self, spark, engines: dict, replacing: dict,
        extras: dict | None = None,
    ) -> tuple:
        if self._txn is None:
            raise TransactionError(
                "INVALID_TRANSACTION: no active transaction to ROLLBACK"
            )
        from byconity_spark.engine.query_cache import query_cache

        txn_id = self._txn["id"]
        restored = 0
        for name, snap in self._txn["snapshot"].items():
            pre_image, engine, repl, extra_vals = snap
            if pre_image is None:
                spark.catalog.dropTempView(name)
                engines.pop(name, None)
                replacing.pop(name, None)
            else:
                pre_image.createOrReplaceTempView(name)
                if engine is not None:
                    engines[name] = engine
                else:
                    engines.pop(name, None)
                if repl is not None:
                    replacing[name] = repl
                else:
                    replacing.pop(name, None)
            for label, d in (extras or {}).items():
                v = extra_vals.get(label)
                if pre_image is None or v is None:
                    d.pop(name, None)
                else:
                    d[name] = v
            query_cache.bump_table(name)
            restored += 1
        self._txn = None
        return txn_id, restored

    def reset(self) -> None:
        self._txn = None


transactions = TransactionManager()
