"""Resource groups — session analogue of the reference's admission-control
subsystem (``src/ResourceGroup/IResourceGroup.h`` /
``InternalResourceGroup.cpp`` / ``StorageSystemResourceGroups.cpp``).

Semantics mirrored from ``IResourceGroup::run`` (IResourceGroup.cpp:75-110):

* a statement admitted to group G must satisfy ``canRunMore`` on G AND every
  ancestor; otherwise, if ``canQueueMore`` holds along the chain it queues,
  else RESOURCE_NOT_ENOUGH is thrown immediately;
* a queued statement that is not released within ``max_queued_waiting_ms``
  throws WAIT_FOR_RESOURCE_TIMEOUT;
* on completion the finishing statement wakes queued peers; lower
  ``priority`` value runs first (the reference's priority-ordered
  ``processQueuedQueries``), FIFO within a priority.

In the reference, groups come from server config
(``IResourceGroupManager::loadFromConfig``); the session analogue loads
them through ``CREATE RESOURCE GROUP`` statements instead — same object
model, different config transport.  Admitted statements also tag
``spark.scheduler.pool`` with the group name, so on a cluster running the
fair scheduler the group maps to a real scheduling pool; queue admission
itself is enforced engine-side exactly like the reference (the reference
enforces at the server, not the executor, too)."""

from __future__ import annotations

import threading
import time
from typing import Optional

__all__ = [
    "ResourceNotEnough", "WaitForResourceTimeout", "resource_groups",
]


class ResourceNotEnough(ValueError):
    """RESOURCE_NOT_ENOUGH — no run slot and no queue slot."""


class WaitForResourceTimeout(ValueError):
    """WAIT_FOR_RESOURCE_TIMEOUT — queued past max_queued_waiting_ms."""


class _Group:
    __slots__ = (
        "name", "parent", "max_concurrent_queries", "max_queued",
        "max_queued_waiting_ms", "priority", "running", "queued",
        "queued_time_total_ms", "running_time_total_ms", "last_used",
    )

    def __init__(self, name: str, parent: Optional["_Group"],
                 max_concurrent_queries: int, max_queued: int,
                 max_queued_waiting_ms: int, priority: int) -> None:
        self.name = name
        self.parent = parent
        self.max_concurrent_queries = max_concurrent_queries
        self.max_queued = max_queued
        self.max_queued_waiting_ms = max_queued_waiting_ms
        self.priority = priority
        self.running = 0
        self.queued = 0
        self.queued_time_total_ms = 0.0
        self.running_time_total_ms = 0.0
        self.last_used = 0.0

    def chain(self):
        g = self
        while g is not None:
            yield g
            g = g.parent

    def can_run_more(self) -> bool:
        return self.running < self.max_concurrent_queries

    def can_queue_more(self) -> bool:
        return self.queued < self.max_queued


class _Waiter:
    __slots__ = ("group", "priority", "seq", "admitted", "enqueued_at")

    def __init__(self, group: _Group, seq: int) -> None:
        self.group = group
        self.priority = group.priority
        self.seq = seq
        self.admitted = False
        self.enqueued_at = time.time()


class ResourceGroupManager:
    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._cond = threading.Condition(self._lock)
        self._groups: dict[str, _Group] = {}
        self._waiters: list[_Waiter] = []
        self._seq = 0
        self._current = threading.local()  # SET resource_group routing

    # -- config (CREATE/DROP RESOURCE GROUP = loadFromConfig analogue) ----
    def create(self, name: str, parent: Optional[str] = None,
               max_concurrent_queries: int = 8, max_queued: int = 16,
               max_queued_waiting_ms: int = 5000, priority: int = 0) -> None:
        with self._lock:
            p = self._groups.get(parent) if parent else None
            if parent and p is None:
                raise ValueError(f"unknown parent resource group {parent!r}")
            self._groups[name] = _Group(
                name, p, max_concurrent_queries, max_queued,
                max_queued_waiting_ms, priority,
            )

    def drop(self, name: str) -> bool:
        with self._lock:
            g = self._groups.get(name)
            if g is None:
                return False
            kids = [k for k in self._groups.values() if k.parent is g]
            if kids:
                raise ValueError(
                    f"resource group {name!r} has child groups "
                    f"({[k.name for k in kids]}); drop them first"
                )
            del self._groups[name]
            return True

    def clear(self) -> None:
        with self._lock:
            self._groups.clear()
            self._waiters.clear()

    # -- session routing --------------------------------------------------
    def set_current(self, name: Optional[str]) -> None:
        if name is not None and name not in self._groups:
            raise ValueError(f"unknown resource group {name!r}")
        self._current.name = name

    def current(self) -> Optional[str]:
        return getattr(self._current, "name", None)

    # -- admission (IResourceGroup::run) ----------------------------------
    def acquire(self, spark=None, group_name: Optional[str] = None) -> Optional[str]:
        """Admit one statement into its resource group.  Returns the group
        name (to pass back to :meth:`release`) or None when no group
        applies.  Blocks while queued; raises on no-capacity/timeout."""
        name = group_name or self.current()
        if name is None:
            return None
        with self._cond:
            g = self._groups.get(name)
            if g is None:
                return None
            can_run = all(x.can_run_more() for x in g.chain())
            if can_run:
                self._start(g)
            else:
                if not all(x.can_queue_more() for x in g.chain()):
                    raise ResourceNotEnough(
                        f"The resource is not enough for group {name} "
                        f"(RESOURCE_NOT_ENOUGH)"
                    )
                self._seq += 1
                w = _Waiter(g, self._seq)
                self._waiters.append(w)
                for x in g.chain():
                    x.queued += 1
                deadline = time.time() + g.max_queued_waiting_ms / 1000.0
                try:
                    while not w.admitted:
                        remaining = deadline - time.time()
                        if remaining <= 0 or not self._cond.wait(remaining):
                            if w.admitted:  # admitted in the final race
                                break
                            raise WaitForResourceTimeout(
                                f"Waiting for resource timeout in {name} "
                                f"(WAIT_FOR_RESOURCE_TIMEOUT)"
                            )
                finally:
                    if w in self._waiters:
                        self._waiters.remove(w)
                    for x in g.chain():
                        x.queued -= 1
                    g.queued_time_total_ms += (
                        (time.time() - w.enqueued_at) * 1000.0
                    )
                # _admit_waiters() already bumped the running counters
        if spark is not None:
            try:
                # fair-scheduler pool mapping — the cluster-side half
                spark.sparkContext.setLocalProperty(
                    "spark.scheduler.pool", name
                )
            except Exception:
                pass
        return name

    def release(self, spark=None, name: Optional[str] = None,
                started_at: Optional[float] = None) -> None:
        if name is None:
            return
        with self._cond:
            g = self._groups.get(name)
            if g is None:
                return
            for x in g.chain():
                x.running = max(0, x.running - 1)
            if started_at is not None:
                g.running_time_total_ms += (time.time() - started_at) * 1000.0
            self._admit_waiters()
            self._cond.notify_all()
        if spark is not None:
            try:
                spark.sparkContext.setLocalProperty("spark.scheduler.pool", None)
            except Exception:
                pass

    def _start(self, g: _Group) -> None:
        for x in g.chain():
            x.running += 1
        g.last_used = time.time()

    def _admit_waiters(self) -> None:
        """Priority-ordered queue drain (processQueuedQueries analogue):
        lower priority value first, FIFO within a priority."""
        for w in sorted(self._waiters, key=lambda w: (w.priority, w.seq)):
            if not w.admitted and all(
                x.can_run_more() for x in w.group.chain()
            ):
                w.admitted = True
                self._start(w.group)

    # -- introspection (StorageSystemResourceGroups.cpp column subset) ----
    def rows(self) -> list[tuple]:
        with self._lock:
            return [
                (
                    g.name,
                    g.parent.name if g.parent else "",
                    1 if all(x.can_run_more() for x in g.chain()) else 0,
                    1 if all(x.can_queue_more() for x in g.chain()) else 0,
                    int(g.priority),
                    int(g.max_concurrent_queries),
                    int(g.running),
                    int(g.max_queued),
                    int(g.queued),
                    int(g.max_queued_waiting_ms),
                    float(g.queued_time_total_ms),
                    float(g.running_time_total_ms),
                )
                for _, g in sorted(self._groups.items())
            ]


resource_groups = ResourceGroupManager()
