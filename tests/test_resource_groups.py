"""Resource groups (engine/resource_groups.py) — admission control mirroring
reference src/ResourceGroup/IResourceGroup.cpp::run: run if capacity, queue
if queueable, RESOURCE_NOT_ENOUGH otherwise, WAIT_FOR_RESOURCE_TIMEOUT on
queue-wait expiry; priority-ordered drain; hierarchy via parent chain."""

from __future__ import annotations

import threading
import time

import pytest

from byconity_spark.engine.resource_groups import (
    ResourceNotEnough,
    WaitForResourceTimeout,
    resource_groups,
)
from byconity_spark.frontend import ch_sql
from byconity_spark.frontend.sql import ChSqlError


@pytest.fixture(autouse=True)
def _clean():
    resource_groups.clear()
    resource_groups.set_current(None)
    yield
    resource_groups.set_current(None)
    resource_groups.clear()


def test_ddl_create_drop(spark):
    ch_sql(spark, "CREATE RESOURCE GROUP rg1 MAX_CONCURRENT_QUERIES 4")
    rows = ch_sql(
        spark,
        "SELECT name, max_concurrent_queries, max_queued "
        "FROM system.resource_groups",
    ).collect()
    assert rows[0][0] == "rg1" and rows[0][1] == 4 and rows[0][2] == 16
    out = ch_sql(spark, "DROP RESOURCE GROUP rg1").collect()
    assert out[0][1] == "dropped"
    out = ch_sql(spark, "DROP RESOURCE GROUP IF EXISTS rg1").collect()
    assert out[0][1] == "not_found"


def test_unknown_parent_and_child_protection():
    with pytest.raises(ValueError):
        resource_groups.create("orphan", parent="nope")
    resource_groups.create("p")
    resource_groups.create("c", parent="p")
    with pytest.raises(ValueError, match="child groups"):
        resource_groups.drop("p")
    resource_groups.drop("c")
    assert resource_groups.drop("p")


def test_resource_not_enough():
    resource_groups.create("tight", max_concurrent_queries=1, max_queued=0)
    got = resource_groups.acquire(group_name="tight")
    assert got == "tight"
    with pytest.raises(ResourceNotEnough, match="RESOURCE_NOT_ENOUGH"):
        resource_groups.acquire(group_name="tight")
    resource_groups.release(name="tight")
    # slot freed — admits again
    assert resource_groups.acquire(group_name="tight") == "tight"
    resource_groups.release(name="tight")


def test_queue_timeout():
    resource_groups.create(
        "slowq", max_concurrent_queries=1, max_queued=2,
        max_queued_waiting_ms=300,
    )
    resource_groups.acquire(group_name="slowq")
    t0 = time.time()
    with pytest.raises(WaitForResourceTimeout, match="WAIT_FOR_RESOURCE"):
        resource_groups.acquire(group_name="slowq")
    assert 0.2 <= time.time() - t0 < 5
    resource_groups.release(name="slowq")


def test_queued_statement_runs_after_release():
    resource_groups.create(
        "q1", max_concurrent_queries=1, max_queued=2,
        max_queued_waiting_ms=10000,
    )
    resource_groups.acquire(group_name="q1")
    order: list[str] = []

    def waiter():
        resource_groups.acquire(group_name="q1")
        order.append("waiter_ran")
        resource_groups.release(name="q1")

    t = threading.Thread(target=waiter, daemon=True)
    t.start()
    time.sleep(0.3)
    assert order == []  # still queued behind the running statement
    resource_groups.release(name="q1")
    t.join(timeout=10)
    assert order == ["waiter_ran"]
    g = resource_groups._groups["q1"]
    assert g.running == 0 and g.queued == 0
    assert g.queued_time_total_ms > 0


def test_hierarchy_parent_limits_children():
    resource_groups.create("root", max_concurrent_queries=1)
    resource_groups.create("a", parent="root", max_concurrent_queries=5,
                           max_queued=0)
    resource_groups.create("b", parent="root", max_concurrent_queries=5,
                           max_queued=0)
    resource_groups.acquire(group_name="a")
    with pytest.raises(ResourceNotEnough):  # parent slot is taken
        resource_groups.acquire(group_name="b")
    resource_groups.release(name="a")
    assert resource_groups.acquire(group_name="b") == "b"
    resource_groups.release(name="b")


def test_priority_ordered_drain():
    resource_groups.create("root2", max_concurrent_queries=1)
    resource_groups.create("lo", parent="root2", priority=5,
                           max_queued=4, max_queued_waiting_ms=10000)
    resource_groups.create("hi", parent="root2", priority=1,
                           max_queued=4, max_queued_waiting_ms=10000)
    resource_groups.acquire(group_name="lo")
    order: list[str] = []

    def run_in(group):
        resource_groups.acquire(group_name=group)
        order.append(group)
        time.sleep(0.1)
        resource_groups.release(name=group)

    t_lo = threading.Thread(target=run_in, args=("lo",), daemon=True)
    t_lo.start()
    time.sleep(0.2)  # lo waiter enqueued first...
    t_hi = threading.Thread(target=run_in, args=("hi",), daemon=True)
    t_hi.start()
    time.sleep(0.2)
    resource_groups.release(name="lo")  # ...but hi (priority 1) drains first
    t_lo.join(timeout=10)
    t_hi.join(timeout=10)
    assert order == ["hi", "lo"]


def test_set_resource_group_routing(spark):
    ch_sql(spark, "CREATE RESOURCE GROUP routed MAX_CONCURRENT_QUERIES 4")
    ch_sql(spark, "SET resource_group = 'routed'")
    assert resource_groups.current() == "routed"
    # a routed statement bumps running_time accounting
    ch_sql(spark, "SELECT 1 AS x FROM system.one").collect()
    g = resource_groups._groups["routed"]
    assert g.running == 0  # released on statement exit
    ch_sql(spark, "SET resource_group = ''")
    assert resource_groups.current() is None
    with pytest.raises(ValueError):
        ch_sql(spark, "SET resource_group = 'absent'")


def test_e2e_concurrent_admission(spark):
    def _sleep(x):
        time.sleep(0.5)
        return int(x)

    spark.udf.register("py_sleep_rg", _sleep, "bigint")
    ch_sql(
        spark,
        "CREATE RESOURCE GROUP rge MAX_CONCURRENT_QUERIES 1 MAX_QUEUED 0",
    )
    state: dict = {}

    def work():
        resource_groups.set_current("rge")  # thread-local routing
        try:
            # eager via the max_result_rows probe → holds the slot
            ch_sql(
                spark,
                "SELECT number AS s FROM numbers(256) "
                "WHERE py_sleep_rg(number) >= 0 "
                "SETTINGS max_result_rows = 1000",
            )
        except BaseException as exc:  # noqa: BLE001
            state["exc"] = exc

    t = threading.Thread(target=work, daemon=True)
    t.start()
    deadline = time.time() + 15
    while time.time() < deadline:
        if resource_groups._groups["rge"].running >= 1:
            break
        time.sleep(0.05)
    assert resource_groups._groups["rge"].running == 1
    resource_groups.set_current("rge")
    with pytest.raises(ResourceNotEnough):
        ch_sql(spark, "SELECT 1 AS x FROM system.one")
    resource_groups.set_current(None)
    t.join(timeout=60)
    assert "exc" not in state, f"worker failed: {state.get('exc')}"
