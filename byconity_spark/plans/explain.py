"""Plan introspection surface — the EXPLAIN family as a user-facing API.

ByConity exposes EXPLAIN AST/SYNTAX/PLAN/PIPELINE (reference:
src/Parsers/ASTExplainQuery.h:36-54, src/Interpreters/
InterpreterExplainQuery.cpp); the Spark analogues are the explain modes plus
the formatted physical plan.  On top of the raw text this module parses the
plan PROPERTIES users actually assert about at 100 TB — did the filter reach
the parquet scan, which join strategies got picked, how many exchanges, is
anything single-partition — and `assert_plan` turns them into a contract.

The SQL surface accepts ``EXPLAIN [AST|SYNTAX|PLAN|PIPELINE] <query>``
through the ClickHouse frontend and returns the plan as rows (CH behavior).
"""

from __future__ import annotations

import contextlib
import io
import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

# ASTExplainQuery.h kind -> Spark explain mode
_EXPLAIN_MODES = {
    "AST": "simple",  # parsed tree: closest is the analyzed simple plan
    "SYNTAX": "extended",  # post-rewrite logical plans
    "PLAN": "formatted",  # optimized physical plan with scan details
    "PIPELINE": "codegen",  # execution pipeline: whole-stage codegen units
    "ESTIMATE": "cost",  # stats-annotated logical plan
}


def explain_ch(df: DataFrame, kind: str = "PLAN") -> str:
    """EXPLAIN text for a DataFrame in the requested ClickHouse kind."""
    mode = _EXPLAIN_MODES.get(kind.upper())
    if mode is None:
        raise ValueError(
            f"unknown EXPLAIN kind {kind!r}; one of {sorted(_EXPLAIN_MODES)}"
        )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


@dataclass
class PlanProperties:
    """Parsed scale-relevant properties of a physical plan."""

    pushed_filters: list[str] = field(default_factory=list)
    read_schemas: list[str] = field(default_factory=list)
    broadcast_hash_joins: int = 0
    sort_merge_joins: int = 0
    shuffled_hash_joins: int = 0
    broadcast_nested_loop_joins: int = 0
    cartesian_products: int = 0
    exchanges: int = 0
    single_partition_exchanges: int = 0
    range_partitionings: int = 0
    window_group_limits: int = 0
    codegen_stages: int = 0
    scans: int = 0

    @property
    def joins(self) -> int:
        return (
            self.broadcast_hash_joins
            + self.sort_merge_joins
            + self.shuffled_hash_joins
            + self.broadcast_nested_loop_joins
            + self.cartesian_products
        )


def plan_properties(df: DataFrame) -> PlanProperties:
    text = explain_ch(df, "PLAN")
    p = PlanProperties()
    p.pushed_filters = [
        m.group(1).strip()
        for m in re.finditer(r"PushedFilters:\s*\[([^\]]*)\]", text)
        if m.group(1).strip()
    ]
    p.read_schemas = [
        m.group(1).strip() for m in re.finditer(r"ReadSchema:\s*(\S+)", text)
    ]
    p.broadcast_hash_joins = len(re.findall(r"\bBroadcastHashJoin\b", text))
    p.sort_merge_joins = len(re.findall(r"\bSortMergeJoin\b", text))
    p.shuffled_hash_joins = len(re.findall(r"\bShuffledHashJoin\b", text))
    p.broadcast_nested_loop_joins = len(
        re.findall(r"\bBroadcastNestedLoopJoin\b", text)
    )
    p.cartesian_products = len(re.findall(r"\bCartesianProduct\b", text))
    p.exchanges = len(re.findall(r"\bExchange\b", text))
    p.single_partition_exchanges = len(re.findall(r"\bSinglePartition\b", text))
    p.range_partitionings = len(re.findall(r"\brangepartitioning\b", text.lower()))
    p.window_group_limits = len(re.findall(r"\bWindowGroupLimit\b", text))
    codegen_ids = {
        m.group(1) for m in re.finditer(r"codegen id : (\d+)", text)
    }
    # under AQE, codegen ids appear only once the adaptive plan is final
    # (isFinalPlan=true after an action) — 0 here means "not compiled yet"
    # for un-executed adaptive plans, not "interpreted"
    p.codegen_stages = len(codegen_ids)
    p.scans = len(re.findall(r"\bScan parquet\b|\bFileScan\b", text))
    return p


class PlanContractError(AssertionError):
    pass


def assert_plan(
    df: DataFrame,
    pushed_filter_on: str | None = None,
    no_cartesian: bool = False,
    no_single_partition_exchange: bool = False,
    requires_broadcast_join: bool = False,
    requires_window_group_limit: bool = False,
    max_exchanges: int | None = None,
) -> PlanProperties:
    """Assert scale-contract properties of a DataFrame's physical plan;
    returns the parsed properties on success."""
    p = plan_properties(df)
    errs = []
    if pushed_filter_on is not None and not any(
        pushed_filter_on in f for f in p.pushed_filters
    ):
        errs.append(
            f"no pushed filter mentions {pushed_filter_on!r} "
            f"(pushed: {p.pushed_filters})"
        )
    if no_cartesian and p.cartesian_products:
        errs.append(f"{p.cartesian_products} CartesianProduct node(s)")
    if no_single_partition_exchange and p.single_partition_exchanges:
        errs.append(
            f"{p.single_partition_exchanges} SinglePartition exchange(s) — "
            "a serialization point at scale"
        )
    if requires_broadcast_join and not p.broadcast_hash_joins:
        errs.append("no BroadcastHashJoin in plan")
    if requires_window_group_limit and not p.window_group_limits:
        errs.append("no WindowGroupLimit (group-limit not pushed below shuffle)")
    if max_exchanges is not None and p.exchanges > max_exchanges:
        errs.append(f"{p.exchanges} exchanges > allowed {max_exchanges}")
    if errs:
        raise PlanContractError("; ".join(errs))
    return p
