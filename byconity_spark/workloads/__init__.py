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


# Queries certified green by a PRIOR round's driver run (CORRECTNESS_r01/r02
# first-50 cap).  They re-register LAST so a capped correctness run spends
# its budget on never-checked queries first.
_PREVIOUSLY_CERTIFIED = {
    "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier_volume",
    "q6_forecast_revenue", "q10_returned_items", "q14_promo_effect",
    "q18_large_volume_customer", "q4_order_priority", "q7_volume_shipping",
    "q13_customer_distribution", "q17_small_quantity_revenue",
    "q19_disjunctive_revenue", "q21_waiting_supplier",
    "q22_global_sales_opportunity", "q2_min_cost_supplier",
    "q12_priority_shipping", "q16_supplier_part_counts", "q20_bulk_suppliers",
    "q8_market_share", "q9_product_profit", "q15_top_supplier",
    "q11_important_stock", "op_asof_purchase_prior_click",
    "op_any_join_first_order", "op_limit_by_segment_top3",
    "op_with_totals_returnflag", "op_fill_hourly_purchases",
    "op_limit_ties_quantity", "op_quantified_above_all",
    "op_quantified_below_any", "cbo_join_reorder", "trivial_count_lineitem",
    "read_nothing", "values_inline_join", "numbers_range_agg",
    "rollup_revenue", "cube_status_priority", "explode_word_topk",
    "explode_outer_long_tokens", "set_union_distinct", "set_intersect_all",
    "set_except_nonbuyers", "distinct_segment_priority",
    "theta_join_nation_pairs", "join_using_nation_counts",
    "semi_anti_counts", "full_outer_customer_supplier",
    "smj_order_lineitem_totals", "sample_lineitem", "agg_uniq_suite",
}


def all_queries() -> dict[str, QueryDef]:
    # Import side-effect populates the registry.  ORDER MATTERS: the
    # verification driver caps its oracle run at the first N registered
    # queries.  Two levers maximize fresh signal under any cap:
    #   1. queries never certified by a prior driver round come FIRST;
    #   2. within each tier, families interleave ROUND-ROBIN (by name
    #      prefix) so a small cap still certifies every family.
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

    def family(name: str) -> str:
        return name.split("_", 1)[0]

    def round_robin(names: list[str]) -> list[str]:
        from collections import defaultdict

        by_fam: dict[str, list[str]] = defaultdict(list)
        for n in names:
            by_fam[family(n)].append(n)  # keeps registration order per family
        out: list[str] = []
        queues = list(by_fam.values())
        while queues:
            queues = [q for q in queues if q]
            for q in queues:
                if q:
                    out.append(q.pop(0))
        return out

    fresh = [n for n in _REGISTRY if n not in _PREVIOUSLY_CERTIFIED]
    certified = [n for n in _REGISTRY if n in _PREVIOUSLY_CERTIFIED]
    ordered = round_robin(fresh) + certified
    return {n: _REGISTRY[n] for n in ordered}
