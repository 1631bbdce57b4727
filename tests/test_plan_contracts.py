"""Plan-shape contract tests — the 100 TB design assertions, pinned:
filters reach the parquet scan, group-limits push below shuffles, equi
joins never degrade to cartesian products, and no SF-linear table carries a
forced broadcast hint (AQE/threshold decides from runtime sizes)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from byconity_spark.engine.catalog import load_table
from byconity_spark.workloads import all_queries
from tests.conftest import SF_DIR


def _plan(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_pushed_filters_reach_scan(spark):
    q6 = all_queries()["q6_forecast_revenue"].builder(spark, SF_DIR)
    plan = _plan(q6)
    assert "PushedFilters" in plan
    assert "l_shipdate" in plan.split("PushedFilters")[1][:400]


def test_limit_by_uses_window_group_limit(spark):
    """row_number()<=n per key must compile to a partial group-limit below
    the shuffle (InferWindowGroupLimit — ByConity
    FilterWindowToPartitionTopN.h analogue)."""
    q = all_queries()["op_limit_by_segment_top3"].builder(spark, SF_DIR)
    assert "WindowGroupLimit" in _plan(q)


def test_limit_with_ties_no_global_window(spark):
    """LIMIT WITH TIES must use the boundary-broadcast plan: distributed
    top-n + map-side filter, never a `rank() OVER ()` global window (one
    partition holding the whole table at 100 TB)."""
    df = all_queries()["op_limit_ties_quantity"].builder(spark, SF_DIR)
    plan = _plan(df)
    assert "Window" not in plan, "global window reintroduced in WITH TIES"


def test_equi_joins_never_cartesian(spark):
    for name in ["q3_shipping_priority", "q5_local_supplier_volume", "llm_minhash_dedup"]:
        plan = _plan(all_queries()[name].builder(spark, SF_DIR))
        assert "CartesianProduct" not in plan, f"{name} degraded to cartesian"


def test_no_forced_broadcast_of_linear_tables():
    """Source-level contract: customer/supplier/part/orders/lineitem never
    get an explicit broadcast() hint (they grow with SF)."""
    import pathlib
    import re

    bad = []
    for p in pathlib.Path("byconity_spark/workloads").glob("*.py"):
        src = p.read_text()
        for m in re.finditer(r"F\.broadcast\((\w+)\)", src):
            arg = m.group(1)
            if arg in {"c", "cust", "customer", "s", "sup", "supplier", "p", "part", "o", "orders", "l", "li", "lineitem"}:
                bad.append(f"{p.name}: broadcast({arg})")
    assert not bad, bad


def test_topn_fuses_take_ordered(spark):
    q3 = all_queries()["q3_shipping_priority"].builder(spark, SF_DIR)
    assert "TakeOrderedAndProject" in _plan(q3)


def test_trivial_count_reads_no_data(spark):
    """trivial_count must not produce a parquet scan node at all."""
    from byconity_spark.plans.trivial_count import table_row_count

    df = table_row_count(spark, SF_DIR, "lineitem")
    assert "FileScan parquet" not in _plan(df)
    n_scan = load_table(spark, SF_DIR, "lineitem").count()
    assert df.collect()[0].n_rows == n_scan


def test_cbo_join_reorder_plan(spark):
    """With ANALYZE stats + cbo.joinReorder, the optimizer must NOT keep the
    syntactic lineitem-first order: customer⋈nation builds first."""
    from byconity_spark.engine.stats import register_stats_tables, table_row_stats

    sf = "/root/testdata/sf0.001"
    register_stats_tables(
        spark, sf, ["lineitem", "orders", "customer", "nation"], column_stats=False
    )
    assert table_row_stats(spark, "cbo_lineitem") > 0
    assert table_row_stats(spark, "cbo_nation") == 25
    df = spark.sql(
        """
        SELECT n_name, count(*) AS n
        FROM cbo_lineitem
        JOIN cbo_orders   ON l_orderkey = o_orderkey
        JOIN cbo_customer ON o_custkey = c_custkey
        JOIN cbo_nation   ON c_nationkey = n_nationkey
        GROUP BY n_name
        """
    )
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    # syntactic order would scan lineitem first (outermost-left); the CBO
    # plan joins it last, so customer appears before lineitem in the tree
    assert plan.index("cbo_customer") < plan.index("cbo_lineitem")


def test_auc_has_no_global_single_partition_sort(spark):
    """AUC must rank via range partitioning + in-partition indexes, never an
    empty-partition-spec Window over the full events table (a
    single-partition sort that serializes the dataset at scale)."""
    q = all_queries()["beh_auc"].builder(spark, SF_DIR)
    plan = _plan(q)
    assert "rangepartitioning" in plan.lower()
    assert "monotonically_increasing_id" in plan


def test_stats_broadcast_hint_applies(spark):
    """The ANALYZE-stats estimate must turn the filtered dim side into a
    BroadcastHashJoin at plan time (SetJoinDistribution analogue)."""
    from byconity_spark.plans.explain import assert_plan

    q = all_queries()["cbo_stats_broadcast"].builder(spark, SF_DIR)
    assert_plan(q, requires_broadcast_join=True, no_cartesian=True)


def test_stats_estimates_sane(spark):
    from byconity_spark.engine.stats import analyze_table, estimate_rows

    st = analyze_table(spark, SF_DIR, "customer", refresh=True)
    exact = load_table(spark, SF_DIR, "customer").count()
    assert st.row_count == exact
    eq_est = estimate_rows(st, [("c_custkey", "=", 1)])
    assert 0 < eq_est <= 2  # 1/ndv of a near-unique key
    range_est = estimate_rows(st, [("c_acctbal", ">", st.columns["c_acctbal"].min)])
    assert range_est > exact * 0.9  # > min keeps nearly everything


def test_runtime_bloom_filter_injects(spark):
    """Runtime (bloom) filters — ByConity AddRuntimeFilters.h analogue
    (#23): with a selective build side, Catalyst must inject a
    bloom_filter_agg on the creation side and a might_contain probe on the
    big-table scan side.  Size thresholds are lowered for the small test
    fixture; at 100 TB the defaults trigger on real selectivity."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10GB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        o = load_table(spark, SF_DIR, "orders").filter(
            F.col("o_totalprice") > 400000
        )
        li = load_table(spark, SF_DIR, "lineitem")
        j = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        plan = _plan(j).lower()
        assert "bloom_filter_agg" in plan or "might_contain" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_mann_whitney_no_raw_row_global_window(spark):
    """Ranks must derive from the distinct-value frame: no window may
    consume the raw-row scan through a SinglePartition exchange (the
    distinct-value prefix is partitioned by __pid; only the bounded
    per-partition offset frame — one row per partition — meets a single
    task)."""
    from byconity_spark.udafs.behavioral import mann_whitney_u

    ev = load_table(spark, SF_DIR, "events")
    df = mann_whitney_u(ev, [], "value", F.col("event_type") == "purchase")
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re

    for m in re.finditer(r"Window \[[^\]]*row_number[^\]]*\]", plan):
        raise AssertionError(f"raw row_number window in plan: {m.group(0)[:80]}")
    # any unpartitioned window must sit above a HashAggregate (distinct
    # values or per-partition totals), never directly above the scan
    assert "Scan parquet" in plan


def test_attribution_kernel_is_bucketed(spark):
    """The attribution partials kernel must group by the size-adaptive
    user bucket, not per-user (15k tiny Arrow groups are overhead-bound)."""
    from byconity_spark.udafs.attribution import attribution_analysis_partials

    ev = load_table(spark, SF_DIR, "events")
    df = attribution_analysis_partials(
        ev, target_event="purchase", touch_events=["click"], back_time_ms=1000
    )
    plan = df._jdf.queryExecution().analyzed().toString()
    assert "__b" in plan  # bucket column drives the groupBy


def test_connected_components_small_graph_single_pass(spark):
    """Below the driver-union-find threshold the CC plan must not contain
    the iterative join loop (no repeated label-propagation joins)."""
    from byconity_spark.llm.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    ids = spark.range(0, 20).select(F.col("id"))
    out = connected_components(pairs, ids)
    comp = {r.id: r.comp for r in out.collect()}
    assert comp[1] == comp[2] == comp[3] == 1
    assert comp[10] == comp[11] == 10
    assert comp[5] == 5


def test_contamination_broadcasts_benchmark_not_corpus(spark):
    """The contamination screen must broadcast ONLY the benchmark gram side
    (bounded); the corpus side streams — and the inferred size>0 filter
    must NOT re-inline the shingle construction below the exchange (it
    would run the whole 8-gram build single-threaded at the scan)."""
    df = all_queries()["llm_contamination"].builder(spark, SF_DIR)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # scan-side filters must not contain the shingle machinery
    for scan_chunk in plan.split("FileScan")[1:]:
        head = scan_chunk[:600]
        assert "array_join" not in head.lower(), (
            "shingle construction leaked into a scan-side pushed filter"
        )


def test_seq_packing_has_no_global_window(spark):
    """Packing cumsums per SHARD — a global (unpartitioned) window would
    serialize the whole corpus through one task at 100 TB."""
    df = all_queries()["llm_seq_packing"].builder(spark, SF_DIR)
    plan = _plan(df)
    assert "Window" in plan
    import re

    # every Window's partition spec must be non-empty (no `Window [..], [],`)
    for m in re.finditer(r"partitionBy=\[\]", plan):
        raise AssertionError("global window in seq packing plan")
    assert "SinglePartition" not in plan


def test_bm25_broadcasts_metadata_sides(spark):
    """df/avgdl are metadata-scale; the doc-length join stays a shuffle
    join but the stats/df sides must broadcast."""
    df = all_queries()["llm_bm25"].builder(spark, SF_DIR)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_quantize_matryoshka_are_pure_projections(spark):
    """Quantization/truncation are per-row — no exchange belongs in the
    plan (any shuffle would be pure overhead at scale)."""
    for name in ["ann_quantize_int8", "ann_matryoshka16"]:
        plan = _plan(all_queries()[name].builder(spark, SF_DIR))
        assert "Exchange" not in plan, f"{name} shuffles a per-row transform"


def test_partition_prune_reaches_directory_filter(spark):
    """A filter on the hive-partition column must appear as a
    PartitionFilters entry on the scan (directory pruning — the MergeTree
    partition-pruning analogue), not just a row-level filter."""
    df = all_queries()["write_partition_prune"].builder(spark, SF_DIR)
    plan = _plan(df)
    scan = plan.split("PartitionFilters")
    assert len(scan) > 1, "no PartitionFilters on the partitioned scan"
    assert "o_orderstatus" in scan[1][:300]


def test_hive_external_prunes_both_partition_levels(spark):
    """source_hive_external filters on BOTH discovered partition columns;
    both must reach PartitionFilters (subtree pruning, no file opened
    outside o_orderstatus=F/o_year=1995)."""
    df = all_queries()["source_hive_external"].builder(spark, SF_DIR)
    plan = _plan(df)
    scan = plan.split("PartitionFilters")
    assert len(scan) > 1, "no PartitionFilters on the hive-layout scan"
    head = scan[1][:400]
    assert "o_orderstatus" in head and "o_year" in head


# ----------------------------------------------- round-6 extension suites
def test_mysql_time_suite_filter_pushed(spark):
    """fn_mysql_time_suite's o_orderkey % 7 filter must at least prune
    columns at the scan (ReadSchema) and keep the modulo filter above a
    columnar scan, never a full-row parse."""
    plan = _plan(all_queries()["fn_mysql_time_suite"].builder(spark, SF_DIR))
    assert "ReadSchema" in plan
    read = plan.split("ReadSchema")[1][:400]
    assert "o_comment" not in read  # column pruning held


def test_vector_suite_scan_prunes_columns(spark):
    plan = _plan(all_queries()["fn_vector_suite"].builder(spark, SF_DIR))
    assert "ReadSchema" in plan
    assert "label" not in plan.split("ReadSchema")[1][:300]


def test_theta_setops_no_cartesian_blowup(spark):
    """The crossJoins in agg_theta_setops only combine SINGLE-ROW aggregated
    states (one per event type) — each branch re-reads the filtered scan
    (unpersisted subtree duplication, ≤ 2 scans per state side), and no
    join may sit below an aggregation (that would be a real cartesian)."""
    plan = _plan(all_queries()["agg_theta_setops"].builder(spark, SF_DIR))
    assert plan.count("Scan parquet") <= 6
    # every join input is a FlatMapGroupsInPandas (aggregated state), so a
    # nested-loop join above them is 1x1; a SortMergeJoin of raw scans is not
    assert "SortMergeJoin" not in plan


def test_parity_ext_suite_single_shuffle(spark):
    """agg_parity_ext_suite: one groupBy on event_type — the aggregate must
    shuffle once (plus the bounded-sample scan), not per-statistic."""
    plan = _plan(all_queries()["agg_parity_ext_suite"].builder(spark, SF_DIR))
    assert plan.count("Exchange hashpartitioning(event_type") <= 2


def test_h3_suite_stays_jvm_side(spark):
    """The H3 index math is pure bitwise Column expressions — the plan must
    contain NO Python evaluation node (at 100 TB these run inside
    whole-stage codegen on the scan)."""
    df = all_queries()["fn_h3_suite"].builder(spark, SF_DIR)
    plan = _plan(df)
    assert "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan


def test_region_suite_broadcasts_hierarchy(spark):
    """Every region* probe is a broadcast of the tiny hierarchy — the fact
    side must never SortMergeJoin (which would shuffle all customers per
    probe at scale)."""
    df = all_queries()["dict_region_suite"].builder(spark, SF_DIR)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_s2_suite_single_arrow_kernel_per_call(spark):
    """geoToS2 is one Arrow-batched kernel over the scan (no row-at-a-time
    PythonUDF node)."""
    df = all_queries()["fn_s2_suite"].builder(spark, SF_DIR)
    plan = _plan(df)
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan


def test_lbs_filter_suite_stays_jvm_side_no_shuffle(spark):
    """The LBS geo-filter family unrolls to Column OR-chains — the plan
    must be a single scan+project with no Python node and no exchange
    (at 100 TB these predicates run inside whole-stage codegen)."""
    df = all_queries()["fn_lbs_filter_suite"].builder(spark, SF_DIR)
    plan = _plan(df)
    assert "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan
    assert "Exchange" not in plan


def test_row_policy_filter_reaches_scan(spark):
    """Row-policy enforcement (engine/access.py) is a view swap whose
    predicate Catalyst must push into the parquet scan — secured reads
    cost the same as filtered reads at any scale."""
    from byconity_spark.engine.access import access_control
    from byconity_spark.engine.catalog import register_views
    from byconity_spark.frontend import ch_sql

    access_control.reset()
    register_views(spark, SF_DIR)
    try:
        ch_sql(
            spark,
            "CREATE ROW POLICY plan_p ON orders "
            "USING o_orderstatus = 'F' TO ALL",
        )
        plan = _plan(ch_sql(spark, "SELECT count(*) AS n FROM orders"))
        scan = plan.split("PushedFilters")[1][:400]
        assert "o_orderstatus" in scan
    finally:
        access_control.reset()


def test_projection_rewrite_reads_rollup_not_fact(spark):
    """A matching aggregate must be answered from the materialized rollup
    (engine/projections.py) — the fact table path must not appear in the
    physical plan."""
    from byconity_spark.engine.catalog import register_views
    from byconity_spark.engine.projections import projections
    from byconity_spark.frontend import ch_sql

    projections.clear()
    register_views(spark, SF_DIR)
    try:
        ch_sql(
            spark,
            "CREATE TABLE plan_pj AS SELECT o_orderstatus, o_custkey "
            "FROM orders",
        )
        ch_sql(
            spark,
            "ALTER TABLE plan_pj ADD PROJECTION p ("
            "SELECT o_orderstatus, count(o_custkey) AS n "
            "GROUP BY o_orderstatus)",
        )
        df = ch_sql(
            spark,
            "SELECT o_orderstatus, count(o_custkey) AS n FROM plan_pj "
            "GROUP BY o_orderstatus",
        )
        plan = _plan(df)
        assert "bspark_proj_" in plan  # the rollup parquet path
        assert "orders.parquet" not in plan  # fact table untouched
    finally:
        projections.clear()
        ch_sql(spark, "DROP TABLE IF EXISTS plan_pj")


def test_source_cap_uses_window_group_limit(spark):
    """cap_per_source's skew-safety claim: Spark must plan a
    WindowGroupLimit (rank pushed below the sort, per-key state bounded
    at max_per_source) and exactly one exchange."""
    from byconity_spark.llm.dedup import cap_per_source

    docs = load_table(spark, SF_DIR, "documents")
    plan = cap_per_source(docs, max_per_source=5)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "WindowGroupLimit" in plan
    assert plan.count("Exchange") == 1


# ------------------------------------------- round-7 DDL-surface contracts
def test_row_policy_predicate_pushes_to_scan(spark):
    """The RBAC row-policy filter is enforced as a view swap whose
    predicate must reach the parquet scan as PushedFilters — at 100 TB the
    policy costs a pushed predicate, not a post-scan filter pass."""
    from byconity_spark.engine.access import access_control
    from byconity_spark.engine.catalog import register_views
    from byconity_spark.frontend import ch_sql

    register_views(spark, SF_DIR)
    access_control.reset()
    try:
        ch_sql(spark, "CREATE USER pp_user")
        ch_sql(spark, "GRANT SELECT ON orders TO pp_user")
        ch_sql(
            spark,
            "CREATE ROW POLICY pp ON orders FOR SELECT "
            "USING o_orderstatus = 'F' TO pp_user",
        )
        ch_sql(spark, "SET SESSION USER pp_user")
        df = ch_sql(spark, "SELECT o_orderkey, o_totalprice FROM orders")
        plan = _plan(df)
        pushed = [
            ln for ln in plan.splitlines() if "PushedFilters" in ln
        ]
        assert pushed, "no PushedFilters on the policy-filtered scan"
        assert any("o_orderstatus" in ln for ln in pushed), pushed
    finally:
        access_control.reset()


def test_ttl_sweep_filter_pushes_to_scan(spark):
    """The TTL sweep at OPTIMIZE FINAL is plan algebra: with a pinned
    clock and a column-valued TTL expression the kept-rows predicate must
    reach the parquet scan (PushedFilters), not re-filter after a full
    read."""
    from byconity_spark.engine.catalog import register_views
    from byconity_spark.frontend import ch_sql
    from byconity_spark.frontend.sql import _TTL_NOW

    register_views(spark, SF_DIR)
    try:
        ch_sql(
            spark,
            "CREATE TABLE ttl_pp TTL o_orderdate AS "
            "SELECT o_orderkey, o_orderdate FROM orders",
        )
        ch_sql(spark, "SET ttl_now = '1995-06-01 00:00:00'")
        ch_sql(spark, "OPTIMIZE TABLE ttl_pp FINAL")
        plan = _plan(spark.table("ttl_pp"))
        pushed = [
            ln for ln in plan.splitlines() if "PushedFilters" in ln
        ]
        assert pushed, "no PushedFilters on the TTL-swept scan"
        assert any("o_orderdate" in ln for ln in pushed), pushed
    finally:
        _TTL_NOW[0] = None
        ch_sql(spark, "DROP TABLE IF EXISTS ttl_pp")
