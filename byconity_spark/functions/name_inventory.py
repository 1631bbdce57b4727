"""Unified reference-name inventory: every ByConity/ClickHouse function
name this engine covers, mapped to WHERE it is implemented.

Three implementation surfaces exist (the reference has one factory; Spark
splits by execution shape):
  * ``registry``   — Column-expression scalars/aggregates (``ch()``/
    ``ch_agg()``, functions/registry.py + registry_ext.py)
  * ``operator``   — DataFrame-level operators (dictGet probes, bitmap
    folds, behavioral/ML kernels, sketches) that need joins, grouping, or
    Arrow kernels
  * ``frontend``   — names additionally reachable from CH-dialect SQL via
    ``ch_sql`` rewrite rules

``inventory()`` returns {reference_name: (surface, impl_pointer)} — the
parity index COVERAGE.md's counts are computed from.
"""

from __future__ import annotations


# DataFrame-level behavioral/ML/sketch aggregates: reference name →
# implementation pointer (module:function).  These are the names the
# reference registers in src/AggregateFunctions whose semantics need
# grouped Arrow kernels or multi-step DataFrame plans here.
_OPERATOR_NAMES: dict[str, str] = {
    # funnels / retention / sequences (udafs/behavioral.py)
    "windowFunnel": "udafs.behavioral:window_funnel",
    "retention": "udafs.behavioral:retention",
    "retention2": "udafs.behavioral:retention2",
    "retention4": "udafs.behavioral:retention4",
    "retentionLoss": "udafs.behavioral:retention_loss",
    "sequenceMatch": "udafs.behavioral:sequence_match",
    "sequenceCount": "udafs.behavioral:sequence_count",
    "sequenceNextNode": "udafs.behavioral:sequence_next_node",
    "finderFunnel": "udafs.behavioral:finder_funnel",
    "finderFunnelStable": "udafs.behavioral:finder_funnel (sorted = stable)",
    "finderFunnelByTimes": "udafs.behavioral:finder_funnel_by_times",
    "finderGroupFunnel": "udafs.behavioral:finder_group_funnel",
    "finderGroupFunnelStable": "udafs.behavioral:finder_group_funnel",
    "finderGroupFunnelByTimes": "udafs.behavioral:finder_funnel_by_times",
    "funnelRep": "udafs.behavioral:funnel_rep",
    "funnelRepByTimes": "udafs.behavioral:funnel_rep (by_times flag)",
    "funnelRep2": "udafs.behavioral:funnel_rep2",
    "funnelRep2ByTimes": "udafs.behavioral:funnel_rep2",
    "funnelRep3": "udafs.behavioral:funnel_rep3",
    "funnelPathSplit": "udafs.behavioral:funnel_path_split",
    "funnelPathSplitByTimes": "udafs.behavioral:funnel_path_split_by_times",
    "pathSplit": "udafs.behavioral:path_split",
    "pathSplitR": "udafs.behavioral:path_split_reverse",
    "pathCount": "workloads.behavioral:beh_path_count",
    "sessionSplit": "udafs.behavioral:session_split",
    "sessionSplitR2": "udafs.behavioral:session_split_r2",
    "sessionAnalysis": "udafs.behavioral:session_analysis",
    "pageTime": "udafs.behavioral:page_time",
    "pageTime2": "udafs.behavioral:page_time (refer-type variant folds into"
                 " the same dwell plan)",
    "vSessionAnalysis": "udafs.behavioral:session_analysis (v-variant)",
    # AUC family
    "auc": "udafs.behavioral:auc (distributed exact rank)",
    "fastAuc": "udafs.behavioral:fast_auc",
    "fastAuc2": "udafs.behavioral:fast_auc2",
    "fastAuc3": "udafs.behavioral:fast_auc3 (state-layout sibling)",
    "fastPrevAuc2": "udafs.behavioral:fast_prev_auc2 (state-layout sibling)",
    "debiasAuc": "udafs.behavioral:debias_auc",
    "ecpmAuc": "udafs.behavioral:ecpm_auc",
    "regression_auc": "udafs.behavioral:reg_auc",
    "regression_auc2": "udafs.behavioral:regression_auc2",
    # attribution (udafs/attribution.py)
    "attribution": "udafs.attribution (multi-touch models)",
    "attributionAnalysis": "udafs.attribution:attribution_analysis",
    "attributionAnalysisFuse": "udafs.attribution:attribution_analysis_fuse",
    "attributionCorrelation": "udafs.attribution:attribution_correlation",
    # distributions / arrays / misc behavioral
    "userDistribution": "udafs.behavioral:user_distribution",
    "userDistributionMonthly": "udafs.behavioral:user_distribution_monthly",
    "distribution": "udafs.behavioral:user_distribution (base form)",
    "maxIntersections": "udafs.behavioral:max_intersections",
    "maxIntersectionsPosition":
        "udafs.behavioral:max_intersections (position column)",
    "genArray": "udafs.behavioral:gen_array",
    "genArrayMonth": "udafs.behavioral:gen_array_month",
    "countByGranularity": "udafs.behavioral:count_by_granularity",
    "slideMatchCount": "udafs.behavioral:slide_match_count",
    "lastRangeCount": "udafs.behavioral:last_range_count",
    "sparkbar": "workloads.behavioral:beh_sparkbar",
    "intervalLengthSum": "udafs.behavioral:interval_length_sum",
    "mannWhitneyUTest":
        "registry_ext (Column form) + udafs.behavioral:mann_whitney_u",
    "xirr": "udafs.behavioral:xirr",
    "exponentialMovingAverage": "udafs.behavioral:exponential_moving_average",
    # ML (udafs/mlmethod.py)
    "stochasticLinearRegression": "udafs.mlmethod (GD, ml_linear_gd)",
    "stochasticLogisticRegression": "udafs.mlmethod (GD, ml_logistic_gd)",
    "evalMLMethod": "udafs.mlmethod:eval_ml_method",
    "categoricalInformationValue": "workloads (agg_categorical_iv)",
    "ndcg": "workloads (agg_ndcg)",
    "meanZTest": "registry_ext (Column form) + workloads agg_mean_ztest",
    "ndv_buckets": "engine.stats (NdvBuckets pass in collect_stats)",
    "ndv_buckets_extend": "engine.stats (NdvBuckets pass in collect_stats)",
    # sketches (udafs/sketches.py)
    "uniqTheta": "udafs.sketches:theta_state/theta_estimate",
    "hllSketchUnion": "udafs.sketches:uniq_merge (HLL register merge)",
    "kllSketchEstimate": "registry quantileKll (percentile_approx stand-in)",
    "quantilesSketchEstimate": "registry quantilesTiming (stand-in)",
    # bitmaps (udafs/bitmaps.py — see bitmap_logic_names())
    "BitMapColumnOr": "udafs.bitmaps:bitmap_column_fold('or')",
    "BitMapColumnAnd": "udafs.bitmaps:bitmap_column_fold('and')",
    "BitMapColumnXor": "udafs.bitmaps:bitmap_column_fold('xor')",
    "BitMapColumnCardinality": "udafs.bitmaps:bitmap_column_cardinality",
    "BitMapColumnHas": "udafs.bitmaps:bitmap_column_has",
    "BitMapFromColumn": "udafs.bitmaps:group_bitmap",
    "BitmapCount": "udafs.bitmaps:bitmap_expression(count=True)",
    "BitmapExtract": "udafs.bitmaps:bitmap_expression",
    "BitmapMultiCount": "udafs.bitmaps:bitmap_expression (multi exprs)",
    "BitmapMultiExtract": "udafs.bitmaps:bitmap_expression (multi exprs)",
    "BitMapJoin": "udafs.bitmaps:bitmap_join",
    "BitMapJoinAndCard": "udafs.bitmaps:bitmap_join",
    "BitMapJoinAndCard2": "udafs.bitmaps:bitmap_join",
    "BitMapMaxLevel": "udafs.bitmaps:bitmap_max_level",
    "BitmapColumnDiff": "udafs.bitmaps:bitmap_column_diff",
    "groupBitmap": "udafs.bitmaps:group_bitmap",
    "groupBitmapAnd": "udafs.bitmaps:bitmap_column_fold('and')",
    "groupBitmapOr": "udafs.bitmaps:bitmap_column_fold('or')",
    "groupBitmapXor": "udafs.bitmaps:bitmap_column_fold('xor')",
}


def inventory() -> dict[str, tuple[str, str]]:
    """{reference_name: (surface, impl_pointer)} across all three
    implementation surfaces.  Registry names win for duplicates (they are
    the most directly callable form)."""
    from byconity_spark.functions import registry as R
    from byconity_spark.operators.dictionary import dict_typed_names

    out: dict[str, tuple[str, str]] = {}
    for name, ptr in _OPERATOR_NAMES.items():
        out[name] = ("operator", ptr)
    for name, ptr in dict_typed_names().items():
        out[name] = ("operator", f"operators.dictionary:{ptr}")
    try:
        from byconity_spark.udafs.bitmaps import bitmap_logic_names
        for name, ptr in bitmap_logic_names().items():
            out.setdefault(name, ("operator", f"udafs.bitmaps:{ptr}"))
    except Exception:
        pass
    from byconity_spark.operators.geobase import geobase_names
    for name, ptr in geobase_names().items():
        out.setdefault(name, ("operator", ptr))
    # DataFrame-level names implemented in registry.py / workloads whose
    # Column form is not expressible as one aggregate expression
    out.setdefault("entropy", ("operator", "functions.registry:entropy"))
    # round-7 second pass: scalar arrayJoin rewrites to a lateral view in
    # the SQL frontend; runningConcurrency is the event-stream operator
    out.setdefault(
        "arrayJoin", ("frontend", "frontend.sql:_rewrite_arrayjoin_calls")
    )
    out.setdefault(
        "runningConcurrency",
        ("operator", "operators.windows:running_concurrency"),
    )
    # merge-state variants of the attribution kernels: the DataFrame plans
    # recompute from partials, covering the -Merge consumption path
    out.setdefault("attributionAnalysisMerge",
                   ("operator", "udafs.attribution:attribution_analysis"))
    out.setdefault("attributionCorrelationMerge",
                   ("operator", "udafs.attribution:attribution_correlation"))
    out.setdefault("attributionCorrelationFuse",
                   ("operator", "udafs.attribution:attribution_correlation"))
    # sketch-union / stack-merge companions of the existing stand-ins
    out.setdefault("quantilesSketchUnion",
                   ("operator", "registry quantilesTiming recompute "
                                "(stand-in, like quantilesSketchEstimate)"))
    out.setdefault("doubleHllSketchEstimate",
                   ("operator", "udafs.sketches HLL estimate (double form)"))
    out.setdefault("doubleQuantilesSketchEstimate",
                   ("operator", "registry quantilesTiming (stand-in)"))
    out.setdefault("MergeStreamStack",
                   ("operator", "workloads.behavioral stackGraph plan "
                                "(merge companion)"))
    names = R.registered_names()
    for name in names["scalar"]:
        out[name] = ("registry", "functions.registry SCALAR")
    for name in names["aggregate"]:
        out[name] = ("registry", "functions.registry AGG")
    return out


def parity_report() -> dict[str, int]:
    """Counts of reference-registered names covered exact-name, for
    COVERAGE.md."""
    import os
    import re

    inv = inventory()
    covered = set(inv)

    def scan(root: str, patterns: list[str]) -> set[str]:
        names: set[str] = set()
        pats = [re.compile(p) for p in patterns]
        for dirpath, _dirs, files in os.walk(root):
            for f in files:
                if not f.endswith((".cpp", ".h")):
                    continue
                try:
                    txt = open(os.path.join(dirpath, f), errors="ignore").read()
                except OSError:
                    continue
                for pat in pats:
                    for m in pat.finditer(txt):
                        for g in m.groups():
                            if g:
                                names.add(g)
        return names

    ref = "/root/reference/src"
    if not os.path.isdir(ref):
        return {"covered_names": len(covered)}
    fn = scan(os.path.join(ref, "Functions"), [
        r'factory\.registerFunction[^(]*\(\s*"([A-Za-z0-9_]+)"',
        r'registerFunction<[^>]*>\(\s*"([A-Za-z0-9_]+)"',
        r'registerAlias\(\s*"([A-Za-z0-9_]+)"',
        r'static constexpr auto name = "([A-Za-z0-9_]+)"',
    ])
    ag = scan(os.path.join(ref, "AggregateFunctions"), [
        r'registerFunction\(\s*"([A-Za-z0-9_]+)"',
        r'registerAlias\(\s*"([A-Za-z0-9_]+)"',
    ])
    return {
        "covered_names": len(covered),
        "ref_function_names": len(fn),
        "ref_function_covered": len(fn & covered),
        "ref_aggregate_names": len(ag),
        "ref_aggregate_covered": len(ag & covered),
    }
