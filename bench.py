#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed with the built-in noop sink
(``df.write.format("noop")``), which eagerly computes EVERY column of every
row and discards the result — the measured time covers scan + shuffle +
aggregation, exactly the "not Python-side row conversion" contract this
harness has always stated.  MEASUREMENT FIX (round 12, declared in
OPTIMIZATION_r12.md with the old numbers): earlier rounds timed
``.collect()``, which for the few queries returning 100k-300k rows was
dominated by driver-side row pickling (e.g. fn_math_cond_suite: 0.56 s
compute vs 2.58 s collect) — the opposite of the stated intent.  The noop
sink applies uniformly to every query, not selectively.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)/?$", sf_dir)
    sf = m.group(1) if m else sf_dir

    from byconity_spark import get_spark
    from byconity_spark.workloads import all_queries

    spark = get_spark(app_name="byconity-spark-bench")

    qdefs = all_queries()
    timings: dict[str, float] = {}
    # warm up the JVM + parquet footer cache with the cheapest query once
    try:
        qdefs["q6_forecast_revenue"].builder(spark, sf_dir).collect()
    except Exception:
        pass
    # Warm the Python/Arrow UDF infrastructure too (worker pool spawn +
    # first Arrow codegen, a one-off ~2-3 s): without this the cost lands
    # on whichever query first touches a pandas UDF — alphabetically
    # agg_advanced_stats, which measured ~4.6 s in BENCH_r11 vs ~0.7 s
    # steady-state.  Measurement-hygiene fix per the optimization guide
    # §1 (time the engine, not one-time process setup); old numbers are
    # preserved in OPTIMIZATION_r12.md.
    try:
        import pandas as _pd  # noqa: F401
        from pyspark.sql import functions as _F

        @_F.pandas_udf("double")
        def __warm(v: _pd.Series) -> _pd.Series:
            return v

        spark.range(64).select(
            __warm(_F.col("id").cast("double"))
        ).collect()
        spark.range(64).withColumn("g", _F.col("id") % 2).groupBy(
            "g"
        ).applyInPandas(lambda p: p, "id long, g long").collect()
    except Exception:
        pass

    def run_query(qd) -> None:
        # noop sink: full materialization of every column, no driver
        # round trip (guide §1.4)
        qd.builder(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    total = 0.0
    failed: list[str] = []
    for name, qd in sorted(qdefs.items()):
        t0 = time.perf_counter()
        try:
            run_query(qd)
            dt = time.perf_counter() - t0
        except Exception as exc:  # pragma: no cover - bench must not die
            print(f"[bench] {name} FAILED: {exc}", file=sys.stderr)
            dt = None
            failed.append(name)
        timings[name] = round(dt, 4) if dt is not None else None
        if dt is not None:
            total += dt

    # like-for-like comparison point vs BENCH_r01 (which ran only these 7)
    R01_HEADLINE = [
        "q1_pricing_summary",
        "q3_shipping_priority",
        "q5_local_supplier_volume",
        "q6_forecast_revenue",
        "q10_returned_items",
        "q14_promo_effect",
        "q18_large_volume_customer",
    ]
    headline = sum(timings.get(q) or 0.0 for q in R01_HEADLINE)

    # Warm (rep 1) pass for the headline set plus any query whose cold time
    # exceeds 1.5 s: separates steady-state engine work from one-off codegen/
    # scan-footer costs, so run-variance in the cold numbers (e.g. r04→r05
    # headline 3.09→3.37 s noise) is self-evident in the artifact.
    warm: dict[str, float] = {}
    rerun = [
        n for n in timings
        if n in R01_HEADLINE or (timings[n] is not None and timings[n] > 1.5)
    ]
    # min of 3 reps for the headline set (min of N is the least-contended
    # measurement): headline queries are sub-second each, so machine noise
    # (co-tenant load, GC) dominates a single rep and made r04→r06 cold
    # numbers jump ±20%; three reps brought builder-side repeat variance
    # under ±5%
    reps = 3
    for name in sorted(rerun):
        best = None
        for _ in range(reps if name in R01_HEADLINE else 1):
            t0 = time.perf_counter()
            try:
                run_query(qdefs[name])
            except Exception:
                break
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        if best is not None:
            warm[name] = round(best, 4)
    headline_warm = sum(warm.get(q) or 0.0 for q in R01_HEADLINE)

    # availableNow streaming queries pay a fixed per-query startup cost
    # (checkpoint dir + query planning, ~1.5 s) that is NOT engine work;
    # report the actual micro-batch processing time separately so stream
    # regressions aren't masked by harness startup.
    stream_detail: dict[str, dict[str, float]] = {}
    try:
        from byconity_spark.workloads.streaming_suite import LAST_BATCH_SECONDS

        for qname, batch_s in LAST_BATCH_SECONDS.items():
            wall = timings.get(qname)
            if wall is not None:
                stream_detail[qname] = {
                    "wall": wall,
                    "batch": batch_s,
                    "startup": round(max(wall - batch_s, 0.0), 4),
                }
    except Exception:
        pass

    detail = {
        "metric": "workload_total_wall",
        "value": round(total, 4),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "n_queries": len(timings),
        # query count grows round over round; the mean keeps totals
        # comparable (headline_tpch7_wall is the fixed-set anchor)
        "mean_query_wall": round(
            total / max(sum(1 for v in timings.values() if v is not None), 1), 4
        ),
        "headline_tpch7_wall": round(headline, 4),
        "headline_tpch7_warm": round(headline_warm, 4),
        "queries_warm": warm,
        "stream_detail": stream_detail,
    }
    if failed:
        detail["failed"] = failed

    # The driver captures only a ~2000-char TAIL of merged output, so the
    # final JSON line must stay small: full per-query detail goes to a file
    # (and to stdout EARLIER, where truncation doesn't matter), and the last
    # line is a compact summary with the headline numbers plus the slowest
    # queries (so the artifact alone still shows where time goes).
    os.makedirs(".dev", exist_ok=True)
    with open(".dev/bench_detail.json", "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)
    print("[bench] full detail: .dev/bench_detail.json")
    print("[bench-detail] " + json.dumps(detail))

    top = dict(
        sorted(
            ((k, v) for k, v in timings.items() if v is not None),
            key=lambda kv: -kv[1],
        )[:8]
    )
    out = {
        "metric": "workload_total_wall",
        "value": detail["value"],
        "unit": "sec",
        "sf": detail["sf"],
        "n_queries": detail["n_queries"],
        "mean_query_wall": detail["mean_query_wall"],
        "headline_tpch7_wall": detail["headline_tpch7_wall"],
        "headline_tpch7_warm": detail["headline_tpch7_warm"],
        "failed_count": len(failed),
        "queries": {q: timings.get(q) for q in R01_HEADLINE},
        "slowest": top,
        "detail_file": ".dev/bench_detail.json",
    }
    if failed:
        out["failed"] = failed[:5]

    # The JSON line MUST be the absolute last thing in merged stdout+stderr:
    # the driver captures both streams and tails the output, and a Spark
    # StateStore maintenance-thread stacktrace landing after the JSON made
    # BENCH_r02..r07 unparseable. Order: stop every active streaming query,
    # stop the session, give async JVM log threads a beat to drain, flush
    # both streams, THEN print.
    try:
        for q in spark.streams.active:
            try:
                q.stop()
            except Exception:
                pass
    except Exception:
        pass
    try:
        spark.stop()
    except Exception:
        pass
    time.sleep(2.0)  # let any in-flight JVM shutdown logging hit stderr first
    sys.stdout.flush()
    sys.stderr.flush()
    line = json.dumps(out)
    if len(line) > 1900:  # driver tails 2000 chars; never exceed it
        out.pop("slowest", None)
        out.pop("queries", None)
        line = json.dumps(out)
    print(line, flush=True)
    # hard-exit: sys.exit would run py4j atexit hooks whose stray logging
    # could land AFTER the JSON line and re-break the driver's parse
    os._exit(1 if failed else 0)


if __name__ == "__main__":
    main()
