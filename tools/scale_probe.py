#!/usr/bin/env python
"""sf1 scale probe: synthesize a 10x replica of sf0.1 (join-consistent key
offsets) under /tmp and time the headline + most-expensive queries at both
scales.  Purpose: the per-round sf0.1 bench numbers are startup-dominated;
this probe exposes scan-bound behavior — a query whose sf0.1→sf1 growth is
super-linear (>12x) has a plan that will not survive a 100x scale-up.

Usage:  python tools/scale_probe.py [--rebuild]
Prints one JSON line {"sf01": {...}, "sf1": {...}, "ratio": {...}}.

The replica is a PROBE INPUT ONLY (never an oracle input): keys shift by
replica stride so joins stay 1:1-consistent; document text gets a replica
token so near-dup structure doesn't collapse into 10x exact duplicates.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
DST = "/tmp/bspark_sf1"
REPLICAS = 10

PROBE_QUERIES = [
    # fixed headline anchor (BENCH R01_HEADLINE)
    "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier_volume",
    "q6_forecast_revenue", "q10_returned_items", "q14_promo_effect",
    "q18_large_volume_customer",
    # the most expensive llm/ann family members per BENCH_r06
    "llm_dedup_keep_list", "ann_lsh_topk", "ann_ivfpq_topk",
    "llm_kmeans_clusters", "llm_minhash_dedup",
]

# per-table key columns that shift by replica stride (stride = 10^12 per
# key family keeps every FK->PK pair inside one replica)
KEY_OFFSETS = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
SMALL = ["region", "nation"]  # dimension tables stay single-copy
STRIDE = 10**12


def build(spark) -> None:
    from pyspark.sql import functions as F

    for t in SMALL:
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{DST}/{t}.parquet")
    for t, keys in KEY_OFFSETS.items():
        base = spark.read.parquet(f"{SRC}/{t}.parquet")
        reps = []
        for i in range(REPLICAS):
            r = base
            for k in keys:
                r = r.withColumn(k, F.col(k) + F.lit(i * STRIDE))
            if t == "documents" and i > 0:
                # interleave a replica token between every word: EVERY
                # shingle differs across replicas (cross-replica jaccard
                # ~0) while within-replica dup structure is preserved —
                # a trailing token alone left replicas ~0.95-jaccard
                # near-dups of each other and inflated pair counts 1000x
                r = r.withColumn(
                    "text",
                    F.regexp_replace(F.col("text"), " ", f" q{i}z "),
                )
            reps.append(r)
        out = reps[0]
        for r in reps[1:]:
            out = out.unionByName(r)
        out.write.mode("overwrite").parquet(f"{DST}/{t}.parquet")


def run(spark, qdefs, sf_dir: str) -> dict:
    times = {}
    for name in PROBE_QUERIES:
        t0 = time.perf_counter()
        try:
            qdefs[name].builder(spark, sf_dir).collect()
            times[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:
            print(f"[probe] {name}@{sf_dir} FAILED: {exc}", file=sys.stderr)
            times[name] = None
    return times


def main() -> None:
    from byconity_spark import get_spark
    from byconity_spark.workloads import all_queries

    spark = get_spark(app_name="byconity-spark-scale-probe")
    qdefs = all_queries()
    if "--rebuild" in sys.argv or not os.path.isdir(DST):
        build(spark)
    # warm both paths once so the comparison is steady-state vs steady-state
    qdefs["q6_forecast_revenue"].builder(spark, SRC).collect()
    qdefs["q6_forecast_revenue"].builder(spark, DST).collect()
    t01 = run(spark, qdefs, SRC)
    t1 = run(spark, qdefs, DST)
    ratio = {
        k: (round(t1[k] / t01[k], 2) if t01.get(k) and t1.get(k) else None)
        for k in PROBE_QUERIES
    }
    print(json.dumps({"sf01": t01, "sf1": t1, "ratio": ratio}))
    spark.stop()


if __name__ == "__main__":
    main()
