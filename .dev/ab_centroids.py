"""A/B: old posexplode elementwise_centroids vs new partial-sum version.

Checks, per SF:
  1. raw centroid max |delta| (ulp-level expected),
  2. ann_label_centroids / ann_pq_encode / ann_ivf_topk / ann_ivfpq_topk
     full-query outputs old-vs-new: exact equality of collected rows.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
from pyspark.sql import functions as F

from byconity_spark import get_spark
from byconity_spark.engine.catalog import load_table


def old_elementwise_centroids(embeddings, group_col="label", vec_col="embedding"):
    exploded = embeddings.select(group_col, F.posexplode(vec_col).alias("pos", "v"))
    per_dim = exploded.groupBy(group_col, "pos").agg(
        F.avg(F.col("v").cast("double")).alias("m")
    )
    pairs = per_dim.select(group_col, F.struct(F.col("pos"), F.col("m")).alias("pm"))
    return (
        pairs.groupBy(group_col)
        .agg(F.sort_array(F.collect_list("pm")).alias("pms"))
        .select(group_col, F.col("pms.m").alias("centroid"))
    )


def rows_key(rows):
    return sorted(tuple(r) for r in rows)


def main():
    import byconity_spark.llm.similarity as sim
    import byconity_spark.workloads.llm_pipeline as lp
    from byconity_spark.workloads import all_queries

    spark = get_spark(app_name="ab-centroids")
    qdefs = all_queries()
    new_fn = sim.elementwise_centroids

    for sfd in ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        emb = load_table(spark, sfd, "embeddings")
        old_c = {r["label"]: np.array(r["centroid"]) for r in
                 old_elementwise_centroids(emb).collect()}
        new_c = {r["label"]: np.array(r["centroid"]) for r in
                 new_fn(emb).collect()}
        assert set(old_c) == set(new_c), (sfd, "label sets differ")
        md = max(float(np.max(np.abs(old_c[k] - new_c[k]))) for k in old_c)
        print(f"[{sfd}] centroid max|delta| = {md:.3e}", flush=True)

        for qname in ("ann_label_centroids", "ann_pq_encode",
                      "ann_ivf_topk", "ann_ivfpq_topk"):
            qd = qdefs[qname]
            sim.elementwise_centroids = old_elementwise_centroids
            lp.elementwise_centroids = old_elementwise_centroids
            t0 = time.perf_counter()
            old_rows = rows_key(qd.builder(spark, sfd).collect())
            t_old = time.perf_counter() - t0
            sim.elementwise_centroids = new_fn
            lp.elementwise_centroids = new_fn
            t0 = time.perf_counter()
            new_rows = rows_key(qd.builder(spark, sfd).collect())
            t_new = time.perf_counter() - t0
            ok = old_rows == new_rows
            print(f"[{sfd}] {qname}: {'IDENTICAL' if ok else 'DIFF'} "
                  f"({len(old_rows)} rows) old={t_old:.2f}s new={t_new:.2f}s",
                  flush=True)
            if not ok:
                for a, b in zip(old_rows, new_rows):
                    if a != b:
                        print("  old:", a)
                        print("  new:", b)
                        break
                sys.exit(1)
    spark.stop()
    print("AB OK")


if __name__ == "__main__":
    main()
