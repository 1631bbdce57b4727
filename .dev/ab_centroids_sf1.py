"""sf1 perf A/B: old posexplode elementwise_centroids vs new partial-sum
version, on the /tmp/bspark_sf1 10x replica (probe input only).

Times, warm (2 reps, best): the centroid pass alone (noop sink) and the
three centroid-consuming ann queries end-to-end.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F


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


def timeit(fn, reps=2):
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


def main():
    import byconity_spark.llm.similarity as sim
    import byconity_spark.workloads.llm_pipeline as lp
    from byconity_spark import get_spark
    from byconity_spark.workloads import all_queries
    from tools.scale_probe import DST, build

    spark = get_spark(app_name="ab-centroids-sf1")
    if not os.path.isdir(DST):
        print("building sf1 replica...", flush=True)
        build(spark)
    qdefs = all_queries()
    new_fn = sim.elementwise_centroids
    emb = spark.read.parquet(f"{DST}/embeddings.parquet")
    n = emb.count()
    print(f"sf1 embeddings rows = {n}", flush=True)

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    for label, fn in (("old", old_elementwise_centroids), ("new", new_fn)):
        sim.elementwise_centroids = fn
        lp.elementwise_centroids = fn
        t_cent = timeit(lambda: noop(fn(emb)))
        res = {"centroids_alone": round(t_cent, 2)}
        for qname in ("ann_label_centroids", "ann_pq_encode",
                      "ann_ivf_topk", "ann_ivfpq_topk"):
            res[qname] = round(
                timeit(lambda: noop(qdefs[qname].builder(spark, DST))), 2
            )
        print(f"[{label}] {res}", flush=True)
    spark.stop()
    print("SF1 AB DONE")


if __name__ == "__main__":
    main()
