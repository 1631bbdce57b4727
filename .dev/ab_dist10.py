"""A/B: fused _dist10_pair (new, in tree) vs the old two-_dist10-join shape
for beh_attr_fuse + beh_attr_correlation at sf0.1.  Same session,
interleaved, min-of-3 warm, noop sink; asserts row-identical output first.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F, Window  # noqa: E402

from byconity_spark.engine.session import get_spark  # noqa: E402
from byconity_spark.engine.catalog import load_table  # noqa: E402
from byconity_spark.udafs import attribution as at  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
_BACK_3D_MS = 3 * 86_400_000

spark = get_spark()
events = load_table(spark, SF_DIR, "events")


def parts_fuse():
    return at.attribution_analysis_partials(
        events, target_event="purchase", touch_events=["click", "view"],
        back_time_ms=_BACK_3D_MS, mode=2, other_transform=True)


def parts_corr():
    return at.attribution_analysis_partials(
        events, target_event="purchase", touch_events=["click", "view"],
        back_time_ms=_BACK_3D_MS, mode=2, other_transform=False)


def old_fuse(partials):
    """Previous shape: two separate _dist10 chains left-joined."""
    partials = partials.persist()
    agg = partials.groupBy("touch_event", "touch_attr").agg(
        F.sum("click_cnt").alias("click_cnt"),
        F.sum("valid_cnt").alias("valid_transform_cnt"),
        F.sum("value").alias("value"),
    )
    keys = ["touch_event", "touch_attr"]
    occ_t = partials.select(*keys, F.explode("times").alias("t"))
    occ_s = partials.select(*keys, F.explode("steps").alias("s"))
    total = agg.agg(F.sum("value").alias("total_value"))
    return (
        agg.crossJoin(F.broadcast(total))
        .withColumn(
            "valid_transform_ratio",
            F.when((F.col("total_value") > 0) & (F.col("click_cnt") != 0),
                   F.col("valid_transform_cnt") / F.col("click_cnt"))
            .otherwise(F.lit(0.0)))
        .withColumn(
            "contribution",
            F.when(F.col("total_value") > 0,
                   F.col("value") / F.col("total_value")).otherwise(F.lit(0.0)))
        .drop("total_value")
        .join(at._dist10(occ_t, keys, "t"), keys, "left")
        .join(at._dist10(occ_s, keys, "s"), keys, "left")
        .withColumn("time_dist", F.coalesce("t_dist", F.lit("0")))
        .withColumn("step_dist", F.coalesce("s_dist", F.lit("0")))
        .drop("t_dist", "s_dist")
    )


def old_corr(partials):
    partials = partials.persist()
    keys = ["touch_event", "touch_attr"]
    agg = partials.groupBy(*keys).agg(
        F.sum("click_cnt").alias("click_cnt"),
        F.sum("valid_cnt").alias("valid_transform_cnt"),
        F.sum("value").alias("value"),
    )
    uv = partials.groupBy("user_id").agg((F.max("valid_cnt") > 0).alias("has_valid"))
    feats = (
        partials.join(uv, "user_id").filter("has_valid")
        .select(*keys, F.col("click_cnt").cast("double").alias("fx"),
                F.col("valid_cnt").cast("double").alias("fy")))
    wt = Window.partitionBy(*keys)
    rx = F.rank().over(wt.orderBy("fx")) + (
        F.count(F.lit(1)).over(Window.partitionBy(*keys, "fx")) - 1) / 2.0
    ry = F.rank().over(wt.orderBy("fy")) + (
        F.count(F.lit(1)).over(Window.partitionBy(*keys, "fy")) - 1) / 2.0
    ranked = feats.select(*keys, "fy", (rx - ry).alias("d"))
    corr = ranked.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"), F.sum("fy").alias("sumy"),
        F.sum(F.col("d") * F.col("d")).alias("d2"),
    ).select(
        *keys,
        F.when((F.col("sumy") == 0) | (F.col("n") < 2), F.lit(0.0))
        .otherwise(1.0 - 6.0 * F.col("d2")
                   / (F.col("n") * (F.col("n") * F.col("n") - 1)))
        .alias("correlation"))
    occ_t = partials.select(*keys, F.explode("times").alias("t"))
    occ_s = partials.select(*keys, F.explode("steps").alias("s"))
    return (
        agg.join(corr, keys, "left")
        .withColumn("correlation", F.coalesce("correlation", F.lit(0.0)))
        .withColumn(
            "valid_transform_ratio",
            F.when(F.col("click_cnt") != 0,
                   F.col("valid_transform_cnt") / F.col("click_cnt"))
            .otherwise(F.lit(0.0)))
        .join(at._dist10(occ_t, keys, "t"), keys, "left")
        .join(at._dist10(occ_s, keys, "s"), keys, "left")
        .withColumn("time_dist", F.coalesce("t_dist", F.lit("0")))
        .withColumn("step_dist", F.coalesce("s_dist", F.lit("0")))
        .drop("t_dist", "s_dist")
    )


def final_fuse(out):
    return out.select(
        "touch_event", "click_cnt", "valid_transform_cnt",
        F.round("value", 4).alias("value"),
        F.round("valid_transform_ratio", 6).alias("valid_transform_ratio"),
        F.round("contribution", 6).alias("contribution"),
        "time_dist", "step_dist")


def final_corr(out):
    return out.select(
        "touch_event", "click_cnt", "valid_transform_cnt",
        F.round("value", 4).alias("value"),
        F.round("correlation", 6).alias("correlation"),
        F.round("valid_transform_ratio", 6).alias("valid_transform_ratio"),
        "time_dist", "step_dist")


VARIANTS = {
    "fuse_old": lambda: final_fuse(old_fuse(parts_fuse())),
    "fuse_new": lambda: final_fuse(at.attribution_analysis_fuse(parts_fuse())),
    "corr_old": lambda: final_corr(old_corr(parts_corr())),
    "corr_new": lambda: final_corr(at.attribution_correlation(parts_corr())),
}


def rows(df):
    return sorted(tuple(r) for r in df.collect())


# -------- plan capture (before = old shape, after = new shape)
import contextlib
import io

def plan_text(df):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()

for qname, old_v, new_v in (
    ("beh_attr_fuse", VARIANTS["fuse_old"], VARIANTS["fuse_new"]),
    ("beh_attr_correlation", VARIANTS["corr_old"], VARIANTS["corr_new"]),
):
    with open(f"plans/r12/{qname}_d10_before.txt", "w") as f:
        f.write(plan_text(old_v()))
    with open(f"plans/r12/{qname}_d10_after.txt", "w") as f:
        f.write(plan_text(new_v()))
    print(f"[plan] wrote plans/r12/{qname}_d10_{{before,after}}.txt")

# -------- correctness: row-identical
for base in ("fuse", "corr"):
    a = rows(VARIANTS[f"{base}_old"]())
    b = rows(VARIANTS[f"{base}_new"]())
    assert a == b, f"{base}: MISMATCH\nold={a[:3]}\nnew={b[:3]}"
    print(f"[ok] {base}: identical rows n={len(a)}")
    spark.catalog.clearCache()

# -------- timing: interleaved min-of-3 warm (noop sink)
def run(df):
    df.write.format("noop").mode("overwrite").save()

for v in VARIANTS.values():
    run(v())  # warm everything once
spark.catalog.clearCache()

best = {k: None for k in VARIANTS}
for rep in range(3):
    for name, v in VARIANTS.items():
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        run(v())
        dt = time.perf_counter() - t0
        best[name] = dt if best[name] is None else min(best[name], dt)
        print(f"rep{rep} {name}: {dt:.3f}s", flush=True)

print("\n--- min-of-3 warm ---")
for name, t in best.items():
    print(f"{name}: {t:.3f}s")
