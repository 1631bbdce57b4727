"""Distributed Lloyd k-means over embedding columns — the training-data
curation primitive (topic bucketing, stratified sampling, IVF coarse
quantizer training) that pairs with llm/similarity.py's IVF search, which
until now consumed pre-assigned groups instead of trained centroids.

Scale shape (the part that must survive 100 TB):
  * the centroid state is k x dim doubles — metadata-scale; it moves
    driver -> executors inside the Arrow-UDF closure (an implicit
    broadcast), never the reverse except as a k x dim collect per
    iteration (k rows, each one short array — same class as the stats
    collection the plan audit already allows);
  * assignment is one narrow mapInPandas-free pass: a vectorized
    pandas_udf computing a (batch x dim) . (dim x k) GEMM per Arrow
    batch, no shuffle;
  * the update step is ONE shuffle per iteration: posexplode ->
    groupBy(cid, pos) avg -> k x dim rows.  groupBy keys are (cid, pos)
    with cardinality k*dim, so partial (map-side) aggregation absorbs
    almost everything before the exchange;
  * iterations are a driver-side for-loop over DataFrame plans — Lloyd
    is inherently synchronous, the barrier is the algorithm's.

Determinism contract (what makes an exact DuckDB oracle possible, same
trick as udafs/mlmethod.py's unrolled-GD oracle): centroids are ROUNDED
to ``round_decimals`` after init and after every update, element math is
float64, and argmin ties break to the smallest centroid id (numpy argmin
= first index).  Rounding kills cross-engine ULP drift at the iteration
boundary, so both engines walk identical centroid sequences.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assign_clusters(
    df: DataFrame,
    vec_col: str,
    centroids: np.ndarray,
    out: str = "cid",
) -> DataFrame:
    """Nearest-centroid assignment (squared L2, ties -> smallest cid).

    ``centroids`` is a (k x dim) float64 array captured in the UDF
    closure — tiny, ships once per executor.  Per Arrow batch the
    distances come from the expansion ||x-c||^2 = ||x||^2 - 2 x.c +
    ||c||^2 as one GEMM; ||x||^2 is a constant per row and argmin-
    irrelevant, so only the cross term and ||c||^2 are computed.
    """
    cents = np.ascontiguousarray(centroids, dtype=np.float64)
    c_sq = (cents * cents).sum(axis=1)

    @F.pandas_udf("int")
    def nearest(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="int32")
        x = np.array(vecs.tolist(), dtype=np.float64)
        # scores = -2 x.c + ||c||^2; argmin = nearest (first index on ties)
        scores = c_sq[None, :] - 2.0 * (x @ cents.T)
        return pd.Series(np.argmin(scores, axis=1).astype(np.int32))

    return df.withColumn(out, nearest(F.col(vec_col)))


def elementwise_mean(
    df: DataFrame, group_col: str, vec_col: str, round_decimals: int | None
) -> DataFrame:
    """Per-group elementwise mean of an array column via posexplode ->
    groupBy(group, pos) avg -> array_agg ordered by pos.  Two narrow
    aggregations; output is k rows."""
    pos = (
        df.select(group_col, F.posexplode(vec_col).alias("__p", "__v"))
        .groupBy(group_col, "__p")
        .agg(F.avg(F.col("__v").cast("double")).alias("__m"))
    )
    m = F.col("__m")
    if round_decimals is not None:
        m = F.round(m, round_decimals)
    return (
        pos.groupBy(group_col)
        .agg(F.array_sort(F.collect_list(F.struct("__p", m.alias("__m")))).alias("__s"))
        .select(
            group_col,
            F.transform("__s", lambda s: s["__m"]).alias("centroid"),
        )
    )


def _assign_partials(
    df: DataFrame, vec_col: str, centroids: np.ndarray
) -> list:
    """One Lloyd iteration's sufficient statistics: nearest-centroid
    assignment fused with per-partition (cluster, count, sum) partials in
    a single mapInPandas pass.  Output is k rows of metadata per input
    partition — the only bytes that leave the executors."""
    cents = np.ascontiguousarray(centroids, dtype=np.float64)
    c_sq = (cents * cents).sum(axis=1)
    k, dim = cents.shape

    def gen(batches):
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        counts = np.zeros(k, dtype=np.int64)
        sums = np.zeros((k, dim), dtype=np.float64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            near = np.argmin(c_sq[None, :] - 2.0 * (x @ cents.T), axis=1)
            for r in range(k):
                m = near == r
                if m.any():
                    counts[r] += int(m.sum())
                    sums[r] += x[m].sum(axis=0)
        out = [
            (pid, r, int(counts[r]), sums[r].tolist())
            for r in range(k)
            if counts[r] > 0
        ]
        yield pd.DataFrame(out, columns=["pid", "row", "cnt", "s"])

    return (
        df.select(vec_col)
        .mapInPandas(gen, "pid int, row int, cnt long, s array<double>")
        .collect()
    )


def kmeans_fit(
    df: DataFrame,
    vec_col: str,
    k: int,
    iters: int = 3,
    id_col: str = "vec_id",
    round_decimals: int = 6,
) -> tuple[np.ndarray, np.ndarray, DataFrame]:
    """Lloyd k-means: deterministic init (the k smallest ``id_col`` rows),
    ``iters`` assign+update rounds.  Returns (cids, centroids, assigned df).

    A centroid whose cluster empties is dropped (standard Lloyd-with-drop;
    the DuckDB oracle's join reproduces it).  The per-iteration collect is
    k rows of one short array each — metadata-scale by design.
    """
    init_rows = (
        df.orderBy(id_col).limit(k).select(vec_col).collect()
    )
    cents = np.round(
        np.array([r[0] for r in init_rows], dtype=np.float64), round_decimals
    )
    cids = np.arange(len(cents))
    for _ in range(iters):
        # Fused assign + update: ONE narrow mapInPandas pass emits
        # per-partition (cluster, count, sum-vector) partials — k rows of
        # metadata per partition, no posexplode shuffle (the old path was
        # assignment UDF -> explode to n*dim rows -> groupBy exchange per
        # iteration; guide §2.4/§2.3: the decision needs only partial
        # sums, so shuffle those, not the vectors).  Partials combine on
        # the driver in deterministic (cluster, partition) order; the
        # per-element mean rounds to round_decimals exactly like the
        # elementwise_mean path, so the centroid walk is unchanged.
        parts = _assign_partials(df, vec_col, cents)
        agg: dict[int, tuple[int, np.ndarray]] = {}
        for rec in sorted(parts, key=lambda r: (r["row"], r["pid"])):
            cnt0, s0 = agg.get(
                rec["row"], (0, np.zeros(cents.shape[1], dtype=np.float64))
            )
            agg[rec["row"]] = (
                cnt0 + int(rec["cnt"]),
                s0 + np.asarray(rec["s"], dtype=np.float64),
            )
        new_cids = []
        new_cents = []
        for rrow in sorted(agg):
            cnt, s = agg[rrow]
            new_cids.append(int(cids[rrow]))
            new_cents.append(np.round(s / cnt, round_decimals))
        cids = np.array(new_cids)
        cents = np.array(new_cents, dtype=np.float64)
    final = assign_clusters(df, vec_col, cents, out="__near").withColumn(
        "cid",
        F.element_at(
            F.array(*[F.lit(int(c)) for c in cids]), F.col("__near") + 1
        ),
    ).drop("__near")
    return cids, cents, final


def kmeans_summary(
    assigned: DataFrame,
    centroids: np.ndarray,
    cids: "np.ndarray | None",
    vec_col: str,
    dist_decimals: int = 4,
) -> DataFrame:
    """Per-cluster size + mean L2 distance to the final centroid —
    the cluster-quality readout (and the oracle-comparable surface)."""
    ids = (
        np.arange(len(centroids)) if cids is None else np.asarray(cids)
    )
    cents = np.ascontiguousarray(centroids, dtype=np.float64)
    id_to_row = {int(c): i for i, c in enumerate(ids)}

    @F.pandas_udf("double")
    def dist(vecs: pd.Series, cid: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="float64")
        x = np.array(vecs.tolist(), dtype=np.float64)
        rows = np.array([id_to_row[int(c)] for c in cid])
        d = np.sqrt(((x - cents[rows]) ** 2).sum(axis=1))
        return pd.Series(d)

    return (
        assigned.withColumn("__d", dist(F.col(vec_col), F.col("cid")))
        .groupBy("cid")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.avg("__d"), dist_decimals).alias("avg_dist"),
        )
        .orderBy("cid")
    )
