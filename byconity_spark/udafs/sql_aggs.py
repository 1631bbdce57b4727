"""SQL-dialect aggregate kernels (grouped-agg pandas UDFs).

The DISTRIBUTED operator forms live elsewhere (mann_whitney_u in
udafs/behavioral.py shuffles once to per-value counts and never holds a
group in memory); these kernels are the SQL-surface analogues for the
dialect tests — per-group Arrow-batched numpy, appropriate when the SQL
statement aggregates a whole (modest) relation the way the reference's
own stateless tests do.  Reference: AggregateFunctionMannWhitney.h.
"""
from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyspark.sql.functions as F


def _ranks_with_ties(v: np.ndarray) -> tuple[np.ndarray, float]:
    """Average ranks and the Σ(t³-t) tie term."""
    order = np.argsort(v, kind="mergesort")
    ranks = np.empty(len(v), dtype=np.float64)
    sv = v[order]
    tie = 0.0
    i = 0
    while i < len(sv):
        j = i
        while j + 1 < len(sv) and sv[j + 1] == sv[i]:
            j += 1
        t = j - i + 1
        ranks[order[i : j + 1]] = (i + j) / 2.0 + 1.0
        tie += t**3 - t
        i = j + 1
    return ranks, tie


def _simpson_cdf(z: float) -> float:
    """∫₀ᶻ φ(t)dt via the reference's own Simpson rule
    (StatCommon.h:integrateSimpson — iterations = max(1e6,
    1e4·|round(z)|)); bit-compatible with the reference's p-values,
    including its last-digit integration error (01560 pins
    0.5426959774289524, not the analytically-exact ...482)."""
    iters = int(max(1e6, 1e4 * abs(round(z))))
    # double-precision h + sequential (cumsum) summation reproduce the
    # reference binary's accumulation (its `long double h` compiles to
    # the same doubles on the shipping build — verified against the
    # 01560 golden value); pdf evaluates in double like the Float64
    # lambda
    h = np.float64(z) / iters
    c = math.sqrt(2.0 * math.pi)

    def pdf(t):
        t = np.asarray(t, dtype=np.float64)
        return np.exp(-0.5 * t * t) / c

    ts_odd = np.arange(1, iters, 2, dtype=np.float64) * h
    ts_even = np.arange(2, iters, 2, dtype=np.float64) * h
    sum_odds = np.cumsum(pdf(ts_odd))[-1] if len(ts_odd) else 0.0
    sum_evens = np.cumsum(pdf(ts_even))[-1] if len(ts_even) else 0.0
    s = np.float64(
        pdf(np.float64(0.0)) + pdf(np.float64(z))
        + 2.0 * sum_evens + 4.0 * sum_odds
    )
    return float(s * h / 3.0)


def _mwu(values: pd.Series, labels: pd.Series, alternative: str,
         continuity: bool) -> list:
    v = values.to_numpy(dtype=np.float64)
    lab = labels.to_numpy(dtype=np.float64)
    keep = ~(np.isnan(v) | np.isnan(lab))
    v, lab = v[keep], lab[keep]
    n1 = int((lab == 0).sum())
    n2 = len(lab) - n1
    if n1 == 0 or n2 == 0:
        return [float("nan"), float("nan")]
    ranks, tie = _ranks_with_ties(v)
    r1 = float(ranks[lab == 0].sum())
    u1 = n1 * n2 + n1 * (n1 + 1) / 2.0 - r1
    u2 = n1 * n2 - u1
    n = n1 + n2
    # meanrank folds the continuity correction in (reference
    # AggregateFunctionMannWhitney.h:71: n1*n2/2 + 0.5*cc); the returned
    # statistic is u2 for EVERY alternative (getResult: `return {u2, p}`).
    # tie_correction/sd follow the reference's exact expression ORDER
    # (StatCommon.h:67, MannWhitney.h:72) — a mathematically-equal
    # rearrangement rounds differently and shifts the p-value's last ulp
    meanrank = n1 * n2 / 2.0 + (0.5 if continuity else 0.0)
    tie_correction = 1.0 - (tie / (float(n) ** 3 - n))
    sigma2 = tie_correction * n1 * n2 * (n1 + n2 + 1) / 12.0
    if sigma2 <= 0:
        return [u2, float("nan")]
    sigma = math.sqrt(sigma2)
    if alternative == "two-sided":
        z = abs(max(u1, u2) - meanrank) / sigma
        p = 1.0 - 2.0 * _simpson_cdf(z)
    else:
        # reference: 'less' uses z from u1, 'greater' z from u2; both
        # p = 0.5 - cdf([0,z]) = 1 - Phi(z)
        z = ((u1 if alternative == "less" else u2) - meanrank) / sigma
        p = 0.5 - _simpson_cdf(z)
    return [u2, min(max(p, 0.0), 1.0)]


def sql_kernels() -> dict:
    """Grouped-agg pandas UDFs registrable with spark.udf.register.
    Names are internal (double-underscore): the frontend's RULES /
    PARAMETRIC entries emit them wrapped in named_struct so `.1`/`.2`
    tuple access works."""
    out = {}

    @F.pandas_udf("double", F.PandasUDFType.GROUPED_AGG)
    def rank_corr(x: pd.Series, y: pd.Series):
        # Spearman: Pearson correlation of average ranks
        xa = x.to_numpy(dtype=np.float64)
        ya = y.to_numpy(dtype=np.float64)
        keep = ~(np.isnan(xa) | np.isnan(ya))
        xa, ya = xa[keep], ya[keep]
        if len(xa) < 2:
            return float("nan")
        rx, _ = _ranks_with_ties(xa)
        ry, _ = _ranks_with_ties(ya)
        sx, sy = rx.std(), ry.std()
        if sx == 0 or sy == 0:
            return float("nan")
        return float(((rx - rx.mean()) * (ry - ry.mean())).mean() / (sx * sy))

    out["__rank_corr"] = rank_corr
    for alt, altkey in (("two-sided", "ts"), ("greater", "gt"),
                        ("less", "lt")):
        for cont in (True, False):
            ckey = "c" if cont else "nc"

            def make(alt=alt, cont=cont):
                @F.pandas_udf("array<double>", F.PandasUDFType.GROUPED_AGG)
                def k(v: pd.Series, lab: pd.Series):
                    return _mwu(v, lab, alt, cont)

                return k

            out[f"__mwu_{altkey}_{ckey}"] = make()
    return out
