"""Behavioral-analytics aggregates (ByteDance-specific ByConity value).

Reference kernels (C++):
  * windowFunnel  — src/AggregateFunctions/AggregateFunctionWindowFunnel.cpp
  * retention     — src/AggregateFunctions/AggregateFunctionRetention.cpp
  * sequenceMatch — src/AggregateFunctions/AggregateFunctionSequenceMatch.cpp
  * sessionSplit  — src/AggregateFunctions/AggregateFunctionSessionSplit.cpp

Spark-first design: the per-user kernels run as Arrow-batched
``applyInPandas`` group transforms (vectorized numpy inside — no per-row
Python), partitioned by user_id; ``retention`` needs no kernel at all (it is
a conjunction of boolean aggregates, expressed as JVM-side ``max(when(...))``).

Semantics notes:
  * ``window_funnel`` implements the deterministic FIRST-ANCHOR variant:
    the chain starts at the user's earliest step-1 event; each later step is
    the earliest strictly-later event of that type within ``window`` of the
    anchor.  (ClickHouse's default mode slides the anchor to later step-1
    events; that variant is order-dependent under equal timestamps and not
    SQL-expressible, so we pin the deterministic one and document it.)
  * ``sequence_match`` supports the '(?1).*(?2).*...(?k)' pattern family
    (ordered subsequence); greedy earliest-match is exact for subsequence
    existence.
  * ``session_split`` splits on silence gaps > ``gap_us``, emitting one row
    per session with start/end/count/sum.

Scale: one shuffle on user_id; group state is O(events-per-user).  Hot users
are bounded by product reality (a user produces thousands, not billions, of
events); for truly pathological keys pre-split by (user_id, day) first.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MICRO = 1_000_000


def _us(series: pd.Series) -> np.ndarray:
    """Timestamp series -> int64 microseconds, regardless of the pandas
    datetime unit Arrow happened to deliver (ns vs us)."""
    return series.to_numpy().astype("datetime64[us]").astype(np.int64)


def funnel_level_from_arrays(per_step: list[np.ndarray], window_us: int) -> int:
    """Pure first-anchor funnel core (property-tested without Spark):
    per_step[i] = sorted event times of step i; returns reached level."""
    if len(per_step[0]) == 0:
        return 0
    anchor = per_step[0][0]
    deadline = anchor + window_us
    prev = anchor
    level = 1
    for arr in per_step[1:]:
        i = np.searchsorted(arr, prev, side="right")  # strictly later
        if i < len(arr) and arr[i] <= deadline:
            prev = arr[i]
            level += 1
        else:
            break
    return level


def subsequence_matched(per_cond: list[np.ndarray]) -> bool:
    """Pure ordered-subsequence core: per_cond[i] = sorted event times
    satisfying condition i; TRUE iff a strictly increasing chain exists.
    Greedy earliest-match is exact for existence."""
    prev = -np.inf
    for arr in per_cond:
        i = np.searchsorted(arr, prev, side="right")
        if i >= len(arr):
            return False
        prev = arr[i]
    return True


def window_funnel(
    events: DataFrame,
    window_us: int,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-user funnel depth: (user_id, funnel_level) with level in [0, len(steps)].

    Level k means steps[0..k-1] occurred in strictly increasing time order,
    all within ``window_us`` of the first step-1 event.
    """
    steps = list(steps)
    n_steps = len(steps)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        uid = pdf[user_col].iloc[0]
        ts = _us(pdf[ts_col])
        order = np.argsort(ts, kind="stable")
        ts = ts[order]
        types = pdf[type_col].to_numpy()[order]
        per_step = [np.sort(ts[types == s]) for s in steps]
        level = funnel_level_from_arrays(per_step, window_us)
        return pd.DataFrame({user_col: [uid], "funnel_level": [np.int32(level)]})

    out_schema = f"{user_col} long, funnel_level int"
    _ = n_steps  # levels bounded by len(steps); kernel is O(k log n) per user
    return events.select(user_col, ts_col, type_col).groupBy(user_col).applyInPandas(
        kernel, schema=out_schema
    )


def retention(
    events: DataFrame,
    conds: Sequence[Column],
    user_col: str = "user_id",
) -> DataFrame:
    """ClickHouse ``retention(cond1, ..., condN)``: per user, r1 = cond1 ever
    held; r_i = cond1 AND cond_i (i>1).  Pure JVM-side boolean aggregation —
    no kernel, no shuffle beyond the single groupBy."""
    flags = [
        F.max(F.when(c, F.lit(1)).otherwise(F.lit(0))).alias(f"__c{i}")
        for i, c in enumerate(conds)
    ]
    agg = events.groupBy(user_col).agg(*flags)
    out = [F.col("__c0").alias("r1")] + [
        (F.col("__c0") * F.col(f"__c{i}")).alias(f"r{i + 1}")
        for i in range(1, len(conds))
    ]
    return agg.select(user_col, *out)


def sequence_match(
    events: DataFrame,
    conds: Sequence[Column],
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """ClickHouse ``sequenceMatch('(?1).*(?2)...')(ts, cond1, ..., condk)``:
    per user, TRUE iff events satisfying cond1..condk occur as a strictly
    time-ordered subsequence.  Greedy earliest-match (exact for existence),
    vectorized via searchsorted."""
    tagged = events.select(
        user_col,
        ts_col,
        *[c.cast("boolean").alias(f"__m{i}") for i, c in enumerate(conds)],
    )
    k = len(conds)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        uid = pdf[user_col].iloc[0]
        ts = _us(pdf[ts_col])
        order = np.argsort(ts, kind="stable")
        ts = ts[order]
        per_cond = [
            ts[pdf[f"__m{i}"].fillna(False).to_numpy()[order].astype(bool)]
            for i in range(k)
        ]
        ok = subsequence_matched(per_cond)
        return pd.DataFrame({user_col: [uid], "matched": [bool(ok)]})

    return tagged.groupBy(user_col).applyInPandas(
        kernel, schema=f"{user_col} long, matched boolean"
    )


def session_split(
    events: DataFrame,
    gap_us: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Split each user's event stream into sessions at silence gaps >
    ``gap_us``; one output row per session (vectorized diff+cumsum kernel)."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        uid = pdf[user_col].iloc[0]
        pdf = pdf.sort_values([ts_col, id_col], kind="stable")
        us = _us(pdf[ts_col])
        brk = np.zeros(len(us), dtype=np.int64)
        if len(us) > 1:
            brk[1:] = (np.diff(us) > gap_us).astype(np.int64)
        sid = 1 + np.cumsum(brk)
        g = pd.DataFrame(
            {
                "sid": sid,
                "ts": pdf[ts_col].to_numpy(),
                "value": pdf[value_col].to_numpy(),
            }
        ).groupby("sid", sort=True)
        out = g.agg(
            session_start=("ts", "min"),
            session_end=("ts", "max"),
            n_events=("ts", "size"),
            sum_value=("value", "sum"),
        ).reset_index()
        out.insert(0, user_col, uid)
        out = out.rename(columns={"sid": "session_id"})
        out["session_id"] = out["session_id"].astype("int32")
        return out

    schema = (
        f"{user_col} long, session_id int, session_start timestamp, "
        "session_end timestamp, n_events long, sum_value double"
    )
    return (
        events.select(user_col, ts_col, id_col, value_col)
        .groupBy(user_col)
        .applyInPandas(kernel, schema=schema)
    )
