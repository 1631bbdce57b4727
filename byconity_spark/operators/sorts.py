"""Ordering-related operators: WITH FILL gap-filling and WITH TIES.

Reference: ORDER BY ... WITH FILL — src/QueryPlan/FillingStep.h:24,
src/Processors/Transforms/FillingTransform.h; LIMIT WITH TIES —
src/QueryPlan/LimitStep.h:25.

Scale notes: the fill spine is generated distributively with ``F.sequence``
over the (tiny, 1-row) bounds aggregate and joined back — never a driver
loop. For very long ranges the spine explodes into at most
(range/step) rows, which partitions like any other table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fill_time_series(
    df: DataFrame,
    ts_col: str,
    step_expr: str = "interval 1 hour",
    fill_values: dict[str, object] | None = None,
    group_keys: list[str] | None = None,
) -> DataFrame:
    """ORDER BY ts WITH FILL STEP <step>: densify a time axis between the
    observed min and max, left-joining real rows and filling gaps.

    With ``group_keys``, densifies per group (cross join of per-group bounds
    with the spine).
    """
    keys = group_keys or []
    bounds = (
        df.groupBy(*keys).agg(
            F.min(ts_col).alias("__lo"), F.max(ts_col).alias("__hi")
        )
        if keys
        else df.agg(F.min(ts_col).alias("__lo"), F.max(ts_col).alias("__hi"))
    )
    spine = bounds.select(
        *keys,
        F.explode(
            F.sequence(F.col("__lo"), F.col("__hi"), F.expr(step_expr))
        ).alias(ts_col),
    )
    out = spine.join(df, on=[*keys, ts_col], how="left")
    if fill_values:
        out = out.fillna(fill_values)
    return out


def limit_with_ties(
    df: DataFrame, order: list[tuple[Column, bool]], n: int
) -> DataFrame:
    """LIMIT n WITH TIES: keep the first n rows in sort order plus every
    peer of the n-th row (reference src/QueryPlan/LimitStep.h:25).

    ``order`` is ``[(column, ascending), ...]``.

    Scale shape: a naive ``rank() OVER (ORDER BY ...)`` forces every row
    through ONE partition (`WindowExec: No Partition Defined`) — a
    scale-killer at 100 TB.  Instead:

    1. distributed top-n (`TakeOrderedAndProject`) fetches only the n
       boundary-candidate key tuples to the driver (bounded by n, metadata
       scale);
    2. the n-th key tuple becomes a broadcast lexicographic predicate
       ``key <= boundary`` evaluated map-side — no shuffle, no window.

    NULL ordering follows Spark defaults (asc → nulls first, desc → nulls
    last), matching the rank() formulation.
    """
    sort_cols = [c.asc() if asc else c.desc() for c, asc in order]
    boundary_rows = (
        df.select(
            *[c.alias(f"__k{i}") for i, (c, _) in enumerate(order)]
        )
        .orderBy(*[
            F.col(f"__k{i}").asc() if asc else F.col(f"__k{i}").desc()
            for i, (_, asc) in enumerate(order)
        ])
        .limit(n)
        .collect()
    )
    if len(boundary_rows) < n:
        return df  # fewer than n rows: LIMIT keeps everything
    boundary = boundary_rows[-1]

    # lexicographic key <= boundary, honoring asc/desc and null position
    def strict_lt(c: Column, asc: bool, b) -> Column:
        if b is None:
            # asc: null is smallest → nothing strictly before it
            # desc: null is largest → every non-null is strictly before it
            return c.isNotNull() if not asc else F.lit(False)
        return (c.isNull() | (c < F.lit(b))) if asc else (c > F.lit(b))

    keep = None
    for i in range(len(order) - 1, -1, -1):
        c, asc = order[i]
        b = boundary[f"__k{i}"]
        eq = c.eqNullSafe(F.lit(b)) if b is not None else c.isNull()
        lt = strict_lt(c, asc, b)
        keep = lt | eq if keep is None else lt | (eq & keep)
    return df.filter(keep)


def keyed_sample(
    df, key, fraction: float, offset: float = 0.0, buckets: int = 1_000_000
):
    """Deterministic keyed SAMPLE (reference: SAMPLE k [OFFSET m] over the
    table's SAMPLE BY expression — MergeTreeDataSelectExecutor maps the
    fraction onto the sampling key's hash range, so the SAME rows are
    selected on every run and across replicas).  Portable-hash bucket
    (md5 low bits) so external engines select the identical row set;
    ``fraction``/``offset`` are fractions of the key space.

    Scale shape: a pure scan-side filter — no shuffle, no RNG, prunes in
    the same pass as any other predicate."""
    from pyspark.sql import functions as F

    lo = int(offset * buckets)
    hi = int((offset + fraction) * buckets)
    bucket = F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10) \
        .cast("long") % buckets
    return df.filter((bucket >= lo) & (bucket < hi))
