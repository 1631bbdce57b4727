"""Join strategies ByConity supports that Spark lacks as primitives.

Reference join surface: src/Parsers/ASTTablesInSelectQuery.h:123-145 — kinds
(Inner/Left/Right/Full/Cross) x strictness (All/Any/RightAny/Asof/Semi/Anti).
Spark covers kinds + semi/anti natively; this module adds:

  * asof_join  — ASOF strictness (src/Interpreters/RowRefs.h:210 AsofRowRefs)
  * any_join   — ANY strictness (first-match join)

Scale design: both are implemented as single-shuffle DataFrame plans (one
hash partition by the join key), never as driver-side loops or per-row UDFs.
``asof_join`` uses the union+window formulation: O(n log n) per key via
Spark's external sort, works for arbitrarily large inputs, and inherits AQE
skew handling on the shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_time: str,
    right_time: str,
    direction: str = "backward",
    allow_exact_matches: bool = True,
    right_payload: list[str] | None = None,
) -> DataFrame:
    """ASOF join: for each left row, pick the single right row with the
    largest ``right_time`` <= ``left_time`` (direction='backward', the
    ClickHouse default for ``ASOF JOIN ... ON l.t >= r.t``) or smallest
    ``right_time`` >= ``left_time`` ('forward'), matching on equi-keys.

    Implementation (Spark-first): tag both sides, union, then a running
    ``last(payload, ignorenulls=True)`` window per key ordered by time — a
    single shuffle on the key columns, no per-row Python. Equivalent
    semantics to DuckDB's ASOF JOIN (used as the test oracle) and pandas
    ``merge_asof``.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if right_payload is None:
        right_payload = [c for c in right.columns if c not in keys and c != right_time]
    clash = set(right_payload) & set(left.columns)
    if clash:
        raise ValueError(
            f"asof_join: right payload columns {sorted(clash)} collide with left "
            "columns — rename or pass right_payload explicitly"
        )

    payload_struct = F.struct(
        F.col(right_time).alias("__asof_rt"), *[F.col(c) for c in right_payload]
    )
    # side marker: rights sort BEFORE lefts at equal time when exact matches
    # are allowed (so <= matches), after otherwise (strict <).
    r_side = 0 if allow_exact_matches else 2
    l_cols = [F.col(c) for c in left.columns]

    l_tagged = left.select(
        *l_cols,
        F.col(left_time).alias("__asof_t"),
        F.lit(1).alias("__asof_side"),
        F.lit(None).cast(
            right.select(payload_struct.alias("p")).schema["p"].dataType
        ).alias("__asof_payload"),
    )
    r_tagged = right.select(
        *[
            F.col(c) if c in keys else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
        ],
        F.col(right_time).alias("__asof_t"),
        F.lit(r_side).alias("__asof_side"),
        payload_struct.alias("__asof_payload"),
    )

    unioned = l_tagged.unionByName(r_tagged)
    asc = direction == "backward"
    order = [
        F.col("__asof_t").asc() if asc else F.col("__asof_t").desc(),
        F.col("__asof_side").asc(),
    ]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn(
        "__asof_match", F.last("__asof_payload", ignorenulls=True).over(w)
    ).filter(F.col("__asof_side") == 1)

    out = matched.select(
        *[F.col(c) for c in left.columns],
        *[F.col("__asof_match")[c].alias(c) for c in right_payload],
        F.col("__asof_match")["__asof_rt"].alias(f"__matched_{right_time}"),
    )
    return out


def any_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    how: str = "left",
    prefer: list[Column] | None = None,
) -> DataFrame:
    """ANY-strictness join (ClickHouse ``ANY LEFT JOIN``): at most one right
    row per key. Reference: ASTTablesInSelectQuery.h:127.

    ClickHouse picks an arbitrary first match; for determinism we take the
    first row per key under ``prefer`` ordering (default: all right columns
    ascending). Implemented as row_number()==1 dedup then a plain join — one
    extra shuffle on the right side only, which is usually the small side.
    """
    keys = [on] if isinstance(on, str) else list(on)
    order = prefer or [F.col(c) for c in right.columns if c not in keys]
    if not order:  # right side is keys-only: any row per key is identical
        order = [F.lit(1)]
    w = Window.partitionBy(*keys).orderBy(*order)
    deduped = (
        right.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    return left.join(deduped, on=keys, how=how)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    salt_from: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-buster equi join: the (large, skewed) left side is split into
    ``n_salts`` sub-streams per key by hashing ``salt_from`` (any
    high-cardinality left column), and the right side is replicated once
    per salt — so a hot key's rows spread over n_salts tasks instead of
    one straggler.  AQE's skew-join split handles moderate skew
    automatically; this is the explicit tool for pathological keys.

    Semantically identical to ``left.join(right, on, how)`` for inner/left
    joins (verified by tests/test_operators.py)."""
    keys = [on] if isinstance(on, str) else list(on)
    l_salted = left.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(salt_from)), F.lit(n_salts))
    )
    r_salted = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return l_salted.join(r_salted, on=[*keys, "__salt"], how=how).drop("__salt")


def quantified_compare(
    df: DataFrame,
    value: Column,
    sub: DataFrame,
    sub_value: str,
    op: str,
    quantifier: str,
) -> DataFrame:
    """Rewrite of quantified comparisons ``WHERE x <op> ALL/ANY (subquery)``
    (reference: ApplyStep.h:25 QUANTIFIED_COMPARISON; Catalyst lacks them).

    Returns ``df`` filtered to rows where the quantified comparison is TRUE,
    with full ANSI three-valued NULL semantics:

      * ``x > ALL(S)``  → TRUE iff S is empty, or (x is non-null AND S has no
        NULLs AND x > max(S)).  A NULL in S (or NULL x with non-empty S)
        makes the predicate UNKNOWN → row dropped.
      * ``x > ANY(S)``  → TRUE iff some non-null s satisfies x > s (NULLs in
        S never help; NULL x never matches).

    The subquery collapses to ONE row (min/max + counts), broadcast to every
    executor — the rewrite costs a scalar aggregate, never a per-row
    subquery, identical to ByConity's RemoveApply decorrelation.
    """
    agg = {
        (">", "ALL"): F.max,
        (">=", "ALL"): F.max,
        ("<", "ALL"): F.min,
        ("<=", "ALL"): F.min,
        (">", "ANY"): F.min,
        (">=", "ANY"): F.min,
        ("<", "ANY"): F.max,
        ("<=", "ANY"): F.max,
    }[(op, quantifier)]
    bound = sub.agg(
        agg(F.col(sub_value)).alias("__b"),  # ignores NULLs
        F.count(F.lit(1)).alias("__n"),  # all rows
        F.count(F.col(sub_value)).alias("__nn"),  # non-null rows
    )
    cmp = {
        ">": value > F.col("__b"),
        ">=": value >= F.col("__b"),
        "<": value < F.col("__b"),
        "<=": value <= F.col("__b"),
    }[op]
    if quantifier == "ALL":
        # empty S → vacuously true; any NULL in S → UNKNOWN (drop)
        cond = (F.col("__n") == 0) | ((F.col("__n") == F.col("__nn")) & cmp)
    else:
        # needs at least one non-null s that satisfies the comparison
        cond = (F.col("__nn") > 0) & cmp
    return df.crossJoin(F.broadcast(bound)).filter(cond).drop("__b", "__n", "__nn")
