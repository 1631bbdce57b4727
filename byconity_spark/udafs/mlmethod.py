"""MLMethod family (reference src/AggregateFunctions/
AggregateFunctionMLMethod.h — stochasticLinearRegression /
stochasticLogisticRegression + the evalMLMethod scalar).

The reference trains with mini-batch SGD whose result depends on row
order and batch boundaries; the deterministic, distributed contract here
is FULL-BATCH gradient descent — each iteration is ONE map-side-combinable
aggregate over the data computing the exact mean gradient, with the
weight vector living on the driver and entering the next plan as
literals (a broadcast of a handful of scalars).  That is the scale-correct
shape for GD on Spark: iterations x one shuffle-free aggregate, no
parameter server needed for d ~ tens of features.

Gradients (squared loss / log loss, matching the reference's update
directions):

  linear:   w -= lr * avg(2 * (w.x + b - y) * x);  b likewise
  logistic: w -= lr * avg((sigmoid(w.x + b) - y) * x)

L2 regularization adds ``2 * l2 * w`` to the gradient when set.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _sigmoid(z: Column) -> Column:
    return 1.0 / (1.0 + F.exp(-z))


def gd_train(
    df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    lr: float = 0.1,
    iterations: int = 3,
    l2: float = 0.0,
    logistic: bool = False,
) -> tuple[list[float], float]:
    """Run full-batch GD; returns (weights, bias).  One distributed
    aggregate per iteration; weights are plain Python floats between
    iterations (literal-folded into the next plan)."""
    k = len(feature_cols)
    w = [0.0] * k
    b = 0.0
    for _ in range(iterations):
        z = F.lit(b)
        for wi, c in zip(w, feature_cols):
            z = z + F.lit(wi) * F.col(c)
        if logistic:
            err = _sigmoid(z) - F.col(label_col)
            grads = [F.avg(err * F.col(c)) for c in feature_cols]
            gb = F.avg(err)
        else:
            err = z - F.col(label_col)
            grads = [F.avg(2.0 * err * F.col(c)) for c in feature_cols]
            gb = F.avg(2.0 * err)
        row = df.agg(*[g.alias(f"g{i}") for i, g in enumerate(grads)],
                     gb.alias("gb")).first()
        w = [
            wi - lr * (row[f"g{i}"] + 2.0 * l2 * wi)
            for i, wi in enumerate(w)
        ]
        b = b - lr * row["gb"]
    return w, b


def eval_ml_method(
    weights: Sequence[float],
    bias: float,
    feature_cols: Sequence[str],
    logistic: bool = False,
) -> Column:
    """evalMLMethod(state, features...) — apply a trained model as a plain
    JVM Column expression (whole-stage-codegen'd, no UDF)."""
    z = F.lit(float(bias))
    for wi, c in zip(weights, feature_cols):
        z = z + F.lit(float(wi)) * F.col(c)
    return _sigmoid(z) if logistic else z


def gd_oracle_sql(
    base_select: str,
    feature_exprs: Sequence[str],
    lr: float,
    iterations: int,
    logistic: bool = False,
    digits: int = 6,
) -> str:
    """Generate the DuckDB oracle for gd_train: the iteration loop UNROLLS
    into a CTE chain (w0 -> w1 -> ... -> wN), each step a CROSS JOIN of the
    single-row weight frame with the data and one aggregate — the exact
    same math the Spark loop runs.  ``base_select`` must project columns
    x1..xk and y."""
    k = len(feature_exprs)
    xs = [f"x{i+1}" for i in range(k)]
    lines = [f"WITH d AS ({base_select}),"]
    lines.append(
        "w0 AS (SELECT "
        + ", ".join(f"0.0 AS w{i+1}" for i in range(k))
        + ", 0.0 AS b)"
    )
    for it in range(iterations):
        z = " + ".join(f"w.w{i+1} * d.{x}" for i, x in enumerate(xs))
        z = f"({z} + w.b)"
        if logistic:
            err = f"(1.0 / (1.0 + exp(-{z})) - d.y)"
            gs = [f"avg({err} * d.{x})" for x in xs]
            gb = f"avg({err})"
        else:
            err = f"({z} - d.y)"
            gs = [f"avg(2.0 * {err} * d.{x})" for x in xs]
            gb = f"avg(2.0 * {err})"
        sets = ", ".join(
            f"max(w.w{i+1}) - {lr} * {g} AS w{i+1}" for i, g in enumerate(gs)
        )
        lines.append(
            f", w{it+1} AS (SELECT {sets}, max(w.b) - {lr} * {gb} AS b "
            f"FROM d CROSS JOIN w{it} w)"
        )
    final = ", ".join(
        f"round(w{i+1}, {digits}) AS w{i+1}" for i in range(k)
    )
    lines.append(f"SELECT {final}, round(b, {digits}) AS b FROM w{iterations}")
    return "\n".join(lines)
