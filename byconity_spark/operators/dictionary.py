"""Dictionary lookups: ClickHouse dictGet / dictGetOrDefault.

Reference: src/Dictionaries/ (external key->value tables),
FunctionsExternalDictionaries.cpp (dictGet*), HashJoin DictionaryReader path.

Spark mapping: a dictionary is a small DataFrame; dictGet is a BROADCAST
left join + coalesce(default) — the lookup never shuffles the fact side, so
at 100 TB it costs one map-side hash probe per row (same as the reference's
in-memory dictionary)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dict_get(
    df: DataFrame,
    dictionary: DataFrame,
    key_col: str,
    attr_cols: dict[str, object] | list[str],
    dict_key_col: str | None = None,
) -> DataFrame:
    """Attach dictionary attributes to ``df`` by key.

    ``attr_cols``: list of attribute names (missing keys -> NULL, dictGet
    semantics with Nullable) or a {name: default} mapping (missing keys ->
    default, dictGetOrDefault semantics).
    """
    dict_key = dict_key_col or key_col
    defaults = attr_cols if isinstance(attr_cols, dict) else {c: None for c in attr_cols}
    d = dictionary.select(
        F.col(dict_key).alias("__dk"), *[F.col(c).alias(f"__a_{c}") for c in defaults]
    )
    joined = df.join(F.broadcast(d), df[key_col] == F.col("__dk"), "left")
    out = joined
    for c, default in defaults.items():
        col = F.col(f"__a_{c}")
        if default is not None:
            col = F.coalesce(col, F.lit(default))
        out = out.withColumn(c, col)
    return out.drop("__dk", *[f"__a_{c}" for c in defaults])
