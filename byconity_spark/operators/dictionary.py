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


def dict_get_hierarchy(
    df: DataFrame,
    dictionary: DataFrame,
    key_col: str,
    dict_key_col: str = "id",
    parent_col: str = "parent_id",
    max_depth: int = 10,
    out_col: str = "hierarchy",
) -> DataFrame:
    """dictGetHierarchy (reference FunctionsExternalDictionaries.cpp
    hierarchy support): the ancestor chain [key, parent(key), ...] walking
    the dictionary's parent links until 0/NULL (root) or max_depth.

    Spark shape: the chain unrolls into max_depth BROADCAST probes of the
    same tiny dictionary — the fact side never shuffles, exactly like the
    reference's in-memory hierarchy walk; depth is a plan-time constant
    (the reference caps recursion too)."""
    d = F.broadcast(
        dictionary.select(
            F.col(dict_key_col).alias("__hk"),
            F.col(parent_col).alias("__hp"),
        )
    )
    out = df.withColumn("__lvl0", F.col(key_col).cast("long"))
    levels = ["__lvl0"]
    for i in range(1, max_depth):
        prev, cur = f"__lvl{i - 1}", f"__lvl{i}"
        step = d.withColumnRenamed("__hk", f"__hk{i}").withColumnRenamed(
            "__hp", f"__hp{i}"
        )
        out = out.join(
            step, out[prev] == F.col(f"__hk{i}"), "left"
        ).withColumn(
            cur,
            F.when(F.col(f"__hp{i}") > 0, F.col(f"__hp{i}").cast("long")),
        ).drop(f"__hk{i}", f"__hp{i}")
        levels.append(cur)
    chain = F.filter(
        F.array(*[F.col(c) for c in levels]), lambda x: x.isNotNull()
    )
    return out.withColumn(out_col, chain).drop(*levels)


def dict_is_in(
    df: DataFrame,
    dictionary: DataFrame,
    child_col: str,
    ancestor_col: str,
    dict_key_col: str = "id",
    parent_col: str = "parent_id",
    max_depth: int = 10,
    out_col: str = "is_in",
) -> DataFrame:
    """dictIsIn(child, ancestor): whether `ancestor` appears in the child's
    hierarchy chain — array_contains over dict_get_hierarchy."""
    with_chain = dict_get_hierarchy(
        df, dictionary, child_col, dict_key_col, parent_col, max_depth,
        out_col="__chain",
    )
    return with_chain.withColumn(
        out_col, F.array_contains(F.col("__chain"), F.col(ancestor_col).cast("long"))
    ).drop("__chain")


def dict_get_children(
    df: DataFrame,
    dictionary: DataFrame,
    key_col: str,
    dict_key_col: str = "id",
    parent_col: str = "parent_id",
    out_col: str = "children",
) -> DataFrame:
    """dictGetChildren (FunctionsExternalDictionaries.cpp hierarchy
    support): the DIRECT children of each key — one reverse broadcast probe
    (dictionary grouped by parent into sorted child arrays; CH returns
    dictionary order, this engine sorts for determinism — documented
    deviation).  The fact side never shuffles."""
    kids = dictionary.groupBy(F.col(parent_col).alias("__p")).agg(
        F.sort_array(F.collect_list(F.col(dict_key_col))).alias(out_col)
    )
    joined = df.join(F.broadcast(kids), df[key_col] == F.col("__p"), "left")
    return joined.withColumn(
        out_col, F.coalesce(F.col(out_col), F.array().cast("array<long>"))
    ).drop("__p")


def dict_get_descendants(
    df: DataFrame,
    dictionary: DataFrame,
    key_col: str,
    max_depth: int = 5,
    dict_key_col: str = "id",
    parent_col: str = "parent_id",
    out_col: str = "descendants",
) -> DataFrame:
    """dictGetDescendants: ALL keys below each key, to ``max_depth`` levels.

    The transitive closure is computed over the DICTIONARY ONLY (iterative
    self-join — metadata-scale, the dictionary is tiny by contract), then
    broadcast to the fact side as sorted arrays: the 100 TB fact scan pays
    one map-side probe, never an iterative join."""
    edges = dictionary.select(
        F.col(parent_col).alias("anc"), F.col(dict_key_col).alias("d")
    ).filter(F.col("anc").isNotNull())
    closure = edges
    frontier = edges
    for _ in range(max_depth - 1):
        frontier = (
            frontier.alias("f")
            .join(edges.alias("e"), F.col("f.d") == F.col("e.anc"))
            .select(F.col("f.anc").alias("anc"), F.col("e.d").alias("d"))
        )
        closure = closure.unionByName(frontier).distinct()
    desc = closure.groupBy(F.col("anc").alias("__p")).agg(
        F.sort_array(F.collect_set("d")).alias(out_col)
    )
    joined = df.join(F.broadcast(desc), df[key_col] == F.col("__p"), "left")
    return joined.withColumn(
        out_col, F.coalesce(F.col(out_col), F.array().cast("array<long>"))
    ).drop("__p")


# ---------------------------------------------------------------------------
# Typed dictGet variants (FunctionsExternalDictionaries.cpp registers one
# name per attribute type: dictGetString/dictGetInt8..dictGetUInt64/
# dictGetFloat32/64/Date/DateTime/UUID/Decimal32..128, each with an
# OrDefault twin, plus dictGetOrNull/dictHas).  They are all the SAME probe
# as dict_get with a declared result cast — the per-type names exist so CH
# can type the result without inspecting the dictionary layout; here the
# cast IS the typing.
# ---------------------------------------------------------------------------

_DICT_GET_CASTS = {
    "Int8": "tinyint", "Int16": "smallint", "Int32": "int", "Int64": "bigint",
    "UInt8": "smallint", "UInt16": "int", "UInt32": "bigint", "UInt64": "bigint",
    "Float32": "float", "Float64": "double", "String": "string",
    "Date": "date", "DateTime": "timestamp", "UUID": "string",
    "Decimal32": "decimal(9,4)", "Decimal64": "decimal(18,4)",
    "Decimal128": "decimal(38,4)", "IPv4": "string", "IPv6": "string",
}


def dict_get_typed(
    type_name: str,
    df: DataFrame,
    dictionary: DataFrame,
    key_col: str,
    attr_col: str,
    default=None,
    dict_key_col: str | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """dictGet{Type} / dictGet{Type}OrDefault dispatch — pass e.g.
    ``type_name="Int64"`` for dictGetInt64.  ``default=None`` gives the
    plain (NULL-on-miss) form; a non-None default gives the OrDefault form,
    matching the reference's name pairs."""
    spark_t = _DICT_GET_CASTS[type_name]
    out = out_col or attr_col
    got = dict_get(
        df, dictionary, key_col,
        {attr_col: default} if default is not None else [attr_col],
        dict_key_col,
    )
    return got.withColumn(out, F.col(attr_col).cast(spark_t))


def dict_get_or_null(
    df: DataFrame,
    dictionary: DataFrame,
    key_col: str,
    attr_cols: list[str],
    dict_key_col: str | None = None,
) -> DataFrame:
    """dictGetOrNull: identical to the plain dictGet probe — NULL on miss is
    already this engine's base semantics (CH needs the separate name because
    its plain dictGet returns the attribute's DEFAULT on miss)."""
    return dict_get(df, dictionary, key_col, list(attr_cols), dict_key_col)


def dict_has(
    df: DataFrame,
    dictionary: DataFrame,
    key_col: str,
    dict_key_col: str | None = None,
    out_col: str = "has",
) -> DataFrame:
    """dictHas(key): broadcast semi-probe → 0/1."""
    dict_key = dict_key_col or key_col
    d = dictionary.select(F.col(dict_key).alias("__dk")).distinct()
    joined = df.join(F.broadcast(d), df[key_col] == F.col("__dk"), "left")
    return joined.withColumn(
        out_col, F.col("__dk").isNotNull().cast("int")
    ).drop("__dk")


def dict_typed_names() -> dict[str, str]:
    """Exact reference names covered by dict_get_typed/dict_get_or_null/
    dict_has, for the parity inventory."""
    names = {"dictGetOrNull": "dict_get_or_null", "dictHas": "dict_has",
             "dictIsIn": "dict_is_in", "dictGetHierarchy": "dict_get_hierarchy",
             "dictGetChildren": "dict_get_children",
             "dictGetDescendants": "dict_get_descendants"}
    for t in _DICT_GET_CASTS:
        names[f"dictGet{t}"] = f"dict_get_typed({t!r}, ...)"
        names[f"dictGet{t}OrDefault"] = f"dict_get_typed({t!r}, ..., default=)"
    return names
