"""region* geobase functions (reference FunctionsEmbeddedDictionaries.cpp,
src/Dictionaries/Embedded/RegionsHierarchy.h).

The reference ships these against a server-configured Yandex-geobase file
(regions_hierarchy.txt: id, parent, type, population).  This engine takes
the same relation as a small DataFrame with columns
``id, parent_id, type, population`` (plus ``name``/``lang`` for
regionToName) — the caller registers it exactly like a dictionary.

Region types follow the public geobase encoding the reference walks:
continent=1, country=3, federal district=4, area=5, city=6.  Every lookup
is a chain of BROADCAST probes of the tiny hierarchy (the fact side never
shuffles — at 100 TB each probe is a map-side hash lookup, the same cost
shape as the reference's in-memory RegionsHierarchy).  Missing regions
yield 0, like the reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from byconity_spark.operators.dictionary import dict_get_hierarchy

REGION_TYPES = {
    "continent": 1,
    "country": 3,
    "district": 4,
    "area": 5,
    "city": 6,
}


def _chain(df, regions, key_col, max_depth):
    return dict_get_hierarchy(
        df, regions, key_col, "id", "parent_id", max_depth,
        out_col="__chain",
    )


def region_to_type(
    df: DataFrame,
    regions: DataFrame,
    key_col: str,
    kind: str,
    out_col: str | None = None,
    max_depth: int = 10,
) -> DataFrame:
    """regionToCity/Area/District/Country/Continent: the first ancestor
    (including the region itself) of the requested type, else 0."""
    want = REGION_TYPES[kind]
    out_col = out_col or f"region_{kind}"
    typed = regions.select(
        F.col("id").cast("long").alias("__tid"),
        F.col("type").cast("int").alias("__ttype"),
    ).filter(F.col("__ttype") == want)
    with_chain = _chain(df, regions, key_col, max_depth)
    # keep only chain members of the wanted type, preserving chain order
    # (self first), then take the first — an array_* fold over the
    # broadcast-collected typed-id set, no extra join
    typed_ids = [r["__tid"] for r in typed.collect()]
    hit = F.filter(
        F.col("__chain"), lambda x: x.isin(typed_ids) if typed_ids
        else F.lit(False)
    )
    return with_chain.withColumn(
        out_col, F.coalesce(F.try_element_at(hit, F.lit(1)), F.lit(0))
    ).drop("__chain")


def region_to_top_continent(
    df: DataFrame,
    regions: DataFrame,
    key_col: str,
    out_col: str = "region_top_continent",
    max_depth: int = 10,
) -> DataFrame:
    """regionToTopContinent: the LAST continent in the ancestor chain."""
    typed_ids = [
        r["id"] for r in
        regions.filter(F.col("type") == REGION_TYPES["continent"])
        .select(F.col("id").cast("long").alias("id")).collect()
    ]
    with_chain = _chain(df, regions, key_col, max_depth)
    hit = F.filter(
        F.col("__chain"), lambda x: x.isin(typed_ids) if typed_ids
        else F.lit(False)
    )
    return with_chain.withColumn(
        out_col, F.coalesce(F.try_element_at(hit, F.lit(-1)), F.lit(0))
    ).drop("__chain")


def region_to_population(
    df: DataFrame,
    regions: DataFrame,
    key_col: str,
    out_col: str = "region_population",
) -> DataFrame:
    """regionToPopulation: the population attribute; 0 for unknown ids."""
    d = regions.select(
        F.col("id").cast("long").alias("__rid"),
        F.col("population").cast("long").alias("__pop"),
    )
    joined = df.join(F.broadcast(d), df[key_col] == F.col("__rid"), "left")
    return joined.withColumn(
        out_col, F.coalesce(F.col("__pop"), F.lit(0))
    ).drop("__rid", "__pop")


def region_to_name(
    df: DataFrame,
    regions: DataFrame,
    key_col: str,
    lang: str = "en",
    out_col: str = "region_name",
) -> DataFrame:
    """regionToName(id[, lang]): the name attribute; '' for unknown ids.
    A ``lang`` column in the hierarchy narrows the match like the
    reference's per-language name files."""
    d = regions
    if "lang" in d.columns:
        d = d.filter(F.col("lang") == lang)
    d = d.select(
        F.col("id").cast("long").alias("__rid"),
        F.col("name").alias("__name"),
    )
    joined = df.join(F.broadcast(d), df[key_col] == F.col("__rid"), "left")
    return joined.withColumn(
        out_col, F.coalesce(F.col("__name"), F.lit(""))
    ).drop("__rid", "__name")


def region_in(
    df: DataFrame,
    regions: DataFrame,
    lhs_col: str,
    rhs_col: str,
    out_col: str = "region_in",
    max_depth: int = 10,
) -> DataFrame:
    """regionIn(lhs, rhs): rhs is in lhs's ancestor chain (self counts)."""
    with_chain = _chain(df, regions, lhs_col, max_depth)
    return with_chain.withColumn(
        out_col,
        F.array_contains(F.col("__chain"), F.col(rhs_col).cast("long")),
    ).drop("__chain")


def region_hierarchy(
    df: DataFrame,
    regions: DataFrame,
    key_col: str,
    out_col: str = "region_hierarchy",
    max_depth: int = 10,
) -> DataFrame:
    """regionHierarchy(id): the ancestor chain [id, parent, ...]."""
    return dict_get_hierarchy(
        df, regions, key_col, "id", "parent_id", max_depth, out_col=out_col
    )


def geobase_names() -> dict[str, str]:
    """reference name -> implementation pointer, for the parity index."""
    base = "operators.geobase"
    return {
        "regionToCity": f"{base}:region_to_type('city')",
        "regionToArea": f"{base}:region_to_type('area')",
        "regionToDistrict": f"{base}:region_to_type('district')",
        "regionToCountry": f"{base}:region_to_type('country')",
        "regionToContinent": f"{base}:region_to_type('continent')",
        "regionToTopContinent": f"{base}:region_to_top_continent",
        "regionToPopulation": f"{base}:region_to_population",
        "regionToName": f"{base}:region_to_name",
        "regionIn": f"{base}:region_in",
        "regionHierarchy": f"{base}:region_hierarchy",
    }
