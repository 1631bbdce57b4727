"""Table catalog with explicit schemas.

ByConity tables are schema-fixed and declared in a central catalog
(reference: src/Storages/ColumnsDescription.h, src/Catalog/MetastoreFDBImpl.h:56).
We mirror that: every engine table has a declared StructType; no schema
inference is ever used on engine tables.  At 100 TB, inference means an extra
full-listing + footer-sampling pass — declared schemas make the scan plan
deterministic and let Catalyst prune columns from the parquet footer alone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}

# Timestamp columns whose PHYSICAL parquet unit may vary across fixture
# generations.  Spark has no nanosecond timestamp type: if the footer says
# timestamp[ns], the scan must read the raw long
# (spark.sql.legacy.parquet.nanosAsLong) and floor-divide to microseconds —
# the exact truncation DuckDB applies when casting TIMESTAMP_NS -> TIMESTAMP.
# If the footer says timestamp[us] (the current driver fixtures), the column
# is read directly with the logical TimestampType.  The unit is detected
# from the parquet footer per (sf_dir, table) and cached — never assumed.
_MAYBE_NANO_TS_COLS: dict[str, list[str]] = {"events": ["ts"]}

# (sf_dir, table) -> list of columns that are PHYSICALLY nanosecond longs
_nano_cols_cache: dict[tuple[str, str], list[str]] = {}


def _nano_cols(sf_dir: str, name: str) -> list[str]:
    """Columns of `name` that the parquet footer declares as timestamp[ns].

    One footer read per (sf_dir, table) for the driver process lifetime —
    at 100 TB this is a single metadata fetch, not a data scan.  If pyarrow
    is unavailable or the footer is unreadable we assume the logical unit
    (microseconds), matching the current fixtures.
    """
    key = (sf_dir, name)
    if key not in _nano_cols_cache:
        cols: list[str] = []
        try:
            import pyarrow.parquet as pq

            schema = pq.read_schema(f"{sf_dir}/{name}.parquet")
            for col in _MAYBE_NANO_TS_COLS.get(name, []):
                field = schema.field(col)
                if getattr(field.type, "unit", None) == "ns":
                    cols.append(col)
        except Exception:
            cols = []
        _nano_cols_cache[key] = cols
    return _nano_cols_cache[key]


def _physical_schema(name: str, nano_cols: list[str]) -> T.StructType:
    logical = TABLES[name]
    return T.StructType(
        [
            T.StructField(
                f.name,
                T.LongType() if f.name in nano_cols else f.dataType,
                f.nullable,
            )
            for f in logical.fields
        ]
    )


# Tables small enough to broadcast in joins at ANY scale factor.  Only
# region (5 rows) and nation (25 rows) have truly bounded cardinality; TPC-H
# customer/supplier/part all grow linearly with scale factor, so forcing a
# broadcast on them would OOM executors at the 100 TB design point.  For
# those, the session's AQE decides broadcast-vs-shuffle from runtime sizes.
BROADCAST_DIMS = {"region", "nation"}


def _ensure_session_confs(spark: SparkSession) -> None:
    """The engine's correctness-critical RUNTIME confs, applied defensively
    so tables read identically even from a session we didn't build (e.g.
    the verification driver's own SparkSession): ns-timestamp scan support
    and the UTC session timezone the oracles assume."""
    for k, v in (
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.session.timeZone", "UTC"),
    ):
        try:
            if spark.conf.get(k, None) != v:
                spark.conf.set(k, v)
        except Exception:
            pass  # static conf on this build — get_spark() already set it


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one engine table with its DECLARED schema (never inference).

    Passing the StructType to the reader both enforces the catalog contract
    (a drifted parquet file fails at read, not silently downstream) and skips
    the footer-sampling schema-inference pass — at 100 TB that pass is a full
    file-listing plus footer read per file.  Nanosecond timestamp columns are
    read as raw longs and converted to microsecond timestamps in-plan (a
    cheap codegen'd projection, still column-pruned at the scan).
    """
    _ensure_session_confs(spark)
    if name not in TABLES:
        return spark.read.parquet(f"{sf_dir}/{name}.parquet")
    nano = _nano_cols(sf_dir, name)
    df = spark.read.schema(_physical_schema(name, nano)).parquet(
        f"{sf_dir}/{name}.parquet"
    )
    for col in nano:
        # integer `div` (not `/`): double division loses precision on
        # 1.7e18-scale nanosecond epochs (53-bit mantissa)
        df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    # restore declared column order (withColumn keeps it; select to be exact)
    return df.select(*[f.name for f in TABLES[name].fields])


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """All engine tables as DataFrames, memoized per (session, sf_dir).

    Building the 10 readers costs ~0.2 s of driver-side py4j round trips
    (reader construction + schema binding), and nearly every workload
    builder starts here — at 342 queries/bench that overhead dominated
    the sub-second tail (guide §1.2: remove work the job repeats for no
    reason).  The DataFrame plan objects are immutable, so reuse across
    queries within one session is safe; the cache keys on the session
    object itself (an attribute) and the sf_dir, so a different session
    or scale factor rebuilds."""
    cache = getattr(spark, "_bspark_table_cache", None)
    if cache is not None and cache[0] == sf_dir:
        return dict(cache[1])
    dfs = {name: load_table(spark, sf_dir, name) for name in TABLES}
    try:
        spark._bspark_table_cache = (sf_dir, dict(dfs))
    except Exception:
        pass
    return dfs


_LAST_SF_DIR: list[str] = []  # last register_views target, for system.parts


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every engine table as a temp view (for the SQL surface).

    The temp views are ALWAYS (re)pointed at the engine tables — even on
    a cache hit — so a builder that shadowed or dropped a view name can
    never leak into the next query; only the reader construction is
    memoized (load_tables)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    _LAST_SF_DIR[:] = [sf_dir]
    return dfs


def parts_rows(sf_dir: str) -> list[tuple]:
    """system.parts rows (reference StorageSystemParts.cpp — per-part
    rows/bytes).  Parquet files play the role of parts; rows come from the
    footer metadata only (no data scan — same listing cost as the scan
    planner's own planning pass)."""
    import os

    import pyarrow.parquet as pq

    out: list[tuple] = []
    for name in TABLES:
        root = f"{sf_dir}/{name}.parquet"
        files = []
        if os.path.isfile(root):
            files = [root]
        elif os.path.isdir(root):
            for dirpath, _dirs, fnames in os.walk(root):
                files += [
                    os.path.join(dirpath, f)
                    for f in fnames
                    if f.endswith(".parquet")
                ]
        for f in sorted(files):
            try:
                meta = pq.ParquetFile(f).metadata
            except Exception:
                continue
            out.append((
                "default", name, os.path.basename(f),
                int(meta.num_rows), int(os.path.getsize(f)),
                int(meta.num_row_groups), True,
            ))
    return out


def register_system_tables(spark: SparkSession) -> None:
    """``system.tables`` / ``system.columns`` introspection views
    (reference src/Storages/System/StorageSystemTables.cpp,
    StorageSystemColumns.cpp — the first thing reference users query).
    Dots aren't legal in temp-view names, so they register as
    ``system_tables`` / ``system_columns``; the SQL frontend maps the
    dotted reference spelling (frontend/sql.py _SYSTEM_TABLE_MAP)."""
    from byconity_spark.engine.localdf import local_df

    tables_rows = [
        ("default", name, "MergeTree", len(schema.fields))
        for name, schema in TABLES.items()
    ]
    local_df(
        spark, tables_rows,
        "database string, name string, engine string, n_columns int",
    ).createOrReplaceTempView("system_tables")
    col_rows = [
        ("default", tname, f.name, f.dataType.simpleString(), i + 1)
        for tname, schema in TABLES.items()
        for i, f in enumerate(schema.fields)
    ]
    local_df(
        spark, col_rows,
        "database string, table string, name string, type string, position int",
    ).createOrReplaceTempView("system_columns")
