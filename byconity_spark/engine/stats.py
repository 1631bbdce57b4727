"""Table/column statistics + cost-based optimization (ANALYZE TABLE).

ByConity's optimizer estimates cardinalities from collected statistics and
reorders joins accordingly (reference: src/Optimizer/CardinalityEstimate/
CardinalityEstimator.h, src/Statistics/StatisticsCollector.h, join-order
enumeration in src/Optimizer/JoinOrderUtils.h).  Spark's analogue is the
Catalyst CBO: ``ANALYZE TABLE ... COMPUTE STATISTICS [FOR COLUMNS ...]``
populates row counts / NDVs in the catalog, and with ``spark.sql.cbo.*``
enabled the optimizer picks the cheapest join order instead of the
syntactic one.

Scale notes: statistics collection is itself a distributed scan-aggregate
(one pass per ANALYZE), so it parallelizes like any query; at 100 TB you
run it once per ingest batch, not per query.  Plans over un-analyzed
tables silently fall back to size-in-bytes heuristics + AQE runtime
statistics — CBO here is additive, never required for correctness.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

CBO_CONFS = {
    "spark.sql.cbo.enabled": "true",
    "spark.sql.cbo.joinReorder.enabled": "true",
    "spark.sql.cbo.planStats.enabled": "true",
}

# join keys worth NDV stats per engine table (TPC-H-ish schema)
_KEY_COLUMNS = {
    "customer": "c_custkey, c_nationkey",
    "orders": "o_orderkey, o_custkey",
    "lineitem": "l_orderkey, l_partkey, l_suppkey",
    "supplier": "s_suppkey, s_nationkey",
    "part": "p_partkey",
    "nation": "n_nationkey, n_regionkey",
    "region": "r_regionkey",
}


def enable_cbo(spark: SparkSession) -> None:
    for k, v in CBO_CONFS.items():
        spark.conf.set(k, v)


def register_stats_tables(
    spark: SparkSession,
    sf_dir: str,
    tables: list[str],
    prefix: str = "cbo_",
    column_stats: bool = True,
) -> list[str]:
    """Expose parquet files as external catalog tables and ANALYZE them so
    the CBO has row counts (+ per-column NDV/min/max for join keys).

    Idempotent per (session, sf_dir): re-registering the same location is a
    cheap no-op apart from the ANALYZE scan.  Returns the catalog names.
    """
    enable_cbo(spark)
    names = []
    for t in tables:
        name = f"{prefix}{t}"
        loc = f"{sf_dir}/{t}.parquet"
        if spark.catalog.tableExists(name):
            # re-point if a different scale factor was registered before
            spark.sql(f"DROP TABLE IF EXISTS {name}")
        spark.sql(f"CREATE TABLE {name} USING parquet LOCATION '{loc}'")
        spark.sql(f"ANALYZE TABLE {name} COMPUTE STATISTICS")
        if column_stats and t in _KEY_COLUMNS:
            spark.sql(
                f"ANALYZE TABLE {name} COMPUTE STATISTICS "
                f"FOR COLUMNS {_KEY_COLUMNS[t]}"
            )
        names.append(name)
    return names


def table_row_stats(spark: SparkSession, name: str) -> int | None:
    """Row count recorded in the catalog by ANALYZE (None if absent)."""
    for row in spark.sql(f"DESC EXTENDED {name}").collect():
        if row.col_name == "Statistics" and "rows" in row.data_type:
            return int(row.data_type.split(",")[1].strip().split(" ")[0])
    return None


# ========================================================================
# JSON-sidecar statistics for PATH-parquet frames (no catalog table):
# the AutoStatisticsManager analogue feeding explicit broadcast hints
# (reference src/Statistics/AutoStatisticsManager.h,
# Rule/Implementation/SetJoinDistribution.h).
# ========================================================================

import json
import os
import time
from dataclasses import asdict, dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

STATS_DIR = os.environ.get("SPARK_GRAFT_STATS_DIR", "/tmp/byconity_spark_stats")

# rough per-value byte widths for row-size estimation
_TYPE_WIDTH = {
    "int": 4, "bigint": 8, "double": 8, "float": 4, "date": 4,
    "timestamp": 8, "boolean": 1, "string": 24, "binary": 32,
}


@dataclass
class ColumnStats:
    ndv: int
    min: object
    max: object
    null_count: int
    # NdvBuckets (reference src/Statistics/StatsNdvBuckets.h /
    # BucketBounds.h): equi-width histogram over [min, max] with per-bucket
    # row counts AND per-bucket NDV — the optimizer's range-selectivity and
    # join-fanout source.  None for non-numeric columns.
    buckets: list | None = None  # [[count, ndv], ...] over N_BUCKETS
    # NdvBucketsExtend (StatsNdvBucketsExtend.h): EXPLICIT equi-height
    # bounds — the upper edge of each bucket from approx quantiles, which
    # stays informative under skew where equi-width collapses into one
    # dense cell.  None unless extended collection ran.
    bounds: list | None = None  # ascending upper bounds, len N_BUCKETS


N_BUCKETS = 8


@dataclass
class TableStats:
    table: str
    row_count: int
    columns: dict[str, ColumnStats] = field(default_factory=dict)
    collected_at: float = 0.0

    def avg_row_bytes(self, schema: T.StructType) -> int:
        return sum(
            _TYPE_WIDTH.get(f.dataType.simpleString(), 16) for f in schema.fields
        )


def _cache_path(sf_dir: str, table: str) -> str:
    key = f"{sf_dir.strip('/').replace('/', '_')}__{table}"
    return os.path.join(STATS_DIR, f"{key}.json")


def analyze_table(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    columns: list[str] | None = None,
    refresh: bool = False,
) -> TableStats:
    """ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS: one aggregate pass,
    JSON-sidecar cached (keyed by the source file's mtime)."""
    from byconity_spark.engine.catalog import load_table

    src = f"{sf_dir}/{table}.parquet"
    mtime = os.path.getmtime(src) if os.path.exists(src) else 0.0
    cpath = _cache_path(sf_dir, table)
    if not refresh and os.path.exists(cpath):
        with open(cpath) as fh:
            raw = json.load(fh)
        if raw.get("source_mtime") == mtime:
            st = TableStats(
                raw["table"], raw["row_count"],
                {c: ColumnStats(**v) for c, v in raw["columns"].items()},
                raw["collected_at"],
            )
            return st

    df = load_table(spark, sf_dir, table)
    stats = _compute_stats(df, table, columns)
    os.makedirs(STATS_DIR, exist_ok=True)
    payload = asdict(stats)
    payload["source_mtime"] = mtime
    with open(cpath, "w") as fh:
        json.dump(payload, fh, default=str)
    return stats


def _compute_stats(
    df: DataFrame, table: str, columns: list[str] | None = None
) -> TableStats:
    """The collection passes behind ANALYZE/CREATE STATS, independent of
    where the frame came from (path-backed parquet or a session table)."""
    cols = columns or [
        f.name
        for f in df.schema.fields
        if f.dataType.simpleString()
        in ("int", "bigint", "double", "float", "date", "timestamp", "string")
    ]
    def _ref(c: str):
        # ByConity implicit map column `__m__'k'` = key 'k' of map m
        # (stats over it are expression stats on that key's values)
        import re as _re

        m = _re.fullmatch(r"__([A-Za-z_]\w*?)__'(.*)'", c.strip("`"))
        if m:
            return F.try_element_at(F.col(m.group(1)), F.lit(m.group(2)))
        return F.col(c)

    # numeric columns that can carry NdvBuckets/NdvBucketsExtend
    num_candidates = [
        c for c in cols
        if c in df.columns  # implicit map-key pseudo-columns have no field
        and df.schema[c].dataType.simpleString()
        in ("int", "bigint", "double", "float")
    ]
    aggs: list = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.approx_count_distinct(_ref(c)).alias(f"__ndv_{c}"),
            F.min(_ref(c)).alias(f"__min_{c}"),
            F.max(_ref(c)).alias(f"__max_{c}"),
            F.count(F.when(_ref(c).isNull(), 1)).alias(f"__nulls_{c}"),
        ]
    # NdvBucketsExtend equi-height bounds need no min/max, so the
    # approx-quantile cells ride the FIRST pass (guide §1.2: one fewer
    # full scan-aggregate job than computing them in a separate pass)
    aggs += [
        F.percentile_approx(
            c, [float(i + 1) / N_BUCKETS for i in range(N_BUCKETS)], 2500
        ).alias(f"__q_{c}")
        for c in num_candidates
    ]
    row = df.agg(*aggs).collect()[0].asDict()
    stats = TableStats(table, int(row["__n"]), {}, time.time())
    for c in cols:
        stats.columns[c] = ColumnStats(
            ndv=int(row[f"__ndv_{c}"]),
            min=_jsonable(row[f"__min_{c}"]),
            max=_jsonable(row[f"__max_{c}"]),
            null_count=int(row[f"__nulls_{c}"]),
        )
    num_cols = [
        c for c in num_candidates
        if stats.columns[c].min is not None
        and float(stats.columns[c].max) > float(stats.columns[c].min)
    ]
    # NdvBuckets pass: per-bucket (count, ndv) for numeric columns.  All
    # columns fold into ONE small explode -> groupBy(col, bucket) job —
    # bounded at n_cols * N_BUCKETS groups, absorbed by map-side partial
    # aggregation — instead of 2*N_BUCKETS*n_cols conditional-masked agg
    # cells whose whole-stage codegen dominated the cold run.
    if num_cols:
        structs = []
        for ci, c in enumerate(num_cols):
            lo = float(stats.columns[c].min)
            hi = float(stats.columns[c].max)
            width = (hi - lo) / N_BUCKETS
            b = F.least(
                F.lit(N_BUCKETS - 1),
                F.floor((F.col(c) - F.lit(lo)) / F.lit(width)).cast("int"),
            )
            structs.append(F.struct(
                F.lit(ci).alias("__ci"), b.alias("__b"),
                F.col(c).cast("double").alias("__v"),
            ))
        brows = (
            df.select(F.explode(F.array(*structs)).alias("__p"))
            .select("__p.__ci", "__p.__b", "__p.__v")
            .where(F.col("__b").isNotNull())
            .groupBy("__ci", "__b")
            .agg(F.count(F.lit(1)).alias("__c"),
                 F.approx_count_distinct("__v").alias("__n"))
            .collect()
        )
        cells = {(int(r["__ci"]), int(r["__b"])): (int(r["__c"]), int(r["__n"]))
                 for r in brows}
        for ci, c in enumerate(num_cols):
            stats.columns[c].buckets = [
                list(cells.get((ci, i), (0, 0))) for i in range(N_BUCKETS)
            ]
            qs = row[f"__q_{c}"]
            if qs is not None:
                stats.columns[c].bounds = [float(x) for x in qs]
    return stats


def _jsonable(v):
    import datetime

    if isinstance(v, (datetime.date, datetime.datetime)):
        return v.isoformat()
    return v


def estimate_rows(stats: TableStats, predicates: list[tuple[str, str, object]]) -> float:
    """Cardinality estimate under simple predicates [(col, op, value)]:
    '=' -> 1/ndv, range ops -> fraction of the [min, max] span (numeric
    only; 1/3 fallback, the classic default selectivity)."""
    sel = 1.0
    for col, op, value in predicates:
        cs = stats.columns.get(col)
        if cs is None:
            sel *= 1 / 3
            continue
        if op == "=":
            sel *= 1.0 / max(cs.ndv, 1)
        elif op in ("<", "<=", ">", ">="):
            try:
                lo, hi = float(cs.min), float(cs.max)
                v = float(value)
                span = max(hi - lo, 1e-12)
                if cs.bounds:
                    # equi-height path: each bound holds ~1/NB of the
                    # mass; linear interpolation inside the straddled
                    # bucket (StatsNdvBucketsExtend selectivity)
                    nb = len(cs.bounds)
                    frac = 1.0
                    prev = lo
                    for bi, ub in enumerate(cs.bounds):
                        if v <= ub:
                            width = max(ub - prev, 1e-12)
                            frac = (bi + min(max((v - prev) / width, 0.0), 1.0)) / nb
                            break
                        prev = ub
                    sel *= frac if op in ("<", "<=") else 1.0 - frac
                elif cs.buckets:
                    # NdvBuckets path: exact bucket counts below/above v
                    # plus a linear fraction of the straddled bucket —
                    # robust to skew where the uniform span fraction
                    # is not (StatsNdvBuckets selectivity model)
                    nb = len(cs.buckets)
                    width = span / nb
                    total = sum(cnt for cnt, _ in cs.buckets) or 1
                    pos = min(max((v - lo) / width, 0.0), float(nb))
                    full = int(pos)
                    below = sum(cnt for cnt, _ in cs.buckets[:full])
                    if full < nb:
                        below += cs.buckets[full][0] * (pos - full)
                    frac = below / total
                    sel *= frac if op in ("<", "<=") else 1.0 - frac
                else:
                    frac = (
                        (v - lo) / span if op in ("<", "<=") else (hi - v) / span
                    )
                    sel *= min(max(frac, 0.0), 1.0)
            except (TypeError, ValueError):
                sel *= 1 / 3
        else:
            sel *= 1 / 3
    return stats.row_count * sel


def broadcast_if_small(
    df: DataFrame,
    est_rows: float,
    schema_bytes: int,
    threshold_bytes: int = 32 * 1024 * 1024,
) -> DataFrame:
    """Apply an explicit broadcast hint when the ESTIMATED frame size is
    under threshold — the SetJoinDistribution decision
    (src/Optimizer/Rule/Implementation/SetJoinDistribution.h) made from
    sidecar stats instead of a Cascades memo."""
    if est_rows * schema_bytes < threshold_bytes:
        return F.broadcast(df)
    return df


# ========================================================================
# Stats DDL (reference src/Parsers/ASTStatsQuery.h — CREATE/DROP/SHOW
# STATS | COLUMN_STATS, driven by src/Statistics/StatisticsCollector.h):
# the ByConity-dialect statement surface over the collection machinery
# above.  CREATE STATS on a path-backed engine table runs the sidecar
# collection AND registers + ANALYZEs a catalog table so Catalyst CBO
# consumes the same pass; session tables collect in-memory only.
# ========================================================================

_STATS_REGISTRY: dict[str, TableStats] = {}


def create_stats(
    spark: SparkSession, table: str, columns: list[str] | None = None
) -> TableStats:
    from byconity_spark.engine.catalog import _LAST_SF_DIR, TABLES

    if _LAST_SF_DIR and table in TABLES:
        st = analyze_table(
            spark, _LAST_SF_DIR[0], table, columns, refresh=True
        )
        try:
            # register + row-count ANALYZE so spark.sql.cbo.* sees the
            # catalog-side stats too; per-column NDVs already live in the
            # sidecar, so skip the second (FOR COLUMNS) scan
            register_stats_tables(
                spark, _LAST_SF_DIR[0], [table], column_stats=False
            )
        except Exception:
            pass  # catalog may be read-only in exotic sessions — sidecar
            # stats above are already collected and registered
    else:
        st = _compute_stats(spark.table(table), table, columns)
    _STATS_REGISTRY[table] = st
    return st


def drop_stats(table: str) -> bool:
    """DROP STATS t — forgets registry AND sidecar cache entries."""
    found = _STATS_REGISTRY.pop(table, None) is not None
    from byconity_spark.engine.catalog import _LAST_SF_DIR

    if _LAST_SF_DIR:
        cpath = _cache_path(_LAST_SF_DIR[0], table)
        if os.path.exists(cpath):
            os.remove(cpath)
            found = True
    return found


def stats_rows(table: str | None = None) -> list[tuple]:
    """SHOW STATS [t] — (table, row_count, n_column_stats)."""
    if table is not None:
        items = (
            [(table, _STATS_REGISTRY[table])]
            if table in _STATS_REGISTRY else []
        )
    else:
        items = sorted(_STATS_REGISTRY.items())
    return [
        (name, int(st.row_count), len(st.columns)) for name, st in items
    ]


def column_stats_rows(table: str) -> list[tuple]:
    """SHOW COLUMN_STATS t — (column, ndv, null_count, min, max) with
    min/max rendered as strings (mixed types in one result column)."""
    st = _STATS_REGISTRY.get(table)
    if st is None:
        return []
    return [
        (c, int(cs.ndv), int(cs.null_count),
         None if cs.min is None else str(cs.min),
         None if cs.max is None else str(cs.max))
        for c, cs in sorted(st.columns.items())
    ]


# ---------------------------------------------------------------------------
# Reference-shaped stats display (InterpreterShowStatsQuery.cpp /
# InterpreterCreateStatsQuery.cpp / Statistics/FullCollectStep.cpp):
# CREATE STATS outputs (table_name, column_count, row_count_or_error);
# SHOW STATS renders identifier/type/count/null_count/ndv/min/max/
# avg_byte_size/has_histogram rows with a leading `t.*` row-count line;
# SHOW COLUMN_STATS renders per-bucket histogram rows.  String-family
# columns are collected through the reference's cityHash64 wrapper
# (ParseUtils.h WrapperKind::StringToHash64) so min/max/histogram values
# are bit-identical; avg_byte_size = trunc(sum(byteSize)/nonnull) with
# byteSize(String) = len + 9 (+1 Nullable mask), fixed types their
# in-memory size (45022 golden).  This registry feeds the DISPLAY
# surface only — the CBO sidecar (_STATS_REGISTRY, raw-domain min/max)
# is untouched.
# ---------------------------------------------------------------------------

_SHOW_STATS: dict[str, dict] = {}

_CH_FIXED_SIZES = [
    (r"(?i)(U?Int8|Bool(ean)?|Enum8)(\(.*\))?", 1),
    (r"(?i)(U?Int16|Enum16)(\(.*\))?", 2),
    (r"(?i)U?Int32|Float32|Date32|DateTime(\([^)]*\))?", 4),
    (r"(?i)U?Int64|Float64|DateTime64.*", 8),
    (r"(?i)U?Int128|UUID", 16), (r"(?i)U?Int256", 32),
    (r"(?i)Date", 2), (r"(?i)Decimal32.*", 4), (r"(?i)Decimal64.*", 8),
    (r"(?i)Decimal128.*", 16), (r"(?i)Decimal256.*", 32),
    (r"(?i)Decimal\s*\((?:[0-8]|9)\s*,.*", 4),
    (r"(?i)Decimal\s*\((?:1[0-8])\s*,.*", 8),
    (r"(?i)Decimal.*", 16),
]

# the reference CI runs its server in this zone — DateTime walls parse
# into epochs relative to it (45004 golden: '2022-01-01 00:00:01' →
# 1640984401 = Moscow wall)
_REF_SERVER_TZ = "Europe/Moscow"


def _ch_display_type(t: str) -> str:
    """SHOW STATS renders NORMALIZED CH type names: DecimalNN(S) →
    Decimal(precision, S) (45004 golden shows Decimal(9, 5))."""
    import re

    for bits, prec in (("32", 9), ("64", 18), ("128", 38), ("256", 76)):
        t = re.sub(
            rf"(?i)\bDecimal{bits}\s*\(\s*(\d+)\s*\)",
            rf"Decimal({prec}, \1)", t,
        )
    return t


def _stats_wrap_sql(vsql: str, ch_t: str) -> str:
    """The reference's collection wrapper as Spark SQL → DOUBLE
    (ParseUtils.h getWrappedColumnName): strings hash (handled by the
    caller), UUID → UInt128 (LOW half first — CH's UUID byte order),
    Date/Date32 → epoch days, DateTime[64] → epoch seconds in the
    server zone, everything else a plain double cast."""
    import re

    t = re.sub(r"(?is)^\s*(?:Nullable|LowCardinality)\s*\((.*)\)\s*$",
               r"\1", ch_t.strip())
    t = re.sub(r"(?is)^\s*(?:Nullable|LowCardinality)\s*\((.*)\)\s*$",
               r"\1", t)
    if re.fullmatch(r"(?i)UUID", t.strip()):
        hexs = f"lower(replace({vsql}, '-', ''))"
        return (
            f"(CAST(conv(substr({hexs}, 17, 16), 16, 10) AS DOUBLE) * "
            f"CAST(18446744073709551616 AS DOUBLE) + "
            f"CAST(conv(substr({hexs}, 1, 16), 16, 10) AS DOUBLE))"
        )
    if re.fullmatch(r"(?i)Date(32)?", t.strip()):
        return f"CAST(datediff({vsql}, DATE'1970-01-01') AS DOUBLE)"
    if re.match(r"(?i)\s*DateTime64", t):
        utc = (f"CAST(convert_timezone('{_REF_SERVER_TZ}', 'UTC', "
               f"CAST({vsql} AS TIMESTAMP_NTZ)) AS TIMESTAMP)")
        return f"(CAST(unix_micros({utc}) AS DOUBLE) / 1e6)"
    if re.match(r"(?i)\s*DateTime", t):
        utc = (f"convert_timezone('{_REF_SERVER_TZ}', 'UTC', "
               f"CAST({vsql} AS TIMESTAMP_NTZ))")
        return f"CAST(to_unix_timestamp({utc}) AS DOUBLE)"
    return f"CAST({vsql} AS DOUBLE)"


def _ch_float_text(v) -> str:
    """Stats Float64 text (FormattedOutputData doubles print %.17g —
    45022 shows 7.2320557878566318e+18, one digit past shortest): nan,
    small integrals plain, %.17g otherwise."""
    import math

    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "nan"
    f = float(v)
    if f == int(f) and abs(f) < 1e16:
        return str(int(f))
    return format(f, ".17g")


def _ch_fixed_size(ch_type: str) -> int | None:
    import re

    t = ch_type.strip()
    for _ in range(2):  # LowCardinality(Nullable(T)) unwraps twice
        t = re.sub(
            r"(?is)^\s*(?:Nullable|LowCardinality)\s*\((.*)\)\s*$",
            r"\1", t,
        ).strip()
    fm = re.fullmatch(r"(?i)FixedString\s*\(\s*(\d+)\s*\)", t)
    if fm:
        return int(fm.group(1))
    for pat, n in _CH_FIXED_SIZES:
        if re.fullmatch(pat, t):
            return n
    return None


def _is_string_family(ch_type: str) -> bool:
    import re

    t = re.sub(r"(?is)(?:Nullable|LowCardinality)\s*\(|\)", "",
               ch_type.strip())
    return bool(re.match(r"(?i)\s*(String|FixedString)", t))


def collect_display_stats(
    spark: SparkSession, table: str, columns: list[str] | None
) -> tuple[int, int]:
    """Run the reference's collection over `table`; returns
    (column_count, row_count).  `columns` may contain implicit BYTE-map
    names (__col__'key'); None collects every ordinary collectable
    column plus implicit columns that already have stats."""
    import re

    from pyspark.sql import functions as F

    from byconity_spark.frontend.sql import (
        ChSqlError, _TABLE_BYTE_MAPS, _TABLE_CH_DDL,
    )

    df = spark.table(table)
    spark_types = dict(df.dtypes)
    ddl = _TABLE_CH_DDL.get(table, {})
    ch_types = {c[0]: (c[1] or "") for c in ddl.get("columns", ())}

    def ch_type_of(col: str) -> str:
        if col in ch_types and ch_types[col]:
            return ch_types[col]
        st = spark_types.get(col, "")
        return {
            "bigint": "Int64", "int": "Int32", "smallint": "Int16",
            "tinyint": "Int8", "double": "Float64", "float": "Float32",
            "string": "String", "date": "Date", "timestamp": "DateTime",
            "boolean": "UInt8",
        }.get(st, st or "String")

    def collectable(col: str) -> bool:
        t = ch_type_of(col)
        return not re.match(
            r"(?is)\s*(Map|Array|Tuple|Nested|AggregateFunction)\s*\(", t
        ) and col in spark_types

    # resolve the target list: (display_name, value_sql, ch_type)
    targets: list[tuple[str, str, str]] = []
    if columns:
        for raw in columns:
            name = raw.strip().strip("`")
            im = re.fullmatch(r"__(\w+?)__'(.*)'", name)
            if im:
                base, key = im.group(1), im.group(2)
                if base not in _TABLE_BYTE_MAPS.get(table, ()):
                    raise ChSqlError(
                        f"BAD_ARGUMENTS (36): column {name!r} of "
                        f"{table!r} is not a collectable implicit map "
                        f"column"
                    )
                vm = re.fullmatch(
                    r"(?is)\s*Map\s*\((.+)\)\s*", ch_types.get(base, "")
                )
                from byconity_spark.frontend.ddl import split_top_level
                vt = (split_top_level(vm.group(1))[1].strip()
                      if vm else "String")
                if not re.match(r"(?i)\s*Nullable", vt):
                    vt = f"Nullable({vt})"
                targets.append(
                    (name, f"try_element_at(`{base}`, '{key}')", vt)
                )
                continue
            if not collectable(name):
                raise ChSqlError(
                    f"BAD_ARGUMENTS (36): column {name!r} of {table!r} "
                    f"is not collectable"
                )
            targets.append((name, f"`{name}`", ch_type_of(name)))
    else:
        for col in spark_types:
            if collectable(col):
                targets.append((col, f"`{col}`", ch_type_of(col)))
        prev = _SHOW_STATS.get(table, {}).get("cols", {})
        for name in prev:
            im = re.fullmatch(r"__(\w+?)__'(.*)'", name)
            if im:
                targets.append(
                    (name, f"try_element_at(`{im.group(1)}`, "
                           f"'{im.group(2)}')",
                     prev[name]["type"])
                )

    # ONE distributed aggregation pass over every target column
    aggs = [F.count(F.lit(1)).alias("__rc")]
    for i, (_name, vsql, ch_t) in enumerate(targets):
        v = F.expr(vsql)
        aggs.append(F.count(v).alias(f"c{i}"))
        aggs.append(F.countDistinct(v).alias(f"d{i}"))
        if _is_string_family(ch_t):
            from byconity_spark.functions.hash_exact import (
                exact_hash_column,
            )
            hs = exact_hash_column("cityHash64", v)
            # the reference's wrapper is UInt64 → Float64; the exact
            # kernel returns the SIGNED 64-bit image — re-bias
            h = (hs.cast("double")
                 + F.when(hs < 0, F.lit(18446744073709551616.0))
                    .otherwise(F.lit(0.0)))
            aggs.append(F.min(h).alias(f"mn{i}"))
            aggs.append(F.max(h).alias(f"mx{i}"))
            # byteSize(String) = len + 9, +1 for the Nullable mask
            # (LowCardinality(Nullable(...)) wraps too)
            pad = 10 if re.search(r"(?i)\bNullable\b", ch_t) else 9
            aggs.append(
                F.sum(F.length(v) + F.lit(pad)).alias(f"ln{i}")
            )
        else:
            w = _stats_wrap_sql(vsql, ch_t)
            aggs.append(F.expr(f"min({w})").alias(f"mn{i}"))
            aggs.append(F.expr(f"max({w})").alias(f"mx{i}"))
            aggs.append(F.lit(None).cast("bigint").alias(f"ln{i}"))
    row = df.agg(*aggs).collect()[0]
    row_count = int(row["__rc"])

    def _hist_key(vsql: str, ch_t: str):
        vexpr = F.expr(vsql)
        if _is_string_family(ch_t):
            from byconity_spark.functions.hash_exact import (
                exact_hash_column,
            )
            ks = exact_hash_column("cityHash64", vexpr)
            return (ks.cast("double")
                    + F.when(ks < 0,
                             F.lit(18446744073709551616.0))
                       .otherwise(F.lit(0.0)))
        return F.expr(_stats_wrap_sql(vsql, ch_t))

    # Histogram pass: every column whose measured ndv is in (0, 64]
    # gets per-value buckets.  All such columns fold into ONE stacked
    # groupBy job — explode (col_idx, key) pairs then group by both —
    # instead of one groupBy+collect job per column (guide §1.2: at
    # most 64*n_cols tiny groups, the job count was the cost).
    hist_idx = [
        i for i, (_n, _v, _t) in enumerate(targets)
        if 0 < int(row[f"d{i}"] or 0) <= 64
    ]
    hist_buckets: dict[int, list] = {i: [] for i in hist_idx}
    if hist_idx:
        pairs = F.explode(F.array(*[
            F.struct(
                F.lit(i).alias("__i"),
                _hist_key(targets[i][1], targets[i][2]).alias("__k"),
            )
            for i in hist_idx
        ])).alias("__p")
        brows = (
            df.select(pairs)
            .select(F.col("__p.__i").alias("__i"),
                    F.col("__p.__k").alias("__k"))
            .where(F.col("__k").isNotNull())
            .groupBy("__i", "__k").count()
            .collect()
        )
        for r in sorted(brows, key=lambda r: (r["__i"], r["__k"])):
            hist_buckets[int(r["__i"])].append(
                (float(r["__k"]), float(r["__k"]), int(r["count"]))
            )

    entry = _SHOW_STATS.setdefault(table, {"row_count": 0, "cols": {}})
    entry["row_count"] = row_count
    for i, (name, vsql, ch_t) in enumerate(targets):
        nonnull = int(row[f"c{i}"] or 0)
        ndv = int(row[f"d{i}"] or 0)
        mn, mx = row[f"mn{i}"], row[f"mx{i}"]
        fixed = _ch_fixed_size(ch_t)
        if fixed is not None:
            # fixed-layout types (incl. FixedString(n)) always report
            # their in-memory size, even with no data (45004)
            avg = fixed
        elif _is_string_family(ch_t):
            total_len = row[f"ln{i}"]
            avg = (int(total_len) // nonnull
                   if total_len and nonnull else 8)
        else:
            avg = 8
        buckets = hist_buckets.get(i, [])[:65]
        entry["cols"][name] = {
            "type": ch_t, "count": nonnull,
            "nulls": row_count - nonnull, "ndv": ndv,
            "min": (float(mn) if mn is not None else None),
            "max": (float(mx) if mx is not None else None),
            "avg": int(avg), "buckets": buckets,
            "has_hist": 1 if ndv > 0 else 0,
        }
    # keep DDL-then-implicit-sorted ordering for SHOW STATS
    ddl_order = [c[0] for c in ddl.get("columns", ())] or list(
        spark_types
    )

    def sort_key(n: str):
        return (
            (ddl_order.index(n), "") if n in ddl_order else
            (len(ddl_order), n)
        )

    entry["cols"] = dict(
        sorted(entry["cols"].items(), key=lambda kv: sort_key(kv[0]))
    )
    return len(targets), row_count


def show_stats_rows(table: str) -> list[tuple]:
    """SHOW STATS t — the reference's 9-column formatted block, all
    cells pre-rendered to text ('' for absent, CH float text)."""
    e = _SHOW_STATS.get(table)
    if e is None:
        return []
    rows = [(f"{table}.*", "", str(e["row_count"]),
             "", "", "", "", "", "")]
    for name, c in e["cols"].items():
        rows.append((
            f"{table}.{name}", _ch_display_type(c["type"]),
            str(c["count"]),
            str(c["nulls"]), str(c["ndv"]),
            _ch_float_text(c["min"]), _ch_float_text(c["max"]),
            str(c["avg"]), str(c["has_hist"]),
        ))
    return rows


def show_column_stats_rows(table: str) -> list[tuple]:
    """SHOW COLUMN_STATS t — per-bucket histogram rows
    (InterpreterShowStatsQuery::getColumnFormattedOutput)."""
    e = _SHOW_STATS.get(table)
    if e is None:
        return []
    out = []
    for name, c in e["cols"].items():
        cum_count = 0
        cum_ndv = 0
        for bid, (lo, hi, count) in enumerate(c["buckets"]):
            cum_count += count
            cum_ndv += 1
            out.append((
                f"{table}.{name}", str(bid),
                f"[{_ch_float_text(lo)}, {_ch_float_text(hi)}]",
                str(count), "1", str(cum_count), str(cum_ndv),
            ))
    return out


def drop_display_stats(table: str) -> bool:
    return _SHOW_STATS.pop(table, None) is not None
