"""Non-parquet source/sink round-trips (CSV / JSON / ORC), dictionary
lookups, sumMap, extremes, grouped WITH FILL.

Reference: file formats src/Formats/registerFormats.cpp:21-81 (CSV,
JSONEachRow, ORC among them), dictGet FunctionsExternalDictionaries.cpp,
sumMap AggregateFunctionSumMap, extremes ExtremesStep.h:22, WITH FILL
FillingStep.h:24.

Round-trip pattern: write a deterministic slice of an engine table to the
format under /tmp, read it back WITH AN EXPLICIT SCHEMA (never inference),
aggregate, and compare against SQL over the original table — proving the
serializer/deserializer pair preserves values exactly.  Timestamps travel
as unix micros in the text formats (CSV/JSON text timestamps lose
sub-millisecond precision); ORC carries native types.
"""

from __future__ import annotations

from byconity_spark.engine.localdf import local_df as _local_df

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from byconity_spark.engine.catalog import load_table
from byconity_spark.operators.aggregates import sum_map
from byconity_spark.operators.dictionary import dict_get
from byconity_spark.operators.extremes import extremes
from byconity_spark.operators.sorts import fill_time_series
from byconity_spark.workloads import register
from byconity_spark.workloads._arrays import arr_dbl_str, arr_str


def _tmp(sf: str, tag: str) -> str:
    return f"/tmp/byconity_spark_sources/{tag}_{hashlib.md5(sf.encode()).hexdigest()[:8]}"


_FLAT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("ts_us", T.LongType()),
    ]
)

_ROUNDTRIP_ORACLE = """
    SELECT event_type,
           count(*) AS n,
           round(sum(value), 4) AS total,
           min(epoch_us(CAST(ts AS TIMESTAMP))) AS first_us
    FROM events WHERE user_id % 4 = 0 GROUP BY event_type
"""


def _flat_events(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events").filter(F.col("user_id") % 4 == 0)
    return ev.select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        F.unix_micros("ts").alias("ts_us"),
    )


def _roundtrip_agg(back: DataFrame) -> DataFrame:
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 4).alias("total"),
        F.min("ts_us").alias("first_us"),
    )


@register("source_csv_roundtrip", oracle=_ROUNDTRIP_ORACLE)
def source_csv_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    path = _tmp(sf, "csv_events")
    _flat_events(spark, sf).write.mode("overwrite").option("header", "true").csv(path)
    back = spark.read.schema(_FLAT_SCHEMA).option("header", "true").csv(path)
    return _roundtrip_agg(back)


@register("source_json_roundtrip", oracle=_ROUNDTRIP_ORACLE)
def source_json_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    path = _tmp(sf, "json_events")
    _flat_events(spark, sf).write.mode("overwrite").json(path)
    back = spark.read.schema(_FLAT_SCHEMA).json(path)
    return _roundtrip_agg(back)


@register("source_orc_roundtrip", oracle=_ROUNDTRIP_ORACLE)
def source_orc_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    path = _tmp(sf, "orc_events")
    _flat_events(spark, sf).write.mode("overwrite").orc(path)
    back = spark.read.schema(_FLAT_SCHEMA).orc(path)
    return _roundtrip_agg(back)


@register("source_jdbc_roundtrip", oracle=_ROUNDTRIP_ORACLE)
def source_jdbc_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """JDBC table engine parity (reference
    src/Storages/registerStorages.cpp:67-147 — MySQL/PostgreSQL/JDBC
    engines): write through Spark's JDBC sink into embedded Derby (the
    bundled backend), read back as a PARTITIONED range scan (4 parallel
    connections on user_id), aggregate.  Cluster deployments swap the URL
    for a real server; the reader options are identical."""
    from byconity_spark.engine.sources import (
        DERBY_DRIVER,
        derby_memory_url,
        jdbc_table,
        jdbc_write,
    )

    flat = _flat_events(spark, sf)
    hi = flat.agg(F.max("user_id")).collect()[0][0] or 1
    url = derby_memory_url("bspark_src")
    jdbc_write(flat, url, "events_rt", driver=DERBY_DRIVER)
    back = jdbc_table(
        spark,
        url,
        "events_rt",
        user="",
        password="",
        driver=DERBY_DRIVER,
        partition_column="user_id",
        lower_bound=0,
        upper_bound=int(hi) + 1,
        num_partitions=4,
    )
    return _roundtrip_agg(back)


# -------------------------------------------------------------- dictGet
@register(
    "dict_get_order_status",
    oracle="""
    SELECT o.o_orderkey,
           coalesce(v.label, 'unknown') AS status_label,
           coalesce(v.rank, -1)         AS status_rank
    FROM orders o
    LEFT JOIN (VALUES ('F', 'finished', 1), ('O', 'open', 2))
         AS v(code, label, rank)
      ON o.o_orderstatus = v.code
    WHERE o.o_orderkey < 500
    """,
)
def dict_get_order_status(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders").filter(F.col("o_orderkey") < 500)
    dictionary = _local_df(spark, 
        [("F", "finished", 1), ("O", "open", 2)],
        "o_orderstatus string, status_label string, status_rank int",
    )
    # 'P' is intentionally absent -> dictGetOrDefault path
    out = dict_get(
        o,
        dictionary,
        key_col="o_orderstatus",
        attr_cols={"status_label": "unknown", "status_rank": -1},
    )
    return out.select("o_orderkey", "status_label", "status_rank")


# --------------------------------------------------------------- sumMap
@register(
    "summap_user_buckets",
    oracle="""
    WITH per_key AS (
      SELECT event_type, user_id % 5 AS k, round(sum(value), 4) AS v
      FROM events GROUP BY event_type, user_id % 5
    )
    SELECT event_type,
           array_to_string(list(k ORDER BY k), '|') AS sum_map_keys,
           array_to_string(list_transform(list(v ORDER BY k),
                                          x -> printf('%.6f', x)), '|') AS sum_map_values
    FROM per_key GROUP BY event_type
    """,
)
def summap_user_buckets(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events").withColumn("k", F.col("user_id") % 5)
    out = sum_map(ev, ["event_type"], "k", "value")
    return out.select(
        "event_type",
        arr_str(F.col("sum_map_keys")).alias("sum_map_keys"),
        arr_dbl_str(
            F.transform(F.col("sum_map_values"), lambda v: F.round(v, 4))
        ).alias("sum_map_values"),
    )


# ------------------------------------------------------------- extremes
@register(
    "extremes_lineitem",
    oracle="""
    SELECT 'min' AS row_type, min(l_quantity) AS l_quantity,
           min(l_extendedprice) AS l_extendedprice, min(l_discount) AS l_discount
    FROM lineitem WHERE l_returnflag = 'A'
    UNION ALL
    SELECT 'max', max(l_quantity), max(l_extendedprice), max(l_discount)
    FROM lineitem WHERE l_returnflag = 'A'
    """,
)
def extremes_lineitem(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem").filter(F.col("l_returnflag") == "A")
    return extremes(li, ["l_quantity", "l_extendedprice", "l_discount"])


# ------------------------------------------------- WITH FILL per group
@register(
    "fill_daily_by_type",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day,
             count(*) AS n
      FROM events WHERE ts < TIMESTAMP '2024-02-01 00:00:00'
      GROUP BY 1, 2
    ),
    bounds AS (
      SELECT event_type, min(day) AS lo, max(day) AS hi FROM daily GROUP BY event_type
    ),
    spine AS (
      SELECT b.event_type, u.day
      FROM bounds b, LATERAL (SELECT unnest(generate_series(b.lo, b.hi, INTERVAL 1 DAY)) AS day) u
    )
    SELECT s.event_type, s.day, coalesce(d.n, 0) AS n
    FROM spine s LEFT JOIN daily d
      ON s.event_type = d.event_type AND s.day = d.day
    """,
)
def fill_daily_by_type(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events").filter(
        F.col("ts") < F.lit("2024-02-01 00:00:00").cast("timestamp")
    )
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    return fill_time_series(
        daily, "day", step_expr="interval 1 day", fill_values={"n": 0},
        group_keys=["event_type"],
    )


# ---------------------- StorageMerge: regex union of catalog tables
@register(
    "source_merge_tables",
    oracle="""
    SELECT src, count(*) AS n, CAST(sum(key_sum) AS BIGINT) AS total
    FROM (
      SELECT 'customer' AS src, c_custkey AS key_sum FROM customer
      UNION ALL
      SELECT 'supplier' AS src, s_suppkey AS key_sum FROM supplier
    ) u GROUP BY src
    """,
)
def source_merge_tables(spark: SparkSession, sf: str) -> DataFrame:
    """merge('(customer|supplier)') (reference StorageMerge /
    TableFunctionMerge): one unionByName plan over regex-matched tables
    with a _table virtual column; per-branch column pruning still applies
    (only the key column is read from each parquet)."""
    from byconity_spark.engine.tables import merge_tables

    tables = {
        "customer": load_table(spark, sf, "customer").select(
            F.col("c_custkey").alias("key_sum")
        ),
        "supplier": load_table(spark, sf, "supplier").select(
            F.col("s_suppkey").alias("key_sum")
        ),
        "orders_x": load_table(spark, sf, "orders").select(
            F.col("o_orderkey").alias("key_sum")
        ),
    }
    merged = merge_tables(spark, tables, "(customer|supplier)", with_table_col=True)
    return merged.groupBy(F.col("_table").alias("src")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("key_sum").cast("long").alias("total"),
    )


# ---------------------- joinGet over a StorageJoin-style keyed table
@register(
    "source_join_get",
    oracle="""
    SELECT o.o_orderkey,
           coalesce(n.label, 'other') AS joinGet_label
    FROM orders o
    LEFT JOIN (VALUES ('F', 'finished'), ('O', 'open')) AS n(code, label)
      ON o.o_orderstatus = n.code
    WHERE o.o_orderkey < 300
    """,
)
def source_join_get(spark: SparkSession, sf: str) -> DataFrame:
    from byconity_spark.engine.tables import join_get

    o = load_table(spark, sf, "orders").filter(F.col("o_orderkey") < 300)
    jt = _local_df(spark, 
        [("F", "finished"), ("O", "open")], "code string, label string"
    )
    out = join_get(
        o, jt, "label", F.col("o_orderstatus"), key_col="code", default="other"
    )
    return out.select("o_orderkey", "joinGet_label")


# ---------------------------------------------------- dictGetHierarchy
@register(
    "dict_hierarchy_regions",
    oracle="""
    SELECT c_custkey,
           CAST(1 + c_nationkey AS VARCHAR) || '|' ||
           CAST(26 + n_regionkey AS VARCHAR)          AS hierarchy,
           (26 + n_regionkey = 27)                    AS in_region1
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE c_custkey <= 500
    """,
)
def dict_hierarchy_regions(spark: SparkSession, sf: str) -> DataFrame:
    """dictGetHierarchy / dictIsIn over a two-level nation->region
    hierarchy dictionary (ids offset so 0 stays the root sentinel)."""
    from byconity_spark.operators.dictionary import (
        dict_get_hierarchy,
        dict_is_in,
    )
    from byconity_spark.workloads._arrays import arr_str

    nation = load_table(spark, sf, "nation")
    region = load_table(spark, sf, "region")
    hier = nation.select(
        (F.col("n_nationkey") + 1).alias("id"),
        (F.col("n_regionkey") + 26).alias("parent_id"),
    ).unionByName(
        region.select(
            (F.col("r_regionkey") + 26).alias("id"),
            F.lit(0).alias("parent_id"),
        )
    )
    cust = (
        load_table(spark, sf, "customer")
        .filter(F.col("c_custkey") <= 500)
        .select("c_custkey", (F.col("c_nationkey") + 1).alias("nk"))
    )
    out = dict_get_hierarchy(cust, hier, "nk", max_depth=4)
    out = out.withColumn("__anc", F.lit(27))
    out = dict_is_in(out, hier, "nk", "__anc", max_depth=4, out_col="in_region1")
    return out.select(
        "c_custkey",
        arr_str(F.col("hierarchy")).alias("hierarchy"),
        "in_region1",
    )


# ------------------------------------ dictGetChildren / dictGetDescendants
@register(
    "dict_children_descendants",
    oracle="""
    WITH keys AS (SELECT r_regionkey + 26 AS k FROM region
                  UNION ALL SELECT 0),
    edges AS (SELECT n_regionkey + 26 AS p, n_nationkey + 1 AS c FROM nation
              UNION ALL SELECT 0, r_regionkey + 26 FROM region),
    closure AS (SELECT p, c FROM edges
                UNION
                SELECT e1.p, e2.c FROM edges e1 JOIN edges e2 ON e1.c = e2.p),
    kid AS (SELECT p, array_to_string(list_sort(list(c)), '|') AS children
            FROM edges GROUP BY p),
    des AS (SELECT p, array_to_string(list_sort(list(DISTINCT c)), '|')
              AS descendants
            FROM closure GROUP BY p)
    SELECT k,
           coalesce(kid.children, '')    AS children,
           coalesce(des.descendants, '') AS descendants
    FROM keys LEFT JOIN kid ON keys.k = kid.p
              LEFT JOIN des ON keys.k = des.p
    """,
)
def dict_children_descendants(spark: SparkSession, sf: str) -> DataFrame:
    """dictGetChildren + dictGetDescendants over the nation->region
    hierarchy dictionary (root 0 -> regions -> nations)."""
    from byconity_spark.operators.dictionary import (
        dict_get_children,
        dict_get_descendants,
    )
    from byconity_spark.workloads._arrays import arr_str

    nation = load_table(spark, sf, "nation")
    region = load_table(spark, sf, "region")
    hier = nation.select(
        (F.col("n_nationkey") + 1).alias("id"),
        (F.col("n_regionkey") + 26).alias("parent_id"),
    ).unionByName(
        region.select(
            (F.col("r_regionkey") + 26).alias("id"),
            F.lit(0).cast("long").alias("parent_id"),
        )
    )
    keys = region.select((F.col("r_regionkey") + 26).alias("k")).unionByName(
        spark.range(1).select(F.lit(0).cast("long").alias("k"))
    )
    out = dict_get_children(keys, hier, "k")
    out = dict_get_descendants(out, hier, "k", max_depth=3)
    return out.select(
        "k",
        arr_str(F.col("children")).alias("children"),
        arr_str(F.col("descendants")).alias("descendants"),
    )


# ------------------------------------------- Hive-layout external table
@register(
    "source_hive_external",
    oracle="""
    SELECT o_orderpriority, count(*) AS n,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    WHERE o_orderstatus = 'F' AND year(CAST(o_orderdate AS DATE)) = 1995
    GROUP BY o_orderpriority
    """,
)
def source_hive_external(spark: SparkSession, sf: str) -> DataFrame:
    """Metastore-less Hive-style external table (reference
    src/Storages/Hive/StorageCnchHive.h): another system wrote a
    two-level ``o_orderstatus=X/o_year=N`` directory tree; we read it via
    layout discovery alone, cast the o_year partition column to the
    declared int type, and prune BOTH partition levels before touching a
    file."""
    from byconity_spark.engine.sources import hive_external_table

    o = load_table(spark, sf, "orders")
    path = _tmp(sf, "hive_layout")
    (
        o.select(
            "o_orderkey",
            "o_orderpriority",
            "o_totalprice",
            "o_orderstatus",
            F.year("o_orderdate").alias("o_year"),
        )
        .write.mode("overwrite")
        .partitionBy("o_orderstatus", "o_year")
        .parquet(path)
    )
    back = hive_external_table(
        spark, path, partition_types={"o_year": "int"}
    ).filter((F.col("o_orderstatus") == "F") & (F.col("o_year") == 1995))
    return back.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


# --------------------------------------------------------------------------
# Corrupt-tolerant ingestion (reference input_format_allow_errors_num /
# kafka_skip_broken_messages: bad rows are counted and skipped, not fatal).
# Spark analogue: PERMISSIVE mode + columnNameOfCorruptRecord.  The feed is
# the JSON flat-events file with 25 deterministic junk lines appended; the
# oracle knows the good-row aggregate from the events table and the junk
# count as a constant.
# --------------------------------------------------------------------------
@register(
    "source_json_corrupt_tolerance",
    oracle="""
    SELECT CAST((SELECT count(*) FROM events WHERE user_id % 4 = 0) AS BIGINT)
             AS n_good,
           CAST(25 AS BIGINT) AS n_corrupt,
           (SELECT round(sum(value), 4) FROM events WHERE user_id % 4 = 0)
             AS total_good
    """,
)
def source_json_corrupt_tolerance(spark: SparkSession, sf: str) -> DataFrame:
    import os
    import uuid

    # unique path per invocation: a repeated same-path plan would collide
    # with Spark's plan-keyed cache when the suite re-runs the builder in
    # one session (the junk file rewrite would race the cached scan)
    path = _tmp(sf, f"json_corrupt_{uuid.uuid4().hex[:8]}")
    _flat_events(spark, sf).write.mode("overwrite").json(path)
    junk = "\n".join(
        f'{{"event_id": "not-a-number", "user_id": [{i}], "value": }}'
        for i in range(25)
    )
    with open(os.path.join(path, "zz_corrupt.json"), "w") as fh:
        fh.write(junk + "\n")
    schema = T.StructType(
        _FLAT_SCHEMA.fields + [T.StructField("_corrupt_record", T.StringType())]
    )
    back = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    ).cache()  # Spark requires materialization before referencing the
    # corrupt-record column in a filter (SPARK-21610)
    good = back.filter(F.col("_corrupt_record").isNull())
    bad = back.filter(F.col("_corrupt_record").isNotNull())
    return (
        good.agg(
            F.count(F.lit(1)).alias("n_good"),
            F.round(F.sum("value"), 4).alias("total_good"),
        )
        .crossJoin(bad.agg(F.count(F.lit(1)).alias("n_corrupt")))
        .select("n_good", "n_corrupt", "total_good")
    )


# ------------------------------------------------ region* geobase family
@register(
    "dict_region_suite",
    oracle="""
    SELECT c_custkey,
           CAST(300 + c_custkey % 50 AS BIGINT)                    AS city,
           CAST(200 + (c_custkey % 50) // 2 AS BIGINT)             AS country,
           CAST(100 + n_regionkey AS BIGINT)                       AS continent,
           CAST(100 + n_regionkey AS BIGINT)                       AS top_cont,
           CAST(1000 * ((300 + c_custkey % 50) % 97) AS BIGINT)    AS pop,
           'R' || CAST(200 + (c_custkey % 50) // 2 AS VARCHAR)     AS cname,
           (100 + n_regionkey = 101)                               AS in_101,
           CAST(300 + c_custkey % 50 AS VARCHAR) || '|' ||
           CAST(200 + (c_custkey % 50) // 2 AS VARCHAR) || '|' ||
           CAST(100 + n_regionkey AS VARCHAR)                      AS hier
    FROM customer
    JOIN nation ON n_nationkey = (c_custkey % 50) // 2
    WHERE c_custkey <= 400
    ORDER BY c_custkey
    """,
)
def dict_region_suite(spark: SparkSession, sf: str) -> DataFrame:
    """region* geobase family (FunctionsEmbeddedDictionaries.cpp) over a
    three-level continent/country/city hierarchy built from the region and
    nation tables: regionToCountry/Continent/TopContinent walk the parent
    chain to the requested geobase type, regionToPopulation/Name probe
    attributes, regionIn tests ancestry — every probe a broadcast of the
    tiny hierarchy, fact side unshuffled."""
    from byconity_spark.operators.geobase import (
        region_in,
        region_hierarchy,
        region_to_name,
        region_to_population,
        region_to_top_continent,
        region_to_type,
    )
    from byconity_spark.workloads._arrays import arr_str

    nation = load_table(spark, sf, "nation")
    region = load_table(spark, sf, "region")
    continents = region.select(
        (F.col("r_regionkey") + 100).alias("id"),
        F.lit(0).alias("parent_id"),
        F.lit(1).alias("type"),
    )
    countries = nation.select(
        (F.col("n_nationkey") + 200).alias("id"),
        (F.col("n_regionkey") + 100).alias("parent_id"),
        F.lit(3).alias("type"),
    )
    cities = nation.select(
        F.explode(F.array(F.lit(0), F.lit(1))).alias("j"),
        (F.col("n_nationkey") * 2 + 300).alias("base"),
    ).select(
        (F.col("base") + F.col("j")).alias("id"),
        ((F.col("base") + F.col("j") - 300) / 2).cast("long")
        .alias("__nk"),
    ).select(
        "id",
        (F.col("__nk") + 200).alias("parent_id"),
        F.lit(6).alias("type"),
    )
    regions = (
        continents.unionByName(countries).unionByName(cities)
        .withColumn("population",
                    F.when(F.col("type") == 6, (F.col("id") % 97) * 1000)
                    .otherwise(F.lit(0)))
        .withColumn("name", F.concat(F.lit("R"), F.col("id")))
    )
    cust = (
        load_table(spark, sf, "customer")
        .filter(F.col("c_custkey") <= 400)
        .select("c_custkey",
                (F.col("c_custkey") % 50 + 300).alias("city"))
    )
    # depth 4 covers the 3-level hierarchy — each extra level is another
    # broadcast probe in the plan, so don't pay for 10
    out = region_to_type(cust, regions, "city", "country", out_col="country",
                         max_depth=4)
    out = region_to_type(out, regions, "city", "continent",
                         out_col="continent", max_depth=4)
    out = region_to_top_continent(out, regions, "city", out_col="top_cont",
                                  max_depth=4)
    out = region_to_population(out, regions, "city", out_col="pop")
    out = region_to_name(out, regions, "country", out_col="cname")
    out = out.withColumn("__c101", F.lit(101))
    out = region_in(out, regions, "city", "__c101", out_col="in_101",
                    max_depth=4)
    out = region_hierarchy(out, regions, "city", out_col="__hier",
                           max_depth=4)
    return out.select(
        "c_custkey", F.col("city").cast("long"),
        F.col("country").cast("long"), F.col("continent").cast("long"),
        F.col("top_cont").cast("long"), F.col("pop").cast("long"),
        "cname", "in_101",
        arr_str(F.col("__hier")).alias("hier"),
    ).orderBy("c_custkey")


@register(
    "idx_token_pruned_search",
    oracle="""
    SELECT doc_id
    FROM documents
    WHERE regexp_matches(lower(text), '(^|[^a-z0-9])dup([^a-z0-9]|$)')
    """,
)
def idx_token_pruned_search(spark: SparkSession, sf: str) -> DataFrame:
    """Token skip index + file-pruned scan (reference
    MergeTreeIndexFullText.h tokenbf_v1 / MergeTreeIndexInverted.h over
    MergeTreeDataSelectExecutor granule skipping).  One distributed pass
    builds a (file, token) posting list; the search reads ONLY the files
    whose posting list contains the token, then re-applies the exact
    hasToken predicate — the index prunes, the residual filter keeps
    results exact (a lossy index can cost time, never correctness).  At
    100 TB this is the difference between scanning every file and the
    handful holding a selective token."""
    import shutil
    import tempfile

    from byconity_spark.engine.skip_index import (
        build_token_index,
        pruned_token_scan,
    )

    base = tempfile.mkdtemp(prefix="bspark_wl_skipidx_")
    try:
        data, idx = f"{base}/docs", f"{base}/idx"
        (
            spark.read.parquet(f"{sf}/documents.parquet")
            .repartition(32, "doc_id")
            .write.mode("overwrite")
            .parquet(data)
        )
        build_token_index(spark, data, "text", idx)
        df, _scanned, _total = pruned_token_scan(
            spark, data, "text", "dup", idx
        )
        rows = df.select("doc_id").collect()
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return _local_df(spark, rows, "doc_id bigint")


# ------------------------------------------- Hudi COW snapshot read
@register(
    "source_hudi_cow",
    oracle="""
    SELECT CAST(n_nationkey AS BIGINT) AS k, n_name AS name,
           CAST(n_regionkey AS BIGINT) AS r,
           CAST(CASE WHEN n_regionkey < 2 THEN 2 ELSE 1 END AS BIGINT) AS v,
           CASE WHEN n_regionkey < 2 THEN '20240102000000000'
                ELSE '20240101000000000' END AS commit_time
    FROM nation
    """,
)
def source_hudi_cow(spark: SparkSession, sf: str) -> DataFrame:
    """Hudi Copy-on-Write SNAPSHOT read (reference registerStorages.cpp:
    33-103 CnchHudi via the Hive connector; engine/hudi.py implements the
    public COW table spec).  The fixture is a partitioned COW layout with
    two completed commits — commit 2 rewrites the file slices of
    partitions r=0 and r=1 only — plus one INFLIGHT commit whose data
    file must stay invisible.  The reader must return exactly one file
    slice per file group: v=2 where rewritten, v=1 elsewhere, no inflight
    rows; `_hoodie_commit_time` proves which slice won."""
    import shutil

    from byconity_spark.engine.hudi import hudi_cow_table, write_cow_file

    n = load_table(spark, sf, "nation").select(
        F.col("n_nationkey").cast("long").alias("k"),
        F.col("n_name").alias("name"),
        F.col("n_regionkey").cast("long").alias("r"),
    )
    pdf = n.toPandas()  # 25 rows — fixture construction, metadata-scale
    base = _tmp(sf, "hudi_cow")
    shutil.rmtree(base, ignore_errors=True)
    c1, c2, c3 = "20240101000000000", "20240102000000000", "20240103000000000"
    for r, grp in pdf.groupby("r"):
        body = grp[["k", "name"]].reset_index(drop=True)
        write_cow_file(base, f"r={r}", f"fg-{r}", c1, body.assign(v=1))
        if r < 2:  # commit 2 rewrites these file groups (same keys, v=2)
            write_cow_file(base, f"r={r}", f"fg-{r}", c2, body.assign(v=2))
    # an in-progress commit's file must be invisible to snapshot readers
    write_cow_file(
        base, "r=0", "fg-0", c3,
        pdf[pdf.r == 0][["k", "name"]].assign(v=9), complete=False,
    )
    back = hudi_cow_table(spark, base, partition_types={"r": "long"})
    return back.select(
        F.col("k").cast("long").alias("k"),
        "name",
        "r",
        F.col("v").cast("long").alias("v"),
        F.col("_hoodie_commit_time").alias("commit_time"),
    )
