import sys, time
sys.path.insert(0, "/root/repo")
from byconity_spark.engine.session import get_spark
from byconity_spark.engine.catalog import register_views
from byconity_spark.engine.stats import (
    collect_display_stats, create_stats, register_stats_tables,
    _STATS_REGISTRY, drop_display_stats, analyze_table)

SF="/root/testdata/sf0.1"
spark=get_spark()
register_views(spark, SF)

def t(label, fn, n=3):
    best=None
    for _ in range(n):
        t0=time.perf_counter(); fn(); dt=time.perf_counter()-t0
        best=dt if best is None else min(best,dt)
    print(f"{label}: {best:.3f}s", flush=True)

# warm
collect_display_stats(spark, "orders", ["o_orderkey","o_custkey"])
t("collect_display_stats(orders,2cols)", lambda: collect_display_stats(spark, "orders", ["o_orderkey","o_custkey"]))
t("analyze_table refresh (_compute_stats)", lambda: analyze_table(spark, SF, "orders", ["o_orderkey","o_custkey"], refresh=True))
t("register_stats_tables(no colstats)", lambda: register_stats_tables(spark, SF, ["orders"], column_stats=False))

# --- TBLPROPERTIES stats injection viability
spark.sql("DROP TABLE IF EXISTS cbo_probe")
spark.sql(f"CREATE TABLE cbo_probe USING parquet LOCATION '{SF}/orders.parquet'")
try:
    spark.sql("ALTER TABLE cbo_probe SET TBLPROPERTIES('spark.sql.statistics.numRows'='150000','spark.sql.statistics.totalSize'='5000000')")
    rows=[r for r in spark.sql("DESC EXTENDED cbo_probe").collect() if "tatist" in str(r[0])+str(r[1])]
    print("injected stats visible:", rows)
except Exception as e:
    print("TBLPROPERTIES injection FAILED:", e)
# NOSCAN alternative
t("ANALYZE NOSCAN", lambda: spark.sql("ANALYZE TABLE cbo_probe COMPUTE STATISTICS NOSCAN"))
rows=[r for r in spark.sql("DESC EXTENDED cbo_probe").collect() if "tatist" in str(r[0])+str(r[1])]
print("after NOSCAN:", rows)
spark.sql("DROP TABLE IF EXISTS cbo_probe")
