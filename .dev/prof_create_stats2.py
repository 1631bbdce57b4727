import sys, time
sys.path.insert(0, "/root/repo")
from byconity_spark.engine.session import get_spark
from byconity_spark.engine.catalog import register_views
from byconity_spark.frontend.sql import ch_sql
from byconity_spark.engine.stats import (
    collect_display_stats, create_stats, _STATS_REGISTRY, drop_display_stats)

SF="/root/testdata/sf0.1"
spark=get_spark()
register_views(spark, SF)

def seq():
    ncols, rc = collect_display_stats(spark, "orders", ["o_orderkey","o_custkey"])
    create_stats(spark, "orders", ["o_orderkey","o_custkey"])
    return ncols, rc

def new():
    return ch_sql(spark, "CREATE STATS orders (o_orderkey, o_custkey)").collect()

# warm both
seq(); new()
for rep in range(3):
    t0=time.perf_counter(); seq(); a=time.perf_counter()-t0
    t0=time.perf_counter(); new(); b=time.perf_counter()-t0
    print(f"rep{rep}: sequential {a:.3f}s  threaded-handler {b:.3f}s", flush=True)
print("output row:", new()[0])
