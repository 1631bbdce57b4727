import sys, time, cProfile, pstats, io
sys.path.insert(0, "/root/repo")
from byconity_spark.engine.session import get_spark
from byconity_spark.engine.catalog import register_views
from byconity_spark.frontend.sql import ch_sql
spark=get_spark()
register_views(spark, "/root/testdata/sf0.1")
# warm
ch_sql(spark, "SELECT count() FROM nation").collect()
ch_sql(spark, "SELECT 1").collect()

for stmt in ("SELECT 1", "SELECT count() FROM nation",
             "SELECT n_name, count() FROM nation GROUP BY n_name ORDER BY n_name LIMIT 5"):
    best=None
    for _ in range(5):
        t0=time.perf_counter(); ch_sql(spark, stmt).collect(); dt=time.perf_counter()-t0
        best=dt if best is None else min(best,dt)
    print(f"{best*1000:7.1f} ms  {stmt}")

# python-side share: profile the ch_sql call minus spark execution by profiling cumulative
pr=cProfile.Profile()
pr.enable()
for _ in range(10):
    ch_sql(spark, "SELECT n_name, count() FROM nation GROUP BY n_name ORDER BY n_name LIMIT 5").collect()
pr.disable()
s=io.StringIO()
ps=pstats.Stats(pr, stream=s).sort_stats("cumulative")
ps.print_stats(18)
print(s.getvalue()[:3200])
