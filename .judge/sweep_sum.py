import sys, re
sys.path.insert(0, "/root/repo")
# static scan: oracles with sum( not wrapped by CAST/round — duckdb hugeint→float risk
from unittest import mock
# avoid importing pyspark heavy? workloads import pyspark.sql at module level; fine.
from byconity_spark.workloads import all_queries
qs = all_queries()
risky = []
for name, qd in qs.items():
    if not qd.oracle: continue
    o = qd.oracle.lower()
    # find sum( occurrences not preceded by cast( or inside round(
    for m in re.finditer(r'sum\(', o):
        start = m.start()
        pre = o[max(0,start-60):start]
        if 'cast(' in pre[-6:] or 'round(' in pre[-7:] or 'floor(' in pre[-7:]:
            continue
        # check if this sum's result is wrapped: look backwards for cast/round/coalesce+round
        seg = o[max(0,start-30):start]
        if re.search(r'(cast|round|floor|ceil)\s*\($', seg.rstrip()):
            continue
        risky.append((name, o[max(0,start-40):start+40].replace('\n',' ')))
        break
print(len(risky), "queries with possibly-uncast sum( in oracle")
for n, ctx in risky: print(f"  {n:38s} ...{ctx}...")
