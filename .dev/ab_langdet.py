import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from byconity_spark.engine.session import get_spark
from byconity_spark.engine.catalog import load_table
from byconity_spark.functions.registry import ch
from byconity_spark.llm.text import LANG_MARKERS, tokenize

SF="/root/testdata/sf0.1"
spark=get_spark()
d=load_table(spark, SF, "documents")
# edge rows: null text, empty, whitespace-only, overlap-marker 'la', ties
edges = spark.createDataFrame(
    [(100001, None),(100002,""),(100003,"   "),(100004,"la la el le"),
     (100005,"the el der le"),(100006,"zzz qqq"),(100007,"la")],
    "doc_id long, text string")
full = d.select("doc_id","text").unionByName(edges)

def old_lang(col):
    toks = tokenize(col)
    def _mk(m): return lambda w: w.isin(m)
    sc = {l: F.size(F.filter(toks, _mk(m))) for l, m in LANG_MARKERS.items()}
    s_en,s_es,s_de,s_fr = sc["en"],sc["es"],sc["de"],sc["fr"]
    total = s_en+s_es+s_de+s_fr
    best = (F.when((s_en>=s_es)&(s_en>=s_de)&(s_en>=s_fr),"en")
             .when((s_es>=s_de)&(s_es>=s_fr),"es")
             .when(s_de>=s_fr,"de").otherwise("fr"))
    return F.when(total>0,best).otherwise(F.lit("un"))

a = {r[0]: r[1] for r in full.select("doc_id", old_lang(F.col("text")).alias("l")).collect()}
b = {r[0]: r[1] for r in full.select("doc_id", ch("detectLanguage", F.col("text")).alias("l")).collect()}
diff = {k: (a[k], b[k]) for k in a if a[k]!=b[k]}
print("rows:", len(a), "mismatches:", len(diff), list(diff.items())[:5])
assert not diff

def run(df): df.write.format("noop").mode("overwrite").save()
vA = lambda: d.select("doc_id", old_lang(F.col("text")).alias("l"))
vB = lambda: d.select("doc_id", ch("detectLanguage", F.col("text")).alias("l"))
run(vA()); run(vB())
bestA=bestB=None
for _ in range(3):
    t0=time.perf_counter(); run(vA()); dt=time.perf_counter()-t0
    bestA=dt if bestA is None else min(bestA,dt)
    t0=time.perf_counter(); run(vB()); dt=time.perf_counter()-t0
    bestB=dt if bestB is None else min(bestB,dt)
print(f"old HOF: {bestA:.3f}s  new pandas: {bestB:.3f}s")
