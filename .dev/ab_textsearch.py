import sys, time, random, string
sys.path.insert(0, "/root/repo")
import re
import pandas as pd
from pyspark.sql import functions as F
from byconity_spark.engine.session import get_spark
from byconity_spark.engine.catalog import load_table
from byconity_spark.functions.registry import ch
from byconity_spark.functions import registry_ext7b as e7b

spark=get_spark()
d=load_table(spark, "/root/testdata/sf0.1", "documents")

# ---- pure-python fuzz: probe path vs reference tokenize semantics
def ref_eval(qnode, v):
    toks = set(t.lower() for t in e7b._TS_TOKEN_RE.findall(v))
    return e7b._ts_eval(qnode, toks)

QUERIES = ["the | data", "data & !qwertyzz", "a & (b | !c)", "'multi word' | x1",
           "K | kelvin", "under_score & d1git5"]
rng = random.Random(7)
corpus = []
for _ in range(4000):
    n = rng.randint(0, 12)
    parts=[]
    for _ in range(n):
        w = rng.choice(["the","The","THE","data","DATA","b","c","x1","multi","word",
                        "kelvin","K","K","under_score","d1git5","qwertyzz",
                        "thedata","data_","_data","k","K2","..",";;","été"])
        parts.append(w)
    corpus.append(rng.choice(["", " ", "-"]).join(parts))
corpus += ["", " ", None, "K", "aKb", "5K", "theKdata"]

mis=0
for q in QUERIES:
    qnode = e7b._ts_parse(q)
    needed=set(); e7b_collect = None
    # rebuild probe path exactly as production does
    col = e7b._text_search(F.lit("x"), q)  # force build; we just reuse internals below
    def _ascii_ci(tok):
        return "".join(f"[{c}{c.upper()}]" if "a"<=c<="z" else re.escape(c) for c in tok)
    def collect(node, acc):
        if node[0]=="val": acc.update(e7b._TS_TOKEN_RE.findall(node[1]))
        elif node[0]=="not": collect(node[1],acc)
        else: collect(node[1],acc); collect(node[2],acc)
    collect(qnode, needed)
    probes={t: re.compile(rf"(?<![A-Za-z0-9_]){_ascii_ci(t)}(?![A-Za-z0-9_])") for t in needed}
    for v in corpus:
        if v is None: continue
        a = ref_eval(qnode, v)
        present={t for t,rx in probes.items() if rx.search(v)}
        b = e7b._ts_eval(qnode, present)
        if a!=b:
            mis+=1
            if mis<5: print("MISMATCH", repr(q), repr(v), a, b)
print("fuzz mismatches:", mis, "corpus:", len(corpus), "queries:", len(QUERIES))
assert mis==0

# ---- spark-level value check on real corpus for the suite's two queries
for q in ("the | data", "data & !qwertyzz"):
    new = {r[0]: r[1] for r in d.select("doc_id", ch("textSearch", F.col("text"), q).alias("r")).collect()}
    qnode=e7b._ts_parse(q)
    texts = {r[0]: r[1] for r in d.select("doc_id","text").collect()}
    old = {k: ref_eval(qnode, v) if v is not None else None for k,v in texts.items()}
    diff = {k for k in old if old[k]!=new[k]}
    print(q, "rows", len(old), "mismatches", len(diff))
    assert not diff

# ---- timing
def run(df): df.write.format("noop").mode("overwrite").save()
v = lambda: d.select("doc_id",
    ch("textSearch", F.col("text"), "the | data").alias("a"),
    ch("textSearch", F.col("text"), "data & !qwertyzz").alias("b"))
run(v())
best=None
for _ in range(3):
    t0=time.perf_counter(); run(v()); dt=time.perf_counter()-t0
    best=dt if best is None else min(best,dt)
print(f"textSearch pair (new probe path): {best:.3f}s")
