import sys, os, time, traceback
sys.path.insert(0, "/root/repo")
import duckdb, pandas as pd, numpy as np

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]

from pyspark.sql import SparkSession
from byconity_spark.workloads import all_queries

spark = (SparkSession.builder.master("local[16]").appName("judge-strict")
         .config("spark.sql.shuffle.partitions","16")
         .config("spark.driver.memory","8g")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

con = duckdb.connect()
for t in TABLES:
    p = os.path.join(SF_DIR, t + ".parquet")
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{p}')")

def canon(pdf):
    pdf = pdf.copy()
    for c in pdf.columns:
        if pd.api.types.is_float_dtype(pdf[c]):
            pdf[c] = pdf[c].round(6)
        elif pd.api.types.is_datetime64_any_dtype(pdf[c]):
            pdf[c] = pdf[c].astype(str).replace("NaT","")
        elif pdf[c].dtype == object:
            pdf[c] = pdf[c].map(lambda v: "" if v is None or (isinstance(v,float) and pd.isna(v)) else str(v))
    pdf = pdf[sorted(pdf.columns)]
    pdf = pdf.astype(str)
    pdf = pdf.sort_values(list(pdf.columns), kind="mergesort").reset_index(drop=True)
    return pdf

qs = all_queries()
fails = []
for name, qd in qs.items():
    t0 = time.time()
    try:
        sp = qd.builder(spark, SF_DIR).toPandas()
    except Exception as e:
        print(f"{name:45s} SPARK-ERR {type(e).__name__}: {str(e)[:120]}", flush=True)
        fails.append((name,"spark-err")); continue
    if qd.oracle is None:
        print(f"{name:45s} NO-ORACLE rows={len(sp)}", flush=True); continue
    try:
        ora = con.execute(qd.oracle).fetchdf()
    except Exception as e:
        print(f"{name:45s} ORACLE-ERR {str(e)[:120]}", flush=True)
        fails.append((name,"oracle-err")); continue
    sp.columns = [c.lower() for c in sp.columns]
    ora.columns = [c.lower() for c in ora.columns]
    if len(sp) != len(ora):
        print(f"{name:45s} ROWS {len(sp)} != {len(ora)}", flush=True); fails.append((name,"rows")); continue
    if sorted(sp.columns) != sorted(ora.columns):
        print(f"{name:45s} SCHEMA {sorted(sp.columns)} != {sorted(ora.columns)}", flush=True); fails.append((name,"schema")); continue
    a, b = canon(sp), canon(ora)
    if a.equals(b):
        print(f"{name:45s} {time.time()-t0:5.1f}s STRICT-MATCH", flush=True)
    else:
        bad = []
        for c in a.columns:
            if not a[c].equals(b[c]):
                i = (a[c] != b[c]).idxmax()
                bad.append(f"{c}[{i}]: {a[c].iloc[i]!r}!={b[c].iloc[i]!r}")
        print(f"{name:45s} {time.time()-t0:5.1f}s STRICT-FAIL {'; '.join(bad[:3])}", flush=True)
        fails.append((name,"hash"))
print("TOTAL FAILS:", len(fails))
for n, k in fails: print("  ", n, k)
spark.stop()
