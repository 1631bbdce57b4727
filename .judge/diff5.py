import sys, os, time
sys.path.insert(0, "/root/repo")
import duckdb, pandas as pd, numpy as np

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]
NAMES = ["agg_decimal_money","beh_attr_analysis_counts","beh_attr_analysis_first","beh_attr_analysis_decay","mm_resize_thumbnail"]

from pyspark.sql import SparkSession
from byconity_spark.workloads import all_queries
spark = SparkSession.builder.master("local[8]").appName("judge").config("spark.sql.shuffle.partitions","8").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

con = duckdb.connect()
for t in TABLES:
    p = os.path.join(SF_DIR, t + '.parquet')
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{p}')")

qs = all_queries()
for name in NAMES:
    qd = qs[name]
    sp = qd.builder(spark, SF_DIR).toPandas()
    ora = con.execute(qd.oracle).fetchdf()
    sp = sp.rename(columns=str.lower)[sorted(map(str.lower, sp.columns))]
    ora = ora.rename(columns=str.lower)[sorted(map(str.lower, ora.columns))]
    sp = sp.sort_values(list(sp.columns), kind="mergesort").reset_index(drop=True)
    ora = ora.sort_values(list(ora.columns), kind="mergesort").reset_index(drop=True)
    print("="*10, name, "spark rows", len(sp), "oracle rows", len(ora))
    for c in sp.columns:
        a, b = sp[c], ora[c]
        diffs = []
        for i in range(min(len(a), len(b))):
            av, bv = a.iloc[i], b.iloc[i]
            if str(av) != str(bv):
                diffs.append((i, av, bv))
        if diffs:
            print(f"  col {c}: {len(diffs)} exact diffs; first 4:")
            for i, av, bv in diffs[:4]:
                print(f"    row {i}: spark={av!r} oracle={bv!r}")
        else:
            print(f"  col {c}: exact match")
spark.stop()
