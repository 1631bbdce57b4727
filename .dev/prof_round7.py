import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from byconity_spark.engine.session import get_spark
from byconity_spark.engine.catalog import load_table
from byconity_spark.functions.registry import ch

SF="/root/testdata/sf0.1"
spark=get_spark()
d=load_table(spark, SF, "documents")
print("docs rows:", d.count())
text=F.col("text")
url=F.concat(F.lit("https://www.ex"), F.col("doc_id"), F.lit(".com/p?a="), F.col("doc_id"), F.lit("&b=2"))
hh, mm = F.col("doc_id")%23, F.col("doc_id")%59
delta_str=F.concat(hh, F.lit("h "), mm, F.lit("m"))
cols = {
 "lang_det": ch("detectLanguage", text),
 "tone_m": F.floor(ch("detectTonality", text)*1000).cast("long"),
 "charset": ch("detectCharset", text),
 "nfc": F.substring(ch("normalizeUTF8NFC", F.concat(F.lit("e"), F.lit("́"), text)),1,1),
 "net": ch("netloc", url),
 "pnames": F.concat_ws(",", ch("extractURLParameterNames", url)),
 "delta": ch("parseTimeDelta", delta_str),
 "padded": ch("lpad", F.col("doc_id").cast("string"), 8, "0"),
 "oct": ch("oct", F.length(text)),
 "ord": ch("ord", F.substring(text,1,1)).cast("int"),
 "nchars": ch("CHAR_LENGTH", text),
 "spliced": ch("insert", F.substring(text,1,9), F.lit(3), F.lit(2), F.lit("<>")),
}
def run(df): df.write.format("noop").mode("overwrite").save()
# warm
for n,c in cols.items(): run(d.select(F.col("doc_id"), c.alias(n)))
for n,c in cols.items():
    best=None
    for _ in range(3):
        t0=time.perf_counter(); run(d.select(F.col("doc_id"), c.alias(n))); dt=time.perf_counter()-t0
        best=dt if best is None else min(best,dt)
    print(f"{n:10s} {best:.3f}s", flush=True)
