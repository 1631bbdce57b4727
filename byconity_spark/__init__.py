"""byconity_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of ByConity (reference: /root/reference).

Architecture (Spark-first, not a port):
  engine/     SparkSession factory, table catalog (explicit schemas), IO layout
  functions/  ClickHouse-named scalar/aggregate function registry + combinators
  operators/  relational operators Spark lacks natively (ASOF join, ANY join,
              LIMIT BY, WITH FILL, WITH TOTALS, quantified comparisons)
  udafs/      behavioral analytics (windowFunnel, retention, sequenceMatch,
              sessionSplit) and bitmap aggregate kernels
  llm/        large-scale training-data pipeline ops: dedup (exact/minhash/
              simhash/ngram-jaccard), ANN similarity search, text analysis,
              multimodal column plumbing
  streaming/  Structured Streaming ingestion + materialized-view refresh
  plans/      plan inspection, trivial-count shortcut, explain helpers
  workloads/  the benchmark/correctness query inventory (SURVEY.md §2)

Everything is expressed through the DataFrame API so Catalyst performs
pushdown, pruning, join selection and AQE re-planning; Python-side kernels
(Pandas UDFs / applyInPandas) exist only where Spark lacks the semantics.
"""

__version__ = "0.1.0"

from byconity_spark.engine.session import get_spark  # noqa: F401
from byconity_spark.engine.catalog import TABLES, load_tables, register_views  # noqa: F401
