"""byconity_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of ByConity (reference: /root/reference).

Architecture (Spark-first, not a port):
  frontend/   ClickHouse-dialect SQL -> Spark SQL rewriter (function
              renames, -If combinators, parametric aggregates, JSON paths)
  engine/     SparkSession factory, table catalog (explicit schemas incl.
              nanosecond-timestamp handling), CTAS/INSERT/upsert write path
  functions/  ClickHouse-named scalar/aggregate function registry (~150
              names) + combinator engine (-If/-Distinct/-Array/-OrNull)
  operators/  relational operators Spark lacks natively (ASOF join, ANY join,
              LIMIT BY, WITH FILL, WITH TOTALS, LIMIT WITH TIES, quantified
              comparisons)
  udafs/      behavioral analytics (windowFunnel, retention, sequenceMatch,
              sessionSplit — hash-bucketed Arrow kernels) and the bitmap
              aggregate family (groupBitmap + and/or/xor/cardinality algebra)
  llm/        training-data pipeline ops: dedup (exact / banded MinHash-LSH /
              SimHash / ngram-jaccard), ANN similarity search (brute-force +
              multi-table hyperplane LSH), text analysis, multimodal plumbing
  streaming/  Structured Streaming ingestion (file/Kafka), watermarked
              tumbling/sliding/session windows, materialized-view refresh
  plans/      trivial-count metadata shortcut
  workloads/  the oracle-checked query inventory (SURVEY.md §2) — every
              claimed operator has a registered query + DuckDB oracle

Everything is expressed through the DataFrame API so Catalyst performs
pushdown, pruning, join selection and AQE re-planning; Python-side kernels
(Pandas UDFs / applyInPandas) exist only where Spark lacks the semantics.
"""

__version__ = "0.1.0"

from byconity_spark.engine.session import get_spark  # noqa: F401
from byconity_spark.engine.catalog import TABLES, load_tables, register_views  # noqa: F401
