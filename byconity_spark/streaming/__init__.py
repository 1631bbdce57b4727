"""Structured-Streaming surface: ingestion sources, watermarked window
transforms, materialized-view refresh."""

from byconity_spark.streaming.ingest import (  # noqa: F401
    events_file_stream,
    kafka_stream,
    parquet_dir_stream,
)
from byconity_spark.streaming.mv import AggMaterializedView, MaterializedView  # noqa: F401
from byconity_spark.streaming.transforms import (  # noqa: F401
    hourly_counts,
    session_windows,
    sliding_value_sums,
)
