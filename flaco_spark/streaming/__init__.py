"""Structured Streaming ingestion lane (extension — SURVEY.md §7.6).

The reference is batch-only: ``read_sql`` drains the server cursor to
completion (``/root/reference/src/lib.rs:188-195``).  This lane adds
what a continuous version of the same ETL contract looks like on
Spark: stream in → (optional windowed aggregation with watermark) →
columnar files out.
"""

from flaco_spark.streaming.ingest import (
    attribution_join,
    dedup_stream,
    stream_parquet_sink,
    windowed_event_counts,
)
from flaco_spark.streaming.stateful import (
    user_profiles_batch,
    user_profiles_stream,
)

__all__ = [
    "attribution_join",
    "dedup_stream",
    "stream_parquet_sink",
    "windowed_event_counts",
    "user_profiles_batch",
    "user_profiles_stream",
]
