from cubert_spark.streaming.windows import (
    dedup_stream,
    maintain_summary,
    read_parquet_stream,
    run_to_memory,
    session_agg,
    sliding_agg,
    stream_stream_join,
    tumbling_agg,
)
from cubert_spark.streaming.ingest import ingest_dedup, stream_upsert
from cubert_spark.streaming.stateful import running_counts

__all__ = [
    "ingest_dedup",
    "stream_upsert",
    "dedup_stream",
    "maintain_summary",
    "read_parquet_stream",
    "run_to_memory",
    "session_agg",
    "sliding_agg",
    "stream_stream_join",
    "tumbling_agg",
    "running_counts",
]
