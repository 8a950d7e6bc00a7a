from cubert_spark.streaming.windows import (
    read_parquet_stream,
    tumbling_agg,
    sliding_agg,
    session_agg,
    run_to_memory,
)
from cubert_spark.streaming.stateful import running_counts

__all__ = [
    "read_parquet_stream",
    "tumbling_agg",
    "sliding_agg",
    "session_agg",
    "run_to_memory",
    "running_counts",
]
