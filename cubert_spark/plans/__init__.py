from cubert_spark.plans.assertions import (
    assert_partitioned_on,
    explain_str,
    has_pushed_filters,
    scan_read_schema,
    shuffle_count,
)

__all__ = [
    "assert_partitioned_on",
    "explain_str",
    "has_pushed_filters",
    "scan_read_schema",
    "shuffle_count",
]
