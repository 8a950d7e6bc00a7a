from cubert_spark.plans.assertions import (
    lint,
    assert_partitioned_on,
    explain_str,
    has_pushed_filters,
    scan_read_schema,
    shuffle_count,
)

__all__ = [
    "lint",
    "assert_partitioned_on",
    "explain_str",
    "has_pushed_filters",
    "scan_read_schema",
    "shuffle_count",
]
from cubert_spark.plans.ivm import join_delta, maintain_join  # noqa: E402,F401
from cubert_spark.plans.advisor import scale_projection  # noqa: E402,F401
from cubert_spark.plans.advisor import report as scale_report  # noqa: E402,F401
