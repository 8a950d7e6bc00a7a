"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``  — flagship query (TPC-H-Q1-style full-aggregate
  scan) on /root/testdata/sf0.001.
- ``queries()``     — one entry per implemented operator from
  SURVEY.md §2 (+ datapipe extensions); see cubert_spark.queries.
- ``oracle_sql()``  — DuckDB-equivalent SQL per query; columns aliased
  identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from cubert_spark.queries.core import q1_groupby_agg

    return q1_groupby_agg(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from cubert_spark.queries import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from cubert_spark.queries import all_oracles

    return all_oracles()
