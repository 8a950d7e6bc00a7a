"""RANK / TOP-N (SURVEY.md §2.5).

The reference ships two partition-ordered operators predating real
window functions (RankOperator.java:24, TopNOperator.java:32); both
require the block pre-partitioned+sorted. Spark's Window covers both
(and is a strict superset: frames, lead/lag, etc. come free).

Scale note: Window.partitionBy shuffles once on the group keys; for
TOP-N Spark pushes a per-partition top-k (WindowGroupLimit in the
physical plan) so the shuffle carries at most n rows per group per map
partition — the same "never materialize the full sorted group" goal as
Cubert's streaming operator.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _cols(names: Sequence[str | Column]) -> list:
    return [F.col(c) if isinstance(c, str) else c for c in names]


def rank(
    df: DataFrame,
    as_column: str,
    group_by: Sequence[str | Column] = (),
    order_by: Sequence[str | Column] = (),
) -> DataFrame:
    """``RANK x AS col [GROUP BY g ORDER BY o]`` — sequential 1..n row
    number per group (RankOperator.java:24). Ordering must be made
    deterministic by the caller (include a tiebreak key) — the
    reference inherits file order, which has no distributed analog."""
    w = Window.partitionBy(*_cols(group_by)).orderBy(*_cols(order_by))
    return df.withColumn(as_column, F.row_number().over(w))


def top_n(
    df: DataFrame,
    n: int,
    group_by: Sequence[str | Column] = (),
    order_by: Sequence[str | Column] = (),
) -> DataFrame:
    """``TOP n FROM x GROUP BY g ORDER BY o`` (TopNOperator.java:32):
    first n rows per group under the order."""
    w = Window.partitionBy(*_cols(group_by)).orderBy(*_cols(order_by))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )
