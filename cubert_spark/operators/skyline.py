"""Grouped 2-D skyline (Pareto frontier) — the classic OLAP operator
(Börzsönyi et al., ICDE 2001: "The Skyline Operator", public): keep
the rows not DOMINATED within their group, where ``a`` dominates
``b`` iff a.x >= b.x and a.y >= b.y with at least one strict.

The naive formulation is a quadratic NOT EXISTS self-join (that is
exactly the driver oracle). The 2-D case collapses to one sorted
sweep: a row survives iff its y equals the max y at its x AND every
strictly-greater x has max-y strictly below it. Implemented as a
per-(group, x) aggregate, one running strict-predecessor max window
over x descending, and an equi-join back — one shuffle on the group
key, never a pair join.

At 100 TB: the window partition is (group); per-group distinct-x
cardinality bounds the window, and the rows-side join is an equi-join
on (group, x). No reference analog (Cubert has no skyline); extension
surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skyline2d(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Rows of ``df`` on the maximizing Pareto frontier of
    (x_col, y_col) within each group. Duplicate frontier points (same
    group, x, y) all survive — neither dominates the other."""
    per_x = df.groupBy(*group_cols, x_col).agg(F.max(y_col).alias("__ymax"))
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(F.desc(x_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # per_x is unique per (group, x), so "preceding rows" under x desc
    # are exactly the strictly-greater x values
    frontier_x = (
        per_x.withColumn("__prev", F.max("__ymax").over(w))
        .filter(F.col("__prev").isNull() | (F.col("__prev") < F.col("__ymax")))
        .select(*group_cols, x_col, "__ymax")
    )
    return (
        df.join(frontier_x, [*group_cols, x_col])
        .filter(F.col(y_col) == F.col("__ymax"))
        .drop("__ymax")
    )
