"""GROUP BY with the Cubert aggregation set (SURVEY.md §2.4).

The reference's GroupByOperator (src/operator/GroupByOperator.java:44)
is a streaming sort-based aggregate with a combiner replay
(CubertCombiner.java:53-106); Spark's HashAggregate partial->final is
the same dataflow chosen automatically, with sort-based fallback when
groups overflow memory — i.e. the scale behavior Cubert hand-codes.

Aggregate names follow AggregationType.java:20-32:
SUM MIN MAX COUNT COUNT_DISTINCT BITWISE_OR BAG(CREATE_ARRAYLIST)
MEDIAN_SUM (enum'd, unimplemented in the reference factory — we
implement it as exact median, the obvious intent).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Cubert aggregation name -> fn(Column) -> Column.
#: Null semantics match the reference: SUM/MIN/MAX skip nulls
#: (CHANGELOG:23, same as Spark); COUNT counts rows regardless of
#: nulls (CountAggregation.java:27 ignores its argument) -> count(*).
AGGS: dict[str, Callable[..., Column]] = {
    "SUM": F.sum,
    "MIN": F.min,
    "MAX": F.max,
    "COUNT": lambda *_: F.count(F.lit(1)),
    "COUNT_DISTINCT": F.countDistinct,  # exact, no sort precondition needed
    "BITWISE_OR": F.bit_or,
    "BAG": F.collect_list,
    "CREATE_ARRAYLIST": F.collect_list,
    "MEDIAN_SUM": lambda c: F.percentile(c, F.lit(0.5)),
    # engine extensions beyond the reference set
    "AVG": F.avg,
    "COUNT_NONNULL": F.count,
    "COLLECT_SET": F.collect_set,
    "PERCENTILE": lambda c, p: F.percentile(c, F.lit(p)),
    "APPROX_COUNT_DISTINCT": F.approx_count_distinct,
}


def agg_column(spec: str | tuple | Column) -> Column:
    """Build one aggregate Column.

    Accepts a Column, or a tuple ``(AGG_NAME, input_col[, alias])``
    mirroring Cubert's ``AGGREGATES SUM(col) AS alias`` clause
    (grammar CubertPhysical.g4:51-53).
    """
    if isinstance(spec, Column):
        return spec
    if isinstance(spec, str):
        return F.expr(spec)
    name, col, *rest = spec
    fn = AGGS.get(name.upper())
    if fn is None:
        raise KeyError(f"unknown aggregation {name!r}")
    c = fn(F.col(col) if isinstance(col, str) else col)
    alias = rest[0] if rest else f"{name.lower()}_{col}"
    return c.alias(alias)


def group_by(
    df: DataFrame,
    keys: Sequence[str | Column],
    *aggregates: str | tuple | Column,
) -> DataFrame:
    """``GROUP x BY keys AGGREGATES ...``; empty keys = ``GROUP x BY ALL``
    (GroupByOperator.java:86-89) which aggregates the whole relation.

    Catalyst plans partial aggregation map-side (the Cubert combiner,
    CubertCombiner.java:53) and the shuffle is on the group keys only —
    at 100 TB the combiner reduction is what keeps the shuffle small.
    """
    cols = [F.col(k) if isinstance(k, str) else k for k in keys]
    aggs = [agg_column(a) for a in aggregates]
    if not cols:
        return df.agg(*aggs)
    return df.groupBy(*cols).agg(*aggs)
