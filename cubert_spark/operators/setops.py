"""SORT / LIMIT / DISTINCT / GATHER / COMBINE (SURVEY.md §2.6)."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame


def _cols(names: Sequence[str | Column]) -> list:
    from pyspark.sql import functions as F

    return [F.col(c) if isinstance(c, str) else c for c in names]


def distinct(df: DataFrame, subset: Sequence[str] | None = None) -> DataFrame:
    """``DISTINCT x`` (DistinctOperator.java:27 + shuffle macro
    ShuffleRewriter.java:524-548). The reference requires a full sort
    precondition; Spark's hash-based dedup needs none and map-side
    partial dedup keeps the shuffle small at scale."""
    return df.dropDuplicates(list(subset)) if subset else df.distinct()


def sort(df: DataFrame, *cols: str | Column) -> DataFrame:
    """Global sort: Cubert ``SHUFFLE ... SORTED ON`` (range partition +
    sort, CubertPartitioner.java:39-126). Spark range-partitions by
    sampled boundaries — the scalable equivalent."""
    return df.orderBy(*_cols(cols))


def sort_within_blocks(df: DataFrame, *cols: str | Column) -> DataFrame:
    """``SORT x ON cols`` — within-block sort (SortOperator.java:42);
    block == partition, no shuffle."""
    return df.sortWithinPartitions(*_cols(cols))


def limit(df: DataFrame, n: int) -> DataFrame:
    """``LIMIT x N`` (LimitOperator.java:34)."""
    return df.limit(n)


def gather(*dfs: DataFrame) -> DataFrame:
    """``GATHER x, y`` — sequential concatenation, i.e. UNION ALL by
    name (GatherOperator.java:29)."""
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


def combine(*dfs: DataFrame, sorted_on: Sequence[str | Column] = ()) -> DataFrame:
    """``COMBINE x, y SORTED ON cols`` — order-preserving k-way merge of
    sorted inputs (CombineOperator.java:35). Spark's equivalent: union
    then re-establish the within-partition order; a downstream
    merge-join/agg would insert the same sort anyway, so this is not an
    extra pass in practice."""
    out = gather(*dfs)
    if sorted_on:
        out = out.sortWithinPartitions(*_cols(list(sorted_on)))
    return out
