"""MULTIPASS, PIVOT, VALIDATE (SURVEY.md §2.2, §2.7).

- MULTIPASS { }{ } (PhaseExecutor.java:96-110): several operator
  chains over the same input without re-reading it.
- PIVOT (PivotBlockOperator.java:62): sub-block iteration — subsumed
  by groupBy/applyInPandas; exposed as ``pivot_apply``.
- VALIDATE (ValidateOperator.java:38): runtime verification of
  partition/sort properties, as a distributed check (no collect).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def multipass(
    df: DataFrame,
    *branches: Callable[[DataFrame], DataFrame],
    storage_level: str = "MEMORY_AND_DISK",
) -> list[DataFrame]:
    """Run several derivations over one materialization of ``df``.

    The input is persisted (spillable — caching 100 TB raw is not a
    plan; persist the *reduced* relation you branch from). Caller owns
    ``df.unpersist()`` after consuming the branches.
    """
    from pyspark import StorageLevel

    df.persist(getattr(StorageLevel, storage_level))
    return [b(df) for b in branches]


def pivot_apply(
    df: DataFrame, keys: Sequence[str], fn: Callable, schema: str
) -> DataFrame:
    """PIVOT x ON cols + per-pivot operator chain: ``fn`` receives each
    pivot group as a pandas DataFrame (Arrow-batched)."""
    return df.groupBy(*keys).applyInPandas(fn, schema=schema)


def validate(
    df: DataFrame,
    partitioned_on: Sequence[str] = (),
    sorted_on: Sequence[str] = (),
) -> DataFrame:
    """Runtime VALIDATE: assert within every physical partition that
    (a) sort keys are non-decreasing and (b) no partition key value
    appears in more than one partition. Runs as a distributed job;
    raises on violation, else returns ``df`` unchanged.

    (b) is checked by counting distinct partition ids per key — one
    aggregation, no driver materialization of data.
    """
    if sorted_on:
        import pandas as pd

        cols = list(sorted_on)

        def check_sorted(batches):
            prev = None
            for pdf in batches:
                if len(pdf):
                    sub = pdf[cols]
                    if not sub.equals(sub.sort_values(cols, kind="stable")):
                        raise AssertionError(f"partition not sorted on {cols}")
                    if prev is not None:
                        first = sub.iloc[0]
                        if tuple(prev) > tuple(first):
                            raise AssertionError(f"partition not sorted on {cols}")
                    prev = sub.iloc[-1]
                yield pdf.head(0)

        df.mapInPandas(check_sorted, schema=df.schema).foreach(lambda r: None)
    if partitioned_on:
        bad = (
            df.select(*partitioned_on, F.spark_partition_id().alias("__pid"))
            .groupBy(*partitioned_on)
            .agg(F.countDistinct("__pid").alias("__npid"))
            .filter(F.col("__npid") > 1)
            .limit(1)
            .collect()
        )
        if bad:
            raise AssertionError(
                f"key {bad[0]} spans multiple partitions; not partitioned on {list(partitioned_on)}"
            )
    return df
