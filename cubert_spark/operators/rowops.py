"""Row-level operators: GENERATE, FILTER, FLATTEN, DUPLICATE, TEE.

Reference semantics: SURVEY.md §2.2.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def generate(df: DataFrame, *exprs: Column | str) -> DataFrame:
    """``FROM x GENERATE e1 AS a, ...`` (GenerateOperator.java:36).

    Accepts Columns or SQL expression strings; a plain ``df.select``
    so Catalyst prunes the scan down to referenced columns.
    """
    cols = [F.expr(e) if isinstance(e, str) else e for e in exprs]
    return df.select(*cols)


def filter_by(df: DataFrame, predicate: Column | str) -> DataFrame:
    """``FILTER x BY expr`` (FilterOperator.java:24). Declarative filter
    -> Catalyst pushes it into the parquet scan."""
    return df.filter(predicate)


def flatten(
    df: DataFrame,
    *specs: tuple[str, str],
    aliases: dict[str, Sequence[str]] | None = None,
) -> DataFrame:
    """``FLATTEN x BY col TUPLE|BAG|BAG_TUPLE`` (FlattenBagOperator.java:38).

    specs: (column, mode) pairs, mode in {"TUPLE","BAG","BAG_TUPLE"}.
    Multiple specs produce the cross-product ("odometer" loop in the
    reference, FlattenBagOperator.java:39-66) — expressed as chained
    explodes, which Spark executes as nested Generate operators.

    Null/empty-bag semantics match the reference: a NULL or empty bag
    yields ONE row with NULL flattened columns (explode_outer).

    aliases: optional output names per column, e.g.
    ``{"items": ("x", "y")}`` names the fields of the exploded struct.
    """
    aliases = aliases or {}
    out = df
    for col, mode in specs:
        mode = mode.upper()
        names = aliases.get(col)
        if mode == "BAG":
            out = out.withColumn(col, F.explode_outer(F.col(col)))
            if names:
                out = out.withColumnRenamed(col, names[0])
        elif mode == "TUPLE":
            fields = [f.name for f in out.schema[col].dataType.fields]
            outnames = list(names) if names else fields
            replacements = [
                F.col(f"{col}.{f}").alias(n) for f, n in zip(fields, outnames)
            ]
            others = [F.col(c) for c in out.columns if c != col]
            out = out.select(*others, *replacements)
        elif mode == "BAG_TUPLE":
            exploded = f"__flat_{col}"
            out = out.withColumn(exploded, F.explode_outer(F.col(col)))
            fields = [f.name for f in out.schema[exploded].dataType.fields]
            outnames = list(names) if names else fields
            replacements = [
                F.col(f"{exploded}.{f}").alias(n) for f, n in zip(fields, outnames)
            ]
            others = [F.col(c) for c in out.columns if c not in (col, exploded)]
            out = out.select(*others, *replacements)
        else:
            raise ValueError(f"unknown flatten mode {mode!r}")
    return out


def duplicate(df: DataFrame, times: int, counter: str | None = None) -> DataFrame:
    """``DUPLICATE x N TIMES [COUNTER AS c]`` (DuplicateOperator.java:35).

    Emits each row ``times`` times with an optional 1..N counter —
    ``explode(sequence(...))`` stays inside codegen, no UDF, and the
    row multiplication happens executor-side (scales to any input).
    """
    seq = F.explode(F.sequence(F.lit(1), F.lit(times)))
    if counter:
        return df.withColumn(counter, seq)
    return df.withColumn("__dup", seq).drop("__dup")


def tee(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    predicate: Column | str | None = None,
    project: Sequence[Column | str] | None = None,
    split: bool = False,
    mode: str = "overwrite",
    **options: str,
) -> DataFrame:
    """``TEE x INTO "p" USING fmt (GENERATE ...) (IF expr)`` with
    optional ``WITH SPLIT`` (TeeOperator.java:33).

    Writes the (optionally filtered/projected) side output and returns
    the main flow; with ``split=True`` the teed rows are removed from
    the returned flow (complementary filters). At scale the input is
    scanned twice rather than cached — caching 100 TB is not a plan;
    if the upstream is expensive, persist explicitly before calling.
    """
    from cubert_spark import catalog

    side = df
    if predicate is not None:
        side = side.filter(predicate)
    if project is not None:
        side = generate(side, *project)
    # catalog.store maps Cubert format names (TEXT -> csv, RUBIX ->
    # parquet) and applies writer options
    catalog.store(side, path, fmt=fmt, mode=mode, **options)
    if split and predicate is not None:
        pred = F.expr(predicate) if isinstance(predicate, str) else predicate
        # WITH SPLIT removes teed rows from the main flow; null
        # predicate rows were not teed, so they stay.
        return df.filter(~F.coalesce(pred, F.lit(False)))
    return df
