"""Plan inspection & assertions.

Cubert's NO_OP ASSERT / VALIDATE operators (NullOperator.java:31,
ValidateOperator.java:38) verify block properties at compile/run time.
The Spark analog inspects the physical plan: shuffle count, pushed
filters, scan read-schema (column pruning), exchange partitioning.
These power both tests and the engine's own scale hygiene — an
operator whose plan re-shuffles a bucketed input or scans unused
columns is a bug even when results are correct.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def shuffle_count(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan (simple mode
    keeps 'Exchange <partitioning>' on one line)."""
    s = explain_str(df, mode="simple")
    return s.count("Exchange hashpartitioning") + s.count("Exchange rangepartitioning")


def has_pushed_filters(df: DataFrame) -> bool:
    """True if the parquet scan carries pushed-down predicates."""
    s = explain_str(df)
    m = re.search(r"PushedFilters: \[([^\]]*)\]", s)
    return bool(m and m.group(1).strip())


def scan_read_schema(df: DataFrame) -> list[list[str]]:
    """Columns each scan actually reads (pruning check)."""
    s = explain_str(df)
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", s):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        out.append(cols)
    return out


def assert_partitioned_on(df: DataFrame, keys: list[str]) -> None:
    """NO_OP ASSERT PARTITIONED ON k: verify the plan's output comes
    from a hash partitioning on (a superset order of) ``keys``."""
    s = explain_str(df, mode="simple")
    pats = [re.escape(k) for k in keys]
    if not re.search(r"hashpartitioning\(" + r"[^)]*".join(pats), s):
        raise AssertionError(
            f"plan is not hash-partitioned on {keys}; explain:\n{s[:4000]}"
        )


def lint(df: DataFrame, wide_threshold: int = 10) -> list[str]:
    """Scale-hygiene linter: inspect a DataFrame's physical plan and
    return warnings for the anti-patterns that are cheap at test scale
    and catastrophic at 100 TB. Empty list = clean.

    Checks (each encodes a rule the engine's own plan tests enforce):
    - cartesian / broadcast-nested-loop joins (all-pairs blowup)
    - windows with an EMPTY partition spec over non-trivial input
      (single reducer processes the whole table)
    - row-at-a-time Python eval in the plan (BatchEvalPython — the
      slow path; Arrow/pandas variants pass)
    - parquet scans reading > ``wide_threshold`` columns (pruning
      failed or a ``select`` is missing; the formatted plan truncates
      ReadSchema at ~11 columns, so the default threshold sits below it)
    - global sort without a limit (full range-partitioned sort where
      TakeOrderedAndProject or a windowed top-k usually suffices)
    """
    warnings: list[str] = []
    simple = explain_str(df, mode="simple")

    if "CartesianProduct" in simple:
        warnings.append("cartesian product: the join has no equi-condition")
    if "BroadcastNestedLoopJoin" in simple:
        warnings.append(
            "broadcast nested-loop join: non-equi condition scans all pairs"
        )
    for m in re.finditer(r"Window .*", simple):
        line = m.group(0)
        if "windowspecdefinition(" in line and re.search(
            r"windowspecdefinition\([a-zA-Z_#0-9]+ (ASC|DESC)", line
        ):
            # spec starts directly with an ORDER BY column -> no
            # partition columns before it
            warnings.append(
                "unpartitioned window: one task will sort/aggregate the "
                "entire input (partition it, or use a two-level shard scheme)"
            )
    if "BatchEvalPython" in simple:
        warnings.append(
            "row-at-a-time Python UDF in plan: use pandas_udf/mapInPandas "
            "(Arrow) or a builtin expression"
        )
    for cols in scan_read_schema(df):
        if len(cols) > wide_threshold:
            warnings.append(
                f"scan reads {len(cols)} columns ({', '.join(cols[:4])}, ...): "
                "add a select so pruning reaches the scan"
            )
    if re.search(r"^(?!.*TakeOrderedAndProject).*Exchange rangepartitioning",
                 simple, re.S) and "GlobalLimit" not in simple \
            and "Window" not in simple:
        warnings.append(
            "global sort without limit: full range-partitioned sort; if a "
            "top-k is intended, add a limit (plans TakeOrderedAndProject)"
        )
    return warnings
