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
