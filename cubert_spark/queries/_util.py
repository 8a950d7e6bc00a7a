"""Shared helpers for the query inventory.

Cross-engine float discipline: double aggregations route through
DECIMAL (exact, order-independent) and cast back to double, so Spark
and DuckDB produce bit-identical results regardless of partial-agg
ordering. Per-row double arithmetic (products, divisions) is IEEE-754
deterministic and needs no special handling.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dsum(col: Column | str, prec: int = 30, scale: int = 6) -> Column:
    """Order-independent exact sum of a double column, returned as
    double. Spark side of ``CAST(SUM(CAST(x AS DECIMAL(p,s))) AS
    DOUBLE)``.

    The final decimal->double step goes THROUGH THE DECIMAL'S STRING
    (r13): once a sum outgrows double precision (~2.8e11 with 6-dp
    scale at gen10, 18 significant digits) the direct cast drifts 1
    ulp across engines (Spark single-rounds via BigDecimal; DuckDB's
    int128 path can double-round) — the exact same decimal hashed red
    in the gen10 parity sample. string->double parsing is
    correctly-rounded in every engine (IEEE 754 nearest), so routing
    both engines through the exact digit string makes the double
    bit-identical at ANY magnitude. Costs two casts per OUTPUT GROUP
    (post-aggregation), nothing per row."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(c.cast(f"decimal({prec},{scale})")).cast("string").cast("double")
    )


def dsum_sql(expr: str, prec: int = 30, scale: int = 6) -> str:
    return (
        f"CAST(CAST(SUM(CAST({expr} AS DECIMAL({prec},{scale}))) "
        "AS VARCHAR) AS DOUBLE)"
    )


def davg(col: Column | str, prec: int = 30, scale: int = 6) -> Column:
    """Exact-sum-based average: identical single double division on
    both engines."""
    c = F.col(col) if isinstance(col, str) else col
    return dsum(c, prec, scale) / F.count(F.lit(1))


def davg_sql(expr: str, prec: int = 30, scale: int = 6) -> str:
    return f"{dsum_sql(expr, prec, scale)} / COUNT(*)"
