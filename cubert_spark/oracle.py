"""Local DuckDB-oracle parity harness.

Mirrors the driver's t2 check (BASELINE.md §2): run the engine's Spark
query and the equivalent ANSI-SQL on DuckDB over the same parquet
tables; compare row count, column names, and order-insensitive values.

Float discipline: every query in the inventory is written so that both
engines produce *bit-identical* values — aggregate doubles through
DECIMAL (exact, order-independent) and cast back, or ROUND where a
decimal path isn't expressible. This keeps hash-based comparison
deterministic rather than hoping epsilon-close floats hash equal.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass

import duckdb
from pyspark.sql import DataFrame, SparkSession

from cubert_spark.catalog import STAR_TABLES


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in STAR_TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def _norm(v):
    """Normalize a cell for cross-engine comparison."""
    import datetime
    import decimal

    if v is None:
        return None
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return str(v)
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, bytes):
        return v.hex()
    return v


@dataclass
class ParityResult:
    name: str
    rows_spark: int
    rows_duck: int
    cols_spark: tuple
    cols_duck: tuple
    match: bool
    detail: str = ""

    def __bool__(self) -> bool:
        return self.match


def compare(
    name: str,
    spark_df: DataFrame,
    sql: str,
    con: duckdb.DuckDBPyConnection,
    max_report: int = 5,
) -> ParityResult:
    """Order-insensitive value comparison, columns sorted by name (the
    driver's convention)."""
    sdata = spark_df.collect()
    scols = tuple(sorted(spark_df.columns))
    dres = con.execute(sql)
    dcols_raw = [d[0] for d in dres.description]
    drows = dres.fetchall()
    dcols = tuple(sorted(dcols_raw))

    if scols != dcols:
        return ParityResult(
            name, len(sdata), len(drows), scols, dcols, False,
            f"column mismatch: spark={scols} duck={dcols}",
        )

    sidx = {c: i for i, c in enumerate(spark_df.columns)}
    didx = {c: i for i, c in enumerate(dcols_raw)}

    def _sort_key(row):
        return tuple((v is None, str(v)) for v in row)

    skey = sorted(
        (tuple(_norm(row[sidx[c]]) for c in scols) for row in sdata), key=_sort_key
    )
    dkey = sorted(
        (tuple(_norm(row[didx[c]]) for c in scols) for row in drows), key=_sort_key
    )

    if len(skey) != len(dkey):
        return ParityResult(
            name, len(skey), len(dkey), scols, dcols, False, "row count mismatch"
        )
    mismatches = [
        (a, b) for a, b in zip(skey, dkey) if a != b
    ][:max_report]
    if mismatches:
        return ParityResult(
            name, len(skey), len(dkey), scols, dcols, False,
            "value mismatch, first diffs: " + "\n".join(map(str, mismatches)),
        )
    return ParityResult(name, len(skey), len(dkey), scols, dcols, True)


def run_parity(
    spark: SparkSession,
    sf_dir: str,
    queries: dict,
    oracles: dict,
    only: set[str] | None = None,
) -> list[ParityResult]:
    con = duck_connect(sf_dir)
    results = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        if name not in oracles:
            continue
        df = fn(spark, sf_dir)
        results.append(compare(name, df, oracles[name], con))
    return results
