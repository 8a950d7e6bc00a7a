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
    """Normalize a cell for the human-readable DIFF REPORT only (the
    verdict itself comes from the strict pandas canonicalizer below —
    this looser form exists so a failing query prints comparable
    values instead of raw hash words)."""
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


class CanonError(TypeError):
    """A query produced output the driver's canonicalizer cannot hash
    (list/array/map-typed cells). This is a hard local failure so the
    class of green-locally/red-centrally bugs that shipped in r5
    (embedding_quantize & co) is structurally impossible."""


def _canon_pdf(pdf, engine: str):
    """Replicate the driver's canonicalization: columns sorted by
    name, datetime-likes stringified, bytes hexed, and everything else
    left at its native pandas dtype so the comparison stays
    DTYPE-SENSITIVE (a DuckDB HUGEINT that lands as float64 must NOT
    compare equal to Spark's int64 — that is exactly the r5
    interval_union/clustered_roundtrip failure mode). List-typed
    cells raise CanonError, mirroring the driver's TypeError."""
    import datetime
    import decimal

    import numpy as np
    import pandas as pd

    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    out = {}
    for c in pdf.columns:
        s = pdf[c]
        if pd.api.types.is_datetime64_any_dtype(s.dtype):
            out[c] = s.dt.strftime("%Y-%m-%d %H:%M:%S.%f")
            continue
        if s.dtype == object:
            def cell(v):
                if isinstance(v, (list, tuple, set, dict, np.ndarray)):
                    raise CanonError(
                        f"{engine} column {c!r} holds {type(v).__name__} "
                        "cells — the driver's canonicalizer cannot hash "
                        "these; posexplode/array_join the output"
                    )
                if v is None or (isinstance(v, float) and math.isnan(v)):
                    return None
                if isinstance(v, datetime.datetime):
                    return v.strftime("%Y-%m-%d %H:%M:%S.%f")
                if isinstance(v, datetime.date):
                    return v.strftime("%Y-%m-%d 00:00:00.000000")
                if isinstance(v, (bytes, bytearray)):
                    return bytes(v).hex()
                if isinstance(v, decimal.Decimal):
                    # both engines must emit Decimal for this column or
                    # the dtype check fails — the cast-through-double
                    # discipline keeps Decimal out of final schemas;
                    # normalize scale so 1.50 and 1.5 hash equal
                    return "dec:" + str(v.normalize())
                return v
            out[c] = s.map(cell)
            continue
        out[c] = s
    canon = pd.DataFrame(out, columns=sorted(pdf.columns))
    # nullable pandas extension ints (duckdb emits Int64 for nullable
    # BIGINT) hash differently from numpy int64 for equal values; fold
    # them to the numpy dtype when null-free, float64 otherwise (which
    # matches what Spark's toPandas produces for nullable ints)
    for c in canon.columns:
        dt = canon[c].dtype
        if str(dt) in ("Int8", "Int16", "Int32", "Int64", "UInt8", "UInt16", "UInt32", "UInt64"):
            if canon[c].isna().any():
                canon[c] = canon[c].astype("float64")
            else:
                canon[c] = canon[c].astype("int64")
        elif str(dt) == "Float64":
            canon[c] = canon[c].astype("float64")
        elif str(dt) == "boolean":
            if canon[c].isna().any():
                canon[c] = canon[c].astype(object).where(canon[c].notna(), None)
            else:
                canon[c] = canon[c].astype(bool)
    return canon


def _dtype_kind(dtype) -> str:
    """Collapse a pandas dtype to the kind the comparison keys on.
    int64 vs float64 is a REAL difference (the HUGEINT class); int8
    vs int64 is not — both engines round-trip small ints through
    parquet at differing widths."""
    k = getattr(dtype, "kind", "O")
    if k in "iu":
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    if k == "M":
        return "datetime"
    return "object"


def _hash_frame(canon):
    """Order-insensitive dtype-sensitive row-hash multiset (the
    driver's comparison shape): per-row hash via
    pandas.util.hash_pandas_object, sorted."""
    import numpy as np
    import pandas as pd

    if len(canon) == 0:
        return np.array([], dtype="uint64")
    h = pd.util.hash_pandas_object(canon, index=False)
    return np.sort(h.values)


@dataclass
class ParityResult:
    name: str
    rows_spark: int
    rows_duck: int
    cols_spark: tuple
    cols_duck: tuple
    match: bool
    detail: str = ""
    # 0==0 rows is a green hash compare that verifies nothing about the
    # query's math (the r6 nation_volume FRANCE/GERMANY bug hid behind
    # it). The gate treats vacuous green as a failure unless the query
    # is explicitly allowlisted with a reason.
    vacuous: bool = False

    def __bool__(self) -> bool:
        return self.match


def compare(
    name: str,
    spark_df: DataFrame,
    sql: str,
    con: duckdb.DuckDBPyConnection,
    max_report: int = 5,
) -> ParityResult:
    """Replicates the driver's t2 comparison, strictly: both results
    go through pandas, columns sorted by name, rows compared as a
    sorted multiset of dtype-SENSITIVE pandas row hashes. int64 vs
    float64 fails even when every value is numerically equal (DuckDB
    HUGEINT drift — the r5 interval_union class), and list-typed
    output cells fail hard (the r5 embedding_quantize class). When
    the hash verdict is red, a looser value diff is attached to the
    detail string for debugging only."""
    import numpy as np

    spdf = spark_df.toPandas()
    scols = tuple(sorted(spdf.columns))
    dres = con.execute(sql)
    dpdf = dres.df()
    dcols = tuple(sorted(dpdf.columns))

    if scols != dcols:
        return ParityResult(
            name, len(spdf), len(dpdf), scols, dcols, False,
            f"column mismatch: spark={scols} duck={dcols}",
        )
    try:
        scanon = _canon_pdf(spdf, "spark")
        dcanon = _canon_pdf(dpdf, "duckdb")
    except CanonError as e:
        return ParityResult(
            name, len(spdf), len(dpdf), scols, dcols, False,
            f"canonicalizer failure (driver would err): {e}",
        )
    if len(scanon) != len(dcanon):
        return ParityResult(
            name, len(scanon), len(dcanon), scols, dcols, False,
            "row count mismatch",
        )
    skinds = {c: _dtype_kind(scanon[c].dtype) for c in scanon.columns}
    dkinds = {c: _dtype_kind(dcanon[c].dtype) for c in dcanon.columns}
    if skinds != dkinds:
        bad = {
            c: (skinds[c], dkinds[c])
            for c in skinds
            if skinds[c] != dkinds[c]
        }
        return ParityResult(
            name, len(scanon), len(dcanon), scols, dcols, False,
            f"dtype mismatch (spark, duck): {bad}",
        )
    # width-normalize within a kind so the hash keys on kind+value
    for c in scanon.columns:
        for canon in (scanon, dcanon):
            k = _dtype_kind(canon[c].dtype)
            if k == "int":
                canon[c] = canon[c].astype("int64")
            elif k == "float":
                canon[c] = canon[c].astype("float64")
    if np.array_equal(_hash_frame(scanon), _hash_frame(dcanon)):
        return ParityResult(
            name, len(scanon), len(dcanon), scols, dcols, True,
            vacuous=len(scanon) == 0,
        )

    # hashes differ -> build a readable diff with the loose normalizer
    def _sort_key(row):
        return tuple((v is None, str(v)) for v in row)

    skey = sorted(
        (tuple(_norm(v) for v in row) for row in scanon.itertuples(index=False)),
        key=_sort_key,
    )
    dkey = sorted(
        (tuple(_norm(v) for v in row) for row in dcanon.itertuples(index=False)),
        key=_sort_key,
    )
    mismatches = [(a, b) for a, b in zip(skey, dkey) if a != b][:max_report]
    detail = "hash mismatch"
    if mismatches:
        detail += ", first loose-diffs: " + "\n".join(map(str, mismatches))
    else:
        detail += " (values loosely equal — dtype/representation drift)"
    return ParityResult(name, len(skey), len(dkey), scols, dcols, False, detail)


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
