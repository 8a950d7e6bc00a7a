"""Dictionary ENCODE / DECODE / refresh (SURVEY.md §2.2, §4).

The reference builds per-column string<->int dictionaries
(src/utils/CodeDictionary.java:37, job GenerateDictionary.java:50) to
shrink shuffle data. Parquet dictionary encoding + Tungsten make this
unnecessary for performance in Spark; we keep it as an explicit
operator for script parity, implemented as a broadcast join (the
dictionary is small by construction — that is its purpose).

Codes are 1-based dense ranks in value order, deterministic across
runs (the reference assigns codes in insertion order, which is not
reproducible distributed; value order is the canonical choice).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: Reserved code for NULLS AS / UNKNOWNS AS handling
#: (DictionaryEncodeOperator.java:48 constructor params).
DEFAULT_NULL_CODE = 0
DEFAULT_UNKNOWN_CODE = -1


def build_dictionary(df: DataFrame, column: str) -> DataFrame:
    """CREATE DICTIONARY job (GenerateDictionary.java:50): distinct
    non-null values -> dense 1-based codes. Output schema:
    (value STRING, code INT)."""
    w = Window.orderBy(F.col("value"))
    return (
        df.select(F.col(column).cast("string").alias("value"))
        .filter(F.col("value").isNotNull())
        .distinct()
        .withColumn("code", F.row_number().over(w).cast("int"))
    )


def encode(
    df: DataFrame,
    dictionary: DataFrame,
    columns: Sequence[str],
    null_as: int | None = DEFAULT_NULL_CODE,
    unknown_as: int | None = DEFAULT_UNKNOWN_CODE,
) -> DataFrame:
    """``ENCODE x ON cols USING dict [NULLS AS n] [UNKNOWNS AS u]``
    (DictionaryEncodeOperator.java:48). Broadcast map-side join — the
    fact table never shuffles."""
    out = df
    for col in columns:
        d = F.broadcast(
            dictionary.select(
                F.col("value").alias(f"__dict_v_{col}"),
                F.col("code").alias(f"__dict_c_{col}"),
            )
        )
        out = out.join(
            d, out[col].cast("string") == d[f"__dict_v_{col}"], how="left"
        )
        code = F.col(f"__dict_c_{col}")
        if null_as is not None:
            code = F.when(F.col(col).isNull(), F.lit(null_as)).otherwise(code)
        if unknown_as is not None:
            code = F.when(
                F.col(col).isNotNull() & F.col(f"__dict_v_{col}").isNull(),
                F.lit(unknown_as),
            ).otherwise(code)
        out = (
            out.withColumn(col, code.cast("int"))
            .drop(f"__dict_v_{col}", f"__dict_c_{col}")
        )
    return out


def decode(
    df: DataFrame,
    dictionary: DataFrame,
    columns: Sequence[str],
) -> DataFrame:
    """``DECODE x ON cols USING dict`` (DictionaryDecodeOperator.java:41):
    int codes back to string values; unknown codes decode to NULL."""
    out = df
    for col in columns:
        d = F.broadcast(
            dictionary.select(
                F.col("code").alias(f"__dict_c_{col}"),
                F.col("value").alias(f"__dict_v_{col}"),
            )
        )
        out = (
            out.join(d, out[col] == d[f"__dict_c_{col}"], how="left")
            .withColumn(col, F.col(f"__dict_v_{col}"))
            .drop(f"__dict_c_{col}", f"__dict_v_{col}")
        )
    return out


def refresh_dictionary(dictionary: DataFrame, new_values: DataFrame, column: str) -> DataFrame:
    """Dictionary refresh (DictionaryRefreshMapSideOperator.java:34):
    merge new values, keeping existing codes stable and appending new
    ones after the current max."""
    existing_max = dictionary.agg(F.max("code").alias("m"))
    novel = (
        new_values.select(F.col(column).cast("string").alias("value"))
        .filter(F.col("value").isNotNull())
        .distinct()
        .join(dictionary.select("value"), on="value", how="left_anti")
    )
    w = Window.orderBy(F.col("value"))
    novel_coded = novel.withColumn("rn", F.row_number().over(w)).crossJoin(
        F.broadcast(existing_max)
    ).select(
        "value", (F.col("rn") + F.coalesce(F.col("m"), F.lit(0))).cast("int").alias("code")
    )
    return dictionary.unionByName(novel_coded)
