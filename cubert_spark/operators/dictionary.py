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


def _dense_value_ranks(vals: DataFrame, num_shards: int | None = None) -> DataFrame:
    """(value)-distinct frame -> (value, rn) with rn the 1-based dense
    rank in value order, computed as a DISTRIBUTED two-level prefix
    sum (the ``curation.sequence_pack`` idiom) instead of one
    ``row_number`` over an unpartitioned window — a 10^7-value
    dictionary build must not funnel through a single reducer.

    Shard assignment is a DETERMINISTIC, order-preserving bucket
    function: a hash-based sample (``xxhash64(value) % m == 0`` — a
    pure function of the value, so retries resample identically)
    collects a BOUNDED set of strings to the driver, whose sorted
    every-k-th elements become the shard boundaries; each value's
    shard is then "how many boundaries are <= me" (a runtime fold over
    the boundary-array literal). Level 2: shard counts get running
    offsets in one small window (num_shards rows), broadcast back,
    and each value adds its within-shard ``row_number`` (window
    partitioned BY SHARD — bounded state).

    Deterministic literals — not ``spark_partition_id`` over a range
    exchange — are what make this fault tolerant: the first spelling
    of this function pinned the physical partitioning with a lazy
    ``localCheckpoint`` so two consumers would observe the same
    partition ids, but checkpoints truncate lineage, so on a real
    cluster losing an executor's checkpointed blocks mid-job aborts
    the build (r13 review finding). With boundary literals every
    subtree is recomputable from source, and the final rank equals
    "number of distinct values < v" + 1 regardless of where the
    sampled boundaries fell, so codes are identical across runs and
    retries even though shard SIZES vary with the sketch.
    """
    spark = vals.sparkSession
    if num_shards is None:
        num_shards = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    # bounded driver collect: a ~(200 * num_shards)-string sample via a
    # value-hash filter (string quantiles have no sketch aggregate);
    # two cheap jobs (count + sample), never the full value set
    per_shard = 200
    n = vals.count()
    m = max(1, n // (per_shard * num_shards))
    sample = sorted(
        r["value"]
        for r in vals.filter(
            F.pmod(F.xxhash64(F.col("value")), F.lit(m)) == 0
        ).collect()
    )
    step = max(1, len(sample) // num_shards)
    bounds = sample[step::step][: num_shards - 1]
    if bounds:
        barr = F.array(*[F.lit(b) for b in bounds])
        shard = F.aggregate(
            barr,
            F.lit(0),
            lambda acc, b: acc + F.when(F.col("value") >= b, 1).otherwise(0),
        )
    else:
        shard = F.lit(0)
    with_pid = vals.withColumn("__pid", shard)
    counts = with_pid.groupBy("__pid").agg(F.count(F.lit(1)).alias("__cnt"))
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "__pid",
        F.coalesce(F.sum("__cnt").over(w_off), F.lit(0)).alias("__off"),
    )
    w_in = Window.partitionBy("__pid").orderBy("value")
    return (
        with_pid.join(F.broadcast(offsets), "__pid")
        .withColumn("rn", F.col("__off") + F.row_number().over(w_in))
        .select("value", "rn")
    )


def build_dictionary(
    df: DataFrame, column: str, num_shards: int | None = None
) -> DataFrame:
    """CREATE DICTIONARY job (GenerateDictionary.java:50): distinct
    non-null values -> dense 1-based codes. Output schema:
    (value STRING, code INT). Code assignment is the distributed
    two-level prefix sum (``_dense_value_ranks``) — no single
    reducer ever sees the full value set."""
    vals = (
        df.select(F.col(column).cast("string").alias("value"))
        .filter(F.col("value").isNotNull())
        .distinct()
    )
    return _dense_value_ranks(vals, num_shards).select(
        "value", F.col("rn").cast("int").alias("code")
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


def refresh_dictionary(
    dictionary: DataFrame,
    new_values: DataFrame,
    column: str,
    num_shards: int | None = None,
) -> DataFrame:
    """Dictionary refresh (DictionaryRefreshMapSideOperator.java:34):
    merge new values, keeping existing codes stable and appending new
    ones after the current max. Novel-value code assignment uses the
    same distributed two-level prefix sum as ``build_dictionary``."""
    existing_max = dictionary.agg(F.max("code").alias("m"))
    novel = (
        new_values.select(F.col(column).cast("string").alias("value"))
        .filter(F.col("value").isNotNull())
        .distinct()
        .join(dictionary.select("value"), on="value", how="left_anti")
    )
    novel_coded = (
        _dense_value_ranks(novel, num_shards)
        .crossJoin(F.broadcast(existing_max))
        .select(
            "value",
            (F.col("rn") + F.coalesce(F.col("m"), F.lit(0)))
            .cast("int")
            .alias("code"),
        )
    )
    return dictionary.unionByName(novel_coded)
