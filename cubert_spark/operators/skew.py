"""Skew mitigation operators.

AQE handles skewed *joins* (spark.sql.adaptive.skewJoin, on by
default in session.SCALE_DEFAULTS) and partial aggregation absorbs
skewed *additive* group-bys. The remaining hot spot at 100 TB is
non-additive aggregation over skewed keys — COUNT(DISTINCT m) where
one group holds a large share of rows: the final per-key reducer
still sees every distinct member of the hot key.

``salted_count_distinct`` is the standard two-phase fix: phase 1
groups by (key, salt) — spreading each key over S reducers — and
dedups members locally; phase 2 merges per-salt distinct counts,
which is correct because phase 1's output is (key, salt, member)
-distinct and member→salt assignment is a function (hash), so no
member is counted twice.

``salted_topn`` does the same for per-group top-k: per-salt top-k
then global top-k per key (correct since the true top-k of a key is
contained in the union of its per-salt top-ks).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def salted_count_distinct(
    df: DataFrame,
    keys: Sequence[str],
    member: str,
    num_salts: int = 32,
    extra_aggs: Sequence[Column] = (),
) -> DataFrame:
    """Exact COUNT(DISTINCT member) per key, skew-spread over
    ``num_salts`` partial reducers. Salt = hash(member) so each
    member lands in exactly one salt bucket."""
    keys = list(keys)
    salt = F.pmod(F.xxhash64(F.col(member)), F.lit(num_salts)).alias("__salt")
    phase1 = (
        df.select(*keys, F.col(member), salt)
        .groupBy(*keys, "__salt")
        .agg(F.countDistinct(member).alias("__cd_part"))
    )
    out = phase1.groupBy(*keys).agg(
        F.sum("__cd_part").alias(f"count_distinct_{member}")
    )
    if extra_aggs:
        plain = df.groupBy(*keys).agg(*extra_aggs)
        out = out.join(plain, keys, "full")
    return out


def salted_topn(
    df: DataFrame,
    n: int,
    keys: Sequence[str],
    order_by: Sequence[Column],
    num_salts: int = 32,
) -> DataFrame:
    """Per-key top-n tolerant of hot keys: random salt spreads each
    key's rows, per-salt top-n cuts the bulk before the per-key final
    top-n. (Spark's WindowGroupLimit already does a per-map-partition
    cut; this adds an explicit mid-level for extreme skew.)"""
    keys = list(keys)
    salted = df.withColumn("__salt", F.pmod(F.monotonically_increasing_id(), F.lit(num_salts)))
    w1 = Window.partitionBy(*keys, "__salt").orderBy(*order_by)
    part = (
        salted.withColumn("__rn", F.row_number().over(w1))
        .filter(F.col("__rn") <= n)
        .drop("__rn", "__salt")
    )
    w2 = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        part.withColumn("__rn", F.row_number().over(w2))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )
