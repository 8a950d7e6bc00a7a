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


def profile_skew(
    df: DataFrame,
    key_cols: Sequence[str],
    top_k: int = 10,
) -> DataFrame:
    """Key-distribution diagnostic — the measurement half of the skew
    toolkit (salting/AQE above are the mitigation half): for each
    candidate shuffle key, the ``top_k`` heaviest values with exact
    counts and a per-hitter ``skew_ratio`` = cnt / (n_rows / n_keys),
    i.e. how many times the average key's row share this value holds.
    A ratio near 1 means uniform; ratios in the hundreds mean that
    key needs salting (or AQE skew-join splitting) before it becomes
    a straggler task at 100 TB.

    Output (long format, one frame for every key): (col_name, rnk,
    key_value string, cnt, n_rows, n_keys, skew_ratio). skew_ratio is
    ONE IEEE divide of two exact bigints (cnt * n_keys / n_rows) —
    engine-exact.

    Scale shape: per column, one partial-aggregated groupBy + a 1-row
    stats broadcast + a TakeOrdered top-k; the union across columns
    is a handful of tiny frames."""
    outs = []
    for c in key_cols:
        # NULL is a real (and often the hottest) key: represent it as
        # the sentinel string so it ranks like any other value and the
        # ordering is engine-portable (Spark sorts NULLs first, SQL
        # engines default NULLS LAST — a latent tiebreak divergence)
        per_key = df.groupBy(
            F.coalesce(F.col(c).cast("string"), F.lit("__null__")).alias(
                "key_value"
            )
        ).agg(F.count(F.lit(1)).alias("cnt"))
        stats = F.broadcast(
            per_key.agg(
                F.sum("cnt").alias("n_rows"),
                F.count(F.lit(1)).alias("n_keys"),
            )
        )
        # TakeOrdered top-k FIRST (distributed partial top-k per map
        # task, never a global sort), THEN rank the <=top_k survivors
        # with a window — the post-limit-rank idiom, so no
        # unpartitioned window ever sees the full key set
        w = Window.orderBy(F.col("cnt").desc(), F.col("key_value"))
        top = (
            per_key.orderBy(F.col("cnt").desc(), F.col("key_value"))
            .limit(top_k)
            .withColumn("rnk", F.row_number().over(w))
            .crossJoin(stats)
        )
        outs.append(
            top.select(
                F.lit(c).alias("col_name"),
                F.col("rnk").cast("int").alias("rnk"),
                "key_value",
                "cnt",
                "n_rows",
                "n_keys",
                (
                    (F.col("cnt") * F.col("n_keys")).cast("double")
                    / F.col("n_rows").cast("double")
                ).alias("skew_ratio"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out
