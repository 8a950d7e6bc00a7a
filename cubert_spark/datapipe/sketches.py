"""Deterministic, oracle-replayable sketches: HyperLogLog and
Count-Min, built on md5 so a SQL engine reproduces every register and
every estimate bit-for-bit (the same determinism doctrine as minhash:
md5 for cross-engine replay; swap xxhash64 for production speed).

Both sketches are MERGEABLE — the build is a keyed groupBy whose
monoid (max for HLL registers, sum for CMS counters) Spark combines
map-side, so a 100 TB build is one shuffle of at most
(buckets x depth) rows per partition, and sketches of separate
partitions/days union-aggregate into the sketch of the whole.

Float discipline: the HLL harmonic sum is computed as an EXACT bigint
(every term is a power of two, scaled by 2^49), so the only IEEE
operation in the estimate is one final divide of two identical
numbers in both engines — the order-independence problem float
harmonic sums have is gone by construction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: HLL tail width in bits (12 hex nibbles) — rank range 1..49.
_TAIL_BITS = 48


def _hll_alpha_m2_c(m: int) -> float:
    """The HLL bias constant alpha_m * m^2, scaled by 2^(TAIL_BITS+1)
    to match the bigint-scaled harmonic sum. Computed once here and
    inlined as the SAME double literal into the oracle SQL, so both
    engines divide identical numbers."""
    alpha = 0.7213 / (1.0 + 1.079 / m)
    return alpha * m * m * float(2 ** (_TAIL_BITS + 1))


def hll_registers(
    df: DataFrame,
    col: str,
    p: int = 8,
    salt: str = "hll",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Per-bucket HLL registers for ``col``: bucket = first ``p`` bits
    (p=8: first 2 hex chars) of md5, register = max over values of
    (leading-zero bits of the next 48-bit tail) + 1, computed with
    string ops only (ltrim of '0' nibbles + a 4-way CASE on the first
    nonzero nibble) — no log2, no float, engine-portable.

    Output: (bucket int, reg int) for OBSERVED buckets only (empty
    buckets are implicit reg=0; estimators must add them back).
    Mergeable: max-combine registers of sub-sketches.
    """
    assert p == 8, "bucket extraction is spelled for p=8 (2 hex chars)"
    from cubert_spark.datapipe.dedup import _spread

    # md5 aliased in its own projection so it's computed once per row
    # (CollapseProject keeps the multiply-referenced alias); _spread
    # parallelizes the per-row digest work when the scan has fewer
    # splits than cores (no-op at real scale)
    gcols = list(group_cols or [])
    h = _spread(df, col).select(
        *gcols,
        F.md5(F.concat(F.lit(salt + "|"), F.col(col).cast("string"))).alias("__h"),
    )
    parts = h.select(
        *gcols,
        F.conv(F.substring("__h", 1, 2), 16, 10).cast("int").alias("bucket"),
        F.expr("ltrim('0', substring(__h, 3, 12))").alias("__t"),
    )
    nz = F.conv(F.substring("__t", 1, 1), 16, 10).cast("int")
    extra = (
        F.when(nz >= 8, 0).when(nz >= 4, 1).when(nz >= 2, 2).otherwise(3)
    )
    rank = F.when(F.length("__t") == 0, F.lit(_TAIL_BITS + 1)).otherwise(
        (F.lit(12) - F.length("__t")) * 4 + extra + 1
    )
    return (
        parts.select(*gcols, "bucket", rank.alias("__r"))
        .groupBy(*gcols, "bucket")
        .agg(F.max("__r").alias("reg"))
    )


def hll_estimate(
    df: DataFrame,
    col: str,
    p: int = 8,
    salt: str = "hll",
) -> DataFrame:
    """One-row HLL cardinality estimate for ``col``.

    Output: (col_name, n_buckets, n_empty, s_scaled, est) where
    s_scaled = sum over ALL 2^p buckets of 2^(49 - reg) (an exact
    bigint; empty buckets contribute 2^49) and
    est = alpha_m * m^2 * 2^49 / s_scaled — the raw HLL estimator as
    ONE IEEE divide. n_empty ships so a consumer can apply the
    standard linear-counting small-range correction (m * ln(m/V)) —
    ln is not cross-engine bit-portable, so the correction is left to
    the reader, not baked into the oracle-checked value.
    """
    m = 1 << p
    regs = hll_registers(df, col, p, salt)
    a = regs.agg(
        F.count(F.lit(1)).alias("__nb"),
        F.sum(
            F.expr(f"shiftleft(cast(1 as bigint), {_TAIL_BITS + 1} - reg)")
        ).alias("__s_obs"),
    )
    return a.select(
        F.lit(col).alias("col_name"),
        F.lit(m).alias("n_buckets"),
        (F.lit(m) - F.col("__nb")).cast("bigint").alias("n_empty"),
        (
            F.col("__s_obs")
            + (F.lit(m) - F.col("__nb")) * F.lit(2 ** (_TAIL_BITS + 1)).cast("bigint")
        ).alias("s_scaled"),
    ).withColumn(
        "est", F.lit(_hll_alpha_m2_c(m)) / F.col("s_scaled").cast("double")
    )


def hll_estimate_by(
    df: DataFrame,
    col: str,
    group_cols: list[str],
    p: int = 8,
    salt: str = "hll",
) -> DataFrame:
    """Per-group HLL estimates — approximate COUNT(DISTINCT col) GROUP
    BY group_cols as a mergeable sketch agg: one keyed groupBy of at
    most 2^p register rows per group, vs the exact two-level
    distinct's full shuffle of every (group, value) pair. Same exact
    bigint harmonic sum + single IEEE divide per group."""
    m = 1 << p
    regs = hll_registers(df, col, p, salt, group_cols)
    a = regs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("__nb"),
        F.sum(
            F.expr(f"shiftleft(cast(1 as bigint), {_TAIL_BITS + 1} - reg)")
        ).alias("__s_obs"),
    )
    return a.select(
        *group_cols,
        (F.lit(m) - F.col("__nb")).cast("bigint").alias("n_empty"),
        (
            F.col("__s_obs")
            + (F.lit(m) - F.col("__nb")) * F.lit(2 ** (_TAIL_BITS + 1)).cast("bigint")
        ).alias("s_scaled"),
    ).withColumn(
        "est", F.lit(_hll_alpha_m2_c(m)) / F.col("s_scaled").cast("double")
    )


def hll_sql(table: str, col: str, p: int = 8, salt: str = "hll") -> str:
    """DuckDB oracle for ``hll_estimate`` — identical bucket/rank
    math via strpos nibble parsing, identical bigint harmonic sum,
    and the SAME inlined alpha constant."""
    assert p == 8
    m = 1 << p
    c = repr(_hll_alpha_m2_c(m))
    nib = "(strpos('0123456789abcdef', substr({s}, {i}, 1)) - 1)"
    b1 = nib.format(s="__h", i=1)
    b2 = nib.format(s="__h", i=2)
    nz = nib.format(s="__t", i=1)
    # nested subqueries, no CTE: callers UNION ALL several of these
    return f"""
SELECT col_name, n_buckets, n_empty, s_scaled,
       {c} / CAST(s_scaled AS DOUBLE) AS est
FROM (
  SELECT '{col}' AS col_name,
         {m} AS n_buckets,
         CAST({m} - COUNT(*) AS BIGINT) AS n_empty,
         CAST(SUM(CAST(1 AS BIGINT) << ({_TAIL_BITS + 1} - reg))
              + ({m} - COUNT(*)) * CAST({2 ** (_TAIL_BITS + 1)} AS BIGINT) AS BIGINT)
           AS s_scaled
  FROM (
    SELECT bucket, MAX(__r) AS reg FROM (
      SELECT bucket,
             CASE WHEN length(__t) = 0 THEN {_TAIL_BITS + 1}
                  ELSE (12 - length(__t)) * 4
                       + (CASE WHEN {nz} >= 8 THEN 0
                               WHEN {nz} >= 4 THEN 1
                               WHEN {nz} >= 2 THEN 2
                               ELSE 3 END) + 1
             END AS __r
      FROM (
        SELECT ({b1}) * 16 + ({b2}) AS bucket,
               ltrim(substr(__h, 3, 12), '0') AS __t
        FROM (
          SELECT md5('{salt}|' || CAST({col} AS VARCHAR)) AS __h FROM {table}
        )
      )
    ) GROUP BY 1
  )
)
"""


# --- Count-Min ---------------------------------------------------------------

def cms_sketch(
    df: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 256,
    salt: str = "cms",
) -> DataFrame:
    """Count-Min sketch of the ``col`` value stream: ``depth``
    independent md5 rows, ``width`` buckets each (width=256: first 2
    hex chars). Output: (row int, bucket int, cnt bigint) — at most
    depth*width rows regardless of input size, sum-mergeable.

    The build is one explode(depth) + one keyed count with map-side
    combine: the shuffle carries at most depth*width rows PER
    PARTITION, not per input row. Two catalogued expression-plan traps
    avoided below (see SCALE.md round-5 notes): the bucket array is
    aliased in its own projection (else the md5s re-run per exploded
    row), and explode_outer + a post-filter sidesteps
    InferFiltersFromGenerate inlining the array build twice per row
    below the _spread exchange.
    """
    from cubert_spark.datapipe.dedup import _spread

    assert width == 256, "bucket extraction is spelled for width=256"
    rows = F.array(
        *[
            F.struct(
                F.lit(j).alias("row"),
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit(f"{salt}{j}|"), F.col(col).cast("string"))),
                        1,
                        2,
                    ),
                    16,
                    10,
                )
                .cast("int")
                .alias("bucket"),
            )
            for j in range(depth)
        ]
    )
    return (
        _spread(df, col)
        .select(rows.alias("__rb"))
        .select(F.explode_outer("__rb").alias("rb"))
        .filter(F.col("rb").isNotNull())
        .select("rb.row", "rb.bucket")
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    salt: str = "cms",
) -> DataFrame:
    """Point-query the sketch for each key in ``keys``: est = min over
    rows of the key's bucket counter (the classic CMS upper bound —
    est >= true count always, overshoot bounded by collisions).
    ``keys`` is expected to be small (a candidate/probe set): it
    explodes to depth probes and BROADCASTS onto the (tiny) sketch.
    """
    probes = keys.select(
        F.col(key_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("row"),
                        F.conv(
                            F.substring(
                                F.md5(
                                    F.concat(
                                        F.lit(f"{salt}{j}|"), F.col(key_col).cast("string")
                                    )
                                ),
                                1,
                                2,
                            ),
                            16,
                            10,
                        )
                        .cast("int")
                        .alias("bucket"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("rb"),
    ).select(key_col, "rb.row", "rb.bucket")
    return (
        sketch.join(F.broadcast(probes), ["row", "bucket"])
        .groupBy(key_col)
        .agg(F.min("cnt").alias("est"))
    )


def hll_sql_by(table: str, col: str, group_col: str, p: int = 8, salt: str = "hll") -> str:
    """DuckDB oracle for :func:`hll_estimate_by` (single group col)."""
    assert p == 8
    m = 1 << p
    c = repr(_hll_alpha_m2_c(m))
    nib = "(strpos('0123456789abcdef', substr({s}, {i}, 1)) - 1)"
    b1 = nib.format(s="__h", i=1)
    b2 = nib.format(s="__h", i=2)
    nz = nib.format(s="__t", i=1)
    return f"""
SELECT {group_col}, n_empty, s_scaled,
       {c} / CAST(s_scaled AS DOUBLE) AS est
FROM (
  SELECT {group_col},
         CAST({m} - COUNT(*) AS BIGINT) AS n_empty,
         CAST(SUM(CAST(1 AS BIGINT) << ({_TAIL_BITS + 1} - reg))
              + ({m} - COUNT(*)) * CAST({2 ** (_TAIL_BITS + 1)} AS BIGINT) AS BIGINT)
           AS s_scaled
  FROM (
    SELECT {group_col}, bucket, MAX(__r) AS reg FROM (
      SELECT {group_col}, bucket,
             CASE WHEN length(__t) = 0 THEN {_TAIL_BITS + 1}
                  ELSE (12 - length(__t)) * 4
                       + (CASE WHEN {nz} >= 8 THEN 0
                               WHEN {nz} >= 4 THEN 1
                               WHEN {nz} >= 2 THEN 2
                               ELSE 3 END) + 1
             END AS __r
      FROM (
        SELECT {group_col}, ({b1}) * 16 + ({b2}) AS bucket,
               ltrim(substr(__h, 3, 12), '0') AS __t
        FROM (
          SELECT {group_col},
                 md5('{salt}|' || CAST({col} AS VARCHAR)) AS __h
          FROM {table}
        )
      )
    ) GROUP BY 1, 2
  ) GROUP BY 1
)
"""


# --- K-Minimum-Values --------------------------------------------------------

def kmv_sketch(df: DataFrame, col: str, k: int = 256, salt: str = "kmv") -> DataFrame:
    """KMV distinct-value sketch (Bar-Yossef et al. 2002, public): the
    ``k`` lexicographically-smallest md5 digests of the DISTINCT values
    of ``col``. md5 hex order == numeric order of the 128-bit hash, so
    string sort is the sketch order and every engine replays it.

    Build shape at 100 TB: one distinct shuffle on the digest, then a
    global ORDER BY + LIMIT k — Spark plans TakeOrderedAndProject
    (per-partition top-k, driver merges k rows/partition; never a full
    sort). Mergeable: the sketch of a union is the k smallest of the
    concatenated sketches — same ORDER BY + LIMIT."""
    from cubert_spark.datapipe.dedup import _spread

    h = (
        _spread(df.filter(F.col(col).isNotNull()), col)
        .select(
            F.md5(F.concat(F.lit(salt + "|"), F.col(col).cast("string"))).alias("h")
        )
        .distinct()
    )
    # NULL keys are excluded EXPLICITLY: a null digest would sort
    # nulls-first in Spark but nulls-last in DuckDB — silent
    # cross-engine divergence in the k-th value
    return h.orderBy("h").limit(k)


def kmv_set_ops(
    df_a: DataFrame,
    col_a: str,
    df_b: DataFrame,
    col_b: str,
    k: int = 256,
    salt: str = "kmv",
) -> DataFrame:
    """Distinct-cardinality set algebra from two KMV sketches — the
    sketch-tier answer to "how many distinct keys do these two 100 TB
    tables share" without ever joining the tables:

    - union sketch = k smallest of the two sketches' union (with
      membership flags carried through a full outer join of the
      [<=k]-row sketches — driver-side-tiny by construction);
    - union_est = (k-1) * 2^60 / kth60 (the classic unbiased KMV
      estimator; kth60 = first 60 bits of the k-th smallest digest as
      an exact bigint, so the only IEEE op is one divide of two
      identical numbers in every engine). When the union sketch holds
      fewer than k digests the count is EXACT (= n);
    - inter_est = (|union sketch ∩ A ∩ B| / n) * union_est — the
      Jaccard-scaled estimate.

    One row out: (n, kth60, inter_k, union_est, inter_est)."""
    sa = kmv_sketch(df_a, col_a, k, salt).withColumn("in_a", F.lit(1))
    sb = kmv_sketch(df_b, col_b, k, salt).withColumn("in_b", F.lit(1))
    u = sa.join(sb, "h", "full").select(
        "h",
        F.coalesce("in_a", F.lit(0)).alias("in_a"),
        F.coalesce("in_b", F.lit(0)).alias("in_b"),
    )
    uk = u.orderBy("h").limit(k)
    agg = uk.agg(
        F.count(F.lit(1)).alias("n"),
        F.max("h").alias("__kth"),
        F.sum(F.col("in_a") * F.col("in_b")).alias("inter_k"),
    )
    kth60 = F.conv(F.substring("__kth", 1, 15), 16, 10).cast("bigint")
    with_est = agg.select(
        "n",
        kth60.alias("kth60"),
        "inter_k",
        F.when(F.col("n") < k, F.col("n").cast("double")).otherwise(
            # (k-1)*2^60 is an exact double literal (8-bit mantissa,
            # power-of-two shift); the divide is the one IEEE op
            F.lit(float((k - 1) * (1 << 60))) / kth60.cast("double")
        ).alias("union_est"),
    )
    return with_est.select(
        "n",
        "kth60",
        "inter_k",
        "union_est",
        (
            F.col("inter_k").cast("double")
            / F.col("n").cast("double")
            * F.col("union_est")
        ).alias("inter_est"),
    )


def kmv_set_ops_sql(
    table_a: str,
    col_a: str,
    table_b: str,
    col_b: str,
    k: int = 256,
    salt: str = "kmv",
) -> str:
    """DuckDB oracle for :func:`kmv_set_ops` — same digests, same
    sketch order, same exact-bigint kth60, same single-divide
    estimator (hex -> bigint via DuckDB's '0x' cast, which matches
    Spark's conv(,16,10) bit-for-bit on 15 hex chars)."""
    scale = repr(float((k - 1) * (1 << 60)))
    return f"""
WITH sa AS (
  SELECT h FROM (
    SELECT DISTINCT md5('{salt}|' || CAST({col_a} AS VARCHAR)) AS h
    FROM {table_a} WHERE {col_a} IS NOT NULL
  ) ORDER BY h LIMIT {k}
),
sb AS (
  SELECT h FROM (
    SELECT DISTINCT md5('{salt}|' || CAST({col_b} AS VARCHAR)) AS h
    FROM {table_b} WHERE {col_b} IS NOT NULL
  ) ORDER BY h LIMIT {k}
),
u AS (
  SELECT COALESCE(sa.h, sb.h) AS h,
         CASE WHEN sa.h IS NULL THEN 0 ELSE 1 END AS in_a,
         CASE WHEN sb.h IS NULL THEN 0 ELSE 1 END AS in_b
  FROM sa FULL OUTER JOIN sb ON sa.h = sb.h
),
uk AS (SELECT * FROM u ORDER BY h LIMIT {k}),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         MAX(h) AS __kth,
         CAST(SUM(in_a * in_b) AS BIGINT) AS inter_k
  FROM uk
),
est AS (
  SELECT n,
         CAST(('0x' || substr(__kth, 1, 15)) AS BIGINT) AS kth60,
         inter_k,
         CASE WHEN n < {k} THEN CAST(n AS DOUBLE)
              ELSE {scale} / CAST(CAST(('0x' || substr(__kth, 1, 15)) AS BIGINT) AS DOUBLE)
         END AS union_est
  FROM agg
)
SELECT n, kth60, inter_k, union_est,
       CAST(inter_k AS DOUBLE) / CAST(n AS DOUBLE) * union_est AS inter_est
FROM est
"""
