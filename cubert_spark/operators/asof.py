"""As-of (temporal) join and range join — engine extensions beyond the
reference (SURVEY.md §2.3 lists theta/range/as-of joins as absent;
Cubert users approximate them with scripted BLOCKGEN+MergeJoin
chains).

``asof_join`` uses the union-and-carry algorithm: tag both sides,
union, sort within (key) partitions by event time, and carry the most
recent right-side payload forward with ``last(ignorenulls)``. ONE
shuffle on the key (the same shuffle a join would need), no range
explosion, no per-key driver loop — the formulation that scales to
billions of rows per side. This is exactly the partitioned-sorted
block discipline Cubert's merge-join relies on, expressed as a window.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str] | None = None,
    tolerance: Column | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right_ts <= left_ts`` and equal keys (backward as-of, ties
    included). Right payload columns come back NULL when no match.

    ``right_cols``: right payload columns to carry (default: all
    non-key, non-ts). ``tolerance``: optional max age (e.g.
    ``F.expr("INTERVAL 1 HOUR")``) — matches older than it are nulled.
    """
    on = list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in on and c != right_ts]
    carried = [f"__asof_{c}" for c in right_cols]

    l_tag = left.withColumn("__ts", F.col(left_ts)).withColumn("__side", F.lit(1))
    for c, cc in zip(right_cols, carried):
        l_tag = l_tag.withColumn(cc, F.lit(None).cast(right.schema[c].dataType))
    l_tag = l_tag.withColumn("__rts", F.lit(None).cast(right.schema[right_ts].dataType))

    r_tag = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(cc) for c, cc in zip(right_cols, carried)],
        F.col(right_ts).alias("__rts"),
    )
    for c in left.columns:
        if c not in on:
            r_tag = r_tag.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    r_tag = r_tag.select(*l_tag.columns)

    u = l_tag.unionByName(r_tag)
    # right rows sort before left rows at equal __ts => ties match
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts"), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for cc in carried + ["__rts"]:
        u = u.withColumn(cc, F.last(cc, ignorenulls=True).over(w))
    out = u.filter(F.col("__side") == 1)
    if tolerance is not None:
        stale = F.col("__rts") < (F.col("__ts") - tolerance)
        for cc in carried:
            out = out.withColumn(cc, F.when(stale, F.lit(None)).otherwise(F.col(cc)))
    out = out.drop("__ts", "__side", "__rts")
    for c, cc in zip(right_cols, carried):
        out = out.withColumnRenamed(cc, c)
    return out


def range_join(
    left: DataFrame,
    ranges: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    how: str = "inner",
) -> DataFrame:
    """Join rows to [lo, hi) buckets. The ranges side is expected small
    (banding tables) and is broadcast — a BroadcastNestedLoopJoin with
    a cheap predicate, which is the right physical plan; for two large
    interval sets, pre-bucket both sides instead."""
    cond = (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    return left.join(F.broadcast(ranges), cond, how)


def temporal_join(
    facts: DataFrame,
    dim: DataFrame,
    keys: list[str],
    fact_ts: str,
    valid_from: str,
    valid_to: str,
    how: str = "inner",
) -> DataFrame:
    """Temporal (event-time as-of) enrichment against an SCD2
    dimension: each fact row joins the dimension VERSION that was
    valid at the fact's timestamp — ``valid_from <= ts < valid_to``
    with NULL valid_to meaning the open current version. The
    warehouse-standard point-in-time join (Flink's temporal table
    join, Kimball SCD2 lookup; public concepts), and the third member
    of the as-of family here (asof_join: nearest-earlier by key;
    range_join: broadcast banding).

    Plan shape: an EQUI-join on ``keys`` (sort-merge or broadcast —
    Catalyst's choice) with the interval predicate as a post-join
    filter; the SCD2 invariant (non-overlapping versions per key)
    makes each fact match at most one version, so output size is
    bounded by |facts|. At 100 TB: shuffles on the key only; versions
    per key are bounded by change frequency, never by corpus size."""
    from functools import reduce

    # shared NON-key names would yield duplicate output columns (and
    # ambiguous references downstream) on every path — reject up front
    shared = (set(facts.columns) & set(dim.columns)) - set(keys)
    if shared:
        raise ValueError(
            f"temporal_join: non-key columns {sorted(shared)} exist on "
            "both sides; rename one side first"
        )
    # backtick-quote every plain column ref so dotted names (e.g.
    # "event.ts") resolve as columns, not struct fields — the inner
    # path needs this exactly like the aliased outer path below
    qc = lambda c: F.col(f"`{c}`")  # noqa: E731
    interval = (qc(valid_from) <= qc(fact_ts)) & (
        qc(valid_to).isNull() | (qc(fact_ts) < qc(valid_to))
    )
    if how == "inner":
        return facts.join(dim, keys, "inner").filter(interval)
    # outer flavors must keep unmatched facts: the interval predicate
    # folds INTO the join condition (a post-filter would drop the
    # null-extended rows a left join exists to keep). Alias both
    # frames internally — parent-frame column refs (facts[k]==dim[k])
    # throw an ambiguous-self-join AnalysisException whenever facts
    # and dim derive from the same DataFrame (the standard SCD2 shape:
    # both built from one events table — r7 ADVICE)
    f, d = facts.alias("__tj_f"), dim.alias("__tj_d")
    # backtick-quote the column segment: a dotted column name (e.g.
    # "price.usd") would otherwise parse as a nested-field reference
    # under the alias and throw/miss (r9 ADVICE)
    fc = lambda c: F.col(f"__tj_f.`{c}`")  # noqa: E731
    dc = lambda c: F.col(f"__tj_d.`{c}`")  # noqa: E731
    eq = reduce(lambda a, b: a & b, [fc(k) == dc(k) for k in keys])
    iv = (dc(valid_from) <= fc(fact_ts)) & (
        dc(valid_to).isNull() | (fc(fact_ts) < dc(valid_to))
    )
    joined = f.join(d, eq & iv, how)
    # both sides carry the key columns after a condition-join; COALESCE
    # them (not drop) so full/right-outer unmatched DIM rows keep their
    # key instead of null-ing it out (the fact side is null there) —
    # project explicitly from the aliases to avoid ambiguity
    return joined.select(
        *[F.coalesce(fc(k), dc(k)).alias(k) for k in keys],
        *[fc(c).alias(c) for c in facts.columns if c not in keys],
        *[dc(c).alias(c) for c in dim.columns if c not in keys],
    )
