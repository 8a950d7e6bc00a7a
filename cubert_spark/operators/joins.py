"""Join operators (SURVEY.md §2.3).

The reference ships three physical joins with identical logical
semantics — merge join over co-partitioned sorted blocks
(MergeJoinOperator.java:36), per-block hash join
(HashJoinOperator.java:39), and the reduce-side shuffle join macro
(ShuffleRewriter.java:549-628). In Spark these are ONE logical join;
Catalyst + AQE choose sort-merge / shuffled-hash / broadcast-hash, and
bucketed inputs (operators.blockgen) eliminate the shuffle exactly like
Cubert's blockgen'd blocks.

We keep the three entry points for API parity; ``merge_join`` and
``hash_join`` additionally let callers pin the physical strategy via
join hints, which is the honest Spark translation of Cubert's
user-chosen physical operators.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Output-column prefix separator used by the reference's merge join
#: (MergeJoinOperator.java:63, JOIN_SEP = "___").
JOIN_SEP = "___"

_JOIN_TYPES = {
    "INNER": "inner",
    "LEFT OUTER": "left",
    "RIGHT OUTER": "right",
    "FULL OUTER": "full",
    "LEFT": "left",
    "RIGHT": "right",
    "FULL": "full",
    "LEFT SEMI": "left_semi",
    "LEFT ANTI": "left_anti",
    "CROSS": "cross",
}


def _prefix_nonkey(df: DataFrame, name: str, keys: Sequence[str]) -> DataFrame:
    renames = {c: f"{name}{JOIN_SEP}{c}" for c in df.columns if c not in keys}
    return df.withColumnsRenamed(renames)


def join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    how: str = "INNER",
    left_name: str | None = None,
    right_name: str | None = None,
) -> DataFrame:
    """Logical equi-join with Cubert join-type names.

    With ``left_name``/``right_name`` set, non-key output columns are
    renamed ``name___col`` matching the reference's convention
    (MergeJoinOperator.java:63); otherwise Spark's usual name scoping
    applies. Join keys are emitted once (coalesced for outer joins, as
    the USING-join semantics Cubert's merge join implements).
    """
    how_spark = _JOIN_TYPES.get(how.upper(), how)
    lf, rf = left, right
    if left_name:
        lf = _prefix_nonkey(lf, left_name, on)
    if right_name:
        rf = _prefix_nonkey(rf, right_name, on)
    return lf.join(rf, on=list(on), how=how_spark)


def merge_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    how: str = "INNER",
    **kw,
) -> DataFrame:
    """``JOIN x BY k, y BY k`` — sort-merge join (MergeJoinOperator.java).

    Hinted MERGE: the strategy for two large co-sorted inputs. When both
    sides are bucketed on ``on`` (blockgen), this runs shuffle-free.
    """
    return join(left.hint("merge"), right, on, how, **kw)


def hash_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    how: str = "INNER",
    broadcast_right: bool = False,
    **kw,
) -> DataFrame:
    """``HASH-JOIN x BY k, y BY k`` (HashJoinOperator.java:39; builds the
    hash table on the RIGHT side, :332-375). FULL OUTER is not supported
    by the reference's hash join — we allow it (Spark falls back to SMJ).

    ``broadcast_right=True`` is Cubert's LOAD-CACHED dimension pattern:
    ship the small side to every task instead of shuffling the fact.
    """
    r = F.broadcast(right) if broadcast_right else right.hint("shuffle_hash")
    return join(left, r, on, how, **kw)


def rs_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    how: str = "INNER",
    check_unique_dim: bool = False,
    **kw,
) -> DataFrame:
    """Reduce-side shuffle join macro (ShuffleRewriter.java:549-628).

    The reference tags rows, shuffles tag-first and streams the
    dimension tuple per key; Catalyst's shuffle join is the same
    dataflow. Supported types match the macro: INNER / LEFT OUTER.

    ``check_unique_dim=True`` reproduces the runtime guard that the
    dimension (right) side is duplicate-free on the key (CHANGELOG:17)
    — implemented as a distributed assertion via ``raise_error``, not a
    driver-side count, so it costs one aggregation and no collect.
    """
    if how.upper() not in ("INNER", "LEFT OUTER", "LEFT"):
        raise ValueError("rs_join supports INNER / LEFT OUTER (RSJoinOperator.java:33)")
    if check_unique_dim:
        from pyspark.sql import Window

        n = F.count(F.lit(1)).over(Window.partitionBy(*[F.col(c) for c in on]))
        guard = F.when(
            n > 1,
            F.raise_error(
                F.concat(
                    F.lit("rs_join: duplicate dimension key "),
                    F.to_json(F.struct(*[F.col(c) for c in on])),
                )
            ),
        ).otherwise(F.lit(True))
        right = right.withColumn("__rsj_guard", guard).filter("__rsj_guard").drop(
            "__rsj_guard"
        )
    return join(left, right, on, how, **kw)
