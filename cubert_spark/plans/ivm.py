"""Incremental view maintenance for JOIN views — the delta-rule
counterpart of plans.summary's aggregate maintenance (classic
published algebra: Blakeley, Larson & Tompa, SIGMOD 1986,
"Efficiently Updating Materialized Views"):

    (A ∪ dA) ⋈ (B ∪ dB) = (A ⋈ B) ∪ (dA ⋈ B) ∪ (A ⋈ dB) ∪ (dA ⋈ dB)

Insert-only deltas (append streams — the shape CDC compaction feeds;
updates/deletes need multiplicity bookkeeping and belong to
operators.cdc's latest-wins tier instead).

At 100 TB the point is cost shape: refreshing J after a day's
appends touches |dA| x B + A x |dB| + |dA| x |dB| — delta-sized work
against indexed/bucketed base tables — instead of re-joining two full
tables. The delta sides are small by construction; Spark broadcasts
them under AQE thresholds, so the BASE tables never reshuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def join_delta(
    a_old: DataFrame,
    b_old: DataFrame,
    d_a: DataFrame,
    d_b: DataFrame,
    on: list[str],
) -> DataFrame:
    """The INCREMENT to the join view: dJ = (dA ⋈ B_old) ∪ (A_old ⋈ dB)
    ∪ (dA ⋈ dB). Union with the stored J_old to get J_new."""
    return (
        d_a.join(b_old, on)
        .unionByName(a_old.join(d_b, on))
        .unionByName(d_a.join(d_b, on))
    )


def maintain_join(
    j_old: DataFrame,
    a_old: DataFrame,
    b_old: DataFrame,
    d_a: DataFrame,
    d_b: DataFrame,
    on: list[str],
) -> DataFrame:
    """J_new = J_old ∪ dJ under insert-only deltas — result-identical
    to re-joining the updated base tables (the driver oracle computes
    exactly that)."""
    return j_old.unionByName(join_delta(a_old, b_old, d_a, d_b, on))
