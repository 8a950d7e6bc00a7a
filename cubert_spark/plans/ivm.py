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


def tx_delta(spark, path: str, from_version: int, to_version: int | None = None):
    """Rows appended to a tx table (catalog.tx_commit) between two
    committed versions, read from MANIFESTS ONLY: append commits never
    rewrite data files, so the delta is exactly the file-set
    difference of the two snapshots — a scan of just the new files,
    zero row-level diffing, cost proportional to the appends, not the
    table. This is the bridge between the tx log and the delta rules
    above: the log already knows what changed; no CDC pass needed.

    Raises if the chain is not append-only between the versions (an
    overwrite commit dropped files — deltas are undefined there; use a
    full refresh or operators.cdc's multiplicity tier)."""
    from cubert_spark import catalog

    f_from = set(catalog.tx_files(path, from_version))
    to_v = (
        catalog.tx_versions(path)[-1] if to_version is None else to_version
    )
    if to_v < from_version:
        raise ValueError(
            f"tx_delta: to_version v{to_v} precedes from_version "
            f"v{from_version}"
        )
    f_to = catalog.tx_files(path, to_v)
    if not f_from <= set(f_to):
        raise ValueError(
            f"tx_delta: {path} v{from_version}->v{to_v} is not append-only "
            "(an overwrite dropped files); incremental maintenance is "
            "undefined — run a full refresh"
        )
    new = [f for f in f_to if f not in f_from]
    if not new:
        return catalog.tx_read(spark, path, version=to_v).limit(0)
    import os

    return spark.read.parquet(*[os.path.join(path, f) for f in new])


def maintain_join_tx(
    spark,
    j_old: DataFrame,
    a_path: str,
    b_path: str,
    on: list[str],
    a_from: int,
    b_from: int,
    a_to: int | None = None,
    b_to: int | None = None,
) -> DataFrame:
    """Maintain a join MV directly from two tx logs: ``j_old`` is the
    view as of (a_from, b_from); the result is the view as of
    (a_to, b_to) (defaults: each table's head), computed with
    delta-sized work — the reference's SummaryRewriter idea
    (AggregateRewriter.java:54: rewrite a full recompute against a
    stored summary + the date delta) generalized from dated
    partitions to manifest-diffed tx snapshots and from aggregates to
    joins (plans.summary covers the aggregate side).

    At 100 TB: |dA| and |dB| are one commit window's appends; Spark
    broadcasts them under AQE thresholds, so the base tables are
    probed, never reshuffled, and J refresh cost tracks the append
    rate instead of the table size."""
    from cubert_spark import catalog

    a_old = catalog.tx_read(spark, a_path, version=a_from)
    b_old = catalog.tx_read(spark, b_path, version=b_from)
    d_a = tx_delta(spark, a_path, a_from, a_to)
    d_b = tx_delta(spark, b_path, b_from, b_to)
    return maintain_join(j_old, a_old, b_old, d_a, d_b, on)
