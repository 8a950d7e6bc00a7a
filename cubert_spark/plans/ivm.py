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


def tx_delta(
    spark,
    path: str,
    from_version: int,
    to_version: int | None = None,
    merge_schema: bool = False,
):
    """Rows appended to a tx table (catalog.tx_commit) between two
    committed versions, read from MANIFESTS ONLY: append commits never
    rewrite data files, so the delta is exactly the file-set
    difference of the two snapshots — a scan of just the new files,
    zero row-level diffing, cost proportional to the appends, not the
    table. This is the bridge between the tx log and the delta rules
    above: the log already knows what changed; no CDC pass needed.

    Raises if the chain is not append-only between the versions (an
    overwrite commit dropped files — an INSERT-ONLY delta is undefined
    there; ``tx_delta_rw`` below returns the (insert, retract) pair
    that handles it, and ``maintain_join_tx`` routes to it
    automatically).

    ``merge_schema`` (r14 ADVICE): a schema-evolved append chain (the
    case tx_read's merge_schema exists for) otherwise yields a delta
    whose schema mismatches the base read and unionByName raises —
    pass True to null-pad across evolved commits, exactly like
    tx_read."""
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
    return _read_files(spark, path, new, to_v, merge_schema)


def _read_files(spark, path: str, files: list, schema_version: int,
                merge_schema: bool):
    """Scan a manifest file subset (empty -> a schema-correct empty
    frame at ``schema_version``'s snapshot schema)."""
    from cubert_spark import catalog

    if not files:
        return catalog.tx_read(
            spark, path, version=schema_version, merge_schema=merge_schema
        ).limit(0)
    import os

    reader = spark.read
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    return reader.parquet(*[os.path.join(path, f) for f in files])


def tx_delta_rw(
    spark,
    path: str,
    from_version: int,
    to_version: int | None = None,
    merge_schema: bool = False,
):
    """General commit-chain delta as an (inserted, retracted) pair of
    frames, from MANIFESTS ONLY: inserted = rows in files the ``to``
    snapshot has that ``from`` lacks, retracted = rows in files the
    ``from`` snapshot had that ``to`` dropped (overwrite commits drop
    files from the manifest but never delete them from disk — the
    same immutable-data-file discipline as Delta/Iceberg — so the
    retracted rows remain scannable). Append-only ranges come back
    with an empty retract side, making this a strict generalization
    of ``tx_delta``; cost stays proportional to the CHANGED files,
    never the table."""
    from cubert_spark import catalog

    f_from = catalog.tx_files(path, from_version)
    to_v = (
        catalog.tx_versions(path)[-1] if to_version is None else to_version
    )
    if to_v < from_version:
        raise ValueError(
            f"tx_delta_rw: to_version v{to_v} precedes from_version "
            f"v{from_version}"
        )
    f_to = catalog.tx_files(path, to_v)
    s_from, s_to = set(f_from), set(f_to)
    ins = [f for f in f_to if f not in s_from]
    ret = [f for f in f_from if f not in s_to]
    return (
        _read_files(spark, path, ins, to_v, merge_schema),
        _read_files(spark, path, ret, from_version, merge_schema),
    )


def maintain_join_rw(
    j_old: DataFrame,
    a_old: DataFrame,
    b_old: DataFrame,
    d_a_ins: DataFrame,
    d_a_ret: DataFrame,
    d_b_ins: DataFrame,
    d_b_ret: DataFrame,
    on: list[str],
) -> DataFrame:
    """Join-view maintenance under inserts AND retractions (the full
    Blakeley-Larson-Tompa delta rule, multiset semantics): apply the
    A-side change against B_old, then the B-side change against the
    UPDATED A. Retractions use exceptAll (exact multiset difference),
    which is sound because retracted rows are by construction a
    sub-multiset of the base (they came from the base's own dropped
    files) — join distributes over multiset difference under that
    containment.

    Cost shape at 100 TB: every join has one delta-sized side
    (broadcastable under AQE); the exceptAll is a shuffle of J's rows
    against a delta-sized right side — still refresh cost tracking
    the COMMIT size, not the table, which is the IVM point."""
    cols = j_old.columns

    def _j(x, y):
        return x.join(y, on).select(*cols)

    j1 = (
        j_old.exceptAll(_j(d_a_ret, b_old))
        .unionByName(_j(d_a_ins, b_old))
    )
    a_new = a_old.exceptAll(d_a_ret).unionByName(d_a_ins)
    return (
        j1.exceptAll(_j(a_new, d_b_ret)).unionByName(_j(a_new, d_b_ins))
    )


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
    merge_schema: bool = False,
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
    rate instead of the table size.

    r14 VERDICT task 7: version ranges containing an OVERWRITE commit
    no longer fail — the manifest diff yields an (insert, retract)
    pair per table and maintenance routes through the full
    retract+insert rule (``maintain_join_rw``); append-only ranges
    keep the cheaper insert-only plan (no exceptAll stages)."""
    from cubert_spark import catalog

    a_old = catalog.tx_read(spark, a_path, version=a_from,
                            merge_schema=merge_schema)
    b_old = catalog.tx_read(spark, b_path, version=b_from,
                            merge_schema=merge_schema)
    d_a_ins, d_a_ret = tx_delta_rw(spark, a_path, a_from, a_to, merge_schema)
    d_b_ins, d_b_ret = tx_delta_rw(spark, b_path, b_from, b_to, merge_schema)

    # route on the MANIFESTS (tiny JSON reads), not on the data: an
    # append-only range keeps the insert-only plan with no exceptAll
    # stages at all
    def _has_retracts(path, lo, hi):
        f_lo = set(catalog.tx_files(path, lo))
        hi_v = catalog.tx_versions(path)[-1] if hi is None else hi
        return not f_lo <= set(catalog.tx_files(path, hi_v))

    if not _has_retracts(a_path, a_from, a_to) and not _has_retracts(
        b_path, b_from, b_to
    ):
        return maintain_join(j_old, a_old, b_old, d_a_ins, d_b_ins, on)
    return maintain_join_rw(
        j_old, a_old, b_old, d_a_ins, d_a_ret, d_b_ins, d_b_ret, on
    )
