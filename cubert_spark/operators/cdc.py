"""Change-data-capture compaction: apply a changelog to produce the
latest-wins current snapshot (the MERGE/upsert half of a lakehouse
table maintenance pipeline; the reference's closest analog is the
incremental LOAD date-range + summary-rewrite machinery, which
maintains aggregates — this maintains the base table itself).

Design: latest-record-per-key is a single combiner-friendly keyed
aggregation over a packed (seq..., payload...) struct — Spark's
``max(struct)`` compares fields left-to-right, so putting the sequence
columns first makes the max BE the latest record. No window function:
a window over the changelog would sort every key group; the struct-max
agg does one map-side partial per key and never materializes groups,
so a hot key (a row updated millions of times) costs one struct per
partition, not a sorted buffer.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def apply_changelog(
    df: DataFrame,
    key_cols: Sequence[str],
    seq_cols: Sequence[str],
    op_col: str,
    delete_ops: Sequence[str],
    payload_cols: Sequence[str],
) -> DataFrame:
    """Compact a changelog into the current snapshot.

    For each distinct ``key_cols`` value, the record with the highest
    ``seq_cols`` (compared lexicographically, so pass e.g.
    ``("ts", "event_id")`` with a unique tiebreaker last) wins; if its
    ``op_col`` value is in ``delete_ops`` the key is absent from the
    output (a tombstone). Output columns: keys, ``last_<seq>`` for
    each seq col, ``last_op``, ``last_<payload>`` for each payload
    col, and ``n_changes`` (total changelog records seen for the key).

    ``seq_cols`` must order records totally within a key (include a
    unique id as the final tiebreaker) — otherwise "latest" is
    ambiguous in ANY engine.

    Scale shape: ONE shuffle on the key with map-side partial
    aggregation; skew-safe (see module docstring). Equivalent SQL
    (the oracle form) is a row_number()=1 window — correct but
    sort-heavy; the struct-max agg is the scale spelling.
    """
    packed = F.struct(
        *[F.col(c).alias(f"__s_{c}") for c in seq_cols],
        F.col(op_col).alias("__op"),
        *[F.col(c).alias(f"__p_{c}") for c in payload_cols],
    )
    g = df.groupBy(*[F.col(c) for c in key_cols]).agg(
        F.max(packed).alias("__last"),
        F.count(F.lit(1)).alias("n_changes"),
    )
    if delete_ops:
        g = g.filter(~F.col("__last.__op").isin(*delete_ops))
    return g.select(
        *key_cols,
        *[F.col(f"__last.__s_{c}").alias(f"last_{c}") for c in seq_cols],
        F.col("__last.__op").alias("last_op"),
        *[F.col(f"__last.__p_{c}").alias(f"last_{c}") for c in payload_cols],
        "n_changes",
    )
