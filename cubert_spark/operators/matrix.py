"""Blocked sparse-matrix multiplication (SURVEY.md §1.1 graph/matrix
support: CollateVectorBlockOperator.java:45 + vector blocks).

Cubert collates 'vector blocks' against a metadata block to multiply
blocked sparse matrices; the declarative form is a join on the inner
dimension + groupBy(sum) — Catalyst plans the same co-partitioned
dataflow when the inputs are bucketed on the join key (blockgen).
COO layout: (i, j, v).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sparse_matmul(
    a: DataFrame,
    b: DataFrame,
    acc_type: str = "decimal(30,6)",
) -> DataFrame:
    """C = A x B for COO matrices with columns (i, j, v).

    The accumulation runs in DECIMAL by default: exact, and therefore
    independent of partial-aggregation order (floating sums would vary
    run to run at scale). The final decimal->double cast routes
    through the decimal's string so the double is bit-identical across
    engines at any magnitude (the r13 dsum rule, queries/_util.py).
    Shuffles: one on the inner dimension (the join), one on (i, j)
    for the final sum — broadcast the small side to drop to one.
    """
    al = a.select(F.col("i"), F.col("j").alias("k"), F.col("v").alias("va"))
    bl = b.select(F.col("i").alias("k"), F.col("j"), F.col("v").alias("vb"))
    prod = al.join(bl, "k").select(
        "i", "j", (F.col("va") * F.col("vb")).cast(acc_type).alias("p")
    )
    return prod.groupBy("i", "j").agg(
        F.sum("p").cast("string").cast("double").alias("v")
    )


def vector_block_multiply(
    matrix: DataFrame, vector: DataFrame, acc_type: str = "decimal(30,6)"
) -> DataFrame:
    """y = A x v for COO matrix (i, j, v) and vector (j, v) — the
    CollateVectorBlock use case. Vector broadcasts when small."""
    vl = F.broadcast(vector.select(F.col("j"), F.col("v").alias("vx")))
    prod = matrix.join(vl, "j").select(
        "i", (F.col("v") * F.col("vx")).cast(acc_type).alias("p")
    )
    return prod.groupBy("i").agg(
        F.sum("p").cast("string").cast("double").alias("v")
    )
