"""Physical / lifecycle operator queries: the inventory rows whose
operators are side-effecting or plan-level (TEE, VALIDATE, MULTIPASS,
BLOCKGEN + LOAD BLOCK, VIRTUAL input, batch transform) — each still
declared as a DataFrame query with a DuckDB oracle so the driver's
correctness gate covers them.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cubert_spark.catalog import load_table


def q_tee_split(spark: SparkSession, sf: str) -> DataFrame:
    """TEE WITH SPLIT: side-write urgent orders, return the main flow
    minus the teed rows (complementary filters over one logical scan).
    The oracle checks the returned (main) relation."""
    from cubert_spark.operators import tee

    o = load_table(spark, sf, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    side = os.path.join(tempfile.gettempdir(), "cubert_q_tee")
    return tee(
        o, side, predicate=F.col("o_orderpriority") == "1-URGENT", split=True
    )


SQL_TEE_SPLIT = """
SELECT o_orderkey, o_orderpriority, o_totalprice
FROM orders WHERE o_orderpriority <> '1-URGENT'
"""


def q_validate(spark: SparkSession, sf: str) -> DataFrame:
    """VALIDATE: runtime partition/sort verification is an identity on
    conforming data — the query is the validated relation itself."""
    from cubert_spark.operators.blockgen import BlockSpec, repartition_blocks
    from cubert_spark.operators.pivot import validate

    n = load_table(spark, sf, "nation")
    blocks = repartition_blocks(
        n, BlockSpec(partition_keys=("n_regionkey",), sort_keys=("n_nationkey",), num_buckets=4)
    )
    return validate(
        blocks, partitioned_on=["n_regionkey"], sorted_on=["n_nationkey"]
    ).select("n_nationkey", "n_name", "n_regionkey")


SQL_VALIDATE = "SELECT n_nationkey, n_name, n_regionkey FROM nation"


def q_multipass(spark: SparkSession, sf: str) -> DataFrame:
    """MULTIPASS: two derivations over one persisted input, gathered —
    Cubert's multiple operator chains over a pivoted block."""
    from cubert_spark.operators import gather
    from cubert_spark.operators.pivot import multipass

    o = load_table(spark, sf, "orders").select("o_orderkey", "o_orderpriority")
    hi, lo = multipass(
        o,
        lambda d: d.filter(F.col("o_orderpriority") == "1-URGENT"),
        lambda d: d.filter(F.col("o_orderpriority") == "5-LOW"),
    )
    out = gather(hi, lo)
    o.unpersist()
    return out


SQL_MULTIPASS = """
SELECT o_orderkey, o_orderpriority FROM orders
WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
"""


def q_transform_batches(spark: SparkSession, sf: str) -> DataFrame:
    """User TupleOperator/BlockOperator (mapInPandas over Arrow
    batches): a Python per-batch kernel, oracle = the SQL closed form."""
    from cubert_spark.functions.udf import transform_batches

    def kernel(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf["key_mod"] = pdf.o_orderkey % 7
            yield pdf[["o_orderkey", "key_mod"]]

    o = load_table(spark, sf, "orders").select("o_orderkey")
    return transform_batches(o, kernel, "o_orderkey long, key_mod long")


SQL_TRANSFORM_BATCHES = """
SELECT o_orderkey, o_orderkey % 7 AS key_mod FROM orders
"""


def q_virtual(spark: SparkSession, sf: str) -> DataFrame:
    """VIRTUAL input (VirtualStorage.java:43): n synthetic rows from no
    backing file -> spark.range."""
    return spark.range(1, 101).select(
        F.col("id").alias("n"), (F.col("id") * F.col("id")).alias("n_sq")
    )


SQL_VIRTUAL = """
SELECT CAST(range AS BIGINT) AS n, CAST(range * range AS BIGINT) AS n_sq
FROM range(1, 101)
"""


def q_blockgen_join(spark: SparkSession, sf: str) -> DataFrame:
    """BLOCKGEN BY INDEX + LOAD BLOCK MATCHING: write orders and
    lineitem as co-bucketed tables (same BlockSpec = BY INDEX), then
    merge-join them block-to-block — the plan joins bucket-to-bucket
    with no exchange on either side (asserted in test_plans); the
    oracle checks the join RESULT."""
    from cubert_spark.operators.blockgen import BlockSpec, blockgen, load_block

    o = load_table(spark, sf, "orders").select("o_orderkey", "o_orderpriority")
    li = load_table(spark, sf, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
    )
    spec = BlockSpec(partition_keys=("o_orderkey",), sort_keys=(), num_buckets=8)
    blockgen(o, "q_bg_orders", spec)
    blockgen(li, "q_bg_lineitem", spec)  # BY INDEX: same spec
    a = load_block(spark, "q_bg_orders")
    b = load_block(spark, "q_bg_lineitem")
    return (
        a.join(b, "o_orderkey")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            # sum exactly in DECIMAL, then emit double: the sums are
            # integer-valued and << 2^53, so the double is exact and both
            # engines' canonicalizers converge (raw DECIMAL objects don't)
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("string")
            .cast("double")
            .alias("qty"),
        )
    )


SQL_BLOCKGEN_JOIN = """
SELECT o_orderpriority, COUNT(*) AS n,
       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS qty
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


QUERIES = {
    "tee_split": q_tee_split,
    "validate": q_validate,
    "multipass": q_multipass,
    "transform_batches": q_transform_batches,
    "virtual": q_virtual,
    "blockgen_join": q_blockgen_join,
}

ORACLES = {
    "tee_split": SQL_TEE_SPLIT,
    "validate": SQL_VALIDATE,
    "multipass": SQL_MULTIPASS,
    "transform_batches": SQL_TRANSFORM_BATCHES,
    "virtual": SQL_VIRTUAL,
    "blockgen_join": SQL_BLOCKGEN_JOIN,
}
