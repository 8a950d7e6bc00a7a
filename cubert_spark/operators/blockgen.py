"""BLOCKGEN / LOAD BLOCK — partitioned-sorted dataset interchange
(SURVEY.md §2.7, §1.1).

Cubert's core data-organization idea: materialize a relation as
partitioned-and-sorted blocks so downstream joins/aggregations run
without re-shuffling (CreateBlockOperator.java:42, RubixFile footer
index Index.java:38, LOAD BLOCK MATCHING LoadBlockOperator.java:37).

Spark-first translation: **bucketed, sorted Parquet tables**
(``bucketBy(n, keys).sortBy(keys)``). The bucket spec IS the block
spec; the metastore bucket metadata IS the footer index; and Spark's
bucketed-scan planning replaces BLOCK_INDEX_JOIN — two tables with the
same BlockSpec join shuffle-free, which is precisely MeshJoin's
LOAD BLOCK MATCHING contract.

At 100 TB: choose num_buckets so a bucket of the largest relation fits
an executor core's working set (the analog of Cubert's BY SIZE cost
function, CreateBlockOperator.java:44-81).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class BlockSpec:
    """BLOCKGEN ... PARTITIONED ON k SORTED ON s — the block contract.

    ``BY INDEX "rel"`` (copy another relation's block boundaries) ==
    reusing the same BlockSpec instance for a second table.
    """

    partition_keys: tuple[str, ...]
    sort_keys: tuple[str, ...] = ()
    num_buckets: int = 32

    def sorted_keys(self) -> tuple[str, ...]:
        return self.sort_keys or self.partition_keys


def blockgen(
    df: DataFrame,
    table: str,
    spec: BlockSpec,
    mode: str = "overwrite",
) -> None:
    """``BLOCKGEN x BY PARTITION KEY PARTITIONED ON k SORTED ON s`` ->
    bucketed+sorted managed table. Readers joining/aggregating on the
    partition keys get shuffle-free plans (storage-partitioned join).
    """
    if mode == "overwrite":
        spark = df.sparkSession
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        # a location left behind by a previous session's metastore
        # (fresh in-memory catalog, surviving warehouse dir) blocks
        # saveAsTable even in overwrite mode — clear it
        import shutil
        from urllib.parse import urlparse

        wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
        loc = os.path.join(wh, table.lower())
        if wh and os.path.isdir(loc):
            shutil.rmtree(loc, ignore_errors=True)
    (
        df.write.mode(mode)
        .bucketBy(spec.num_buckets, list(spec.partition_keys))
        .sortBy(list(spec.sorted_keys()))
        .format("parquet")
        .saveAsTable(table)
    )


def load_block(spark: SparkSession, table: str) -> DataFrame:
    """``LOAD BLOCK FROM "p" MATCHING x`` — read a blockgen'd table;
    co-bucketed tables align block-to-block in joins automatically."""
    return spark.table(table)


def repartition_blocks(
    df: DataFrame, spec: BlockSpec
) -> DataFrame:
    """In-flight BLOCKGEN (no materialization): hash-partition on the
    block keys and sort within partitions. Downstream merge-joins and
    streaming group-bys consume it without further exchange — Catalyst
    tracks outputPartitioning/outputOrdering the way Cubert tracks
    PostConditions."""
    out = df.repartition(spec.num_buckets, *spec.partition_keys)
    return out.sortWithinPartitions(*spec.sorted_keys())
