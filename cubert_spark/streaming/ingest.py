"""Incremental corpus ingest: stream documents in, keep only
never-seen-before content, append the clean corpus — the streaming
form of the batch exact-dedup stage.

Cross-batch "have I seen this content" state lives in a compact
parquet hash LEDGER on storage, not in executor memory: restart-safe,
unbounded-corpus-safe (the ledger row is 32 bytes/doc — 100 TB of
documents is a few hundred GB of ledger, an anti-join-able side), and
shared by any number of ingest streams pointed at the same ledger.
Contrast ``windows.dedup_stream``: that holds watermark-bounded keys
in state-store memory and FORGETS them past the horizon — right for
replay-window dedup, wrong for corpus-lifetime dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ingest_dedup(
    stream_df: DataFrame,
    out_dir: str,
    ledger_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """foreachBatch exact-dedup ingest. Per micro-batch: (1) hash
    content; (2) within-batch first-wins (min id per hash — a keyed
    agg, deterministic under any partitioning); (3) anti-join the
    ledger; (4) append survivors to ``out_dir`` and their hashes to
    ``ledger_dir``. Returns the started streaming query handle
    (availableNow trigger — call ``awaitTermination()``).
    """

    def update(batch_df: DataFrame, _batch_id: int) -> None:
        spark = batch_df.sparkSession
        hashed = batch_df.withColumn("__h", F.md5(F.col(text_col)))
        winners = hashed.groupBy("__h").agg(F.min(id_col).alias(id_col))
        b = hashed.join(winners, ["__h", id_col])
        try:
            seen = spark.read.parquet(ledger_dir).select(F.col("h").alias("__h"))
            fresh = b.join(seen, "__h", "left_anti")
        except Exception:  # first batch: no ledger yet
            fresh = b
        # MUST cut lineage before writing: the ledger append below is
        # read BY fresh's own plan, so a lazy recompute on the second
        # write would anti-join against the just-updated ledger and
        # silently drop this batch's survivors from the corpus.
        fresh = fresh.localCheckpoint(eager=True)
        fresh.select(F.col("__h").alias("h")).write.mode("append").parquet(ledger_dir)
        fresh.drop("__h").write.mode("append").parquet(out_dir)

    return (
        stream_df.writeStream.foreachBatch(update)
        .trigger(availableNow=True)
        .start()
    )
