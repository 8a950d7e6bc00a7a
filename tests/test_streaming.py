"""Streaming surface tests: batch/stream equivalence (the design rule
in streaming.windows) + stateful op plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cubert_spark.catalog import load_table
from cubert_spark.streaming import (
    read_parquet_stream,
    run_to_memory,
    running_counts,
    session_agg,
    tumbling_agg,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """Replay the events table as a 3-file parquet directory (3
    micro-batches under maxFilesPerTrigger=1)."""
    out = str(tmp_path_factory.mktemp("events_stream"))
    load_table(spark, SF, "events").repartition(3).write.mode("overwrite").parquet(out)
    return out


def _batch_events(spark, path):
    return spark.read.parquet(path)


def test_tumbling_batch_stream_parity(spark, events_dir):
    batch = _batch_events(spark, events_dir)
    aggs = [F.count(F.lit(1)).alias("n"), F.sum("value").alias("sv")]
    expected = {
        (r["w"]["start"], r["event_type"]): (r["n"], round(r["sv"], 6))
        for r in tumbling_agg(batch, "ts", "1 hour", ["event_type"], aggs).collect()
    }
    stream = read_parquet_stream(spark, events_dir, batch.schema, max_files_per_trigger=1)
    got_df = run_to_memory(
        tumbling_agg(stream, "ts", "1 hour", ["event_type"], aggs, watermark="2 hours"),
        "tumbling_test",
    )
    got = {
        (r["w"]["start"], r["event_type"]): (r["n"], round(r["sv"], 6))
        for r in got_df.collect()
    }
    assert got == expected


def test_session_window_stream(spark, events_dir):
    batch = _batch_events(spark, events_dir)
    aggs = [F.count(F.lit(1)).alias("n")]
    expected = session_agg(batch, "ts", "30 minutes", ["user_id"], aggs).count()
    stream = read_parquet_stream(spark, events_dir, batch.schema)
    got = run_to_memory(
        session_agg(stream, "ts", "30 minutes", ["user_id"], aggs, watermark="1 hour"),
        "session_test",
    )
    assert got.count() == expected


def test_running_counts_stateful(spark, events_dir):
    batch = _batch_events(spark, events_dir)
    expected = {
        r["event_type"]: r["n"]
        for r in batch.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    stream = read_parquet_stream(spark, events_dir, batch.schema, max_files_per_trigger=1)
    out = run_to_memory(running_counts(stream), "stateful_test", output_mode="update")
    # update mode emits one row per key per micro-batch; the max total
    # per key is the final running count
    finals = {
        r["key"]: r["mx"]
        for r in out.groupBy("key").agg(F.max("total").alias("mx")).collect()
    }
    assert finals == expected
