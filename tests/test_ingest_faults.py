"""Fault-injection tests for the state-reading streaming sinks.

Two failure classes, each with a documented required direction:

1. **State-READ failure** (corrupt ledger/snapshot): the batch must
   ABORT (stream fails, retryable) — never fall back to "no state",
   which would admit duplicates (ingest_dedup / ingest_neardup) or
   overwrite the accumulated CDC state with one batch (stream_upsert).
2. **Crash BETWEEN the corpus and ledger writes**: the documented
   write order (corpus before ledger) must fail toward a recoverable
   duplicate on retry — never silent permanent loss (the reverse
   order's failure mode: ledgered-but-never-landed docs are rejected
   forever).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


def _corrupt_parquet_dir(d: str) -> None:
    """Replace every data file in a parquet dir with garbage bytes so
    any read of the directory raises, while the dir itself still
    exists (so the isdir probe takes the read path)."""
    for name in os.listdir(d):
        p = os.path.join(d, name)
        if os.path.isfile(p) and not name.startswith((".", "_")):
            os.remove(p)
    with open(os.path.join(d, "part-corrupt.parquet"), "wb") as f:
        f.write(b"this is not a parquet file")


def _docs_stream(spark, src: str, schema: str = "doc_id long, text string"):
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*")
    )


def test_ingest_dedup_corrupt_ledger_aborts(spark, tmp_path):
    """A ledger-read failure must fail the batch, NOT admit the whole
    batch as never-seen (which would permanently pollute the corpus
    with duplicates)."""
    from cubert_spark.streaming import ingest_dedup

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ledger = str(tmp_path / "ledger")
    spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "doc_id long, text string"
    ).coalesce(1).write.parquet(src + "/f1")
    ingest_dedup(_docs_stream(spark, src), out, ledger).awaitTermination()
    n_before = spark.read.parquet(out).count()
    assert n_before == 2

    _corrupt_parquet_dir(ledger)
    # duplicate content arrives; with a healthy ledger it would be
    # rejected — with a broken one the only safe outcome is ABORT
    spark.createDataFrame(
        [(10, "alpha")], "doc_id long, text string"
    ).coalesce(1).write.parquet(src + "/f2")
    q = ingest_dedup(_docs_stream(spark, src), out, ledger)
    with pytest.raises(Exception):
        q.awaitTermination()
    assert spark.read.parquet(out).count() == n_before  # nothing admitted


def test_stream_upsert_corrupt_snapshot_aborts_no_state_loss(spark, tmp_path):
    """A snapshot-read failure must fail the batch, NOT treat it as
    first-batch and overwrite the accumulated CDC state with just the
    current batch (silent total state loss)."""
    from cubert_spark.streaming.ingest import stream_upsert

    schema = "k long, ts long, op string, v double"
    src = str(tmp_path / "cdc_src")
    snap = str(tmp_path / "cdc_snap")
    spark.createDataFrame(
        [(1, 10, "upsert", 1.0), (2, 11, "upsert", 2.0)], schema
    ).coalesce(1).write.parquet(src + "/b1")

    def run():
        return stream_upsert(
            _docs_stream(spark, src, schema), snap,
            key_cols=["k"], seq_cols=["ts"], op_col="op",
            delete_ops=["delete"], payload_cols=["v"],
        )

    run().awaitTermination()
    assert spark.read.parquet(snap).count() == 2

    _corrupt_parquet_dir(snap)
    sentinel = os.path.join(snap, "part-corrupt.parquet")
    spark.createDataFrame([(3, 12, "upsert", 3.0)], schema).coalesce(
        1
    ).write.parquet(src + "/b2")
    q = run()
    with pytest.raises(Exception):
        q.awaitTermination()
    # the overwrite never ran: the (corrupt) state dir was not
    # replaced by a batch-only snapshot
    assert os.path.exists(sentinel)


def test_ingest_neardup_corrupt_ledger_aborts(spark, tmp_path):
    """Same contract for the near-dup band ledger: read failure means
    abort, not rule-(1)-silently-disabled."""
    from cubert_spark.streaming.ingest import ingest_neardup

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ledger = str(tmp_path / "ledger")
    text = "the quick brown fox jumps over the lazy dog " * 3
    spark.createDataFrame(
        [(1, text)], "doc_id long, text string"
    ).coalesce(1).write.parquet(src + "/f1")
    ingest_neardup(
        _docs_stream(spark, src), out, ledger, num_hashes=8, band_size=2
    ).awaitTermination()
    n_before = spark.read.parquet(out).count()
    assert n_before == 1

    _corrupt_parquet_dir(ledger)
    spark.createDataFrame(
        [(2, text + "extra")], "doc_id long, text string"
    ).coalesce(1).write.parquet(src + "/f2")
    q = ingest_neardup(
        _docs_stream(spark, src), out, ledger, num_hashes=8, band_size=2
    )
    with pytest.raises(Exception):
        q.awaitTermination()
    assert spark.read.parquet(out).count() == n_before


def _arm_ledger_crash(monkeypatch, ledger_dir: str) -> dict:
    """Monkeypatch DataFrameWriter.parquet to raise on the FIRST write
    targeting ``ledger_dir`` — simulating a crash after the corpus
    append but before the ledger append (foreachBatch callbacks run
    driver-side in this Python process, so the patch is in scope)."""
    from pyspark.sql.readwriter import DataFrameWriter

    orig = DataFrameWriter.parquet
    state = {"armed": True}

    def patched(self, path, *a, **kw):
        if state["armed"] and os.path.abspath(path) == os.path.abspath(ledger_dir):
            state["armed"] = False
            raise RuntimeError("injected crash before ledger write")
        return orig(self, path, *a, **kw)

    monkeypatch.setattr(DataFrameWriter, "parquet", patched)
    return state


def test_ingest_dedup_crash_before_ledger_recovers_as_duplicate(
    spark, tmp_path, monkeypatch
):
    """Crash between corpus append and ledger append, then restart:
    the retried batch re-admits its docs (duplicate rows in the
    corpus — recoverable by exact dedup) and NEVER loses a doc. The
    reverse write order would fail the other way: ledgered docs that
    never landed are rejected forever."""
    from cubert_spark.streaming import ingest_dedup

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ledger = str(tmp_path / "ledger")
    spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "doc_id long, text string"
    ).coalesce(1).write.parquet(src + "/f1")

    state = _arm_ledger_crash(monkeypatch, ledger)
    q = ingest_dedup(_docs_stream(spark, src), out, ledger)
    with pytest.raises(Exception):
        q.awaitTermination()
    assert not state["armed"]  # the injected crash actually fired
    # crash state: corpus written, ledger missing
    assert spark.read.parquet(out).count() == 2
    assert not os.path.isdir(ledger)

    # restart (checkpoint-less run re-reads the file): duplicates are
    # admitted — the recoverable direction — and nothing is lost
    ingest_dedup(_docs_stream(spark, src), out, ledger).awaitTermination()
    got = spark.read.parquet(out)
    assert got.count() == 4  # each doc twice: duplicate, not loss
    assert set(r.text for r in got.collect()) == {"alpha", "beta"}
    # exact dedup recovers the clean corpus
    assert got.dropDuplicates(["text"]).count() == 2
    # and the ledger is now consistent: a further novel+dup batch
    # admits only the novel doc
    spark.createDataFrame(
        [(3, "alpha"), (4, "gamma")], "doc_id long, text string"
    ).coalesce(1).write.parquet(src + "/f2")
    ingest_dedup(_docs_stream(spark, src), out, ledger).awaitTermination()
    texts = sorted(r.text for r in spark.read.parquet(out).collect())
    assert texts == ["alpha", "alpha", "beta", "beta", "gamma"]


def test_ingest_neardup_crash_before_ledger_recovers_as_duplicate(
    spark, tmp_path, monkeypatch
):
    """Same crash point for the near-dup sink: retry re-admits
    (duplicate, recoverable), never permanently rejects an unlanded
    doc."""
    from cubert_spark.streaming.ingest import ingest_neardup

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ledger = str(tmp_path / "ledger")
    text = "pack my box with five dozen liquor jugs " * 3
    spark.createDataFrame(
        [(1, text)], "doc_id long, text string"
    ).coalesce(1).write.parquet(src + "/f1")

    state = _arm_ledger_crash(monkeypatch, ledger)
    q = ingest_neardup(
        _docs_stream(spark, src), out, ledger, num_hashes=8, band_size=2
    )
    with pytest.raises(Exception):
        q.awaitTermination()
    assert not state["armed"]
    assert spark.read.parquet(out).count() == 1
    assert not os.path.isdir(ledger)

    ingest_neardup(
        _docs_stream(spark, src), out, ledger, num_hashes=8, band_size=2
    ).awaitTermination()
    got = spark.read.parquet(out)
    assert got.count() == 2  # duplicate, not loss
    assert got.dropDuplicates(["text"]).count() == 1


# ---------------------------------------------------------------------------
# state_exists: the FS-agnostic probe all four state-reading sinks use
# (r9 VERDICT #2: os.path.isdir is always False on hdfs://s3a:// — it
# would silently admit every duplicate / clobber CDC state at scale)
# ---------------------------------------------------------------------------


def test_state_exists_local_semantics(spark, tmp_path):
    """Missing path = no state; dir with only _SUCCESS/.crc droppings
    (failed or empty first write) = no state; dir with a data file or
    a partition subdir = state; explicit file:// scheme resolves."""
    from cubert_spark.streaming.ingest import state_exists

    d = tmp_path / "state"
    assert state_exists(spark, str(d)) is False

    d.mkdir()
    (d / "_SUCCESS").write_bytes(b"")
    (d / ".part-0.crc").write_bytes(b"x")
    assert state_exists(spark, str(d)) is False  # schemaless first-append

    (d / "part-00000.parquet").write_bytes(b"x")
    assert state_exists(spark, str(d)) is True
    assert state_exists(spark, "file://" + str(d)) is True

    part = tmp_path / "partitioned"
    part.mkdir()
    (part / "win_start=2024-01-01").mkdir()
    # an EMPTY partition dir is still no-state (reading it would
    # throw schema inference and wedge the stream); a data file one
    # level down flips it
    assert state_exists(spark, str(part)) is False
    (part / "win_start=2024-01-01" / "part-0.parquet").write_bytes(b"x")
    assert state_exists(spark, str(part)) is True

    # an internal _-prefixed PARTITION dir is descended, not treated
    # as a dropping (stream_upsert's bucketed state under __bucket=N)
    bpart = tmp_path / "bucketed"
    bpart.mkdir()
    (bpart / "__bucket=3").mkdir()
    assert state_exists(spark, str(bpart)) is False
    (bpart / "__bucket=3" / "part-0.parquet").write_bytes(b"x")
    assert state_exists(spark, str(bpart)) is True


def test_state_exists_nonlocal_scheme_raises_not_false(spark):
    """An unreachable hdfs:// URI must raise LOUDLY (batch aborts,
    stream retries) — returning False here is exactly the silent
    duplicate-admission / state-clobber bug the probe exists to
    prevent."""
    from cubert_spark.streaming.ingest import state_exists

    with pytest.raises(Exception):
        state_exists(spark, "hdfs://no-such-namenode:8020/ledger")


def test_ingest_dedup_schemaless_state_dir_treated_as_empty(spark, tmp_path):
    """A bare state dir left by a failed first write must behave as
    first-batch (admit everything), not wedge the stream on parquet
    schema inference."""
    from cubert_spark.streaming import ingest_dedup

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ledger = tmp_path / "ledger"
    ledger.mkdir()
    (ledger / "_SUCCESS").write_bytes(b"")

    spark.createDataFrame(
        [(1, "aa"), (2, "bb")], "doc_id long, text string"
    ).coalesce(1).write.parquet(src + "/f1")
    ingest_dedup(_docs_stream(spark, src), out, str(ledger)).awaitTermination()
    assert spark.read.parquet(out).count() == 2
    assert spark.read.parquet(str(ledger)).count() == 2


def test_ledger_antijoin_never_shuffles_the_ledger(spark, tmp_path):
    """The per-batch "minus already-seen" step must broadcast the
    BATCH's key set and stream the ledger (BHJ both stages) — a plain
    left_anti would sort-merge and shuffle the unbounded ledger every
    batch. Pinned on the physical plan: broadcast joins only, zero
    exchanges on the ledger scan subtree, and the row semantics match
    the naive anti-join."""
    from pyspark.sql import functions as F

    from cubert_spark.plans.assertions import explain_str
    from cubert_spark.streaming.ingest import ledger_antijoin

    ld = str(tmp_path / "ledger")
    spark.range(0, 1000).select(
        F.md5(F.col("id").cast("string")).alias("h")
    ).write.parquet(ld)
    seen = spark.read.parquet(ld).select(F.col("h").alias("__h"))
    b = spark.range(990, 1010).select(
        F.col("id").alias("doc_id"),
        F.md5(F.col("id").cast("string")).alias("__h"),
    )
    fresh = ledger_antijoin(b, seen)
    plan = explain_str(fresh, "simple")
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 2
    got = sorted(r.doc_id for r in fresh.collect())
    assert got == list(range(1000, 1010))  # ids 990..999 are ledgered


def test_reject_by_bands_broadcast_probe_plan(spark, tmp_path):
    """With broadcast_bands=True (the streaming sink's setting) the
    rule-(1) ledger probe is a broadcast hash join building on the
    batch's bands — the accumulated band ledger is scanned, not
    sort-merge shuffled, every batch. Semantics unchanged vs the
    default."""
    from pyspark.sql import functions as F

    from cubert_spark.datapipe.dedup import reject_by_bands
    from cubert_spark.plans.assertions import explain_str

    ld = str(tmp_path / "band_ledger")
    spark.range(0, 500).select(
        (F.col("id") % 4).alias("band_idx"),
        F.md5(F.col("id").cast("string")).alias("band_key"),
        F.col("id").alias("doc_id"),
    ).write.parquet(ld)
    ledger = spark.read.parquet(ld)
    bands = spark.range(498, 503).select(
        (F.col("id") % 4).alias("band_idx"),
        F.md5(F.col("id").cast("string")).alias("band_key"),
        (F.col("id") + 1000).alias("doc_id"),
    )
    hinted = reject_by_bands(bands, "doc_id", ledger, broadcast_bands=True)
    plan = explain_str(hinted, "simple")
    assert "BroadcastHashJoin" in plan
    # identical rejected set either way
    plain = reject_by_bands(bands, "doc_id", ledger)
    assert sorted(r.doc_id for r in hinted.collect()) == sorted(
        r.doc_id for r in plain.collect()
    )


def test_stream_upsert_bucket_count_change_raises(spark, tmp_path):
    """Restarting a bucketed CDC stream with a different n_buckets
    (or dropping/adding bucketing) must raise up front: a key's
    bucket moves under the new count, the prune filter would skip its
    old bucket, and stale rows would survive forever — silently."""
    from cubert_spark.streaming.ingest import stream_upsert

    schema = "k long, ts long, op string, v double"
    src = str(tmp_path / "src")
    snap = str(tmp_path / "snap")
    spark.createDataFrame(
        [(1, 10, "upsert", 1.0), (2, 11, "upsert", 2.0)], schema
    ).coalesce(1).write.parquet(src + "/b1")

    def run(n_buckets):
        return stream_upsert(
            _docs_stream(spark, src, schema), snap,
            key_cols=["k"], seq_cols=["ts"], op_col="op",
            delete_ops=["delete"], payload_cols=["v"],
            n_buckets=n_buckets,
        )

    run(4).awaitTermination()
    assert os.path.isfile(os.path.join(snap, "_n_buckets=4"))

    spark.createDataFrame([(3, 12, "upsert", 3.0)], schema).coalesce(
        1
    ).write.parquet(src + "/b2")
    # changed count: abort before touching state
    q = run(8)
    with pytest.raises(Exception):
        q.awaitTermination()
    # bucketed state without n_buckets: also abort
    q = run(None)
    with pytest.raises(Exception):
        q.awaitTermination()
    # matching count proceeds (replays b1+b2 — checkpoint-less rerun)
    run(4).awaitTermination()
    ks = sorted(r.k for r in spark.read.parquet(snap).collect())
    assert ks == [1, 2, 3]


def test_bucket_marker_loss_and_conflicts_raise(spark, tmp_path):
    """The three r10-ADVICE marker gaps, closed: (1) a lost marker
    over bucketed state must NOT be silently re-planted with whatever
    count the caller passed; (2) two different-count markers (racing
    writers — create-exclusive only collides on the same filename)
    are ambiguous and refuse; (3) n_buckets over pre-existing
    UNBUCKETED data raises up front with the rebuild recipe, before
    planting anything."""
    from cubert_spark.streaming.ingest import _bucket_marker

    # (1) lost marker: __bucket= dirs present, no _n_buckets= file
    lost = tmp_path / "lost"
    (lost / "__bucket=0").mkdir(parents=True)
    with pytest.raises(ValueError, match="marker is missing"):
        _bucket_marker(spark, str(lost), 4)
    # and nothing was planted by the failed call
    assert not list(lost.glob("_n_buckets=*"))

    # (2) two conflicting markers: refuse for ANY n_buckets argument
    dup = tmp_path / "dup"
    dup.mkdir()
    (dup / "_n_buckets=4").touch()
    (dup / "_n_buckets=8").touch()
    for nb in (4, 8, None):
        with pytest.raises(ValueError, match="conflicting bucket-count"):
            _bucket_marker(spark, str(dup), nb)

    # (3) unbucketed data + n_buckets: raise BEFORE planting a marker
    unb = tmp_path / "unb"
    spark.createDataFrame([(1, 1.0)], "k long, v double").coalesce(
        1
    ).write.parquet(str(unb))
    with pytest.raises(ValueError, match="UNBUCKETED data"):
        _bucket_marker(spark, str(unb), 4, has_state=True)
    assert not list(unb.glob("_n_buckets=*"))

    # clean first write still plants exactly one marker and proceeds
    fresh = tmp_path / "fresh"
    _bucket_marker(spark, str(fresh), 4, has_state=False)
    assert [p.name for p in fresh.glob("_n_buckets=*")] == ["_n_buckets=4"]
    _bucket_marker(spark, str(fresh), 4, has_state=True)  # idempotent
