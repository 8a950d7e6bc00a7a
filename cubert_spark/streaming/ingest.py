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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def state_exists(spark, path: str) -> bool:
    """FS-agnostic "does cross-batch state exist with readable data"
    probe for the ledgers/snapshots below.

    ``os.path.isdir`` is ALWAYS False for ``hdfs://`` / ``s3a://`` /
    any non-local scheme — probing with it would silently treat
    accumulated state as absent on cluster storage: ``ingest_dedup``
    and ``ingest_neardup`` would admit every duplicate, and
    ``stream_upsert`` would clobber its whole CDC snapshot with the
    current batch, every batch. So the probe goes through the Hadoop
    FileSystem API, which resolves the path's own scheme (file://,
    hdfs://, s3a://, ...) against the session's Hadoop conf — the
    same resolution ``spark.read.parquet`` will use one line later.

    Semantics: a missing path is no-state; an existing directory with
    no data files (only ``_SUCCESS`` / ``.crc`` droppings from a
    failed or empty first write) is ALSO no-state — reading it would
    throw "unable to infer schema", wedging the stream permanently on
    a harmless empty dir. Any real listing/IO failure (permissions,
    transient FS error) RAISES so the batch aborts and the stream
    retries — defaulting to "no state" on error is exactly the silent
    duplicate-admission / state-clobber failure this function exists
    to prevent. (Reference analog: Cubert treats a missing cached
    file as a hard error — src/main/java/com/linkedin/cubert/utils/
    FileCache.java cache-miss path.)
    """
    jvm = spark._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    if not fs.exists(p):
        return False
    if not fs.getFileStatus(p).isDirectory():
        return True  # a plain file: state exists, reader validates it
    # DFS for one actual data FILE. A directory alone — even a
    # partition dir like __bucket=3/ or win_start=.../ — is not
    # enough: an empty partition dir (crashed write, manual cleanup)
    # would still make spark.read throw "unable to infer schema" and
    # wedge the stream, the exact failure this probe exists to
    # prevent. Partition dirs (col=value) are descended even when
    # _-prefixed (internal partition columns); other hidden entries
    # (_SUCCESS/_temporary/.crc) are droppings, not data. Early
    # return on the first file keeps the common case to one or two
    # listings.
    stack = [p]
    while stack:
        for st in fs.listStatus(stack.pop()):
            name = st.getPath().getName()
            if st.isDirectory():
                if "=" in name or not name.startswith(("_", ".")):
                    stack.append(st.getPath())
            elif not name.startswith(("_", ".")):
                return True
    return False


def ledger_antijoin(b: DataFrame, seen: DataFrame, key: str = "__h") -> DataFrame:
    """Batch-minus-ledger without ever shuffling the ledger.

    A plain ``b.join(seen, key, "left_anti")`` can only broadcast the
    RIGHT side, and the ledger is the unbounded one — Spark would
    sort-merge and SHUFFLE THE WHOLE LEDGER every micro-batch.
    Instead: probe ledger-side with the batch's key set broadcast
    (inner BHJ, build = batch keys — the ledger is scanned once,
    never shuffled), then anti-join the batch against the hit set
    (bounded by the batch, broadcast again). Plan-shape pinned by
    tests/test_ingest_faults.py.

    Contract: the broadcast sides are BATCH-sized, so the stream must
    bound its triggers (maxFilesPerTrigger / maxBytesPerTrigger) —
    an unbounded availableNow first run over a whole backlog is one
    giant batch, and a corpus-scale broadcast dies on Spark's
    broadcast limit (loud, but bound the trigger instead). The same
    contract covers reject_by_bands(broadcast_bands=True) and the
    F.broadcast(rejected) anti-joins in ingest_neardup."""
    bh = b.select(key).distinct()
    hits = seen.join(F.broadcast(bh), key).select(key).distinct()
    return b.join(F.broadcast(hits), key, "left_anti")


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
        # the missing-ledger case is an explicit FS-agnostic probe
        # (state_exists honors hdfs://s3a:// schemes), NOT a bare
        # except around the read: a transient read failure (corrupt
        # append, permissions) must ABORT the batch — swallowing it
        # would admit the whole batch as "never seen" and permanently
        # pollute the deduped corpus
        if state_exists(spark, ledger_dir):
            seen = spark.read.parquet(ledger_dir).select(F.col("h").alias("__h"))
            # ledger-shuffle-free: see ledger_antijoin (r10)
            fresh = ledger_antijoin(b, seen)
        else:  # first batch: no ledger yet
            fresh = b
        # MUST cut lineage before writing: the ledger append below is
        # read BY fresh's own plan, so a lazy recompute on the second
        # write would anti-join against the just-updated ledger and
        # silently drop this batch's survivors from the corpus.
        fresh = fresh.localCheckpoint(eager=True)
        # corpus BEFORE ledger (same rationale as ingest_neardup): a
        # crash between the writes must fail toward recoverable
        # duplicates, not silent loss
        fresh.drop("__h").write.mode("append").parquet(out_dir)
        fresh.select(F.col("__h").alias("h")).write.mode("append").parquet(ledger_dir)

    return (
        stream_df.writeStream.foreachBatch(update)
        .trigger(availableNow=True)
        .start()
    )


def _bucket_marker(spark, snapshot_dir: str, n_buckets, has_state: bool = False):
    """Enforce a stable bucket count for stream_upsert's bucketed
    state. The count is persisted as an empty hidden marker file
    ``_n_buckets=N`` (name IS the value — no content read needed;
    leading underscore hides it from Spark readers and from
    state_exists). Restarting with a different n_buckets would be
    SILENT corruption otherwise: a key's bucket moves, the prune
    filter skips its old bucket, and stale rows survive forever —
    so any mismatch (including bucketed-state-without-n_buckets and
    the reverse) raises before the batch touches anything.

    ``has_state``: caller's state_exists probe result — a marker is
    only planted into a dir with NO existing data. Three failure
    modes beyond the basic mismatch (r10 ADVICE), all raise:

    - marker LOST over bucketed state (``__bucket=`` partition dirs
      but no ``_n_buckets=``): re-planting the caller's count would
      re-introduce the silent-stranding corruption the marker exists
      to prevent — the operator must restore ``_n_buckets=<original>``
      (the dir names reveal bucketedness but not the original count).
    - more than one ``_n_buckets=`` marker (two writers raced with
      DIFFERENT counts — create-exclusive only collides on the same
      filename): ambiguous layout, refuse rather than pick one. The
      planting path re-lists after createNewFile, so at least one of
      the racing writers fails its own batch too.
    - pre-existing UNBUCKETED data + ``n_buckets``: raise here, up
      front, with the rebuild recipe — not a confusing unresolved-
      ``__bucket`` AnalysisException halfway through the merge.
    """
    jvm = spark._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    d = jvm.org.apache.hadoop.fs.Path(snapshot_dir)
    fs = d.getFileSystem(conf)

    def _scan():
        """(sorted marker values, saw __bucket= partition dir). Reads
        markers whenever the DIR exists, not only when data does: a
        run that crashed after the marker write but before any data
        write must still pin later runs to the recorded count."""
        markers, bucket_dirs = [], False
        if fs.exists(d):
            for st in fs.listStatus(d):
                name = st.getPath().getName()
                if name.startswith("_n_buckets="):
                    markers.append(int(name.split("=", 1)[1]))
                elif st.isDirectory() and name.startswith("__bucket="):
                    bucket_dirs = True
        return sorted(set(markers)), bucket_dirs

    markers, bucket_dirs = _scan()
    if len(markers) > 1:
        raise ValueError(
            f"stream_upsert: conflicting bucket-count markers "
            f"{['_n_buckets=%d' % m for m in markers]} at {snapshot_dir} "
            "(two writers raced with different counts). The layout is "
            "ambiguous — inspect the __bucket= dirs, keep the marker "
            "matching the real layout, delete the other, and rerun."
        )
    found = markers[0] if markers else None
    if found is None and bucket_dirs:
        raise ValueError(
            f"stream_upsert: state at {snapshot_dir} has __bucket= "
            "partition dirs but its _n_buckets= marker is missing "
            "(lost marker). Re-planting a count here could silently "
            "strand rows if it differs from the original — restore "
            "the original marker file (_n_buckets=<original count>) "
            "and rerun."
        )
    if n_buckets is None:
        if found is not None:
            raise ValueError(
                f"stream_upsert: state at {snapshot_dir} is bucketed "
                f"(_n_buckets={found}); pass n_buckets={found} — running "
                "unbucketed against it would merge __bucket as a payload "
                "column and rewrite the whole layout."
            )
        return
    if found is not None and found != int(n_buckets):
        raise ValueError(
            f"stream_upsert: n_buckets={n_buckets} does not match the "
            f"state's recorded _n_buckets={found} at {snapshot_dir}. "
            "Changing the bucket count moves keys between buckets and "
            "silently strands their old rows; rebuild the state (read "
            "all, rewrite with the new count) instead."
        )
    if found is None:
        if has_state:
            raise ValueError(
                f"stream_upsert: n_buckets={n_buckets} requested but the "
                f"state at {snapshot_dir} already holds UNBUCKETED data "
                "(no _n_buckets marker, no __bucket= dirs). Rebuild the "
                "state under the new layout first: read it all, write "
                "with __bucket = pmod(xxhash64(keys), n_buckets) "
                "partitioning plus the marker, then resume the stream."
            )
        # first write: record the count. The dir may not exist yet
        # (first batch) — an empty dir + hidden marker still reads as
        # no-state in state_exists. createNewFile is create-exclusive,
        # but only against the SAME filename — re-list afterwards so a
        # racing writer with a DIFFERENT count is caught NOW (both
        # racers see both markers and at least one aborts its batch),
        # not picked arbitrarily by a later reader.
        fs.mkdirs(d)
        fs.createNewFile(
            jvm.org.apache.hadoop.fs.Path(d, f"_n_buckets={int(n_buckets)}")
        )
        markers, _ = _scan()
        if markers != [int(n_buckets)]:
            raise ValueError(
                f"stream_upsert: concurrent writers planted conflicting "
                f"bucket-count markers {markers} at {snapshot_dir}; "
                "resolve to one marker before resuming."
            )


def stream_upsert(
    stream_df: DataFrame,
    snapshot_dir: str,
    key_cols: list[str],
    seq_cols: list[str],
    op_col: str,
    delete_ops: list[str],
    payload_cols: list[str],
    n_buckets: int | None = None,
):
    """Streaming CDC apply: maintain a latest-wins state table from a
    changelog stream — the streaming form of
    ``operators.cdc.apply_changelog``.

    Correctness under CROSS-BATCH disorder: each batch compacts with
    the same struct-max agg, then FULL-OUTER merges against the
    persisted state comparing the packed sequence — a late batch
    carrying an older record can never regress a newer stored one.
    Tombstones are RETAINED in the state (op in ``delete_ops``), so a
    late pre-delete update cannot resurrect a deleted key; readers
    take ``spark.read.parquet(dir).filter(~col('last_op')
    .isin(deletes))`` as the live snapshot. n_changes accumulates
    across batches. The per-batch overwrite is the plain-parquet
    spelling; a lakehouse format turns it into a MERGE commit with the
    same steps 1-2.

    ``n_buckets`` is the 100 TB spelling: state partitioned by
    ``__bucket = pmod(xxhash64(keys), n_buckets)`` (key-deterministic,
    so a key lives in one bucket forever). Each batch then (1) reads
    ONLY the buckets its keys touch (partition pruning on the state
    scan), (2) merges, (3) dynamic-overwrites ONLY those buckets —
    per-batch IO is proportional to touched buckets, not total
    accumulated state, which is what makes a long-lived 100 TB CDC
    snapshot maintainable by a stream at all. The touched-bucket list
    is one bounded collect (<= n_buckets ints). Untouched buckets are
    never rewritten (pinned by test). Retry semantics match the
    unbucketed path: a replayed batch re-merges latest-wins
    idempotently except n_changes, which double-counts the replayed
    batch (same caveat either way; a tx-log sink fixes it).

    Returns the started query handle (availableNow trigger).
    """

    def bucket_of():
        return F.pmod(
            F.xxhash64(*[F.col(c) for c in key_cols]), F.lit(n_buckets)
        ).cast("int")

    def update(batch_df: DataFrame, _batch_id: int) -> None:
        from cubert_spark.operators.cdc import apply_changelog

        spark = batch_df.sparkSession
        # compact the batch, KEEPING tombstone rows (delete_ops=())
        b = apply_changelog(
            batch_df, key_cols, seq_cols, op_col, (), payload_cols
        )
        # missing-snapshot = explicit FS-agnostic probe (state_exists
        # honors hdfs://s3a:// schemes), NOT a bare except: a
        # transient snapshot-read failure here would set s=None and
        # the overwrite below would then replace the ENTIRE accumulated
        # CDC state with just this batch — silent total state loss.
        # Real read failures must abort the batch so the stream retries.
        present = state_exists(spark, snapshot_dir)
        # bucket-count contract BEFORE touching anything: a changed
        # n_buckets (or bucketed/unbucketed mismatch) must raise, not
        # silently strand rows in stale buckets
        _bucket_marker(spark, snapshot_dir, n_buckets, has_state=present)
        s = spark.read.parquet(snapshot_dir) if present else None
        if n_buckets is not None and s is not None:
            # b branches twice below (touched-bucket collect AND the
            # merge) — checkpoint once or Spark re-runs the changelog
            # compaction per branch (round-workflow rule)
            b = b.localCheckpoint(eager=True)
            # bounded collect: distinct buckets of this batch's keys
            touched = [
                r[0]
                for r in b.select(bucket_of().alias("__bucket"))
                .distinct()
                .collect()
            ]
            # partition pruning: the state scan reads only touched
            # buckets; untouched buckets are neither read nor written
            s = s.filter(F.col("__bucket").isin(touched)).drop("__bucket")
        if s is not None:
            bb = b.select(
                *key_cols,
                F.struct(*[F.col(f"last_{c}") for c in seq_cols]).alias("__bseq"),
                *[F.col(c).alias(f"__b_{c}") for c in b.columns if c not in key_cols],
            )
            ss = s.select(
                *key_cols,
                F.struct(*[F.col(f"last_{c}") for c in seq_cols]).alias("__sseq"),
                *[F.col(c).alias(f"__s_{c}") for c in s.columns if c not in key_cols],
            )
            j = ss.join(bb, list(key_cols), "full_outer")
            batch_wins = F.col("__sseq").isNull() | (
                F.col("__bseq").isNotNull() & (F.col("__bseq") > F.col("__sseq"))
            )
            value_cols = [c for c in b.columns if c not in key_cols and c != "n_changes"]
            out = j.select(
                *key_cols,
                *[
                    F.when(batch_wins, F.col(f"__b_{c}"))
                    .otherwise(F.col(f"__s_{c}"))
                    .alias(c)
                    for c in value_cols
                ],
                (
                    F.coalesce(F.col("__s_n_changes"), F.lit(0))
                    + F.coalesce(F.col("__b_n_changes"), F.lit(0))
                ).alias("n_changes"),
            )
        else:
            out = b
        # MUST cut lineage before overwriting the directory the plan reads
        if n_buckets is not None:
            out = out.withColumn("__bucket", bucket_of())
            out = out.localCheckpoint(eager=True)
            (
                out.write.partitionBy("__bucket")
                .option("partitionOverwriteMode", "dynamic")
                .mode("overwrite")
                .parquet(snapshot_dir)
            )
        else:
            out = out.localCheckpoint(eager=True)
            out.write.mode("overwrite").parquet(snapshot_dir)

    return (
        stream_df.writeStream.foreachBatch(update)
        .trigger(availableNow=True)
        .start()
    )


def ingest_embeddings(
    stream_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Incremental ANN-index ingestion: as embeddings stream in, each
    micro-batch assigns every vector to its IVF list (DECIMAL-exact
    argmax against FIXED centroid literals — similarity.
    ivf_assign_exact's rule, so streamed assignments match a batch
    build bit-for-bit) and appends to a parquet layout PARTITIONED BY
    list_id. Search then probes only its lists' partitions — the
    directory layout IS the inverted index, maintained by appends
    with no compaction step or global rebuild.

    Returns the started query handle (availableNow trigger). At
    scale: per-batch work is one codegen expression map + a
    partitioned append; no shuffle, no state store (assignment is
    stateless). Exactly-once under retries: each batch writes its own
    (list_id, batch_id) partitions with DYNAMIC partition overwrite,
    so a retry after a partial write replaces exactly the partitions
    that batch owns (assignment is deterministic, so the retry touches
    the same set) instead of appending duplicates. Readers probing
    ``list_id=J`` are unaffected — batch_id is just a sub-partition
    level under each list."""
    from cubert_spark.datapipe.similarity import _argmax_centroid

    def update(batch_df: DataFrame, batch_id: int) -> None:
        best_j, _ = _argmax_centroid(F.col(vec_col), centroids)
        (
            batch_df.withColumn("list_id", best_j)
            .withColumn("batch_id", F.lit(int(batch_id)))
            .write.partitionBy("list_id", "batch_id")
            .option("partitionOverwriteMode", "dynamic")
            .mode("overwrite")
            .parquet(out_dir)
        )

    return (
        stream_df.writeStream.foreachBatch(update)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def monitor_expectations(
    stream_df: DataFrame,
    rules: list,
    out_dir: str,
    checkpoint_dir: str,
):
    """Streaming data-quality monitoring: evaluate a
    datapipe.expectations rule suite on EVERY micro-batch and append
    the long-format violation report stamped with batch_id — the
    freshness-window quality dashboard feed. Aggregate rules
    (not_null / accepted_values / in_range) and foreign_key are
    row-local, so their per-batch counts are additive: any window's
    totals are one GROUP BY over this table. unique() is
    BATCH-SCOPED — it counts duplicates within each micro-batch, and
    a key straddling two batches is not seen; for corpus-lifetime
    uniqueness run the batch suite on the landed table (or dedup at
    ingest with ingest_dedup's ledger).

    Same exactly-once discipline as ingest_embeddings: each batch
    overwrites its own batch_id partition dynamically, so a retry
    replaces its partial report instead of double-counting.

    Per-batch cost is the batch-side plan of run_expectations (one
    fused agg + per-unique keyed agg + per-FK anti-join) — bounded by
    the micro-batch, no streaming state."""
    from cubert_spark.datapipe.expectations import run_expectations

    def update(batch_df: DataFrame, batch_id: int) -> None:
        (
            run_expectations(batch_df, rules)
            .withColumn("batch_id", F.lit(int(batch_id)))
            .write.partitionBy("batch_id")
            .option("partitionOverwriteMode", "dynamic")
            .mode("overwrite")
            .parquet(out_dir)
        )

    return (
        stream_df.writeStream.foreachBatch(update)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def windowed_topn(
    stream_df: DataFrame,
    ts_col: str,
    window: str,
    key_cols: list[str],
    k: int,
    out_dir: str,
    checkpoint_dir: str,
    watermark: str = "2 hours",
):
    """Streaming per-window top-k (trending items): tumbling-window
    counts per key, and when the watermark closes a window, rank its
    keys and persist the top ``k`` — the leaderboard feed no single
    streaming operator expresses (windowed aggregation cannot be
    followed by a rank in the same continuous query; Spark forbids
    stacking stateful operators there).

    Mechanics: the windowed count stream runs in APPEND mode, so a
    window's rows are all emitted in the one micro-batch where the
    watermark passes its end; foreachBatch ranks exactly the closed
    windows it received and dynamic-overwrites each window's
    partition (win_start) — retries rewrite the same partitions, so
    the sink is exactly-once like ingest_embeddings.

    Per-batch state is the window counts (bounded by watermark);
    the rank runs over at most |keys-per-window| rows per closed
    window.

    CAVEAT (one-shot backfills): append mode emits a window only when
    the watermark passes its END. With trigger(availableNow), windows
    whose end is still inside the watermark horizon when the input is
    exhausted stay open and are NOT written — a one-shot run over a
    finite source omits the newest ``watermark``-worth of windows by
    design (they'd be emitted by the next run once later data advances
    the watermark). For a complete point-in-time leaderboard over
    landed data, use the batch twin ``queries.events.q_windowed_topn``
    (same window algebra, no watermark withholding) — or call
    ``flush_open_windows`` with the landed source after the stream
    drains."""
    from cubert_spark.streaming.windows import tumbling_agg

    agg = tumbling_agg(
        stream_df, ts_col, window, key_cols,
        [F.count(F.lit(1)).alias("n")], watermark=watermark,
    )

    def update(batch_df: DataFrame, _batch_id: int) -> None:
        # write unconditionally: a dynamic overwrite of an empty frame
        # touches no partitions, and guarding with take(1) would
        # recompute the whole micro-batch a second time for the write
        (
            rank_windows(
                batch_df.select(
                    F.col("w.start").alias("win_start"), *key_cols, "n"
                ),
                key_cols, k,
            )
            .write.partitionBy("win_start")
            .option("partitionOverwriteMode", "dynamic")
            .mode("overwrite")
            .parquet(out_dir)
        )

    return (
        agg.writeStream.outputMode("append")
        .foreachBatch(update)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def rank_windows(counted: DataFrame, key_cols: list[str], k: int) -> DataFrame:
    """The leaderboard rank shared by the streaming sink
    (``windowed_topn``'s per-batch update), the backfill completer
    (``flush_open_windows``) and the batch twin query
    (``queries.events.q_windowed_topn`` — the driver-attested row for
    this logic): per win_start, row_number over (count desc, keys asc
    — the deterministic tie-break) kept to the top ``k``. One shuffle
    on win_start; WindowGroupLimit prunes to k per window map-side."""
    wnd = Window.partitionBy("win_start").orderBy(
        F.col("n").desc(), *[F.col(c) for c in key_cols]
    )
    return counted.withColumn("rnk", F.row_number().over(wnd)).filter(
        F.col("rnk") <= k
    )


def flush_open_windows(
    batch_df: DataFrame,
    ts_col: str,
    window: str,
    key_cols: list[str],
    k: int,
    out_dir: str,
):
    """Complete a ``windowed_topn`` one-shot backfill: compute the
    per-window top-k over the LANDED source in batch mode (no
    watermark, so nothing is withheld) for exactly the windows the
    streaming run left open, and write them to the same partitioned
    sink. Idempotent — already-persisted windows are anti-joined away,
    so re-running flushes nothing twice, and a retry dynamic-overwrites
    only the partitions it owns.

    Cost: one windowed count + rank over the source, pruned by the
    anti-join to open windows only (the broadcast side is the distinct
    persisted win_start list, tiny by construction)."""
    spark = batch_df.sparkSession
    full = (
        batch_df.groupBy(
            F.window(F.col(ts_col), window).alias("w"), *key_cols
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("win_start"), *key_cols, "n")
    )
    if state_exists(spark, out_dir):
        done = spark.read.parquet(out_dir).select("win_start").distinct()
        full = full.join(F.broadcast(done), "win_start", "left_anti")
    (
        rank_windows(full, key_cols, k)
        .write.partitionBy("win_start")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite")
        .parquet(out_dir)
    )


def ingest_neardup(
    stream_df: DataFrame,
    out_dir: str,
    ledger_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 8,
    band_size: int = 2,
):
    """Streaming NEAR-duplicate ingest: admit only documents that are
    not LSH-near-duplicates of anything already admitted — the
    MinHash-band sibling of ``ingest_dedup``'s exact-hash ledger.

    The cross-batch state is a parquet BAND ledger: (band_idx,
    band_key) rows of every admitted doc (num_hashes/band_size rows
    per doc — bounded, anti-join-able, restart-safe; the same
    100 TB-ledger argument as ingest_dedup). Admission rule, applied
    per micro-batch and replayable relationally (the driver-attested
    batch twin ``queries.datapipe.q_neardup_ingest`` runs the same
    rule over a landed corpus):

      a doc is REJECTED iff any of its band keys (1) exists in the
      ledger, or (2) is shared by a smaller-id doc in the same batch.

    Rule (2) is conservative-greedy: a doc colliding only with a
    same-batch doc that was itself rejected is still rejected —
    over-rejection only; an admitted near-dup of an admitted doc is
    impossible. MinHash lanes use the md5 chunk path
    (datapipe.dedup.minhash_signature), so the ledger is
    engine-portable and the twin's DuckDB oracle reproduces every
    band key bit-for-bit."""
    from cubert_spark.datapipe.dedup import (
        lsh_bands,
        minhash_signature,
        shingle_table,
    )

    from cubert_spark.datapipe.dedup import reject_by_bands

    def update(batch_df: DataFrame, _batch_id: int) -> None:
        spark = batch_df.sparkSession
        sh = shingle_table(batch_df, text_col, id_col, k)
        bands = lsh_bands(
            minhash_signature(sh, id_col, num_hashes), id_col,
            num_hashes, band_size,
        )
        # the missing-ledger case is an explicit FS-agnostic probe
        # (state_exists honors hdfs://s3a:// schemes), NOT a bare
        # except around the read: a real read failure (corrupt
        # append, stray file) must ABORT the batch — swallowing it
        # would silently disable rule (1) and admit near-dups of
        # already-admitted docs
        ledger = (
            spark.read.parquet(ledger_dir)
            if state_exists(spark, ledger_dir)
            else None
        )
        rejected = reject_by_bands(bands, id_col, ledger, broadcast_bands=True)
        # rejected is batch-bounded (ids from this batch only) —
        # broadcast so neither anti-join shuffles
        admitted = batch_df.join(F.broadcast(rejected), id_col, "left_anti")
        adm_bands = bands.join(F.broadcast(rejected), id_col, "left_anti")
        # MUST cut lineage before writing: the ledger append below is
        # read BY the bands plan — same trap as ingest_dedup
        admitted = admitted.localCheckpoint(eager=True)
        adm_bands = adm_bands.localCheckpoint(eager=True)
        # corpus BEFORE ledger: a crash between the writes then leaves
        # the docs admitted-but-unledgered — the retry re-admits and
        # re-appends them (duplicates, recoverable by exact dedup)
        # instead of the reverse order's silent PERMANENT LOSS (bands
        # in the ledger reject the docs from ever landing in out_dir)
        admitted.write.mode("append").parquet(out_dir)
        adm_bands.select("band_idx", "band_key", F.col(id_col)).write.mode(
            "append"
        ).parquet(ledger_dir)

    return (
        stream_df.writeStream.foreachBatch(update)
        .trigger(availableNow=True)
        .start()
    )
