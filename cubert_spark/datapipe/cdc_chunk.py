"""Content-defined chunking (CDC) for binary blobs — the dedup tier
for MEDIA and other binary columns, where the text tiers (shingles,
minhash) don't apply: split each blob at content-determined
boundaries (a Gear rolling hash crossing a mask, the FastCDC family —
Xia et al., USENIX ATC 2016, public), hash each chunk, and dedup
chunks across the corpus. The defining property over fixed-size
chunking: inserting or deleting bytes only perturbs the chunks
around the edit — every other boundary re-synchronizes, so shared
segments dedup even at different byte offsets in different blobs.

Implementation shape: the per-blob chunker does its random-access
work (the 256-entry Gear table lookup over every byte) in ONE
vectorized numpy pass, then a plain-int rolling loop declares
boundaries, inside an Arrow-batched ``mapInPandas`` kernel;
everything after the kernel is JVM algebra: chunk-hash groupBy,
per-blob dup stats. Only 16-byte chunk hashes ever shuffle, never
blob bytes. (At production blob sizes swap the boundary loop for a
C/Cython gear pass — the kernel contract is unchanged.)

No SQL oracle is possible (no rolling Gear hash in any SQL engine);
like the codec tier this surface is pytest-pinned: boundary
re-synchronization under inserts, chunk-size bounds, and exact
cross-blob dedup of planted shared segments.
"""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import DataFrame

#: 256-entry Gear table — deterministic pseudo-random uint64 per byte
#: value, derived from md5 so every run/engine builds the same table.
_GEAR = np.array(
    [
        int.from_bytes(hashlib.md5(b"gear:%d" % b).digest()[:8], "big")
        for b in range(256)
    ],
    dtype=np.uint64,
)


def chunk_boundaries(
    data: bytes,
    min_size: int = 64,
    avg_size: int = 256,
    max_size: int = 1024,
) -> list[int]:
    """Content-defined boundary offsets for ``data`` (end offsets,
    last == len(data)). A boundary is declared when the Gear rolling
    hash has its top ``log2(avg_size)`` bits all zero — expected
    chunk length ~avg_size; min/max clamp pathological content.
    Deterministic pure function of the bytes."""
    n = len(data)
    if n == 0:
        return []
    word = (1 << 64) - 1
    mask = word ^ ((1 << (64 - avg_size.bit_length() + 1)) - 1)
    arr = np.frombuffer(data, dtype=np.uint8)
    # per-byte gear values in one vectorized lookup, then a plain-int
    # rolling loop (mod-2^64 via the mask — no numpy overflow warnings)
    gear = _GEAR[arr].tolist()
    bounds: list[int] = []
    start = 0
    h = 0
    i = start + min_size
    while i < n:
        h = ((h << 1) + gear[i]) & word
        if (h & mask) == 0 or (i + 1 - start) >= max_size:
            bounds.append(i + 1)
            start = i + 1
            h = 0
            i = start + min_size
        else:
            i += 1
    if start < n:
        bounds.append(n)
    return bounds


def chunk_blobs(
    df: DataFrame,
    blob_col: str = "blob",
    id_col: str = "id",
    min_size: int = 64,
    avg_size: int = 256,
    max_size: int = 1024,
) -> DataFrame:
    """Explode each blob into its content-defined chunks:
    (id, chunk_idx, offset, length, chunk_hash md5-hex). Arrow-batched
    kernel; chunk BYTES never leave the kernel — only hashes and
    geometry."""
    import pandas as pd

    schema = (
        f"{id_col} long, chunk_idx int, offset int, length int, "
        "chunk_hash string"
    )

    def kernel(batches):
        for pdf in batches:
            rows = []
            for i, blob in zip(pdf[id_col], pdf[blob_col]):
                if blob is None:
                    continue
                raw = bytes(blob)
                prev = 0
                for ci, end in enumerate(
                    chunk_boundaries(raw, min_size, avg_size, max_size)
                ):
                    rows.append(
                        {
                            id_col: int(i),
                            "chunk_idx": ci,
                            "offset": prev,
                            "length": end - prev,
                            "chunk_hash": hashlib.md5(raw[prev:end]).hexdigest(),
                        }
                    )
                    prev = end
            yield pd.DataFrame(
                rows,
                columns=[id_col, "chunk_idx", "offset", "length", "chunk_hash"],
            )

    # drop NULL-id rows BEFORE the kernel: a single NaN id coerces the
    # whole pandas id column to float64 (corrupting ids above 2^53)
    from pyspark.sql import functions as F

    return (
        df.select(id_col, blob_col)
        .filter(F.col(id_col).isNotNull())
        .mapInPandas(kernel, schema)
    )


def blob_dedup_stats(
    df: DataFrame,
    blob_col: str = "blob",
    id_col: str = "id",
    **chunk_kw,
) -> DataFrame:
    """Per-blob chunk-level dedup report: (id, n_chunks, n_bytes,
    dup_chunks, dup_bytes, dup_frac) where a chunk is duplicated when
    its hash occurs more than once in the corpus (across or within
    blobs). The storage-savings estimate for a content-addressed
    store, and the binary analog of curation.duplicate_spans."""
    from pyspark.sql import functions as F

    chunks = chunk_blobs(df, blob_col, id_col, **chunk_kw)
    occ = chunks.groupBy("chunk_hash").agg(F.count(F.lit(1)).alias("__n"))
    j = chunks.join(occ, "chunk_hash")
    per_blob = j.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("length").alias("n_bytes"),
        F.sum(F.when(F.col("__n") > 1, 1).otherwise(0)).alias("dup_chunks"),
        F.sum(F.when(F.col("__n") > 1, F.col("length")).otherwise(0)).alias(
            "dup_bytes"
        ),
    )
    # left-join back so empty (and NULL) blobs report zero rows rather
    # than vanishing — a caller reconciling the report against the
    # corpus must see every id
    ids = df.select(id_col).filter(F.col(id_col).isNotNull()).distinct()
    return ids.join(per_blob, id_col, "left").select(
        id_col,
        F.coalesce("n_chunks", F.lit(0)).alias("n_chunks"),
        F.coalesce("n_bytes", F.lit(0)).alias("n_bytes"),
        F.coalesce("dup_chunks", F.lit(0)).alias("dup_chunks"),
        F.coalesce("dup_bytes", F.lit(0)).alias("dup_bytes"),
        F.when(
            F.coalesce("n_bytes", F.lit(0)) > 0,
            F.coalesce("dup_bytes", F.lit(0)).cast("double")
            / F.coalesce("n_bytes", F.lit(1)).cast("double"),
        ).otherwise(F.lit(0.0)).alias("dup_frac"),
    )
