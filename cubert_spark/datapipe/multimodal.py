"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The media codecs (PIL/ffmpeg/etc.) are NOT in this container, so the
decode kernels are stubbed — either raising NotImplementedError or
producing a deterministic fake (``fake=True``) so the Spark-side
plumbing (schema, Arrow batch shape, partitioning) is fully testable.
The mapInPandas pipelines, batch sizing and output schemas are real
and are what would run at scale once a codec is dropped in.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Output schema of decode_images: fixed metadata + feature vector.
IMAGE_META_SCHEMA = (
    "id long, byte_len int, sha256 string, width int, height int, feature array<float>"
)


def attach_blob_metadata(df: DataFrame, blob_col: str, id_col: str) -> DataFrame:
    """Typed metadata for an opaque binary column — JVM-side only
    (length, content hash); the cheap pass that runs before any
    Python decode at scale."""
    b = F.col(blob_col)
    return df.select(
        F.col(id_col),
        F.length(b).cast("int").alias("byte_len"),
        F.sha2(b, 256).alias("sha256"),
    )


def text_as_blob(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Test adapter: UTF-8 encode a text column into a binary column so
    the multimodal plumbing is exercisable on the documents table."""
    return df.select(
        F.col(id_col).alias("id"), F.encode(F.col(text_col), "UTF-8").alias("blob")
    )


def decode_images(
    df: DataFrame,
    blob_col: str = "blob",
    id_col: str = "id",
    target_size: tuple[int, int] = (32, 32),
    fake: bool = False,
) -> DataFrame:
    """Decode + resize + feature-extract an image blob column.

    Arrow-batched mapInPandas: each batch decodes ``len(batch)`` blobs
    without per-row Python dispatch. With ``fake=True`` the decode is a
    deterministic stand-in (dimensions and features derived from blob
    bytes) so tests validate schema/batching; otherwise raises
    NotImplementedError (no image codec in this environment).
    """
    import hashlib

    import pandas as pd

    w, h = target_size

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image codec unavailable in this environment; "
                    "run with fake=True or plug a decoder into decode_images.kernel"
                )
            rows = []
            for i, blob in zip(pdf[id_col], pdf[blob_col]):
                raw = bytes(blob)
                digest = hashlib.sha256(raw).hexdigest()
                # deterministic fake: dims from digest, 4-dim feature
                rows.append(
                    {
                        "id": int(i),
                        "byte_len": len(raw),
                        "sha256": digest,
                        "width": w,
                        "height": h,
                        "feature": [
                            float(int(digest[j * 8 : j * 8 + 8], 16) % 1000) / 1000.0
                            for j in range(4)
                        ],
                    }
                )
            yield pd.DataFrame(rows)

    return df.select(F.col(id_col), F.col(blob_col)).mapInPandas(
        kernel, schema=IMAGE_META_SCHEMA
    )


def sample_frames(
    df: DataFrame,
    blob_col: str = "blob",
    id_col: str = "id",
    every_nth: int = 10,
    fake: bool = False,
) -> DataFrame:
    """Frame-sampling plumbing for video blobs: one output row per
    sampled frame (id, frame_idx, frame_blob). Fake mode slices the
    blob deterministically; real mode needs a demuxer
    (NotImplementedError)."""
    import pandas as pd

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError("video demuxer unavailable; use fake=True")
            rows = []
            for i, blob in zip(pdf[id_col], pdf[blob_col]):
                raw = bytes(blob)
                n_frames = max(1, len(raw) // max(every_nth, 1))
                for fi in range(0, n_frames, every_nth):
                    rows.append(
                        {"id": int(i), "frame_idx": fi, "frame_blob": raw[fi : fi + every_nth]}
                    )
            yield pd.DataFrame(rows)

    return df.select(F.col(id_col), F.col(blob_col)).mapInPandas(
        kernel, schema="id long, frame_idx int, frame_blob binary"
    )
