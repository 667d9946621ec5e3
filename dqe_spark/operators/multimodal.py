"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, processed via Arrow-batched pandas on mapInPandas.

The decode step itself (PIL/librosa/ffmpeg) is STUBBED — those libs
are not in this container. What IS real and tested:

  * the schema convention: (id, content: binary, media_type, meta)
  * the mapInPandas plumbing — Arrow batch in, Arrow batch out, stable
    output schema, per-batch vectorized processing
  * deterministic byte-level features (size, md5 digest) that a real
    decoder would replace with width/height/duration/embeddings

At 100 TB the binary column dominates I/O: keep it in its own parquet
column (column pruning skips it unless asked), partition by media_type,
and size spark.sql.files.maxPartitionBytes so one task holds a few
hundred MB of payload. mapInPandas streams batches — no
collect-to-driver anywhere.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("digest", StringType()),
    ]
)


def to_binary_table(df: DataFrame, col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Wrap a source column as the multimodal binary convention.
    (Real pipelines read binary columns directly from parquet.)"""
    return df.select(
        F.col(id_col),
        F.encode(F.col(col), "UTF-8").alias("content"),
        F.lit("text/plain").alias("media_type"),
    )


def decode_stub(content: bytes) -> dict:
    """STUB for the real media decode (PIL image open / audio resample /
    video frame-sample). Deterministic byte-level stand-in."""
    raise NotImplementedError(
        "media decode requires PIL/librosa/ffmpeg — not available in this "
        "container; extract_features() uses byte-level features instead"
    )


def extract_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    Real deployments put decode+resize+embed here (per-batch, vectorized);
    the stub computes size + md5 so the plumbing is fully testable and
    oracle-checkable (octet_length/md5 in SQL)."""

    def batches(it):
        for pdf in it:
            out = pdf[["doc_id", "media_type"]].copy()
            out["n_bytes"] = pdf["content"].map(len).astype("int64")
            out["digest"] = pdf["content"].map(
                lambda b: hashlib.md5(bytes(b)).hexdigest()
            )
            yield out[["doc_id", "media_type", "n_bytes", "digest"]]

    return df.mapInPandas(batches, schema=FEATURE_SCHEMA)


def frame_sample_stub(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling plumbing: explodes a (deterministic, fake)
    frame index list per row; a real impl replaces the index generator
    with ffmpeg keyframe extraction inside mapInPandas."""
    n_frames = (F.octet_length("content") % 240 + 1).alias("n_frames")
    return (
        df.select("doc_id", "content", n_frames)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))).alias(
                "frame_idx"
            ),
        )
    )
