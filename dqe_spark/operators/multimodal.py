"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, processed via Arrow-batched pandas on mapInPandas.

Decode is REAL for the formats the standard library + numpy can carry
(operators/media_codec.py): WAV audio (sample rate / channels /
duration / RMS), PNG (full inflate + unfilter → pixels + luminance),
24-bpp BMP, Y4M uncompressed video (header grammar + frame walk +
luma planes — what `ffmpeg -f yuv4mpegpipe` emits), and JPEG frame
headers (dimensions). Formats that need ffmpeg itself (compressed
video/audio codecs) raise NotImplementedError per row and surface as
an ``error`` column — the batch never fails.

What the plumbing guarantees regardless of format:

  * the schema convention: (id, content: binary, media_type, meta)
  * mapInPandas — Arrow batch in, Arrow batch out, stable output schema
  * deterministic byte-level features (size, md5 digest) always present

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

from dqe_spark.operators.partitioning import spread
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from dqe_spark.operators import media_codec

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


#: real-decode output: byte-level features always filled; format
#: features null where not applicable (audio has no width, JPEG partial
#: decode has no luma); error carries the per-row decode failure.
DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("digest", StringType()),
        StructField("kind", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("channels", LongType()),
        StructField("duration_ms", LongType()),
        StructField("sample_rate", LongType()),
        StructField("mean_luma", DoubleType()),
        StructField("rms", DoubleType()),
        StructField("error", StringType()),
    ]
)


def decode_media_features(df: DataFrame) -> DataFrame:
    """REAL decode of the binary column via media_codec, Arrow-batched.

    Dispatches per media_type (WAV/PNG/BMP fully decoded, JPEG header
    dims, everything else → per-row error string). Column order and
    null-ness are stable across formats so downstream aggregation can
    mix modalities in one table.
    """

    def batches(it):
        import pandas as pd

        for pdf in it:
            rows = []
            for doc_id, content, mt in zip(
                pdf["doc_id"], pdf["content"], pdf["media_type"]
            ):
                b = bytes(content)
                rec = {
                    "doc_id": doc_id,
                    "media_type": mt,
                    "n_bytes": len(b),
                    "digest": hashlib.md5(b).hexdigest(),
                    "kind": None, "width": None, "height": None,
                    "channels": None, "duration_ms": None,
                    "sample_rate": None, "mean_luma": None, "rms": None,
                    "error": None,
                }
                try:
                    d = media_codec.decode_media(b, mt)
                    rec.update(
                        kind=d.get("kind"),
                        width=d.get("width"),
                        height=d.get("height"),
                        channels=d.get("channels"),
                        duration_ms=d.get("duration_ms"),
                        sample_rate=d.get("sample_rate"),
                        mean_luma=d.get("mean_luma"),
                        rms=d.get("rms"),
                    )
                except (media_codec.MediaDecodeError, NotImplementedError) as e:
                    rec["error"] = str(e)[:200]
                rows.append(rec)
            yield pd.DataFrame(rows, columns=[f.name for f in DECODED_SCHEMA.fields])

    return spread(df).mapInPandas(batches, schema=DECODED_SCHEMA)


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

    return spread(df).mapInPandas(batches, schema=FEATURE_SCHEMA)


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


#: resize output: re-encoded PNG content + final dims; error rows keep
#: the input id with NULL content (honest partial failure, never a drop)
RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("content", BinaryType()),
        StructField("media_type", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("error", StringType()),
    ]
)


def resize_images(
    df: DataFrame, width: int, height: int, method: str = "nearest"
) -> DataFrame:
    """REAL image resize over the binary column (PNG/BMP in,
    normalized PNG out) — Arrow-batched mapInPandas like the decoders;
    per-row failures land in ``error`` with NULL content instead of
    dropping the row or poisoning the batch.

    Scale shape: map-only (no shuffle); ``spread`` widens the few-file
    test corpora, a no-op at real scale. The nearest/area kernels are
    pure integer numpy (media_codec.resize_pixels), bit-deterministic
    across runs and partitionings.
    """
    import pandas as pd

    from dqe_spark.operators import media_codec as mc

    def batches(it):
        for pdf in it:
            rows = []
            for did, content in zip(pdf["doc_id"], pdf["content"]):
                try:
                    out = mc.resize_image(bytes(content), width, height, method)
                    rows.append((did, out, "image/png", width, height, None))
                except mc.MediaDecodeError as e:
                    rows.append((did, None, None, None, None, str(e)))
            yield pd.DataFrame(
                rows, columns=[f.name for f in RESIZED_SCHEMA.fields]
            )

    return spread(df.select("doc_id", "content")).mapInPandas(
        batches, schema=RESIZED_SCHEMA
    )


#: real frame sampling: one row per sampled frame, luma as gray PNG
FRAMES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("content", BinaryType()),
        StructField("media_type", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("error", StringType()),
    ]
)


def sample_frames(df: DataFrame, every_n: int = 30) -> DataFrame:
    """REAL video frame sampling: parse Y4M (uncompressed video, the
    ffmpeg-pipe standard) executor-side, keep every Nth frame's luma
    plane as a grayscale PNG — one output row per sampled frame.
    Chroma subsampling never matters (the luma plane leads every
    frame), so all documented C-modes work. Undecodable payloads keep
    one row with the error; compressed codecs (H.264 etc.) raise
    honestly — transcode to Y4M upstream (`ffmpeg -f yuv4mpegpipe`).

    Scale shape: map-only mapInPandas (Arrow batches), no shuffle;
    a row fans out to ceil(n_frames/every_n) rows — the standard
    thumbnailing multiply."""
    if every_n < 1:
        raise ValueError(f"every_n must be >= 1, got {every_n}")
    import pandas as pd

    from dqe_spark.operators import media_codec as mc

    def batches(it):
        for pdf in it:
            rows = []
            for did, content in zip(pdf["doc_id"], pdf["content"]):
                try:
                    d = mc.decode_y4m(bytes(content))
                    for i in range(0, d["n_frames"], every_n):
                        rows.append(
                            (
                                did,
                                i,
                                mc.encode_png(d["frames"][i]),
                                "image/png",
                                d["width"],
                                d["height"],
                                None,
                            )
                        )
                except mc.MediaDecodeError as e:
                    rows.append((did, None, None, None, None, None, str(e)))
            yield pd.DataFrame(
                rows, columns=[f.name for f in FRAMES_SCHEMA.fields]
            )

    return spread(df.select("doc_id", "content")).mapInPandas(
        batches, schema=FRAMES_SCHEMA
    )


def resample_audio(df: DataFrame, every_n: int) -> DataFrame:
    """REAL audio downsample over the binary column (16-bit WAV in,
    decimated WAV out) — same Arrow-batched, error-honest shape as
    resize_images; map-only at any corpus size."""
    import pandas as pd

    from dqe_spark.operators import media_codec as mc

    def batches(it):
        for pdf in it:
            rows = []
            for did, content in zip(pdf["doc_id"], pdf["content"]):
                try:
                    out = mc.decimate_wav(bytes(content), every_n)
                    d = mc.decode_wav(out)
                    rows.append(
                        (did, out, "audio/wav", d["sample_rate"],
                         d["n_samples"], None)
                    )
                except mc.MediaDecodeError as e:
                    rows.append((did, None, None, None, None, str(e)))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "content", "media_type", "sample_rate",
                         "n_samples", "error"],
            )

    return spread(df.select("doc_id", "content")).mapInPandas(
        batches,
        "doc_id long, content binary, media_type string, "
        "sample_rate long, n_samples long, error string",
    )


def image_dhashes(
    df: DataFrame, method: str = "nearest"
) -> DataFrame:
    """Perceptual dHash per image row (media_codec.image_dhash) —
    Arrow-batched, error-honest like the other media operators; the
    input to hamming-banded image dedup (dedup.hamming_neardup_pairs)."""
    import pandas as pd

    from dqe_spark.operators import media_codec as mc

    def batches(it):
        for pdf in it:
            rows = []
            for did, content in zip(pdf["doc_id"], pdf["content"]):
                try:
                    rows.append((did, mc.image_dhash(bytes(content), method), None))
                except mc.MediaDecodeError as e:
                    rows.append((did, None, str(e)))
            yield pd.DataFrame(rows, columns=["doc_id", "dhash", "error"])

    return spread(df.select("doc_id", "content")).mapInPandas(
        batches, "doc_id long, dhash long, error string"
    )


def keyframes(df: DataFrame, threshold: float = 10.0) -> DataFrame:
    """Scene-change keyframe selection over Y4M videos: frame 0 and
    every frame whose mean-luma delta vs its predecessor reaches
    ``threshold`` (the classic frame-difference shot detector — the
    cheap first pass ahead of expensive per-keyframe embedding /
    captioning in a multimodal training pipeline).

    Output one row per keyframe: (doc_id, frame_idx, mean_luma,
    delta_luma, err); delta is NULL on frame 0. Undecodable payloads
    keep one row with the error, like the other media passes.

    Scale shape: map-only mapInPandas — the frame walk is sequential
    WITHIN a video (deltas need the previous frame) but videos are
    independent, so parallelism follows rows; output is bounded by
    scene changes, not frame count. Means are numpy sums over the
    uint8 luma plane in float64 — deterministic per frame."""
    import pandas as pd

    from dqe_spark.operators import media_codec as mc

    schema = (
        "doc_id long, frame_idx long, mean_luma double, "
        "delta_luma double, err string"
    )

    def batches(it):
        for pdf in it:
            rows = []
            for did, content in zip(pdf["doc_id"], pdf["content"]):
                try:
                    d = mc.decode_y4m(bytes(content))
                    prev = None
                    for i, fr in enumerate(d["frames"]):
                        m = float(fr.astype("float64").mean())
                        delta = None if prev is None else m - prev
                        if prev is None or abs(delta) >= threshold:
                            rows.append((did, i, m, delta, None))
                        prev = m
                except mc.MediaDecodeError as e:
                    rows.append((did, None, None, None, str(e)))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "frame_idx", "mean_luma", "delta_luma", "err"],
            )

    return spread(df.select("doc_id", "content")).mapInPandas(batches, schema)


def audio_activity_segments(
    df: DataFrame, frame_ms: int = 25, threshold: float = 50.0
) -> DataFrame:
    """Voice/sound activity segmentation over WAV audio — the audio
    analog of keyframes(): frame the first channel into fixed
    ``frame_ms`` windows, score each by RMS in RAW sample units, and
    emit one row per maximal run of frames at or above ``threshold``
    (gaps-and-islands, computed sequentially inside the row's own
    sample array). The cheap first pass ahead of per-segment ASR /
    audio embedding in a training pipeline.

    Output: (doc_id, start_ms, end_ms, n_frames, peak_rms, err);
    end_ms exclusive. A trailing partial frame is dropped (its RMS
    would be over a different support — callers pad upstream if the
    tail matters). Undecodable payloads keep one error row.

    Scale shape: map-only mapInPandas; output bounded by activity
    runs, not sample count. RMS is float64 numpy; for constant-valued
    frames sqrt of a perfect square is exact, which the analytic
    oracle exploits."""
    if frame_ms < 1:
        raise ValueError(f"frame_ms must be >= 1, got {frame_ms}")
    import numpy as np
    import pandas as pd

    from dqe_spark.operators import media_codec as mc

    schema = (
        "doc_id long, start_ms long, end_ms long, n_frames long, "
        "peak_rms double, err string"
    )

    def batches(it):
        for pdf in it:
            rows = []
            for did, content in zip(pdf["doc_id"], pdf["content"]):
                try:
                    d = mc.decode_wav_samples(bytes(content))
                    spf = d["sample_rate"] * frame_ms // 1000
                    if spf < 1:
                        raise mc.MediaDecodeError(
                            f"frame_ms {frame_ms} < one sample at "
                            f"{d['sample_rate']} Hz"
                        )
                    x = d["samples"].astype(np.float64)
                    nf = len(x) // spf
                    start = peak = None
                    for k in range(nf + 1):
                        active = False
                        if k < nf:
                            fr = x[k * spf : (k + 1) * spf]
                            r = float(np.sqrt(np.mean(fr * fr)))
                            active = r >= threshold
                        if active:
                            peak = r if start is None else max(peak, r)
                            start = k if start is None else start
                        elif start is not None:
                            rows.append(
                                (did, start * frame_ms, k * frame_ms,
                                 k - start, peak, None)
                            )
                            start = None
                except mc.MediaDecodeError as e:
                    rows.append((did, None, None, None, None, str(e)))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "start_ms", "end_ms", "n_frames",
                         "peak_rms", "err"],
            )

    return spread(df.select("doc_id", "content")).mapInPandas(batches, schema)
