"""Format connectors: land CSV / JSON(L) / parquet metric points into
the store schema.

The reference's ingestion surface is the DalmatinerDB TCP protocol +
the dqe_idx index (SURVEY.md §2.1 connectors); the Spark-native
equivalent is schema-mapped reads of whatever lands in object storage.
Each reader normalizes to the canonical point schema

    (bucket, metric, ts_ms, value, confidence, tags)

so everything downstream (store ingest, rollups, queries) is
format-agnostic. Readers are declarative `spark.read` plans — schema
applied up front (no inference job at scale), malformed rows routed to
a PERMISSIVE corrupt-record column rather than failing the pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: canonical landing schema for delimited/JSON point files
POINT_SCHEMA = (
    "bucket string, metric string, ts_ms long, value double, "
    "confidence double, tags map<string,string>"
)
# CSV can't carry a map column — tags arrive as k1=v1|k2=v2
CSV_SCHEMA = (
    "bucket string, metric string, ts_ms long, value double, "
    "confidence double, tags string, _corrupt_record string"
)
JSON_SCHEMA = POINT_SCHEMA + ", _corrupt_record string"


def _finalize(df: DataFrame) -> DataFrame:
    ok = df.where(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    return ok.select(
        "bucket",
        "metric",
        "ts_ms",
        F.col("value").cast("double"),
        F.coalesce(F.col("confidence"), F.lit(1.0)).alias("confidence"),
        F.coalesce(
            F.col("tags"), F.lit(None).cast("map<string,string>")
        ).alias("tags"),
    )


def read_points_csv(spark: SparkSession, path: str, header: bool = True) -> DataFrame:
    df = (
        spark.read.schema(CSV_SCHEMA)
        .option("header", header)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
    )
    tags = F.when(
        F.col("tags").isNotNull() & (F.length("tags") > 0),
        F.expr(
            "map_from_entries(transform(split(tags, '\\\\|'), "
            "kv -> struct(split_part(kv, '=', 1), split_part(kv, '=', 2))))"
        ),
    )
    return _finalize(df.withColumn("tags", tags))


def read_points_json(spark: SparkSession, path: str) -> DataFrame:
    df = (
        spark.read.schema(JSON_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
    return _finalize(df)


def corrupt_records(spark: SparkSession, path: str, fmt: str) -> DataFrame:
    """The rejected rows, for a dead-letter sink."""
    if fmt == "csv":
        df = (
            spark.read.schema(CSV_SCHEMA)
            .option("header", True)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_corrupt_record")
            .csv(path)
        )
    elif fmt == "json":
        df = (
            spark.read.schema(JSON_SCHEMA)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_corrupt_record")
            .json(path)
        )
    else:
        raise ValueError(f"unknown format: {fmt}")
    # Spark disallows queries touching ONLY the corrupt-record column
    # of a raw file scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — cache the
    # parsed batch first, per the documented pattern. Dead-letter
    # batches are small by definition; at scale you'd write the parsed
    # frame once and split ok/corrupt from the materialized copy.
    df = df.cache()
    return df.where(F.col("_corrupt_record").isNotNull()).select("_corrupt_record")


def read_points_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC landing files (Spark-native reader, no extra package):
    columnar input already carries the typed schema, so there is no
    corrupt-record channel — type mismatches fail the file at open, the
    correct behavior for a self-describing format. Missing optional
    columns (confidence, tags) default like the other readers."""
    df = spark.read.schema(POINT_SCHEMA).orc(path)
    return df.select(
        "bucket",
        "metric",
        "ts_ms",
        F.col("value").cast("double"),
        F.coalesce(F.col("confidence"), F.lit(1.0)).alias("confidence"),
        F.coalesce(
            F.col("tags"), F.lit(None).cast("map<string,string>")
        ).alias("tags"),
    )


# media-file landing: Spark's built-in binaryFile source maps raw
# image/audio/video files straight into the multimodal binary-column
# convention (operators/multimodal.py) — no Python in the read path
MEDIA_EXT_TYPES = {
    "png": "image/png", "bmp": "image/bmp", "jpg": "image/jpeg",
    "jpeg": "image/jpeg", "gif": "image/gif", "wav": "audio/wav",
    "y4m": "video/x-yuv4mpeg", "mp3": "audio/mpeg", "mp4": "video/mp4",
    "webm": "video/webm",
}


def read_media_files(
    spark: SparkSession, path: str, glob: str = "*"
) -> DataFrame:
    """Ingest raw media files via the built-in ``binaryFile`` source
    into the multimodal convention: (id, content binary, media_type,
    src_path, length, modified_ms). The id is the content's md5 (the
    engine-wide content-addressing rule), media_type derives from the
    file extension with application/octet-stream as the honest
    fallback.

    Scale shape: binaryFile is a real FileFormat — distributed
    file listing, per-file tasks, PathGlobFilter pushdown; the
    decode/feature pass downstream stays Arrow-batched
    (multimodal.decode_media_features). Files > 2 GiB are the
    format's documented limit; shard or chunk upstream."""
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )
    ext = F.lower(
        F.element_at(F.split(F.col("path"), r"\."), -1)
    )
    mt = F.lit(None).cast("string")
    for e, t in sorted(MEDIA_EXT_TYPES.items()):
        mt = F.when(ext == e, F.lit(t)).otherwise(mt)
    return df.select(
        F.md5(F.col("content")).alias("id"),
        F.col("content"),
        F.coalesce(mt, F.lit("application/octet-stream")).alias("media_type"),
        F.col("path").alias("src_path"),
        F.col("length"),
        F.unix_millis(F.col("modificationTime")).alias("modified_ms"),
    )
