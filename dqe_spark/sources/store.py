"""Materialized metric store: the engine's storage layouts + ingest.

The reference's storage is DalmatinerDB: packed per-series binaries
addressed by (bucket, metric) with range reads
(/root/reference/src/dqe_get.erl:14-96). Our equivalent is a physical
parquet layout in long format, in one of two shapes:

``layout="metric"`` (default; right while series count ≲ file count):

    _store/<sf>/metrics/bucket=<b>/metric=<m>/part-*.parquet
      columns: ts_ms, value, confidence, host, dc, user, tags,
               metric_parts (metric/bucket are partition columns)

  * bucket+metric predicates become PARTITION PRUNING — a query for one
    series never opens other series' files (the view-based store can't
    push `concat('events.', event_type) = 'events.click'` into the
    scan at all).
  * rows are range-partitioned on (bucket, metric, ts_ms) before the
    write, so a hot series spans several sorted files (parallel write
    AND parallel read) instead of one task per series, and every file
    is ts-sorted → ts-range predicates become row-group min/max
    skipping.

``layout="date"`` (the 100 TB shape, once series count ≫ file count —
millions of per-metric directories would drown the file listing and
the metastore):

    _store/<sf>/metrics_by_date/bucket=<b>/dt=<yyyy-MM-dd>/part-*.parquet
      columns: metric, ts_ms, value, ... (metric is a SORTED column)

  * time-range predicates become PARTITION PRUNING on ``dt`` (the DQL
    compiler adds the dt predicate alongside ts_ms, dql/compiler._scan).
  * files are sorted by (metric, ts_ms), so metric equality/range
    predicates become row-group min/max skipping — the same file-skip
    effect the per-metric directories give, without the directory
    explosion.

Ingest is idempotent and atomic (write to tmp dir, rename into place),
so concurrent readers either see the complete store or fall back to the
view derivation — never a partial write.
"""

from __future__ import annotations

import os
import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

STORE_ROOT = Path(__file__).resolve().parent.parent.parent / "_store"


_LAYOUT_DIRS = {"metric": "metrics", "date": "metrics_by_date"}


def _store_dir(sf_dir: str, layout: str = "metric") -> Path:
    return STORE_ROOT / Path(sf_dir.rstrip("/")).name / _LAYOUT_DIRS[layout]


def materialized_path(sf_dir: str, layout: str = "metric") -> Path | None:
    p = _store_dir(sf_dir, layout)
    return p if (p / "_SUCCESS").exists() else None


def ingest(
    spark: SparkSession, sf_dir: str, force: bool = False, layout: str = "metric"
) -> Path:
    """Build the physical metric store from the raw event source.

    layout="metric": partitioned by (bucket, metric), ts-sorted files.
    layout="date":   partitioned by (bucket, dt), (metric, ts)-sorted
    files — the shape for series counts that outgrow per-metric dirs.
    Both range-partition rows before the write so large series/days
    split across several sorted files (parallel write and read) rather
    than one task per partition value.
    """
    from dqe_spark.sources.metric_store import _derive_metrics_view

    if layout not in _LAYOUT_DIRS:
        raise ValueError(f"unknown store layout: {layout!r}")
    out = _store_dir(sf_dir, layout)
    if not force and (out / "_SUCCESS").exists():
        return out
    tmp = out.parent / f"_tmp_{_LAYOUT_DIRS[layout]}"
    if tmp.exists():
        shutil.rmtree(tmp)
    df = _derive_metrics_view(spark, sf_dir)
    if layout == "metric":
        writer = (
            df.repartitionByRange("bucket", "metric", "ts_ms")
            .sortWithinPartitions("bucket", "metric", "ts_ms")
            .write.mode("overwrite")
            .partitionBy("bucket", "metric")
        )
    else:
        df = df.withColumn(
            "dt", F.date_format(F.timestamp_millis(F.col("ts_ms")), "yyyy-MM-dd")
        )
        writer = (
            df.repartitionByRange("bucket", "dt", "metric", "ts_ms")
            .sortWithinPartitions("bucket", "dt", "metric", "ts_ms")
            .write.mode("overwrite")
            .partitionBy("bucket", "dt")
        )
    writer.parquet(str(tmp))
    if out.exists():
        shutil.rmtree(out)
    out.parent.mkdir(parents=True, exist_ok=True)
    try:
        os.rename(tmp, out)
    except OSError:
        # lost a concurrent race: someone else finished first — use theirs
        if not (out / "_SUCCESS").exists():
            raise
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def load(
    spark: SparkSession, sf_dir: str, layout: str = "metric"
) -> DataFrame | None:
    """Read the materialized store if present (None → caller falls back
    to the view derivation). Column order normalized to the view's;
    the date layout additionally exposes its ``dt`` partition column so
    the query layer can turn time ranges into partition pruning."""
    p = materialized_path(sf_dir, layout)
    if p is None:
        return None
    df = spark.read.parquet(str(p))
    cols = [
        F.col("bucket").cast("string"),
        F.col("metric").cast("string"),
        "metric_parts",
        "tags",
        "host",
        "dc",
        "user",
        "ts_ms",
        "value",
        "confidence",
    ]
    if "dt" in df.columns:
        cols.append(F.col("dt").cast("string"))
    return df.select(*cols)
