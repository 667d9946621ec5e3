"""Materialized metric store: the engine's storage layout + ingest.

The reference's storage is DalmatinerDB: packed per-series binaries
addressed by (bucket, metric) with range reads
(/root/reference/src/dqe_get.erl:14-96). Our equivalent is a physical
parquet layout in long format:

    _store/<sf>/metrics/bucket=<b>/metric=<m>/part-*.parquet
      columns: ts_ms, value, confidence, host, dc, user, tags,
               metric_parts (metric/bucket are partition columns)

Why this layout matters at 100 TB:
  * bucket+metric predicates become PARTITION PRUNING — a query for one
    series never opens other series' files (the view-based store can't
    push `concat('events.', event_type) = 'events.click'` into the
    scan at all).
  * rows are written sorted by ts_ms within each partition, so the
    ts-range predicate becomes row-group min/max skipping.
  * at real scale you'd partition by (bucket, date(ts)) instead of
    per-metric directories once series count ≫ file count, and keep
    metric as a sorted column for min/max skipping; the query layer is
    identical either way.

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


def _store_dir(sf_dir: str) -> Path:
    return STORE_ROOT / Path(sf_dir.rstrip("/")).name / "metrics"


def materialized_path(sf_dir: str) -> Path | None:
    p = _store_dir(sf_dir)
    return p if (p / "_SUCCESS").exists() else None


def ingest(spark: SparkSession, sf_dir: str, force: bool = False) -> Path:
    """Build the physical metric store from the raw event source.

    Sorted-by-ts within partitions; partitioned by (bucket, metric).
    """
    from dqe_spark.sources.metric_store import _derive_metrics_view

    out = _store_dir(sf_dir)
    if not force and (out / "_SUCCESS").exists():
        return out
    tmp = out.parent / "_tmp_metrics"
    if tmp.exists():
        shutil.rmtree(tmp)
    df = _derive_metrics_view(spark, sf_dir)
    (
        df.repartition("bucket", "metric")
        .sortWithinPartitions("ts_ms")
        .write.mode("overwrite")
        .partitionBy("bucket", "metric")
        .parquet(str(tmp))
    )
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


def load(spark: SparkSession, sf_dir: str) -> DataFrame | None:
    """Read the materialized store if present (None → caller falls back
    to the view derivation). Column order normalized to the view's."""
    p = materialized_path(sf_dir)
    if p is None:
        return None
    df = spark.read.parquet(str(p))
    return df.select(
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
    )
