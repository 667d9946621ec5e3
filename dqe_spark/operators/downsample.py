"""M4 downsampling: visualization-driven series reduction.

For rendering a series of millions of points into a w-pixel chart, M4
keeps per pixel-bucket exactly the rows carrying (first ts, last ts,
min value, max value) — the 4 extremes that make the drawn line
pixel-identical to rendering every point (Jugel et al., "M4: A
Visualization-Oriented Time Series Data Aggregation", VLDB 2014).
The reference engine has no downsampling below its window aggregates;
M4 is the right primitive for the dashboard path because it is ERROR-
FREE for line rendering, unlike avg-per-window.

Fully distributive: one groupBy(series, bucket) for the 4 extremes,
one semi-join back to pick the matching rows — no sequential
dependency (contrast LTTB, which chains on the previously selected
point and cannot parallelize)."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def m4_downsample(
    df: DataFrame,
    start_ms: int,
    end_ms: int,
    width: int,
    keys: Sequence[str] = ("metric",),
    ts: str = "ts_ms",
    v: str = "value",
) -> DataFrame:
    """Rows carrying each (series, pixel-bucket)'s first/last/min/max —
    ≤ 4 rows per bucket per series, distinct. Output: keys + (bucket,
    ts, value) of the kept points."""
    if width <= 0 or end_ms <= start_ms:
        raise ValueError("need width > 0 and a non-empty time range")
    span = end_ms - start_ms
    bucket = F.floor((F.col(ts) - F.lit(start_ms)) * width / F.lit(span)).cast("long")
    pts = df.where((F.col(ts) >= start_ms) & (F.col(ts) < end_ms)).select(
        *keys, bucket.alias("bucket"), F.col(ts).alias("ts_ms"), F.col(v).alias("value")
    )
    ext = pts.groupBy(*keys, "bucket").agg(
        F.min("ts_ms").alias("t_first"),
        F.max("ts_ms").alias("t_last"),
        F.min("value").alias("v_min"),
        F.max("value").alias("v_max"),
    )
    keep = (
        (F.col("ts_ms") == F.col("t_first"))
        | (F.col("ts_ms") == F.col("t_last"))
        | (F.col("value") == F.col("v_min"))
        | (F.col("value") == F.col("v_max"))
    )
    return (
        pts.join(ext, [*keys, "bucket"])
        .where(keep)
        .select(*keys, "bucket", "ts_ms", "value")
        .distinct()
    )
