"""SHIFT BY t — evaluate against a shifted time range, present on the
current axis (/root/reference/src/dql_parser.yrl:227-229; range shift
src/dql_resolution.erl:118-122,249-251).

Implementation: the *scan predicate* is shifted (so partition pruning
still applies to the shifted range — crucial at scale: the filter
reaches the Parquet reader), then timestamps are re-stamped forward.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def shifted_range(start_ms: int, end_ms: int, shift_ms: int) -> tuple[int, int]:
    """Absolute range the storage scan should read."""
    return start_ms - shift_ms, end_ms - shift_ms


def restamp(df: DataFrame, shift_ms: int, ts: str = "ts_ms") -> DataFrame:
    """Move the shifted data back onto the query's presentation axis."""
    return df.withColumn(ts, (F.col(ts) + F.lit(shift_ms)).cast("long"))
