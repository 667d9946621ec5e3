"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in the ``dqe_spark`` package; see SURVEY.md §2 for
the operator inventory each entry corresponds to.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))


def _configure(spark: SparkSession) -> SparkSession:
    # The driver owns the session; apply the runtime confs our readers
    # need (nanosecond parquet timestamps arrive as long).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    # keep explicit semi-joins (series_limit) above their aggregates —
    # see dqe_spark/session.py for the rationale
    spark.conf.set(
        "spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.PushDownLeftSemiAntiJoin",
    )
    # bucketed-store scans: keep bucket pruning for filter-only queries
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    DQL: SELECT avg(events.* BUCKET 'events', 1m) LAST 30d — per-series
    1-minute averages over every metric in the store.
    """
    _configure(spark)
    from dqe_spark.queries_parity import glob_avg_1m

    return glob_avg_1m(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from dqe_spark.entry import all_queries

    wrapped = {}
    for name, fn in all_queries().items():
        def make(f):
            def run(spark: SparkSession, sf_dir: str) -> DataFrame:
                return f(_configure(spark), sf_dir)

            return run

        wrapped[name] = make(fn)
    return wrapped


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each query (omitted → rows-only check)."""
    from dqe_spark.entry import all_oracles

    return all_oracles()
