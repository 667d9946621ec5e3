"""Engine facade: run DQL query strings against the metric store.

    from dqe_spark import engine
    results = engine.run(spark, "SELECT avg('events'.'click' BUCKET 'events', 1m) LAST 30m",
                         sf_dir="/root/testdata/sf0.001", now_ms=...)

Each result is a Result(name, kind, df, resolution_ms); df is a lazy
DataFrame — callers collect/write it (the reference's dqe:run returns
materialized replies, src/dqe.erl:158-267; here materialization is the
caller's choice, which is what makes 100 TB outputs writable).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from dqe_spark.dql.compiler import Compiler, PlanError, Result  # noqa: F401
from dqe_spark.dql.parser import parse
from dqe_spark.sources.metric_store import (
    BUCKET_RESOLUTION_MS,
    load_events,
    load_metrics,
)


def plan(
    spark: SparkSession,
    dql: str,
    sf_dir: str,
    now_ms: int | None = None,
) -> list[Result]:
    """Parse + compile; returns lazy per-statement results."""
    ast = parse(dql)
    comp = Compiler(
        metrics=load_metrics(spark, sf_dir),
        events=load_events(spark, sf_dir),
        resolutions=BUCKET_RESOLUTION_MS,
        now_ms=now_ms,
    )
    return comp.compile(ast)


def run(
    spark: SparkSession,
    dql: str,
    sf_dir: str,
    now_ms: int | None = None,
) -> list[Result]:
    return plan(spark, dql, sf_dir, now_ms)
