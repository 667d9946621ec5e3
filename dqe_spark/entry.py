"""Aggregated query registry — feeds __spark_entry__.py.

Merges the reference-parity inventory (queries_parity) with the
large-scale pipeline extensions (queries_ext, added incrementally).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from dqe_spark import queries_parity

    merged = dict(queries_parity.QUERIES)
    for mod in ("queries_ext", "queries_dql"):
        try:
            m = __import__(f"dqe_spark.{mod}", fromlist=["QUERIES"])
            merged.update(m.QUERIES)
        except ImportError:
            pass
    return merged


def all_oracles() -> dict[str, str]:
    from dqe_spark import queries_parity

    merged = dict(queries_parity.ORACLES)
    for mod in ("queries_ext", "queries_dql"):
        try:
            m = __import__(f"dqe_spark.{mod}", fromlist=["ORACLES"])
            merged.update(m.ORACLES)
        except ImportError:
            pass
    return merged
