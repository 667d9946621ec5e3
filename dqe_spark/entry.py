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
    try:
        from dqe_spark import queries_ext

        merged.update(queries_ext.QUERIES)
    except ImportError:
        pass
    return merged


def all_oracles() -> dict[str, str]:
    from dqe_spark import queries_parity

    merged = dict(queries_parity.ORACLES)
    try:
        from dqe_spark import queries_ext

        merged.update(queries_ext.ORACLES)
    except ImportError:
        pass
    return merged
