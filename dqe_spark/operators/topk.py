"""TOP n BY f / BOTTOM n BY f — whole-series ranking (§2.8).

The reference scores each *result series* with a scalar aggregate over
the full range, sorts, and keeps n
(/root/reference/src/dqe_funnel.erl:36-71; grammar
src/dql_parser.yrl:41-44). Spark shape: score per series key →
orderBy.limit(n) (tiny: one row per series) → broadcast semi-join back
onto the data. The semi-join side is n rows, so it broadcasts by
construction — no full shuffle of the data at any scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def series_limit(
    df: DataFrame,
    n: int,
    score: Column,
    top: bool = True,
    keys: Sequence[str] = ("metric",),
) -> DataFrame:
    """Keep the n series with the highest (top) / lowest (bottom) score.

    ``score`` is an aggregate expression over the whole range (the
    reference permits any aggregate; avg is the canonical one). Ties are
    broken by the series key so results are deterministic.
    """
    scores = df.groupBy(*keys).agg(score.alias("__score"))
    order = [F.col("__score").desc() if top else F.col("__score").asc()] + [
        F.col(k).asc() for k in keys
    ]
    winners = scores.orderBy(*order).limit(n).select(*keys)
    return df.join(broadcast(winners), on=list(keys), how="left_semi")
