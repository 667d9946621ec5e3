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


def grouped_topk(
    df: DataFrame,
    group_keys: Sequence[str],
    rank_key: str,
    n: int,
    weight: Column | None = None,
) -> DataFrame:
    """Exact per-group heavy hitters: the n highest-weight ``rank_key``
    values within every ``group_keys`` group (e.g. top-k users per
    (event_type, hour) — the ops question "who is hammering this
    service right now" at 100 TB).

    Two phases, both key-shuffled and skew-tolerant:
      1. weight per (group, rank_key) — the partial aggregation dedups
         map-side, so one hot user becomes ONE row per partition before
         the shuffle (the Zipf absorber, same as text_vocab_top100);
      2. row_number over (group) ordered by (weight DESC, rank_key ASC)
         — deterministic ties — filtered to ≤ n. Rank partitions hold
         |distinct rank_key per group| rows, already aggregate-sized.
    Output: (*group_keys, rank_key, weight, rank)."""
    from pyspark.sql import Window

    w = (F.count(F.lit(1)) if weight is None else weight).alias("weight")
    per = df.groupBy(*group_keys, rank_key).agg(w)
    rank_w = Window.partitionBy(*group_keys).orderBy(
        F.col("weight").desc(), F.col(rank_key).asc()
    )
    return (
        per.withColumn("rank", F.row_number().over(rank_w))
        .where(F.col("rank") <= n)
    )
