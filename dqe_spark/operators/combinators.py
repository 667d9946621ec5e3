"""Multi-series combinators — the §2.5 family (N series → 1 series).

The reference aligns N dense series positionally and folds point-wise
(/root/reference/src/dqe.erl:103-111; e.g. src/dqe_avg_comb.erl:22-26).
Positional alignment at equal resolution == equal timestamp, so the
row-model formulation is:

  * commutative folds (sum/avg/min/max/product): union the inputs and
    ``groupBy(ts)`` — ONE shuffle regardless of N, no join.
  * ordered folds (diff/quotient): a 2-way equi-join on ts per step
    (the reference left-folds; N inputs = N-1 joins). In practice the
    overwhelmingly common case is 2 series.

Mixed input resolutions are a plan-time error in the reference
(resolution_conflict, src/dql_resolution.erl:96-112); our frontend
enforces the same.

Scale: the union+groupBy path is the one to prefer at 100 TB — it is a
single hash aggregation keyed by (ts) within an already-filtered set of
series. The join path broadcasts nothing and shuffles both sides on ts;
for exactly-2 combinators over the same store Catalyst usually reuses
the exchange.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dqe_spark.operators.windows import rounded


def _union(dfs: Sequence[DataFrame], ts: str, v: str) -> DataFrame:
    slim = [d.select(ts, v) for d in dfs]
    return reduce(lambda a, b: a.unionByName(b), slim)


def _dsum(v: str):
    # inputs are 4dp-rounded by the upstream aggregate/transform, so
    # decimal(18,4) accumulation is exact and order-independent (same
    # rationale as windows._dsum — kills cross-engine last-ulp flips)
    return F.sum(F.col(v).cast("decimal(18,4)")).cast("double")


def comb_sum(dfs: Sequence[DataFrame], ts: str = "ts_ms", v: str = "value") -> DataFrame:
    # src/dqe_sum_comb.erl:22-26
    return _union(dfs, ts, v).groupBy(ts).agg(rounded(_dsum(v)).alias(v))


def comb_avg(dfs: Sequence[DataFrame], ts: str = "ts_ms", v: str = "value") -> DataFrame:
    # src/dqe_avg_comb.erl:22-26; integer-domain 4dp rounding — see
    # windows.avg4_exact for why float rounding diverges cross-engine
    from dqe_spark.operators.windows import avg4_exact

    return _union(dfs, ts, v).groupBy(ts).agg(avg4_exact(v).alias(v))


def comb_min(dfs: Sequence[DataFrame], ts: str = "ts_ms", v: str = "value") -> DataFrame:
    # src/dqe_min_comb.erl:22-26
    return _union(dfs, ts, v).groupBy(ts).agg(rounded(F.min(v)).alias(v))


def comb_max(dfs: Sequence[DataFrame], ts: str = "ts_ms", v: str = "value") -> DataFrame:
    # src/dqe_max_comb.erl:22-26
    return _union(dfs, ts, v).groupBy(ts).agg(rounded(F.max(v)).alias(v))


def comb_product(dfs: Sequence[DataFrame], ts: str = "ts_ms", v: str = "value") -> DataFrame:
    """Point-wise product (src/dqe_product_comb.erl:22-26) — Spark 3.2+
    has a native ``product`` aggregate, keeping the union+groupBy shape.

    Rounding: ``floor(p·10⁴ + 0.5) / 10⁴`` instead of round(p, 4) —
    the product double is bit-identical cross-engine (one IEEE multiply
    for the dominant 2-series case), but the engines' round() functions
    disagree at exact .xxxx5 halves (scale-8 products hit them often:
    33 windows at sf0.1). floor of the identical float expression is
    identical everywhere. The oracle uses the same formula."""
    prod4 = (F.floor(F.product(v) * 10000 + F.lit(0.5)).cast("double")) / 10000.0
    return _union(dfs, ts, v).groupBy(ts).agg(prod4.alias(v))


def _fold_join(
    dfs: Sequence[DataFrame], op, ts: str, v: str
) -> DataFrame:
    """Left-fold over an inner equi-join on ts (ordered combinators)."""
    acc = dfs[0].select(ts, F.col(v).alias("__acc"))
    for d in dfs[1:]:
        rhs = d.select(ts, F.col(v).alias("__rhs"))
        acc = (
            acc.join(rhs, on=ts, how="inner")
            .select(ts, op(F.col("__acc"), F.col("__rhs")).alias("__acc"))
        )
    return acc.select(ts, rounded(F.col("__acc")).alias(v))


def comb_diff(dfs: Sequence[DataFrame], ts: str = "ts_ms", v: str = "value") -> DataFrame:
    """Order-sensitive left-fold subtraction (src/dqe_diff_comb.erl:22-26)."""
    return _fold_join(dfs, lambda a, b: a - b, ts, v)


def comb_quotient(dfs: Sequence[DataFrame], ts: str = "ts_ms", v: str = "value") -> DataFrame:
    """Left-fold division; division by zero is treated as division by
    ONE — documented reference behavior
    (src/dqe_quotient_comb.erl:28-31)."""
    return _fold_join(
        dfs, lambda a, b: a / F.when(b == 0, F.lit(1.0)).otherwise(b), ts, v
    )


COMBINATORS = {
    "sum": comb_sum,
    "avg": comb_avg,
    "min": comb_min,
    "max": comb_max,
    "product": comb_product,
    "diff": comb_diff,
    "quotient": comb_quotient,
}
