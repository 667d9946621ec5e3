"""Point-wise transforms & scalar arithmetic — the §2.6 family.

One series in, one series out, resolution-preserving
(/root/reference/src/dqe.erl:88-102). All are single Column expressions
(narrow, no shuffle) except ``derivate`` which needs a per-series
ordered window (one shuffle on the series key — unavoidable, and the
partition key is the series so it scales with series count).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from dqe_spark.operators.windows import rounded


def derivate(
    df: DataFrame, keys: Sequence[str] = ("metric",), ts: str = "ts_ms", v: str = "value"
) -> DataFrame:
    """v'(t) = v(t) - v(t-1) per series, ordered by time.

    The reference emits N-1 points per chunk (mmath derivate;
    /root/reference/src/dqe_derivate.erl:23-32) — we drop the first
    point of each series (lag undefined) to match.
    """
    w = Window.partitionBy(*keys).orderBy(ts)
    d = df.withColumn("__prev", F.lag(v).over(w))
    return (
        d.where(F.col("__prev").isNotNull())
        .withColumn(v, rounded(F.col(v) - F.col("__prev")))
        .drop("__prev")
    )


# -- pure Column transforms (src/dqe.erl:88-102 registrations) --------------

def t_abs(v: Column) -> Column:  # src/dqe_abs_trans.erl:23-27
    return F.abs(v)


def t_sqrt_scale(v: Column) -> Column:  # src/dqe_sqrt_scale_trans.erl:23-27
    # reference semantics: sqrt_scale(0) = 0, sqrt_scale(-N) =
    # -sqrt_scale(N) (src/dqe_sqrt_scale_trans.erl help text)
    return rounded(F.signum(v) * F.sqrt(F.abs(v)))


def t_log10_scale(v: Column) -> Column:  # src/dqe_log10_scale_trans.erl:23-27
    # reference semantics: log10_scale(0) = 0, log10_scale(-N) =
    # -log10_scale(N) (the module's help text)
    return rounded(
        F.when(v == 0, F.lit(0.0)).otherwise(F.signum(v) * F.log10(F.abs(v)))
    )


def t_min(v: Column, c: float) -> Column:
    """Point-wise clamp-above: min(v, c) (src/dqe_min_trans.erl:24-28;
    same surface name as the aggregate — the DQL resolver picks by
    signature [metric, number])."""
    return F.least(v, F.lit(float(c)))


def t_max(v: Column, c: float) -> Column:  # src/dqe_max_trans.erl:24-28
    return F.greatest(v, F.lit(float(c)))


def t_add(v: Column, c: float) -> Column:  # src/dqe_add_arith.erl:27-31
    return rounded(v + F.lit(float(c)))


def t_sub(v: Column, c: float) -> Column:  # src/dqe_sub_arith.erl:26-31
    return rounded(v - F.lit(float(c)))


def t_mul(v: Column, c: float) -> Column:  # src/dqe_mul_arith.erl:26-31
    return rounded(v * F.lit(float(c)))


def t_divide(v: Column, c: float) -> Column:
    """÷ constant; the reference rejects c == 0 at init
    (src/dqe_divide_arith.erl:12) — we raise at plan time too."""
    if float(c) == 0.0:
        raise ValueError("divide: constant must be non-zero")
    return rounded(v / F.lit(float(c)))


def t_confidence(df: DataFrame, v: str = "value", conf: str = "confidence") -> DataFrame:
    """Replace each value with its confidence channel
    (src/dqe_confidence.erl:23-32)."""
    return df.withColumn(v, F.col(conf))


TRANSFORMS = {
    "abs": t_abs,
    "sqrt_scale": t_sqrt_scale,
    "log10_scale": t_log10_scale,
    "min": t_min,
    "max": t_max,
    "add": t_add,
    "sub": t_sub,
    "mul": t_mul,
    "divide": t_divide,
}


def counter_rate(
    df: DataFrame,
    window_ms: int,
    keys: tuple[str, ...] = ("metric",),
    ts: str = "ts_ms",
    v: str = "value",
    out: str = "rate",
) -> DataFrame:
    """Counter-reset-aware rate: Σ max(Δ, 0) per (series, window) —
    the PromQL `increase` semantics. A monotone counter that restarts
    (process restart → value drops to ~0) must not contribute a huge
    negative delta; clamping each per-point delta at zero counts only
    genuine increments. Deltas of 2-decimal inputs are 2-decimal —
    summed in exact DECIMAL, so the result is engine-exact.

    Plan: one keyed sort for lag() (the same (series) partitioning the
    window aggregate shuffles on) + one window groupBy; cost O(points),
    no self-join."""
    from pyspark.sql import Window as _W

    # total order (ts, value): same-timestamp points otherwise make
    # the lag sequence nondeterministic on BOTH engines
    w = _W.partitionBy(*keys).orderBy(ts, v)
    delta = F.col(v) - F.lag(v).over(w)
    pos = F.when(delta > 0, delta).otherwise(F.lit(0.0))
    wts = (F.col(ts) - (F.col(ts) % F.lit(window_ms))).alias("wts")
    return (
        df.select(*keys, wts, pos.alias("__d"))
        .groupBy(*keys, "wts")
        .agg(
            rounded(
                F.sum(F.col("__d").cast("decimal(18,2)")).cast("double")
            ).alias(out)
        )
    )
