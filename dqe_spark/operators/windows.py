"""Time-window aggregation — the §2.4 operator family.

The reference folds each window of ``to_ms(t) div resolution`` points of
one series into one point (e.g. sum: /root/reference/src/dqe_sum_aggr.erl:26-34;
window arithmetic: src/dqe_time.erl:6-10). Series there are dense arrays
at a fixed resolution, so count-based windows and time-based windows
coincide. Our row-oriented model uses the time-based formulation
directly:

    wts = floor(ts_ms / window_ms) * window_ms

which is exactly what the dense formulation computes for an aligned
series, and is the Spark-native shape: one ``groupBy(keys, wts)`` with
built-in aggregate expressions — map-side partial aggregation, whole-
stage codegen, no UDFs, no shuffle beyond the one the groupBy needs.

At 100 TB: the shuffle key (metric, wts) is high-cardinality and evenly
spread, so the agg scales linearly; AQE coalesces the post-shuffle
partitions. The input scan carries the bucket/metric/time predicates
(pushed to Parquet), so a 30-minute query over one series never touches
the other 99.99% of the store.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ROUND_DP = 4  # defensive rounding so Spark/DuckDB double folds hash-match


def wts_col(window_ms: int, ts: str = "ts_ms") -> Column:
    """Window-start timestamp (ms) for each point."""
    return (F.floor(F.col(ts) / F.lit(window_ms)) * window_ms).cast("long").alias("wts")


def rounded(c: Column, dp: int = ROUND_DP) -> Column:
    return F.round(c, dp)


# ---------------------------------------------------------------------------
# Aggregate expression builders: name -> (value_col, *const_args) -> Column.
# Mirrors the reference registrations at /root/reference/src/dqe.erl:63-87.
# All are built-in JVM expressions (whole-stage codegen) — the mmath C-NIF
# vectorization of the reference is subsumed by Tungsten.
# ---------------------------------------------------------------------------

#: Every value feeding an aggregate is 4dp-exact by construction (raw
#: store values are 2-decimal, confidence 1-decimal, and every
#: transform/aggregate output passes through rounded()), so DECIMAL
#: (18,4) accumulation is EXACT and order-independent — float-
#: association half-boundary flips between engines (observed at sf0.1:
#: ~20 last-digit mismatches per 80k rows with plain double sums)
#: cannot occur. One identical double division at the end for avg.
def _dsum(v: str) -> Column:
    return F.sum(F.col(v).cast("decimal(18,4)")).cast("double")


def agg_sum(v: str) -> Column:  # src/dqe_sum_aggr.erl:26-30
    return rounded(_dsum(v))


def avg4_exact(v: str) -> Column:
    """Engine-exact 4dp average. The average of 4dp-exact inputs is
    the rational Σ(v·10⁴) / (n·10⁴); rounding IT to 4dp is done in
    integer arithmetic — (2·Σv4 + n) div (2·n) — because rounding the
    double instead diverges between engines at exact .xxxx5 halves
    (Spark rounds the double's shortest decimal repr, DuckDB its
    binary value; ~20 per 80k windows flipped at sf0.1). `div`
    truncates identically in Spark and DuckDB (`//`). The result is
    an exact 4dp double on both engines, bit-identical."""
    s4 = f"sum(CAST(round({v} * 10000) AS DECIMAL(27,0)))"
    n = f"count({v})"
    # sign-aware: div truncates toward zero, so the +n/2 half-offset
    # only rounds half-up for nonnegative sums; negatives mirror it
    # (round-half-away-from-zero, matching both engines' round())
    q = (
        f"CASE WHEN {s4} >= 0 THEN (2 * {s4} + {n}) div (2 * {n}) "
        f"ELSE -((2 * -({s4}) + {n}) div (2 * {n})) END"
    )
    return F.expr(f"CAST(({q}) AS DOUBLE) / 10000.0")


def agg_avg(v: str) -> Column:  # src/dqe_avg_aggr.erl:27-31
    return avg4_exact(v)


def agg_min(v: str) -> Column:  # src/dqe_min_aggr.erl:25-29
    return rounded(F.min(v))


def agg_max(v: str) -> Column:  # src/dqe_max_aggr.erl:26-30
    return rounded(F.max(v))


def agg_variance(v: str) -> Column:  # src/dqe_variance_aggr.erl:27-31
    return rounded(F.var_pop(v))


def agg_stddev(v: str) -> Column:  # src/dqe_stddev_aggr.erl:27-31
    return rounded(F.stddev_pop(v))


def _var_exact(v: str) -> Column:
    """Population variance for FIXED 2-DECIMAL inputs, FULLY exact:
    `(n·Σx² − (Σx)²) / n²` with the numerator in exact integer
    (v·100 units — numerator is then var·10⁴·n² exactly) and the 4dp
    rounding done by integer division, (2·numer + n²) div (2·n²) —
    the avg4_exact rationale: float rounding of the quotient diverges
    between engines at exact half-boundaries (14 windows at sf0.1).
    The naive `Σx²/n − (Σx/n)²` in double additionally cancels
    catastrophically. Raw scans, rollup partials
    (sources/rollup.py partial_value_expr) and the DuckDB oracle all
    reproduce this bit-for-bit. Widths: d² sums cast (22,0),
    (12,0)·(22,0) → (35,0), minus (17,0)² → (36,0); ×2 + n² ≤ (38,0).
    Numerator ≥ 0 by Cauchy-Schwarz (exact integers — no clamp
    needed; kept for belt and braces)."""
    d = f"CAST(round({v} * 100) AS DECIMAL(16,0))"
    n = f"count({v})"
    numer = (
        f"(CAST({n} AS DECIMAL(12,0)) * CAST(sum({d} * {d}) AS DECIMAL(22,0)) "
        f"- CAST(sum({d}) AS DECIMAL(17,0)) * CAST(sum({d}) AS DECIMAL(17,0)))"
    )
    nsq = f"(CAST({n} AS DECIMAL(12,0)) * CAST({n} AS DECIMAL(12,0)))"
    return F.greatest(
        F.expr(
            f"CAST(((2 * {numer} + {nsq}) div (2 * {nsq})) AS DOUBLE) / 10000.0"
        ),
        F.lit(0.0),
    )


def agg_variance_exact(v: str) -> Column:
    """Exact-decimal variance — only valid when `v` holds 2-decimal
    fixed-point values (the raw metric store); the compiler selects it
    for pristine scans so rollup-answered and raw-answered queries
    can never disagree."""
    return rounded(_var_exact(v))


def agg_stddev_exact(v: str) -> Column:
    return rounded(F.sqrt(_var_exact(v)))


def agg_median(v: str) -> Column:  # src/dqe_median_aggr.erl:27-31
    return agg_percentile(v, 0.5)


def agg_percentile(v: str, p: float) -> Column:
    """Exact percentile with linear interpolation.

    The reference halves an integer p at init (quirk preserved in the
    DQL frontend, src/dqe_percentile_aggr.erl:15-18); here p is already
    a 0..1 float. Exact (not approx) so the DuckDB quantile_cont oracle
    matches bit-for-bit before rounding.
    """
    return rounded(F.percentile(F.col(v), F.lit(float(p))))


def agg_count_above(v: str, c: float) -> Column:  # src/dqe_count_above_aggr.erl:31-37
    return F.sum(F.when(F.col(v) > c, 1).otherwise(0)).cast("long")


def agg_count_below(v: str, c: float) -> Column:  # src/dqe_count_below_aggr.erl:31-33
    return F.sum(F.when(F.col(v) < c, 1).otherwise(0)).cast("long")


def _crossing(v: str, c: float, above: bool) -> Column:
    return F.col(v) > c if above else F.col(v) < c


def agg_first_above(v: str, c: float, ts: str = "ts_ms") -> Column:
    """Earliest point in the window with value above c
    (src/dqe_first_above_aggr.erl:31-33). min_by ignores null ordering
    keys, so points failing the threshold don't participate."""
    cond = _crossing(v, c, True)
    return rounded(F.min_by(F.when(cond, F.col(v)), F.when(cond, F.col(ts))))


def agg_first_below(v: str, c: float, ts: str = "ts_ms") -> Column:
    cond = _crossing(v, c, False)
    return rounded(F.min_by(F.when(cond, F.col(v)), F.when(cond, F.col(ts))))


def agg_last_above(v: str, c: float, ts: str = "ts_ms") -> Column:
    cond = _crossing(v, c, True)
    return rounded(F.max_by(F.when(cond, F.col(v)), F.when(cond, F.col(ts))))


def agg_last_below(v: str, c: float, ts: str = "ts_ms") -> Column:
    cond = _crossing(v, c, False)
    return rounded(F.max_by(F.when(cond, F.col(v)), F.when(cond, F.col(ts))))


#: The *_conf family (src/dqe.erl:75-80, e.g. dqe_count_above_conf_aggr.erl:32-37)
#: is the same six expressions evaluated over the confidence channel —
#: callers pass v="confidence".

AGGREGATES = {
    "sum": agg_sum,
    "avg": agg_avg,
    "min": agg_min,
    "max": agg_max,
    "variance": agg_variance,
    "stddev": agg_stddev,
    "median": agg_median,
    "percentile": agg_percentile,
    "count_above": agg_count_above,
    "count_below": agg_count_below,
    "first_above": agg_first_above,
    "first_below": agg_first_below,
    "last_above": agg_last_above,
    "last_below": agg_last_below,
}


def window_agg(
    df: DataFrame,
    window_ms: int,
    agg: Column,
    out: str,
    keys: Sequence[str] = ("metric",),
    ts: str = "ts_ms",
) -> DataFrame:
    """groupBy(keys, window) → one aggregated point per window.

    Returns (keys..., wts, out) sorted nowhere — ordering is the
    caller's concern (results hash order-insensitively).
    """
    return (
        df.withColumn("wts", wts_col(window_ms, ts))
        .groupBy(*keys, "wts")
        .agg(agg.alias(out))
    )


# ---------------------------------------------------------------------------
# Skew handling: salted two-phase aggregation.
#
# The (key, wts) shuffle key is normally well-spread, but one hot
# series (a metric every host emits, a tenant 1000× the median) can
# put an entire reduce partition on one core. AQE's skew-join split
# doesn't apply to aggregations, so the classic fix is salting:
# phase 1 aggregates (key, wts, salt) — the hot group fans out over
# `salt_n` reducers — phase 2 merges the per-salt partials. Only
# aggregates with a partial/merge decomposition qualify (same algebra
# as the rollup store).
# ---------------------------------------------------------------------------

_SALTABLE = {
    # sum partials accumulate in exact decimal like agg_sum, so the
    # salted and plain paths stay bit-identical
    "sum": (
        lambda v: F.sum(F.col(v).cast("decimal(18,4)")),
        lambda c: F.sum(c).cast("double"),
    ),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_window_agg(
    df: DataFrame,
    window_ms: int,
    agg_name: str,
    value: str,
    out: str,
    keys: Sequence[str] = ("metric",),
    ts: str = "ts_ms",
    salt_n: int = 16,
) -> DataFrame:
    """window_agg for skewed keys: identical results, two shuffles,
    no single-reducer hot spot. `avg` callers salt sum+count and
    divide (see rollup_window_agg for the same algebra)."""
    if agg_name not in _SALTABLE:
        raise ValueError(f"{agg_name!r} has no partial/merge decomposition")
    partial, merge = _SALTABLE[agg_name]
    salted = df.withColumn("wts", wts_col(window_ms, ts)).withColumn(
        "__salt", (F.rand(seed=0) * salt_n).cast("int")
    )
    p1 = salted.groupBy(*keys, "wts", "__salt").agg(partial(value).alias("__p"))
    return (
        p1.groupBy(*keys, "wts")
        .agg(rounded(merge("__p")).alias(out))
    )
