"""Dense-series semantics: NULL-fill for empty windows.

The reference emits NULL-filled dense arrays for ranges with no data
(/root/reference/src/dqe_get.erl:53-60) — every window in the query
range exists in the output, value NULL when nothing was recorded. Our
long-format results drop empty windows by construction, so this
operator re-densifies: a generated time spine per series, left-joined
against the aggregated frame.

Scale: the spine is sequence()/explode over (series × windows) —
generated, not shuffled; the left join is keyed on (series, wts) and
broadcast-able when the aggregated side is small. For dashboards over
narrow ranges this is cheap; for wide ranges prefer leaving sparsity
to the client (dense 100 TB output defeats the point).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def densify(
    agg: DataFrame,
    start_ms: int,
    end_ms: int,
    window_ms: int,
    keys: Sequence[str] = ("metric",),
    ts: str = "wts",
    value: str = "value",
) -> DataFrame:
    """Left-join the aggregated frame onto a full time spine.

    Output has one row per (series, window) for every window whose
    start lies in [floor(start/w)*w, end); missing aggregates are NULL.
    """
    first = (start_ms // window_ms) * window_ms
    last = end_ms - 1  # windows starting before end
    series = agg.select(*keys).distinct()
    spine = series.select(
        *keys,
        F.explode(
            F.sequence(F.lit(first), F.lit(last), F.lit(window_ms))
        ).alias(ts),
    )
    return spine.join(agg, on=[*keys, ts], how="left")


def fill_forward(
    dense: DataFrame,
    keys: Sequence[str] = ("metric",),
    ts: str = "wts",
    value: str = "value",
    out: str = "filled",
) -> DataFrame:
    """LOCF gap fill over a densified frame: each NULL window takes the
    series' last observed value (still NULL before the first
    observation — honest leading edge, never back-fills).

    Plan: one keyed Window with last_value(ignoreNulls) over an
    unbounded-preceding ROWS frame — a single (series) shuffle + sort,
    O(points) state-free scan within each partition; the same shape as
    derivate, so the exchange is shared when both run over one frame."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*keys)
        .orderBy(ts)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return dense.withColumn(out, F.last(value, ignorenulls=True).over(w))


def fill_linear(
    dense: DataFrame,
    keys: Sequence[str] = ("metric",),
    ts: str = "wts",
    value: str = "value",
    out: str = "filled",
) -> DataFrame:
    """Linear-interpolation gap fill: each NULL window between two
    observations takes the time-weighted line between them; leading and
    trailing gaps (no neighbor on one side) stay NULL.

    Plan: two Window passes over ONE keyed sort — previous observed
    (value, ts) via last(ignoreNulls) over the preceding frame, next
    observed via first(ignoreNulls) over the following frame; the
    interpolation itself is a narrow projection. Rounded at 4dp via
    floor(x·10⁴+0.5)/10⁴ — interpolated midpoints of 4dp inputs land
    exactly on .xxxx5 halves, where the engines' round() functions
    diverge (PERF.md, cross-engine exactness); the floor of the
    bit-identical double is identical everywhere."""
    from pyspark.sql import Window

    wp = (
        Window.partitionBy(*keys)
        .orderBy(ts)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = (
        Window.partitionBy(*keys)
        .orderBy(ts)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    vts = F.when(F.col(value).isNotNull(), F.col(ts))
    # stage the four window results as REAL columns before reuse:
    # every reference to a windowed Column re-expands into its own
    # window expression (the interpolation line references prev/next
    # value three times and each timestamp twice — ten window
    # aggregates where four exist; anomaly.rolling_zscore rationale)
    staged = dense.select(
        "*",
        F.last(value, ignorenulls=True).over(wp).alias("__pv"),
        F.last(vts, ignorenulls=True).over(wp).alias("__pt"),
        F.first(value, ignorenulls=True).over(wn).alias("__nv"),
        F.first(vts, ignorenulls=True).over(wn).alias("__nt"),
    )
    prev_v, prev_t = F.col("__pv"), F.col("__pt")
    next_v, next_t = F.col("__nv"), F.col("__nt")
    frac = (F.col(ts) - prev_t).cast("double") / (next_t - prev_t).cast("double")
    raw = prev_v + frac * (next_v - prev_v)
    interp = F.floor(raw * 10000 + F.lit(0.5)).cast("double") / 10000.0
    filled = (
        F.when(F.col(value).isNotNull(), F.col(value))
        .when(prev_v.isNotNull() & next_v.isNotNull(), interp)
    )
    return staged.withColumn(out, filled).drop(
        "__pv", "__pt", "__nv", "__nt"
    )
