"""Anomaly primitives over windowed series: rolling z-score and
seasonal (hour-of-day) baseline deviation.

The reference stops at aggregates/transforms; alerting pipelines built
on it recompute anomaly scores client-side. These operators run them
engine-side, over the same windowed frames the §2.4 aggregates emit:

  * rolling_zscore — each point scored against the mean/stddev of its
    k PRECEDING points per series: one keyed sort (Window ROWS frame),
    state O(1) per row, cost O(points). At 100 TB the partition key is
    the series — the same shuffle the windowed aggregate upstream
    already performed, so Catalyst reuses the exchange.
  * seasonal_deviation — per-series hour-of-day baseline (the classic
    daily-seasonality profile) joined back; baseline table is
    |series|×24 rows, broadcast by AQE.

Numeric parity: inputs are 4dp-exact, so rolling sums accumulate v·10⁴
integers (exact, order-independent) and every float op derives from
identical integers on both engines — z-scores are bit-identical to the
DuckDB oracle (same rationale as windows.avg4_exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MS_PER_HOUR = 3_600_000
MS_PER_DAY = 86_400_000


def rolling_zscore(
    df: DataFrame,
    k: int = 12,
    keys: tuple[str, ...] = ("metric",),
    ts: str = "wts",
    v: str = "value",
    min_points: int = 4,
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """(keys..., ts, value, [keep...], zscore): each point vs its k
    predecessors.

    Rows with fewer than ``min_points`` predecessors or zero variance
    get NULL zscore (insufficient history, not "not anomalous" —
    callers decide). ``keep`` carries extra columns through unchanged
    (the DQL frontend threads confidence/dims this way)."""
    w = Window.partitionBy(*keys).orderBy(ts).rowsBetween(-k, -1)
    v4 = F.round(F.col(v) * 10000).cast("decimal(27,0)")
    extra = [c for c in keep if c in df.columns]
    # stage the three window aggregates as REAL columns before any
    # reuse: Catalyst expands every reference to a windowed Column
    # into its own window expression, so the direct formulation
    # evaluated FIFTEEN aggregate buffers per frame slide (count ×8,
    # sum ×4, sum-of-squares ×3 — visible as _we0.._we14 in the
    # physical plan) where three distinct ones exist. One projection
    # boundary, identical arithmetic, 5× less window work.
    staged = df.select(
        *keys,
        ts,
        v,
        *extra,
        F.count(v).over(w).alias("__n"),
        F.sum(v4).over(w).cast("double").alias("__s"),
        F.sum(v4 * v4).over(w).cast("double").alias("__ss"),
    )
    n = F.col("__n")
    s = F.col("__s")
    ss = F.col("__ss")
    nd = n.cast("double")
    mu = s / nd / 10000.0
    var = F.greatest(
        (nd * ss - s * s) / (nd * nd) / 100000000.0, F.lit(0.0)
    )
    sd = F.sqrt(var)
    z = F.when(
        (n >= min_points) & (sd > 0), F.round((F.col(v) - mu) / sd, 4)
    )
    return staged.select(*keys, ts, v, *extra, z.alias("zscore"))


def seasonal_deviation(
    df: DataFrame,
    keys: tuple[str, ...] = ("metric",),
    ts: str = "wts",
    v: str = "value",
) -> DataFrame:
    """(keys..., ts, value, baseline, deviation): value minus the
    series' average for that hour of day (exact avg4 arithmetic)."""
    hod = ((F.col(ts) % MS_PER_DAY) / MS_PER_HOUR).cast("int").alias("hod")
    s4 = f"sum(CAST(round({v} * 10000) AS DECIMAL(27,0)))"
    n = f"count({v})"
    q = (
        f"CASE WHEN {s4} >= 0 THEN (2 * {s4} + {n}) div (2 * {n}) "
        f"ELSE -((2 * -({s4}) + {n}) div (2 * {n})) END"
    )
    base = (
        df.select(*keys, hod, v)
        .groupBy(*keys, "hod")
        .agg(F.expr(f"CAST(({q}) AS DOUBLE) / 10000.0").alias("baseline"))
    )
    withh = df.select(*keys, ts, v, hod)
    return (
        withh.join(base, [*keys, "hod"])
        .select(
            *keys,
            ts,
            v,
            "baseline",
            F.round(F.col(v) - F.col("baseline"), 4).alias("deviation"),
        )
    )


def ewma(
    df: DataFrame,
    alpha: float = 0.3,
    k: int = 30,
    keys: tuple[str, ...] = ("metric",),
    ts: str = "wts",
    v: str = "value",
) -> DataFrame:
    """Exponentially weighted moving average over each point's
    k-window tail: the standard smoother alerting rules compare
    against. The recurrence s ← s·(1−α) + x·α folds over the ORDERED
    frame list (collect_list over a bounded ROWS window preserves
    frame order) seeded with the oldest element — the same sequential
    float ops the DuckDB oracle's list_reduce performs, so results are
    bit-identical. Bounded lookback keeps the per-row cost O(k) and
    the weight floor at (1−α)^k — the infinite-history tail below that
    is noise, not signal."""
    w = Window.partitionBy(*keys).orderBy(ts).rowsBetween(-k, 0)
    # collect the frame ONCE as a real column — the fold references
    # it three times (slice, size, seed), and every reference to a
    # windowed Column re-expands into its own collect_list window
    # (rolling_zscore rationale)
    staged = df.select(
        *keys,
        ts,
        v,
        F.collect_list(F.col(v).cast("double")).over(w).alias("__xs"),
    )
    xs = F.col("__xs")
    folded = F.aggregate(
        F.slice(xs, 2, F.greatest(F.size(xs) - 1, F.lit(0))),
        F.element_at(xs, 1),
        lambda acc, x: acc * (1.0 - alpha) + x * alpha,
    )
    # floor(x·10⁴ + 0.5) instead of round(x, 4): identical float
    # expression on both engines (comb_product rationale)
    ew4 = F.floor(folded * 10000 + F.lit(0.5)).cast("double") / 10000.0
    return staged.select(*keys, ts, v, ew4.alias("ewma"))


def holt_smooth(
    df: DataFrame,
    alpha: float = 0.3,
    beta: float = 0.2,
    k: int = 48,
    keys: tuple[str, ...] = ("metric",),
    ts: str = "wts",
    v: str = "value",
) -> DataFrame:
    """Holt double-exponential smoothing (level + linear trend) over
    each point's k-window tail, plus the one-step-ahead forecast —
    what a trend-aware alert compares the next observation against.

        l_t = α·x_t + (1−α)·(l_{t−1} + b_{t−1})
        b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}

    Same ordered-frame fold machinery as ewma(), with a struct
    accumulator (level, trend) seeded (x_0, 0). The float-op ORDER in
    the step is mirrored token-for-token by the DuckDB oracle's
    list_reduce lambda, so outputs are bit-identical; final 4dp via
    the floor(x·10⁴+0.5) shared-rounding trick."""
    a1, b1 = 1.0 - alpha, 1.0 - beta
    w = Window.partitionBy(*keys).orderBy(ts).rowsBetween(-k, 0)
    # stage the frame list, then the fold result, each as a real
    # column before reuse: the direct formulation re-expanded the
    # collect_list window NINE times (3 references to the fold × 3
    # references to the list inside it — _we0.._we8 in the physical
    # plan) and ran the O(k) fold three times per row. Two projection
    # boundaries, identical arithmetic, one window + one fold.
    staged = df.select(
        *keys,
        ts,
        v,
        F.collect_list(F.col(v).cast("double")).over(w).alias("__xs"),
    )
    xs = F.col("__xs")
    # accumulator is a 2-array [level, trend], NOT a struct: DuckDB
    # 1.0's list_reduce mis-evaluates multi-field struct accumulators
    # whose fields share subexpressions (verified empirically — the
    # 3-element fold disagrees with composing its own single steps);
    # the list form folds correctly and Spark mirrors it exactly.
    init = F.array(F.element_at(xs, 1), F.lit(0.0))

    def step(acc, x):
        l2 = x * alpha + (acc[0] + acc[1]) * a1
        b2 = (l2 - acc[0]) * beta + acc[1] * b1
        return F.array(l2, b2)

    st = F.aggregate(
        F.slice(xs, 2, F.greatest(F.size(xs) - 1, F.lit(0))), init, step
    )
    folded = staged.select(*keys, ts, v, st.alias("__st"))
    stc = F.col("__st")

    def r4(c):
        return F.floor(c * 10000 + F.lit(0.5)).cast("double") / 10000.0

    return folded.select(
        *keys,
        ts,
        v,
        r4(stc[0]).alias("level"),
        r4(stc[0] + stc[1]).alias("forecast"),
    )


def _cusum_chart(x4, k4: int, k: int):
    """Vectorized per-series CUSUM chart over int64 4dp values.

    Each row's (S⁺, S⁻) is the fold over its own (k+1)-point tail with
    that tail's rounded mean μ4 — identical to the Catalyst fold, but
    computed via the prefix-sum identity for a clamped running sum:

        fold max(0, acc + yₜ)  ==  P_m − min(P₀..P_m)   (P₀ = 0)
        fold min(0, acc + yₜ)  ==  P_m − max(P₀..P_m)

    so a whole block of rows evaluates as one cumsum + min/max over a
    strided sliding-window view — no per-row Python, O(k)/row in
    memory-bandwidth-cheap numpy ops instead of a Catalyst HOF
    re-entered per element. Processes full-tail rows in bounded
    chunks (≤ a few MB each); the first min(k, n) short-tail rows
    replay in plain Python (at most k rows per series)."""
    import numpy as np

    n = len(x4)
    cs = np.concatenate(([0], np.cumsum(x4)))
    idx = np.arange(n)
    lo = np.maximum(0, idx - k)
    m = idx - lo + 1
    s = cs[idx + 1] - cs[lo]
    mu4 = np.where(s >= 0, (2 * s + m) // (2 * m), -((-2 * s + m) // (2 * m)))
    sp = np.zeros(n, dtype=np.int64)
    sn = np.zeros(n, dtype=np.int64)
    head = min(k, n)
    for i in range(head):  # short tails: ≤ k rows, tail = x4[0..i]
        mu = int(mu4[i])
        a = b = 0
        for x in x4[: i + 1]:
            a = max(0, a + int(x) - mu - k4)
            b = min(0, b + int(x) - mu + k4)
        sp[i], sn[i] = a, b
    if n > k:
        from numpy.lib.stride_tricks import sliding_window_view

        W = sliding_window_view(x4, k + 1)  # row i ↔ tail of point k+i
        chunk = max(1, (1 << 22) // (8 * (k + 1)))  # ~4 MB blocks
        for st in range(k, n, chunk):
            en = min(n, st + chunk)
            win = W[st - k : en - k]
            yp = np.cumsum(win - (mu4[st:en, None] + k4), axis=1)
            yn = np.cumsum(win - (mu4[st:en, None] - k4), axis=1)
            sp[st:en] = yp[:, -1] - np.minimum(yp.min(axis=1), 0)
            sn[st:en] = yn[:, -1] - np.maximum(yn.max(axis=1), 0)
    return sp, sn


def cusum(
    df: DataFrame,
    kappa: float = 0.5,
    h: float = 4.0,
    k: int = 96,
    keys: tuple[str, ...] = ("metric",),
    ts: str = "wts",
    v: str = "value",
    impl: str = "arrow",
) -> DataFrame:
    """Two-sided CUSUM drift detection over each point's k-window
    tail: S⁺ accumulates positive drift above the tail mean beyond
    the slack κ, S⁻ negative drift, and either crossing h raises the
    alarm — the classic change-point chart for slow shifts a z-score
    never catches.

        S⁺ ← max(0, S⁺ + (x − μ − κ)),   S⁻ ← min(0, S⁻ + (x − μ + κ))

    Entirely in the INTEGER domain: inputs are 4dp window values, so
    x4/μ4/κ4/h4 are exact longs and the recurrence (max/min/+) never
    leaves integers — bit-identical cross-engine with no float-order
    discipline needed at all (μ4 is the sign-aware rounded tail mean).

    Two physical strategies, identical bit-for-bit results:

      * ``impl="arrow"`` (default) — per-series applyInPandas: one
        shuffle on the series key, then the whole chart evaluates as
        chunked numpy prefix-sum folds (_cusum_chart). ~5× cheaper
        than the Catalyst HOF at the same O(k)/row, because the fold
        never re-enters an interpreter per element. Holds one series
        in the worker at a time — fine for any real metrics cadence
        (a century of 1-minute points is ~4·10⁷ rows).
      * ``impl="sql"`` — the original windowed Catalyst fold: slower
        constant, but streams through ExternalAppendOnlyUnsafeRowArray
        (spills), so it also covers pathologically long single series.
    """
    k4 = int(round(kappa * 10000))
    h4 = int(round(h * 10000))
    # NULL values are dropped up front so both impls see the same
    # null-free series: without this, impl="sql"'s collect_list drops
    # NULLs from window frames while impl="arrow"'s
    # floor(NaN).astype(int64) is undefined (INT64_MIN on most
    # platforms), silently corrupting the chart — and even a non-NaN
    # treatment would disagree on frame extents (rowsBetween counts
    # physical rows). A chart has no meaningful S± at a missing point.
    df = df.where(F.col(v).isNotNull())
    if impl == "arrow":
        import pandas as pd

        fields = {f.name: f.dataType.simpleString() for f in df.schema.fields}
        out_schema = ", ".join(
            [f"{c} {fields[c]}" for c in (*keys, ts, v)]
            + ["cusum_pos double", "cusum_neg double", "alarm boolean"]
        )

        def chart(pdf: "pd.DataFrame") -> "pd.DataFrame":
            import numpy as np

            pdf = pdf.sort_values(ts)
            val = pdf[v].to_numpy(dtype=np.float64)
            # away-from-zero half-up ×10⁴, matching F.round/DuckDB round
            x4 = np.where(
                val >= 0,
                np.floor(val * 10000.0 + 0.5),
                -np.floor(-val * 10000.0 + 0.5),
            ).astype(np.int64)
            sp, sn = _cusum_chart(x4, k4, k)
            out = pdf[[*keys, ts, v]].copy()
            out["cusum_pos"] = sp / 10000.0
            out["cusum_neg"] = sn / 10000.0
            out["alarm"] = (sp >= h4) | (-sn >= h4)
            return out

        return (
            df.select(*keys, ts, v).groupBy(*keys).applyInPandas(chart, out_schema)
        )
    w = Window.partitionBy(*keys).orderBy(ts).rowsBetween(-k, 0)
    xs = F.collect_list(F.round(F.col(v) * 10000).cast("long")).over(w)
    s = F.aggregate(xs, F.lit(0).cast("long"), lambda a, x: a + x)
    n = F.size(xs).cast("long")
    mu4 = F.expr(
        "CASE WHEN __s >= 0 THEN (2 * __s + __n) div (2 * __n) "
        "ELSE -((2 * -__s + __n) div (2 * __n)) END"
    )
    zero = F.lit(0).cast("long")

    def step(acc, e):
        sp = F.greatest(
            zero, acc[0] + e[0] - F.col("__mu4") - F.lit(k4).cast("long")
        )
        sn = F.least(
            zero, acc[1] + e[1] - F.col("__mu4") + F.lit(k4).cast("long")
        )
        return F.array(sp, sn)

    folded = F.aggregate(
        F.transform(F.col("__xs"), lambda x: F.array(x, x)),
        F.array(zero, zero),
        step,
    )
    out = (
        df.select(
            *keys, ts, v, xs.alias("__xs"), s.alias("__s"), n.alias("__n")
        )
        .withColumn("__mu4", mu4)
        .withColumn("__st", folded)
    )
    sp, sn = F.col("__st")[0], F.col("__st")[1]
    return out.select(
        *keys,
        ts,
        v,
        (sp.cast("double") / 10000.0).alias("cusum_pos"),
        (sn.cast("double") / 10000.0).alias("cusum_neg"),
        ((sp >= h4) | (-sn >= h4)).alias("alarm"),
    )
