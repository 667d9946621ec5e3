"""Alerting operators: threshold-for-duration rules and SLO burn rate.

The reference evaluates queries on demand and leaves alerting to the
caller (its API returns series; `src/dqe.erl` has no rule engine).
These operators close that gap with the two rule shapes every metrics
stack converges on:

  * `threshold_alerts` — Prometheus-style ``expr > t FOR d``: the
    condition must hold for `for_windows` CONSECUTIVE windows before an
    alert fires; the output is one row per firing interval, not per
    breached window. Consecutiveness is the classic gaps-and-islands
    trick: within a series, `wts - row_number()*step` is constant
    exactly over runs of adjacent breached windows — two window
    expressions + one groupBy, no self-join, no range explosion. A
    missing window (no data) breaks the run, which matches the
    "condition must be continuously true" semantics.

  * `slo_burn_rate` — multi-window error-budget burn (the SRE-workbook
    fast/slow pattern): the 5m error ratio catches spikes, the
    containing 1h ratio confirms they are sustained, and an alert
    needs BOTH above the burn threshold. All ratios stay in the
    integer domain (basis points; burn in hundredths) so both engines
    agree bit-for-bit.

Scale: `threshold_alerts` shuffles once on the series key — the
row_number window hash-partitions by series, and the follow-up
(series, island) groupBy is satisfied by that same distribution (its
keys are a superset), so Catalyst inserts no second Exchange. The SLO
aggregates reduce to one row per time window before the fast↔slow
join, which AQE then broadcasts — at 100 TB the joined sides are
O(hours) and O(minutes/5), not O(events).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def threshold_alerts(
    df: DataFrame,
    threshold: float,
    for_windows: int,
    step_ms: int,
    value: str = "value",
    series: str = "metric",
    ts: str = "wts",
    above: bool = True,
) -> DataFrame:
    """Firing intervals where `value` breaches `threshold` for at least
    `for_windows` consecutive `step_ms` windows.

    Output: (series..., start_wts, fire_wts, end_wts, n_windows, peak)
    — start of the run, the window at which the rule transitions to
    firing (start + (for_windows-1)*step), end of the run, run length,
    and the worst value seen (max when above=True, else min).
    ``series`` may be one column name or a sequence of key columns
    (multi-key frames from GROUP BY tags).
    """
    series_cols = [series] if isinstance(series, str) else list(series)
    cond = F.col(value) > threshold if above else F.col(value) < threshold
    b = df.where(cond)
    w = Window.partitionBy(*series_cols).orderBy(ts)
    b = b.withColumn(
        "__island", F.col(ts) - F.row_number().over(w) * F.lit(step_ms)
    )
    peak = F.max(value) if above else F.min(value)
    return (
        b.groupBy(*series_cols, "__island")
        .agg(
            F.min(ts).alias("start_wts"),
            F.max(ts).alias("end_wts"),
            F.count("*").alias("n_windows"),
            peak.alias("peak"),
        )
        .where(F.col("n_windows") >= for_windows)
        .withColumn(
            "fire_wts",
            F.col("start_wts") + F.lit((for_windows - 1) * step_ms),
        )
        .select(
            *series_cols, "start_wts", "fire_wts", "end_wts", "n_windows", "peak"
        )
    )


def slo_burn_rate(
    metrics: DataFrame,
    error_metric: str,
    budget_bp: int,
    threshold_e2: int,
    fast_ms: int = 300_000,
    slow_ms: int = 3_600_000,
    ts: str = "ts_ms",
    series: str = "metric",
) -> DataFrame:
    """Multi-window burn-rate alert over an event-ratio SLO.

    Every point in `metrics` counts toward the total; points whose
    `series` equals `error_metric` count as budget-burning failures.
    Per fast window: ``err_bp = 10000·errors div total`` (basis
    points); burn in hundredths ``burn_e2 = 100·err_bp div
    budget_bp``. Same for the containing slow window. A row fires only
    when BOTH burns reach `threshold_e2`.

    Output: (wts, err_bp_fast, err_bp_slow, burn_fast_e2,
    burn_slow_e2), one row per firing fast window.
    """
    if slow_ms % fast_ms:
        raise ValueError("slow_ms must be a multiple of fast_ms")
    err = F.sum(F.when(F.col(series) == error_metric, 1).otherwise(0))

    def ratios(win_ms: int, suffix: str) -> DataFrame:
        return (
            metrics.withColumn(
                "wts", (F.col(ts) - (F.col(ts) % F.lit(win_ms))).cast("long")
            )
            .groupBy("wts")
            .agg(
                (F.lit(10000) * err).alias("e"),
                F.count("*").alias("n"),
            )
            .select(
                "wts",
                F.expr("e div n").cast("long").alias(f"err_bp_{suffix}"),
            )
            .withColumn(
                f"burn_{suffix}_e2",
                F.expr(f"(100 * err_bp_{suffix}) div {budget_bp}").cast("long"),
            )
        )

    fast = ratios(fast_ms, "fast")
    slow = ratios(slow_ms, "slow").withColumnRenamed("wts", "slow_wts")
    return (
        fast.join(
            slow,
            (F.col("wts") - (F.col("wts") % F.lit(slow_ms))) == F.col("slow_wts"),
        )
        .where(
            (F.col("burn_fast_e2") >= threshold_e2)
            & (F.col("burn_slow_e2") >= threshold_e2)
        )
        .select("wts", "err_bp_fast", "err_bp_slow", "burn_fast_e2", "burn_slow_e2")
    )
