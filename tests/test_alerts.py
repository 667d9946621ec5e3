"""Semantics tests for operators/alerts.py: for-duration runs break on
missing windows, fire only at the duration boundary, and the SLO alert
requires BOTH burn windows elevated."""

from __future__ import annotations

from dqe_spark.operators.alerts import slo_burn_rate, threshold_alerts


def _series(spark, rows):
    return spark.createDataFrame(rows, "metric string, wts long, value double")


def test_threshold_alerts_runs_and_gaps(spark):
    step = 60_000
    rows = [
        # m1: 3-window run (fires, for=3), then a gap, then a 2-window
        # run (too short) — the missing window at 180k must split them
        ("m1", 0, 9.0),
        ("m1", 60_000, 8.0),
        ("m1", 120_000, 7.5),
        ("m1", 240_000, 9.9),
        ("m1", 300_000, 9.9),
        # m2: below threshold throughout — never fires
        ("m2", 0, 1.0),
        ("m2", 60_000, 2.0),
        ("m2", 120_000, 3.0),
    ]
    out = threshold_alerts(
        _series(spark, rows), threshold=5.0, for_windows=3, step_ms=step
    ).collect()
    assert len(out) == 1
    a = out[0]
    assert (a.metric, a.start_wts, a.fire_wts, a.end_wts, a.n_windows, a.peak) == (
        "m1", 0, 120_000, 120_000, 3, 9.0
    )


def test_threshold_alerts_below_mode(spark):
    rows = [("m1", i * 1000, float(v)) for i, v in enumerate([9, 1, 2, 1, 9])]
    out = threshold_alerts(
        _series(spark, rows), threshold=5.0, for_windows=2, step_ms=1000,
        above=False,
    ).collect()
    assert len(out) == 1
    assert (out[0].start_wts, out[0].end_wts, out[0].n_windows) == (1000, 3000, 3)
    assert out[0].peak == 1.0  # worst = min when alerting on "below"


def test_slo_burn_requires_both_windows(spark):
    # fast window 1000 ms, slow 4000 ms. Slow window 0-4000 has 2/8
    # errors (2500 bp, burn 1.25); within it, fast window 0 is 2/2
    # errors and the others are clean. Second slow window is clean, so
    # even an all-error fast window there must not fire.
    rows = []
    for i, (ts, m) in enumerate(
        [
            (0, "e"), (500, "e"),            # fast 0: 10000 bp
            (1000, "ok"), (1500, "ok"),      # fast 1000: 0 bp
            (2000, "ok"), (2500, "ok"),
            (3000, "ok"), (3500, "ok"),
            (4000, "e"), (4500, "e"),        # fast 4000: 10000 bp, but
            (5000, "ok"), (5500, "ok"),      # slow 4000: 2/18 = 1111bp
        ]
    ):
        rows.append((m, ts, 1.0))
    rows += [("ok", 6000 + i * 100, 1.0) for i in range(10)]  # pad slow #2
    df = spark.createDataFrame(rows, "metric string, ts_ms long, value double")
    out = slo_burn_rate(
        df, error_metric="e", budget_bp=2000, threshold_e2=120,
        fast_ms=1000, slow_ms=4000,
    ).collect()
    assert [(r.wts, r.err_bp_fast, r.err_bp_slow) for r in out] == [
        (0, 10000, 2500)
    ]
    assert out[0].burn_fast_e2 == 500 and out[0].burn_slow_e2 == 125
