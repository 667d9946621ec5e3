"""Rollup store: pre-aggregated partials must answer distributive
window aggregates identically to a raw scan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_rollup_equals_raw(spark):
    from dqe_spark.operators.windows import agg_avg, window_agg
    from dqe_spark.sources.metric_store import load_metrics
    from dqe_spark.sources.rollup import load_rollup, rollup_window_agg

    r = load_rollup(spark, SF_SMOKE, 60_000)
    got = rollup_window_agg(r, 3_600_000, "avg")

    m = load_metrics(spark, SF_SMOKE)
    expect = window_agg(m, 3_600_000, agg_avg("value"), "avg_value")
    a = {(x["metric"], x["wts"], x["value"]) for x in got.collect()}
    b = {
        (x["metric"], x["wts"], round(x["avg_value"], 4))
        for x in expect.collect()
    }
    assert a == b and a


def test_rollup_guards(spark):
    from dqe_spark.sources.rollup import load_rollup, rollup_window_agg, supports

    r = load_rollup(spark, SF_SMOKE, 60_000)
    assert not supports("percentile")
    with pytest.raises(ValueError):
        rollup_window_agg(r, 3_600_000, "percentile")
    with pytest.raises(ValueError):
        rollup_window_agg(r, 90_000, "avg")  # not a multiple of 60s


def test_rollup_partition_pruning(spark):
    from dqe_spark.plans.debug import explain_string
    from dqe_spark.sources.rollup import load_rollup

    r = load_rollup(spark, SF_SMOKE, 60_000).where(
        F.col("metric") == "events.click"
    )
    plan = explain_string(r.select("wts", "cnt"))
    assert "PartitionFilters" in plan and "events.click" in plan


def test_hist_rollup_percentile_equals_raw(spark):
    from pyspark.sql import functions as F

    from dqe_spark.sources.metric_store import load_metrics
    from dqe_spark.sources.rollup import hist_rollup_percentile, load_hist_rollup

    h = load_hist_rollup(spark, SF_SMOKE, 60_000)
    got = hist_rollup_percentile(h, 3_600_000, 0.5)
    m = load_metrics(spark, SF_SMOKE)
    ref = (
        m.withColumn("wts", F.col("ts_ms") - F.col("ts_ms") % 3_600_000)
        .groupBy("metric", "wts")
        .agg(F.round(F.percentile("value", F.lit(0.5)), 4).alias("value"))
    )
    a = {(r["metric"], r["wts"], r["value"]) for r in got.collect()}
    b = {(r["metric"], r["wts"], r["value"]) for r in ref.collect()}
    assert a == b and a
