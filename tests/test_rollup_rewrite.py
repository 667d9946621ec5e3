"""Compiler rollup rewrite: eligible DQL window aggregates read
pre-aggregated partials; results match the raw path; ineligible shapes
fall back to raw scans."""

from __future__ import annotations

from pyspark.sql import functions as F

from dqe_spark import engine
from tests.conftest import SF_SMOKE

JAN1 = 1704067200000
FEB1 = 1706745600000


def _plan_of(df) -> str:
    from dqe_spark.plans.debug import explain_string

    return explain_string(df)


def _runs(spark, dql, **kw):
    (res,) = engine.run(spark, dql, SF_SMOKE, **kw)
    return res.df


def test_rewrite_used_and_matches_raw(spark):
    dql = f"SELECT avg('events'.'click' BUCKET 'events', 1h) BETWEEN {JAN1} AND {FEB1}"
    raw = _runs(spark, dql)
    ru = _runs(spark, dql, use_rollups=True)
    assert "rollup_60000ms" in _plan_of(ru)
    assert "rollup_60000ms" not in _plan_of(raw)

    # identical answers (partials sum in exact decimal); tolerance only
    # for the final 4dp rounding boundary
    j = (
        raw.select("ts_ms", F.col("value").alias("v_raw"))
        .join(ru.select("ts_ms", F.col("value").alias("v_ru")), "ts_ms", "full")
    )
    rows = j.collect()
    assert rows and all(
        r["v_raw"] is not None
        and r["v_ru"] is not None
        and abs(r["v_raw"] - r["v_ru"]) <= 1e-4
        for r in rows
    )


def test_rewrite_glob_and_sum(spark):
    dql = f"SELECT sum('events'.* BUCKET 'events', 1d) BETWEEN {JAN1} AND {FEB1}"
    ru = _runs(spark, dql, use_rollups=True)
    assert "rollup_60000ms" in _plan_of(ru)
    assert ru.select("metric").distinct().count() > 1


def test_no_rewrite_when_ineligible(spark):
    # window not a multiple of the rollup resolution
    ru = _runs(
        spark,
        f"SELECT avg('events'.'click' BUCKET 'events', 90s) BETWEEN {JAN1} AND {FEB1}",
        use_rollups=True,
    )
    assert "rollup_60000ms" not in _plan_of(ru)

    # transform between scan and aggregate clears eligibility
    ru2 = _runs(
        spark,
        f"SELECT avg(abs('events'.'click' BUCKET 'events'), 1h) BETWEEN {JAN1} AND {FEB1}",
        use_rollups=True,
    )
    assert "rollup_60000ms" not in _plan_of(ru2)

    # tag lookups aren't in the rollup store
    ru3 = _runs(
        spark,
        "SELECT avg('events'.'click' FROM 'events' WHERE 'host' = 'h1', 1h) "
        f"BETWEEN {JAN1} AND {FEB1}",
        use_rollups=True,
    )
    assert "rollup_60000ms" not in _plan_of(ru3)

    # percentile isn't distributive
    ru4 = _runs(
        spark,
        f"SELECT percentile('events'.'click' BUCKET 'events', 0.9, 1h) BETWEEN {JAN1} AND {FEB1}",
        use_rollups=True,
    )
    assert "rollup_60000ms" not in _plan_of(ru4)
