"""Error-string parity (src/dqe.erl:129-150), no_results, and the
query-timeout path of engine.collect."""

from __future__ import annotations

import pytest

from dqe_spark import engine
from dqe_spark.dql.compiler import PlanError
from tests.conftest import SF_SMOKE

JAN1 = 1704067200000
FEB1 = 1706745600000


def _err(spark, dql):
    with pytest.raises(PlanError) as ei:
        engine.run(spark, dql, SF_SMOKE)
    return engine.error_string(ei.value)


def test_unknown_variable(spark):
    msg = _err(spark, f"SELECT avg(nosuch, 1m) BETWEEN {JAN1} AND {FEB1}")
    assert msg == "Variable 'nosuch' referenced but not defined!"


def test_unknown_function(spark):
    msg = _err(
        spark,
        f"SELECT frobnicate('events'.'click' BUCKET 'events') BETWEEN {JAN1} AND {FEB1}",
    )
    assert msg == "Not recognized function frobnicate/1."


def test_resolution_conflict(spark):
    msg = _err(
        spark,
        "SELECT avg('events'.'click' BUCKET 'events', 1m) + "
        f"avg('events'.'view' BUCKET 'events', 5m) BETWEEN {JAN1} AND {FEB1}",
    )
    assert msg == "Combination functions can't have mix resolutions as children."


def test_no_results(spark):
    # far-future range: plan succeeds, zero rows everywhere
    with pytest.raises(engine.NoResults) as ei:
        engine.collect(
            spark,
            "SELECT avg('events'.'click' BUCKET 'events', 1m) "
            f"BETWEEN {FEB1 + 10} AND {FEB1 + 100000}",
            SF_SMOKE,
        )
    assert engine.error_string(ei.value) == "No results were returned for the query."


def test_collect_ok_and_timeout(spark):
    out = engine.collect(
        spark,
        f"SELECT avg('events'.'click' BUCKET 'events', 1h) BETWEEN {JAN1} AND {FEB1}",
        SF_SMOKE,
        timeout_s=120,
    )
    (res, rows), = out
    assert res.kind == "metrics" and len(rows) > 0

    with pytest.raises(engine.QueryTimeout):
        engine.collect(
            spark,
            f"SELECT avg('events'.* BUCKET 'events', 1m) BETWEEN {JAN1} AND {FEB1}",
            SF_SMOKE,
            timeout_s=0.001,
        )


def test_explain_dry_run(spark):
    plans = engine.explain(
        spark,
        f"SELECT avg('events'.'click' BUCKET 'events', 1h) BETWEEN {JAN1} AND {FEB1}",
        SF_SMOKE,
    )
    (name,) = plans
    assert "avg(" in name and "HashAggregate" in plans[name]

    ru = engine.explain(
        spark,
        f"SELECT avg('events'.'click' BUCKET 'events', 1h) BETWEEN {JAN1} AND {FEB1}",
        SF_SMOKE,
        use_rollups=True,
    )
    assert "rollup_" in next(iter(ru.values()))


def test_percentile_out_of_range(spark):
    # int 90 → 45.0 after the reference's halving quirk: plan-time error,
    # not a runtime Spark failure
    with pytest.raises(PlanError, match="out of range"):
        engine.run(
            spark,
            f"SELECT percentile('events'.'click' BUCKET 'events', 90, 1h) "
            f"BETWEEN {JAN1} AND {FEB1}",
            SF_SMOKE,
        )


def test_combinator_rejects_consts_and_multiseries(spark):
    # two series + a window constant: no such overload
    with pytest.raises(PlanError, match="function not found"):
        engine.run(
            spark,
            "SELECT avg('events'.'click' BUCKET 'events', "
            f"'events'.'view' BUCKET 'events', 5m) BETWEEN {JAN1} AND {FEB1}",
            SF_SMOKE,
        )
    # ordered fold over a glob (multi-series) input: plan-time rejection
    with pytest.raises(PlanError, match="single-series"):
        engine.run(
            spark,
            "SELECT avg('events'.* BUCKET 'events', 1m) / "
            f"avg('events'.'click' BUCKET 'events', 1m) BETWEEN {JAN1} AND {FEB1}",
            SF_SMOKE,
        )


def test_combinator_confidence_is_mean(spark):
    from pyspark.sql import functions as F

    (res,) = engine.run(
        spark,
        "SELECT avg('events'.'click' BUCKET 'events', 1h) + "
        f"avg('events'.'view' BUCKET 'events', 1h) BETWEEN {JAN1} AND {FEB1}",
        SF_SMOKE,
    )
    # confidence() over the combined frame sees real values, not 1.0
    (res2,) = engine.run(
        spark,
        "SELECT confidence(avg('events'.'click' BUCKET 'events', 1h) + "
        f"avg('events'.'view' BUCKET 'events', 1h)) BETWEEN {JAN1} AND {FEB1}",
        SF_SMOKE,
    )
    vals = [r["value"] for r in res2.df.collect()]
    assert vals and any(v != 1.0 for v in vals)
    assert all(v is None or 0.0 <= v <= 1.0 for v in vals)
