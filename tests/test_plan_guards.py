"""Registry-wide physical-plan guards.

Two anti-patterns must never reach a registry query's plan:

* ``BatchEvalPython`` — a row-at-a-time Python UDF (the 10-100× slow
  path; Arrow-batched pandas UDFs show up as ArrowEvalPython /
  MapInPandas / FlatMapGroupsInPandas and stay allowed where
  documented).
* ``CartesianProduct`` — an unbounded all-pairs join. Broadcast
  nested-loop joins of 1-row/K-row sides (query vectors, corpus
  totals) are fine and appear as BroadcastNestedLoopJoin instead.

Every query in the registry is planned (not executed) and swept, so a
future operator that regresses to either pattern fails here before it
ever runs at scale.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE


def _inventory():
    from dqe_spark.entry import all_queries

    return sorted(all_queries().items())


def _plan(spark, df) -> str:
    je = df._jdf.queryExecution()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString
    return je.explainString(mode("simple"))


@pytest.mark.parametrize(
    "name,fn", _inventory(), ids=[n for n, _ in _inventory()]
)
def test_no_row_python_udf_or_cartesian(spark, name, fn):
    plan = _plan(spark, fn(spark, SF_SMOKE))
    assert "BatchEvalPython" not in plan, (
        f"{name}: row-at-a-time Python UDF in the plan"
    )
    assert "CartesianProduct" not in plan, (
        f"{name}: unbounded cartesian join in the plan"
    )
