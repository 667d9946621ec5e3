"""Every declared query must match its DuckDB oracle at sf0.001.

This is the local mirror of the driver's t2 gate (which runs at sf0.01);
keeping it at sf0.001 keeps the suite fast while exercising identical
semantics.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE
from tests.oracle_util import compare


def _inventory():
    from dqe_spark.entry import all_oracles, all_queries

    qs = all_queries()
    os_ = all_oracles()
    return [(n, qs[n], os_[n]) for n in sorted(os_) if n in qs]


@pytest.mark.parametrize("name,fn,sql", _inventory(), ids=[n for n, _, _ in _inventory()])
def test_query_matches_oracle(spark, duck, name, fn, sql):
    compare(fn(spark, SF_SMOKE), duck, sql, name)


def test_all_queries_have_oracle_or_reason():
    from dqe_spark.entry import all_oracles, all_queries

    missing = set(all_queries()) - set(all_oracles())
    # rows-only checks are allowed but should stay the rare exception
    assert len(missing) <= max(4, len(all_queries()) // 5), sorted(missing)


def test_q5_plan_broadcasts_dims_and_pushes_date(spark):
    """q5_revenue_by_nation scale shape: the nation/region dims join as
    BroadcastHashJoin (fact rows never shuffle for them) and the order
    year predicate reaches the orders parquet scan as a pushed filter."""
    from dqe_spark.queries_parity import q5_revenue_by_nation

    df = q5_revenue_by_nation(spark, SF_SMOKE)
    je = df._jdf.queryExecution()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString
    plan = je.explainString(mode("formatted"))
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "PushedFilters" in plan
    # the o_orderdate range must appear among pushed scan filters, not
    # only as a post-scan Filter node
    pushed = [
        ln for ln in plan.splitlines()
        if "PushedFilters" in ln and "o_orderdate" in ln
    ]
    assert pushed, plan
