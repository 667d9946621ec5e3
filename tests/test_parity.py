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
