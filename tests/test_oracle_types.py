"""Driver-strictness sweep: no registry oracle may return a DuckDB
DECIMAL/HUGEINT column (arrow decimal128) — the driver's type-sensitive
hasher flags those against Spark's int64/double even when every value
matches (round-3 `sessionize_clicks` lesson). Integer SUM(...) — plain
or windowed — is the usual culprit; CAST(... AS BIGINT) in the oracle.

Runs at sf0.001 so even the quadratic-ish oracles (minhash/winnow
families) stay cheap.
"""

from __future__ import annotations

import pytest

from tests.oracle_util import assert_no_decimal


def _oracles():
    import __spark_entry__ as entry

    return sorted(entry.oracle_sql().items())


@pytest.mark.parametrize("name,sql", _oracles(), ids=[n for n, _ in _oracles()])
def test_oracle_returns_no_decimal_columns(duck, name, sql):
    assert_no_decimal(duck, sql, name)


def test_cluster_prop_oracle_sentinel_fires_when_unconverged():
    """The dedup_clusters oracle is exact-or-loud: with enough rounds
    the label table is the true transitive-closure min (matches a
    recursive-CTE closure on a chain graph); with rounds=1 on a long
    chain the convergence sentinel (-1,-1) row appears, so an
    under-provisioned replay can never silently pass the compare."""
    import duckdb

    from dqe_spark.queries_ext import _cluster_prop_sql

    con = duckdb.connect()
    # a 12-node chain: diameter 11, needs >1 propagation round
    con.execute("CREATE TABLE documents AS SELECT unnest(range(12)) AS doc_id")
    edges = "SELECT unnest(range(11)) AS a, unnest(range(1, 12)) AS b"
    prefix = f"WITH e0 AS ({edges}), edges AS (SELECT a, b FROM e0 UNION SELECT b, a FROM e0)"
    full = con.execute(prefix + _cluster_prop_sql(rounds=12)).fetchall()
    assert sorted(full) == [(i, 0) for i in range(12)]
    starved = con.execute(prefix + _cluster_prop_sql(rounds=1)).fetchall()
    assert (-1, -1) in starved
