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
    the signature-graph label table is the true component min (a
    12-signature chain all collapses to cluster 0, members expanded);
    with rounds=1 on the same chain the convergence sentinel (-1,-1)
    row appears, so an under-provisioned replay can never silently
    pass the compare. (Round 8 moved the propagation from doc-level
    edges to the distinct-signature graph — same sentinel contract.)"""
    import duckdb

    from dqe_spark.queries_ext import _sig_cluster_prop_sql

    con = duckdb.connect()
    # a 12-signature chain (diameter 11), two member docs each: doc
    # ids 2k and 2k+1 for signature k → component min doc is 0
    prefix = (
        "WITH sgrp AS (SELECT i AS simhash, [2*i, 2*i + 1] AS members "
        "FROM range(12) t(i)), "
        "spairs AS (SELECT i AS s_i, i + 1 AS s_j, 1 AS hamming "
        "FROM range(11) t(i)), "
        "mem AS (SELECT simhash, unnest(members) AS m FROM sgrp)"
    )
    full = con.execute(prefix + _sig_cluster_prop_sql(rounds=12)).fetchall()
    assert sorted(full) == [(i, 0) for i in range(24)]
    starved = con.execute(prefix + _sig_cluster_prop_sql(rounds=1)).fetchall()
    assert (-1, -1) in starved
