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
