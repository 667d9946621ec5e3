"""Self-check mirror of the driver's DuckDB-oracle comparison:
row count + column names + order-insensitive multiset of values."""

from __future__ import annotations

import math
from decimal import Decimal


def _norm(v):
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # normalize -0.0 and integral floats
        if v == 0.0:
            return 0.0
        return v
    return v


def rows_multiset(cols, rows):
    """Sort columns by name (as the driver does), normalize values,
    return a sorted list of tuples."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


def assert_no_decimal(duck_con, sql, name="<oracle>"):
    """Driver-strictness guard: the driver's hasher is TYPE-sensitive,
    so a DuckDB HUGEINT/DECIMAL column (arrow decimal128) hashes
    differently from Spark's int64/double even when every value is
    identical (round-3 `sessionize_clicks` failure). Any oracle column
    arriving as decimal must be CAST in the oracle SQL."""
    schema = duck_con.sql(sql).arrow().schema
    import pyarrow.types as pt

    bad = [
        f.name
        for f in schema
        if pt.is_decimal(f.type)
        or (pt.is_list(f.type) and pt.is_decimal(f.type.value_type))
    ]
    assert not bad, (
        f"{name}: oracle columns {bad} are DuckDB DECIMAL/HUGEINT "
        "(arrow decimal128) — the driver's type-sensitive hash will flag "
        "them even when values match Spark. CAST(... AS BIGINT/DOUBLE) "
        "in the oracle SQL."
    )


def compare(spark_df, duck_con, sql, name="<oracle>"):
    sp_rows = spark_df.collect()
    sp_cols = spark_df.columns
    rel = duck_con.execute(sql)
    du_cols = [d[0] for d in rel.description]
    du_rows = rel.fetchall()
    # driver-strictness: Decimal values would hash-mismatch Spark's
    # int64/double under the driver's type-sensitive hasher even when
    # numerically identical — fail here FIRST, with the fix spelled out
    bad_cols = sorted(
        {
            du_cols[i]
            for r in du_rows
            for i, v in enumerate(r)
            if isinstance(v, Decimal)
        }
    )
    assert not bad_cols, (
        f"{name}: oracle columns {bad_cols} return DuckDB DECIMAL/HUGEINT — "
        "the driver's type-sensitive hash flags them even when values match "
        "Spark. CAST(... AS BIGINT/DOUBLE) in the oracle SQL."
    )
    assert sorted(c.lower() for c in sp_cols) == sorted(
        c.lower() for c in du_cols
    ), f"column mismatch: spark={sp_cols} duck={du_cols}"
    a = rows_multiset([c.lower() for c in sp_cols], [tuple(r) for r in sp_rows])
    b = rows_multiset([c.lower() for c in du_cols], du_rows)
    assert len(a) == len(b), f"row count: spark={len(a)} duck={len(b)}"
    mismatches = [(x, y) for x, y in zip(a, b) if x != y]
    assert not mismatches, f"{len(mismatches)} value mismatches; first: {mismatches[:3]}"
