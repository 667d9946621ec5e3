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


def compare(spark_df, duck_con, sql):
    sp_rows = spark_df.collect()
    sp_cols = spark_df.columns
    rel = duck_con.execute(sql)
    du_cols = [d[0] for d in rel.description]
    du_rows = rel.fetchall()
    assert sorted(c.lower() for c in sp_cols) == sorted(
        c.lower() for c in du_cols
    ), f"column mismatch: spark={sp_cols} duck={du_cols}"
    a = rows_multiset([c.lower() for c in sp_cols], [tuple(r) for r in sp_rows])
    b = rows_multiset([c.lower() for c in du_cols], du_rows)
    assert len(a) == len(b), f"row count: spark={len(a)} duck={len(b)}"
    mismatches = [(x, y) for x, y in zip(a, b) if x != y]
    assert not mismatches, f"{len(mismatches)} value mismatches; first: {mismatches[:3]}"
