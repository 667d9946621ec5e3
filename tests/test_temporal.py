"""as-of join and sessionize edge semantics."""

from __future__ import annotations

from dqe_spark.operators.temporal import asof_join, sessionize


def test_asof_basic_and_same_ts(spark):
    left = spark.createDataFrame(
        [(1, 100), (2, 200), (3, 50)], "id long, ts_ms long"
    ).withColumnRenamed("id", "event")
    right = spark.createDataFrame(
        [(100, 10.0), (150, 15.0)], "ts_ms long, value double"
    )
    l2 = left.selectExpr("'k' AS k", "event", "ts_ms")
    r2 = right.selectExpr("'k' AS k", "ts_ms", "value")
    got = {
        r["event"]: (r["asof_value"], r["asof_ts"])
        for r in asof_join(l2, r2, key="k").collect()
    }
    assert got[1] == (10.0, 100)  # same-ts reading visible ("at or before")
    assert got[2] == (15.0, 150)
    assert got[3] == (None, None)  # nothing at or before 50


def test_asof_tolerance(spark):
    l2 = spark.createDataFrame([("k", 1, 1000)], "k string, event long, ts_ms long")
    r2 = spark.createDataFrame([("k", 10, 5.0)], "k string, ts_ms long, value double")
    ok = asof_join(l2, r2, key="k", tolerance_ms=2000).collect()[0]
    assert ok["asof_value"] == 5.0
    stale = asof_join(l2, r2, key="k", tolerance_ms=100).collect()[0]
    assert stale["asof_value"] is None and stale["asof_ts"] is None


def test_sessionize_gaps(spark):
    rows = [("u", t) for t in (0, 1000, 2000, 10_000, 11_000, 30_000)]
    df = spark.createDataFrame(rows, "user string, ts_ms long")
    got = {
        r["session_id"]: (r["session_start"], r["session_end"], r["n_events"])
        for r in sessionize(df, key="user", gap_ms=5000).collect()
    }
    assert got == {
        1: (0, 2000, 3),
        2: (10_000, 11_000, 2),
        3: (30_000, 30_000, 1),
    }


def test_neardup_cosine_guard(spark):
    """The exact all-pairs path must refuse to run without exact=True,
    and must refuse oversized inputs even with it."""
    import pytest

    from dqe_spark.operators.similarity import neardup_cosine_pairs

    df = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(10)], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="exact=True"):
        neardup_cosine_pairs(df, 0.5)
    with pytest.raises(ValueError, match="max_rows"):
        neardup_cosine_pairs(df, 0.5, exact=True, max_rows=5)
    assert neardup_cosine_pairs(df, 0.99, exact=True).count() > 0
