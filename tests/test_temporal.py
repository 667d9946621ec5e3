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


def test_dedup_clusters_chain_converges_logarithmically(spark):
    """A 1000-node chain (worst-case diameter) must settle in
    O(log n) rounds thanks to pointer doubling — and label every node
    with the chain minimum."""
    from dqe_spark.operators.dedup import dedup_clusters

    n = 1000
    docs = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_i long, id_j long"
    )
    stats: dict = {}
    out = dedup_clusters(docs, pairs, stats=stats)
    assert stats["rounds"] < 12, stats
    rows = out.collect()
    assert len(rows) == n
    assert all(r["cluster_id"] == 0 for r in rows)


def test_dedup_clusters_components_and_singletons(spark):
    from dqe_spark.operators.dedup import dedup_clusters

    docs = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    # components: {0,1,2}, {3,4}; singletons 5,6,7
    pairs = spark.createDataFrame(
        [(1, 2), (0, 1), (3, 4)], "id_i long, id_j long"
    )
    got = {r["doc_id"]: r["cluster_id"] for r in dedup_clusters(docs, pairs).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 5, 6: 6, 7: 7}


def test_funnel_ordering_and_window(spark):
    """Order violations and window expiry: a step counts only at-or-
    after the previous step's time and within the window of the FIRST
    step; a user's earliest qualifying chain is what counts."""
    from dqe_spark.operators.temporal import funnel

    W = 1000
    rows = [
        # u1 converts fully in order
        (1, "view", 100), (1, "click", 200), (1, "buy", 300),
        # u2: click BEFORE view → click never qualifies
        (2, "click", 50), (2, "view", 100), (2, "buy", 200),
        # u3: click after view but outside view+W → drops at step 2
        (3, "view", 100), (3, "click", 1200),
        # u4: click at exactly t0+W qualifies (inclusive), buy after it
        (4, "view", 0), (4, "click", 1000), (4, "buy", 1000),
        # u5: two views; funnel anchors at the FIRST view (t0=0), so
        # the click at 1500 is outside 0+W even though view@600 fits
        (5, "view", 0), (5, "view", 600), (5, "click", 1500),
    ]
    ev = spark.createDataFrame(rows, "user_id long, event_type string, ts_ms long")
    got = {
        r["step"]: (r["event_type"], r["n_users"])
        for r in funnel(ev, ["view", "click", "buy"], W).collect()
    }
    assert got[1] == ("view", 5)
    assert got[2] == ("click", 2)  # u1 and u4
    assert got[3] == ("buy", 2)    # u1 and u4 (buy == click time allowed)

    # single-step funnel and empty-step validation
    assert funnel(ev, ["buy"], W).collect()[0]["n_users"] == 3
    import pytest

    with pytest.raises(ValueError, match="at least one step"):
        funnel(ev, [], W)


def test_rolling_zscore_null_semantics_and_values(spark):
    """Short history and zero-variance windows yield NULL zscore;
    values match a hand computation."""
    import math

    from dqe_spark.operators.anomaly import rolling_zscore

    rows = [("m", i * 1000, v) for i, v in enumerate([10.0, 10.0, 10.0, 10.0, 20.0, 10.0])]
    df = spark.createDataFrame(rows, "metric string, wts long, value double")
    got = {r["wts"]: r["zscore"] for r in rolling_zscore(df, k=4, min_points=4).collect()}
    assert got[0] is None and got[1000] is None and got[3000] is None  # short history
    assert got[4000] is None  # 4 predecessors but zero variance
    # wts=5000: predecessors [10,10,10,20] -> mu=12.5, var=18.75
    want = (10.0 - 12.5) / math.sqrt(18.75)
    assert abs(got[5000] - round(want, 4)) < 1e-9


def test_seasonal_deviation_baseline(spark):
    from dqe_spark.operators.anomaly import seasonal_deviation

    rows = [
        ("m", 0, 10.0),            # day 1, hod 0
        ("m", 86_400_000, 20.0),   # day 2, hod 0
        ("m", 3_600_000, 7.0),     # day 1, hod 1
    ]
    df = spark.createDataFrame(rows, "metric string, wts long, value double")
    got = {r["wts"]: (r["baseline"], r["deviation"]) for r in seasonal_deviation(df).collect()}
    assert got[0] == (15.0, -5.0) and got[86_400_000] == (15.0, 5.0)
    assert got[3_600_000] == (7.0, 0.0)


def test_ewma_recurrence(spark):
    from dqe_spark.operators.anomaly import ewma

    rows = [("m", i * 1000, v) for i, v in enumerate([10.0, 20.0, 40.0])]
    df = spark.createDataFrame(rows, "metric string, wts long, value double")
    got = {r["wts"]: r["ewma"] for r in ewma(df, alpha=0.3, k=30).collect()}
    assert got[0] == 10.0
    assert got[1000] == 13.0              # 10*0.7 + 20*0.3
    assert abs(got[2000] - 21.1) < 1e-9   # 13*0.7 + 40*0.3


def test_counter_rate_ignores_resets(spark):
    from dqe_spark.operators.transforms import counter_rate

    rows = [("m", t, v) for t, v in [
        (0, 10.0), (1000, 15.0), (2000, 2.0),   # reset: 15 -> 2
        (3000, 8.0), (3_600_000, 9.0),
    ]]
    df = spark.createDataFrame(rows, "metric string, ts_ms long, value double")
    got = {r["wts"]: r["rate"] for r in counter_rate(df, 3_600_000).collect()}
    # window 0: +5 (10->15), reset clamped, +6 (2->8) = 11
    assert got[0] == 11.0
    # window 1: 8 -> 9 = +1
    assert got[3_600_000] == 1.0


def test_holt_smooth_recurrence(spark):
    from dqe_spark.operators.anomaly import holt_smooth

    rows = [("m", i * 1000, v) for i, v in enumerate([10.0, 12.0, 15.0])]
    df = spark.createDataFrame(rows, "metric string, wts long, value double")
    got = {r["wts"]: (r["level"], r["forecast"]) for r in holt_smooth(
        df, alpha=0.3, beta=0.2, k=48).collect()}
    # hand recurrence: l0=10,b0=0; l1=12*.3+10*.7=10.6, b1=.12;
    # l2=15*.3+(10.6+.12)*.7=12.004, b2=(12.004-10.6)*.2+.12*.8=.3768
    assert got[0] == (10.0, 10.0)
    assert got[1000] == (10.6, 10.72)
    assert got[2000] == (12.004, 12.3808)


def test_fill_forward_and_linear_edges(spark):
    """Gap-fill edge semantics on a crafted series: LOCF never
    back-fills the leading edge; linear interpolation fills only
    interior gaps (both neighbors exist) with the time-weighted line,
    leaving leading AND trailing gaps NULL."""
    from pyspark.sql import functions as F

    from dqe_spark.operators.densify import fill_forward, fill_linear

    rows = [
        ("m", 0, None),       # leading gap
        ("m", 60, 10.0),
        ("m", 120, None),     # interior gap (1/3 of the way 10 -> 40)
        ("m", 180, None),     # interior gap (2/3)
        ("m", 240, 40.0),
        ("m", 300, None),     # trailing gap
        ("x", 0, 5.0),        # second series: key isolation
        ("x", 60, None),
    ]
    df = spark.createDataFrame(rows, "metric string, wts long, value double")

    locf = {
        (r["metric"], r["wts"]): r["filled"]
        for r in fill_forward(df).collect()
    }
    assert locf[("m", 0)] is None
    assert locf[("m", 120)] == locf[("m", 180)] == 10.0
    assert locf[("m", 300)] == 40.0
    assert locf[("x", 60)] == 5.0

    lin = {
        (r["metric"], r["wts"]): r["filled"]
        for r in fill_linear(df).collect()
    }
    assert lin[("m", 0)] is None          # leading: no prev neighbor
    assert lin[("m", 120)] == 20.0        # 10 + (60/180)*30
    assert lin[("m", 180)] == 30.0
    assert lin[("m", 240)] == 40.0        # observed rows pass through
    assert lin[("m", 300)] is None        # trailing: no next neighbor
    assert lin[("x", 60)] is None


def test_cusum_detects_level_shift(spark):
    """A clean level shift: flat at 100 for 50 windows then flat at
    200 — the z-score path sees only one step, CUSUM accumulates and
    alarms shortly after the shift and stays alarmed."""
    from pyspark.sql import functions as F

    from dqe_spark.operators.anomaly import cusum

    rows = [("m", i * 60_000, 100.0 if i < 50 else 200.0) for i in range(100)]
    df = spark.createDataFrame(rows, "metric string, wts long, value double")
    out = (
        cusum(df, kappa=10.0, h=100.0, k=200)
        .orderBy("wts")
        .collect()
    )
    alarms = [r.wts // 60_000 for r in out if r.alarm]
    assert alarms, "no alarm raised"
    # first alarm comes AFTER the shift at window 50, within a few
    # windows (drift accumulates ~ (200-mu-kappa) per window)
    assert 50 < alarms[0] <= 60
    assert all(i >= alarms[0] for i in alarms)
    # pre-shift region is quiet
    assert not [i for i in alarms if i < 50]
    # both sides bounded: S+ nonneg, S- nonpos
    assert all(r.cusum_pos >= 0 and r.cusum_neg <= 0 for r in out)


def test_cusum_sql_impl_matches_arrow_under_forced_spill(spark):
    """Round-5 verdict #8: the documented spill-safe impl="sql"
    fallback must stay bit-identical to the Arrow prefix-sum path —
    including when the Catalyst window actually SPILLS. Force the
    spill path with a tiny ExternalAppendOnlyUnsafeRowArray threshold
    on one long single series (one partition holds every row, window
    frame k=96), then hash-compare full outputs; also pin the NULL
    contract: null-valued points are dropped identically by both."""
    from pyspark.sql import functions as F

    from dqe_spark.operators.anomaly import cusum

    rows = [
        (
            "m",
            i * 60_000,
            None if i % 97 == 13 else float((i * i) % 500) / 7.0 + (100.0 if i > 2000 else 0.0),
        )
        for i in range(4000)
    ]
    df = spark.createDataFrame(rows, "metric string, wts long, value double")
    arrow = sorted(
        tuple(r) for r in cusum(df, kappa=0.5, h=4.0, k=96, impl="arrow").collect()
    )
    old = spark.conf.get("spark.sql.windowExec.buffer.spill.threshold", None)
    try:
        spark.conf.set("spark.sql.windowExec.buffer.spill.threshold", "16")
        sql = sorted(
            tuple(r)
            for r in cusum(df, kappa=0.5, h=4.0, k=96, impl="sql").collect()
        )
    finally:
        if old is None:
            spark.conf.unset("spark.sql.windowExec.buffer.spill.threshold")
        else:
            spark.conf.set("spark.sql.windowExec.buffer.spill.threshold", old)
    assert len(arrow) == len(sql) == 4000 - len([r for r in rows if r[2] is None])
    assert arrow == sql


def _spill_series(spark, n=4000):
    rows = [("m", i * 60_000, float((i * i) % 500) / 7.0) for i in range(n)]
    return spark.createDataFrame(rows, "metric string, wts long, value double")


import pytest  # noqa: E402


@pytest.mark.parametrize(
    "name", ["rolling_zscore", "ewma", "holt_smooth", "trend_slope"]
)
def test_window_ops_bit_identical_under_forced_spill(spark, name):
    """Round-6 verdict #8: rolling_zscore / ewma / holt_smooth /
    windowed_trend_slope share the window-buffer (resp. hash-agg)
    spill surface pinned for CUSUM in
    test_cusum_sql_impl_matches_arrow_under_forced_spill — one long
    single series keeps every row in one partition, a tiny
    ExternalAppendOnlyUnsafeRowArray threshold forces the WindowExec
    frame buffer to spill (and TungstenAggregate's test fallback
    forces sort-based agg for the groupBy-shaped trend), and the
    outputs must stay bit-identical to the in-memory run."""
    from dqe_spark.operators.anomaly import ewma, holt_smooth, rolling_zscore
    from dqe_spark.operators.stats import windowed_trend_slope

    df = _spill_series(spark)

    def run():
        if name == "rolling_zscore":
            out = rolling_zscore(df, k=96)
        elif name == "ewma":
            out = ewma(df, k=96)
        elif name == "holt_smooth":
            out = holt_smooth(df, k=96)
        else:
            out = windowed_trend_slope(df, 3_600_000, ts="wts")
        return sorted(
            tuple(-1.0 if x is None else x for x in r) for r in out.collect()
        )

    base = run()
    saved = {}
    forced = {
        "spark.sql.windowExec.buffer.spill.threshold": "16",
        "spark.sql.TungstenAggregate.testFallbackStartsAt": "2, 5",
    }
    for k in forced:
        saved[k] = spark.conf.get(k, None)
    try:
        for k, v in forced.items():
            spark.conf.set(k, v)
        spilled = run()
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    assert base and base == spilled


def test_range_agg_join_equals_literal_range_join(spark):
    """range_agg_join's binned equi-join must reproduce the textbook
    range join exactly — including zero-match left rows (count 0,
    max NULL) and matches straddling bin boundaries."""
    from pyspark.sql import functions as F

    from dqe_spark.operators.temporal import range_agg_join

    left = spark.createDataFrame(
        [(1, "u1", 1000), (2, "u1", 5000), (3, "u2", 999), (4, "u3", 50)],
        "event_id INT, user_id STRING, ts_ms LONG",
    )
    right = spark.createDataFrame(
        [
            ("u1", 900, 1.0),    # within 1000±1000, bin boundary below
            ("u1", 2001, 2.0),   # outside radius of event 1 by 1ms? 1001>1000 -> no; within 5000±1000? no
            ("u1", 4000, 3.0),   # exactly at radius edge of 5000 (|Δ|=1000)
            ("u1", 6050, 4.0),   # outside 5000+1000 by 50
            ("u2", 1998, 5.0),   # |Δ|=999 within
            ("u9", 0, 9.0),      # other key
        ],
        "user_id STRING, ts_ms LONG, value DOUBLE",
    )
    got = range_agg_join(
        left,
        right,
        key="user_id",
        radius_ms=1000,
        aggs={"n": F.count("value"), "mx": F.max("value")},
    )
    lit = (
        left.alias("l")
        .join(
            right.alias("r"),
            (F.col("l.user_id") == F.col("r.user_id"))
            & (F.abs(F.col("r.ts_ms") - F.col("l.ts_ms")) <= 1000),
            "left",
        )
        .groupBy("l.event_id", "l.user_id", "l.ts_ms")
        .agg(F.count("r.value").alias("n"), F.max("r.value").alias("mx"))
    )
    g = {tuple(r) for r in got.collect()}
    w = {tuple(r) for r in lit.collect()}
    assert g == w
    # spot-pin the semantics the fixture encodes
    by_id = {r["event_id"]: (r["n"], r["mx"]) for r in got.collect()}
    assert by_id[1] == (1, 1.0)      # only the 900 click
    assert by_id[2] == (1, 3.0)      # radius edge inclusive
    assert by_id[4] == (0, None)     # no matches at all


def test_range_agg_join_plan_is_equijoin_even_without_broadcast(spark):
    """The 100 TB claim: with broadcast off, the plan must be a
    shuffled EQUI-join on (key, bin) — never a per-key cross product
    (BroadcastNestedLoop/Cartesian is what Spark plans for a raw
    `ON key AND abs(Δts) <= r` when it cannot broadcast)."""
    from pyspark.sql import functions as F

    from dqe_spark.operators.temporal import range_agg_join

    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        left = spark.range(1000).select(
            F.col("id").alias("event_id"),
            (F.col("id") % 50).alias("user_id"),
            (F.col("id") * 137).alias("ts_ms"),
        )
        right = spark.range(5000).select(
            (F.col("id") % 50).alias("user_id"),
            (F.col("id") * 31).alias("ts_ms"),
            F.rand(7).alias("value"),
        )
        df = range_agg_join(
            left, right, key="user_id", radius_ms=500,
            aggs={"n": F.count("value")},
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)


def test_range_agg_join_keeps_duplicate_left_rows_separate(spark):
    """Byte-identical left rows are distinct EVENTS: each must keep
    its own aggregate row (|output| = |left|), not merge into one
    group with doubled counts."""
    from pyspark.sql import functions as F

    from dqe_spark.operators.temporal import range_agg_join

    left = spark.createDataFrame(
        [("u1", 1000), ("u1", 1000), ("u2", 50)],
        "user_id STRING, ts_ms LONG",
    )
    right = spark.createDataFrame(
        [("u1", 900, 1.0), ("u1", 1400, 2.0)],
        "user_id STRING, ts_ms LONG, value DOUBLE",
    )
    got = range_agg_join(
        left, right, key="user_id", radius_ms=1000,
        aggs={"n": F.count("value")},
    ).collect()
    assert len(got) == 3
    ns = sorted(r["n"] for r in got)
    assert ns == [0, 2, 2]  # each duplicate row counts its own 2 matches


def test_range_agg_join_output_is_partition_layout_invariant(spark):
    """The |output| = |left| contract is content-derived (round-8
    advisor nit: a monotonically_increasing_id row key would depend on
    partition layout, so an AQE replan mid-retry could regroup rows):
    byte-identical results — duplicates included — regardless of how
    the left side is partitioned."""
    from pyspark.sql import functions as F

    from dqe_spark.operators.temporal import range_agg_join

    rows = [("u1", 1000), ("u1", 1000), ("u1", 1000), ("u2", 50),
            ("u2", 50), ("u3", 700)]
    right = spark.createDataFrame(
        [("u1", 900, 1.0), ("u1", 1400, 2.0), ("u2", 40, 5.0)],
        "user_id STRING, ts_ms LONG, value DOUBLE",
    )

    def run(nparts):
        left = spark.createDataFrame(
            rows, "user_id STRING, ts_ms LONG"
        ).repartition(nparts)
        return sorted(
            tuple(r)
            for r in range_agg_join(
                left, right, key="user_id", radius_ms=1000,
                aggs={"n": F.count("value"), "mx": F.max("value")},
            ).collect()
        )

    a, b, c = run(1), run(7), run(32)
    assert a == b == c
    assert len(a) == len(rows)  # every duplicate keeps its own row


def test_simhash_cluster_assignments_equal_doc_level_path(spark):
    """The round-10 signature-space cluster path must be row-identical
    to the generic doc-level one (dedup_clusters over
    simhash_neardup_pairs): docs sharing a signature are hamming-0
    near-dups, so the component structure lives entirely in the
    distinct-signature graph — the restatement changes the plan shape
    (thousands of signature nodes instead of an output-sized doc edge
    set), never the answer. Includes cross-copy duplicates (shared
    signatures) and unique singletons."""
    from dqe_spark.operators.dedup import (
        dedup_clusters,
        simhash_cluster_assignments,
        simhash_neardup_pairs,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    want = {
        (r["doc_id"], r["cluster_id"])
        for r in dedup_clusters(
            docs,
            simhash_neardup_pairs(docs, max_hamming=3).select(
                "id_i", "id_j"
            ),
        ).collect()
    }
    stats: dict = {}
    got = {
        (r["doc_id"], r["cluster_id"])
        for r in simhash_cluster_assignments(
            docs, max_hamming=3, stats=stats
        ).collect()
    }
    assert got == want and got
    assert stats["rounds"] >= 1


def test_sig_space_hamming_pairs_equal_doc_level_banding(spark):
    """sig_space_hamming_pairs (distinct-signature graph + member
    expansion — the round-10 rewrite behind simhash_neardup_pairs and
    the dHash image dedup) must be row-identical to banding directly
    in doc space (hamming_neardup_pairs over the same (id, sig)
    relation): each doc holds one signature, so every unordered doc
    pair arises from exactly one signature pair (cross block) or one
    same-signature pair (hamming-0 block) — no doc-level distinct
    exists, and none is needed. Exercised on a relation with shared
    signatures (hamming-0 groups), near signatures, and singletons."""
    from dqe_spark.operators.dedup import (
        hamming_neardup_pairs,
        sig_space_hamming_pairs,
    )

    rows = [
        # three docs sharing one signature (hamming-0 triangle)
        (1, 0b1111000011110000), (2, 0b1111000011110000),
        (3, 0b1111000011110000),
        # two docs one bit apart from the group and each other
        (4, 0b1111000011110001), (5, 0b1111000011110011),
        # far-away singleton
        (6, -0x7FFF000000000000),
        # duplicate pair far from everything else
        (7, 0x0F0F0F0F0F0F0F0F), (8, 0x0F0F0F0F0F0F0F0F),
    ]
    sig = spark.createDataFrame(rows, "doc_id long, dhash long")
    got = sorted(
        tuple(r)
        for r in sig_space_hamming_pairs(sig, max_hamming=3).collect()
    )
    want = sorted(
        tuple(r) for r in hamming_neardup_pairs(sig, max_hamming=3).collect()
    )
    assert got == want and got
    assert len(got) == len(set((a, b) for a, b, _ in got))  # one row/pair


def test_ngram_jaccard_short_docs_and_df_cap(spark):
    """ngram_jaccard_pairs over a corpus with exact copies, a near
    duplicate, and docs too short to shingle: short docs must NOT
    pair even when byte-identical — and must not CRASH the gram
    transform when Catalyst collapses the projection past the length
    filter (two-arg sequence(0, size-3) runs DOWNWARD for short rows,
    so bracket indexing throws; shingle_sets' get() guard keeps the
    expression total — the regression this test pins). The inline
    doc_level reference is the same algorithm derived per consumer;
    outputs must match row-for-row including df_cap."""
    from pyspark.sql import functions as F

    from dqe_spark.operators.dedup import (
        ngram_jaccard_pairs,
        shingle_sizes,
        shingles,
    )
    from dqe_spark.operators.partitioning import spread

    base = "the quick brown fox jumps over the lazy dog again and again"
    alt = "the quick brown fox jumps over the lazy cat again and again"
    rows = [
        (1, base), (2, base), (3, base),   # exact-copy group of 3
        (4, alt),                          # near-duplicate of the group
        (5, "completely different words entirely unrelated text here"),
        (6, "too short"), (7, "too short"),  # identical but shingle-free
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    def doc_level(df, threshold, df_cap=None):
        sh = shingles(spread(df))
        if df_cap is not None:
            freq = sh.groupBy("sh").agg(F.count("*").alias("df"))
            sh = sh.join(freq.where(F.col("df") <= df_cap), "sh", "left_semi")
        sizes = shingle_sizes(sh)
        a = sh.select(F.col("doc_id").alias("id_i"), "sh")
        b = sh.select(F.col("doc_id").alias("id_j"), "sh")
        inter = (
            a.join(b, on="sh")
            .where(F.col("id_i") < F.col("id_j"))
            .groupBy("id_i", "id_j")
            .agg(F.count("*").alias("inter"))
        )
        na = sizes.select(F.col("doc_id").alias("id_i"), F.col("n_sh").alias("n_i"))
        nb = sizes.select(F.col("doc_id").alias("id_j"), F.col("n_sh").alias("n_j"))
        jac = F.col("inter") / (F.col("n_i") + F.col("n_j") - F.col("inter"))
        return (
            inter.join(na, "id_i")
            .join(nb, "id_j")
            .where(jac >= threshold)
            .select("id_i", "id_j", F.round(jac, 4).alias("jaccard"))
        )

    for thr, cap in ((0.8, None), (0.2, None), (0.8, 2)):
        got = sorted(
            map(tuple, ngram_jaccard_pairs(docs, thr, df_cap=cap).collect())
        )
        want = sorted(map(tuple, doc_level(docs, thr, df_cap=cap).collect()))
        assert got == want, (thr, cap)
    got = sorted(map(tuple, ngram_jaccard_pairs(docs, 0.8).collect()))
    assert (1, 2, 1.0) in got and (1, 3, 1.0) in got and (2, 3, 1.0) in got
    assert not any({a, b} == {6, 7} for a, b, _ in got)  # shingle-free
