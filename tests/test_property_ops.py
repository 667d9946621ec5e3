"""Property tests for the operator layer: randomized inputs, oracle =
a straightforward Python reimplementation. Complements the DuckDB
oracle queries (fixed inputs) with adversarial shapes — empty groups,
ties, gaps, single-point series."""

from __future__ import annotations

import bisect

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_slow = settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

rows = st.lists(
    st.tuples(
        st.sampled_from(["k1", "k2"]),
        st.integers(0, 50).map(lambda x: x * 100),
        st.integers(-100, 100).map(lambda x: x / 2),
    ),
    min_size=0,
    max_size=25,
)


@_slow
@given(left=rows, right=rows)
def test_asof_join_matches_bruteforce(spark, left, right):
    from dqe_spark.operators.temporal import asof_join

    # dedup (key, ts) on both sides — the operator's documented contract
    lmap = {(k, t): v for k, t, v in left}
    rmap = {(k, t): v for k, t, v in right}
    l_rows = [(k, t, v) for (k, t), v in sorted(lmap.items())]
    r_rows = [(k, t, v) for (k, t), v in sorted(rmap.items())]
    if not l_rows:
        return
    ldf = spark.createDataFrame(l_rows, "k string, ts_ms long, lv double")
    rdf = spark.createDataFrame(
        r_rows or [("__none__", 0, 0.0)], "k string, ts_ms long, value double"
    )
    got = {
        (r["k"], r["ts_ms"]): (r["asof_value"], r["asof_ts"])
        for r in asof_join(ldf, rdf, key="k").collect()
    }

    by_key: dict[str, list[tuple[int, float]]] = {}
    for k, t, v in r_rows:
        by_key.setdefault(k, []).append((t, v))
    for k in by_key:
        by_key[k].sort()
    for k, t, _ in l_rows:
        cands = by_key.get(k, [])
        i = bisect.bisect_right([c[0] for c in cands], t) - 1
        want = (cands[i][1], cands[i][0]) if i >= 0 else (None, None)
        assert got[(k, t)] == want, (k, t)


@_slow
@given(rows=rows, gap=st.sampled_from([100, 300, 1000]))
def test_sessionize_matches_bruteforce(spark, rows, gap):
    from dqe_spark.operators.temporal import sessionize

    pts = sorted({(k, t) for k, t, _ in rows})
    if not pts:
        return
    df = spark.createDataFrame(list(pts), "k string, ts_ms long")
    got = {
        (r["k"], r["session_id"]): (r["session_start"], r["session_end"], r["n_events"])
        for r in sessionize(df, key="k", ts="ts_ms", gap_ms=gap).collect()
    }

    want = {}
    by_key: dict[str, list[int]] = {}
    for k, t in pts:
        by_key.setdefault(k, []).append(t)
    for k, ts in by_key.items():
        sid, start, prev, n = 0, None, None, 0
        for t in ts:
            if prev is None or t - prev >= gap:
                if start is not None:
                    want[(k, sid)] = (start, prev, n)
                sid, start, n = sid + 1, t, 0
            n += 1
            prev = t
        want[(k, sid)] = (start, prev, n)
    assert got == want


points = st.lists(
    st.tuples(
        st.sampled_from(["m1", "m2"]),
        st.integers(0, 120).map(lambda x: x * 60_000),  # 1m-aligned ts
        st.integers(-10000, 10000).map(lambda x: x / 100),  # 2-decimal
    ),
    min_size=1,
    max_size=40,
)


@_slow
@given(pts=points)
def test_rollup_partials_match_raw(spark, pts):
    """Partials built at 1m then re-aggregated to 1h must equal direct
    window aggregates over the raw points, for every distributive
    aggregate — randomized values/gaps/duplicates."""
    from pyspark.sql import functions as F

    from dqe_spark.sources.rollup import partial_value_expr, rewindow

    df = spark.createDataFrame(pts, "metric string, ts_ms long, value double")
    partials = (
        df.withColumn("wts", F.col("ts_ms") - F.col("ts_ms") % 60_000)
        .groupBy("metric", "wts")
        .agg(
            F.count("value").alias("cnt"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("sum"),
            F.sum(
                F.col("value").cast("decimal(18,2)")
                * F.col("value").cast("decimal(18,2)")
            ).alias("sum_sq"),
            F.min("value").alias("min"),
            F.max("value").alias("max"),
        )
    )
    from dqe_spark.operators.windows import (
        _var_exact,
        agg_avg,
        agg_stddev_exact,
        agg_sum,
        agg_variance_exact,
    )

    # var_pop itself drifts by float error on mostly-zero windows and on
    # exact rounding boundaries (e.g. var = 78.3225); the engine's raw
    # path uses the same exact-decimal/integer-rounding algebra as the
    # rollup partials, so rollup vs raw must be BIT-identical — assert
    # with the engine's own raw builders at full rounding.
    # A separate tolerance check below pins the exact algebra to var_pop.
    for agg, raw in {
        "sum": agg_sum("value"),
        "avg": agg_avg("value"),
        "min": F.round(F.min("value"), 4),
        "max": F.round(F.max("value"), 4),
        "variance": agg_variance_exact("value"),
        "stddev": agg_stddev_exact("value"),
    }.items():
        got = {
            (r["metric"], r["w2"], r["v"])
            for r in partials.groupBy(
                "metric", rewindow(3_600_000).alias("w2")
            )
            .agg(F.round(partial_value_expr(agg), 4).alias("v"))
            .collect()
        }
        want = {
            (r["metric"], r["w2"], r["v"])
            for r in df.groupBy(
                "metric", (F.col("ts_ms") - F.col("ts_ms") % 3_600_000).alias("w2")
            )
            .agg(raw.alias("v"))
            .collect()
        }
        assert got == want, agg

    # ground-truth guard: the 4dp-exact variance must sit within half
    # a rounding step of var_pop (catches a wrong algebra, which
    # bit-equal self-comparison above cannot)
    for r in (
        df.groupBy("metric", (F.col("ts_ms") - F.col("ts_ms") % 3_600_000).alias("w2"))
        .agg(
            _var_exact("value").alias("exact"),
            F.var_pop("value").alias("ref"),
        )
        .collect()
    ):
        assert abs(r["exact"] - r["ref"]) <= 5e-5 + 1e-9 * abs(r["ref"]), r


@_slow
@given(
    vs=st.lists(
        st.one_of(
            st.integers(0, 10**7),
            st.sampled_from([31, 32, 33, 63, 64, 1023, 1024, 2**20, 2**20 + 1]),
        ),
        min_size=1,
        max_size=30,
        unique=True,
    ),
    sf=st.integers(1, 5),
)
def test_hdr_quantize_properties(spark, vs, sf):
    """HDR bucket-rule invariants for every sig_figs over adversarial
    values (powers of two, boundaries): the median-equivalent
    representative stays inside its value's bucket, is idempotent, is
    identity below sub_bucket_count, and keeps relative error under
    10^-sf; "lowest" mode additionally never increases a value
    (src/dqe_hist.erl:30-57)."""
    import math

    from pyspark.sql import functions as F

    from dqe_spark.dql.compiler import hdr_quantize

    htv = 10**8  # above every generated value: isolate the bucket rule
    df = spark.createDataFrame([(v,) for v in vs], "v long")
    rows = df.select(
        "v",
        hdr_quantize(F.col("v"), htv, sf).alias("q"),
        hdr_quantize(hdr_quantize(F.col("v"), htv, sf), htv, sf).alias("qq"),
        hdr_quantize(F.col("v"), htv, sf, "lowest").alias("lo"),
    ).collect()
    sbc = 1 << math.ceil(math.log2(2 * 10**sf))
    for r in rows:
        v, q, qq, lo = r["v"], r["q"], r["qq"], r["lo"]
        assert qq == q, "idempotent"
        assert lo <= v
        if v < sbc:
            assert q == v == lo, "identity below sub_bucket_count"
        else:
            quantum = 1 << (v.bit_length() - 1 - (sbc.bit_length() - 2))
            assert lo <= q < lo + quantum, "representative inside bucket"
            assert q == lo + quantum // 2
            assert abs(v - q) / v < 10**-sf, (v, q, sf)


texts = st.lists(
    st.text(
        alphabet=st.sampled_from(list("ab \n")), min_size=0, max_size=40
    ),
    min_size=1,
    max_size=10,
)


@_slow
@given(docs=texts)
def test_dedup_lines_idempotent_and_exact(spark, docs):
    """dedup_lines == a Python first-occurrence dedup, and applying it
    twice changes nothing (a cleaned doc has no duplicate lines)."""
    from pyspark.sql import functions as F

    from dqe_spark.operators.text import dedup_lines

    rows = [(i, t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in dedup_lines(df).collect()}
    for i, t in rows:
        lines = t.split("\n")
        seen, keep = set(), []
        for ln in lines:
            if ln not in seen:
                seen.add(ln)
                keep.append(ln)
        assert got[i]["text_clean"] == "\n".join(keep), repr(t)
        assert got[i]["n_lines"] == len(lines)
        assert got[i]["n_distinct_lines"] == len(keep)
        assert got[i]["dup_line_ratio_e4"] == (
            (len(lines) - len(keep)) * 10000
        ) // len(lines)
    twice = {
        r["doc_id"]: r["text_clean"]
        for r in dedup_lines(
            dedup_lines(df).select("doc_id", F.col("text_clean").alias("text"))
        ).collect()
    }
    assert twice == {i: got[i]["text_clean"] for i, _ in rows}


@_slow
@given(
    ids=st.lists(st.integers(0, 10_000), min_size=1, max_size=60, unique=True),
    quota=st.integers(1, 8),
)
def test_sample_stratified_matches_bruteforce(spark, ids, quota):
    """Quota sample == sort-by-(rank-hash, id) prefix per stratum, for
    any quota and stratum sizes (incl. strata smaller than quota)."""
    from dqe_spark.operators.sampling import rank_hash, sample_stratified

    rows = [(i, "s" + str(i % 3)) for i in ids]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    ranked = df.select(
        "source", "doc_id", rank_hash("source", "doc_id").alias("rh")
    ).collect()
    want: dict[str, list] = {}
    for r in sorted(ranked, key=lambda r: (r["rh"], r["doc_id"])):
        want.setdefault(r["source"], [])
        if len(want[r["source"]]) < quota:
            want[r["source"]].append(r["doc_id"])
    got: dict[str, list] = {}
    for r in sorted(
        sample_stratified(df, quota, strata="source").collect(),
        key=lambda r: (r["source"], r["rn"]),
    ):
        got.setdefault(r["source"], []).append(r["doc_id"])
    assert got == want


pts2 = st.lists(
    st.tuples(
        st.sampled_from(["a", "b"]),
        st.integers(0, 40).map(lambda x: x * 250),
        st.integers(-5000, 5000).map(lambda x: x / 100.0),
    ),
    min_size=1,
    max_size=30,
)


@_slow
@given(pts=pts2)
def test_running_total_matches_bruteforce(spark, pts):
    """running_total == per-(series, epoch) prefix sums of the exact
    python accumulation, independent of input row order."""
    from dqe_spark.operators.stats import running_total

    df = spark.createDataFrame(pts, "metric string, ts_ms long, value double")
    got = sorted(
        (r["metric"], r["ts_ms"], r["value"], r["running"])
        for r in running_total(df, reset_ms=5000).collect()
    )
    by_key: dict = {}
    for m, t, v in sorted(pts, key=lambda r: (r[0], r[1] // 5000, r[1], r[2])):
        by_key.setdefault((m, t // 5000), []).append((t, v))
    want = []
    for (m, _ep), seq in by_key.items():
        acc = 0
        for t, v in seq:
            acc += round(v * 100)
            want.append((m, t, v, acc / 100.0))
    # ties on (ts, value) are identical rows — multisets must agree
    assert got == sorted(want)


@_slow
@given(pts=pts2)
def test_share_of_total_invariants(spark, pts):
    """Per-window shares: group sums add to the window total, and for
    all-positive windows the floor'd basis points sum into
    (10000 - n_groups, 10000]."""
    from dqe_spark.operators.stats import share_of_total

    df = spark.createDataFrame(pts, "metric string, ts_ms long, value double")
    rows = share_of_total(df, ("metric",), 5000).collect()
    by_w: dict = {}
    for r in rows:
        by_w.setdefault(r["wts"], []).append(r)
    for wts, grp in by_w.items():
        total = sum(
            round(v * 100) for m, t, v in pts if t - t % 5000 == wts
        )
        assert round(sum(r["group_sum"] for r in grp) * 100) == total
        if total > 0 and all(r["group_sum"] >= 0 for r in grp):
            bp = sum(r["share_bp"] for r in grp)
            assert 10000 - len(grp) < bp <= 10000


@_slow
@given(pts=pts2)
def test_windowed_pearson_bounds_and_symmetry(spark, pts):
    """r stays within [-1, 1] (+ rounding slack) and is symmetric in
    its arguments."""
    from dqe_spark.operators.stats import windowed_pearson

    both = [(m, t, v) for (m, t, v) in pts] + [
        ("b" if m == "a" else "a", t, v / 2 + 1) for (m, t, v) in pts
    ]
    df = spark.createDataFrame(both, "metric string, ts_ms long, value double")
    xy = {r["wts"]: r["r"] for r in windowed_pearson(df, "a", "b", 5000).collect()}
    yx = {r["wts"]: r["r"] for r in windowed_pearson(df, "b", "a", 5000).collect()}
    assert set(xy) == set(yx)
    for w, r in xy.items():
        assert r is None or (-1.0001 <= r <= 1.0001 and yx[w] == r)


@given(
    xs=st.lists(st.integers(min_value=-10**7, max_value=10**7),
                min_size=1, max_size=200),
    k=st.integers(min_value=1, max_value=50),
    k4=st.integers(min_value=0, max_value=100_000),
)
@settings(max_examples=200, deadline=None)
def test_cusum_chart_equals_direct_fold(xs, k, k4):
    """The vectorized prefix-sum identity in anomaly._cusum_chart
    (sp = P_m − min P over each row's tail) must equal the direct
    per-row replay of the clamped recurrence, for any int series,
    tail length, and slack — including the short-tail head rows."""
    import numpy as np

    from dqe_spark.operators.anomaly import _cusum_chart

    x4 = np.array(xs, dtype=np.int64)
    sp, sn = _cusum_chart(x4, k4, k)
    for i in range(len(xs)):
        tail = xs[max(0, i - k): i + 1]
        s, n = sum(tail), len(tail)
        mu = (2 * s + n) // (2 * n) if s >= 0 else -((-2 * s + n) // (2 * n))
        a = b = 0
        for x in tail:
            a = max(0, a + x - mu - k4)
            b = min(0, b + x - mu + k4)
        assert sp[i] == a and sn[i] == b, (i, xs, k, k4)


@given(
    st.lists(
        st.integers(min_value=1, max_value=(1 << 60) - 1),
        min_size=1, max_size=50, unique=True,
    )
)
@_slow
def test_deterministic_ln_tracks_libm(duck, vals):
    """The cross-engine series-ln (sketches.ln_int_expr) agrees with
    libm ln to ~1e-8 relative for the whole positive-int64 range it
    serves (HLL linear counting: V ≤ 2^12; surprisal: counts ≤ corpus
    tokens; headroom to 2^60) — accuracy property; cross-engine
    BIT-equality is what the oracle suite pins."""
    import math

    from dqe_spark.operators.sketches import ln_int_expr

    expr = ln_int_expr("v", "duckdb")
    rows = duck.execute(
        f"SELECT v, {expr} FROM (SELECT unnest(?) AS v)", [vals]
    ).fetchall()
    for v, got in rows:
        want = math.log(v)
        assert abs(got - want) <= max(1e-8, abs(want) * 1e-8), (v, got, want)


@_slow
@given(pts=pts2)
def test_windowed_pearson_matches_join_semantics(spark, pts):
    """The one-pass sufficient-statistics form must reproduce the
    original filter+inner-join formulation EXACTLY — including
    duplicate-timestamp inputs, where the join's per-timestamp cross
    product is what the derived products must equal."""
    from pyspark.sql import functions as F

    from dqe_spark.operators.stats import _vint, windowed_pearson

    df = spark.createDataFrame(pts, "metric string, ts_ms long, value double")
    got = {
        (r["wts"], r["n"]): r["r"]
        for r in windowed_pearson(df, "a", "b", 5000).collect()
    }
    # reference: the original join formulation, verbatim
    x = df.where(F.col("metric") == "a").select(
        F.col("ts_ms").alias("__ts"), _vint("value", 100).alias("__x")
    )
    y = df.where(F.col("metric") == "b").select(
        F.col("ts_ms").alias("__ts"), _vint("value", 100).alias("__y")
    )
    j = x.join(y, "__ts")
    wts = (F.col("__ts") - (F.col("__ts") % F.lit(5000))).alias("wts")
    g = j.select(wts, "__x", "__y").groupBy("wts").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__x").alias("sx"),
        F.sum("__y").alias("sy"),
        F.sum(F.col("__x") * F.col("__x")).alias("sxx"),
        F.sum(F.col("__y") * F.col("__y")).alias("syy"),
        F.sum(F.col("__x") * F.col("__y")).alias("sxy"),
    )
    n = F.col("n").cast("decimal(27,0)")
    numer = (n * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    vx = (n * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    vy = (n * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    r = numer / F.sqrt(vx * vy)
    r4 = F.floor(r * 10000 + F.lit(0.5)).cast("double") / 10000.0
    keep = (F.col("n") >= 2) & (vx > 0) & (vy > 0)
    want = {
        (r["wts"], r["n"]): r["r"]
        for r in g.select("wts", "n", F.when(keep, r4).alias("r")).collect()
    }
    assert got == want


@_slow
@given(pts=pts2)
def test_downsampled_pearson_matches_composed(spark, pts):
    """The fused downsample+correlate (stats.downsampled_pearson: one
    conditional aggregation keyed by the agg window) must reproduce
    the composed pipeline — window_agg(agg_avg) per metric followed by
    windowed_pearson over the 4dp averages — BIT-exactly, including
    duplicate-timestamp inputs and negative values (the sign-aware
    half-up average rounding)."""
    from dqe_spark.operators.stats import downsampled_pearson, windowed_pearson
    from dqe_spark.operators.windows import agg_avg, window_agg

    df = spark.createDataFrame(pts, "metric string, ts_ms long, value double")
    got = {
        (r["wts"], r["n"]): r["r"]
        for r in downsampled_pearson(df, "a", "b", 1000, 5000).collect()
    }
    w = window_agg(df, 1000, agg_avg("value"), "value")
    want = {
        (r["wts"], r["n"]): r["r"]
        for r in windowed_pearson(
            w, "a", "b", 5000, ts="wts", scale=10_000
        ).collect()
    }
    assert got == want
