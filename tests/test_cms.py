"""Portable Count-Min sketch (operators/sketches.py CMS section):
the additive-merge losslessness the ladder rests on, the one-sided
error contract (never undercounts, overcount bounded by ε·N), and the
serving-path plan guard for the watchlist query."""

from __future__ import annotations

from pyspark.sql import functions as F

from dqe_spark.operators import sketches as SK
from tests.conftest import SF_SMOKE


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _toy(spark):
    rows = [
        ("a", h * 3_600_000, f"u{i % 40}")
        for h in range(30)
        for i in range(h + 1)
    ] + [("b", 0, "u1"), ("b", 0, None)]
    return spark.createDataFrame(rows, "k STRING, wts LONG, v STRING")


def test_cms_merge_hourly_to_day_equals_direct_day_build(spark):
    """Counters are additive, so sum-merging hour cells to a day must
    equal sketching at day grain directly — the invariant that lets
    the ladder serve ANY window from one base resolution."""
    DAY = 86_400_000
    df = _toy(spark)
    hourly = SK.cms_registers(df, ["k", "wts"], "v")
    merged = SK.cms_merge(
        hourly.withColumn("wts", F.col("wts") - F.col("wts") % F.lit(DAY)),
        ["k", "wts"],
    )
    direct = SK.cms_registers(
        df.withColumn("wts", F.col("wts") - F.col("wts") % F.lit(DAY)),
        ["k", "wts"],
        "v",
    )
    got = {tuple(r) for r in merged.collect()}
    want = {tuple(r) for r in direct.collect()}
    assert got == want


def test_cms_probe_never_undercounts_and_bounds_overcount(spark):
    """CMS error is one-sided: est ≥ exact always; over a cell of N
    items the expected overcount is N/W per row, and min over D rows
    keeps the realized error well under ε·N = (e/W)·N — assert the
    hard floor exactly and the ceiling with slack."""
    df = _toy(spark).where(F.col("v").isNotNull())
    regs = SK.cms_registers(df, ["k"], "v")
    probe = df.select("v").distinct()
    est = {
        (r["k"], r["v"]): r["est_count"]
        for r in SK.cms_probe(regs, ["k"], probe, "v").collect()
    }
    exact = {
        (r["k"], r["v"]): r["n"]
        for r in df.groupBy("k", "v").agg(F.count("*").alias("n")).collect()
    }
    n_cell = {
        r["k"]: r["n"]
        for r in df.groupBy("k").agg(F.count("*").alias("n")).collect()
    }
    for cell_key, true in exact.items():
        e = est[cell_key]
        assert e >= true, f"{cell_key}: CMS undercounted {e} < {true}"
        budget = max(3, int(2.72 / SK.CMS_W * n_cell[cell_key[0]]) + 1)
        assert e - true <= budget, (
            f"{cell_key}: overcount {e - true} exceeds ε·N budget {budget}"
        )
    # absent keys probe to collisions only — tiny, never negative
    ghost = SK.cms_probe(
        regs, ["k"], spark.createDataFrame([("zzz-never",)], "v STRING"), "v"
    ).collect()
    for r in ghost:
        assert 0 <= r["est_count"] <= 3


def test_cms_register_shape_is_bounded(spark):
    """≤ D·W rows per cell by construction; with few distinct values
    the relation is ∝ D·distinct (sparse — the reason the relation
    layout serves fine where the HLL needed packing)."""
    df = _toy(spark)
    regs = SK.cms_registers(df, ["k"], "v")
    per_cell = {
        r["k"]: r["n"]
        for r in regs.groupBy("k").agg(F.count("*").alias("n")).collect()
    }
    n_distinct = {
        r["k"]: r["n"]
        for r in df.where(F.col("v").isNotNull())
        .groupBy("k")
        .agg(F.count_distinct("v").alias("n"))
        .collect()
    }
    for k, n in per_cell.items():
        assert n <= SK.CMS_D * SK.CMS_W
        assert n <= SK.CMS_D * n_distinct[k]  # ≤, == absent collisions


def test_watchlist_serve_plan_reads_store_not_raw(spark):
    from dqe_spark.entry import all_queries

    df = all_queries()["events_watchlist_cms_serve"](spark, SF_SMOKE)
    plan = _plan(df)
    assert "events.parquet" not in plan
    assert "rollup_cms" in plan
    assert "cms_watchlist" in plan
    assert "EvalPython" not in plan and "CartesianProduct" not in plan


def test_cms_increment_merge_equals_rebuild(spark, tmp_path):
    """Landing new events via merge_cms_increment must equal a
    from-scratch rebuild — counts are additive, so the touched-
    partition sum-merge is lossless."""
    from pyspark.sql import functions as F

    from dqe_spark.sources import rollup as R
    from dqe_spark.sources.metric_store import load_events

    ev = load_events(spark, SF_SMOKE)
    part_a = ev.where(F.col("event_id") % 5 != 0)
    part_b = ev.where(F.col("event_id") % 5 == 0)

    # record the full-corpus store, rebuild it from part A only,
    # merge part B through the increment path, compare, restore.
    R.build_cms_rollup(spark, SF_SMOKE, 3_600_000, force=True)
    import shutil

    store = R._cms_dir(SF_SMOKE, 3_600_000)
    full = {
        (r["event_type"], r["wts"], r["d"], r["pos"]): r["c"]
        for r in spark.read.parquet(str(store)).collect()
    }
    # rebuild from A by writing partials manually through the same API
    from dqe_spark.operators.sketches import cms_registers

    shutil.rmtree(store)
    regs_a = cms_registers(
        part_a.select(
            "event_type",
            (F.col("ts_ms") - F.col("ts_ms") % F.lit(3_600_000)).alias("wts"),
            "user_id",
        ),
        ["event_type", "wts"],
        "user_id",
    )
    R._atomic_write(
        regs_a, store, "_tmp_test_cms_a", part_cols=("event_type",)
    )
    R.merge_cms_increment(spark, part_b, SF_SMOKE, 3_600_000)
    merged = {
        (r["event_type"], r["wts"], r["d"], r["pos"]): r["c"]
        for r in spark.read.parquet(str(store)).collect()
    }
    try:
        assert merged == full
    finally:
        R.build_cms_rollup(spark, SF_SMOKE, 3_600_000, force=True)


def test_expire_cms_and_pdistinct_ladders(spark):
    """TTL parity for the round-8 sketch stores: 'cms' and 'pdistinct'
    are expire_rollup_before ladders like every other level — windows
    strictly older than the aligned cutoff disappear, survivors are
    byte-identical, the store stays atomic-loadable."""
    from pyspark.sql import functions as F

    from dqe_spark.sources import rollup as R

    res = 3_600_000
    for ladder, build, dir_of in (
        ("cms", R.build_cms_rollup, R._cms_dir),
        ("pdistinct", R.build_portable_distinct_rollup, R._pdistinct_dir),
    ):
        build(spark, SF_SMOKE, res, force=True)
        out = dir_of(SF_SMOKE, res)
        before = spark.read.parquet(str(out))
        lo, hi = before.agg(F.min("wts"), F.max("wts")).first()
        cutoff = (lo + hi) // 2 + 17
        aligned = cutoff - (cutoff % res)
        want = {
            tuple(r)
            for r in before.where(F.col("wts") >= aligned)
            .drop("regs")  # packed arrays aren't hashable; compare keys
            .collect()
        }
        assert R.expire_rollup_before(spark, SF_SMOKE, cutoff, res, ladder)
        after = spark.read.parquet(str(out))
        got = {tuple(r) for r in after.drop("regs").collect()}
        assert got == want and got, ladder
        assert after.agg(F.min("wts")).first()[0] >= aligned
        build(spark, SF_SMOKE, res, force=True)  # restore
