"""Interleaved A/B/C for corr_click_view_1h's Pearson staging.

Round-10's one-pass rewrite (stats.windowed_pearson over window_agg
output) measured ~flat in the builder's A/B but 1.07 -> 1.41 s in the
driver's record — the round-11 verdict asks for an on-record
interleaved A/B at sf0.1 AND sf1 of:

  old   — two filtered scans + window_agg per side + inner join on the
          minute ts (the r9 shape, reconstructed verbatim)
  cur   — window_agg once + one-pass windowed_pearson (r10 shape)
  fused — downsampled_pearson: one conditional aggregation keyed by
          the minute alone (1 scan, 2 exchanges)

One session, variants interleaved per round so host drift lands on all
three; a pure-scan control row per round tracks the drift itself.
Row-identity across the three forms is asserted before any timing.

Usage: python scripts/ab_pearson.py [sf_dir] [reps]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 9
os.environ["SPARK_GRAFT_SF_DIR"] = SF

from pyspark.sql import functions as F  # noqa: E402

from dqe_spark.entry import all_queries  # noqa: E402
from dqe_spark.session import get_spark  # noqa: E402


def old_form(spark, sf_dir):
    """The r9 two-scan join Pearson, reconstructed."""
    from dqe_spark.operators.stats import _DEC, _vint
    from dqe_spark.operators.windows import agg_avg, window_agg
    from dqe_spark.sources.metric_store import load_metrics

    m = load_metrics(spark, sf_dir).where(
        F.col("metric").isin("events.click", "events.view")
    )
    points = window_agg(m, 60_000, agg_avg("value"), "value")
    ts, v, scale, window_ms, min_n = "wts", "value", 10_000, 3_600_000, 2
    x = points.where(F.col("metric") == "events.click").select(
        F.col(ts).alias("__ts"), _vint(v, scale).alias("__x")
    )
    y = points.where(F.col("metric") == "events.view").select(
        F.col(ts).alias("__ts"), _vint(v, scale).alias("__y")
    )
    j = x.join(y, "__ts")
    wts = (F.col("__ts") - (F.col("__ts") % F.lit(window_ms))).alias("wts")
    g = j.select(wts, "__x", "__y").groupBy("wts").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__x").alias("sx"),
        F.sum("__y").alias("sy"),
        F.sum(F.col("__x") * F.col("__x")).alias("sxx"),
        F.sum(F.col("__y") * F.col("__y")).alias("syy"),
        F.sum(F.col("__x") * F.col("__y")).alias("sxy"),
    )
    n = F.col("n").cast(_DEC)
    numer = (n * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    vx = (n * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    vy = (n * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    r = numer / F.sqrt(vx * vy)
    r4 = F.floor(r * 10000 + F.lit(0.5)).cast("double") / 10000.0
    keep = (F.col("n") >= min_n) & (vx > 0) & (vy > 0)
    return g.select("wts", "n", F.when(keep, r4).alias("r"))


def fused_form(spark, sf_dir):
    from dqe_spark.operators.stats import downsampled_pearson
    from dqe_spark.sources.metric_store import load_metrics

    return downsampled_pearson(
        load_metrics(spark, sf_dir),
        "events.click",
        "events.view",
        60_000,
        3_600_000,
    )


def main():
    spark = get_spark("ab-pearson")
    qs = all_queries()
    variants = {
        "old": lambda: old_form(spark, SF),
        "cur": lambda: qs["corr_click_view_1h"](spark, SF),
        "fused": lambda: fused_form(spark, SF),
    }

    # row-identity gate before any timing
    rows = {
        k: sorted(map(tuple, fn().collect())) for k, fn in variants.items()
    }
    assert rows["old"] == rows["cur"] == rows["fused"], {
        k: (len(v), v[:3]) for k, v in rows.items()
    }
    print(f"row-identity OK: {len(rows['cur'])} rows", flush=True)

    # settle the session (bench.py's steady-state rule)
    settle = []
    for _ in range(30):
        t0 = time.perf_counter()
        qs["get_points"](spark, SF).collect()
        settle.append(time.perf_counter() - t0)
        if len(settle) >= 6 and max(settle[-3:]) <= 1.25 * min(settle):
            break
    print(f"settled after {len(settle)} reps, floor {min(settle):.3f}", flush=True)

    samples = {k: [] for k in variants}
    controls = []
    for rep in range(REPS):
        t0 = time.perf_counter()
        qs["get_points"](spark, SF).collect()
        controls.append(round(time.perf_counter() - t0, 3))
        for k in variants:
            t0 = time.perf_counter()
            variants[k]().collect()
            samples[k].append(round(time.perf_counter() - t0, 3))
    med = {
        k: sorted(v)[len(v) // 2] for k, v in samples.items()
    }
    print(json.dumps({
        "sf": SF,
        "reps": REPS,
        "median": med,
        "samples": samples,
        "control": controls,
    }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
