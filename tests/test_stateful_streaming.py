"""Stateful streaming derivate: state must carry each series' last
point across micro-batches (separate availableNow runs sharing a
checkpoint = restart-with-state, the strictest form)."""

from __future__ import annotations

import shutil
import tempfile
from pathlib import Path

import pandas as pd
import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def tmpdirs():
    tmp = Path(tempfile.mkdtemp(prefix="dqe_state_"))
    yield tmp / "landing", tmp / "out", tmp / "ckpt"
    shutil.rmtree(tmp, ignore_errors=True)


def _write_batch(spark, landing: Path, rows):
    landing.mkdir(parents=True, exist_ok=True)
    df = spark.createDataFrame(rows, "metric string, ts_ms long, value double")
    pdf = df.toPandas()
    n = len(list(landing.glob("*.parquet")))
    pdf.to_parquet(landing / f"batch{n}.parquet", index=False)


def _run_drain(spark, landing, out, ckpt):
    from dqe_spark.streaming.stateful import stream_derivate

    src = (
        spark.readStream.schema("metric string, ts_ms long, value double")
        .parquet(str(landing))
    )
    q = (
        stream_derivate(src)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_derivate_state_across_batches(spark, tmpdirs):
    landing, out, ckpt = tmpdirs
    _write_batch(
        spark,
        landing,
        [("m.a", 1000, 10.0), ("m.a", 2000, 13.0), ("m.b", 1000, 5.0)],
    )
    _run_drain(spark, landing, out, ckpt)

    # second batch, separate run, same checkpoint: the first points of
    # m.a/m.b must difference against the LAST points of run 1
    _write_batch(
        spark,
        landing,
        [("m.a", 3000, 20.0), ("m.b", 2000, 4.0)],
    )
    _run_drain(spark, landing, out, ckpt)

    got = {
        (r["metric"], r["ts_ms"]): r["value"]
        for r in spark.read.parquet(str(out)).collect()
    }
    assert got[("m.a", 1000)] == 0.0  # first-ever point → 0 (dup-first)
    assert got[("m.a", 2000)] == 3.0
    assert got[("m.b", 1000)] == 0.0
    assert got[("m.a", 3000)] == 7.0  # 20 − 13 across the batch boundary
    assert got[("m.b", 2000)] == -1.0  # 4 − 5 across the batch boundary


def test_derivate_matches_batch_operator(spark, tmpdirs):
    """Over a fully drained stream, the stateful operator equals the
    batch window-lag derivate."""
    landing, out, ckpt = tmpdirs
    rows = [
        ("m.x", 1000 * i, float((i * 7) % 13)) for i in range(1, 51)
    ] + [("m.y", 1000 * i, float(i)) for i in range(1, 26)]
    _write_batch(spark, landing, rows)
    _run_drain(spark, landing, out, ckpt)

    got = spark.read.parquet(str(out))

    batch = spark.createDataFrame(
        rows, "metric string, ts_ms long, value double"
    )
    from pyspark.sql import Window

    w = Window.partitionBy("metric").orderBy("ts_ms")
    expect = batch.select(
        "metric",
        "ts_ms",
        (F.col("value") - F.coalesce(F.lag("value").over(w), F.col("value"))).alias(
            "value"
        ),
    )
    a = {(r["metric"], r["ts_ms"], r["value"]) for r in got.collect()}
    b = {(r["metric"], r["ts_ms"], r["value"]) for r in expect.collect()}
    assert a == b


def test_stream_sessions_match_batch(spark, tmpdirs):
    """Drained native session_window stream == batch gap sessionize
    (same gap); session ids aside, the (key, start, count) sets agree."""
    from dqe_spark.operators.temporal import sessionize
    from dqe_spark.streaming.ingest import stream_sessions

    landing, out, ckpt = tmpdirs
    rows = (
        [("u1", 1000 * i) for i in range(1, 20)]
        + [("u1", 10_000_000 + 1000 * i) for i in range(5)]
        + [("u2", 500_000), ("u2", 500_500), ("u2", 99_000_000)]
    )
    _write_batch(
        spark,
        landing,
        [(k, t, 0.0) for k, t in rows],
    )
    src = (
        spark.readStream.schema("metric string, ts_ms long, value double")
        .parquet(str(landing))
        .select(
            F.col("metric").alias("user"),
            F.timestamp_millis(F.col("ts_ms")).alias("ts"),
        )
    )
    q = (
        stream_sessions(src, key="user", ts="ts", gap="30 minutes")
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user"], r["session_start"], r["n_events"])
        for r in spark.read.parquet(str(out)).collect()
    }

    batch = spark.createDataFrame(rows, "user string, ts_ms long")
    want = {
        (r["user"], r["session_start"], r["n_events"])
        for r in sessionize(batch, key="user", gap_ms=1_800_000).collect()
    }
    # append mode can't close a session still inside the watermark at
    # stream end — only the tail session may be absent (backfill owns it)
    assert got and got <= want
    max_ts = max(t for _, t in rows)
    horizon = max_ts - 3_600_000 - 1_800_000
    assert all(start >= horizon for _, start, _ in want - got)


def test_stream_zscore_matches_batch_operator(spark, tmpdirs):
    """Drained streaming rolling z-score == the batch operator
    (same k=12 / min_points=4 / integer-exact rolling sums), INCLUDING
    a ring buffer carried across a checkpointed restart."""
    from dqe_spark.operators.anomaly import rolling_zscore
    from dqe_spark.streaming.stateful import stream_zscore

    landing, out, ckpt = tmpdirs
    rows1 = [("m.x", 1000 * i, float((i * 7) % 13) + 0.25) for i in range(1, 31)]
    rows2 = [("m.x", 1000 * i, float((i * 5) % 11)) for i in range(31, 46)] + [
        ("m.y", 1000 * i, float(i % 6)) for i in range(1, 10)
    ]

    def drain():
        src = (
            spark.readStream.schema("metric string, ts_ms long, value double")
            .parquet(str(landing))
        )
        q = (
            stream_zscore(src)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    _write_batch(spark, landing, rows1)
    drain()
    _write_batch(spark, landing, rows2)  # restart with state
    drain()

    got = {
        (r["metric"], r["ts_ms"]): (r["value"], r["zscore"])
        for r in spark.read.parquet(str(out)).collect()
    }
    batch = spark.createDataFrame(
        rows1 + rows2, "metric string, ts_ms long, value double"
    )
    want = {
        (r["metric"], r["wts"]): (r["value"], r["zscore"])
        for r in rolling_zscore(
            batch, k=12, min_points=4, ts="ts_ms"
        ).withColumnRenamed("ts_ms", "wts").collect()
    }
    assert set(got) == set(want) and got
    for k in want:
        gv, gz = got[k]
        wv, wz = want[k]
        assert gv == wv, k
        assert (gz is None) == (wz is None), k
        if wz is not None:
            assert gz == wz, (k, gz, wz)


def test_stream_cusum_matches_batch_operator(spark, tmpdirs):
    """Drained streaming CUSUM == the batch operator (same κ/h/k and
    integer-domain recurrence), including the ring buffer carried
    across a checkpointed restart."""
    from dqe_spark.operators.anomaly import cusum
    from dqe_spark.streaming.stateful import stream_cusum

    landing, out, ckpt = tmpdirs
    rows1 = [("m.x", 1000 * i, 100.0 + (i % 5)) for i in range(1, 31)]
    rows2 = [("m.x", 1000 * i, 160.0 + (i % 3)) for i in range(31, 46)] + [
        ("m.y", 1000 * i, float(i % 6)) for i in range(1, 10)
    ]

    def drain():
        src = (
            spark.readStream.schema("metric string, ts_ms long, value double")
            .parquet(str(landing))
        )
        q = (
            stream_cusum(src, kappa=5.0, h=50.0, k=20)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    _write_batch(spark, landing, rows1)
    drain()
    _write_batch(spark, landing, rows2)  # restart with state
    drain()

    got = {
        (r["metric"], r["ts_ms"]): (r["cusum_pos"], r["cusum_neg"], r["alarm"])
        for r in spark.read.parquet(str(out)).collect()
    }
    batch = spark.createDataFrame(
        rows1 + rows2, "metric string, ts_ms long, value double"
    )
    want = {
        (r["metric"], r["wts"]): (r["cusum_pos"], r["cusum_neg"], r["alarm"])
        for r in cusum(batch, kappa=5.0, h=50.0, k=20, ts="ts_ms")
        .withColumnRenamed("ts_ms", "wts")
        .collect()
    }
    assert set(got) == set(want) and got
    assert got == want
    # the level shift in rows2 must actually alarm
    assert any(a for (_, _, a) in got.values())


def test_stream_threshold_alerts_matches_batch(spark, tmpdirs):
    """Drained streaming alert rule == batch threshold_alerts when all
    runs resolve, with a run spanning the batch boundary (restart with
    the open run in state). Schema note: these frames carry (metric,
    wts, value) — windowed points, not raw ts_ms."""
    from dqe_spark.operators.alerts import threshold_alerts
    from dqe_spark.streaming.stateful import stream_threshold_alerts

    landing, out, ckpt = tmpdirs
    step = 1000
    # m.a: run of 4 split 2+2 across the restart, resolved in batch 2;
    #      then a too-short run (1), also resolved.
    # m.b: a gap (3000 -> 5000) splits breaches into runs of 2 and 2,
    #      only... for_windows=2 so BOTH fire; second resolves at 7000.
    rows1 = [
        ("m.a", 1000, 9.0), ("m.a", 2000, 9.5),
        ("m.b", 2000, 7.0), ("m.b", 3000, 7.5),
    ]
    rows2 = [
        ("m.a", 3000, 8.0), ("m.a", 4000, 8.5), ("m.a", 5000, 1.0),
        ("m.a", 6000, 9.0), ("m.a", 7000, 0.5),
        ("m.b", 5000, 6.5), ("m.b", 6000, 6.0), ("m.b", 7000, 0.0),
    ]

    def drain():
        src = (
            spark.readStream.schema("metric string, wts long, value double")
            .parquet(str(landing))
        )
        q = (
            stream_threshold_alerts(src, threshold=5.0, for_windows=2,
                                    step_ms=step)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    def _w(rows):
        landing.mkdir(parents=True, exist_ok=True)
        pdf = spark.createDataFrame(
            rows, "metric string, wts long, value double"
        ).toPandas()
        n = len(list(landing.glob("*.parquet")))
        pdf.to_parquet(landing / f"batch{n}.parquet", index=False)

    _w(rows1)
    drain()
    _w(rows2)  # restart: m.a's and m.b's open runs live in state
    drain()

    key = lambda r: (r["metric"], r["start_wts"])  # noqa: E731
    cols = ("metric", "start_wts", "fire_wts", "end_wts", "n_windows", "peak")
    got = {key(r): tuple(r[c] for c in cols)
           for r in spark.read.parquet(str(out)).collect()}
    batch = spark.createDataFrame(
        rows1 + rows2, "metric string, wts long, value double"
    )
    want = {key(r): tuple(r[c] for c in cols)
            for r in threshold_alerts(batch, threshold=5.0, for_windows=2,
                                      step_ms=step).collect()}
    assert got == want and got
    # the cross-restart m.a run is one interval 1000..4000, peak 9.5
    assert got[("m.a", 1000)] == ("m.a", 1000, 2000, 4000, 4, 9.5)
