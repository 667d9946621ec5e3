"""Custom stateful streaming operators via applyInPandasWithState.

The reference's `derivate` (v'(t) = v(t) − v(t−1), per series,
src/dqe_derivate.erl:23-27) is a pure window-lag in batch, but on a
stream the previous point of each series lives in the PREVIOUS
micro-batch — a genuinely stateful operator Spark's built-in windowed
aggregates can't express. This is the `applyInPandasWithState`
pattern: state = last (ts_ms, value) per series key, Arrow-batched,
one state row per series.

Scale notes: state is O(#series) (two numbers each), partitioned by
the grouping key — the same key the metric store shuffles on. The
watermark-less default keeps all series alive; pass a timeout to drop
idle series' state (GroupStateTimeout.ProcessingTimeTimeout).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "metric string, ts_ms long, value double"
STATE_SCHEMA = "last_ts long, last_value double"


def _derivate_fn(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (metric,) = key
    if state.exists:
        last_ts, last_value = state.get
    else:
        last_ts, last_value = None, None
    # chunks of one group arrive in arbitrary slices — concatenate and
    # sort ONCE so the lag is computed over the full micro-batch
    pdf = pd.concat(list(pdfs)).sort_values("ts_ms")
    if len(pdf):
        ts = pdf["ts_ms"].to_numpy()
        vals = pdf["value"].to_numpy()
        prev = pd.Series(vals).shift(1)
        if last_value is not None:
            prev.iloc[0] = last_value
        out = pd.DataFrame(
            {"metric": metric, "ts_ms": ts, "value": vals - prev.to_numpy()}
        )
        # first-ever point has no predecessor: reference duplicates the
        # first element, making its derivative 0 (src/dqe_derivate.erl:29-32)
        if last_value is None:
            out.iloc[0, out.columns.get_loc("value")] = 0.0
        last_ts, last_value = int(ts[-1]), float(vals[-1])
        yield out
    state.update((last_ts, last_value))


def stream_derivate(metrics: DataFrame) -> DataFrame:
    """Per-series point-to-point difference over a streaming metrics
    frame (columns metric, ts_ms, value). State carries each series'
    last point across micro-batches (and across restarts, via the
    checkpoint's state store)."""
    return (
        metrics.select("metric", "ts_ms", "value")
        .groupBy("metric")
        .applyInPandasWithState(
            _derivate_fn,
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


Z_OUT_SCHEMA = "metric string, ts_ms long, value double, zscore double"
# ring buffer of the k most recent v4 = round(value*10^4) integers,
# newest last; ints keep the rolling sums exact and order-free, the
# same discipline as the batch operator (operators/anomaly.py)
Z_STATE_SCHEMA = "tail array<long>"

_Z_K = 12
_Z_MIN = 4


def _zscore_fn(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (metric,) = key
    tail: list[int] = list(state.get[0]) if state.exists else []
    pdf = pd.concat(list(pdfs)).sort_values("ts_ms")
    if len(pdf):
        out_z = []
        for v in pdf["value"].to_numpy():
            n = len(tail)
            if n >= _Z_MIN:
                s = sum(tail)
                ss = sum(x * x for x in tail)
                mu = s / n / 10000.0
                var = max((n * ss - s * s) / (n * n) / 1e8, 0.0)
                sd = var ** 0.5
                z = round((float(v) - mu) / sd, 4) if sd > 0 else None
            else:
                z = None
            out_z.append(z)
            tail.append(int(round(float(v) * 10000)))
            if len(tail) > _Z_K:
                tail.pop(0)
        yield pd.DataFrame(
            {
                "metric": metric,
                "ts_ms": pdf["ts_ms"].to_numpy(),
                "value": pdf["value"].to_numpy(),
                "zscore": pd.array(out_z, dtype="float64"),
            }
        )
    state.update(([int(x) for x in tail],))


def stream_zscore(metrics: DataFrame) -> DataFrame:
    """Streaming rolling z-score: each point scored against its k=12
    predecessors per series — the live twin of
    operators/anomaly.rolling_zscore (same k/min_points/integer-exact
    sums, so a drained stream matches the batch operator bit-for-bit;
    asserted in tests). State per series is the k-point v4 ring buffer
    (≤ 12 longs), partitioned on the series key."""
    return (
        metrics.select("metric", "ts_ms", "value")
        .groupBy("metric")
        .applyInPandasWithState(
            _zscore_fn,
            outputStructType=Z_OUT_SCHEMA,
            stateStructType=Z_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


C_OUT_SCHEMA = (
    "metric string, ts_ms long, value double, "
    "cusum_pos double, cusum_neg double, alarm boolean"
)
#: ring buffer of the (k+1) most recent v4 integers, newest last —
#: the same tail the batch operator folds (rowsBetween(-k, 0))
C_STATE_SCHEMA = "tail array<long>"


def _make_cusum_fn(kappa4: int, h4: int, k: int):
    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (metric,) = key
        tail: list[int] = list(state.get[0]) if state.exists else []
        pdf = pd.concat(list(pdfs)).sort_values("ts_ms")
        if len(pdf):
            pos, neg, alarm = [], [], []
            for v in pdf["value"].to_numpy():
                tail.append(int(round(float(v) * 10000)))
                if len(tail) > k + 1:
                    tail.pop(0)
                n = len(tail)
                s = sum(tail)
                # truncating div like Spark's `div` (both branches
                # operate on non-negative ints, where // == div)
                mu4 = (
                    (2 * s + n) // (2 * n)
                    if s >= 0
                    else -((2 * -s + n) // (2 * n))
                )
                sp = sn = 0
                for x in tail:
                    sp = max(0, sp + x - mu4 - kappa4)
                    sn = min(0, sn + x - mu4 + kappa4)
                pos.append(sp / 10000.0)
                neg.append(sn / 10000.0)
                alarm.append(sp >= h4 or -sn >= h4)
            yield pd.DataFrame(
                {
                    "metric": metric,
                    "ts_ms": pdf["ts_ms"].to_numpy(),
                    "value": pdf["value"].to_numpy(),
                    "cusum_pos": pos,
                    "cusum_neg": neg,
                    "alarm": alarm,
                }
            )
        state.update(([int(x) for x in tail],))

    return fn


A_OUT_SCHEMA = (
    "metric string, start_wts long, fire_wts long, end_wts long, "
    "n_windows long, peak double"
)
#: the open run per series: first/last breached window, run length,
#: worst value so far (max in `above` mode, min otherwise)
A_STATE_SCHEMA = "start_wts long, last_wts long, n long, peak double"


def _make_alert_fn(threshold: float, for_windows: int, step_ms: int, above: bool):
    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (metric,) = key
        run = list(state.get) if state.exists else None
        pdf = pd.concat(list(pdfs)).sort_values("wts")
        closed = []

        def close():
            nonlocal run
            if run and run[2] >= for_windows:
                closed.append(
                    (
                        metric,
                        run[0],
                        run[0] + (for_windows - 1) * step_ms,
                        run[1],
                        run[2],
                        run[3],
                    )
                )
            run = None

        for wts, v in zip(pdf["wts"].to_numpy(), pdf["value"].to_numpy()):
            wts, v = int(wts), float(v)
            breach = v > threshold if above else v < threshold
            if not breach:
                close()
                continue
            if run and wts == run[1] + step_ms:
                run[1], run[2] = wts, run[2] + 1
                run[3] = max(run[3], v) if above else min(run[3], v)
            else:
                close()  # a window gap breaks the run, like batch islands
                run = [wts, wts, 1, v]
        if closed:
            yield pd.DataFrame(
                closed,
                columns=[
                    "metric", "start_wts", "fire_wts", "end_wts",
                    "n_windows", "peak",
                ],
            )
        if run:
            state.update(tuple(run))
        elif state.exists:
            state.remove()

    return fn


def stream_threshold_alerts(
    windows: DataFrame,
    threshold: float,
    for_windows: int,
    step_ms: int,
    above: bool = True,
) -> DataFrame:
    """Streaming `expr > t FOR d` rule over windowed points (metric,
    wts, value): the live twin of operators/alerts.threshold_alerts.
    Emits one row per RESOLVED firing interval — the moment a
    non-breach or a window gap ends a run of >= for_windows
    consecutive breached windows (same islands semantics as batch, so
    a drained stream whose runs all resolve matches the batch operator
    bit-for-bit — asserted in tests, including across a checkpointed
    restart). State per series is the open run: 3 longs + 1 double."""
    return (
        windows.select("metric", "wts", "value")
        .groupBy("metric")
        .applyInPandasWithState(
            _make_alert_fn(threshold, for_windows, step_ms, above),
            outputStructType=A_OUT_SCHEMA,
            stateStructType=A_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def stream_cusum(
    metrics: DataFrame, kappa: float = 0.5, h: float = 4.0, k: int = 96
) -> DataFrame:
    """Streaming CUSUM drift chart: each point's two-sided drift sums
    over its k-tail, the live twin of operators/anomaly.cusum (same
    integer-domain recurrence and rounded tail mean, so a drained
    stream matches the batch operator bit-for-bit, including across a
    checkpointed restart — asserted in tests). State per series is the
    (k+1)-point v4 ring buffer, partitioned on the series key."""
    return (
        metrics.select("metric", "ts_ms", "value")
        .groupBy("metric")
        .applyInPandasWithState(
            _make_cusum_fn(int(round(kappa * 10000)), int(round(h * 10000)), k),
            outputStructType=C_OUT_SCHEMA,
            stateStructType=C_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
