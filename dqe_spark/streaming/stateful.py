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
