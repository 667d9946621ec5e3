"""Dense-series semantics: NULL-fill for empty windows.

The reference emits NULL-filled dense arrays for ranges with no data
(/root/reference/src/dqe_get.erl:53-60) — every window in the query
range exists in the output, value NULL when nothing was recorded. Our
long-format results drop empty windows by construction, so this
operator re-densifies: a generated time spine per series, left-joined
against the aggregated frame.

Scale: the spine is sequence()/explode over (series × windows) —
generated, not shuffled; the left join is keyed on (series, wts) and
broadcast-able when the aggregated side is small. For dashboards over
narrow ranges this is cheap; for wide ranges prefer leaving sparsity
to the client (dense 100 TB output defeats the point).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def densify(
    agg: DataFrame,
    start_ms: int,
    end_ms: int,
    window_ms: int,
    keys: Sequence[str] = ("metric",),
    ts: str = "wts",
    value: str = "value",
) -> DataFrame:
    """Left-join the aggregated frame onto a full time spine.

    Output has one row per (series, window) for every window whose
    start lies in [floor(start/w)*w, end); missing aggregates are NULL.
    """
    first = (start_ms // window_ms) * window_ms
    last = end_ms - 1  # windows starting before end
    series = agg.select(*keys).distinct()
    spine = series.select(
        *keys,
        F.explode(
            F.sequence(F.lit(first), F.lit(last), F.lit(window_ms))
        ).alias(ts),
    )
    return spine.join(agg, on=[*keys, ts], how="left")
