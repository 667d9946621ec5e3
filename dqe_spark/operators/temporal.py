"""Temporal operators Spark lacks as built-ins: as-of join and
sessionization.

Neither exists in the reference (its only multi-input op is the
positional combinator, SURVEY.md §2.3) — these are the temporal
primitives a metrics+events store needs next: enrich an event with the
latest metric reading at or before it (as-of), and split an activity
stream into gap-bounded sessions.

Both are single-shuffle window-function compositions — no UDFs, no
per-row Python, no range-explosion:

  * as-of join: union both sides tagged, one window pass carries the
    most recent right-side value forward, filter back to left rows.
    Cost: one shuffle on the join key — same as any keyed join; never
    materializes the O(left × right) candidate space a naive
    range-join would.
  * sessionize: session boundary = gap > timeout (lag), session id =
    running count of boundaries (cumulative sum) — two window exprs
    over one (key, ts) sort.

At 100 TB both shuffle once on the natural key (series / user), so
they scale exactly like the window aggregates in §2.4.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts_ms",
    right_ts: str = "ts_ms",
    value: str = "value",
    out: str = "asof_value",
    tolerance_ms: int | None = None,
) -> DataFrame:
    """For each left row, attach the right-side `value` with the
    greatest right_ts ≤ left_ts within the same key (NULL if none, or
    if the match is older than `tolerance_ms`).

    Output: all left columns + `out` (+ `asof_ts` the matched ts)."""
    lcols = left.columns
    r = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.col(value).alias("__rv"),
    )
    l = left.select(  # noqa: E741
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.col(c).alias(f"__l_{c}") for c in lcols],
    )
    u = r.unionByName(l, allowMissingColumns=True)
    # right rows sort before left rows at equal ts (__side 0 < 1), so a
    # same-timestamp reading IS visible to the event — "at or before"
    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn("__asof", F.last("__rv", ignorenulls=True).over(w)).withColumn(
        "__asof_ts",
        # track the ts of the row that supplied __asof: only right rows
        # with a NON-NULL value — otherwise a null-valued right row
        # advances asof_ts past the value actually returned, reporting
        # a mismatched pair and defeating the staleness tolerance
        F.last(
            F.when((F.col("__side") == 0) & F.col("__rv").isNotNull(), F.col("__ts")),
            ignorenulls=True,
        ).over(w),
    )
    res = u.where(F.col("__side") == 1).select(
        *[F.col(f"__l_{c}").alias(c) for c in lcols],
        F.col("__asof").alias(out),
        F.col("__asof_ts").alias("asof_ts"),
    )
    if tolerance_ms is not None:
        stale = F.col("asof_ts") < F.col(left_ts) - F.lit(tolerance_ms)
        res = res.withColumn(
            out, F.when(stale, F.lit(None)).otherwise(F.col(out))
        ).withColumn(
            "asof_ts", F.when(stale, F.lit(None)).otherwise(F.col("asof_ts"))
        )
    return res


def sessionize(
    df: DataFrame,
    key: str,
    ts: str = "ts_ms",
    gap_ms: int = 1_800_000,
) -> DataFrame:
    """Gap-based sessions per key: a new session starts when the time
    since the previous row reaches `gap_ms` (strictly-less-than keeps a
    session alive — the same boundary Spark's native session_window
    uses, so the streaming twin agrees on exact-gap spacing). Returns
    one row per session: (key, session_id, session_start, session_end,
    n_events) with session_id numbered 1..N per key in time order."""
    w = Window.partitionBy(key).orderBy(ts)
    gap = F.col(ts) - F.lag(ts).over(w)
    boundary = F.when(gap.isNull() | (gap >= gap_ms), 1).otherwise(0)
    with_sid = df.withColumn(
        "session_id",
        F.sum(boundary).over(
            Window.partitionBy(key)
            .orderBy(ts)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return with_sid.groupBy(key, "session_id").agg(
        F.min(ts).alias("session_start"),
        F.max(ts).alias("session_end"),
        F.count("*").alias("n_events"),
    )


def funnel(
    events: DataFrame,
    steps: list[str],
    within_ms: int,
    user: str = "user_id",
    etype: str = "event_type",
    ts: str = "ts_ms",
) -> DataFrame:
    """Ordered conversion funnel: a user reaches step i when they have
    a step-i event at-or-after their step-(i−1) time and within
    ``within_ms`` of their FIRST step-1 event (the standard
    fixed-window funnel). First-qualifying (min) times make the result
    deterministic. Output: (step, event_type, n_users), one row per
    step.

    Plan shape: step i is one pushed-filter scan of that step's events
    joined to the (one-row-per-user) survivor table of step i−1, then a
    per-user min — K−1 equi-joins keyed on the user, each touching only
    its own step's events; survivors shrink monotonically. No window
    over a per-user ALL-events partition and no event-sequence
    explosion — at 100 TB the per-step filter pushdown is what keeps
    each join's probe side small."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    F_ = F
    lvl = (
        events.where(F_.col(etype) == steps[0])
        .groupBy(user)
        .agg(F_.min(ts).alias("t_prev"))
        .withColumn("t0", F_.col("t_prev"))
    )
    out = [
        lvl.agg(
            F_.lit(1).alias("step"),
            F_.lit(steps[0]).alias("event_type"),
            F_.count("*").cast("long").alias("n_users"),
        )
    ]
    for i, s in enumerate(steps[1:], start=2):
        ev = events.where(F_.col(etype) == s).select(
            F_.col(user), F_.col(ts).alias("__ts")
        )
        lvl = (
            ev.join(lvl, user)
            .where(
                (F_.col("__ts") >= F_.col("t_prev"))
                & (F_.col("__ts") <= F_.col("t0") + within_ms)
            )
            .groupBy(user)
            .agg(F_.min("__ts").alias("t_prev"), F_.min("t0").alias("t0"))
        )
        out.append(
            lvl.agg(
                F_.lit(i).alias("step"),
                F_.lit(s).alias("event_type"),
                F_.count("*").cast("long").alias("n_users"),
            )
        )
    res = out[0]
    for o in out[1:]:
        res = res.unionByName(o)
    return res


def window_gaps(points: DataFrame, res_ms: int) -> DataFrame:
    """Missing-window (ingest gap) detection per metric: contiguous
    runs of empty ``res_ms`` windows between each metric's first and
    last point, reported as (metric, gap_start, n_missing).

    Scale note: formulated with lag() over OCCUPIED windows — cost is
    O(windows with data), never O(time range / resolution). The naive
    sequence-explode formulation materializes every slot (a year at 1 s
    resolution is 31M rows per metric before the anti-join) and is
    exactly what this avoids. One keyed shuffle (the window distinct)
    + one metric-partitioned sort for the lag."""
    wts = (F.col("ts_ms") - (F.col("ts_ms") % F.lit(res_ms))).alias("wts")
    w = points.select("metric", wts).groupBy("metric", "wts").agg(F.lit(1))
    prev = F.lag("wts").over(Window.partitionBy("metric").orderBy("wts"))
    return (
        w.select("metric", "wts", prev.alias("prev"))
        .where(F.col("wts") - F.col("prev") > res_ms)
        .select(
            "metric",
            (F.col("prev") + res_ms).alias("gap_start"),
            ((F.col("wts") - F.col("prev")) / res_ms - 1)
            .cast("long")
            .alias("n_missing"),
        )
    )


def range_agg_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    radius_ms: int,
    aggs: dict,
    left_ts: str = "ts_ms",
    right_ts: str = "ts_ms",
) -> DataFrame:
    """Interval (range) aggregate join: for each left row, fold the
    right rows of the same ``key`` whose ``right_ts`` lies within
    ±``radius_ms`` of ``left_ts`` — "clicks near each error", "sensor
    readings around each alert". ``aggs`` maps output names to
    aggregate Columns over the RIGHT side's columns; unmatched left
    rows keep their aggregate identity (count → 0, max → NULL). Output
    = all left columns + one column per agg; |output| = |left| always
    — this operator deliberately does NOT emit matched pairs, whose
    count is unbounded on hot keys.

    Scale shape — the reason this is not ``l JOIN r ON key AND
    abs(Δts) ≤ radius``: Spark plans a raw range predicate on a key
    join as a per-key cross product (every error × every click of
    that user). Binning both sides to ``radius_ms``-wide buckets and
    replicating the LEFT side to its 3 adjacent bins turns it into an
    EQUI-join on (key, bin) — one ordinary hash shuffle, candidates
    bounded by bin co-occupancy, the exact range test applied inside
    the join condition. A right match is in exactly one of the three
    bins, so no pair is seen twice; replication cost is a flat 3×|left|
    before aggregation collapses it back. At 100 TB the bin width IS
    the skew knob: radius-wide bins mean a key must be hot within ±1
    window to matter, and AQE's skew-join split handles the rest."""
    lcols = left.columns
    lpref = [F.col(c).alias(f"__l_{c}") for c in lcols]
    bin0 = f"__l_{left_ts} div {radius_ms}"
    # byte-identical left rows must each produce an output row (the
    # |output| = |left| contract above), and their aggregates are
    # identical by construction — so group them to ONE carrier row
    # BEFORE replication (content-keyed, fully deterministic — a
    # monotonically_increasing_id here would key the contract on
    # partition layout, the round-8 advisor nit) and re-expand by the
    # multiplicity after the aggregation. Duplicates also now pay the
    # join once instead of once per copy.
    l = (  # noqa: E741
        left.select(*lpref)
        .groupBy(*[f"__l_{c}" for c in lcols])
        .agg(F.count(F.lit(1)).alias("__lcnt"))
        .withColumn(
            "__lbin",
            F.explode(
                F.array(
                    F.expr(f"{bin0} - 1"), F.expr(bin0), F.expr(f"{bin0} + 1")
                )
            ),
        )
    )
    r = right.withColumn("__rbin", F.expr(f"{right_ts} div {radius_ms}"))
    cond = (
        (F.col(f"__l_{key}") == F.col(key))
        & (F.col("__lbin") == F.col("__rbin"))
        & (
            F.abs(F.col(right_ts) - F.col(f"__l_{left_ts}"))
            <= F.lit(radius_ms)
        )
    )
    joined = l.join(r, cond, "left")
    out = (
        joined.groupBy("__lcnt", *[F.col(f"__l_{c}") for c in lcols])
        .agg(*[c.alias(n) for n, c in aggs.items()])
        .withColumn("__dup", F.explode(F.expr("sequence(1, __lcnt)")))
        .select(
            *[F.col(f"__l_{c}").alias(c) for c in lcols],
            *[F.col(n) for n in aggs],
        )
    )
    return out
