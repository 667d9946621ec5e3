"""Cross-series statistics the reference leaves to clients: windowed
Pearson correlation between two series, share-of-total within a group,
and per-series running totals.

Numeric parity: inputs are fixed-decimal store values, so every
aggregate accumulates v·100 integers in DECIMAL (exact, order-free) and
the single final float expression derives from identical integers on
both engines — results are bit-identical to the DuckDB oracles (the
same discipline as windows.avg4_exact; see PERF.md cross-engine
exactness).

Scale shapes:
  * windowed_pearson — ONE shuffle keyed (window): both series union
    into the same aggregation, the five sufficient statistics
    (n, Σx, Σy, Σx², Σy², Σxy) reduce map-side.
  * share_of_total — two aggregations over the same (group, window)
    exchange; the total re-joins per window (aggregate-sized rows).
  * running_total — one keyed Window pass per series, the derivate
    shape.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_DEC = "decimal(27,0)"


def _vint(col: str, scale: int = 100):
    """Exact integer form of a fixed-decimal column (store points are
    2dp → scale 100; windowed-aggregate outputs are 4dp → scale 10⁴)."""
    return F.round(F.col(col) * scale).cast(_DEC)


def _v100(col: str):
    return _vint(col, 100)


def windowed_pearson(
    points: DataFrame,
    metric_x: str,
    metric_y: str,
    window_ms: int,
    metric: str = "metric",
    ts: str = "ts_ms",
    v: str = "value",
    min_n: int = 2,
    scale: int = 100,
) -> DataFrame:
    """Pearson r between two metrics per window, over their TIME-ALIGNED
    points (inner join on exact timestamp within the window — the same
    positional-alignment rule the §2.5 combinators use). Raw ms points
    rarely align exactly; the intended input is a pair of WINDOWED
    series (e.g. the 1m averages, scale=10_000 for their 4dp values) —
    correlate the downsampled signals, not collision luck.

    r = (n·Σxy − Σx·Σy) / √((n·Σx² − (Σx)²) · (n·Σy² − (Σy)²)) with all
    six sums exact DECIMAL over value·scale integers; NULL when either
    side is constant (zero variance) or fewer than ``min_n`` aligned
    points. Output: (wts, n, r).

    ONE pass over ``points``: the former filter-each-side + inner
    self-join re-derived the whole upstream (scan + windowed
    aggregation) once per series — the sf0.1 plan held two scans and
    two aggregation exchanges of the same store. The join's
    per-timestamp cross-product sums are instead derived from
    per-timestamp sufficient statistics — for a timestamp with x-rows
    X and y-rows Y the join contributes |Y| copies of each x and |X|
    of each y, so Σx += ΣX·|Y|, Σx² += ΣX²·|Y|, Σxy += ΣX·ΣY,
    n += |X|·|Y| (symmetrically for y) — all products of exact
    integers, so the six window sums are the IDENTICAL integers for
    every input, including duplicate-timestamp rows."""
    flt = points.where(
        F.col(metric).isin(metric_x, metric_y)
    ).select(
        F.col(ts).alias("__ts"),
        F.when(F.col(metric) == metric_x, _vint(v, scale)).alias("__x"),
        F.when(F.col(metric) == metric_y, _vint(v, scale)).alias("__y"),
        # ROW indicators, not value counts: the join replicated per
        # row (a null-valued row still multiplies the other side),
        # while the value sums skip nulls — exactly count()'s split
        F.when(F.col(metric) == metric_x, F.lit(1)).alias("__ix"),
        F.when(F.col(metric) == metric_y, F.lit(1)).alias("__iy"),
    )
    per_ts = (
        flt.groupBy("__ts")
        .agg(
            F.count("__ix").alias("__cx"),
            F.sum("__x").alias("__sx"),
            F.sum(F.col("__x") * F.col("__x")).alias("__sxx"),
            F.count("__iy").alias("__cy"),
            F.sum("__y").alias("__sy"),
            F.sum(F.col("__y") * F.col("__y")).alias("__syy"),
        )
        .where((F.col("__cx") > 0) & (F.col("__cy") > 0))
    )
    wts = (F.col("__ts") - (F.col("__ts") % F.lit(window_ms))).alias("wts")
    g = per_ts.select(
        wts, "__cx", "__sx", "__sxx", "__cy", "__sy", "__syy"
    ).groupBy("wts").agg(
        F.sum(F.col("__cx") * F.col("__cy")).alias("n"),
        F.sum(F.col("__sx") * F.col("__cy")).alias("sx"),
        F.sum(F.col("__sy") * F.col("__cx")).alias("sy"),
        F.sum(F.col("__sxx") * F.col("__cy")).alias("sxx"),
        F.sum(F.col("__syy") * F.col("__cx")).alias("syy"),
        F.sum(F.col("__sx") * F.col("__sy")).alias("sxy"),
    )
    n = F.col("n").cast(_DEC)
    numer = (n * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    vx = (n * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    vy = (n * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    r = numer / F.sqrt(vx * vy)
    r4 = F.floor(r * 10000 + F.lit(0.5)).cast("double") / 10000.0
    keep = (F.col("n") >= min_n) & (vx > 0) & (vy > 0)
    return g.select("wts", "n", F.when(keep, r4).alias("r"))


def downsampled_pearson(
    points: DataFrame,
    metric_x: str,
    metric_y: str,
    agg_ms: int,
    window_ms: int,
    metric: str = "metric",
    ts: str = "ts_ms",
    v: str = "value",
    min_n: int = 2,
) -> DataFrame:
    """Fusion of the downsample-then-correlate pipeline —
    ``window_agg(agg_avg)`` per metric followed by ``windowed_pearson``
    over the per-(metric, agg-window) averages — into ONE conditional
    aggregation keyed by the downsample grain alone.

    The composed form pays three exchanges: the (metric, mts) average
    aggregation, the per-ts regroup of windowed_pearson (whose input
    is exactly one row per (metric, mts), so that regroup merely zips
    the ≤2 rows of each minute), and the window-grain aggregation.
    Here one groupBy(mts) computes BOTH series' exact 4dp-average
    integers in the same pass — partial aggregation still reduces
    map-side, so the one exchange carries |minutes| rows — and only
    the aggregate-sized window-grain exchange follows: 1 scan,
    2 exchanges, of which the second is output-sized.

    Bit-identity with the composed form (pinned in tests): the 4dp
    average integer is the identical sign-aware ``(2·Σv4 + n) div
    (2·n)`` of windows.avg4_exact over the same Σround(v·10⁴) sums,
    and ``_vint(avg, 10⁴)`` in the composed path recovers that
    exact integer (i/10⁴ as double round-trips through round(·)).
    A minute enters ``n`` when BOTH metrics have a row there (even a
    null-valued one — count indicators mirror windowed_pearson's
    row-indicator split and the oracle's inner join), while the value
    sums skip nulls, exactly as SUM does. Null timestamps are dropped
    (the join form never matched them). Output: (wts, n, r)."""
    mts = (F.col(ts) - (F.col(ts) % F.lit(agg_ms))).alias("__mts")
    is_x = F.col(metric) == metric_x
    is_y = F.col(metric) == metric_y
    per = (
        points.where(
            F.col(metric).isin(metric_x, metric_y) & F.col(ts).isNotNull()
        )
        .select(
            mts,
            F.when(is_x, _vint(v, 10_000)).alias("__vx"),
            F.when(is_y, _vint(v, 10_000)).alias("__vy"),
            # row indicators: presence of ANY x/y row this minute (the
            # composed path's window_agg emits the minute's row even
            # when every value is null, and pearson's n counts it)
            F.when(is_x, F.lit(1)).alias("__rx"),
            F.when(is_y, F.lit(1)).alias("__ry"),
        )
        .groupBy("__mts")
        .agg(
            F.sum("__vx").alias("__sx4"),
            F.count("__vx").alias("__cx"),
            F.count("__rx").alias("__px"),
            F.sum("__vy").alias("__sy4"),
            F.count("__vy").alias("__cy"),
            F.count("__ry").alias("__py"),
        )
        .where((F.col("__px") > 0) & (F.col("__py") > 0))
    )

    def _avg4int(s4: str, n: str) -> str:
        # avg4_exact's integer division verbatim over Σround(v·10⁴);
        # guarded so an all-null minute yields NULL, not a div-by-zero.
        # `div` yields LONG — cast back to the composed path's
        # DECIMAL(27,0) so the window sums below stay exact decimals
        # (no long overflow) and bit-match _vint's integers.
        return (
            f"CAST(CASE WHEN {n} = 0 THEN NULL "
            f"WHEN {s4} >= 0 THEN (2 * {s4} + {n}) div (2 * {n}) "
            f"ELSE -((2 * -({s4}) + {n}) div (2 * {n})) END AS {_DEC})"
        )

    aligned = per.selectExpr(
        "__mts",
        _avg4int("__sx4", "__cx") + " AS __x",
        _avg4int("__sy4", "__cy") + " AS __y",
    )
    wts = (F.col("__mts") - (F.col("__mts") % F.lit(window_ms))).alias("wts")
    g = aligned.select(wts, "__x", "__y").groupBy("wts").agg(
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


def share_of_total(
    points: DataFrame,
    group_keys: Sequence[str],
    window_ms: int,
    ts: str = "ts_ms",
    v: str = "value",
) -> DataFrame:
    """Each group's share of the per-window total (basis points,
    integer-exact: share_bp = (10⁴·Σv_group) div Σv_window over v100
    integers — no float division at all, so cross-engine parity is
    trivial). A zero window total has no defined shares → NULL
    (hypothesis-caught edge: ANSI div-by-zero).
    Output: (*group_keys, wts, group_sum, share_bp)."""
    wts = (F.col(ts) - (F.col(ts) % F.lit(window_ms))).alias("wts")
    per = (
        points.select(*group_keys, wts, _v100(v).alias("__v"))
        .groupBy(*group_keys, "wts")
        .agg(F.sum("__v").alias("g100"))
    )
    # the window total rides a whole-partition Window over the ALREADY
    # AGGREGATED per-group rows instead of a groupBy + self-join: the
    # join form referenced `per` twice, and Catalyst materializes no
    # common subexpression — the physical plan re-ran the RAW scan and
    # the (group, wts) aggregation once per branch (2 scans,
    # 3 exchanges); this form is one scan, one agg exchange, one
    # wts-keyed window exchange over group-count-sized rows. Same
    # integer sums in any order — bit-identical shares.
    tot = per.withColumn(
        "t100", F.sum("g100").over(Window.partitionBy("wts"))
    )
    return tot.select(
        *group_keys,
        "wts",
        (F.col("g100").cast("double") / 100.0).alias("group_sum"),
        F.expr(
            "CAST(CASE WHEN t100 <> 0 THEN (10000 * g100) div t100 END AS BIGINT)"
        ).alias("share_bp"),
    )


def running_total(
    points: DataFrame,
    keys: Sequence[str] = ("metric",),
    ts: str = "ts_ms",
    v: str = "value",
    reset_ms: int | None = None,
) -> DataFrame:
    """Per-series cumulative sum in time order (ties broken by value —
    the total-order rule counter_rate established); ``reset_ms`` starts
    the accumulation over at each boundary (e.g. daily running totals).
    Exact: the cumulative sum is Σv100 integers, divided once at the
    end. Output: (*keys, ts, value, running)."""
    epoch = (
        [(F.col(ts) - (F.col(ts) % F.lit(reset_ms))).alias("__epoch")]
        if reset_ms
        else []
    )
    base = points.select(*keys, ts, v, _v100(v).alias("__v"), *epoch)
    pcols = [*keys, "__epoch"] if reset_ms else list(keys)
    w = (
        Window.partitionBy(*pcols)
        .orderBy(F.col(ts).asc(), F.col(v).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = (F.sum("__v").over(w).cast("double") / 100.0).alias("running")
    return base.select(*keys, ts, v, run)


def windowed_trend_slope(
    points: DataFrame,
    window_ms: int,
    keys: Sequence[str] = ("metric",),
    ts: str = "ts_ms",
    v: str = "value",
    min_n: int = 3,
    scale: int = 100,
    per_ms: int = 1000,
    conf: str | None = None,
) -> DataFrame:
    """OLS trend slope per (series, window) — "how fast is this metric
    moving right now", the regression complement of derivate's
    point-to-point deltas (robust to jitter because every point in the
    window weighs in).

        slope = (n·Σty − Σt·Σy) / (n·Σt² − (Σt)²)

    with t the integer ms offset within the window and y the
    value·scale integer: all five sufficient statistics are exact
    DECIMAL sums (map-side partials, one keyed exchange — the
    windowed_pearson shape), and the single final division runs on
    doubles both engines derive from identical integers. Reported per
    ``per_ms`` milliseconds (default: units/second) at 4dp via the
    cross-engine floor(x·10⁴+0.5) rule; NULL when fewer than
    ``min_n`` points or zero time-variance (a single distinct ts).
    Output: (keys..., wts, n, slope[, conf]) — ``conf`` names an
    optional confidence column to carry through as its window mean
    (the DQL frontend threads the channel this way)."""
    wts = (F.col(ts) - (F.col(ts) % F.lit(window_ms))).alias("wts")
    t = (F.col(ts) % F.lit(window_ms)).cast(_DEC)
    y = _vint(v, scale)
    extra_cols = [F.col(conf)] if conf else []
    extra_aggs = [F.avg(conf).alias(conf)] if conf else []
    g = (
        points.select(*keys, wts, t.alias("__t"), y.alias("__y"), *extra_cols)
        .groupBy(*keys, "wts")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("__t").alias("st"),
            F.sum("__y").alias("sy"),
            F.sum(F.col("__t") * F.col("__t")).alias("stt"),
            F.sum(F.col("__t") * F.col("__y")).alias("sty"),
            *extra_aggs,
        )
    )
    n = F.col("n").cast(_DEC)
    numer = ((n * F.col("sty") - F.col("st") * F.col("sy"))
             * F.lit(per_ms).cast(_DEC)).cast("double")
    den = ((n * F.col("stt") - F.col("st") * F.col("st"))
           * F.lit(scale).cast(_DEC)).cast("double")
    s4 = F.floor(numer / den * 10000 + F.lit(0.5)).cast("double") / 10000.0
    keep = (F.col("n") >= min_n) & (den > 0)
    out_extra = [F.col(conf)] if conf else []
    return g.select(
        *keys, "wts", "n", F.when(keep, s4).alias("slope"), *out_extra
    )
