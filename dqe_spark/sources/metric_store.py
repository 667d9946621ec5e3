"""Sources: the F1 metric-point store and the F2 event store.

The reference reads packed binary series from DalmatinerDB over TCP
(``/root/reference/src/dqe_get.erl:14-96``) and discovers series via an
index (``/root/reference/src/dql_expand.erl:57-93``). Our storage
equivalent is columnar Parquet with one row per point:

    (bucket, metric, metric_parts, tags, ts_ms, value, confidence)

Per FIXTURES.md §F4 the driver's synthetic ``events.parquet`` is mapped
into this shape (there is no standalone metrics.parquet):

  - bucket        = 'events'            (resolution 1000 ms)
  - metric        = 'events.' || event_type
  - tags          = {host: 'h'||user_id%3, dc: east/west by user_id%2,
                     user: 'u'||user_id%5}
  - ts_ms         = epoch_micros(ts) div 1000   (integer ms, exact)
  - value         = value
  - confidence    = (event_id % 11) / 10.0      (0.0 .. 1.0)

``METRICS_ORACLE_CTE`` is the *identical* derivation in DuckDB SQL; every
oracle query is prefixed with it so the Spark plan and the oracle read
the same logical table. Keep the two in lockstep when editing.

Scale note: at 100 TB the store would be written partitioned by
(bucket, date(ts)) with metrics sorted within files, so bucket/time
predicates become partition pruning and metric predicates become
row-group min/max skipping. The readers below express plain column
predicates, which Catalyst pushes into the Parquet scan either way
(verified via .explain PushedFilters in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: ms per point for each bucket — replaces the reference's
#: ``ddb_connection:resolution`` RPC (src/dql_resolution.erl:206-208).
BUCKET_RESOLUTION_MS = {"events": 1000}

DEFAULT_BUCKET = "events"

#: DuckDB CTE mirroring load_metrics() exactly (oracle side).
METRICS_ORACLE_CTE = """
WITH metrics AS (
    SELECT
        'events' AS bucket,
        'events.' || event_type AS metric,
        'h' || CAST(user_id % 3 AS VARCHAR) AS host,
        CASE WHEN user_id % 2 = 0 THEN 'east' ELSE 'west' END AS dc,
        'u' || CAST(user_id % 5 AS VARCHAR) AS "user",
        epoch_ns(ts) // 1000000 AS ts_ms,
        value AS value,
        (event_id % 11) / 10.0 AS confidence
    FROM events
)
"""


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver-generated parquet table."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def ts_ms_col(df: DataFrame, col: str = "ts"):
    """Epoch-milliseconds expression for ``df[col]``, whatever the
    parquet encoding of the timestamp is.

    The driver's testdata has flipped between ``int64`` nanoseconds
    (read as BIGINT under ``spark.sql.legacy.parquet.nanosAsLong``) and
    ``timestamp[us]`` (read as TIMESTAMP_NTZ) across generations, so
    the derivation must adapt to the schema it actually sees:

      - timestamp / timestamp_ntz -> unix_micros(cast ts as timestamp)
        div 1000   (exact integer ms; no float round-trip)
      - bigint (nanos)            -> ts div 1000000

    The DuckDB oracle side (``epoch_ns(ts) // 1000000`` in
    METRICS_ORACLE_CTE) is polymorphic over both encodings already.
    """
    dtype = dict(df.dtypes).get(col, "")
    if dtype.startswith("timestamp"):
        return F.expr(
            f"CAST(unix_micros(CAST({col} AS TIMESTAMP)) div 1000 AS long)"
        )
    return F.expr(f"CAST({col} div 1000000 AS long)")


def load_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The metric-point store.

    Prefers the MATERIALIZED store (partition-pruned scans on
    bucket/metric, sorted ts_ms → row-group skipping; see
    sources/store.py) when it has been built; otherwise derives the
    store as a view over events.parquet per FIXTURES.md §F4. Both paths
    yield identical rows — only the physical plan differs.
    """
    from dqe_spark.sources import store

    for layout in ("metric", "date"):
        mat = store.load(spark, sf_dir, layout=layout)
        if mat is not None:
            return mat
    try:
        # bucketed layout: zero-shuffle window aggs (see store.py);
        # ranked below the partitioned layouts, whose directory-level
        # pruning serves single-series scans better
        b = store.load_bucketed(spark, sf_dir)
        if b is not None:
            return b
    except Exception:
        pass  # catalog-less or DDL-restricted session → view fallback
    return _derive_metrics_view(spark, sf_dir)


def _derive_metrics_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet mapped per FIXTURES.md §F4 (view form).

    Columns: bucket, metric, metric_parts, tags(map), host, dc, user,
    ts_ms(long), value(double), confidence(double).

    host/dc/user are kept both as plain columns (Catalyst-friendly:
    pushdown + pruning work on them) and inside the ``tags`` map (the
    reference's data model, src/dql_parser.yrl:279-290).
    """
    ev = load_table(spark, sf_dir, "events")
    host = F.concat(F.lit("h"), (F.col("user_id") % 3).cast("string"))
    dc = F.when(F.col("user_id") % 2 == 0, F.lit("east")).otherwise(F.lit("west"))
    user = F.concat(F.lit("u"), (F.col("user_id") % 5).cast("string"))
    metric = F.concat(F.lit("events."), F.col("event_type"))
    return ev.select(
        F.lit("events").alias("bucket"),
        metric.alias("metric"),
        F.split(metric, r"\.").alias("metric_parts"),
        F.create_map(
            F.lit("host"), host, F.lit("dc"), dc, F.lit("user"), user
        ).alias("tags"),
        host.alias("host"),
        dc.alias("dc"),
        user.alias("user"),
        ts_ms_col(ev).alias("ts_ms"),
        F.col("value").cast("double").alias("value"),
        ((F.col("event_id") % 11) / F.lit(10.0)).alias("confidence"),
    )


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The F2 event store: (bucket, ts_ms, payload JSON) + typed cols.

    Prefers the MATERIALIZED date-partitioned event store (time ranges
    become dt partition pruning; see store.ingest_events) when built,
    else derives the view below. Identical rows either way — the
    materialized path adds a ``dt`` column the compiler uses for
    pruning.

    Mirrors the reference's event reply shape (src/dqe_events.erl:14-44);
    ``props`` is the semi-structured payload the path predicates
    (src/dql_parser.yrl:89-113) run against.
    """
    from dqe_spark.sources import store

    mat = store.load_events_store(spark, sf_dir)
    if mat is not None:
        return mat
    return _derive_events_view(spark, sf_dir)


def _derive_events_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.lit("events").alias("bucket"),
        ts_ms_col(ev).alias("ts_ms"),
        F.col("event_id"),
        F.col("event_type"),
        F.col("user_id"),
        F.col("value").cast("double").alias("value"),
        F.col("props").alias("payload"),
    )


def resolution_ms(bucket: str) -> int:
    """Bucket → resolution lookup (plan-time, cached — trivially a dict
    here; a Delta metadata table on a real deployment)."""
    return BUCKET_RESOLUTION_MS.get(bucket, 1000)
