"""Materialized metric store: ingest idempotency, plan shape
(partition pruning), and row-level equality with the view derivation."""

from __future__ import annotations

from tests.conftest import SF_SMOKE


def test_ingest_and_parity(spark):
    from dqe_spark.sources import store
    from dqe_spark.sources.metric_store import _derive_metrics_view

    p1 = store.ingest(spark, SF_SMOKE)
    p2 = store.ingest(spark, SF_SMOKE)  # idempotent
    assert p1 == p2 and (p1 / "_SUCCESS").exists()

    mat = store.load(spark, SF_SMOKE)
    view = _derive_metrics_view(spark, SF_SMOKE)
    cols = ["bucket", "metric", "host", "dc", "user", "ts_ms", "value", "confidence"]
    a = sorted(map(tuple, mat.select(*cols).collect()))
    b = sorted(map(tuple, view.select(*cols).collect()))
    assert a == b


def test_partition_pruning(spark):
    from pyspark.sql import functions as F

    from dqe_spark.sources import store
    from dqe_spark.sources.metric_store import load_metrics

    store.ingest(spark, SF_SMOKE)
    df = load_metrics(spark, SF_SMOKE).where(F.col("metric") == "events.click")
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PartitionFilters" in plan and "events.click" in plan
