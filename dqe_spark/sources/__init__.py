from dqe_spark.sources.metric_store import (  # noqa: F401
    METRICS_ORACLE_CTE,
    load_events,
    load_metrics,
    load_table,
)
