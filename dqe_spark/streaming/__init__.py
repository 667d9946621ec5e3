from dqe_spark.streaming.ingest import (  # noqa: F401
    stream_metrics,
    windowed_stream_agg,
)
from dqe_spark.streaming.stateful import stream_derivate  # noqa: F401
