"""Plan debugging — the engine's analogue of the reference's slow-query
debug (dot-graph flow dumps + pass-through point logging,
/root/reference/src/dqe.erl:282-322 and src/dqe_debug.erl:9-40).

Spark already has the physical-plan story; what we add is (a) a
one-call formatted-explain artifact writer for post-mortems and (b) a
zero-cost observation hook (df.observe) that counts rows/null values
flowing through a stage without an extra action.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.observation import Observation


def explain_string(df: DataFrame, mode: str = "formatted") -> str:
    spark = df.sparkSession
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def explain_artifact(df: DataFrame, out_path: str, mode: str = "formatted") -> Path:
    """Write the plan to a file (the dot-file debug folder equivalent)."""
    p = Path(out_path)
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text(explain_string(df, mode))
    return p


def with_observation(df: DataFrame, name: str = "dqe_debug"):
    """Attach a row/null counter observation; returns (df, observation).
    Metrics materialize after the next action on df — no extra job."""
    obs = Observation(name)
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.when(F.col("value").isNull(), 1).otherwise(0)).alias("null_values"),
    )
    return observed, obs
