from dqe_spark.plans.debug import explain_artifact, with_observation  # noqa: F401
