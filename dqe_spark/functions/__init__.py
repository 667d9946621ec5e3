from dqe_spark.functions.registry import (  # noqa: F401
    FunctionRegistry,
    default_registry,
)
