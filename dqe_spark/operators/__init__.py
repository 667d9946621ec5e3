from dqe_spark.operators import (  # noqa: F401
    combinators,
    timeshift,
    topk,
    transforms,
    windows,
)
