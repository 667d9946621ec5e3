"""User-extensible function registry — the engine's UDF surface.

The reference's ``dqe_fun`` behaviour lets any module registering
``spec/0, init/1, run/2`` join the language with typed-overload
dispatch (/root/reference/src/dqe.erl:121-122, resolver
src/dql_resolver.erl:77-108). The Spark-native equivalent: register a
builder that emits Column expressions (staying JVM-side), keyed by
(name, signature class).

    reg = default_registry()
    reg.register_aggregate("p95", lambda v: F.percentile(F.col(v), F.lit(0.95)))
    reg.register_transform("clip01", lambda v: F.least(F.greatest(v, F.lit(0.0)), F.lit(1.0)))

The DQL compiler consults the registry before its built-in tables, so
registered names are immediately queryable:
``SELECT p95('events'.'click' BUCKET 'events', 5m) LAST 1h``.

Only when built-in expressions genuinely can't express the semantics
should a registration fall back to a pandas_udf GROUPED_AGG — that is
the slow path, and none of the reference surface needs it.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column


class FunctionRegistry:
    def __init__(self):
        # name -> builder(value_col_name) -> Column   (windowed aggregate)
        self.aggregates: dict[str, Callable[[str], Column]] = {}
        # name -> builder(value Column) -> Column      (point-wise transform)
        self.transforms: dict[str, Callable[[Column], Column]] = {}
        # name -> builder(value Column, const) -> Column
        self.arith: dict[str, Callable[[Column, float], Column]] = {}

    def register_aggregate(self, name: str, builder: Callable[[str], Column]) -> None:
        """(metric, time) → metric window aggregate."""
        self.aggregates[name.lower()] = builder

    def register_transform(self, name: str, builder: Callable[[Column], Column]) -> None:
        """(metric) → metric point-wise transform."""
        self.transforms[name.lower()] = builder

    def register_arith(
        self, name: str, builder: Callable[[Column, float], Column]
    ) -> None:
        """(metric, number) → metric scalar arithmetic."""
        self.arith[name.lower()] = builder


_default = FunctionRegistry()


def default_registry() -> FunctionRegistry:
    """The process-global registry — deliberately shared, like the
    reference's ``dqe_fun:reg`` which registers into one global table
    (src/dqe.erl:121-122). Callers needing isolation construct their
    own FunctionRegistry and pass it to Compiler(registry=...)."""
    return _default
