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


def describe(registry: FunctionRegistry | None = None) -> list[dict]:
    """The function catalog — the reference's ``dqe_fun`` behaviour
    exports ``describe/1`` and ``help/0`` per module and dqe surfaces
    them as the queryable function listing; this is the engine-wide
    equivalent: one row per callable name with its class, DQL call
    signature, and the first docstring line of the implementation.

    Covers every built-in table the compiler dispatches on (aggregates,
    threshold/confidence aggregates, percentile, transforms, scalar
    arithmetic, combinators, histogram reductions) plus anything
    user-registered in ``registry`` (defaults to the global one)."""
    from dqe_spark.dql import compiler as C

    reg = registry or default_registry()

    def doc(fn) -> str:
        return (fn.__doc__ or "").strip().splitlines()[0] if fn.__doc__ else ""

    rows: list[dict] = []

    def add(name, klass, sig, fn, builtin=True):
        rows.append(
            {
                "name": name,
                "class": klass,
                "signature": sig,
                "builtin": builtin,
                "help": doc(fn),
            }
        )

    for n, fn in sorted(C.AGGR_PLAIN.items()):
        add(n, "aggregate", f"{n}(metric, time)", fn)
    for n, fn in sorted(C.AGGR_THRESHOLD.items()):
        add(n, "aggregate", f"{n}(metric, threshold, time)", fn)
        add(
            f"{n}_conf", "aggregate", f"{n}_conf(metric, threshold, time)", fn
        )
    add("percentile", "aggregate", "percentile(metric, fraction, time)",
        C.W.agg_percentile)
    add("derivate", "transform", "derivate(metric)", C.T.derivate)
    add("confidence", "transform", "confidence(metric)", C.T.t_confidence)
    for n, fn in sorted(C.TRANS_PLAIN.items()):
        add(n, "transform", f"{n}(metric)", fn)
    for n, fn in sorted(C.ARITH.items()):
        add(n, "arith", f"{n}(metric, number)", fn)
    for n, fn in sorted(C.COMBINE.items()):
        add(n, "combinator", f"{n}(metric, metric, ...)", fn)
    add("histogram", "histogram", "histogram(metric, htv, sig_figs, time)",
        C.hdr_quantize)
    for n, fn in sorted(C.HIST_RED.items()):
        add(n, "histogram-reduction", f"{n}(histogram)", fn)
    add("percentile", "histogram-reduction", "percentile(histogram, fraction)",
        C.W.agg_percentile)

    # engine extensions surfaced in the language (compiler-level, like
    # histogram): anomaly scoring, alert rules, ranked retrieval
    add("zscore", "extension", "zscore(metric, k)", C.Compiler._zscore)
    add("alert_above", "extension", "alert_above(metric, threshold, duration)",
        C.Compiler._alert)
    add("alert_below", "extension", "alert_below(metric, threshold, duration)",
        C.Compiler._alert)
    add("bm25", "extension", "bm25('query terms', k)", C.Compiler._bm25)
    add("trend", "extension", "trend(metric, time)", C.Compiler._trend)
    add("neardup", "extension", "neardup(threshold)", C.Compiler._neardup)
    add("dedup", "extension",
        "dedup('exact'|'semantic'[, threshold]|'substring'[, k])",
        C.Compiler._dedup)
    add("surprisal", "extension", "surprisal()", C.Compiler._surprisal)

    for n, fn in sorted(reg.aggregates.items()):
        add(n, "aggregate", f"{n}(metric, time)", fn, builtin=False)
    for n, fn in sorted(reg.transforms.items()):
        add(n, "transform", f"{n}(metric)", fn, builtin=False)
    for n, fn in sorted(reg.arith.items()):
        add(n, "arith", f"{n}(metric, number)", fn, builtin=False)
    return rows


def help_text(registry: FunctionRegistry | None = None) -> str:
    """Human-readable catalog (the reference's ``help/0`` surface)."""
    rows = describe(registry)
    width = max(len(r["signature"]) for r in rows)
    lines = []
    for r in rows:
        tag = "" if r["builtin"] else "  [registered]"
        lines.append(f"{r['signature']:<{width}}  {r['class']}{tag}"
                     + (f" — {r['help']}" if r["help"] else ""))
    return "\n".join(lines)
