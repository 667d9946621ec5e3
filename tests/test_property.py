"""Property tests mirroring the reference's EQC suite
(/root/reference/eqc/qry_parser_eqc.erl):

  * prop_query_parse: generated (DQL text, expected AST) pairs parse to
    exactly the expected AST (round-trip through the concrete syntax).
  * prop_prepare: every generated query compiles into a DataFrame plan
    against the sf0.001 store without error.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dqe_spark.dql import ast as A
from dqe_spark.dql.parser import parse

names = st.sampled_from(["cpu", "user", "mem", "net0", "a_b", "x"])
buckets = st.sampled_from(["events", "sys"])
units = st.sampled_from(["ms", "s", "m", "h", "d", "w"])


@st.composite
def time_units(draw):
    n = draw(st.integers(1, 500))
    u = draw(units)
    return f"{n}{u}", A.TimeUnit(n, u)


@st.composite
def getters(draw):
    parts = tuple(draw(st.lists(names, min_size=1, max_size=3)))
    b = draw(buckets)
    txt = ".".join(f"'{p}'" for p in parts) + f" BUCKET '{b}'"
    return txt, A.Get(b, parts)


@st.composite
def aggrs(draw):
    fn = draw(st.sampled_from(["sum", "avg", "min", "max", "variance", "stddev", "median"]))
    gtxt, gast = draw(getters())
    ttxt, tast = draw(time_units())
    return f"{fn}({gtxt}, {ttxt})", A.FCall(fn, (gast, tast))


@st.composite
def chains(draw):
    inner_txt, inner_ast = draw(st.one_of(getters(), aggrs()))
    fn = draw(st.sampled_from(["abs", "sqrt_scale", "log10_scale", "derivate", "confidence"]))
    return f"{fn}({inner_txt})", A.FCall(fn, (inner_ast,))


@st.composite
def combs(draw):
    fn = draw(st.sampled_from(["sum", "avg", "min", "max", "diff", "quotient", "product"]))
    a_txt, a_ast = draw(aggrs())
    b_txt, b_ast = draw(aggrs())
    return f"{fn}({a_txt}, {b_txt})", A.FCall(fn, (a_ast, b_ast))


@st.composite
def timeframes(draw):
    kind = draw(st.sampled_from(["last", "between", "after", "before"]))
    ttxt, tast = draw(time_units())
    if kind == "last":
        return f"LAST {ttxt}", A.Last(tast)
    if kind == "between":
        a = draw(st.integers(0, 2**40))
        b = draw(st.integers(0, 2**40))
        return f"BETWEEN {a} AND {b}", A.Between(a, b)
    p = draw(st.integers(0, 2**40))
    if kind == "after":
        return f"AFTER {p} FOR {ttxt}", A.After(p, tast)
    return f"BEFORE {p} FOR {ttxt}", A.Before(p, tast)


@st.composite
def selects(draw):
    stmts = draw(st.lists(st.one_of(getters(), aggrs(), chains(), combs()),
                          min_size=1, max_size=3))
    tf_txt, tf_ast = draw(timeframes())
    txt = "SELECT " + ", ".join(t for t, _ in stmts) + " " + tf_txt
    expected = A.Select(tuple(a for _, a in stmts), (), tf_ast, None)
    return txt, expected


@given(selects())
@settings(max_examples=200, deadline=None)
def test_parse_roundtrip(case):
    txt, expected = case
    assert parse(txt) == expected


@pytest.mark.usefixtures("spark")
def test_everything_plans(spark):
    """prop_prepare analogue: generated queries all compile (bucket
    'events' only — plans are analyzed against the real store)."""
    from dqe_spark import engine

    @st.composite
    def events_selects(draw):
        fn = draw(st.sampled_from(["sum", "avg", "min", "max", "stddev"]))
        metric = draw(st.sampled_from(["click", "view", "error"]))
        n = draw(st.integers(1, 60))
        u = draw(st.sampled_from(["s", "m", "h"]))
        if u == "s" and n % 1 != 0:
            n = 1
        return (
            f"SELECT {fn}('events'.'{metric}' BUCKET 'events', {n}{u}) "
            "BETWEEN 1704067200000 AND 1704153600000"
        )

    from hypothesis import HealthCheck as HC

    @given(events_selects())
    @settings(max_examples=25, deadline=None,
              suppress_health_check=[HC.function_scoped_fixture])
    def inner(src):
        from dqe_spark.dql.compiler import PlanError

        try:
            (res,) = engine.run(spark, src, "/root/testdata/sf0.001")
            _ = res.df.schema  # forces analysis
        except PlanError as e:
            # only the window/resolution contract may reject
            assert "multiple" in str(e)

    inner()


@given(selects())
@settings(max_examples=200, deadline=None)
def test_unparse_roundtrip(case):
    """The reference's prop_query_parse_unparse
    (eqc/qry_parser_eqc.erl:11-26): unparsing a parsed statement and
    re-parsing yields the same AST."""
    from dqe_spark.dql.compiler import unparse

    txt, expected = case
    ast = parse(txt)
    rebuilt = "SELECT " + ", ".join(unparse(s) for s in ast.stmts)
    # unparse covers statements; re-render the timeframe from the AST
    from dqe_spark.dql import ast as A

    tf = ast.timeframe
    if isinstance(tf, A.Last):
        tf_s = f"LAST {tf.t.n}{tf.t.unit}"
    elif isinstance(tf, A.Between):
        tf_s = f"BETWEEN {tf.a} AND {tf.b}"
    elif isinstance(tf, A.After):
        tf_s = f"AFTER {tf.pit} FOR {tf.dur.n}{tf.dur.unit}"
    else:
        tf_s = f"BEFORE {tf.pit} FOR {tf.dur.n}{tf.dur.unit}"
    assert parse(rebuilt + " " + tf_s) == expected
