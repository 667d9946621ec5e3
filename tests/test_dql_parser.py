"""Parser coverage: every grammar production from the reference
(src/dql_parser.yrl) parses, and plan-time errors surface cleanly.
Mirrors the reference's property-test intent (eqc/qry_parser_eqc.erl):
everything that should parse does, everything parsed plans."""

from __future__ import annotations

import pytest

from dqe_spark.dql import ast as A
from dqe_spark.dql.parser import ParseError, parse

OK = [
    "SELECT avg('cpu'.'user' BUCKET 'sys', 1m) LAST 30m",
    "SELECT 'cpu'.'user' BUCKET 'sys' LAST 30m",
    "SELECT avg(cpu.* BUCKET 'sys', 1m) LAST 30m",
    "SELECT avg('a'.*.'c' BUCKET 'b', 1s) LAST 1h",
    "SELECT 'cpu'.'user' FROM 'sys' WHERE 'host' = 'h1' LAST 10m",
    "SELECT 'cpu'.'user' FROM 'sys' WHERE 'host' = 'h1' AND 'dc' != 'west' LAST 10m",
    "SELECT 'cpu'.'user' FROM 'sys' WHERE 'ddb':'part' = 'p1' OR ('a' = 'b') LAST 10m",
    "SELECT 'cpu'.'user' FROM 'sys' WHERE 'host' LAST 10m",
    "SELECT ALL FROM 'sys' LAST 10m",
    "SELECT 'cpu'.'user' FROM 'sys' GROUP BY $'host' USING avg LAST 10m",
    "SELECT 'm'.'x' BUCKET 'b' SHIFT BY 1h LAST 10m",
    "SELECT sum('a'.'b' BUCKET 'x', 1m) + avg('c'.'d' BUCKET 'x', 1m) LAST 30m",
    "SELECT 'a'.'b' BUCKET 'x' + 5 LAST 30m",
    "SELECT 'a'.'b' BUCKET 'x' - 5 LAST 30m",
    "SELECT mul('a'.'b' BUCKET 'x', 3) LAST 30m",
    "SELECT divide(sum('a'.'b' BUCKET 'x', 1m), 2) LAST 30m",
    "SELECT percentile('a'.'b' BUCKET 'x', 0.9, 5m) LAST 30m",
    "SELECT count_above('a'.'b' BUCKET 'x', 90, 1m) LAST 30m",
    "SELECT count_below_conf('a'.'b' BUCKET 'x', 0.5, 1m) LAST 30m",
    "SELECT percentile(histogram('a'.'b' BUCKET 'x', 1000000, 3, 1m), 0.99) LAST 30m",
    "SELECT mean(histogram('a'.'b' BUCKET 'x', 1000000, 3, 1m)) LAST 30m",
    "SELECT avg('a'.'b' BUCKET 'x', 1m) AS mylabel LAST 30m",
    "SELECT avg('a'.'b' BUCKET 'x', 1m) AS $2.'suffix' LAST 30m",
    "SELECT 'a'.'b' FROM 'x' GROUP BY $'host' USING avg AS $'host' LAST 30m",
    "SELECT avg('a'.'b' BUCKET 'x', 1m) AS lbl METADATA {'k': 'v', 'n': 42} LAST 30m",
    "SELECT avg('a'.'b' BUCKET 'x', 1m) LAST 30m TOP 2 BY avg",
    "SELECT avg('a'.'b' BUCKET 'x', 1m) LAST 30m BOTTOM 1 BY sum",
    "SELECT avg('a'.'b' BUCKET 'x', 1m) BETWEEN 1704067200000 AND 1704070800000",
    "SELECT avg('a'.'b' BUCKET 'x', 1m) BETWEEN \"2024-01-05\" AND \"2024-01-08\"",
    "SELECT avg('a'.'b' BUCKET 'x', 1m) AFTER 1704067200000 FOR 1h",
    "SELECT avg('a'.'b' BUCKET 'x', 1m) BEFORE now FOR 1h",
    "SELECT avg('a'.'b' BUCKET 'x', 1m) BETWEEN 2h AGO AND now",
    "SELECT avg('a'.'b' BUCKET 'x', 1m), sum('c'.'d' BUCKET 'x', 5m) LAST 30m",
    "SELECT q ALIAS 'a'.'b' BUCKET 'x' AS q LAST 30m",
    "SELECT avg(q, 1m) ALIAS 'a'.'b' BUCKET 'x' AS q LAST 30m",
    "SELECT EVENTS FROM 'events' LAST 30m",
    "SELECT EVENTS FROM 'events' WHERE 'event_type' == 'error' LAST 30m",
    "SELECT EVENTS FROM 'events' WHERE 'k' > 50 AND NOT 'value' < 1 LAST 30m",
    "SELECT EVENTS FROM 'events' WHERE 'a'.'b'[0] == 5 OR 'lvl' ~= 'err.*' LAST 30m",
    "SELECT abs('a'.'b' BUCKET 'x') LAST 30m",
    "SELECT derivate('a'.'b' BUCKET 'x') LAST 30m",
    "SELECT confidence('a'.'b' BUCKET 'x') LAST 30m",
    # constant folding in the parser (src/dql_parser.yrl:183-193)
    "SELECT add('a'.'b' BUCKET 'x', 2 + 3 * 4) LAST 30m",
]


@pytest.mark.parametrize("src", OK)
def test_parses(src):
    sel = parse(src)
    assert isinstance(sel, A.Select)
    assert sel.stmts


BAD = [
    "SELECT LAST 30m",
    "SELECT avg('a'.'b' BUCKET 'x', 1m)",  # missing timeframe
    "SELECT 'a'.'b' LAST 30m",  # bare path: no BUCKET/FROM
    "SELECT avg('a'.'b' BUCKET 'x', 1m) LAST",
    "SELECT avg('a'.'b' BUCKET 'x', 1m) LAST 30m TOP x BY avg",
]


@pytest.mark.parametrize("src", BAD)
def test_rejects(src):
    with pytest.raises(ParseError):
        parse(src)


def test_constant_folding():
    sel = parse("SELECT add('a'.'b' BUCKET 'x', 2 + 3 * 4) LAST 30m")
    (stmt,) = sel.stmts
    assert stmt.inputs[1] == 14


def test_infix_desugar():
    sel = parse("SELECT 'a'.'b' BUCKET 'x' / 'c'.'d' BUCKET 'x' LAST 1m")
    (stmt,) = sel.stmts
    assert stmt.name == "quotient"
    sel2 = parse("SELECT 'a'.'b' BUCKET 'x' * 3 LAST 1m")
    assert sel2.stmts[0].name == "mul"


def test_timeframes():
    from dqe_spark.dql.compiler import timeframe_range

    now = 10_000_000
    sel = parse("SELECT 'a'.'b' BUCKET 'x' LAST 30m")
    assert timeframe_range(sel.timeframe, now) == (now - 1_800_000, now)
    sel = parse("SELECT 'a'.'b' BUCKET 'x' BETWEEN 2h AGO AND now")
    assert timeframe_range(sel.timeframe, now) == (now - 7_200_000, now)
    sel = parse('SELECT \'a\'.\'b\' BUCKET \'x\' BETWEEN "2024-01-05" AND "2024-01-08"')
    assert timeframe_range(sel.timeframe, now) == (1704412800000, 1704672000000)


def test_lexer_escapes_reference_parity():
    """The reference's lexer eunit cases verbatim
    (src/dql_lexer.xrl:111-124): backslash escapes inside quoted
    parts."""
    from dqe_spark.dql.lexer import tokenize

    assert tokenize(r"'base'")[0].value == "base"
    assert tokenize(r"'\'quoted\''")[0].value == "'quoted'"
    assert tokenize("'\\\\at_beginning'")[0].value == "\\at_beginning"
    assert tokenize("'at_end\\\\'")[0].value == "at_end\\"
    toks = tokenize("'c:\\\\'.'size'")
    assert [(t.kind, t.value) for t in toks[:3]] == [
        ("part", "c:\\"),
        (".", "."),
        ("part", "size"),
    ]


def test_date_literal_breadth():
    """Date formats toward qdate's accepted set (src/dql_parser.yrl:319):
    ISO with/without time, T separator, Z / offsets, fractional seconds,
    slashed Y/M/D, US M/D/Y, spelled months. Timezone-less == UTC."""
    from dqe_spark.dql.compiler import _date_lit_ms

    jan15 = 1705276800000  # 2024-01-15T00:00:00Z
    assert _date_lit_ms("2024-01-15") == jan15
    assert _date_lit_ms("2024-01-15 06:30:00") == jan15 + (6 * 3600 + 1800) * 1000
    assert _date_lit_ms("2024-01-15T06:30:00") == jan15 + (6 * 3600 + 1800) * 1000
    assert _date_lit_ms("2024-01-15T06:30:00Z") == jan15 + (6 * 3600 + 1800) * 1000
    assert _date_lit_ms("2024-01-15T07:30:00+01:00") == jan15 + (6 * 3600 + 1800) * 1000
    assert _date_lit_ms("2024-01-15 06:30:00.250") == jan15 + (6 * 3600 + 1800) * 1000 + 250
    assert _date_lit_ms("2024-01-15 06:30") == jan15 + (6 * 3600 + 1800) * 1000
    assert _date_lit_ms("2024/01/15") == jan15
    assert _date_lit_ms("2024/01/15 06:30:00") == jan15 + (6 * 3600 + 1800) * 1000
    assert _date_lit_ms("01/15/2024") == jan15
    assert _date_lit_ms("Jan 15, 2024") == jan15
    assert _date_lit_ms("15 January 2024") == jan15

    import pytest

    from dqe_spark.dql.compiler import PlanError

    with pytest.raises(PlanError, match="unparseable date"):
        _date_lit_ms("not-a-date")


def test_date_literal_in_query_roundtrip():
    """BETWEEN with mixed date-literal styles must compute the same
    range as the ISO form."""
    from dqe_spark.dql.compiler import timeframe_range
    from dqe_spark.dql.parser import parse

    def rng(a, b):
        sel = parse(
            f"SELECT avg('e'.'c' BUCKET 'events', 1m) BETWEEN \"{a}\" AND \"{b}\""
        )
        return timeframe_range(sel.timeframe, now_ms=0)

    iso = rng("2024-01-10", "2024-01-15")
    assert rng("2024/01/10", "2024/01/15") == iso
    assert rng("01/10/2024", "Jan 15, 2024") == iso

