"""DQL lexer — regex-driven scanner matching the reference token set
(/root/reference/src/dql_lexer.xrl): case-insensitive keywords, quoted
parts `'...'` with backslash escapes, double-quoted date strings, bare
names, integers/floats, time-unit suffixes, $N / $'tag' variables, and
the operator/punctuation set.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

KEYWORDS = {
    "select", "bucket", "last", "as", "from", "alias", "between", "metadata",
    "like", "now", "ago", "and", "or", "after", "before", "for", "where",
    "shift", "group", "using", "by", "not", "all", "events", "top", "bottom",
}

TIME_UNITS = {"ms", "s", "m", "h", "d", "w"}

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>[\s]+|%[^\n]*)
  | (?P<float>[-+]?\d+\.\d+([eE][-+]?\d+)?)
  | (?P<integer>[-+]?\d+)
  | (?P<part>'(\\.|[^'\\])+')
  | (?P<date>"(\\.|[^"\\])+")
  | (?P<qvar>\$'(\\.|[^'\\])+')
  | (?P<pvar>\$\d+)
  | (?P<dvar>\$[A-Za-z0-9_@-]+)
  | (?P<name>[A-Za-z][A-Za-z0-9_@-]*)
  | (?P<op>!=|~=|==|>=|=<|>|<|[(),.*/=:\[\]{}+-])
    """,
    re.VERBOSE,
)

_UNESCAPE = re.compile(r"\\(.)")


@dataclass(frozen=True)
class Tok:
    kind: str  # kw_*, time, integer, float, part, date, name, pvar, dvar, op
    value: object
    pos: int


class LexError(ValueError):
    pass


def tokenize(src: str) -> list[Tok]:
    out: list[Tok] = []
    i = 0
    while i < len(src):
        m = _TOKEN_RE.match(src, i)
        if not m:
            raise LexError(f"illegal character at {i}: {src[i:i+10]!r}")
        kind = m.lastgroup
        text = m.group()
        if kind == "ws":
            pass
        elif kind == "float":
            out.append(Tok("float", float(text), i))
        elif kind == "integer":
            out.append(Tok("integer", int(text), i))
        elif kind == "part":
            out.append(Tok("part", _UNESCAPE.sub(r"\1", text[1:-1]), i))
        elif kind == "date":
            out.append(Tok("date", _UNESCAPE.sub(r"\1", text[1:-1]), i))
        elif kind == "qvar":
            out.append(Tok("dvar", _UNESCAPE.sub(r"\1", text[2:-1]), i))
        elif kind == "pvar":
            out.append(Tok("pvar", int(text[1:]), i))
        elif kind == "dvar":
            out.append(Tok("dvar", text[1:], i))
        elif kind == "name":
            low = text.lower()
            if low in KEYWORDS:
                out.append(Tok(f"kw_{low}", low, i))
            elif low in TIME_UNITS and out and out[-1].kind == "integer":
                # `1m` lexes as integer+time, like the reference's TIME rule
                out.append(Tok("time", low, i))
            elif low in TIME_UNITS:
                out.append(Tok("time", low, i))
            else:
                out.append(Tok("name", text, i))
        elif kind == "op":
            out.append(Tok(text, text, i))
        i = m.end()
    out.append(Tok("eof", None, len(src)))
    return out
