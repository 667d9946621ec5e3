"""Typed AST for DQL.

Node shapes mirror the reference's IR-0 maps (op/args maps built in
/root/reference/src/dql_parser.yrl) without copying its encoding —
these are plain dataclasses the planner pattern-matches on.
"""

from __future__ import annotations

from dataclasses import dataclass, field


# -- time ---------------------------------------------------------------------

MS_PER = {"ms": 1, "s": 1000, "m": 60_000, "h": 3_600_000, "d": 86_400_000, "w": 604_800_000}


@dataclass(frozen=True)
class TimeUnit:
    """`<int> <unit>` literal, e.g. 5m (src/dql_lexer.xrl TIME rule)."""

    n: int
    unit: str

    @property
    def ms(self) -> int:
        return self.n * MS_PER[self.unit]


@dataclass(frozen=True)
class Now:
    pass


@dataclass(frozen=True)
class Ago:
    t: TimeUnit | int


@dataclass(frozen=True)
class DateLit:
    """ISO-ish date string literal in double quotes → epoch ms."""

    text: str


# pit (point-in-time) = Now | Ago | int(ms) | DateLit

@dataclass(frozen=True)
class Last:
    t: TimeUnit | int


@dataclass(frozen=True)
class Between:
    a: object
    b: object


@dataclass(frozen=True)
class After:
    pit: object
    dur: TimeUnit | int


@dataclass(frozen=True)
class Before:
    pit: object
    dur: TimeUnit | int


# -- selectors ----------------------------------------------------------------


@dataclass(frozen=True)
class Get:
    """`'a'.'b' BUCKET 'x'` — one concrete series."""

    bucket: str
    parts: tuple[str, ...]


@dataclass(frozen=True)
class SGet:
    """Glob selector `'a'.* BUCKET 'x'` (parts may be '*')."""

    bucket: str
    parts: tuple[str, ...]


@dataclass(frozen=True)
class TagRef:
    ns: str
    key: str


# where: ("=", TagRef, v) | ("!=", TagRef, v) | ("exists", TagRef)
#      | ("and", l, r) | ("or", l, r)


@dataclass(frozen=True)
class Lookup:
    """`metric FROM 'bucket' [WHERE tags]` (+ optional GROUP BY)."""

    bucket: str
    parts: tuple[str, ...] | None  # None = ALL
    where: object | None = None


@dataclass(frozen=True)
class GroupBy:
    lookup: Lookup
    groupings: tuple[TagRef, ...]
    fun: str


@dataclass(frozen=True)
class EventsFrom:
    bucket: str
    filter: object | None  # event-condition tree


@dataclass(frozen=True)
class Timeshift:
    t: TimeUnit | int
    sel: object


@dataclass(frozen=True)
class FCall:
    name: str
    inputs: tuple[object, ...]  # selectors / FCalls / numbers / TimeUnits


@dataclass(frozen=True)
class Var:
    name: str


# -- naming -------------------------------------------------------------------


@dataclass(frozen=True)
class PVar:
    """$N positional metric-part variable (src/dql_naming.erl:45-46)."""

    n: int


@dataclass(frozen=True)
class DVar:
    """$'ns':'key' / $tag dimension variable."""

    ns: str
    key: str


@dataclass(frozen=True)
class Named:
    """AS clause + METADATA attached to one statement."""

    parts: tuple[object, ...] | None  # str | PVar | DVar
    metadata: tuple[tuple[str, object], ...]
    child: object


@dataclass(frozen=True)
class Alias:
    name: str
    sel: object


@dataclass(frozen=True)
class Limit:
    direction: str  # "top" | "bottom"
    n: int
    fun: FCall


@dataclass(frozen=True)
class Select:
    stmts: tuple[object, ...]
    aliases: tuple[Alias, ...] = field(default=())
    timeframe: object = None
    limit: Limit | None = None
