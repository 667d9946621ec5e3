"""Recursive-descent DQL parser producing the typed AST.

Implements the reference grammar (/root/reference/src/dql_parser.yrl):
SELECT statement lists with infix series math, selectors
(get/sget/lookup/events), tag WHERE clauses, GROUP BY ... USING,
SHIFT BY, AS naming with $N/$tag variables, METADATA, ALIAS
definitions, LAST/BETWEEN/AFTER/BEFORE timeframes and TOP/BOTTOM
limits. Constant arithmetic folds at parse time (number productions,
src/dql_parser.yrl:183-193).
"""

from __future__ import annotations

from dqe_spark.dql import ast as A
from dqe_spark.dql.lexer import Tok, tokenize


class ParseError(ValueError):
    pass


class _P:
    def __init__(self, toks: list[Tok]):
        self.toks = toks
        self.i = 0

    # -- token helpers -------------------------------------------------------

    def peek(self, k: int = 0) -> Tok:
        return self.toks[min(self.i + k, len(self.toks) - 1)]

    def at(self, *kinds: str) -> bool:
        return self.peek().kind in kinds

    def eat(self, kind: str) -> Tok:
        t = self.peek()
        if t.kind != kind:
            raise ParseError(f"expected {kind}, got {t.kind} at {t.pos}")
        self.i += 1
        return t

    def opt(self, kind: str) -> Tok | None:
        if self.at(kind):
            return self.eat(kind)
        return None

    def pon(self) -> str:
        """part_or_name."""
        t = self.peek()
        if t.kind in ("part", "name"):
            self.i += 1
            return str(t.value)
        if t.kind == "time":  # bare s/m/h… usable as a name part
            self.i += 1
            return str(t.value)
        raise ParseError(f"expected name, got {t.kind} at {t.pos}")

    # -- entry ---------------------------------------------------------------

    def select(self) -> A.Select:
        self.eat("kw_select")
        stmts = [self.fune()]
        while self.opt(","):
            stmts.append(self.fune())
        aliases: list[A.Alias] = []
        if self.opt("kw_alias"):
            aliases.append(self.alias())
            while self.opt(","):
                aliases.append(self.alias())
        tf = self.timeframe()
        limit = self.limit() if self.at("kw_top", "kw_bottom") else None
        self.eat("eof")
        return A.Select(tuple(stmts), tuple(aliases), tf, limit)

    def alias(self) -> A.Alias:
        sel = self.maybe_shifted()
        self.eat("kw_as")
        return A.Alias(self.pon(), sel)

    def limit(self) -> A.Limit:
        direction = "top" if self.peek().kind == "kw_top" else "bottom"
        self.i += 1
        n = int(self.eat("integer").value)
        self.eat("kw_by")
        fun = self.pon()
        return A.Limit(direction, n, A.FCall(fun, ()))

    # -- statements ----------------------------------------------------------

    def fune(self):
        node = self.events() if self.at("kw_events") else self.math()
        name_parts = None
        metadata: tuple = ()
        if self.opt("kw_as"):
            name_parts = tuple(self.as_clause())
            if self.opt("kw_metadata"):
                metadata = tuple(self.mdata())
        elif self.opt("kw_metadata"):
            metadata = tuple(self.mdata())
        if name_parts is not None or metadata:
            return A.Named(name_parts, metadata, node)
        return node

    def as_clause(self) -> list:
        parts = [self.as_part()]
        while self.opt("."):
            parts.append(self.as_part())
        return parts

    def as_part(self):
        t = self.peek()
        if t.kind == "pvar":
            self.i += 1
            return A.PVar(int(t.value))
        if t.kind == "dvar":
            self.i += 1
            if self.opt(":"):
                return A.DVar(str(t.value), self.pon())
            return A.DVar("", str(t.value))
        return self.pon()

    def mdata(self) -> list:
        self.eat("{")
        out = [self.mdata_element()]
        while self.opt(","):
            out.append(self.mdata_element())
        self.eat("}")
        return out

    def mdata_element(self):
        k = self.pon()
        self.eat(":")
        t = self.peek()
        if t.kind in ("integer", "float"):
            self.i += 1
            return (k, t.value)
        return (k, self.as_part())

    # -- events --------------------------------------------------------------

    def events(self) -> A.EventsFrom:
        self.eat("kw_events")
        self.eat("kw_from")
        bucket = self.pon()
        flt = None
        if self.opt("kw_where"):
            flt = self.event_logic()
        return A.EventsFrom(bucket, flt)

    def event_logic(self):
        left = self.event_condition()
        while self.at("kw_and", "kw_or"):
            op = "and" if self.peek().kind == "kw_and" else "or"
            self.i += 1
            left = (op, left, self.event_condition())
        return left

    def event_condition(self):
        if self.opt("kw_not"):
            return ("not", self.event_condition())
        if self.opt("("):
            inner = self.event_logic()
            self.eat(")")
            return inner
        path = [self.pon()]
        while True:
            if self.opt("."):
                path.append(self.pon())
            elif self.opt("["):
                path.append(int(self.eat("integer").value))
                self.eat("]")
            else:
                break
        t = self.peek()
        if t.kind in ("==", ">=", "=<", ">", "<"):
            self.i += 1
            return (t.kind, tuple(path), self.event_value())
        if t.kind == "!=":
            self.i += 1
            return ("not", ("==", tuple(path), self.event_value()))
        if t.kind == "~=":
            self.i += 1
            return ("~=", tuple(path), self.pon())
        raise ParseError(f"expected comparison, got {t.kind} at {t.pos}")

    def event_value(self):
        t = self.peek()
        if t.kind in ("integer", "float"):
            self.i += 1
            return t.value
        return self.pon()

    # -- math ----------------------------------------------------------------

    def math(self):
        left = self.math2()
        while self.at("+", "-"):
            op = self.peek().kind
            self.i += 1
            right = self.math2()
            if isinstance(left, (int, float)) and isinstance(right, (int, float)):
                left = left + right if op == "+" else left - right
            elif isinstance(right, (int, float)):
                left = A.FCall("add" if op == "+" else "sub", (left, right))
            else:
                left = A.FCall("sum" if op == "+" else "diff", (left, right))
        return left

    def math2(self):
        left = self.atom()
        while self.at("*", "/"):
            op = self.peek().kind
            self.i += 1
            right = self.atom()
            if isinstance(left, (int, float)) and isinstance(right, (int, float)):
                left = left * right if op == "*" else left / right
            elif isinstance(right, (int, float)):
                # reference routes series∘const through mul()/divide()
                left = A.FCall("mul" if op == "*" else "divide", (left, right))
            else:
                left = A.FCall("product" if op == "*" else "quotient", (left, right))
        return left

    def atom(self):
        t = self.peek()
        if t.kind == "(":
            self.i += 1
            inner = self.math()
            self.eat(")")
            return inner
        if t.kind == "float":
            self.i += 1
            return float(t.value)
        if t.kind == "integer":
            self.i += 1
            if self.at("time"):
                unit = self.eat("time").value
                return A.TimeUnit(int(t.value), str(unit))
            return int(t.value)
        if t.kind == "kw_all":
            return self.maybe_shifted()
        # name-led: fcall | selector | var
        if self.peek(1).kind == "(" and t.kind in ("part", "name"):
            return self.fcall()
        return self.maybe_shifted()

    def fcall(self) -> A.FCall:
        name = self.pon()
        self.eat("(")
        args: list = []
        if not self.at(")"):
            args.append(self.math())
            while self.opt(","):
                args.append(self.math())
        self.eat(")")
        return A.FCall(name.lower(), tuple(args))

    # -- selectors -----------------------------------------------------------

    def maybe_shifted(self):
        sel = self.selector()
        if self.opt("kw_shift"):
            self.eat("kw_by")
            t = self.int_or_time()
            return A.Timeshift(t, sel)
        return sel

    def int_or_time(self):
        t = self.eat("integer")
        if self.at("time"):
            return A.TimeUnit(int(t.value), str(self.eat("time").value))
        return int(t.value)

    def selector(self):
        if self.opt("kw_all"):
            return self._from_lookup(None)
        parts: list[str] = []
        is_glob = False
        while True:
            if self.opt("*"):
                parts.append("*")
                is_glob = True
            else:
                parts.append(self.pon())
            if not self.opt("."):
                break
        if self.opt("kw_bucket"):
            bucket = self.pon()
            if is_glob:
                return A.SGet(bucket, tuple(parts))
            return A.Get(bucket, tuple(parts))
        if self.at("kw_from"):
            return self._from_lookup(tuple(parts))
        if len(parts) == 1 and not is_glob:
            node = A.Var(parts[0])
            if self.opt("kw_shift"):
                self.eat("kw_by")
                return A.Timeshift(self.int_or_time(), node)
            return node
        raise ParseError(
            f"selector needs BUCKET or FROM at {self.peek().pos}"
        )

    def _from_lookup(self, parts):
        self.eat("kw_from")
        bucket = self.pon()
        where = None
        if self.opt("kw_where"):
            where = self.where()
        lk = A.Lookup(bucket, parts, where)
        if self.at("kw_group") and self.peek(1).kind == "kw_by":
            self.i += 2
            groupings = [self.grouping_var()]
            while self.opt(","):
                groupings.append(self.grouping_var())
            self.eat("kw_using")
            fun = self.pon()
            sel = A.GroupBy(lk, tuple(groupings), fun.lower())
        else:
            sel = lk
        if self.opt("kw_shift"):
            self.eat("kw_by")
            return A.Timeshift(self.int_or_time(), sel)
        return sel

    def grouping_var(self) -> A.TagRef:
        t = self.peek()
        if t.kind == "dvar":
            self.i += 1
            if self.opt(":"):
                return A.TagRef(str(t.value), self.pon())
            return A.TagRef("", str(t.value))
        # bare name also accepted (reference uses dvar syntax)
        name = self.pon()
        if self.opt(":"):
            return A.TagRef(name, self.pon())
        return A.TagRef("", name)

    def where(self):
        left = self.where_part()
        while self.at("kw_and", "kw_or"):
            op = "and" if self.peek().kind == "kw_and" else "or"
            self.i += 1
            left = (op, left, self.where_part())
        return left

    def where_part(self):
        if self.opt("("):
            inner = self.where()
            self.eat(")")
            return inner
        tag = self.tag()
        if self.opt("="):
            return ("=", tag, self.pon())
        if self.opt("!="):
            return ("!=", tag, self.pon())
        if self.opt("kw_not"):
            return ("!=", tag, self.pon())
        return ("exists", tag)

    def tag(self) -> A.TagRef:
        a = self.pon()
        if self.opt(":"):
            return A.TagRef(a, self.pon())
        return A.TagRef("", a)

    # -- timeframe -----------------------------------------------------------

    def timeframe(self):
        if self.opt("kw_last"):
            return A.Last(self.int_or_time())
        if self.opt("kw_between"):
            a = self.pit()
            self.eat("kw_and")
            return A.Between(a, self.pit())
        if self.opt("kw_after"):
            p = self.pit()
            self.eat("kw_for")
            return A.After(p, self.int_or_time())
        if self.opt("kw_before"):
            p = self.pit()
            self.eat("kw_for")
            return A.Before(p, self.int_or_time())
        t = self.peek()
        raise ParseError(f"expected timeframe, got {t.kind} at {t.pos}")

    def pit(self):
        if self.opt("kw_now"):
            return A.Now()
        if self.at("date"):
            return A.DateLit(str(self.eat("date").value))
        t = self.int_or_time()
        if self.opt("kw_ago"):
            return A.Ago(t)
        if isinstance(t, A.TimeUnit):
            raise ParseError("time unit as point-in-time requires AGO")
        return t


def parse(src: str) -> A.Select:
    return _P(tokenize(src)).select()
