"""Graphite render-target grammar: tokenizer + parser → AST.

The reference's web layer (graphite-web ``evaluateTarget`` /
``grammar.py`` — the layer ABOVE ceres.py ≈L310 ``fetch``; public
knowledge, SURVEY §0 provenance caveat) exposes queries as nested
function-call STRINGS over metric path expressions:

    aliasByNode(sumSeries(web.*.cpu.user),1)
    scale(prod.events.{click,view}, 0.5)
    movingAverage(timeShift(a.b.c, "-1h"), 10)

This module is the pure-Python front half of the r12 front door
(VERDICT r11 "What's missing" #1): it turns a target string into an
AST that ``plans.render`` composes onto the operator layer. No Spark
here — driver-side planning logic like :mod:`plans.glob`.

Grammar (graphite-web grammar.py semantics, transcribed):

    expr    := call | literal | path
    call    := IDENT '(' [arg (',' arg)*] ')'
    arg     := IDENT '=' expr | expr
    literal := NUMBER | STRING | 'true' | 'false' | 'none' | 'inf'
    path    := one or more path characters; '{a,b}' and '[...]'
               groups are consumed as units (commas inside braces do
               NOT separate arguments, matching graphite's reading of
               braces as alternation)

Classification follows graphite: a bare token that parses entirely as
a number IS a number; ``true``/``false`` (case-insensitive) are
booleans; ``none``/``null`` is None; anything else is a metric path
expression. Quoted strings ('…' or "…") are opaque string arguments
(time strings, regexes, alias text); graphite's grammar has no escape
sequences inside quotes and neither does this one.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from ceres_spark.errors import InvalidRequest

# characters that may appear in a bare path/identifier token, outside
# of {...} / [...] groups (graphite's validator plus the glob chars)
_SYMBOL_CHARS = set(
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
    "0123456789._-*?%:#~@+$"
)

_NUMBER_RX = re.compile(r"^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$")
_INT_RX = re.compile(r"^[+-]?\d+$")
_IDENT_RX = re.compile(r"^[A-Za-z_][A-Za-z_0-9]*$")


@dataclass(frozen=True)
class Path:
    """A metric path expression leaf (may contain glob syntax)."""

    pattern: str


@dataclass(frozen=True)
class Call:
    """A function application ``name(args…, kwargs…)``."""

    name: str
    args: tuple
    kwargs: tuple  # of (name, value) pairs, declaration order


@dataclass(frozen=True)
class _Tok:
    kind: str  # 'sym' | 'str' | '(' | ')' | ',' | '='
    text: str
    pos: int


def tokenize(target: str) -> list[_Tok]:
    toks: list[_Tok] = []
    i, n = 0, len(target)
    while i < n:
        c = target[i]
        if c.isspace():
            i += 1
            continue
        if c in "(),=":
            toks.append(_Tok(c, c, i))
            i += 1
            continue
        if c in "'\"":
            j = target.find(c, i + 1)
            if j < 0:
                raise InvalidRequest(
                    f"unterminated string at position {i}: {target!r}"
                )
            toks.append(_Tok("str", target[i + 1 : j], i))
            i = j + 1
            continue
        if c in _SYMBOL_CHARS or c in "{[":
            start = i
            while i < n:
                c = target[i]
                if c == "{" or c == "[":
                    close = "}" if c == "{" else "]"
                    depth, j = 1, i + 1
                    while j < n and depth:
                        if target[j] == c:
                            depth += 1
                        elif target[j] == close:
                            depth -= 1
                        j += 1
                    if depth:
                        raise InvalidRequest(
                            f"unmatched '{c}' at position {i}: {target!r}"
                        )
                    i = j
                elif c in _SYMBOL_CHARS:
                    i += 1
                else:
                    break
            toks.append(_Tok("sym", target[start:i], start))
            continue
        raise InvalidRequest(
            f"unexpected character {c!r} at position {i}: {target!r}"
        )
    return toks


def _classify(text: str):
    """Bare-symbol classification, graphite order: number > bool/none
    > path."""
    if _INT_RX.match(text):
        return int(text)
    if _NUMBER_RX.match(text):
        return float(text)
    low = text.lower()
    if low == "true":
        return True
    if low == "false":
        return False
    if low in ("none", "null"):
        return None
    if low == "inf":
        return float("inf")
    return Path(text)


class _Parser:
    def __init__(self, target: str):
        self.target = target
        self.toks = tokenize(target)
        self.i = 0

    def _peek(self, ahead: int = 0) -> _Tok | None:
        j = self.i + ahead
        return self.toks[j] if j < len(self.toks) else None

    def _next(self) -> _Tok:
        if self.i >= len(self.toks):
            raise InvalidRequest(
                f"unexpected end of target: {self.target!r}"
            )
        t = self.toks[self.i]
        self.i += 1
        return t

    def _expect(self, kind: str) -> _Tok:
        t = self._next()
        if t.kind != kind:
            raise InvalidRequest(
                f"expected {kind!r} at position {t.pos}, got "
                f"{t.text!r}: {self.target!r}"
            )
        return t

    def parse(self):
        e = self.expr()
        if self.i != len(self.toks):
            t = self.toks[self.i]
            raise InvalidRequest(
                f"trailing input at position {t.pos} ({t.text!r}): "
                f"{self.target!r}"
            )
        return e

    def expr(self):
        t = self._next()
        if t.kind == "str":
            return t.text
        if t.kind != "sym":
            raise InvalidRequest(
                f"expected expression at position {t.pos}, got "
                f"{t.text!r}: {self.target!r}"
            )
        nxt = self._peek()
        if nxt is not None and nxt.kind == "(":
            if not _IDENT_RX.match(t.text):
                raise InvalidRequest(
                    f"invalid function name {t.text!r} at position "
                    f"{t.pos}: {self.target!r}"
                )
            return self.call(t.text)
        return _classify(t.text)

    def call(self, name: str) -> Call:
        self._expect("(")
        args: list = []
        kwargs: list = []
        if self._peek() is not None and self._peek().kind == ")":
            self._next()
            return Call(name, (), ())
        while True:
            t, t1 = self._peek(), self._peek(1)
            if (
                t is not None
                and t.kind == "sym"
                and _IDENT_RX.match(t.text)
                and t1 is not None
                and t1.kind == "="
            ):
                self._next()
                self._next()
                kwargs.append((t.text, self.expr()))
            else:
                if kwargs:
                    raise InvalidRequest(
                        f"positional argument after keyword argument "
                        f"in {name}(…): {self.target!r}"
                    )
                args.append(self.expr())
            t = self._next()
            if t.kind == ")":
                return Call(name, tuple(args), tuple(kwargs))
            if t.kind != ",":
                raise InvalidRequest(
                    f"expected ',' or ')' at position {t.pos}, got "
                    f"{t.text!r}: {self.target!r}"
                )


def parse_target(target: str):
    """Parse one render target string → AST (Call | Path | literal).

    >>> parse_target("aliasByNode(sumSeries(web.*.cpu),1)")
    Call(name='aliasByNode', args=(Call(name='sumSeries',
    args=(Path(pattern='web.*.cpu'),), kwargs=()), 1), kwargs=())
    """
    if not isinstance(target, str) or not target.strip():
        raise InvalidRequest("empty render target")
    return _Parser(target).parse()
