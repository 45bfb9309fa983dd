"""Arithmetic mini-grammar -> Spark SQL expression.

The reference `maths` transformer formats column values into an arithmetic
string and evaluates it with a pyparsing grammar supporting ``+ - * / ^``,
functions ``sin cos tan exp abs trunc round sgn`` and constants ``PI``/``E``
(/root/reference/src/ontoweaver/transformer.py:1329-1427). Instead of
evaluating per row in Python, we parse the *operation template* once at
compile time — ``{column}`` placeholders become column references — and emit
one Spark SQL expression string, so the whole computation stays inside
whole-stage codegen.

Deviation (documented): the reference substitutes cell *text* into the
expression before parsing, so a cell containing ``"1+2"`` would be parsed as
arithmetic; we treat every cell as one numeric value (cast to DOUBLE), which
is the intended use in every reference test.
"""

from __future__ import annotations

import math
import re

_FUNCS = {
    "sin": "sin", "cos": "cos", "tan": "tan", "exp": "exp", "abs": "abs",
    "trunc": "cast({} as bigint)", "round": "round", "sgn": "signum",
    "sqrt": "sqrt", "log": "ln",
}
_CONSTS = {"PI": repr(math.pi), "E": repr(math.e)}

_TOKEN_RE = re.compile(
    r"\s*(?:(?P<num>\d+\.\d*|\.\d+|\d+)"
    r"|(?P<col>\{[^{}]+\})"
    r"|(?P<name>[A-Za-z_][A-Za-z_0-9]*)"
    r"|(?P<op>[-+*/^()]))"
)


class MathsError(ValueError):
    pass


def _tokenize(s: str):
    pos, out = 0, []
    while pos < len(s):
        m = _TOKEN_RE.match(s, pos)
        if not m or m.end() == pos:
            if s[pos:].strip() == "":
                break
            raise MathsError(f"cannot tokenize maths operation at {s[pos:]!r}")
        pos = m.end()
        kind = m.lastgroup
        out.append((kind, m.group(kind)))
    return out


class _Parser:
    """Recursive descent: expr := term (±term)*; term := factor (*/factor)*;
    factor := atom (^ factor)?; atom := num | const | {col} | fn(expr) | (expr) | -atom."""

    def __init__(self, tokens, quote_col):
        self.toks = tokens
        self.i = 0
        self.quote_col = quote_col

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def take(self):
        t = self.peek()
        self.i += 1
        return t

    def expect(self, val):
        k, v = self.take()
        if v != val:
            raise MathsError(f"expected {val!r}, got {v!r}")

    def parse(self) -> str:
        out = self.expr()
        if self.i != len(self.toks):
            raise MathsError(f"trailing tokens: {self.toks[self.i:]}")
        return out

    def expr(self) -> str:
        out = self.term()
        while self.peek()[1] in ("+", "-"):
            _, op = self.take()
            out = f"({out} {op} {self.term()})"
        return out

    def term(self) -> str:
        out = self.factor()
        while self.peek()[1] in ("*", "/"):
            _, op = self.take()
            out = f"({out} {op} {self.factor()})"
        return out

    def factor(self) -> str:
        base = self.atom()
        if self.peek()[1] == "^":
            self.take()
            return f"power({base}, {self.factor()})"
        return base

    def atom(self) -> str:
        kind, val = self.take()
        if val == "-":
            return f"(- {self.atom()})"
        if val == "+":
            return self.atom()
        if kind == "num":
            return val
        if kind == "col":
            return self.quote_col(val[1:-1])
        if kind == "name":
            if val in _CONSTS:
                return _CONSTS[val]
            if val in _FUNCS:
                self.expect("(")
                inner = self.expr()
                self.expect(")")
                tpl = _FUNCS[val]
                return tpl.format(inner) if "{}" in tpl else f"{tpl}({inner})"
            raise MathsError(f"unknown identifier {val!r}")
        if val == "(":
            inner = self.expr()
            self.expect(")")
            return f"({inner})"
        raise MathsError(f"unexpected token {val!r}")


def compile_maths(operation: str, quote_col=None) -> str:
    """Compile an operation template to a Spark SQL expression string.

    ``quote_col`` maps a ``{placeholder}`` name to a SQL fragment; default
    casts the column of that name to DOUBLE.
    """
    if not operation:
        raise MathsError("maths `operation` cannot be empty")
    if quote_col is None:
        def quote_col(name):
            esc = name.replace("`", "``")
            return f"cast(`{esc}` as double)"
    return _Parser(_tokenize(operation), quote_col).parse()
