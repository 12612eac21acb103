"""Lucene expressions module analog — compile the expression language to SQL.

Reference: ``lucene/expressions/src/java/org/apache/lucene/expressions/
Expression.java`` and ``js/JavascriptCompiler.java`` — Lucene compiles a
JavaScript-like arithmetic expression (``_score + ln(1 + popularity)``) to
bytecode producing a ``DoubleValuesSource``; ``Bindings`` map the free
variables to the relevance score or doc-values fields, and the compiled
expression drives ``FunctionScoreQuery`` scoring or a ``SortField``.

Spark-first translation: there is no bytecode to generate — Catalyst IS the
expression compiler. We parse the same surface syntax into an AST and emit
ONE deterministic ANSI-SQL arithmetic string usable verbatim by BOTH Spark
(``F.expr`` → whole-stage codegen, JVM-side) and DuckDB (the correctness
oracle). Bindings substitute per-engine column expressions for the free
variables; everything AROUND the bindings is byte-identical text, so the
two engines evaluate the identical double tree — the same float discipline
the gate rows rely on everywhere else.

Supported (the JavascriptCompiler core, minus bitwise ops — rarely used in
scoring and not double-safe across dialects):
  literals        decimal ints / floats / scientific notation
  variables       identifiers ([A-Za-z_][A-Za-z0-9_]*), resolved via bindings
  arithmetic      ``+ - * / %``  (unary ``-`` too; ``%`` is integer-style
                  modulo — use integer-valued operands for cross-dialect
                  determinism)
  comparison      ``< <= > >= == !=``  → 1.0 / 0.0 (Lucene's convention)
  logical         ``&& || !``  (operands: non-zero = true) → 1.0 / 0.0
  conditional     ``cond ? a : b``  (cond non-zero → a)
  functions       abs, ceil, floor, exp, ln, log10, sqrt, pow(x,y),
                  min(x,y), max(x,y), sin, cos, tan, asin, acos, atan,
                  atan2(y,x)
"""

from __future__ import annotations

import re
from dataclasses import dataclass

__all__ = ["compile_expression", "CompiledExpression", "ExpressionError"]


class ExpressionError(ValueError):
    """Raised on a syntax error or an unbound/unknown name."""


# ---------------------------------------------------------------------------
# lexer
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"\s*(?:"
    r"(?P<num>(?:\d+\.\d*|\.\d+|\d+)(?:[eE][+-]?\d+)?)"
    r"|(?P<name>[A-Za-z_][A-Za-z0-9_]*)"
    r"|(?P<op><=|>=|==|!=|&&|\|\||[-+*/%()<>,?:!])"
    r")"
)


def _lex(src: str) -> list[tuple[str, str]]:
    toks: list[tuple[str, str]] = []
    pos = 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if m is None or m.end() == pos:
            rest = src[pos:].lstrip()
            if not rest:
                break
            raise ExpressionError(f"unexpected character at: {rest[:20]!r}")
        pos = m.end()
        for kind in ("num", "name", "op"):
            v = m.group(kind)
            if v is not None:
                toks.append((kind, v))
                break
    toks.append(("end", ""))
    return toks


# ---------------------------------------------------------------------------
# AST — each node emits SQL text; bindings are substituted at emit time
# ---------------------------------------------------------------------------


@dataclass
class _Num:
    text: str

    def sql(self, b: dict) -> str:
        # normalize so "1" and "1.0" both emit a double literal — Lucene
        # expressions are double-typed throughout (Expression.java:56)
        t = self.text
        if "." not in t and "e" not in t and "E" not in t:
            t += ".0"
        return t


@dataclass
class _Var:
    name: str

    def sql(self, b: dict) -> str:
        if self.name not in b:
            raise ExpressionError(f"unbound variable: {self.name}")
        return f"({b[self.name]})"


@dataclass
class _Un:
    op: str
    x: object

    def sql(self, b: dict) -> str:
        if self.op == "-":
            return f"(- {self.x.sql(b)})"
        # ! — logical not, 1.0/0.0
        return f"(CASE WHEN {self.x.sql(b)} <> 0 THEN 0.0 ELSE 1.0 END)"


@dataclass
class _Bin:
    op: str
    l: object
    r: object

    def sql(self, b: dict) -> str:
        ls, rs = self.l.sql(b), self.r.sql(b)
        if self.op in ("+", "-", "*", "/", "%"):
            return f"({ls} {self.op} {rs})"
        if self.op in ("<", "<=", ">", ">=", "=", "<>"):
            return f"(CASE WHEN {ls} {self.op} {rs} THEN 1.0 ELSE 0.0 END)"
        if self.op == "&&":
            return f"(CASE WHEN {ls} <> 0 AND {rs} <> 0 THEN 1.0 ELSE 0.0 END)"
        # ||
        return f"(CASE WHEN {ls} <> 0 OR {rs} <> 0 THEN 1.0 ELSE 0.0 END)"


@dataclass
class _Cond:
    c: object
    t: object
    f: object

    def sql(self, b: dict) -> str:
        return (
            f"(CASE WHEN {self.c.sql(b)} <> 0 "
            f"THEN {self.t.sql(b)} ELSE {self.f.sql(b)} END)"
        )


# name -> (sql function name, arity); every target exists with identical
# double semantics in Spark SQL and DuckDB
_FUNCS = {
    "abs": ("abs", 1),
    "ceil": ("ceil", 1),
    "floor": ("floor", 1),
    "exp": ("exp", 1),
    "ln": ("ln", 1),
    "log10": ("log10", 1),
    "sqrt": ("sqrt", 1),
    "sin": ("sin", 1),
    "cos": ("cos", 1),
    "tan": ("tan", 1),
    "asin": ("asin", 1),
    "acos": ("acos", 1),
    "atan": ("atan", 1),
    "pow": ("power", 2),
    "min": ("least", 2),
    "max": ("greatest", 2),
    "atan2": ("atan2", 2),
}


@dataclass
class _Call:
    fn: str
    args: list

    def sql(self, b: dict) -> str:
        name, _ = _FUNCS[self.fn]
        return f"{name}({', '.join(a.sql(b) for a in self.args)})"


# ---------------------------------------------------------------------------
# parser — recursive descent, JavascriptCompiler.jj precedence:
#   ternary < || < && < equality < relational < additive < multiplicative
#   < unary < primary
# ---------------------------------------------------------------------------


class _Parser:
    def __init__(self, toks: list[tuple[str, str]]):
        self.toks = toks
        self.i = 0

    def peek(self) -> tuple[str, str]:
        return self.toks[self.i]

    def take(self) -> tuple[str, str]:
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, val: str) -> None:
        k, v = self.take()
        if v != val:
            raise ExpressionError(f"expected {val!r}, found {v or 'end'!r}")

    def parse(self):
        e = self.ternary()
        if self.peek()[0] != "end":
            raise ExpressionError(f"trailing input at {self.peek()[1]!r}")
        return e

    def ternary(self):
        c = self.or_()
        if self.peek()[1] == "?":
            self.take()
            t = self.ternary()
            self.expect(":")
            f = self.ternary()
            return _Cond(c, t, f)
        return c

    def or_(self):
        e = self.and_()
        while self.peek()[1] == "||":
            self.take()
            e = _Bin("||", e, self.and_())
        return e

    def and_(self):
        e = self.equality()
        while self.peek()[1] == "&&":
            self.take()
            e = _Bin("&&", e, self.equality())
        return e

    def equality(self):
        e = self.relational()
        while self.peek()[1] in ("==", "!="):
            op = self.take()[1]
            e = _Bin("=" if op == "==" else "<>", e, self.relational())
        return e

    def relational(self):
        e = self.additive()
        while self.peek()[1] in ("<", "<=", ">", ">="):
            op = self.take()[1]
            e = _Bin(op, e, self.additive())
        return e

    def additive(self):
        e = self.multiplicative()
        while self.peek()[1] in ("+", "-"):
            op = self.take()[1]
            e = _Bin(op, e, self.multiplicative())
        return e

    def multiplicative(self):
        e = self.unary()
        while self.peek()[1] in ("*", "/", "%"):
            op = self.take()[1]
            e = _Bin(op, e, self.unary())
        return e

    def unary(self):
        if self.peek()[1] == "-":
            self.take()
            return _Un("-", self.unary())
        if self.peek()[1] == "!":
            self.take()
            return _Un("!", self.unary())
        return self.primary()

    def primary(self):
        kind, v = self.take()
        if kind == "num":
            return _Num(v)
        if kind == "name":
            if self.peek()[1] == "(":
                if v not in _FUNCS:
                    raise ExpressionError(f"unknown function: {v}")
                self.take()
                args = [self.ternary()]
                while self.peek()[1] == ",":
                    self.take()
                    args.append(self.ternary())
                self.expect(")")
                if len(args) != _FUNCS[v][1]:
                    raise ExpressionError(
                        f"{v} takes {_FUNCS[v][1]} args, got {len(args)}"
                    )
                return _Call(v, args)
            return _Var(v)
        if v == "(":
            e = self.ternary()
            self.expect(")")
            return e
        raise ExpressionError(f"unexpected token: {v or 'end'!r}")


class CompiledExpression:
    """A parsed expression; ``sql(bindings)`` emits the dialect-neutral SQL.

    ``variables`` lists the free variables (the Bindings contract:
    Expression.java requires every variable resolved before evaluation).
    """

    def __init__(self, source: str):
        self.source = source
        self._ast = _Parser(_lex(source)).parse()
        self.variables = self._collect(self._ast)

    @staticmethod
    def _collect(node) -> list[str]:
        out: list[str] = []

        def walk(n):
            if isinstance(n, _Var):
                if n.name not in out:
                    out.append(n.name)
            elif isinstance(n, _Un):
                walk(n.x)
            elif isinstance(n, _Bin):
                walk(n.l)
                walk(n.r)
            elif isinstance(n, _Cond):
                walk(n.c)
                walk(n.t)
                walk(n.f)
            elif isinstance(n, _Call):
                for a in n.args:
                    walk(a)

        walk(node)
        return out

    def sql(self, bindings: dict[str, str]) -> str:
        """Emit the SQL arithmetic tree with each variable replaced by its
        binding (a column name or sub-expression — per-engine text). The
        surrounding tree is identical text whatever the bindings, so Spark
        and DuckDB evaluate the same shaped double expression."""
        missing = [v for v in self.variables if v not in bindings]
        if missing:
            raise ExpressionError(f"unbound variables: {missing}")
        return self._ast.sql(bindings)


def compile_expression(source: str) -> CompiledExpression:
    """JavascriptCompiler.compile analog: parse ``source`` once, bind and
    emit per engine as needed."""
    return CompiledExpression(source)
