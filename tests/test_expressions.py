"""Expression-language compiler (expressions/js/JavascriptCompiler.java
analog): the emitted SQL tree must evaluate to the same doubles a direct
Python evaluation of the expression produces — DuckDB is the executable
SQL semantics check (the same dialect-neutral subset runs under Spark in
the expression_score gate row)."""

import math

import duckdb
import pytest

from lucene_spark.search.expressions import ExpressionError, compile_expression


def _eval_sql(sql: str) -> float:
    return duckdb.sql(f"SELECT {sql} AS v").fetchone()[0]


CASES = [
    # (source, bindings as python values, expected lambda)
    ("1 + 2 * 3", {}, lambda b: 7.0),
    ("(1 + 2) * 3", {}, lambda b: 9.0),
    ("10 / 4", {}, lambda b: 2.5),
    ("2 - -3", {}, lambda b: 5.0),
    ("x + ln(1.0 + y)", {"x": 2.0, "y": 3.0}, lambda b: 2.0 + math.log(4.0)),
    ("pow(x, 3.0)", {"x": 2.0}, lambda b: 8.0),
    ("min(x, y) + max(x, y)", {"x": 5.0, "y": 2.0}, lambda b: 7.0),
    ("sqrt(abs(0.0 - x))", {"x": 16.0}, lambda b: 4.0),
    ("x > 2.0 ? 10.0 : 20.0", {"x": 3.0}, lambda b: 10.0),
    ("x > 2.0 ? 10.0 : 20.0", {"x": 1.0}, lambda b: 20.0),
    # nested ternary associates right (cond1 ? a : cond2 ? b : c)
    (
        "x > 2.0 ? 1.0 : x > 1.0 ? 2.0 : 3.0",
        {"x": 1.5},
        lambda b: 2.0,
    ),
    ("x == y", {"x": 2.0, "y": 2.0}, lambda b: 1.0),
    ("x != y", {"x": 2.0, "y": 2.0}, lambda b: 0.0),
    ("(x > 1.0) && (y < 1.0)", {"x": 2.0, "y": 0.5}, lambda b: 1.0),
    ("(x > 1.0) && (y > 1.0)", {"x": 2.0, "y": 0.5}, lambda b: 0.0),
    ("(x > 1.0) || (y > 1.0)", {"x": 0.0, "y": 0.5}, lambda b: 0.0),
    ("!(x > 1.0)", {"x": 0.5}, lambda b: 1.0),
    # comparison yields 1.0/0.0 usable as a number (Lucene convention)
    ("(x > 1.0) * 5.0 + 1.0", {"x": 2.0}, lambda b: 6.0),
    ("2e2 + 1.5e-1", {}, lambda b: 200.15),
    ("atan2(y, x)", {"x": 1.0, "y": 1.0}, lambda b: math.atan2(1.0, 1.0)),
]


@pytest.mark.parametrize("src,binds,expected", CASES)
def test_expression_value(src, binds, expected):
    e = compile_expression(src)
    sql = e.sql({k: repr(v) for k, v in binds.items()})
    assert _eval_sql(sql) == pytest.approx(expected(binds), rel=1e-12)


def test_variables_collected_in_order():
    e = compile_expression("b + a * b - c")
    assert e.variables == ["b", "a", "c"]


def test_precedence_mul_over_add_over_cmp_over_and():
    # 1 + 2*3 > 6 && 2 > 1  →  (7 > 6) && (2 > 1)  →  1.0
    assert _eval_sql(compile_expression("1 + 2 * 3 > 6 && 2 > 1").sql({})) == 1.0


@pytest.mark.parametrize(
    "bad",
    ["a +", "foo(1)", "min(1)", "pow(1, 2, 3)", "(a", "a ? b", "1 @ 2", "? 1 : 2"],
)
def test_syntax_errors(bad):
    with pytest.raises(ExpressionError):
        compile_expression(bad)


def test_unbound_variable():
    e = compile_expression("a + b")
    with pytest.raises(ExpressionError):
        e.sql({"a": "1.0"})


def test_binding_substitution_is_parenthesized():
    # binding text is wrapped so `a * 2` with a = "1 + 1" is (1+1)*2, not 1+1*2
    e = compile_expression("a * 2.0")
    assert _eval_sql(e.sql({"a": "1 + 1"})) == 4.0
