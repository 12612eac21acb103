"""SimpleQueryParser — the lenient, never-throwing end-user query dialect.

Behavioral reference: queryparser/src/java/org/apache/lucene/queryparser/
simple/SimpleQueryParser.java (the full state machine): ``+`` AND, ``|``
OR, ``-`` NOT prefix (double negation cancels), ``"..."`` phrase with
optional ``~N`` slop (NEAR), trailing ``*`` prefix query, ``~N`` term
fuzziness (bare ``~`` = 2, capped at LevenshteinAutomata's max 2,
negative/unparsable → 0 → plain term), ``( )`` precedence, ``\\`` escape,
whitespace as the default-operator separator, and ALL the leniency rules:
an unmatched ``(`` or ``"`` is extraneous and re-parsed as characters, an
empty group/phrase resets the pending operator, a stray ``)`` is skipped,
operators before any term are ignored, a lone ``*`` is MatchAllDocs and
empty input MatchNoDocs. Operator precedence is encoded by the
operation-change wrap (buildQueryTree): a change of operation pushes the
current tree one level down, exactly like the reference.

A negated branch becomes ``(MatchAll SHOULD, branch MUST_NOT)`` — the
reference's wrapper shape — which the engine's rewrite pass normalizes.

Single default-field form (the ``weights`` map's one-field case with
boost 1); the analyzer is the same ``analyzer(text) -> list[Token]``
callable the classic parser takes, applied per token exactly like
QueryBuilder.createBooleanQuery / createPhraseQuery.
"""

from __future__ import annotations

from .query import (
    BooleanQuery,
    FuzzyQuery,
    MatchAllDocsQuery,
    MatchNoDocsQuery,
    PhraseQuery,
    PrefixQuery,
    TermQuery,
    rewrite,
)

__all__ = ["simple_parse"]

_WS = {" ", "\t", "\n", "\r"}
_MAX_FUZZ = 2  # LevenshteinAutomata.MAXIMUM_SUPPORTED_DISTANCE


class _State:
    __slots__ = ("data", "index", "length", "top", "cur_op", "prev_op", "neg")

    def __init__(self, data: str, start: int, length: int):
        self.data = data
        self.index = start
        self.length = length
        self.top = None
        self.cur_op: str | None = None   # "must" | "should" | None
        self.prev_op: str | None = None
        self.neg = 0


def simple_parse(s: str, analyzer, default_operator: str = "should"):
    """Parse ``s`` into the engine AST; never raises on user input."""
    if s.strip() == "*":
        return MatchAllDocsQuery()
    st = _State(s, 0, len(s))
    _parse_sub(st, analyzer, default_operator)
    if st.top is None:
        return MatchNoDocsQuery()
    return rewrite(st.top)


def _parse_sub(st: _State, analyzer, default_op: str) -> None:
    while st.index < st.length:
        c = st.data[st.index]
        if c == "(":
            _consume_subquery(st, analyzer, default_op)
        elif c == ")":
            st.index += 1  # extraneous
        elif c == '"':
            _consume_phrase(st, analyzer, default_op)
        elif c == "+":
            if st.cur_op is None and st.top is not None:
                st.cur_op = "must"
            st.index += 1
        elif c == "|":
            if st.cur_op is None and st.top is not None:
                st.cur_op = "should"
            st.index += 1
        elif c == "-":
            st.neg += 1
            st.index += 1
            continue  # keep the negation pending across the reset below
        elif c in _WS:
            st.index += 1
        else:
            _consume_token(st, analyzer, default_op)
        st.neg = 0


def _consume_subquery(st: _State, analyzer, default_op: str) -> None:
    start = st.index = st.index + 1
    precedence = 1
    escaped = False
    while st.index < st.length:
        if not escaped:
            c = st.data[st.index]
            if c == "\\":
                escaped = True
                st.index += 1
                continue
            if c == "(":
                precedence += 1
            elif c == ")":
                precedence -= 1
                if precedence == 0:
                    break
        escaped = False
        st.index += 1
    if st.index == st.length:
        # no closing paren: the opening one is extraneous
        st.index = start
    elif st.index == start:
        # "()" — resets the pending operator
        st.cur_op = None
        st.index += 1
    else:
        sub = _State(st.data, start, st.index)
        _parse_sub(sub, analyzer, default_op)
        _build_tree(st, sub.top, default_op)
        st.index += 1


def _consume_phrase(st: _State, analyzer, default_op: str) -> None:
    start = st.index = st.index + 1
    buf: list[str] = []
    escaped = False
    has_slop = False
    while st.index < st.length:
        if not escaped:
            c = st.data[st.index]
            if c == "\\":
                escaped = True
                st.index += 1
                continue
            if c == '"':
                if st.index + 1 < st.length and st.data[st.index + 1] == "~":
                    st.index += 1
                    if st.index + 1 < st.length:
                        has_slop = True
                    break
                break
        escaped = False
        buf.append(st.data[st.index])
        st.index += 1
    if st.index == st.length:
        st.index = start  # unmatched quote: extraneous
    elif st.index == start:
        st.cur_op = None  # empty phrase resets the operator
        st.index += 1
    else:
        slop = _parse_fuzziness(st) if has_slop else 0
        branch = _new_phrase(analyzer, "".join(buf), slop, default_op)
        _build_tree(st, branch, default_op)
        st.index += 1


def _consume_token(st: _State, analyzer, default_op: str) -> None:
    buf: list[str] = []
    escaped = False
    prefix = False
    fuzzy = False
    while st.index < st.length:
        c = st.data[st.index]
        if not escaped:
            if c == "\\":
                escaped = True
                prefix = False
                st.index += 1
                continue
            if _token_finished(c):
                break
            if buf and c == "~":
                fuzzy = True
                break
            prefix = bool(buf) and c == "*"
        escaped = False
        buf.append(c)
        st.index += 1
    if not buf:
        return
    if fuzzy:
        token = "".join(buf)
        edits = min(_parse_fuzziness(st), _MAX_FUZZ)
        if edits == 0:
            branch = _new_default(analyzer, token, default_op)
        else:
            branch = FuzzyQuery(term=token.lower(), max_edits=edits)
    elif prefix:
        branch = PrefixQuery(prefix="".join(buf[:-1]).lower())
    else:
        branch = _new_default(analyzer, "".join(buf), default_op)
    _build_tree(st, branch, default_op)


def _token_finished(c: str) -> bool:
    return c in ('"', "|", "+", "(", ")") or c in _WS


def _parse_fuzziness(st: _State) -> int:
    if st.index >= st.length or st.data[st.index] != "~":
        return 0
    digits: list[str] = []
    while st.index < st.length:
        st.index += 1
        if st.index < st.length:
            if _token_finished(st.data[st.index]):
                break
            digits.append(st.data[st.index])
    text = "".join(digits)
    if not text:
        return 2  # bare ~ means automatic fuzziness
    try:
        f = int(text)
    except ValueError:
        return 0
    return max(f, 0)


def _new_default(analyzer, text: str, default_op: str):
    """QueryBuilder.createBooleanQuery: analyze; 0 tokens → None, 1 →
    TermQuery, n → BooleanQuery of terms under the default operator."""
    terms = [t.term for t in analyzer(text)]
    if not terms:
        return None
    if len(terms) == 1:
        return TermQuery(terms[0])
    qs = tuple(TermQuery(t) for t in terms)
    if default_op == "must":
        return BooleanQuery(must=qs)
    return BooleanQuery(should=qs)


def _new_phrase(analyzer, text: str, slop: int, default_op: str):
    """QueryBuilder.createPhraseQuery: 0 tokens → None, 1 → TermQuery,
    n → PhraseQuery with the given slop."""
    terms = [t.term for t in analyzer(text)]
    if not terms:
        return None
    if len(terms) == 1:
        return TermQuery(terms[0])
    return PhraseQuery(terms=tuple(terms), slop=int(slop))


def _add_clause(bq: BooleanQuery, branch, occur: str) -> BooleanQuery:
    if occur == "must":
        return BooleanQuery(
            must=bq.must + (branch,), should=bq.should,
            must_not=bq.must_not, min_should_match=bq.min_should_match,
        )
    return BooleanQuery(
        must=bq.must, should=bq.should + (branch,),
        must_not=bq.must_not, min_should_match=bq.min_should_match,
    )


def _build_tree(st: _State, branch, default_op: str) -> None:
    if branch is None:
        return
    if st.neg % 2 == 1:
        # the reference's negation wrapper: MatchAll SHOULD + branch MUST_NOT
        branch = BooleanQuery(
            should=(MatchAllDocsQuery(),), must_not=(branch,)
        )
    if st.top is None:
        st.top = branch
    else:
        if st.cur_op is None:
            st.cur_op = default_op
        if st.prev_op != st.cur_op:
            # operation change: push the current tree one level down
            if st.cur_op == "must":
                st.top = BooleanQuery(must=(st.top,))
            else:
                st.top = BooleanQuery(should=(st.top,))
        st.top = _add_clause(st.top, branch, st.cur_op)
        st.prev_op = st.cur_op
    st.cur_op = None
