"""Query AST + classic-syntax parser + logical rewrite.

Grammar follows Lucene's classic QueryParser surface for the subset the
reference query set uses (reference:
lucene/queryparser/src/java/org/apache/lucene/queryparser/classic/QueryParser.jj:256):
``a AND b``, ``a OR b``, ``NOT a``, ``+a -b``, ``"a phrase"``, parentheses,
``prefix*``. Default operator is OR (QueryParserBase default). Leaf text is
re-analyzed with the *same* analyzer as the index (QueryParserBase
``newFieldQuery`` — index/query symmetry); a leaf that analyzes to multiple
tokens becomes a PhraseQuery, to zero tokens (stopword) is dropped.

Rewrites mirror BooleanQuery.rewrite (lucene/core/src/java/org/apache/lucene/
search/BooleanQuery.java:270-474): 1-clause unwrap, nested SHOULD-only
flatten, duplicate-clause dedup, empty → MatchNoDocs; applied to fixpoint
(IndexSearcher.java:862-871).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

__all__ = [
    "TermQuery",
    "PhraseQuery",
    "PrefixQuery",
    "BooleanQuery",
    "MatchNoDocsQuery",
    "MatchAllDocsQuery",
    "parse_query",
    "rewrite",
    "collect_terms",
]


@dataclass(frozen=True)
class TermQuery:
    term: str
    boost: float = 1.0


@dataclass(frozen=True)
class PhraseQuery:
    terms: tuple[str, ...]
    boost: float = 1.0


@dataclass(frozen=True)
class PrefixQuery:
    prefix: str
    boost: float = 1.0


@dataclass(frozen=True)
class MatchNoDocsQuery:
    pass


@dataclass(frozen=True)
class MatchAllDocsQuery:
    boost: float = 1.0


@dataclass(frozen=True)
class BooleanQuery:
    must: tuple = ()
    should: tuple = ()
    must_not: tuple = ()


# --- parser -----------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<lparen>\() | (?P<rparen>\)) |
        (?P<and>AND\b) | (?P<or>OR\b) | (?P<not>NOT\b) |
        (?P<plus>\+) | (?P<minus>-) |
        (?P<phrase>"(?P<phrase_body>[^"]*)") |
        (?P<word>[^\s()+\-"][^\s()"]*)
    )""",
    re.VERBOSE,
)


class _Tokens:
    def __init__(self, s: str):
        self.toks: list[tuple[str, str]] = []
        pos = 0
        while pos < len(s):
            m = _TOKEN_RE.match(s, pos)
            if not m or m.end() == pos:
                if s[pos:].strip():
                    raise ValueError(f"cannot tokenize query at: {s[pos:]!r}")
                break
            pos = m.end()
            for kind in ("lparen", "rparen", "and", "or", "not", "plus", "minus"):
                if m.group(kind):
                    self.toks.append((kind, m.group(kind)))
                    break
            else:
                if m.group("phrase") is not None:
                    self.toks.append(("phrase", m.group("phrase_body")))
                else:
                    self.toks.append(("word", m.group("word")))
        self.i = 0

    def peek(self) -> str | None:
        return self.toks[self.i][0] if self.i < len(self.toks) else None

    def next(self) -> tuple[str, str]:
        t = self.toks[self.i]
        self.i += 1
        return t


def _make_leaf(kind: str, text: str, analyzer) -> object:
    if kind == "phrase":
        toks = analyzer(text)
        if not toks:
            return MatchNoDocsQuery()
        if len(toks) == 1:
            return TermQuery(toks[0].term)
        return PhraseQuery(tuple(t.term for t in toks))
    if text == "*":
        return MatchAllDocsQuery()
    if text.endswith("*") and len(text) > 1 and "*" not in text[:-1]:
        ptoks = analyzer(text[:-1])
        if len(ptoks) == 1:
            return PrefixQuery(ptoks[0].term)
    # strip a field: prefix (single-field engine: field is ignored)
    if ":" in text:
        text = text.split(":", 1)[1]
    toks = analyzer(text)
    if not toks:
        return MatchNoDocsQuery()
    if len(toks) == 1:
        return TermQuery(toks[0].term)
    return PhraseQuery(tuple(t.term for t in toks))


_CLAUSE_START = {"word", "phrase", "plus", "minus", "not", "lparen"}


def _parse_or(tk: _Tokens, analyzer):
    clauses = [_parse_and(tk, analyzer)]
    # explicit OR, or adjacency (default operator OR, QueryParserBase default)
    while tk.peek() == "or" or tk.peek() in _CLAUSE_START:
        if tk.peek() == "or":
            tk.next()
        clauses.append(_parse_and(tk, analyzer))
    if len(clauses) == 1:
        return clauses[0]
    should, must_not = [], []
    for c in clauses:
        if isinstance(c, _Negated):
            must_not.append(c.q)
        else:
            should.append(c)
    return BooleanQuery(should=tuple(should), must_not=tuple(must_not))


def _parse_and(tk: _Tokens, analyzer):
    clauses = [_parse_clause(tk, analyzer)]
    while tk.peek() == "and":
        tk.next()
        clauses.append(_parse_clause(tk, analyzer))
    if len(clauses) == 1:
        return clauses[0]
    must, must_not = [], []
    for c in clauses:
        if isinstance(c, _Negated):
            must_not.append(c.q)
        else:
            must.append(c)
    return BooleanQuery(must=tuple(must), must_not=tuple(must_not))


@dataclass(frozen=True)
class _Negated:
    q: object


def _parse_clause(tk: _Tokens, analyzer):
    kind = tk.peek()
    if kind == "not" or kind == "minus":
        tk.next()
        inner = _parse_clause(tk, analyzer)
        if isinstance(inner, _Negated):
            return inner.q  # double negation
        return _Negated(inner)
    if kind == "plus":
        tk.next()
        inner = _parse_clause(tk, analyzer)
        return BooleanQuery(must=(inner,))
    return _parse_atom(tk, analyzer)


def _parse_atom(tk: _Tokens, analyzer):
    kind = tk.peek()
    if kind is None:
        return MatchNoDocsQuery()
    if kind == "lparen":
        tk.next()
        q = _parse_or(tk, analyzer)
        if tk.peek() == "rparen":
            tk.next()
        return q
    k, v = tk.next()
    return _make_leaf(k, v, analyzer)


def parse_query(s: str, analyzer) -> object:
    """Parse a classic-syntax query string; ``analyzer(text) -> list[Token]``."""
    tk = _Tokens(s)
    if tk.peek() is None:
        return MatchNoDocsQuery()
    q = _parse_or(tk, analyzer)
    if isinstance(q, _Negated):
        q = BooleanQuery(must_not=(q.q,))
    return rewrite(q)


# --- rewrite ----------------------------------------------------------------

def _rewrite_once(q):
    if isinstance(q, BooleanQuery):
        must = tuple(_rewrite_once(c) for c in q.must)
        should = tuple(_rewrite_once(c) for c in q.should)
        must_not = tuple(_rewrite_once(c) for c in q.must_not)
        # drop MatchNoDocs SHOULD/MUST_NOT; a MatchNoDocs MUST kills the query
        if any(isinstance(c, MatchNoDocsQuery) for c in must):
            return MatchNoDocsQuery()
        should = tuple(c for c in should if not isinstance(c, MatchNoDocsQuery))
        must_not = tuple(c for c in must_not if not isinstance(c, MatchNoDocsQuery))
        # flatten nested SHOULD-only booleans into a SHOULD-only parent
        if not must and not must_not:
            flat: list = []
            for c in should:
                if isinstance(c, BooleanQuery) and not c.must and not c.must_not:
                    flat.extend(c.should)
                else:
                    flat.append(c)
            should = tuple(flat)
        # flatten nested MUST-only booleans into a MUST parent
        if not should:
            flat_m: list = []
            flat_mn: list = list(must_not)
            for c in must:
                if isinstance(c, BooleanQuery) and not c.should:
                    flat_m.extend(c.must)
                    flat_mn.extend(c.must_not)
                else:
                    flat_m.append(c)
            must, must_not = tuple(flat_m), tuple(flat_mn)
        # dedup identical clauses (BooleanQuery.java:429-474)
        must = tuple(dict.fromkeys(must))
        should = tuple(dict.fromkeys(should))
        must_not = tuple(dict.fromkeys(must_not))
        # 1-clause unwrap
        if len(must) == 1 and not should and not must_not:
            return must[0]
        if len(should) == 1 and not must and not must_not:
            return should[0]
        if not must and not should:
            return MatchNoDocsQuery()  # pure-negative (BooleanQuery.java:372)
        return BooleanQuery(must=must, should=should, must_not=must_not)
    if isinstance(q, PhraseQuery) and len(q.terms) == 1:
        return TermQuery(q.terms[0], q.boost)
    return q


def rewrite(q):
    """Apply rewrites to fixpoint (IndexSearcher.java:862-871)."""
    while True:
        q2 = _rewrite_once(q)
        if q2 == q:
            return q2
        q = q2


def collect_terms(q) -> set[str]:
    """All concrete terms referenced by the query (after prefix expansion)."""
    if isinstance(q, TermQuery):
        return {q.term}
    if isinstance(q, PhraseQuery):
        return set(q.terms)
    if isinstance(q, BooleanQuery):
        out: set[str] = set()
        for c in (*q.must, *q.should, *q.must_not):
            out |= collect_terms(c)
        return out
    return set()
