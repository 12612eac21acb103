"""ClassicTokenizer / ClassicFilter / ClassicAnalyzer — the pre-3.1
StandardTokenizer grammar.

Behavioral reference: analysis/common/src/java/org/apache/lucene/analysis/
classic/ClassicTokenizerImpl.jflex (the full rule set, replayed here with
per-position longest-match scanning exactly like JFlex: the longest rule
match wins, rule ORDER breaks length ties) and ClassicFilter.java:25-62
(strip trailing 's from <APOSTROPHE> tokens, strip dots from <ACRONYM>
tokens). The analyzer composition (ClassicAnalyzer.java) is tokenizer →
ClassicFilter → lowercase → stop.

Rule inventory (jflex:70-118, priority order):

- ALPHANUM    letters/Thai/digits run
- APOSTROPHE  ALPHA("'"ALPHA)+            (O'Reilly, you're)
- ACRONYM     LETTER"."(LETTER".")+       (U.S.A. — dots stripped later)
- COMPANY     ALPHA("&"|"@")ALPHA         (AT&T, Excite@Home)
- EMAIL       local"@"domain
- HOST        ALPHANUM("."ALPHANUM)+      (lucene.apache.org)
- NUM         segments joined by [_-/.,] where every other segment has a
              digit (floating point, serials, IPs, model numbers)
- CJ          one Chinese/Japanese char (NOT Korean — jflex:116)
- ACRONYM_DEP ALPHANUM"."(ALPHANUM".")+   (deprecated catch-all, typed
              <HOST> minus the final "." per ClassicTokenizer's
              ACRONYM_DEP handling)

Everything unmatched is skipped one char at a time (jflex:127).
"""

from __future__ import annotations

import re

from ..constants import MAX_TOKEN_LENGTH
from .tokenizer import Token, _lowercase

__all__ = [
    "classic_tokenize",
    "classic_filter_term",
    "classic_analyze",
    "classic_terms_positions",
]

# Chinese and Japanese (but NOT Korean) — jflex:116
_CJ = (
    "\u3100-\u312f\u3040-\u309F\u30A0-\u30FF\u31F0-\u31FF"
    "\u3300-\u337f\u3400-\u4dbf\u4e00-\u9fff\uf900-\ufaff\uff65-\uff9f"
)
_THAI = "\u0E00-\u0E59"
# LETTER = unicode letter minus the CJ block (jflex:113)
_L = rf"(?:(?![{_CJ}])[^\W\d_])"
_ALPHA = rf"{_L}+"
_AN = rf"(?:{_L}|[{_THAI}]|\d)+"  # ALPHANUM
_P = r"[_\-/.,]"
_HAS_DIGIT = rf"(?:{_L}|\d)*\d(?:{_L}|\d)*"

# priority order matters only for equal-length matches (JFlex semantics)
_RULES: tuple[tuple[str, re.Pattern], ...] = tuple(
    (name, re.compile(rx))
    for name, rx in [
        ("<ALPHANUM>", _AN),
        ("<APOSTROPHE>", rf"{_ALPHA}(?:'{_ALPHA})+"),
        ("<ACRONYM>", rf"{_L}\.(?:{_L}\.)+"),
        ("<COMPANY>", rf"{_ALPHA}[&@]{_ALPHA}"),
        (
            "<EMAIL>",
            rf"{_AN}(?:[._-]{_AN})*@{_AN}(?:[.-]{_AN})+",
        ),
        ("<HOST>", rf"{_AN}(?:\.{_AN})+"),
        (
            "<NUM>",
            rf"(?:{_AN}{_P}{_HAS_DIGIT}(?:{_P}{_AN}{_P}{_HAS_DIGIT})*"
            rf"(?:{_P}{_AN})?"
            rf"|{_HAS_DIGIT}{_P}{_AN}(?:{_P}{_HAS_DIGIT}{_P}{_AN})*"
            rf"(?:{_P}{_HAS_DIGIT})?)",
        ),
        ("<CJ>", rf"[{_CJ}]"),
        ("<ACRONYM_DEP>", rf"{_AN}\.(?:{_AN}\.)+"),
    ]
)


def classic_tokenize(
    text: str, max_token_length: int = MAX_TOKEN_LENGTH
) -> list[Token]:
    """Longest-match scan over the rule set; unmatched chars skipped.
    Over-long tokens are discarded without consuming a position
    (ClassicTokenizer.setMaxTokenLength contract)."""
    out: list[Token] = []
    i, n, pos = 0, len(text), 0
    while i < n:
        best_len = 0
        best_type = None
        for name, rx in _RULES:
            m = rx.match(text, i)
            if m is not None and m.end() - i > best_len:
                best_len = m.end() - i
                best_type = name
        if best_type is None:
            i += 1
            continue
        term = text[i : i + best_len]
        if best_type == "<ACRONYM_DEP>":
            # ClassicTokenizer.java ACRONYM_DEP: emitted as <HOST> with
            # the trailing "." removed
            term = term[:-1]
            best_type = "<HOST>"
        if len(term) <= max_token_length:
            out.append(Token(term, pos, i, i + best_len, best_type))
            pos += 1
        i += best_len
    return out


def classic_filter_term(term: str, type_: str) -> str:
    """ClassicFilter.java:25-62: strip trailing 's from <APOSTROPHE>
    tokens; strip dots from <ACRONYM> tokens."""
    if type_ == "<APOSTROPHE>" and len(term) >= 2 and term[-2] == "'" and (
        term[-1] in ("s", "S")
    ):
        return term[:-2]
    if type_ == "<ACRONYM>":
        return term.replace(".", "")
    return term


def classic_analyze(
    text: str,
    stopwords: frozenset[str] | None = None,
    max_token_length: int = MAX_TOKEN_LENGTH,
) -> list[Token]:
    """ClassicAnalyzer chain: tokenize → ClassicFilter → lowercase →
    stop (ClassicAnalyzer.java createComponents)."""
    out: list[Token] = []
    for t in classic_tokenize(text, max_token_length):
        term = _lowercase(classic_filter_term(t.term, t.type))
        if stopwords and term in stopwords:
            continue
        out.append(Token(term, t.position, t.start, t.end, t.type))
    return out


def classic_terms_positions(
    text: str, stopwords: frozenset[str] | None = None
) -> tuple[list[str], list[int]]:
    toks = classic_analyze(text, stopwords)
    return [t.term for t in toks], [t.position for t in toks]
