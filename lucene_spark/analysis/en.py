"""EnglishAnalyzer-equivalent chain: StandardTokenizer -> possessive strip
-> lowercase -> stop -> Porter stem.

Behavioral reference: analysis/common/src/java/org/apache/lucene/analysis/
en/EnglishAnalyzer.java:102-110 (createComponents order) and
EnglishPossessiveFilter.java:30-50 (strip a trailing {' | ’ | ＇}
followed by s/S). The default stop set is the canonical 33-word list
(EnglishAnalyzer.java:45-53) = ``constants.ENGLISH_STOP_WORDS``.

Every filter in the chain is a pure per-TERM transform (position
increments are preserved by StopFilter semantics), so the vectorized build
path applies the whole chain once per unique vocabulary term instead of
per token — see vectorized.analyze_batch(analyzer="english").
"""

from __future__ import annotations

from ..constants import MAX_TOKEN_LENGTH
from .porter import porter_stem
from .tokenizer import Token, analyze as _standard_analyze
from .tokenizer import analyze_terms_positions as _standard_terms_positions

__all__ = ["strip_possessive", "english_term", "english_analyze",
           "english_terms_positions"]

_APOS = ("'", "’", "＇")


def strip_possessive(term: str) -> str:
    """EnglishPossessiveFilter: drop a trailing <apostrophe>s."""
    if (
        len(term) >= 2
        and term[-1] in ("s", "S")
        and term[-2] in _APOS
    ):
        return term[:-2]
    return term


def english_term(term: str, stopwords: frozenset[str] | None) -> str | None:
    """The post-tokenizer chain for one lowercased term: possessive strip,
    stop filter (None = dropped), Porter stem. Chain order matters: "it's"
    strips to "it" and is THEN stop-filtered (EnglishAnalyzer.java:104-108)."""
    t = strip_possessive(term)
    if stopwords and t in stopwords:
        return None
    return porter_stem(t)


def english_analyze(
    text: str,
    stopwords: frozenset[str] | None = None,
    max_token_length: int = MAX_TOKEN_LENGTH,
) -> list[Token]:
    """Per-token chain (query parsing and the non-vectorized path)."""
    out: list[Token] = []
    for tok in _standard_analyze(text, stopwords=None, max_token_length=max_token_length):
        t = english_term(tok.term, stopwords)
        if t is None:
            continue
        out.append(Token(t, tok.position, tok.start, tok.end, tok.type))
    return out


def english_terms_positions(
    text: str,
    stopwords: frozenset[str] | None = None,
    max_token_length: int = MAX_TOKEN_LENGTH,
) -> tuple[list[str], list[int]]:
    """Bulk form: ([term...], [position...]) without Token objects."""
    terms, positions = _standard_terms_positions(
        text, stopwords=None, max_token_length=max_token_length
    )
    ot: list[str] = []
    op: list[int] = []
    for term, pos in zip(terms, positions):
        t = english_term(term, stopwords)
        if t is None:
            continue
        ot.append(t)
        op.append(pos)
    return ot, op
