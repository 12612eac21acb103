"""ASCII folding (analysis/common/src/java/org/apache/lucene/analysis/
miscellaneous/ASCIIFoldingFilter.java): map alphanumeric Unicode to their
ASCII equivalents so accented queries match unaccented text and vice
versa.

The reference enumerates its mappings in an explicit ~2000-case switch;
this implementation derives the same result for the Latin scripts from
Unicode NFKD decomposition with combining marks stripped, plus a table for
the non-decomposable letters the reference also special-cases (ae/oe
ligatures, eth, thorn, stroked letters, sharp s). Characters without an
ASCII equivalent pass through unchanged (same as the reference's default
branch).

Chain order: tokenize → lowercase → FOLD → stop. Folding before the stop
filter means an accented spelling of a stopword ("thé" → "the") is
stopped like its ASCII form — the behavior of an ASCIIFoldingFilter placed
before StopFilter, the standard arrangement for folded indexes.
"""

from __future__ import annotations

import unicodedata

from .tokenizer import MAX_TOKEN_LENGTH, Token, analyze

__all__ = ["fold_ascii", "folded_analyze"]

# lowercase input (the chain lowercases first); targets the reference's
# mappings for letters NFKD cannot decompose
_EXTRA = {
    "æ": "ae", "œ": "oe", "ø": "o", "ß": "ss", "đ": "d", "ð": "d",
    "þ": "th", "ł": "l", "ħ": "h", "ı": "i", "ĸ": "k", "ŋ": "n",
    "ſ": "s", "ŧ": "t", "ƀ": "b", "ɉ": "j", "ɍ": "r", "ʉ": "u",
    "ɏ": "y", "ǥ": "g", "ƒ": "f", "ꝑ": "p", "ɨ": "i", "ɇ": "e",
    "ȼ": "c",
}


def fold_ascii(term: str) -> str:
    if term.isascii():
        return term
    out = []
    for ch in term:
        if ch.isascii():
            out.append(ch)
            continue
        sub = _EXTRA.get(ch)
        if sub is not None:
            out.append(sub)
            continue
        decomp = unicodedata.normalize("NFKD", ch)
        kept = "".join(c for c in decomp if not unicodedata.combining(c))
        out.append(kept if kept.isascii() else ch)
    return "".join(out)


def folded_analyze(
    text: str,
    stopwords: frozenset[str] | None = None,
    max_token_length: int = MAX_TOKEN_LENGTH,
) -> list[Token]:
    """standard chain with ASCII folding before the stop filter."""
    out: list[Token] = []
    for t in analyze(text, None, max_token_length):
        term = fold_ascii(t.term)
        if stopwords and term in stopwords:
            continue
        out.append(
            t if term == t.term else Token(term, t.position, t.start, t.end, t.type)
        )
    return out
