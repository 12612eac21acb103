"""Phonetic analysis: classic American Soundex — the phonetic-module
analog.

Behavioral reference: analysis/phonetic/src/java/org/apache/lucene/
analysis/phonetic/PhoneticFilter.java:34 (wraps a commons-codec encoder;
Soundex is the canonical one) in the replace configuration
(``inject=false`` — each token is replaced by its phonetic code; the
inject form stacks posIncr-0 tokens, the same stacked-token layout
``synonym_expanded_index`` exercises). The Soundex algorithm itself is
public knowledge (Russell & Odell, US patents 1918/1922; the commons-codec
US_ENGLISH rules): keep the first letter, code the rest
b f p v→1 / c g j k q s x z→2 / d t→3 / l→4 / m n→5 / r→6, drop vowels and
y, collapse adjacent equal codes INCLUDING across h/w (the HW rule:
"Ashcraft" → A261, not A226), pad/truncate to letter + 3 digits.

Pure per-term transform → the vectorized vocabulary-remap lane applies.
Matching is phonetic on both sides: the query analyzes through the same
chain, so "Rupert" finds "Robert" (both R163).
"""

from __future__ import annotations

from ..constants import MAX_TOKEN_LENGTH
from .tokenizer import Token, analyze as _standard_analyze

__all__ = [
    "soundex",
    "soundex_term",
    "soundex_analyze",
    "soundex_terms_positions",
]

_CODES = {}
for _c in "bfpv":
    _CODES[_c] = "1"
for _c in "cgjkqsxz":
    _CODES[_c] = "2"
for _c in "dt":
    _CODES[_c] = "3"
_CODES["l"] = "4"
for _c in "mn":
    _CODES[_c] = "5"
_CODES["r"] = "6"


def soundex(term: str) -> str:
    """Classic 4-char Soundex code of a (lowercased) term; non-letters are
    ignored, a term with no ASCII letters returns '' (token dropped)."""
    letters = [c for c in term.lower() if "a" <= c <= "z"]
    if not letters:
        return ""
    out = letters[0].upper()
    last = _CODES.get(letters[0], "")
    for ch in letters[1:]:
        if ch in ("h", "w"):
            continue  # HW rule: h/w do not reset the run
        code = _CODES.get(ch, "")
        if not code:
            last = ""  # vowels/y separate runs
            continue
        if code != last:
            out += code
            if len(out) == 4:
                break
        last = code
    return (out + "000")[:4]


def soundex_term(term: str, stopwords: frozenset[str] | None) -> str | None:
    """Chain for one lowercased term: stop (surface form), then encode."""
    if stopwords and term in stopwords:
        return None
    code = soundex(term)
    return code or None


def soundex_analyze(
    text: str,
    stopwords: frozenset[str] | None = None,
    max_token_length: int = MAX_TOKEN_LENGTH,
) -> list[Token]:
    out: list[Token] = []
    for tok in _standard_analyze(
        text, stopwords=None, max_token_length=max_token_length
    ):
        t = soundex_term(tok.term, stopwords)
        if t is None:
            continue
        out.append(Token(t, tok.position, tok.start, tok.end, tok.type))
    return out


def soundex_terms_positions(text: str, stopwords: frozenset[str] | None = None):
    toks = soundex_analyze(text, stopwords)
    return [t.term for t in toks], [t.position for t in toks]
