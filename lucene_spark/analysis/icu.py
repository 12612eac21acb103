"""ICUFoldingFilter analog: UTR#30 character foldings.

Behavioral reference: analysis/icu/src/java/org/apache/lucene/analysis/icu/
ICUFoldingFilter.java:55 — "A TokenFilter that applies search term folding:
accent removal, case folding, canonical duplicates folding, dashes folding,
diacritic removal (including stroke/hook/descender), ... native digit
folding ..." implemented there as a precompiled ICU4J Normalizer2 with the
``utr30`` data file.

This reimplementation composes the foldings expressible with Python's
unicodedata plus a small Latin stroke/hook table (the part of UTR#30 that
survives no canonical decomposition): NFKC compatibility fold → full case
fold → NFKD + combining-mark removal (covers accents, Devanagari virama) →
default-ignorable removal (ZWJ/ZWNJ/ZWSP/BOM and friends) → native-decimal
digit fold → Latin stroke table → NFC. Every vector of the reference's
TestICUFoldingFilter.java:49-80 is replayed in
tests/test_multilang_analyzers.py."""

from __future__ import annotations

import unicodedata

__all__ = ["icu_fold", "icu_fold_term"]

# UTR#30 Latin foldings with no Unicode decomposition (diacritic-stroke/
# hook/descender removal + ae/oe-style expansions from the utr30 tables)
_LATIN_FOLD = {
    "đ": "d", "ð": "d", "ħ": "h", "ł": "l", "ø": "o", "ŧ": "t",
    "æ": "ae", "œ": "oe", "ı": "i", "ĸ": "k", "ŉ": "'n", "ſ": "s",
    "ƀ": "b", "ɖ": "d", "ɗ": "d", "ƒ": "f", "ɠ": "g", "ɨ": "i",
    "ƚ": "l", "ɲ": "n", "ƥ": "p", "ŋ": "n", "ƭ": "t", "ʈ": "t",
    "ƴ": "y", "ȥ": "z", "ɇ": "e", "ɉ": "j", "ꝗ": "q", "ɍ": "r",
    "ꞩ": "s", "ᵴ": "s", "ʉ": "u", "ʋ": "v", "ⱳ": "w",
}

# default ignorables commonly present in web text (category Cf covers the
# rest below)
_IGNORABLE = {"­", "​", "‌", "‍", "⁠", "﻿"}


def icu_fold(term: str) -> str:
    """Fold one (already tokenized) term per the UTR#30 subset above."""
    s = unicodedata.normalize("NFKC", term).casefold()
    s = unicodedata.normalize("NFKD", s)
    out: list[str] = []
    for c in s:
        if unicodedata.combining(c):
            continue  # accent / diacritic / virama removal
        if c in _IGNORABLE or unicodedata.category(c) == "Cf":
            continue  # default ignorable code points
        if c in _LATIN_FOLD:
            out.append(_LATIN_FOLD[c])
            continue
        d = unicodedata.digit(c, None)
        if d is not None and not ("0" <= c <= "9"):
            out.append(str(d))  # native digit folding
            continue
        out.append(c)
    return unicodedata.normalize("NFC", "".join(out))


def icu_fold_term(term: str, stopwords: frozenset[str] | None) -> str | None:
    """Vocab-chain entry: standard tokenize → stop → ICU fold. Stopwords
    check the SURFACE term (the filter runs after StopFilter in the
    reference chains)."""
    if stopwords and term in stopwords:
        return None
    return icu_fold(term) or None


def icu_folding_analyze(
    text: str,
    stopwords: frozenset[str] | None = None,
    max_token_length: int = None,
):
    from ..constants import MAX_TOKEN_LENGTH
    from .tokenizer import Token, analyze as _standard_analyze

    if max_token_length is None:
        max_token_length = MAX_TOKEN_LENGTH
    out = []
    for tok in _standard_analyze(
        text, stopwords=None, max_token_length=max_token_length
    ):
        t = icu_fold_term(tok.term, stopwords)
        if t is None:
            continue
        out.append(Token(t, tok.position, tok.start, tok.end, tok.type))
    return out


def icu_folding_terms_positions(
    text: str, stopwords: frozenset[str] | None = None
):
    toks = icu_folding_analyze(text, stopwords)
    return [t.term for t in toks], [t.position for t in toks]
