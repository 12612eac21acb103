"""Word-delimiter analysis: split mixed-case / mixed-alnum tokens into
parts — the webtext workhorse for product names and identifiers.

Behavioral reference: analysis/common/src/java/org/apache/lucene/analysis/
miscellaneous/WordDelimiterGraphFilter.java:73 with the default index-time
flag set GENERATE_WORD_PARTS | GENERATE_NUMBER_PARTS | SPLIT_ON_CASE_CHANGE
| SPLIT_ON_NUMERICS | STEM_ENGLISH_POSSESSIVE (catenate flags OFF — the
catenated forms make the token stream a graph, which the reference itself
documents as lossy at index time, the same reason index-time multi-word
synonyms are rejected in analysis/synonyms.py):

- "PowerShot500" → power / shot / 500 (case change + letter-digit split)
- "HTTPServer"   → http / server (an upper run keeps its last letter with
  a following lower run)
- "Wi-Fi"        → wi / fi (delimiters split and are dropped)
- "O'Neil's"     → o / neil (trailing possessive 's stripped first)

Each part takes its own position (the first part keeps the token's
position, the rest increment — posIncr 1 chains). Splitting needs the
ORIGINAL case, so this chain cannot ride the lowercased vectorized
tokenizer; it runs as an exact per-document chain (the same lane as CJK
bigrams) with the term output lowercased, then stop-filtered.
"""

from __future__ import annotations

import re

from .tokenizer import Token

__all__ = ["word_delimiter_analyze", "word_delimiter_terms_positions"]

# raw token = alnum runs joined by apostrophes (delimiters handled by the
# part regex); case preserved
_TOKEN_RE = re.compile(r"[A-Za-z0-9']+")

# subword parts: upper-run (not followed by lower), capitalized run,
# lower run, digit run — the SPLIT_ON_CASE_CHANGE / SPLIT_ON_NUMERICS
# boundaries of WordDelimiterIterator
_PART_RE = re.compile(r"[A-Z]+(?![a-z])|[A-Z][a-z]+|[a-z]+|[0-9]+")

_POSSESSIVE = ("'s", "'S", "’s", "’S")


def word_delimiter_analyze(
    text: str, stopwords: frozenset[str] | None = None
) -> list[Token]:
    out: list[Token] = []
    pos = 0
    if not text:
        return out
    for m in _TOKEN_RE.finditer(text):
        tok = m.group(0)
        if tok.endswith(_POSSESSIVE):
            tok = tok[:-2]
        for pm in _PART_RE.finditer(tok):
            term = pm.group(0).lower()
            if stopwords and term in stopwords:
                pos += 1  # stop-filtered parts keep their position gap
                continue
            out.append(
                Token(
                    term,
                    pos,
                    m.start() + pm.start(),
                    m.start() + pm.end(),
                    "word",
                )
            )
            pos += 1
    return out


def word_delimiter_terms_positions(
    text: str, stopwords: frozenset[str] | None = None
):
    toks = word_delimiter_analyze(text, stopwords)
    return [t.term for t in toks], [t.position for t in toks]
