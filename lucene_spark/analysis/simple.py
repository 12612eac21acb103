"""Simple regex analyzer: lowercase + split on non-[a-z0-9] runs.

The analog of Lucene's ``SimpleAnalyzer``/``LetterTokenizer`` family
(reference: lucene/analysis/common/src/java/org/apache/lucene/analysis/core/
SimpleAnalyzer.java, LetterTokenizer.java) extended with digits.

Its purpose here: the token stream is reproducible in ANSI SQL as
``regexp_split_to_array(lower(text), '[^a-z0-9]+')``, which lets the external
DuckDB oracle recompute postings/df/ttf/BM25 exactly — the correctness gate
for the whole engine. The UAX#29 ``standard`` analyzer (tokenizer.py) remains
the Lucene-parity chain; it is gated by the pure-python golden oracle instead.
"""

from __future__ import annotations

import re

from .tokenizer import Token

__all__ = ["simple_analyze", "simple_terms_positions", "SIMPLE_SPLIT_REGEX"]

SIMPLE_SPLIT_REGEX = "[^a-z0-9]+"
_SPLIT = re.compile(SIMPLE_SPLIT_REGEX)


def simple_analyze(
    text: str, stopwords: frozenset[str] | None = None
) -> list[Token]:
    """lower → split on non-alphanumeric runs → drop empties → stop filter.

    Positions count surviving pre-stop tokens (stop filter preserves
    position increments, FilteringTokenFilter.java:49-63 semantics).
    """
    out: list[Token] = []
    pos = 0
    for part in _SPLIT.split(text.lower()):
        if not part:
            continue
        if stopwords and part in stopwords:
            pos += 1
            continue
        out.append(Token(part, pos, -1, -1, "<ALPHANUM>"))
        pos += 1
    return out


def simple_terms_positions(
    text: str, stopwords: frozenset[str] | None = None
) -> tuple[list[str], list[int]]:
    """Bulk (terms, positions) of :func:`simple_analyze` without Token
    objects — the build hot path."""
    terms: list[str] = []
    positions: list[int] = []
    pos = 0
    sw = stopwords if stopwords else None
    for part in _SPLIT.split(text.lower()):
        if not part:
            continue
        if sw is not None and part in sw:
            pos += 1
            continue
        terms.append(part)
        positions.append(pos)
        pos += 1
    return terms, positions
